"""Line Segment Detector: jitted sequential region extraction.

TPU-native redesign of the reference LSD (myLineSegmentDetector,
LSD/myLSD.cpp:129-376).  Structural departures, all semantics-preserving
at line-set granularity:

* **Seed selection by masked argmax.**  The reference pseudo-sorts all
  seeds by quantized gradient bin and walks the list, skipping used
  pixels (myLSD.cpp:176-230).  Here the next seed is the argmax of a
  static priority key (bin * H*W + reverse-row-major rank, i.e. a
  *stable* descending order - the reference's unstable qsort makes tie
  order implementation-defined, SURVEY.md 2.1) over the live mask, in a
  lax.while_loop carrying usedMap.

* **Wave-synchronous region growth.**  The reference grows FIFO with
  the running circular-mean angle updated after every accepted pixel
  and re-sweeps until a fixpoint (RegionGrower, myLSD.cpp:491-590).
  Here each wave accepts all 8-neighbors passing the angle test at
  once, then recomputes the running mean over the accepted set (the
  sums are associative, so this equals the reference at wave
  granularity), iterating to the same fixpoint.  Pixel sets can differ
  from the reference only when a mid-wave angle update flips an accept;
  parity tests compare extracted line sets, not growth order.

* **Masked full-image moments** replace point lists (rect.py), and the
  NFA rasterizes densely (nfa.py).

The in-place 1<->255 input remap (myLSD.cpp:135-142) is functional
here: callers get the remapped map back alongside the lines.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from lsdtpu import geometry as geo
from lsdtpu.mapprep.gaussian import gaussian_sampler
from lsdtpu.mapprep.gradient import gradient_field
from lsdtpu.mapprep import rect as mrect
from lsdtpu.mapprep import nfa as mnfa

PI = math.pi


def _dilate8(mask, axis=None):
    """8-neighbor dilation via 3x3 window OR.

    With `axis` the mask is a row block of a sharded field: each device
    first receives its neighbors' boundary rows (one ppermute up, one
    down; edge devices receive zeros - ppermute's unaddressed targets),
    so a wave crosses block boundaries exactly like it crosses any
    other row."""
    m = mask.astype(jnp.float32)
    if axis:
        n = jax.lax.axis_size(axis)
        up = jax.lax.ppermute(m[-1:], axis,
                              [(i, i + 1) for i in range(n - 1)])
        dn = jax.lax.ppermute(m[:1], axis,
                              [(i + 1, i) for i in range(n - 1)])
        m = jnp.concatenate([up, m, dn], axis=0)
    out = jax.lax.reduce_window(m, jnp.float32(0), jax.lax.max, (3, 3),
                                (1, 1), "SAME")
    if axis:
        out = out[1:-1]
    return out > 0.0


def _grow(seed_y, seed_x, seed_deg, deg_thre, ban, deg_map,
          row0=0, axis=None):
    """Wave-synchronous region growth (reference: RegionGrower,
    myLSD.cpp:491-590).  Only ban==True blocks growth (usedMap==1; NFA-
    rejected value-2 pixels regrow, myLSD.cpp:534).
    Returns (cur mask, reg_deg).  row0/axis: row-block sharding - the
    per-wave dilation exchanges boundary rows (_dilate8) and the
    circular-mean sums psum, so every device carries the same running
    angle and the wave fixpoint is global."""
    H, W = deg_map.shape
    yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) + row0
    xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    cur0 = (yy == seed_y) & (xx == seed_x)
    state = dict(cur=cur0, sin=jnp.sin(seed_deg), cos=jnp.cos(seed_deg),
                 deg=jnp.arctan2(jnp.sin(seed_deg), jnp.cos(seed_deg)),
                 changed=jnp.array(True))

    def rsum(x):
        s = jnp.sum(x)
        return jax.lax.psum(s, axis) if axis else s

    def body(s):
        cand = _dilate8(s["cur"], axis) & ~s["cur"] & ~ban
        dif = jnp.abs(s["deg"] - deg_map)
        dif = jnp.where(dif > PI * 1.5, jnp.abs(dif - 2 * PI), dif)
        acc = cand & (dif < deg_thre)
        n_acc = rsum(acc)
        sin = s["sin"] + rsum(jnp.where(acc, jnp.sin(deg_map), 0.0))
        cos = s["cos"] + rsum(jnp.where(acc, jnp.cos(deg_map), 0.0))
        return dict(cur=s["cur"] | acc, sin=sin, cos=cos,
                    deg=jnp.arctan2(sin, cos), changed=n_acc > 0)

    out = jax.lax.while_loop(lambda s: s["changed"], body, state)
    return out["cur"], out["deg"]


def _grow_fifo(seed_y, seed_x, seed_deg, deg_thre, ban, deg_map,
               cap: Optional[int] = None):
    """Exact-order FIFO region growth (reference: RegionGrower,
    myLSD.cpp:491-590): a queue of accepted points; each popped point
    scans its 3x3 neighborhood in row-major order; the running circular
    mean updates after EVERY acceptance; full re-sweep passes repeat
    until one adds nothing (`while ex != grow`).  Sequential by
    construction - kept for bit-parity map prep (config
    lsd.growth="fifo"); the wave-synchronous `_grow` is the fast
    default.

    `cap` bounds the queue; the default (None -> H*W) can NEVER
    saturate: every pixel enters the queue at most once (the `cur`
    membership test), so grow <= H*W always - truncation is impossible
    by construction, honoring the "caps are never silent" contract.
    An explicit smaller cap raises at trace time rather than silently
    stopping acceptance.  Returns (cur mask, reg_deg, queue_y, queue_x,
    n) - the acceptance-ordered point queue feeds the exact-order
    radius reducer (rect.radius_reducer_fifo)."""
    H, W = deg_map.shape
    if cap is None:
        cap = H * W
    elif cap < H * W:
        raise ValueError(
            f"_grow_fifo cap={cap} < H*W={H * W}: an undersized queue "
            "would silently truncate region growth (bit-parity mode "
            "must match the reference exactly); use the default")
    dt = deg_map.dtype
    cur0 = jnp.zeros((H, W), bool).at[seed_y, seed_x].set(True)
    st = dict(
        qy=jnp.zeros((cap,), jnp.int32).at[0].set(seed_y),
        qx=jnp.zeros((cap,), jnp.int32).at[0].set(seed_x),
        cur=cur0, grow=jnp.int32(1), i=jnp.int32(0), ex=jnp.int32(0),
        sin=jnp.sin(seed_deg).astype(dt), cos=jnp.cos(seed_deg).astype(dt),
        deg=jnp.arctan2(jnp.sin(seed_deg), jnp.cos(seed_deg)).astype(dt))

    def pop_step(s):
        ry = s["qy"][s["i"]]
        rx = s["qx"][s["i"]]
        cur, grow = s["cur"], s["grow"]
        qy, qx = s["qy"], s["qx"]
        sin, cos, deg = s["sin"], s["cos"], s["deg"]
        # 3x3 in row-major (m, n) order with sequential angle updates
        # (the center is cur==1, so it self-skips like the reference)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                m = ry + dy
                n = rx + dx
                inb = (m >= 0) & (m < H) & (n >= 0) & (n < W)
                mc = jnp.clip(m, 0, H - 1)
                nc = jnp.clip(n, 0, W - 1)
                free = inb & ~cur[mc, nc] & ~ban[mc, nc]
                cd = deg_map[mc, nc]
                dif = jnp.abs(deg - cd)
                dif = jnp.where(dif > PI * 1.5, jnp.abs(dif - 2 * PI), dif)
                acc = free & (dif < deg_thre) & (grow < cap)
                sin = sin + jnp.where(acc, jnp.sin(cd), 0.0)
                cos = cos + jnp.where(acc, jnp.cos(cd), 0.0)
                deg = jnp.where(acc, jnp.arctan2(sin, cos), deg)
                cur = cur.at[mc, nc].set(cur[mc, nc] | acc)
                slot = jnp.minimum(grow, cap - 1)
                qy = qy.at[slot].set(jnp.where(acc, m, qy[slot]))
                qx = qx.at[slot].set(jnp.where(acc, n, qx[slot]))
                grow = grow + acc.astype(jnp.int32)
        return dict(qy=qy, qx=qx, cur=cur, grow=grow, i=s["i"] + 1,
                    ex=s["ex"], sin=sin, cos=cos, deg=deg)

    def pass_body(s):
        s = dict(s, ex=s["grow"], i=jnp.int32(0))
        return jax.lax.while_loop(lambda t: t["i"] < t["grow"],
                                  pop_step, s)

    out = jax.lax.while_loop(lambda s: s["ex"] != s["grow"], pass_body, st)
    return out["cur"], out["deg"], out["qy"], out["qx"], out["grow"]


@partial(jax.jit, static_argnames=("sca", "sig", "ang_thre", "den_thre",
                                   "pse_bin", "max_lines", "growth",
                                   "nfa_kernel"))
def line_segment_detector(map_gray: jnp.ndarray, sca: float = 0.3,
                          sig: float = 0.6, ang_thre: float = 22.5,
                          den_thre: float = 0.7, pse_bin: int = 1024,
                          max_lines: int = 256, growth: str = "wave",
                          nfa_kernel: str = "xla"):
    """map_gray: (row, col) occupancy {0, 1, 255}.  Returns
    (lines (max_lines, 10), mask (max_lines,), n_lines, remapped_map).

    linesInfo rows are in structLinesInfo order (geometry.py) with
    endpoints rescaled to the full-resolution map frame
    (myLSD.cpp:252-258).

    growth: "wave" (default, wave-synchronous - fast, line sets can
    deviate from the reference when a mid-wave angle update flips an
    accept) or "fifo" (exact reference acceptance order - sequential,
    for bit-parity map prep).

    nfa_kernel: "xla" or "pallas" (the fused VMEM rasterize+count
    kernel, ops/nfa_pallas.py; bitwise-identical line sets)."""
    ori_row, ori_col = map_gray.shape
    dt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    # in-place 1<->255 remap skipping row/col 0 (myLSD.cpp:135-142)
    sub = map_gray[1:, 1:]
    sub = jnp.where(sub == 1, jnp.asarray(255, map_gray.dtype),
                    jnp.where(sub == 255, jnp.asarray(0, map_gray.dtype),
                              sub))
    remapped = map_gray.at[1:, 1:].set(sub)

    gauss = gaussian_sampler(remapped.astype(dt), sca, sig)
    new_row, new_col = gauss.shape
    deg_thre = ang_thre / 180.0 * PI
    mag, deg_map, prebanned, max_grad = gradient_field(gauss, deg_thre)

    log_nt = 5 * (math.log10(new_row) + math.log10(new_col)) / 2.0
    lines, n = _seed_walk(mag, deg_map, prebanned, max_grad, log_nt,
                          sca, ang_thre, den_thre, pse_bin, max_lines,
                          growth, nfa_kernel, dt)
    mask = jnp.arange(max_lines) < n
    infos = geo.lines_info_from_endpoints(lines[:, 0], lines[:, 1],
                                          lines[:, 2], lines[:, 3])
    infos = jnp.where(mask[:, None], infos, 0.0)
    return infos, mask, n, remapped


def _seed_walk(mag, deg_map, prebanned, max_grad, log_nt, sca, ang_thre,
               den_thre, pse_bin, max_lines, growth, nfa_kernel, dt,
               row0=0, axis=None, n_rows=None):
    """The sequential-seeded region extraction loop (myLSD.cpp:219-272)
    shared by the single-device and row-block-sharded drivers.

    row0/axis/n_rows (lsd_sharded): mag/deg_map/prebanned are this
    device's row block starting at global row row0 of a field whose
    TRUE height is n_rows (rows past it are padding, prebanned).  The
    seed walk itself stays sequential (exactly like the reference);
    every inner full-field pass - seed argmax, wave growth, moments,
    NFA counts - reduces block-locally and combines with one
    psum/pmin/pmax, and the per-wave dilation exchanges boundary rows,
    so all scalar state (and hence the emitted line list) is replicated
    across devices.  Returns (lines (max_lines, 4) endpoint buffer,
    n_lines raw count)."""
    if growth == "fifo" and axis:
        raise ValueError("growth='fifo' is inherently sequential (a "
                         "global FIFO queue, myLSD.cpp:491-590) and "
                         "unsupported under map-block sharding; use "
                         "growth='wave'")
    H, W = mag.shape
    reg_thre = -log_nt / math.log10(ang_thre / 180.0)
    ali_pro = ang_thre / 180.0
    deg_thre = ang_thre / 180.0 * PI
    yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) + row0
    xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)

    def rsum(x):
        s = jnp.sum(x)
        return jax.lax.psum(s, axis) if axis else s

    # stable-descending seed priority (quantized bin, row-major ties)
    zoom = pse_bin / max_grad
    q = jnp.minimum(jnp.floor(mag * zoom), float(pse_bin))
    # the max-gradient pixel sits exactly on the top bin boundary
    # (mag*zoom == pse_bin in exact math); FMA noise can push it to
    # pse_bin-1 and reorder the whole seed walk - pin it
    q = jnp.where(mag == max_grad, float(pse_bin), q)
    is_seed = q >= 1.0

    state = dict(
        used=jnp.where(prebanned, 1, 0).astype(jnp.int8),
        seed_done=jnp.zeros((H, W), bool),
        lines=jnp.zeros((max_lines, 4), dt),
        n_lines=jnp.zeros((), jnp.int32),
    )

    def live_mask(s):
        return is_seed & ~s["seed_done"] & (s["used"] == 0)

    def cond(s):
        return rsum(live_mask(s)) > 0

    def body(s):
        # next seed: highest live bin, row-major-first among ties (the
        # stable-descending walk; two-stage argmax avoids a composite
        # integer key that could overflow on large maps).  Sharded: the
        # global bin max is a pmax, and the first GLOBAL flat index
        # among local firsts is a pmin - identical to the single-device
        # first-argmax because row-major order restricted to a block is
        # order-isomorphic to the global order.
        live = live_mask(s)
        qmax = jnp.max(jnp.where(live, q, -1.0))
        if axis:
            qmax = jax.lax.pmax(qmax, axis)
        cand = live & (q == qmax)
        flat = jnp.argmax(cand.reshape(-1))
        if axis:
            # lexicographic (global row, col) pmin pair - NOT a
            # composite flat key, which would overflow int32 at giant
            # downsampled fields (> 2^31 cells)
            big = jnp.int32(2147483647)
            has = jnp.any(cand)
            gy = jnp.where(has, (row0 + flat // W).astype(jnp.int32), big)
            gx = jnp.where(has, (flat % W).astype(jnp.int32), big)
            sy = jax.lax.pmin(gy, axis)
            sx = jax.lax.pmin(jnp.where(gy == sy, gx, big), axis)
        else:
            sy = (flat // W).astype(jnp.int32)
            sx = (flat % W).astype(jnp.int32)
        seed_done = s["seed_done"] | ((yy == sy) & (xx == sx))

        ban = s["used"] == 1
        seed_deg = mrect.field_at(deg_map, sy, sx, row0, axis)
        fifo = growth == "fifo"
        if fifo:
            cur, reg_deg, _qy, _qx, size = _grow_fifo(
                sy, sx, seed_deg, deg_thre, ban, deg_map)
        else:
            cur, reg_deg = _grow(sy, sx, seed_deg, deg_thre, ban,
                                 deg_map, row0, axis)
            size = rsum(cur)

        def process(_):
            rec = mrect.rectangle_converter(cur, reg_deg, mag, ali_pro,
                                            deg_thre, row0, axis)

            def grow_fn(cen_deg, new_thre):
                if fifo:
                    return _grow_fifo(sy, sx, cen_deg, new_thre, ban,
                                      deg_map)
                return _grow(sy, sx, cen_deg, new_thre, ban, deg_map,
                             row0, axis)

            ok, cur2, _rd, rec2 = mrect.refiner(
                sx.astype(dt), sy.astype(dt), reg_deg, cur, rec, mag,
                deg_map, den_thre, deg_thre, grow_fn, exact_order=fifo,
                row0=row0, axis=axis)

            def validated(_):
                log_nfa, rec3 = mnfa.rectangle_improver(
                    rec2, deg_map, log_nt, nfa_kernel,
                    row0=row0, axis=axis, n_rows=n_rows)
                accept = log_nfa > 0.0
                # accepted -> used=1; rejected -> used=2 (regrowable)
                mark = jnp.where(accept, 1, 2).astype(jnp.int8)
                used = jnp.where(cur2, mark, s["used"])
                # rescale to full map frame (myLSD.cpp:252-258)
                if sca != 1:
                    ends = jnp.stack([(rec3["x1"] - 1.0) / sca + 1,
                                      (rec3["y1"] - 1.0) / sca + 1,
                                      (rec3["x2"] - 1.0) / sca + 1,
                                      (rec3["y2"] - 1.0) / sca + 1])
                else:
                    ends = jnp.stack([rec3["x1"], rec3["y1"],
                                      rec3["x2"], rec3["y2"]])
                n = s["n_lines"]
                slot = jnp.minimum(n, max_lines - 1)
                write = accept & (n < max_lines)
                lines = jnp.where(
                    write, s["lines"].at[slot].set(ends), s["lines"])
                # count keeps growing past the cap so callers can
                # detect overflow (n_lines > max_lines)
                n = jnp.where(accept, n + 1, n)
                return used, lines, n

            def refine_failed(_):
                return s["used"], s["lines"], s["n_lines"]

            return jax.lax.cond(ok, validated, refine_failed, None)

        def too_small(_):
            return s["used"], s["lines"], s["n_lines"]

        used, lines, n_lines = jax.lax.cond(size >= reg_thre, process,
                                            too_small, None)
        return dict(used=used, seed_done=seed_done, lines=lines,
                    n_lines=n_lines)

    out = jax.lax.while_loop(cond, body, state)
    # RAW count: n > max_lines flags overflow
    return out["lines"], out["n_lines"]
