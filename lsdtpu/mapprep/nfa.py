"""NFA validation: dense rectangle rasterization + binomial tail.

TPU-native form of RectangleNFACalculator / LogGammaCalculator /
RectangleImprover (reference: LSD/myLSD.cpp:882-1158).  The reference
scans rectangle columns computing per-column [yLow, yHigh] bounds; here
the bounds are evaluated for every image column at once and the aligned
/ total pixel counts are two masked full-image reductions.  The
binomial tail keeps the reference's exact summation (including the
0.1-tolerance early exit and the x86 cvttsd2si INT_MIN conversion
semantics for non-finite bounds) as a lax.while_loop over scalars.

The reference's fold of degMap into [0, pi) on first call
(myLSD.cpp:940-945) is a no-op here: atan2 output never exceeds pi and
pi itself is snapped to 0 upstream (gradient.py), matching the oracle.

The per-pixel rasterize+count pass is shared with the fused Pallas TPU
kernel (ops/nfa_pallas.py) and selected by `kernel` ("xla" default;
"pallas" keeps the level-line field VMEM-resident and produces bitwise
identical counts - the reductions sum exact 0/1 indicators).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from lsdtpu.ops.nfa_pallas import (N_SCALARS, rect_counts_math,
                                   rect_counts_pallas)

PI = math.pi
EPS = 2.2204e-16
TOLE = 0.1


def log_gamma(x):
    """Windschitl above 15, Lanczos below (myLSD.cpp:882-924); x > 0."""
    xs = jnp.maximum(x, 1e-12)
    win = (0.918938533204673 + (xs - 0.5) * jnp.log(xs) - xs +
           0.5 * xs * jnp.log(xs * jnp.sinh(1.0 / xs) +
                              1.0 / (810.0 * xs ** 6)))
    q = jnp.asarray([75122.6331530, 80916.6278952, 36308.2951477,
                     8687.24529705, 1168.92649479, 83.8676043424,
                     2.50662827511], x.dtype)
    a = (xs + 0.5) * jnp.log(xs + 5.5) - (xs + 5.5)
    i = jnp.arange(7, dtype=x.dtype)
    a = a - jnp.sum(jnp.log(xs[..., None] + i), axis=-1)
    b = jnp.sum(q * xs[..., None] ** i, axis=-1)
    lan = a + jnp.log(b)
    return jnp.where(x > 15.0, win, lan)


def pack_rect_scalars(rec):
    """Rectangle geometry -> the (N_SCALARS,) packed vector consumed by
    rect_counts_math / the Pallas kernel: vertex sort (myLSD.cpp:946-970),
    column range, and the four edge slopes."""
    half_w = rec["wid"] / 2.0
    ver_x = jnp.stack([rec["x1"] - rec["dy"] * half_w,
                       rec["x2"] - rec["dy"] * half_w,
                       rec["x2"] + rec["dy"] * half_w,
                       rec["x1"] + rec["dy"] * half_w])
    ver_y = jnp.stack([rec["y1"] + rec["dx"] * half_w,
                       rec["y2"] + rec["dx"] * half_w,
                       rec["y2"] - rec["dx"] * half_w,
                       rec["y1"] - rec["dx"] * half_w])
    x1, x2, y1, y2 = rec["x1"], rec["x2"], rec["y1"], rec["y2"]
    off = jnp.where((x1 < x2) & (y1 <= y2), 0,
                    jnp.where((x1 >= x2) & (y1 < y2), 1,
                              jnp.where((x1 > x2) & (y1 >= y2), 2, 3)))
    idx = jnp.mod(off + jnp.arange(4), 4)
    vx = ver_x[idx]
    vy = ver_y[idx]

    x_start = jnp.ceil(vx[0])
    x_len = jnp.abs(jnp.ceil(vx[0]) - jnp.floor(vx[2])) + 1.0
    ks = jnp.stack([(vy[1] - vy[0]) / (vx[1] - vx[0]),
                    (vy[2] - vy[1]) / (vx[2] - vx[1]),
                    (vy[2] - vy[3]) / (vx[2] - vx[3]),
                    (vy[3] - vy[0]) / (vx[3] - vx[0])])
    return jnp.concatenate([jnp.stack([x_start, x_len]), vx, vy, ks,
                            jnp.stack([rec["deg"], rec["prec"]])])


def rectangle_nfa(rec, deg_map, log_nt, kernel: str = "xla",
                  row0=0, axis=None, n_rows=None):
    """-log10 NFA (reference: RectangleNFACalculator, myLSD.cpp:926-1059).
    rec: dict of traced scalars; deg_map: (H, W); kernel: "xla" or
    "pallas" (the fused VMEM pass, ops/nfa_pallas.py - same counts).
    row0/axis/n_rows: row-block sharding (mapprep/lsd_sharded) - counts
    reduce per block and one psum rebuilds the global pair; the
    binomial tail then runs replicated on every device."""
    sc = pack_rect_scalars(rec)
    if kernel == "pallas" and axis is None:
        all_pix, ali_pix = rect_counts_pallas(deg_map, sc)
    else:
        all_pix, ali_pix = rect_counts_math(
            deg_map, [sc[i] for i in range(N_SCALARS)], row0, n_rows)
        if axis:
            all_pix = jax.lax.psum(all_pix, axis)
            ali_pix = jax.lax.psum(ali_pix, axis)
    return _binom_tail_nfa(all_pix, ali_pix, rec["p"], log_nt)


def _binom_tail_nfa(all_pix, ali_pix, p, log_nt):
    """-log10 of the binomial tail NFA (myLSD.cpp:1017-1058)."""
    dt = all_pix.dtype
    pro_term = p / (1.0 - p)
    log1 = (log_gamma(all_pix + 1) - log_gamma(ali_pix + 1) -
            log_gamma(all_pix - ali_pix + 1) +
            ali_pix * jnp.log(p) + (all_pix - ali_pix) * jnp.log(1 - p))
    term0 = jnp.exp(log1)

    def tail_sum(_):
        def cond(s):
            return (s["i"] <= all_pix) & ~s["done"]

        def body(s):
            bin_term = (all_pix - s["i"] + 1.0) / s["i"]
            mult = bin_term * pro_term
            term = s["term"] * mult
            bin_tail = s["tail"] + term
            err = term * ((1.0 - mult ** (all_pix - s["i"] + 1.0)) /
                          (1.0 - mult) - 1.0)
            done = (bin_term < 1.0) & (
                err < TOLE * jnp.abs(-jnp.log10(bin_tail) - log_nt)
                * bin_tail)
            return dict(i=s["i"] + 1.0, term=term, tail=bin_tail,
                        done=done)

        out = jax.lax.while_loop(cond, body, dict(
            i=ali_pix + 1.0, term=term0, tail=term0,
            done=jnp.array(False)))
        return -jnp.log10(out["tail"]) - log_nt

    def small_term(_):
        return jnp.where(ali_pix > all_pix * p,
                         -jnp.log10(term0) - log_nt,
                         jnp.asarray(-log_nt, dt))

    def nontrivial(_):
        return jax.lax.cond(jnp.abs(term0) < 100.0 * EPS,
                            small_term, tail_sum, None)

    def edge(_):
        return jnp.where((all_pix == 0.0) | (ali_pix == 0.0),
                         jnp.asarray(-log_nt, dt),
                         -log_nt - all_pix * jnp.log10(p))

    return jax.lax.cond((all_pix == 0.0) | (ali_pix == 0.0) |
                        (all_pix == ali_pix), edge, nontrivial, None)


def rectangle_improver(rec, deg_map, log_nt, kernel: str = "xla",
                       row0=0, axis=None, n_rows=None):
    """Greedy NFA improvement (reference: RectangleImprover,
    myLSD.cpp:1061-1158): 5x p/2, 5x wid-0.5, 5x each lateral shift,
    5x p/2, stopping at the first phase that reaches NFA > 0.
    Returns (log_nfa, rec)."""
    delt = 0.5
    delt2 = delt / 2.0
    nfa_kw = dict(row0=row0, axis=axis, n_rows=n_rows)
    log_nfa = rectangle_nfa(rec, deg_map, log_nt, kernel, **nfa_kw)

    def phase(carry, update_fn, gated: bool):
        """Run one 5-iteration improvement phase unless already valid."""
        log_nfa, best = carry

        def run(_):
            def body(_i, st):
                nfa_v, best, new = st
                new2 = update_fn(dict(new))
                # gated phases skip the trial (and the shrink) once the
                # width floor would be crossed (myLSD.cpp:1098,1113,1128)
                do = (new["wid"] - delt >= 0.5) if gated else jnp.array(True)
                new2 = jax.tree.map(
                    lambda a, b: jnp.where(do, a, b), new2, new)
                cand = rectangle_nfa(new2, deg_map, log_nt, kernel,
                                     **nfa_kw)
                better = do & (cand > nfa_v)
                best2 = jax.tree.map(
                    lambda a, b: jnp.where(better, a, b), new2, best)
                return (jnp.where(better, cand, nfa_v), best2, new2)

            nfa_v, best2, _new = jax.lax.fori_loop(
                0, 5, body, (log_nfa, best, dict(best)))
            return nfa_v, best2

        return jax.lax.cond(log_nfa > 0.0, lambda _: (log_nfa, best),
                            run, None)

    def half_p(r):
        r["p"] = r["p"] / 2.0
        r["prec"] = r["p"] * PI
        return r

    def shrink_wid(r):
        r["wid"] = r["wid"] - delt
        return r

    def shift_side1(r):
        r["x1"] = r["x1"] - r["dy"] * delt2
        r["y1"] = r["y1"] + r["dx"] * delt2
        r["x2"] = r["x2"] - r["dy"] * delt2
        r["y2"] = r["y2"] + r["dx"] * delt2
        r["wid"] = r["wid"] - delt
        return r

    def shift_side2(r):
        r["x1"] = r["x1"] + r["dy"] * delt2
        r["y1"] = r["y1"] - r["dx"] * delt2
        r["x2"] = r["x2"] + r["dy"] * delt2
        r["y2"] = r["y2"] - r["dx"] * delt2
        r["wid"] = r["wid"] - delt
        return r

    carry = (log_nfa, dict(rec))
    carry = phase(carry, half_p, gated=False)
    carry = phase(carry, shrink_wid, gated=True)
    carry = phase(carry, shift_side1, gated=True)
    carry = phase(carry, shift_side2, gated=True)
    carry = phase(carry, half_p, gated=False)
    return carry
