"""Rectangle fitting over region masks: centroid, inertia orientation,
endpoint projection, density refinement.

TPU-native form of reference CenterGetter/OrientationGetter/
RectangleConverter/Refiner/RegionRadiusReducer (LSD/myLSD.cpp:592-880).
The reference walks malloc'd point lists; here a region is a boolean
mask over the (downsampled) map and every moment is a masked full-image
reduction, so each fit is a handful of VPU reductions with no dynamic
shapes.  Rectangles are dicts of traced scalars.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

PI = math.pi


def _coords(shape, row0=0):
    """Global pixel coordinates; row0 is this device's first global row
    when the field is row-block-sharded (lsd_sharded), else 0."""
    yy = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + row0
    xx = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return yy, xx


def _rsum(x, axis):
    """Full-field sum: jnp.sum of the local block, psum'd over the map
    axis when sharded - every device then carries the GLOBAL scalar, so
    all downstream control flow stays replicated."""
    s = jnp.sum(x)
    return jax.lax.psum(s, axis) if axis else s


def _rmin(x, axis):
    m = jnp.min(x)
    return jax.lax.pmin(m, axis) if axis else m


def _rmax(x, axis):
    m = jnp.max(x)
    return jax.lax.pmax(m, axis) if axis else m


def field_at(field, iy, ix, row0=0, axis=None):
    """field[iy, ix] with GLOBAL row index iy under row-block sharding:
    the owning device reads its block, everyone else contributes 0, and
    a psum broadcasts the value."""
    if not axis:
        return field[iy, ix]
    H = field.shape[0]
    ly = iy - row0
    mine = (ly >= 0) & (ly < H)
    v = jnp.where(mine, field[jnp.clip(ly, 0, H - 1), ix], 0.0)
    return jax.lax.psum(v, axis)


def _wrap_pi(d):
    """Wrap into (-pi, pi] (reference while-loop semantics,
    myLSD.cpp:646-655)."""
    w = jnp.mod(d + PI, 2 * PI)
    w = jnp.where(w == 0.0, 2 * PI, w)
    return w - PI


def rectangle_converter(cur, seed_deg, mag, ali_pro, deg_thre: float,
                        row0=0, axis=None):
    """cur: (H, W) bool region mask; seed_deg: running region angle.
    Returns rect dict (reference: RectangleConverter, myLSD.cpp:669-734).
    row0/axis: global row offset + mesh axis when the field is
    row-block-sharded (mapprep/lsd_sharded) - every moment then reduces
    with one psum and the rect scalars are replicated."""
    dt = mag.dtype
    yy, xx = _coords(cur.shape, row0)
    xf = xx.astype(dt)
    yf = yy.astype(dt)
    w = jnp.where(cur, mag, 0.0)
    ws = _rsum(w, axis)
    cen_x = _rsum(w * xf, axis) / ws
    cen_y = _rsum(w * yf, axis) / ws

    dxp = xf - cen_x
    dyp = yf - cen_y
    ixx = _rsum(w * dyp * dyp, axis) / ws
    iyy = _rsum(w * dxp * dxp, axis) / ws
    ixy = -_rsum(w * dxp * dyp, axis) / ws
    lamb = (ixx + iyy - jnp.sqrt((ixx - iyy) ** 2 + 4 * ixy * ixy)) / 2.0
    inertia = jnp.where(jnp.abs(ixx) > jnp.abs(iyy),
                        jnp.arctan2(lamb - ixx, ixy),
                        jnp.arctan2(ixy, lamb - iyy))
    reg_dif = jnp.abs(_wrap_pi(inertia - seed_deg))
    inertia = jnp.where(reg_dif > deg_thre, inertia + PI, inertia)

    dxu = jnp.cos(inertia)
    dyu = jnp.sin(inertia)
    lx = dxp * dxu + dyp * dyu
    wx = -dxp * dyu + dyp * dxu
    big = jnp.asarray(jnp.inf, dt)
    lx_m = jnp.where(cur, lx, big)
    lx_p = jnp.where(cur, lx, -big)
    wx_m = jnp.where(cur, wx, big)
    wx_p = jnp.where(cur, wx, -big)
    len_min = jnp.minimum(0.0, _rmin(lx_m, axis))
    len_max = jnp.maximum(0.0, _rmax(lx_p, axis))
    wid_min = jnp.minimum(0.0, _rmin(wx_m, axis))
    wid_max = jnp.maximum(0.0, _rmax(wx_p, axis))
    wid = wid_max - wid_min
    return {
        "x1": cen_x + len_min * dxu, "y1": cen_y + len_min * dyu,
        "x2": cen_x + len_max * dxu, "y2": cen_y + len_max * dyu,
        "wid": jnp.maximum(wid, 1.0), "c_x": cen_x, "c_y": cen_y,
        "deg": inertia, "dx": dxu, "dy": dyu,
        "p": jnp.asarray(ali_pro, dt), "prec": jnp.asarray(deg_thre, dt),
    }


def density(cur, rec, axis=None):
    n = _rsum(cur, axis).astype(rec["x1"].dtype)
    length = jnp.sqrt((rec["x1"] - rec["x2"]) ** 2 +
                      (rec["y1"] - rec["y2"]) ** 2)
    return n / (length * rec["wid"])


def _density_n(n, rec):
    """den = num / (len * wid) with num the POINT-LIST length (the
    phantom-dropped point is excluded from the list but not the mask,
    myLSD.cpp:779; see radius_reducer_fifo)."""
    length = jnp.sqrt((rec["x1"] - rec["x2"]) ** 2 +
                      (rec["y1"] - rec["y2"]) ** 2)
    return n.astype(rec["x1"].dtype) / (length * rec["wid"])


def radius_reducer_fifo(seed_x, seed_y, seed_deg, qy, qx, n, cur, rec,
                        mag, den_thre: float, deg_thre: float):
    """Exact-order radius shrink for the bit-parity path (config
    lsd.growth="fifo"): replicates the reference's swap-with-last
    removal loop AND its `i <= num` phantom-slot quirk
    (RegionRadiusReducer, myLSD.cpp:736-802; oracle
    region_radius_reducer) - the one-past slot reads (0, 0) on this
    platform, whose distance from the seed almost always exceeds the
    radius, so every shrink pass additionally drops the REAL last point
    from the fit list while its curMap pixel stays set.

    qy/qx: (cap,) growth queue in acceptance order; n: live count.
    Returns (ok, cur, rec) where cur keeps the phantom-lost pixels
    (C++ curMap semantics - it is what usedMap marking consumes) while
    the rectangle is fitted on the live list only."""
    dt = mag.dtype
    sx = seed_x.astype(dt)
    sy = seed_y.astype(dt)

    rad1 = jnp.sqrt((sx - rec["x1"]) ** 2 + (sy - rec["y1"]) ** 2)
    rad2 = jnp.sqrt((sx - rec["x2"]) ** 2 + (sy - rec["y2"]) ** 2)
    state = dict(qy=qy, qx=qx, n=n, cur=cur, fit=cur, rec=rec,
                 rad=jnp.maximum(rad1, rad2), den=_density_n(n, rec),
                 alive=n >= 2)

    def cond(s):
        return s["alive"] & (s["den"] < den_thre)

    def body(s):
        rad = s["rad"] * 0.75

        def rcond(t):
            return t["i"] < t["n"]

        def rbody(t):
            yi = t["qy"][t["i"]]
            xi = t["qx"][t["i"]]
            d = jnp.sqrt((sx - xi.astype(dt)) ** 2 +
                         (sy - yi.astype(dt)) ** 2)
            far = d > rad
            last = t["n"] - 1
            return dict(
                qy=t["qy"].at[t["i"]].set(
                    jnp.where(far, t["qy"][last], yi)),
                qx=t["qx"].at[t["i"]].set(
                    jnp.where(far, t["qx"][last], xi)),
                n=t["n"] - far.astype(jnp.int32),
                i=t["i"] + (~far).astype(jnp.int32),
                cur=t["cur"].at[yi, xi].set(t["cur"][yi, xi] & ~far),
                fit=t["fit"].at[yi, xi].set(t["fit"][yi, xi] & ~far))

        r = jax.lax.while_loop(rcond, rbody, dict(
            qy=s["qy"], qx=s["qx"], n=s["n"], i=jnp.int32(0),
            cur=s["cur"], fit=s["fit"]))

        # phantom-slot drop (the reference's final `i == num` pass):
        # the (0,0) phantom is "far" whenever the seed is farther from
        # the origin than rad, killing the real last point from the
        # LIST only; curMap[0][0] is cleared (the sentinel, a no-op in
        # any real region)
        ph = (jnp.sqrt(sx * sx + sy * sy) > rad) & (r["n"] > 0)
        last = jnp.maximum(r["n"] - 1, 0)
        fit = r["fit"].at[r["qy"][last], r["qx"][last]].set(
            jnp.where(ph, False, r["fit"][r["qy"][last], r["qx"][last]]))
        cur2 = r["cur"].at[0, 0].set(jnp.where(ph, False, r["cur"][0, 0]))
        n2 = r["n"] - ph.astype(jnp.int32)

        alive = n2 >= 2
        rec2 = rectangle_converter(fit, seed_deg, mag, rec["p"], deg_thre)
        rec2 = jax.tree.map(lambda a, b: jnp.where(alive, a, b),
                            rec2, s["rec"])
        return dict(qy=r["qy"], qx=r["qx"], n=n2, cur=cur2, fit=fit,
                    rec=rec2, rad=rad,
                    den=jnp.where(alive, _density_n(n2, rec2), jnp.inf),
                    alive=alive)

    out = jax.lax.while_loop(cond, body, state)
    return out["alive"], out["cur"], out["rec"]


def radius_reducer(seed_x, seed_y, seed_deg, cur, rec, mag,
                   den_thre: float, deg_thre: float, row0=0, axis=None):
    """Shrink radius x0.75 dropping far pixels until dense enough
    (reference: RegionRadiusReducer, myLSD.cpp:736-802).
    Returns (ok, cur, rec)."""
    dt = mag.dtype
    yy, xx = _coords(cur.shape, row0)
    d_seed = jnp.sqrt((xx.astype(dt) - seed_x) ** 2 +
                      (yy.astype(dt) - seed_y) ** 2)

    rad1 = jnp.sqrt((seed_x - rec["x1"]) ** 2 + (seed_y - rec["y1"]) ** 2)
    rad2 = jnp.sqrt((seed_x - rec["x2"]) ** 2 + (seed_y - rec["y2"]) ** 2)
    state = dict(cur=cur, rec=rec, rad=jnp.maximum(rad1, rad2),
                 den=density(cur, rec, axis),
                 alive=_rsum(cur, axis) >= 2)

    def cond(s):
        return s["alive"] & (s["den"] < den_thre)

    def body(s):
        rad = s["rad"] * 0.75
        keep = s["cur"] & (d_seed <= rad)
        n = _rsum(keep, axis)
        alive = n >= 2
        rec2 = rectangle_converter(keep, seed_deg, mag, rec["p"],
                                   deg_thre, row0, axis)
        rec2 = jax.tree.map(lambda a, b: jnp.where(alive, a, b),
                            rec2, s["rec"])
        return dict(cur=keep, rec=rec2, rad=rad,
                    den=jnp.where(alive, density(keep, rec2, axis),
                                  jnp.inf),
                    alive=alive)

    out = jax.lax.while_loop(cond, body, state)
    return out["alive"], out["cur"], out["rec"]


def refiner(seed_x, seed_y, seed_deg, cur, rec, mag, deg_map,
            den_thre: float, deg_thre: float, grow_fn,
            exact_order: bool = False, row0=0, axis=None):
    """Re-estimate angle tolerance from pixels near the seed and regrow
    (reference: Refiner, myLSD.cpp:804-880).  grow_fn(cen_deg,
    new_thre) -> (cur, reg_deg) regrows from the seed at center angle
    cen_deg with tolerance new_thre (the usedMap ban is the closure's
    business - lsd.py); with exact_order=True it must return
    (cur, reg_deg, qy, qx, n) and density refinement runs the
    point-ordered reducer incl. the phantom-slot quirk
    (radius_reducer_fifo) - the bit-parity path.
    Returns (ok, cur, reg_deg, rec)."""
    dt = mag.dtype
    den0 = density(cur, rec, axis)

    def no_refine(_):
        return jnp.array(True), cur, seed_deg, rec

    def do_refine(_):
        yy, xx = _coords(cur.shape, row0)
        d_seed = jnp.sqrt((xx.astype(dt) - seed_x) ** 2 +
                          (yy.astype(dt) - seed_y) ** 2)
        if axis:
            # seed_y is a GLOBAL row: the owner broadcasts deg_map there
            cen_deg = field_at(deg_map, seed_y.astype(jnp.int32),
                               jnp.clip(seed_x.astype(jnp.int32), 0,
                                        cur.shape[1] - 1),
                               row0, axis)
        else:
            iy = jnp.clip(seed_y.astype(jnp.int32), 0, cur.shape[0] - 1)
            ix = jnp.clip(seed_x.astype(jnp.int32), 0, cur.shape[1] - 1)
            cen_deg = deg_map[iy, ix]
        near = cur & (d_seed < rec["wid"])
        dif = _wrap_pi(deg_map - cen_deg)
        difm = jnp.where(near, dif, 0.0)
        dif_sum = _rsum(difm, axis)
        squ_sum = _rsum(difm * difm, axis)
        n = _rsum(near, axis).astype(dt)
        mean = dif_sum / n
        new_thre = 2.0 * jnp.sqrt((squ_sum - 2 * mean * dif_sum) / n +
                                  mean * mean)
        if exact_order:
            if axis:
                raise ValueError(
                    "exact_order (fifo) growth is inherently sequential "
                    "and unsupported under map-block sharding")
            cur2, reg_deg2, qy2, qx2, n2 = grow_fn(cen_deg, new_thre)
            size2 = n2
        else:
            cur2, reg_deg2 = grow_fn(cen_deg, new_thre)
            size2 = _rsum(cur2, axis)

        def grown(_):
            rec2 = rectangle_converter(cur2, reg_deg2, mag, rec["p"],
                                       deg_thre, row0, axis)

            def dense(_):
                return jnp.array(True), cur2, reg_deg2, rec2

            def sparse(_):
                if exact_order:
                    ok, cur3, rec3 = radius_reducer_fifo(
                        seed_x, seed_y, reg_deg2, qy2, qx2, size2,
                        cur2, rec2, mag, den_thre, deg_thre)
                else:
                    ok, cur3, rec3 = radius_reducer(
                        seed_x, seed_y, reg_deg2, cur2, rec2, mag,
                        den_thre, deg_thre, row0, axis)
                return ok, cur3, reg_deg2, rec3

            return jax.lax.cond(density(cur2, rec2, axis) >= den_thre,
                                dense, sparse, None)

        def tiny(_):
            return jnp.array(False), cur2, reg_deg2, rec

        return jax.lax.cond(size2 >= 2, grown, tiny, None)

    return jax.lax.cond(den0 >= den_thre, no_refine, do_refine, None)
