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


def _coords(shape):
    yy = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return yy, xx


def _wrap_pi(d):
    """Wrap into (-pi, pi] (reference while-loop semantics,
    myLSD.cpp:646-655)."""
    w = jnp.mod(d + PI, 2 * PI)
    w = jnp.where(w == 0.0, 2 * PI, w)
    return w - PI


def rectangle_converter(cur, seed_deg, mag, ali_pro, deg_thre: float):
    """cur: (H, W) bool region mask; seed_deg: running region angle.
    Returns rect dict (reference: RectangleConverter, myLSD.cpp:669-734)."""
    dt = mag.dtype
    yy, xx = _coords(cur.shape)
    xf = xx.astype(dt)
    yf = yy.astype(dt)
    w = jnp.where(cur, mag, 0.0)
    ws = jnp.sum(w)
    cen_x = jnp.sum(w * xf) / ws
    cen_y = jnp.sum(w * yf) / ws

    dxp = xf - cen_x
    dyp = yf - cen_y
    ixx = jnp.sum(w * dyp * dyp) / ws
    iyy = jnp.sum(w * dxp * dxp) / ws
    ixy = -jnp.sum(w * dxp * dyp) / ws
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
    len_min = jnp.minimum(0.0, jnp.min(lx_m))
    len_max = jnp.maximum(0.0, jnp.max(lx_p))
    wid_min = jnp.minimum(0.0, jnp.min(wx_m))
    wid_max = jnp.maximum(0.0, jnp.max(wx_p))
    wid = wid_max - wid_min
    return {
        "x1": cen_x + len_min * dxu, "y1": cen_y + len_min * dyu,
        "x2": cen_x + len_max * dxu, "y2": cen_y + len_max * dyu,
        "wid": jnp.maximum(wid, 1.0), "c_x": cen_x, "c_y": cen_y,
        "deg": inertia, "dx": dxu, "dy": dyu,
        "p": jnp.asarray(ali_pro, dt), "prec": jnp.asarray(deg_thre, dt),
    }


def density(cur, rec):
    n = jnp.sum(cur).astype(rec["x1"].dtype)
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
                   den_thre: float, deg_thre: float):
    """Shrink radius x0.75 dropping far pixels until dense enough
    (reference: RegionRadiusReducer, myLSD.cpp:736-802).
    Returns (ok, cur, rec)."""
    dt = mag.dtype
    yy, xx = _coords(cur.shape)
    d_seed = jnp.sqrt((xx.astype(dt) - seed_x) ** 2 +
                      (yy.astype(dt) - seed_y) ** 2)

    rad1 = jnp.sqrt((seed_x - rec["x1"]) ** 2 + (seed_y - rec["y1"]) ** 2)
    rad2 = jnp.sqrt((seed_x - rec["x2"]) ** 2 + (seed_y - rec["y2"]) ** 2)
    state = dict(cur=cur, rec=rec, rad=jnp.maximum(rad1, rad2),
                 den=density(cur, rec), alive=jnp.sum(cur) >= 2)

    def cond(s):
        return s["alive"] & (s["den"] < den_thre)

    def body(s):
        rad = s["rad"] * 0.75
        keep = s["cur"] & (d_seed <= rad)
        n = jnp.sum(keep)
        alive = n >= 2
        rec2 = rectangle_converter(keep, seed_deg, mag, rec["p"], deg_thre)
        rec2 = jax.tree.map(lambda a, b: jnp.where(alive, a, b),
                            rec2, s["rec"])
        return dict(cur=keep, rec=rec2, rad=rad,
                    den=jnp.where(alive, density(keep, rec2), jnp.inf),
                    alive=alive)

    out = jax.lax.while_loop(cond, body, state)
    return out["alive"], out["cur"], out["rec"]


def refiner(seed_x, seed_y, seed_deg, cur, rec, mag, deg_map,
            den_thre: float, deg_thre: float, grow_fn,
            exact_order: bool = False):
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
    den0 = density(cur, rec)

    def no_refine(_):
        return jnp.array(True), cur, seed_deg, rec

    def do_refine(_):
        yy, xx = _coords(cur.shape)
        d_seed = jnp.sqrt((xx.astype(dt) - seed_x) ** 2 +
                          (yy.astype(dt) - seed_y) ** 2)
        iy = jnp.clip(seed_y.astype(jnp.int32), 0, cur.shape[0] - 1)
        ix = jnp.clip(seed_x.astype(jnp.int32), 0, cur.shape[1] - 1)
        cen_deg = deg_map[iy, ix]
        near = cur & (d_seed < rec["wid"])
        dif = _wrap_pi(deg_map - cen_deg)
        difm = jnp.where(near, dif, 0.0)
        dif_sum = jnp.sum(difm)
        squ_sum = jnp.sum(difm * difm)
        n = jnp.sum(near).astype(dt)
        mean = dif_sum / n
        new_thre = 2.0 * jnp.sqrt((squ_sum - 2 * mean * dif_sum) / n +
                                  mean * mean)
        if exact_order:
            cur2, reg_deg2, qy2, qx2, n2 = grow_fn(cen_deg, new_thre)
            size2 = n2
        else:
            cur2, reg_deg2 = grow_fn(cen_deg, new_thre)
            size2 = jnp.sum(cur2)

        def grown(_):
            rec2 = rectangle_converter(cur2, reg_deg2, mag, rec["p"],
                                       deg_thre)

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
                        den_thre, deg_thre)
                return ok, cur3, reg_deg2, rec3

            return jax.lax.cond(density(cur2, rec2) >= den_thre,
                                dense, sparse, None)

        def tiny(_):
            return jnp.array(False), cur2, reg_deg2, rec

        return jax.lax.cond(size2 >= 2, grown, tiny, None)

    return jax.lax.cond(den0 >= den_thre, no_refine, do_refine, None)
