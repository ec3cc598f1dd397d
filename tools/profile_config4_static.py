"""End-to-end + phase attribution of the config-4 STATIC staged path.

Measures what the driver actually dispatches for a textured/big-mesh
chunk at HEAD: derives the predicted width schedule exactly like
render_chunk_staged (shrink + collect_live, RT_STATIC_MARGIN), then
times path_trace_static as ONE fused program. With --phases, also times
each pipeline stage standalone at every scheduled width (sort,
intersect incl. big-mesh piece scans, the piece scans alone, BSDF) so
the fused wall can be attributed.

Run on TPU:  python tools/profile_config4_static.py [n_log2] [--phases]
A/B knobs (fresh process each): RT_SORT, RT_VIS_BITS, RT_BIG_ROWS,
RT_STATIC_MARGIN, RT_KEY_BITS.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from scenes import textured_spheres
from cs397raytracingsp22_tpu.render import driver, integrator
from cs397raytracingsp22_tpu.utils import threefry


def timed(fn, *args, reps=3, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


def main():
    nlog = 18
    phases = False
    for a in sys.argv[1:]:
        if a == "--phases":
            phases = True
        else:
            nlog = int(a)
    n = 1 << nlog
    scene = textured_spheres.build(width=512, height=512, spp=64)
    data = scene.compile()
    cam = scene.camera
    key = threefry.key_words(0)
    ids = jnp.arange(n, dtype=jnp.int32) % (512 * 512)
    o, d = cam.generate_rays(key, ids, spp=1, sample_offset=jnp.int32(0))
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)
    uids = ids
    depth = cam.path_depth

    # derive the schedule the driver would bake (first-chunk live counts
    # x margin, power-of-4 buckets)
    live: list = []
    rad, segs = integrator.path_trace_shrink(
        data, o, d, uids, key, depth, cam.max_trace_dist, collect_live=live
    )
    jax.block_until_ready(rad)
    counts = [int(x) for x in live]
    margin = float(os.environ.get("RT_STATIC_MARGIN", "1.5"))
    widths = driver._build_width_schedule(
        n, counts, depth, margin,
        min_width=int(os.environ.get("RT_STATIC_MIN_WIDTH", "4096")),
    )
    print(f"n={n} depth={depth} live={counts}", flush=True)
    print(f"widths={widths}", flush=True)

    f = lambda: integrator.path_trace_static(
        data, o, d, uids, key, depth, cam.max_trace_dist, widths
    )
    w, (rad2, segs2, ok) = timed(f)
    segs2 = float(segs2)
    print(
        f"static fused: {w*1e3:7.1f} ms  {segs2/1e6:.3f}M live segs  "
        f"-> {segs2/w/1e6:.2f} Mrays/s  ok={bool(ok)}",
        flush=True,
    )

    if not phases:
        return

    # --- standalone stages at each scheduled width ---
    from cs397raytracingsp22_tpu.ops import intersect as isect
    from cs397raytracingsp22_tpu.ops import bsdf
    from cs397raytracingsp22_tpu.ops.pallas.tri_scan_big import (
        tri_scan_big_pallas,
    )

    uniq = sorted(set(widths), reverse=True)
    tot = {"sort": 0.0, "isect": 0.0, "big": 0.0, "bsdf": 0.0}
    for wd in uniq:
        reps_at = widths.count(wd)
        ow, dw, uw = o[:wd], d[:wd], uids[:wd]
        thr = jnp.ones((wd, 3), jnp.float32)
        radw = jnp.zeros((wd, 3), jnp.float32)
        alive = jnp.ones((wd,), bool)
        pos = jnp.arange(wd, dtype=jnp.int32)

        w_sort, _ = timed(
            jax.jit(
                lambda o_, d_, t_, r_, u_, p_, a_: integrator._sort_state(
                    o_, d_, t_, r_, u_, p_, a_, scene=data
                )
            ),
            ow, dw, thr, radw, uw, pos, alive,
        )
        uv = jnp.zeros((wd, data.vol_center.shape[0]), jnp.float32)
        w_is, hit = timed(
            jax.jit(
                lambda o_, d_: isect.intersect_scene(
                    data, o_, d_, 0.001, cam.max_trace_dist, uv
                )
            ),
            ow, dw,
        )
        w_bigs = 0.0
        for mesh in data.meshes:
            if mesh.big_bw is None:
                continue
            oo = isect._transform_point(mesh.inv_transform, ow)
            dd = isect._transform_vector(mesh.inv_transform, dw)
            wb, _ = timed(
                jax.jit(
                    lambda a_, b_, m=mesh: tri_scan_big_pallas(
                        a_, b_, m.big_bw, m.big_box, m.big_sl, 0.001,
                        jnp.full((wd,), cam.max_trace_dist, jnp.float32),
                    )
                ),
                oo, dd,
            )
            w_bigs += wb
        ball = jnp.full((wd, 3), 0.3, jnp.float32)
        uc = jnp.full((wd,), 0.4, jnp.float32)
        w_b, _ = timed(
            jax.jit(lambda h, d_: bsdf.scatter(h, d_, ball, uc)), hit, dw
        )
        print(
            f"  width {wd:7d} x{reps_at}:  sort {w_sort*1e3:6.1f}  "
            f"isect {w_is*1e3:6.1f} (big scans {w_bigs*1e3:6.1f})  "
            f"bsdf {w_b*1e3:5.1f} ms",
            flush=True,
        )
        tot["sort"] += w_sort * reps_at
        tot["isect"] += w_is * reps_at
        tot["big"] += w_bigs * reps_at
        tot["bsdf"] += w_b * reps_at
    ssum = tot["sort"] + tot["isect"] + tot["bsdf"]
    print(
        f"stage totals over schedule: sort {tot['sort']*1e3:.1f}  "
        f"isect {tot['isect']*1e3:.1f} (big {tot['big']*1e3:.1f})  "
        f"bsdf {tot['bsdf']*1e3:.1f}  sum {ssum*1e3:.1f} ms  "
        f"vs fused {w*1e3:.1f} ms",
        flush=True,
    )


if __name__ == "__main__":
    main()
