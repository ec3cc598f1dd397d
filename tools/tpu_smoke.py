"""Fast on-chip smoke of every kernel path changed this round (~2-4 min
incl. compiles): run FIRST when the TPU returns, before the full
round2_measure.sh, so a Mosaic legalization surprise surfaces in
minutes, not mid-runbook.

Covers: mega-bounce kernel with the last-bounce specialization (tiny
Cornell+teapot), a >2048-tri dense mesh through the auto-32-row path,
the flattened staged scene-intersect kernel on a textured scene, and
the big-mesh piece scan with the root-box window clamp. Each stage
cross-checks against the jnp spec path.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def check(name, a, b, tol=1e-3):
    a = np.asarray(a)
    b = np.asarray(b)
    d = np.abs(a - b)
    ok = d.max() <= tol + tol * np.abs(b).max()
    print(f"[smoke] {name}: max|diff|={d.max():.2e} {'OK' if ok else 'MISMATCH'}",
          flush=True)
    if not ok:
        raise SystemExit(f"{name} mismatch")


def main():
    import jax

    if os.environ.get("RT_SMOKE_CPU") == "1":  # script-logic check off-chip
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    print("[smoke] devices:", jax.devices(), flush=True)
    if jax.default_backend() != "tpu":
        print("[smoke] WARNING: not on TPU — kernels run in interpret "
              "mode (script-logic check only)", flush=True)

    import bench
    from cs397raytracingsp22_tpu.ops.pallas import bounce as B
    from cs397raytracingsp22_tpu.render import integrator
    from cs397raytracingsp22_tpu.utils import threefry

    # 1. mega kernel (last-bounce specialization) on tiny bench scene
    t0 = time.perf_counter()
    scene = bench.build_bench_scene(32, 32, spp=2, path_depth=4)
    data = scene.compile()
    tables = B.build_bounce_tables(data)
    key = threefry.key_words(3)
    n = 1024
    o, d = scene.camera.generate_rays(
        key, jnp.arange(n // 2, dtype=jnp.int32), spp=2
    )
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)
    uids = jnp.arange(n, dtype=jnp.int32)
    rad_k, segs_k = B.path_trace_pallas(data, tables, o, d, uids, key, 4, 100.0)
    rad_j, segs_j = integrator.path_trace(data, o, d, uids, key, 4, 100.0)
    check("mega-kernel last-bounce", rad_k, rad_j)
    assert float(segs_k) == float(segs_j), (float(segs_k), float(segs_j))
    print(f"[smoke] stage 1 wall {time.perf_counter()-t0:.1f}s", flush=True)

    # 2. 6k-tri dense mesh through the auto-32-row mega path
    t0 = time.perf_counter()
    six = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "assets", "teapot_6k.obj")
    os.environ["RT_TEAPOT"] = six  # read at build time by build_bench_scene
    scene6 = bench.build_bench_scene(32, 32, spp=2, path_depth=3)
    data6 = scene6.compile()
    assert B.scene_is_simple(data6)
    rows = B._auto_block_rows(sum(c for _, c in data6.kmesh_ranges))
    print(f"[smoke] 6k dense auto block rows = {rows}", flush=True)
    tables6 = B.build_bounce_tables(data6)
    rad6_k, _ = B.path_trace_pallas(data6, tables6, o, d, uids, key, 3, 100.0)
    rad6_j, _ = integrator.path_trace(data6, o, d, uids, key, 3, 100.0)
    check("6k dense mega (32-row)", rad6_k, rad6_j)
    os.environ.pop("RT_TEAPOT")
    print(f"[smoke] stage 2 wall {time.perf_counter()-t0:.1f}s", flush=True)

    # 3. flattened staged kernel + big-mesh clamp on a textured big scene
    t0 = time.perf_counter()
    from scenes import textured_spheres
    from cs397raytracingsp22_tpu.ops.intersect import (
        intersect_scene_fused, intersect_scene_jnp,
    )

    ts = textured_spheres.build(width=32, height=32, spp=2).compile()
    otx, dtx = o, d
    u_vol = jnp.zeros((n, max(1, ts.vol_center.shape[0])), jnp.float32) + 0.5
    f = jax.jit(lambda o_, d_: intersect_scene_fused(
        ts, o_, d_, 1e-3, 100.0, u_vol))
    g = jax.jit(lambda o_, d_: intersect_scene_jnp(
        ts, o_, d_, 1e-3, 100.0, u_vol))
    hf = f(otx, dtx)
    hj = g(otx, dtx)
    np.testing.assert_array_equal(np.asarray(hf.valid), np.asarray(hj.valid))
    m = np.asarray(hf.valid)
    check("staged+clamp t", np.asarray(hf.t)[m], np.asarray(hj.t)[m], tol=1e-4)
    print(f"[smoke] stage 3 wall {time.perf_counter()-t0:.1f}s", flush=True)

    # 4. RT_KEYCMP=u (unsigned min / t_min-shifted scan) through all
    # three kernels — validates the Mosaic uint32-compare lowering that
    # interpret-mode tests cannot; winners must match the s-mode runs
    # bit-for-bit (mega kernel) / hit-for-hit (staged).
    t0 = time.perf_counter()
    os.environ["RT_KEYCMP"] = "u"
    try:
        rad_u, segs_u = B.path_trace_pallas(
            data, tables, o, d, uids, key, 4, 100.0
        )
        check("mega-kernel keycmp=u", rad_u, rad_k, tol=1e-6)
        assert float(segs_u) == float(segs_k)
        fu = jax.jit(lambda o_, d_: intersect_scene_fused(
            ts, o_, d_, 1e-3, 100.0, u_vol))
        hu = fu(otx, dtx)
        np.testing.assert_array_equal(
            np.asarray(hu.valid), np.asarray(hf.valid)
        )
        mu = np.asarray(hu.valid)
        check("staged keycmp=u t", np.asarray(hu.t)[mu],
              np.asarray(hf.t)[mu], tol=1e-5)
    finally:
        os.environ.pop("RT_KEYCMP")
    print(f"[smoke] stage 4 wall {time.perf_counter()-t0:.1f}s", flush=True)

    print("[smoke] ALL OK", flush=True)


if __name__ == "__main__":
    main()
