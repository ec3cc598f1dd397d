"""Per-dispatch submission floor on the tunneled TPU + fused-chunk A/B.

Three questions that decide the staged executor's e2e ceiling on this
environment (config-4 512²·32spp measures 3.7 s e2e against ~0.9 s of
chunk-level compute — the difference is per-dispatch overhead):

  1. chain:  N CHAINED tiny jitted dispatches (each consumes the
     previous output) — the staged executor's shape. Per-call wall is
     the submission floor if the tunnel syncs per execute.
  2. indep:  N INDEPENDENT tiny dispatches — do submissions pipeline
     when there is no data dependency?
  3. fused:  ONE jit around the whole path_trace_static chunk vs the
     eager per-bounce composition, at the config-4 optimal chunk
     (65,536 px × 32 spp = 2.1M rays). Round 4 measured the fused
     form 8× SLOWER at 262k rays ("XLA scheduling of the giant
     program pessimizes the Pallas call chain", driver.py NOTE); this
     re-measures at the retuned chunk size before accepting that the
     submission floor is unavoidable.

Run on TPU: python tools/probe_dispatch_floor.py [which ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def sync(x):
    jax.block_until_ready(x)
    return x


def probe_chain(n=16, reps=5):
    f = jax.jit(lambda x: x * 1.000001 + 1.0)
    x = jnp.ones((1024, 128), jnp.float32)
    x = sync(f(x))
    float(x[0, 0])  # true host sync in warmup (axon quirk)
    t0 = time.perf_counter()
    for _ in range(reps):
        y = x
        for _ in range(n):
            y = f(y)
        sync(y)
    wall = (time.perf_counter() - t0) / reps
    print(f"chain: {n} chained dispatches -> {wall*1e3:.1f} ms "
          f"({wall/n*1e3:.2f} ms/dispatch)")


def probe_indep(n=16, reps=5):
    f = jax.jit(lambda x: x * 1.000001 + 1.0)
    xs = [jnp.full((1024, 128), float(i), jnp.float32) for i in range(n)]
    ys = [sync(f(x)) for x in xs]
    float(ys[0][0, 0])
    t0 = time.perf_counter()
    for _ in range(reps):
        ys = [f(x) for x in xs]
        sync(ys)
    wall = (time.perf_counter() - t0) / reps
    print(f"indep: {n} independent dispatches -> {wall*1e3:.1f} ms "
          f"({wall/n*1e3:.2f} ms/dispatch)")


def probe_fused(reps=3):
    from scenes import textured_spheres
    from cs397raytracingsp22_tpu.render import integrator
    from cs397raytracingsp22_tpu.render.driver import (
        _build_width_schedule, _gen_chunk_rays,
    )
    from cs397raytracingsp22_tpu.utils import threefry

    scene = textured_spheres.build(width=512, height=512, spp=32)
    data = scene.compile()
    cam = scene.camera
    key = threefry.key_words(0)
    ids = jnp.arange(65536, dtype=jnp.int32) * jnp.int32(4)  # strided
    o, d, uids = _gen_chunk_rays(cam, ids, key, jnp.int32(0), 32, 1)
    n = o.shape[0]
    live: list = []
    rad, segs = integrator.path_trace_shrink(
        data, o, d, uids, key, cam.path_depth, cam.max_trace_dist,
        collect_live=live,
    )
    sync(rad)
    widths = _build_width_schedule(
        n, [int(x) for x in live], cam.path_depth, 1.5
    )
    print(f"fused-A/B chunk: n={n}, widths={widths}")

    def run_eager():
        r, s, ok = integrator.path_trace_static(
            data, o, d, uids, key, cam.path_depth, cam.max_trace_dist,
            widths=widths,
        )
        return r

    fused = jax.jit(
        lambda o, d, uids: integrator.path_trace_static(
            data, o, d, uids, key, cam.path_depth, cam.max_trace_dist,
            widths=widths,
        )[0]
    )

    r1 = sync(run_eager())
    t0 = time.perf_counter()
    for _ in range(reps):
        r1 = run_eager()
    sync(r1)
    eager = (time.perf_counter() - t0) / reps
    print(f"eager staged chunk: {eager*1e3:.1f} ms")

    t_c = time.perf_counter()
    r2 = sync(fused(o, d, uids))
    print(f"fused compile+first: {time.perf_counter()-t_c:.1f} s")
    import numpy as np

    assert (np.asarray(r1) == np.asarray(r2)).all(), "fused != eager!"
    t0 = time.perf_counter()
    for _ in range(reps):
        r2 = fused(o, d, uids)
    sync(r2)
    fwall = (time.perf_counter() - t0) / reps
    print(f"fused staged chunk: {fwall*1e3:.1f} ms "
          f"({eager/fwall:.2f}x vs eager)")


def main():
    which = sys.argv[1:] or ["chain", "indep", "fused"]
    if "chain" in which:
        probe_chain()
    if "indep" in which:
        probe_indep()
    if "fused" in which:
        probe_fused()


if __name__ == "__main__":
    main()
