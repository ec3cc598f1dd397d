"""Profiling experiment: where does the north-star bench time go?

Runs the official bench dispatch with scene/depth variations to split the
per-segment cost between the teapot dense scan, analytic primitives, and
bounce-loop overhead. Also microbenchmarks lax.sort at render sizes (the
candidate ray-coherence reordering primitive) and bf16-vs-f32 VPU
elementwise throughput in a Pallas kernel.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_bench_scene
from cs397raytracingsp22_tpu.render.driver import render_chunk
from cs397raytracingsp22_tpu.utils import threefry


def timed_render(scene, spp=64, width=512, reps=2):
    data = scene.compile()
    cam = scene.camera
    n_px = width * width
    chunk_px = min(n_px, max(1, (1 << 24) // spp))
    ids = jnp.arange(chunk_px, dtype=jnp.int32)
    key = threefry.key_words(0)
    rad, segs = render_chunk(data, cam, ids, key, jnp.int32(0), spp, 1)
    jax.block_until_ready(rad)
    t0 = time.perf_counter()
    out = []
    for _ in range(reps):
        rad, segs = render_chunk(data, cam, ids, key, jnp.int32(0), spp, 1)
        out.append(segs)
    jax.block_until_ready(out)
    wall = (time.perf_counter() - t0) / reps
    segs = float(out[0])
    return wall, segs, segs / wall / 1e6


def main():
    print("== scene/depth split ==", flush=True)
    for name, teapot, depth in [
        ("full depth8", True, 8),
        ("no-teapot depth8", False, 8),
        ("full depth1", True, 1),
        ("full depth2", True, 2),
    ]:
        if not teapot:
            os.environ["RT_TEAPOT"] = "/nonexistent"
        else:
            os.environ.pop("RT_TEAPOT", None)
        sc = build_bench_scene(512, 512, spp=64, path_depth=depth)
        wall, segs, mrays = timed_render(sc)
        print(f"{name:20s} wall={wall:.3f}s segs={segs/1e6:.1f}M rate={mrays:.1f} Mrays/s", flush=True)
    os.environ.pop("RT_TEAPOT", None)

    print("== lax.sort cost (key + V values) ==", flush=True)
    for n in [1 << 21, 1 << 24]:
        for nvals in [1, 6, 14]:
            key = jax.random.PRNGKey(0)
            k = jax.random.randint(key, (n,), 0, 1 << 30, dtype=jnp.int32)
            vals = [jnp.arange(n, dtype=jnp.float32) * (i + 1) for i in range(nvals)]

            @jax.jit
            def srt(k, vals):
                out = jax.lax.sort([k] + list(vals), num_keys=1)
                return out[1] if len(out) > 1 else out[0]

            r = srt(k, vals)
            jax.block_until_ready(r)
            t0 = time.perf_counter()
            for _ in range(3):
                r = srt(k, vals)
            jax.block_until_ready(r)
            wall = (time.perf_counter() - t0) / 3
            print(f"sort n={n>>20}M vals={nvals:2d}: {wall*1e3:8.2f} ms", flush=True)

    print("== argsort+take (gather) cost ==", flush=True)
    for n in [1 << 21, 1 << 24]:
        key = jax.random.PRNGKey(0)
        k = jax.random.randint(key, (n,), 0, 1 << 30, dtype=jnp.int32)
        vals = [jnp.arange(n, dtype=jnp.float32) * (i + 1) for i in range(14)]

        @jax.jit
        def ag(k, vals):
            perm = jnp.argsort(k)
            return [v[perm] for v in vals]

        r = ag(k, vals)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(3):
            r = ag(k, vals)
        jax.block_until_ready(r)
        wall = (time.perf_counter() - t0) / 3
        print(f"argsort+take n={n>>20}M vals=14: {wall*1e3:8.2f} ms", flush=True)

    print("== bf16 vs f32 VPU elementwise in pallas ==", flush=True)
    from jax.experimental import pallas as pl

    def make_k(dtype, iters=2000):
        def kern(x_ref, o_ref):
            x = x_ref[:]
            y = x
            c1 = (x[0, 0] * 0 + 1).astype(dtype)  # avoid splat-layout issues
            for _ in range(iters):
                y = y * y + c1
                y = y - y * x
            o_ref[:] = y
        return kern

    for dtype in [jnp.float32, jnp.bfloat16]:
        rows = 512
        x = jnp.ones((rows, 128), dtype) * 0.5

        f = pl.pallas_call(
            make_k(dtype),
            out_shape=jax.ShapeDtypeStruct((rows, 128), dtype),
        )
        r = f(x)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(5):
            r = f(x)
        jax.block_until_ready(r)
        wall = (time.perf_counter() - t0) / 5
        ops = rows * 128 * 2000 * 4
        print(f"{dtype.__name__}: {wall*1e3:.2f} ms -> {ops/wall/1e12:.2f} Tops/s", flush=True)


if __name__ == "__main__":
    main()
