"""Sweep the mega-bounce kernel's (dense_unroll, block_rows) on the
official north-star dispatch. In-process A/B: each variant is its own
compiled kernel (parameters are trace-level), timings comparable."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import build_bench_scene
from cs397raytracingsp22_tpu.ops.pallas import bounce as bk
from cs397raytracingsp22_tpu.utils import threefry


def main():
    spp = 64
    width = 512
    scene = build_bench_scene(width, width, spp=spp)
    data = scene.compile()
    cam = scene.camera
    n_px = width * width
    chunk_px = min(n_px, max(1, (1 << 24) // spp))
    key = threefry.key_words(0)
    ids = jnp.arange(chunk_px, dtype=jnp.int32)

    tables = None

    variants = []
    for unroll in [1, 3, 5, 15]:
        variants.append((unroll, 64))
    variants.append((1, 96))
    variants.append((3, 96))

    for unroll, rows in variants:
        @jax.jit
        def run(ids, key, unroll=unroll, rows=rows):
            o, d = cam.generate_rays(key, ids, spp=spp, sample_offset=jnp.int32(0))
            o = o.reshape(-1, 3)
            d = d.reshape(-1, 3)
            uids = (ids[:, None] * jnp.int32(cam.aa_sample_count)
                    + jnp.arange(spp, dtype=jnp.int32)[None, :]).reshape(-1)
            t = bk.build_bounce_tables(data)
            return bk.path_trace_pallas(
                data, t, o, d, uids, key, cam.path_depth, cam.max_trace_dist,
                block_rows=rows, dense_unroll=unroll,
            )

        try:
            rad, segs = run(ids, key)
            jax.block_until_ready(rad)
        except Exception as e:
            print(f"unroll={unroll} rows={rows}: FAILED {type(e).__name__} "
                  f"{str(e)[:160]}", flush=True)
            continue
        t0 = time.perf_counter()
        out = []
        for _ in range(3):
            rad, segs = run(ids, key)
            out.append(segs)
        jax.block_until_ready(out)
        wall = (time.perf_counter() - t0) / 3
        mrays = float(out[0]) / wall / 1e6
        print(f"unroll={unroll} rows={rows}: {mrays:.1f} Mrays/s "
              f"({wall*1e3:.1f} ms)", flush=True)


if __name__ == "__main__":
    main()
