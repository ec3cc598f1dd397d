"""Per-bounce wall + live-count profile of the config-4 staged path.

Runs the REAL shrink-executor bounce program (integrator._bounce_once)
eagerly bounce by bounce at each width the shrink schedule would pick,
recording wall time and the live count after every bounce — the data
that sizes a predicted-width schedule (how much dead-ray dispatch the
two-point shrink leaves on the table).

Run on TPU: python tools/profile_config4_bounces.py [n_rays_log2]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from scenes import textured_spheres
from cs397raytracingsp22_tpu.render import integrator
from cs397raytracingsp22_tpu.utils import threefry
from cs397raytracingsp22_tpu.utils import rng as rnglib


def main():
    nlog = int(sys.argv[1]) if len(sys.argv) > 1 else 18
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
    thr = jnp.ones((n, 3), jnp.float32)
    rad = jnp.zeros((n, 3), jnp.float32)
    alive = jnp.ones((n,), bool)
    pos = jnp.arange(n, dtype=jnp.int32)

    sort_rays = integrator._should_sort(data)
    state = (o, d, thr, rad, alive, uids, pos)
    if sort_rays:
        o_, d_, thr_, rad_, uids_, pos_, alive_ = integrator._sort_state(
            o, d, thr, rad, uids, pos, alive
        )
        state = (o_, d_, thr_, rad_, alive_, uids_, pos_)

    # warm each width's program first at full width (compile outside timing)
    total_wall = 0.0
    total_live = 0.0
    width = n
    min_width = 4096
    print(f"n={n} depth={depth} sort={sort_rays}", flush=True)
    for b in range(depth):
        o_, d_, thr, rad, alive, uids_, pos = state
        args = (data, o_, d_, thr, rad, alive, uids_, pos, key,
                rnglib.SITE_BOUNCE0 + b, cam.max_trace_dist,
                sort_rays and b < depth - 1)
        out = integrator._bounce_once(*args)  # compile
        jax.block_until_ready(out[0])
        t0 = time.perf_counter()
        out = integrator._bounce_once(*args)
        jax.block_until_ready(out[0])
        w = time.perf_counter() - t0
        (o_, d_, thr, rad, alive, uids_, pos, segs, n_alive) = out
        live = int(n_alive)
        total_wall += w
        total_live += float(segs)
        print(
            f"bounce {b}: width {width:7d}  wall {w*1e3:7.1f} ms  "
            f"live-after {live:7d}  ({live/width*100:5.1f}%)",
            flush=True,
        )
        state = (o_, d_, thr, rad, alive, uids_, pos)
        # aggressive shrink: every bounce, smallest power-of-4 bucket
        new_w = width
        while new_w // 4 >= max(live, min_width):
            new_w //= 4
        if new_w < width and b < depth - 1:
            state = tuple(x[:new_w] for x in state)
            width = new_w
    print(
        f"total: wall {total_wall*1e3:.1f} ms  live segs {total_live/1e6:.2f}M"
        f"  -> {total_live/total_wall/1e6:.2f} Mrays/s (per-bounce-timed)",
        flush=True,
    )


if __name__ == "__main__":
    main()
