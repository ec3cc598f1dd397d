"""BASELINE config 2 middle tier: the ~6k-triangle teapot
(assets/teapot_6k.obj, tools/subdivide_teapot.py) measured through BOTH
kernel paths — the dense in-bounce scan (mega kernel, forced via
RT_DENSE_MAX_TRIS) and the big-mesh SMEM-piece scan — to locate the
dense-vs-piece crossover that DENSE_MESH_MAX_TRIS encodes.

Run twice (the constant is read at package import):
    python tools/bench_teapot_6k.py                     # dense (default 8192)
    RT_DENSE_MAX_TRIS=512 python tools/bench_teapot_6k.py   # piece-scan path

Measured 2026-08-17 (v5e, 512²×64spp chunks, depth 8): 6,144 tris →
dense 20.66 Mrays/s (32-row blocks, auto) vs piece-scan 11.81; 12,000
tris → piece-scan 8.36, dense needs ≤16-row blocks (AOT scoped-VMEM).
These numbers set DENSE_MESH_MAX_TRIS = 8192 and the _auto_block_rows
schedule in ops/pallas/bounce.py.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

TEAPOT_6K = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "assets", "teapot_6k.obj",
)


def main():
    os.environ.setdefault("RT_TEAPOT", TEAPOT_6K)
    from bench import build_bench_scene
    from cs397raytracingsp22_tpu.ops.bvh import DENSE_MESH_MAX_TRIS
    from cs397raytracingsp22_tpu.render.driver import render_chunk, render_chunk_staged
    from cs397raytracingsp22_tpu.utils import threefry

    spp = 64
    width = 512
    scene = build_bench_scene(width, width, spp=spp)
    data = scene.compile()
    cam = scene.camera
    path = "dense(mega)" if data.dense_mesh_ids and any(
        data.meshes[i].tri_verts.shape[0] > 2048 for i in data.dense_mesh_ids
    ) else ("dense(mega,240-limit)" if len(data.dense_mesh_ids) == len(data.meshes)
            else "big(piece-scan)")
    n_tris = sum(int(m.tri_verts.shape[0]) for m in data.meshes)
    print(f"mesh tris={n_tris} DENSE_MESH_MAX_TRIS={DENSE_MESH_MAX_TRIS} "
          f"path={path}", flush=True)

    n_px = width * width
    # Driver-sized chunks: the staged/shrink executor keeps full-width
    # sort + state buffers (14 ops/ray), so whole-image dispatches at
    # 512²×64spp OOM HBM; the driver itself chunks staged scenes.
    chunk_px = min(n_px, max(1, (1 << 21) // spp))
    ids = jnp.arange(chunk_px, dtype=jnp.int32)
    key = threefry.key_words(0)

    exec_fn = render_chunk
    if len(data.dense_mesh_ids) < len(data.meshes):
        exec_fn = render_chunk_staged  # what the driver would pick on TPU

    rad, segs = exec_fn(data, cam, ids, key, jnp.int32(0), spp, 1)
    jax.block_until_ready(rad)
    t0 = time.perf_counter()
    out = []
    for _ in range(3):
        rad, segs = exec_fn(data, cam, ids, key, jnp.int32(0), spp, 1)
        out.append(segs)
    jax.block_until_ready(out)
    wall = (time.perf_counter() - t0) / 3
    mrays = float(out[0]) / wall / 1e6
    print(json.dumps({
        "metric": "teapot6k_Mrays_per_sec", "tris": n_tris,
        "path": path, "value": round(mrays, 2), "wall_ms": round(wall * 1e3, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
