"""Micro-profile of resolve_mesh_hit internals with realistic (random)
winner indices: which of (vertex-data gathers | texture gathers | vector
math) dominates the 30 ms/262k-ray cost measured in profile_config4?"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from scenes import textured_spheres
from cs397raytracingsp22_tpu.ops import intersect as isect


def timed(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    n = 1 << 18
    scene = textured_spheres.build(width=512, height=512, spp=64)
    data = scene.compile()
    mesh = data.meshes[0]
    rng = np.random.default_rng(0)
    tri = jnp.asarray(rng.integers(0, mesh.tri_normals.shape[0], n, dtype=np.int32))
    u = jnp.asarray(rng.uniform(0, 0.5, n).astype(np.float32))
    v = jnp.asarray(rng.uniform(0, 0.5, n).astype(np.float32))
    t = jnp.full((n,), 1.0, jnp.float32)
    o = jnp.asarray(rng.uniform(-1, 1, (n, 3)).astype(np.float32))
    d = jnp.asarray(rng.uniform(-1, 1, (n, 3)).astype(np.float32))

    w = timed(jax.jit(lambda tri: mesh.tri_normals[tri]), tri)
    print(f"gather tri_normals (N,3,3): {w*1e3:.2f} ms")
    w = timed(jax.jit(lambda tri: mesh.tri_uvs[tri]), tri)
    print(f"gather tri_uvs (N,3,2):     {w*1e3:.2f} ms")
    w = timed(jax.jit(lambda tri: mesh.tri_tangent[tri]), tri)
    print(f"gather tri_tangent (N,3):   {w*1e3:.2f} ms")
    w = timed(jax.jit(
        lambda tri: (mesh.tri_normals[tri], mesh.tri_uvs[tri], mesh.tri_tangent[tri])
    ), tri)
    print(f"all three gathers together: {w*1e3:.2f} ms")

    big = jnp.concatenate(
        [mesh.tri_normals.reshape(-1, 9), mesh.tri_uvs.reshape(-1, 6),
         mesh.tri_tangent], axis=1)
    w = timed(jax.jit(lambda tri: big[tri]), tri)
    print(f"one consolidated (N,18) gather: {w*1e3:.2f} ms")

    uv = jnp.stack([u, v], axis=-1)
    w = timed(jax.jit(lambda uv: isect.sample_texture(data, mesh.tex_ids[0], uv)), uv)
    print(f"sample_texture albedo:      {w*1e3:.2f} ms")
    if mesh.tex_ids[4] >= 0:
        w = timed(jax.jit(lambda uv: isect.sample_texture(data, mesh.tex_ids[4], uv)), uv)
        print(f"sample_texture normalmap:   {w*1e3:.2f} ms")

    w = timed(jax.jit(
        lambda o, d, t, tri, u, v: isect.resolve_mesh_hit(mesh, data, o, d, t, tri, u, v)
    ), o, d, t, tri, u, v)
    print(f"full resolve_mesh_hit:      {w*1e3:.2f} ms")


if __name__ == "__main__":
    main()
