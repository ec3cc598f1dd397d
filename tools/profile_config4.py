"""Where does the config-4 (textured big-mesh) bounce time go?

Times the staged-pipeline phases separately at a realistic chunk size:
full path_trace, intersect_scene_fused alone, each big-mesh piece scan
alone, mesh shading resolve (texture sampling) alone, bsdf + sort alone.
Run on TPU: python tools/profile_config4.py [n_rays_log2]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from scenes import textured_spheres
from cs397raytracingsp22_tpu.render import integrator
from cs397raytracingsp22_tpu.ops import intersect as isect
from cs397raytracingsp22_tpu.ops import bsdf
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
    nlog = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    n = 1 << nlog
    scene = textured_spheres.build(width=512, height=512, spp=64)
    data = scene.compile()
    cam = scene.camera

    # realistic primary rays for the chunk
    key = threefry.key_words(0)
    ids = jnp.arange(n // 1, dtype=jnp.int32) % (512 * 512)
    o, d = cam.generate_rays(key, ids, spp=1, sample_offset=jnp.int32(0))
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)
    uids = ids
    print(f"n_rays = {n}", flush=True)

    depth = cam.path_depth

    # 1. full path_trace (what the driver runs per chunk)
    f_full = jax.jit(lambda o, d, uids: integrator.path_trace(
        data, o, d, uids, key, depth, cam.max_trace_dist))
    w, (rad, segs) = timed(f_full, o, d, uids)
    segs = float(segs)
    print(f"full path_trace depth{depth}: {w*1e3:.1f} ms, {segs/1e6:.2f}M segs, "
          f"{segs/w/1e6:.2f} Mrays/s", flush=True)

    # 2. one intersect_scene_fused call (full bounce's intersection incl.
    # big meshes + resolve)
    uv = jnp.zeros((n, data.vol_center.shape[0]), jnp.float32)
    f_is = jax.jit(lambda o, d: isect.intersect_scene_fused(
        data, o, d, 0.001, cam.max_trace_dist, uv))
    w_is, hit = timed(f_is, o, d)
    print(f"intersect_scene_fused: {w_is*1e3:.1f} ms -> {n/w_is/1e6:.2f} Mrays/s", flush=True)

    # 3. each big mesh's piece scan alone
    from cs397raytracingsp22_tpu.ops.pallas.tri_scan_big import tri_scan_big_pallas
    for mi, mesh in enumerate(data.meshes):
        if mesh.big_bw is None:
            continue
        o_obj = isect._transform_point(mesh.inv_transform, o)
        d_obj = isect._transform_vector(mesh.inv_transform, d)
        f_big = jax.jit(lambda oo, dd, m=mesh: tri_scan_big_pallas(
            oo, dd, m.big_bw, m.big_box, m.big_sl, 0.001,
            jnp.full((n,), cam.max_trace_dist, jnp.float32)))
        w_big, _ = timed(f_big, o_obj, d_obj)
        print(f"big-mesh[{mi}] piece scan: {w_big*1e3:.1f} ms -> {n/w_big/1e6:.2f} Mrays/s", flush=True)

    # 4. fused kernel only (no big meshes, no resolve)
    from cs397raytracingsp22_tpu.ops.pallas.scene_intersect import scene_intersect_pallas
    f_k = jax.jit(lambda o, d: scene_intersect_pallas(
        data, o, d, 0.001, cam.max_trace_dist, uv))
    w_k, _ = timed(f_k, o, d)
    print(f"scene_intersect kernel: {w_k*1e3:.1f} ms -> {n/w_k/1e6:.2f} Mrays/s", flush=True)

    # 5. mesh shading resolve alone (texture sampling etc.), per mesh
    t = jnp.full((n,), 1.0, jnp.float32)
    tri = jnp.zeros((n,), jnp.int32)
    u = jnp.full((n,), 0.3, jnp.float32)
    v = jnp.full((n,), 0.3, jnp.float32)
    for mi, mesh in enumerate(data.meshes):
        o_obj = isect._transform_point(mesh.inv_transform, o)
        d_obj = isect._transform_vector(mesh.inv_transform, d)
        f_res = jax.jit(lambda oo, dd, t, tri, u, v, m=mesh: isect.resolve_mesh_hit(
            m, data, oo, dd, t, tri, u, v))
        w_res, _ = timed(f_res, o_obj, d_obj, t, tri, u, v)
        print(f"resolve_mesh_hit[{mi}]: {w_res*1e3:.1f} ms", flush=True)

    # 6. bsdf.scatter alone
    ball = jnp.ones((n, 3), jnp.float32) * 0.3
    uc = jnp.full((n,), 0.4, jnp.float32)
    f_b = jax.jit(lambda hit, d: bsdf.scatter(hit, d, ball, uc))
    w_b, _ = timed(f_b, hit, d)
    print(f"bsdf.scatter: {w_b*1e3:.1f} ms", flush=True)

    # 7. the per-bounce 16-operand sort
    alive = jnp.ones((n,), bool)
    def srt(o, d):
        key_ = integrator._coherence_key(o, d, alive)
        outs = jax.lax.sort([key_] + [o[:, i] for i in range(3)]
                            + [d[:, i] for i in range(3)]
                            + [jnp.zeros((n,), jnp.float32)] * 7
                            + [uids, alive.astype(jnp.int32)], num_keys=1)
        return outs[1]
    w_s, _ = timed(jax.jit(srt), o, d)
    print(f"coherence sort (16 ops): {w_s*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
