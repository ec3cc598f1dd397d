"""Sort-key A/B harness for the big-mesh sorted wavefront.

Measures tri_scan_big throughput under different Morton key orderings
on realistic secondary-ray scenarios. Result (2026-08-17, v5e):
position-major pos1-dir6 beats direction-major dir5-pos3 by ~70%
(14.6 vs 8.8 Mrays/s sphere-origin, 5.7 vs 3.3 wall-origin) - adopted
in render/integrator.py _coherence_key.
"""
import sys, time
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
import scenes.textured_spheres as ts
from cs397raytracingsp22_tpu.ops.pallas.tri_scan_big import tri_scan_big_pallas
from cs397raytracingsp22_tpu.ops.intersect import _transform_point, _transform_vector

scene = ts.build(width=256, height=256, spp=8)
sd = scene.compile()
mesh = [m for i, m in enumerate(sd.meshes) if i not in sd.dense_mesh_ids][0]

N = 1 << 19
rng = np.random.default_rng(0)
# realistic bounce-1: origins on a unit sphere at origin (the mesh), dirs cosine about normal
n = rng.normal(size=(N, 3)); n /= np.linalg.norm(n, axis=1, keepdims=True)
o = (n * 1.001).astype(np.float32)
# cosine-weighted hemisphere about n
u = rng.normal(size=(N, 3)); u /= np.linalg.norm(u, axis=1, keepdims=True)
d = (n + u).astype(np.float32)  # unnormalized like reference sampling

def morton(bits, q):
    m = np.zeros(q.shape[0], np.int64)
    for i in range(bits):
        for a in range(3):
            m |= ((q[:, a].astype(np.int64) >> i) & 1) << (3 * i + a)
    return m

dn = d / np.linalg.norm(d, axis=1, keepdims=True)
qd5 = np.clip(((dn + 1) * 15.999).astype(np.int64), 0, 31)
lo, hi = o.min(0), o.max(0)
qp3 = np.clip(((o - lo) / np.maximum(hi - lo, 1e-6) * 7.999).astype(np.int64), 0, 7)
qp6 = np.clip(((o - lo) / np.maximum(hi - lo, 1e-6) * 63.999).astype(np.int64), 0, 63)
qd2 = np.clip(((dn + 1) * 1.999).astype(np.int64), 0, 3)

qp4 = np.clip(((o - lo) / np.maximum(hi - lo, 1e-6) * 15.999).astype(np.int64), 0, 15)
qd4 = np.clip(((dn + 1) * 7.999).astype(np.int64), 0, 15)
qd3 = np.clip(((dn + 1) * 3.999).astype(np.int64), 0, 7)
qd6 = np.clip(((dn + 1) * 31.999).astype(np.int64), 0, 63)
qp5 = np.clip(((o - lo) / np.maximum(hi - lo, 1e-6) * 31.999).astype(np.int64), 0, 31)
keys = {
    "pos2-dir5": morton(2, qp3 >> 1) << 15 | morton(5, qd5),
    "pos1-dir5": morton(1, qp3 >> 2) << 15 | morton(5, qd5),
    "pos2-dir6": morton(2, qp3 >> 1) << 18 | morton(6, qd6),
    "pos2-dir4": morton(2, qp3 >> 1) << 12 | morton(4, qd4),
    "pos1-dir6": morton(1, qp3 >> 2) << 18 | morton(6, qd6),
    "pos3-dir5": morton(3, qp3) << 15 | morton(5, qd5),
    "pos3-dir4": morton(3, qp3) << 12 | morton(4, qd4),
    "pos4-dir4": morton(4, qp4) << 12 | morton(4, qd4),
    "pos4-dir3": morton(4, qp4) << 9 | morton(3, qd3),
    "pos5-dir3": morton(5, qp5) << 9 | morton(3, qd3),
    "pos6-dir2": morton(6, qp6) << 6 | morton(2, qd2),
    "dir6 only": morton(6, qd6),
}

f = jax.jit(lambda oo, dd: tri_scan_big_pallas(oo, dd, mesh.big_bw, mesh.big_box, mesh.big_sl, 1e-3, 1e4))
for name, k in keys.items():
    idx = np.argsort(k, kind="stable")
    oo = jnp.asarray(_transform_point(mesh.inv_transform, jnp.asarray(o[idx])))
    dd = jnp.asarray(_transform_vector(mesh.inv_transform, jnp.asarray(d[idx])))
    out = f(oo, dd); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(5):
        out = f(oo, dd)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / 5
    print(f"{name}: {dt*1e3:7.1f} ms  {N/dt/1e6:6.2f} Mrays/s  hitfrac {float(jnp.mean(out[0].astype(jnp.float32))):.3f}")
