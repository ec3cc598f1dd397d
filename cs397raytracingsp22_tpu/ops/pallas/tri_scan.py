"""Fused dense triangle-scan kernel.

The jnp `intersect_tris_scan` (ops/bvh.py) is HBM-bound: every (N, chunk)
Möller–Trumbore intermediate round-trips HBM. This kernel keeps a block
of rays resident in VMEM as (BR, 128) component planes and loops the
whole triangle table (SMEM scalars, broadcast to the tile) with the
running best hit carried in registers — the only HBM traffic is one read
of the rays and one write of the result, so it runs at VPU arithmetic
speed (~50 vector ops per triangle per tile).

Layout: rays are component-planar (ox, oy, oz, dx, dy, dz) plus per-ray
t bounds, each padded to (G·BR, 128); the grid walks ray blocks. The
triangle table [a, e1, e2] per row lives in SMEM, FLATTENED to 1-D
(T·9,): a 2-D window pads the minor dim to 128 lanes and would bill
T·128 floats — 4 MiB at the 8192-tri dense limit vs the 1 MiB SMEM —
while 1-D rows bill T·9 (288 KiB at the limit).

Semantics identical to ops/bvh.moller_trumbore (reference
geometry.rs:331-349): |det| < 1e-4 / u<0 / v<0 / u+v>1 / t outside
[t_min, best) rejections.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MT_EPSILON = 1e-4
LANES = 128
DEFAULT_BLOCK_ROWS = 16  # 16*128 = 2048 rays per block (measured optimum)


def _kernel(tri_ref, ox, oy, oz, dx, dy, dz, tmn, tmx, bt, bu, bv, bid, *, n_tris):
    shape = ox.shape
    t_min = tmn[:]

    def body(t, carry):
        best_t, best_u, best_v, best_id = carry
        # flattened 1-D SMEM table: a 2-D (T, 9) window pads the minor
        # dim to 128 lanes and bills T·128 floats against the 1 MiB SMEM
        # (OOMs at the 8192-tri dense limit); 1-D rows bill T·9
        base = t * 9
        ax = tri_ref[base + 0]
        ay = tri_ref[base + 1]
        az = tri_ref[base + 2]
        e1x = tri_ref[base + 3]
        e1y = tri_ref[base + 4]
        e1z = tri_ref[base + 5]
        e2x = tri_ref[base + 6]
        e2y = tri_ref[base + 7]
        e2z = tri_ref[base + 8]

        qx = dy[:] * e2z - dz[:] * e2y
        qy = dz[:] * e2x - dx[:] * e2z
        qz = dx[:] * e2y - dy[:] * e2x
        det = e1x * qx + e1y * qy + e1z * qz
        det_ok = jnp.abs(det) >= MT_EPSILON
        f = 1.0 / jnp.where(det_ok, det, 1.0)
        sx = ox[:] - ax
        sy = oy[:] - ay
        sz = oz[:] - az
        u = f * (sx * qx + sy * qy + sz * qz)
        rx = sy * e1z - sz * e1y
        ry = sz * e1x - sx * e1z
        rz = sx * e1y - sy * e1x
        v = f * (dx[:] * rx + dy[:] * ry + dz[:] * rz)
        tt = f * (e2x * rx + e2y * ry + e2z * rz)
        ok = (
            det_ok
            & (u >= 0.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (tt >= t_min)
            & (tt < best_t)
        )
        best_t = jnp.where(ok, tt, best_t)
        best_u = jnp.where(ok, u, best_u)
        best_v = jnp.where(ok, v, best_v)
        best_id = jnp.where(ok, t, best_id)
        return best_t, best_u, best_v, best_id

    init = (
        tmx[:],
        jnp.zeros(shape, jnp.float32),
        jnp.zeros(shape, jnp.float32),
        jnp.full(shape, -1, jnp.int32),
    )
    best_t, best_u, best_v, best_id = jax.lax.fori_loop(0, n_tris, body, init)
    bt[:] = best_t
    bu[:] = best_u
    bv[:] = best_v
    bid[:] = best_id


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def tri_scan_pallas(
    o: jnp.ndarray,
    d: jnp.ndarray,
    tri_table: jnp.ndarray,
    t_min,
    t_max,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    interpret: bool = False,
):
    """Nearest-hit dense scan of all triangles for N rays.

    Args:
      o, d: (N, 3) rays (object space).
      tri_table: (T, 9) float32 rows [a.xyz, e1.xyz, e2.xyz] where
        e1 = b - a, e2 = c - a (precompiled in the MeshBlock).
      t_min, t_max: scalar or per-ray (N,) bounds.

    Returns (hit, t, tri_idx, u, v) matching ops/bvh.intersect_tris_scan.
    """
    # compiled Pallas only exists on TPU; CPU/other backends run
    # interpret mode (same guard as the sibling kernels)
    interpret = interpret or jax.default_backend() != "tpu"
    n = o.shape[0]
    n_tris = tri_table.shape[0]
    block = block_rows * LANES
    n_pad = (n + block - 1) // block * block
    grid = n_pad // block

    def plane(x):
        x = jnp.broadcast_to(jnp.asarray(x, jnp.float32), (n,))
        x = jnp.pad(x, (0, n_pad - n))
        return x.reshape(n_pad // LANES, LANES)

    planes = [
        plane(o[:, 0]), plane(o[:, 1]), plane(o[:, 2]),
        plane(d[:, 0]), plane(d[:, 1]), plane(d[:, 2]),
        plane(t_min), plane(t_max),
    ]

    ray_spec = pl.BlockSpec(
        (block_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((n_pad // LANES, LANES), jnp.float32)
    out_shape_i = jax.ShapeDtypeStruct((n_pad // LANES, LANES), jnp.int32)

    kernel = functools.partial(_kernel, n_tris=n_tris)
    bt, bu, bv, bid = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [ray_spec] * 8,
        out_specs=[ray_spec] * 4,
        out_shape=[out_shape, out_shape, out_shape, out_shape_i],
        interpret=interpret,
    )(tri_table.reshape(-1), *planes)

    best_t = bt.reshape(-1)[:n]
    best_u = bu.reshape(-1)[:n]
    best_v = bv.reshape(-1)[:n]
    best_id = bid.reshape(-1)[:n]
    hit = best_id >= 0
    return hit, jnp.where(hit, best_t, jnp.inf), best_id, best_u, best_v
