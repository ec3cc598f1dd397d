"""Dense triangle scan for BIG meshes (tri table in VMEM).

The SMEM-table kernels (tri_scan.py, scene_intersect.py, bounce.py) cap
out at a few thousand triangles (SMEM capacity). Big meshes — the
reference's 32k-triangle sphere.obj — instead keep their triangle table
in VMEM, laid out (C, 9, 8, 1): chunks of 8 triangles on the sublane
axis. Each inner step broadcasts an (8, 1) triangle slice against a
(1, 128) ray row, running Möller–Trumbore on full (8, 128) tiles — the
same per-(ray, triangle) cost as the SMEM scalar loop, ~0.06 VPU ops.

This replaces the lockstep gather-bound `lax.while_loop` BVH traversal on
TPU (~140× faster at 32k triangles); a hierarchical MXU-gather traversal
is the planned next step for another order of magnitude.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MT_EPSILON = 1e-4
LANES = 128
DEFAULT_BLOCK_ROWS = 8  # rays per block = 8 * 128


def _kernel(tri_ref, ox, oy, oz, dx, dy, dz, tmn, tmx, bt, bu, bv, bid,
            *, n_chunks, n_tris, block_rows):
    """tri_ref: (C, 8, 9) VMEM — chunk × triangle-sublane × component-lane
    (the lane dim pads 9→128; a trailing dim of 1 would pad the SUBLANE
    data 128× and blow VMEM). Ray planes (block_rows, 128)."""

    def row_body(r, _):
        o_x = ox[r, :][None, :]  # (1, 128)
        o_y = oy[r, :][None, :]
        o_z = oz[r, :][None, :]
        d_x = dx[r, :][None, :]
        d_y = dy[r, :][None, :]
        d_z = dz[r, :][None, :]
        t_min = tmn[r, :][None, :]

        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)

        def chunk_body(c, carry):
            best_t, best_u, best_v, best_id = carry  # (1, 128) each
            ax = tri_ref[c, :, 0:1]  # (8, 1)
            ay = tri_ref[c, :, 1:2]
            az = tri_ref[c, :, 2:3]
            e1x = tri_ref[c, :, 3:4]
            e1y = tri_ref[c, :, 4:5]
            e1z = tri_ref[c, :, 5:6]
            e2x = tri_ref[c, :, 6:7]
            e2y = tri_ref[c, :, 7:8]
            e2z = tri_ref[c, :, 8:9]

            qx = d_y * e2z - d_z * e2y  # (8, 128)
            qy = d_z * e2x - d_x * e2z
            qz = d_x * e2y - d_y * e2x
            det = e1x * qx + e1y * qy + e1z * qz
            det_ok = jnp.abs(det) >= MT_EPSILON
            f = 1.0 / jnp.where(det_ok, det, 1.0)
            sx = o_x - ax
            sy = o_y - ay
            sz = o_z - az
            u = f * (sx * qx + sy * qy + sz * qz)
            rx = sy * e1z - sz * e1y
            ry = sz * e1x - sx * e1z
            rz = sx * e1y - sy * e1x
            v = f * (d_x * rx + d_y * ry + d_z * rz)
            t = f * (e2x * rx + e2y * ry + e2z * rz)
            tri_ids = c * 8 + sub_iota
            ok = (det_ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                  & (t >= t_min) & (t < best_t) & (tri_ids < n_tris))

            t_m = jnp.where(ok, t, jnp.inf)
            chunk_best = jnp.min(t_m, axis=0, keepdims=True)  # (1, 128)
            better = chunk_best < best_t
            sel = (t_m == chunk_best) & ok
            # unique winner within the chunk: tri ids are distinct, so
            # the min id among tied-t candidates picks exactly one
            # (Mosaic has no cumsum to do a "first true" scan)
            id_sel = jnp.min(
                jnp.where(sel, tri_ids, jnp.int32(1 << 30)), axis=0, keepdims=True
            )
            first = sel & (tri_ids == id_sel)
            fsel = first.astype(jnp.float32)
            u_pick = jnp.sum(u * fsel, axis=0, keepdims=True)
            v_pick = jnp.sum(v * fsel, axis=0, keepdims=True)
            id_pick = jnp.sum(tri_ids * first.astype(jnp.int32), axis=0, keepdims=True)
            best_u = jnp.where(better, u_pick, best_u)
            best_v = jnp.where(better, v_pick, best_v)
            best_id = jnp.where(better, id_pick, best_id)
            best_t = jnp.where(better, chunk_best, best_t)
            return best_t, best_u, best_v, best_id

        init = (
            tmx[r, :][None, :],
            o_x * 0.0,
            o_x * 0.0,
            (o_x * 0.0).astype(jnp.int32) - 1,
        )
        best_t, best_u, best_v, best_id = jax.lax.fori_loop(
            0, n_chunks, chunk_body, init
        )
        bt[r, :] = best_t[0]
        bu[r, :] = best_u[0]
        bv[r, :] = best_v[0]
        bid[r, :] = best_id[0]
        return 0

    jax.lax.fori_loop(0, block_rows, row_body, 0)


@functools.partial(
    jax.jit, static_argnames=("n_tris", "block_rows", "interpret")
)
def tri_scan_big_pallas(
    o: jnp.ndarray,
    d: jnp.ndarray,
    tri_chunks: jnp.ndarray,
    n_tris: int,
    t_min,
    t_max,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    interpret: bool = False,
):
    """Nearest-hit dense scan with a VMEM triangle table.

    Args:
      o, d: (N, 3) object-space rays.
      tri_chunks: (C, 9, 8, 1) float32 — [a, e1, e2] components chunked
        8 triangles per sublane group (MeshBlock.tri_chunks).
      n_tris: actual triangle count (static; tail of the last chunk is
        masked).

    Returns (hit, t, tri_idx, u, v) like tri_scan_pallas.
    """
    interpret = interpret or jax.default_backend() != "tpu"
    n = o.shape[0]
    n_chunks = tri_chunks.shape[0]
    block = block_rows * LANES
    n_pad = (n + block - 1) // block * block
    grid = n_pad // block

    def plane(x):
        x = jnp.broadcast_to(jnp.asarray(x, jnp.float32), (n,))
        return jnp.pad(x, (0, n_pad - n)).reshape(n_pad // LANES, LANES)

    planes = [
        plane(o[:, 0]), plane(o[:, 1]), plane(o[:, 2]),
        plane(d[:, 0]), plane(d[:, 1]), plane(d[:, 2]),
        plane(t_min), plane(t_max),
    ]

    ray_spec = pl.BlockSpec(
        (block_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    tri_spec = pl.BlockSpec(memory_space=pltpu.VMEM)  # whole table
    fshape = jax.ShapeDtypeStruct((n_pad // LANES, LANES), jnp.float32)
    ishape = jax.ShapeDtypeStruct((n_pad // LANES, LANES), jnp.int32)

    kernel = functools.partial(
        _kernel, n_chunks=n_chunks, n_tris=n_tris, block_rows=block_rows
    )
    bt, bu, bv, bid = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[tri_spec] + [ray_spec] * 8,
        out_specs=[ray_spec] * 4,
        out_shape=[fshape, fshape, fshape, ishape],
        interpret=interpret,
    )(tri_chunks, *planes)

    best_t = bt.reshape(-1)[:n]
    best_u = bu.reshape(-1)[:n]
    best_v = bv.reshape(-1)[:n]
    best_id = bid.reshape(-1)[:n]
    hit = best_id >= 0
    return hit, jnp.where(hit, best_t, jnp.inf), jnp.maximum(best_id, 0), best_u, best_v


def pack_tri_chunks(tri_table: np.ndarray) -> np.ndarray:
    """(T, 9) [a, e1, e2] rows → (C, 8, 9) sublane-chunked layout."""
    t = tri_table.shape[0]
    c = (t + 7) // 8
    padded = np.zeros((c * 8, 9), np.float32)
    padded[:t] = tri_table
    return padded.reshape(c, 8, 9).copy()
