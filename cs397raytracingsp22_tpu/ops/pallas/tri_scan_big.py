"""Dense triangle scan for BIG meshes, v3: SMEM pieces over a 2-D grid.

The SMEM-table kernels (tri_scan.py, scene_intersect.py, bounce.py) are
the fastest triangle-test structure on this TPU — per-triangle scalar
broadcasts from SMEM onto (rows,128) ray tiles multi-issue on the VPU at
~4× the rate of the (8-tri sublane × lane) vector layout this file used
in v1/v2 (measured 43 vs 199 cycles per 8-tri×512-ray chunk). SMEM holds
~48KB here, so a 32k-triangle mesh cannot live there whole.

v3 therefore pieces the mesh through SMEM via the grid — the matmul
k-loop pattern: grid = (ray_blocks, pieces), the piece axis innermost;
each step DMAs one 1024-triangle piece (48KB of Baldwin–Weber rows) into
SMEM and runs the mega-kernel-style packed min-key scan over the ray
block, accumulating only (best_key, id) in the revisited output block —
the winner's exact t/u/v are re-derived by the wrapper from one gathered
row per ray (bounce.py v4 contract: approx-reciprocal t and key rounding
steer winner choice only).

Two culling levels ride on top (triangles are in BVH order, so runs are
spatially coherent):
- piece level: skip a 1024-tri piece when no ray's slab interval against
  the piece AABB beats its current best (lax.cond);
- superleaf level: same test per 16-triangle run inside the piece.
With coherent rays (primaries, sorted wavefront) this cuts tested
triangles by 1-2 orders; incoherent rays degrade toward the dense VPU
floor (the any-of-4096 wall, SURVEY.md §7 hard part 1).

Zero padding rows are inert (Baldwin–Weber n·d = 0 rejects); padding
superleafs/pieces carry inverted AABBs (lo=+1e30) so their slab test
never fires.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cs397raytracingsp22_tpu.ops import bvh as bvhlib

MT_EPSILON = 1e-4
LANES = 128


def _block_rows() -> int:
    # Ray-block rows (RT_BIG_ROWS overrides). Smaller blocks cull finer
    # (the piece/superleaf conds test any-of-block) but pay more grid/DMA
    # overhead per piece step. Re-measured after the v4 packed carry +
    # pos-major sort key: 64 rows beats 32 on both secondary-ray
    # scenarios (14.9 vs 14.5 and 5.8 vs 5.7 Mrays/s on the 32k sphere).
    import os

    return int(os.environ.get("RT_BIG_ROWS", "64"))
SL = 16  # superleaf run length (triangles)
PIECE_TRIS = 1024  # triangles per SMEM piece (48KB of BW rows)
SL_PER_PIECE = PIECE_TRIS // SL


def _kernel(order, piece_box, piece_bw, piece_sl, ox, oy, oz, dx, dy, dz,
            tmn, tmx, bk, bid, *, n_pieces, exact_recip, unsigned_key):
    # `order` (scalar-prefetch): per ray-block front-to-back piece
    # permutation — the SAME permutation drives the piece_bw/piece_sl
    # window index_maps, so step jj of block i scans piece order[i, jj].
    # Front-to-back order makes the FIRST hit piece tighten best_t, and
    # the existing per-piece slab cull (entry > best) then skips most of
    # the remaining pieces — a traversal-order early-out the plain
    # index-order scan only got by luck.
    # `order` ships FLAT (n_blocks * n_pieces,) with a PER-BLOCK LIVE
    # COUNT appended at [n_blocks * n_pieces + i]: pieces whose slab
    # interval is empty for EVERY ray of the block (vs the static
    # [t_min, t_max] window — a superset of the in-kernel test, which
    # also clamps by the running best) are sorted to the ORDER TAIL and
    # their entries REPEAT the last live piece, so the pipeline emitter
    # sees an unchanged window index and skips the 52KB piece DMA; the
    # body is skipped via `jj < live`. Bit-identical: a statically-dead
    # piece fails the in-kernel slab_any too (same jnp.maximum/minimum
    # NaN propagation, tighter interval), so it could never contribute
    # a candidate. With the vis-bit coherence sort most blocks are
    # uniform-miss for most pieces, turning the 2-D grid's piece axis
    # from n_pieces real scans into `live` scans + free tail steps.
    # A 2-D (B, P) SMEM array pads its minor dim to 128 lanes (measured:
    # s32[2048, 6] billed as 1.0 MB — an SMEM OOM at full-width
    # dispatches), flat stays 4*(B*P+B).
    i = pl.program_id(0)
    jj = pl.program_id(1)
    j = order[i * n_pieces + jj]
    live = order[order.shape[0] - pl.num_programs(0) + i]

    o_x = ox[:]
    o_y = oy[:]
    o_z = oz[:]
    d_x = dx[:]
    d_y = dy[:]
    d_z = dz[:]
    t_min = tmn[:]
    INTMAX = jnp.int32(2147483647)
    ABS_MASK = jnp.int32(0x7FFFFFFF)
    EPS_BITS = jnp.int32(np.float32(MT_EPSILON).view(np.int32))

    def bci(x):
        return jax.lax.bitcast_convert_type(x, jnp.int32)

    def bcf(x):
        return jax.lax.bitcast_convert_type(x, jnp.float32)

    def bcu(x):
        return jax.lax.bitcast_convert_type(x, jnp.uint32)

    @pl.when(jj == 0)
    def _():
        # key = raw bitcast of t_max: every live candidate has
        # t >= t_min >= 0, whose int32 pattern order equals float order
        # (bounce.py packed min-key scan, same contract)
        bk[:] = bci(tmx[:])
        bid[:] = (o_x * 0.0).astype(jnp.int32) - 1

    inv_dx = 1.0 / d_x
    inv_dy = 1.0 / d_y
    inv_dz = 1.0 / d_z

    def slab_any(lox, loy, loz, hix, hiy, hiz, best):
        t0x = (lox - o_x) * inv_dx
        t1x = (hix - o_x) * inv_dx
        t0y = (loy - o_y) * inv_dy
        t1y = (hiy - o_y) * inv_dy
        t0z = (loz - o_z) * inv_dz
        t1z = (hiz - o_z) * inv_dz
        lo = jnp.maximum(
            jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
            jnp.maximum(jnp.minimum(t0z, t1z), t_min),
        )
        hi = jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
            jnp.minimum(jnp.maximum(t0z, t1z), best),
        )
        return jnp.sum((hi > lo).astype(jnp.float32)) > 0.0

    def tri_test(local, carry):
        """Baldwin–Weber off SMEM scalars (bounce.py mesh_body twin):
        every reject (u<0, v<0, u+v>1, t<t_min) folds into the sign bit
        of `rej`; t uses the VPU approx reciprocal — the winner's exact
        t/u/v are re-derived by the wrapper from its gathered rows, so
        the scan's rounding only steers winner choice at triangle edges.
        Zero padding rows give t = NaN whose key pattern never wins."""  # noqa: D405
        best_k, best_id = carry
        b = local * 12
        b0 = piece_bw[0, b + 0]
        b1 = piece_bw[0, b + 1]
        b2 = piece_bw[0, b + 2]
        den = b0 * d_x + b1 * d_y + b2 * d_z
        num = piece_bw[0, b + 3] - (b0 * o_x + b1 * o_y + b2 * o_z)
        # interpret mode's approx reciprocal is only ~2^-8 accurate
        # (measured) — coarse enough to flip edge inside-tests — so the
        # CPU/interpret path divides exactly; TPU uses the 2^-15.9 VPU
        # approx (same contract as bounce.py).
        if exact_recip:
            t = num / jnp.where(den == 0.0, 1e-30, den)
        else:
            t = num * pl.reciprocal(den, approx=True)
        px = o_x + t * d_x
        py = o_y + t * d_y
        pz = o_z + t * d_z
        u = (piece_bw[0, b + 4] * px + piece_bw[0, b + 5] * py
             + piece_bw[0, b + 6] * pz + piece_bw[0, b + 7])
        v = (piece_bw[0, b + 8] * px + piece_bw[0, b + 9] * py
             + piece_bw[0, b + 10] * pz + piece_bw[0, b + 11])
        # the reference's |det| >= 1e-4 grazing reject (geometry.rs:336)
        # in the integer domain: |den| patterns are positive and ordered
        # like floats, so (|den|_bits - eps_bits) has the sign bit iff
        # |den| < 1e-4. On small-triangle meshes (32k-tri sphere) this
        # fires on ~3% of hits — real reference behavior, not noise.
        if unsigned_key:
            # t_min-shifted domain (the wrapper pre-advanced the origin
            # and shipped t_min = 0, t_max' = max(t_max − t_min, 0)):
            # t' < 0 loses by its own sign bit under the unsigned min,
            # rejected → 0xFFFFFFFF — 2 fewer ops per triangle. The
            # grazing reject keeps the EXACT |den|-bits form so the
            # accepted grazing set is identical across modes
            # (scene_intersect.py twin has the rationale).
            rej = (bci(u) | bci(v)) | bci((1.0 - u) - v)
            rej = rej | ((bci(den) & ABS_MASK) - EPS_BITS)
            cand = bci(t) | (rej >> 31)
            ok = bcu(cand) < bcu(best_k)
        else:
            rej = (bci(u) | bci(v)) | (bci((1.0 - u) - v) | bci(t - t_min))
            rej = rej | ((bci(den) & ABS_MASK) - EPS_BITS)
            cand = jnp.where(rej < 0, INTMAX, bci(t))
            ok = cand < best_k
        gid = j * PIECE_TRIS + local
        return (
            jnp.where(ok, cand, best_k),
            jnp.where(ok, gid, best_id),
        )

    import os

    # Defaults measured on the 32k sphere: unroll+cond is ~5% faster
    # sorted (8.9 vs 8.5 Mrays/s) but the cond×unroll product inflates
    # Mosaic compile from ~1min to ~3.5min per shape; fori+cond is the
    # pragmatic default. RT_BIG_UNROLL=1 / RT_BIG_COND=0 override.
    unroll = os.environ.get("RT_BIG_UNROLL", "0") == "1"
    use_cond = os.environ.get("RT_BIG_COND", "1") == "1"

    def sl_body(s, carry):
        sb = s * 6
        hit = slab_any(
            piece_sl[0, sb + 0], piece_sl[0, sb + 1], piece_sl[0, sb + 2],
            piece_sl[0, sb + 3], piece_sl[0, sb + 4], piece_sl[0, sb + 5],
            bcf(carry[0]),
        )

        def run(carry, s=s):
            if unroll:
                for k in range(SL):
                    carry = tri_test(s * SL + k, carry)
                return carry
            return jax.lax.fori_loop(s * SL, (s + 1) * SL, tri_test, carry)

        if not use_cond:
            return run(carry)
        return jax.lax.cond(hit, run, lambda c: c, carry)

    def scan_piece(carry):
        return jax.lax.fori_loop(0, SL_PER_PIECE, sl_body, carry)

    # Steps past the block's live-piece count are no-ops: their window
    # index repeats the last live piece (no DMA) and the body is
    # skipped entirely — see the `order` comment above.
    @pl.when(jj < live)
    def _step():
        best_k = bk[:]
        best_id = bid[:]
        piece_hit = slab_any(
            piece_box[j, 0], piece_box[j, 1], piece_box[j, 2],
            piece_box[j, 3], piece_box[j, 4], piece_box[j, 5],
            bcf(best_k),
        )
        best_k, best_id = jax.lax.cond(
            piece_hit, scan_piece, lambda c: c,
            (best_k, best_id),
        )

        bk[:] = best_k
        bid[:] = best_id


def tri_scan_big_pallas(
    o: jnp.ndarray,
    d: jnp.ndarray,
    big_bw: jnp.ndarray,
    big_box: jnp.ndarray,
    big_sl: jnp.ndarray,
    t_min,
    t_max,
    interpret: bool = False,
):
    """Nearest-hit culled piece scan for a big mesh.

    Args:
      o, d: (N, 3) object-space rays.
      big_bw: (P*PIECE_TRIS, 12) float32 Baldwin–Weber rows, zero-padded
        to whole pieces (MeshBlock.big_bw).
      big_box: (P, 6) piece AABBs [lo, hi] (MeshBlock.big_box).
      big_sl: (P*SL_PER_PIECE, 6) superleaf AABBs (MeshBlock.big_sl);
        padding groups carry inverted boxes.

    Returns (hit, t, tri_idx, u, v) like tri_scan_pallas.
    """
    from cs397raytracingsp22_tpu.ops.pallas.bounce import _keycmp_mode

    # the key-compare mode is a STATIC jit arg (not an env read inside
    # the trace) so DIRECT in-process A/B calls (the tests) never hit a
    # stale cache entry; under an outer jit (the driver's render_chunk)
    # the env is still read at that trace time like every RT_* knob —
    # A/B whole renders with fresh processes (bounce._keycmp_mode doc)
    return _tri_scan_big_jit(
        o, d, big_bw, big_box, big_sl, t_min, t_max,
        interpret=interpret, keycmp=_keycmp_mode(),
    )


@functools.partial(jax.jit, static_argnames=("interpret", "keycmp"))
def _tri_scan_big_jit(
    o, d, big_bw, big_box, big_sl, t_min, t_max,
    interpret: bool = False, keycmp: str = "u",
):
    interpret = interpret or jax.default_backend() != "tpu"
    unsigned_key = keycmp == "u"
    if unsigned_key:
        # t_min-shifted scan domain (bounce.py v4 / RT_KEYCMP contract):
        # pre-advance the origin by t_min·d, ship t_min = 0 and
        # t_max' = max(t_max − t_min, 0). The clamp keeps EMPTY occlusion
        # windows (t_max < t_min, dead rays) losing: their init key is
        # ≤ 0, which no non-negative candidate beats under `<`. The
        # winner's exact t/u/v below still come from the UNSHIFTED ray.
        n_ = o.shape[0]
        tmn_v = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n_,))
        tmx_v = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n_,))
        o_scan = o + tmn_v[:, None] * d
        t_min_scan = jnp.zeros((n_,), jnp.float32)
        t_max_scan = jnp.where(tmx_v > tmn_v, tmx_v - tmn_v, 0.0)
    else:
        o_scan = o
        t_min_scan = t_min
        t_max_scan = t_max
    n = o.shape[0]
    n_pieces = big_box.shape[0]
    block_rows = _block_rows()
    block = block_rows * LANES
    n_pad = (n + block - 1) // block * block
    grid = (n_pad // block, n_pieces)

    def plane(x, fill=0.0):
        x = jnp.broadcast_to(jnp.asarray(x, jnp.float32), (n,))
        return jnp.pad(x, (0, n_pad - n), constant_values=fill).reshape(
            n_pad // LANES, LANES
        )

    planes = [
        plane(o_scan[:, 0]), plane(o_scan[:, 1]), plane(o_scan[:, 2]),
        plane(d[:, 0]), plane(d[:, 1]), plane(d[:, 2], fill=1.0),
        plane(t_min_scan), plane(t_max_scan),
    ]

    # Front-to-back piece order per ray block: conservative block entry
    # distance = min over the block's rays of the piece-AABB slab entry
    # (+inf when the ray misses). Heuristic only — correctness comes
    # from the in-kernel per-piece/per-triangle tests — so slab NaNs
    # from axis-parallel rays are harmless. O(n_pieces) loop keeps the
    # temporaries at (N,) instead of (N, P).
    n_blocks = grid[0]
    t_min_v = planes[6].reshape(-1)
    t_max_v = planes[7].reshape(-1)
    o_pad = [p.reshape(-1) for p in planes[0:3]]
    d_pad = [p.reshape(-1) for p in planes[3:6]]
    inv_d = [1.0 / dv for dv in d_pad]
    entries = []
    for p in range(n_pieces):
        lo_t = t_min_v
        hi_t = t_max_v
        for a in range(3):
            t0 = (big_box[p, a] - o_pad[a]) * inv_d[a]
            t1 = (big_box[p, a + 3] - o_pad[a]) * inv_d[a]
            lo_t = jnp.maximum(lo_t, jnp.minimum(t0, t1))
            hi_t = jnp.minimum(hi_t, jnp.maximum(t0, t1))
        entry = jnp.where(hi_t > lo_t, lo_t, jnp.inf)
        entries.append(
            jnp.min(entry.reshape(n_blocks, block), axis=1)
        )
    block_entry = jnp.stack(entries, axis=1)  # (n_blocks, n_pieces)
    order = jnp.argsort(block_entry, axis=1).astype(jnp.int32)
    # Per-block LIVE-piece count: pieces statically dead for the whole
    # block (empty slab interval for every ray vs the full [t_min,
    # t_max] window) sort to the tail (entry = +inf); the kernel skips
    # those steps entirely. Their order entries REPEAT the last live
    # piece so the window index is unchanged step-to-step and the
    # pipeline emitter skips the 52KB piece DMA. Bit-identical: the
    # in-kernel slab_any uses the same interval arithmetic with a
    # tighter (best-clamped) window, so a statically-dead piece could
    # never contribute a candidate anyway.
    live = jnp.sum(jnp.isfinite(block_entry), axis=1).astype(jnp.int32)
    last_live = jnp.take_along_axis(
        order, jnp.maximum(live - 1, 0)[:, None], axis=1
    )
    cols = jnp.arange(n_pieces, dtype=jnp.int32)[None, :]
    order = jnp.where(
        cols < jnp.maximum(live, 1)[:, None], order, last_live
    )
    order = jnp.concatenate([order.reshape(-1), live])

    ishape = jax.ShapeDtypeStruct((n_pad // LANES, LANES), jnp.int32)
    kernel = functools.partial(
        _kernel, n_pieces=n_pieces, exact_recip=interpret,
        unsigned_key=unsigned_key,
    )
    # flat (1, k) windows: SMEM windows pad the minor dim to 128 lanes,
    # so 2-D (1024, 12) would allocate 1024x128 floats (1MB) - flattened
    # rows keep the window at its true 48KB. Window index = order[i, jj]
    # via the scalar-prefetched permutation.
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, PIECE_TRIS * 12),
                lambda i, j, order: (0, order[i * n_pieces + j]),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, SL_PER_PIECE * 6),
                lambda i, j, order: (0, order[i * n_pieces + j]),
                memory_space=pltpu.SMEM,
            ),
        ]
        + [
            pl.BlockSpec(
                (block_rows, LANES), lambda i, j, order: (i, 0),
                memory_space=pltpu.VMEM,
            )
        ] * 8,
        out_specs=[
            pl.BlockSpec(
                (block_rows, LANES), lambda i, j, order: (i, 0),
                memory_space=pltpu.VMEM,
            )
        ] * 2,
    )
    bk, bid = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[ishape, ishape],
        interpret=interpret,
    )(
        order,
        big_box,
        big_bw.reshape(1, n_pieces * PIECE_TRIS * 12),
        big_sl.reshape(1, n_pieces * SL_PER_PIECE * 6),
        *planes,
    )

    best_id = bid.reshape(-1)[:n]
    hit = best_id >= 0
    idx = jnp.maximum(best_id, 0)

    # Exact winner resolve (one XLA gather + one true divide per ray):
    # the in-scan approx-reciprocal/key rounding never reaches hit
    # points — it only steered winner choice at triangle edges.
    rows = jnp.take(big_bw, idx, axis=0)
    den = rows[:, 0] * d[:, 0] + rows[:, 1] * d[:, 1] + rows[:, 2] * d[:, 2]
    num = rows[:, 3] - (
        rows[:, 0] * o[:, 0] + rows[:, 1] * o[:, 1] + rows[:, 2] * o[:, 2]
    )
    best_t = num / jnp.where(den == 0.0, 1.0, den)
    p = o + best_t[:, None] * d
    best_u = rows[:, 4] * p[:, 0] + rows[:, 5] * p[:, 1] + rows[:, 6] * p[:, 2] + rows[:, 7]
    best_v = rows[:, 8] * p[:, 0] + rows[:, 9] * p[:, 1] + rows[:, 10] * p[:, 2] + rows[:, 11]
    return hit, jnp.where(hit, best_t, jnp.inf), idx, best_u, best_v


def pack_big_tables(tri_bw: np.ndarray, tri_table: np.ndarray):
    """Build the big-mesh kernel tables.

    Args:
      tri_bw: (T, 12) Baldwin–Weber rows.
      tri_table: (T, 9) [a, e1, e2] rows (for AABB computation).

    Returns (big_bw (P*PIECE_TRIS, 12), big_box (P, 6),
             big_sl (P*SL_PER_PIECE, 6)) — float32, padding inert.
    """
    t = tri_bw.shape[0]
    p = max(1, (t + PIECE_TRIS - 1) // PIECE_TRIS)
    big_bw = np.zeros((p * PIECE_TRIS, 12), np.float32)
    big_bw[:t] = tri_bw

    def bounds(lo_tri, hi_tri):
        # shared group-bounds formula — keeps piece/superleaf culling
        # geometrically consistent with the dense tiers' ksl_bounds
        return bvhlib.tri_rows_aabb(tri_table[lo_tri:hi_tri])

    big_box = np.stack(
        [bounds(i * PIECE_TRIS, min((i + 1) * PIECE_TRIS, t)) for i in range(p)]
    )
    big_sl = np.stack(
        [
            bounds(g * SL, min((g + 1) * SL, t))
            for g in range(p * SL_PER_PIECE)
        ]
    )
    return big_bw, big_box, big_sl
