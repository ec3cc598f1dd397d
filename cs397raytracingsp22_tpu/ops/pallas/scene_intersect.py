"""Fused whole-scene intersection kernel.

One Pallas kernel computes, for a VMEM-resident block of rays, the nearest
hit across every analytic primitive group and every dense mesh:

  spheres → planes → standalone triangles → convex volumes → per-mesh
  object-space triangle scans

carrying (best_t, group code, primitive index, u, v, normal, frontface,
material id) in registers. Scene tables are SMEM scalars broadcast onto
(rows, 128) ray tiles — there is no per-candidate HBM traffic at all,
which is what makes this TPU-native: the jnp fallback materializes dozens
of (N, K) candidate buffers per bounce and is HBM-bound.

Big meshes (> BRUTE_FORCE_MAX_TRIS) are handled outside by the BVH
traversal and merged with the kernel's result in jnp.

Semantics mirror ops/intersect.py exactly (the jnp implementation is the
specification; tests assert equality):
- sphere root selection t1-if-t1≥t_min-else-t2 (geometry.rs:406-410);
- plane signum flip toward the ray origin (geometry.rs:477-480);
- Möller–Trumbore with |det| ≥ 1e-4 (geometry.rs:331-349);
- ConvexVolume free-flight sampling with a per-(ray, volume) uniform
  (geometry.rs:502-525); using the running best_t as the clip bound is
  algebraically identical to the reference's test-then-compare (the
  accept condition is dist < min(exit, t_max, best) - start either way);
- mesh rays transformed WITHOUT renormalization so the ray parameter t
  compares across objects (geometry.rs:304).

Group codes: 0 sphere, 1 plane, 2 triangle, 3 volume, 4+m dense mesh m.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MT_EPSILON = 1e-4
LANES = 128
DEFAULT_BLOCK_ROWS = 64  # re-measured 2026-08-17 on the drone scene:
# 34.3 Mrays/s at 64 rows vs 6.3 at the old 16 (32: 32.7, 8: 22.8) —
# the v4 packed carry halved live state, so bigger blocks pipeline far
# better (same shift as bounce.py DEFAULT_BLOCK_ROWS)

CODE_SPHERE = 0
CODE_PLANE = 1
CODE_TRI = 2
CODE_VOLUME = 3
CODE_MESH0 = 4


def _mt_test(ox, oy, oz, dx, dy, dz, ax, ay, az, e1x, e1y, e1z, e2x, e2y, e2z,
             t_min, best_t):
    """Möller–Trumbore on a tile vs one scalar triangle. Returns
    (ok, t, u, v)."""
    qx = dy * e2z - dz * e2y
    qy = dz * e2x - dx * e2z
    qz = dx * e2y - dy * e2x
    det = e1x * qx + e1y * qy + e1z * qz
    det_ok = jnp.abs(det) >= MT_EPSILON
    f = 1.0 / jnp.where(det_ok, det, 1.0)
    sx = ox - ax
    sy = oy - ay
    sz = oz - az
    u = f * (sx * qx + sy * qy + sz * qz)
    rx = sy * e1z - sz * e1y
    ry = sz * e1x - sx * e1z
    rz = sx * e1y - sy * e1x
    v = f * (dx * rx + dy * ry + dz * rz)
    t = f * (e2x * rx + e2y * ry + e2z * rz)
    ok = det_ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t >= t_min) & (t < best_t)
    return ok, t, u, v


def _make_kernel(counts, exact_recip=False):
    """counts: dict with static n_sph, n_pln, n_tri, n_vol and
    mesh_ranges [(start, count), ...] into the concatenated mesh table.
    exact_recip: True on the interpret/CPU path, whose approx reciprocal
    is only ~2^-8 accurate (bounce.py/tri_scan_big.py contract)."""
    n_sph = counts["n_sph"]
    n_pln = counts["n_pln"]
    n_tri = counts["n_tri"]
    n_vol = counts["n_vol"]
    mesh_ranges = counts["mesh_ranges"]

    sl_ranges = counts["sl_ranges"]

    def kernel(
        sph_f, sph_m, pln_f, pln_m, tri_f, tri_m, vol_f, vol_m, mesh_xf, mesh_bw,
        sl_bounds, ox, oy, oz, dx, dy, dz, tmn, tmx, *rest,
    ):
        uvols = rest[: n_vol]
        (o_t, o_code, o_idx, o_mat, o_u, o_v, o_nx, o_ny, o_nz, o_ff) = rest[n_vol:]

        shape = ox.shape
        oxv, oyv, ozv = ox[:], oy[:], oz[:]
        dxv, dyv, dzv = dx[:], dy[:], dz[:]
        t_min = tmn[:]

        best_t = tmx[:]
        code = jnp.full(shape, -1, jnp.int32)
        idx = jnp.zeros(shape, jnp.int32)
        mat = jnp.zeros(shape, jnp.int32)
        uu = jnp.zeros(shape, jnp.float32)
        vv = jnp.zeros(shape, jnp.float32)
        nx = jnp.zeros(shape, jnp.float32)
        ny = jnp.zeros(shape, jnp.float32)
        nz = jnp.zeros(shape, jnp.float32)
        ff = jnp.zeros(shape, jnp.int32)

        d2 = dxv * dxv + dyv * dyv + dzv * dzv  # |d|^2, hoisted

        carry = (best_t, code, idx, mat, uu, vv, nx, ny, nz, ff)

        def upd(carry, ok, t, c, i, m, u_, v_, nx_, ny_, nz_, ff_):
            best_t, code, idx, mat, uu, vv, nx, ny, nz, ff = carry
            return (
                jnp.where(ok, t, best_t),
                jnp.where(ok, c, code),
                jnp.where(ok, i, idx),
                jnp.where(ok, m, mat),
                jnp.where(ok, u_, uu),
                jnp.where(ok, v_, vv),
                jnp.where(ok, nx_, nx),
                jnp.where(ok, ny_, ny),
                jnp.where(ok, nz_, nz),
                jnp.where(ok, ff_, ff),
            )

        zero = jnp.zeros(shape, jnp.float32)
        izero = jnp.zeros(shape, jnp.int32)

        # ---- spheres (geometry.rs:395-411) ----
        def sph_body(s, carry):
            cx = sph_f[s, 0]
            cy = sph_f[s, 1]
            cz = sph_f[s, 2]
            r = sph_f[s, 3]
            fx = oxv - cx
            fy = oyv - cy
            fz = ozv - cz
            b = 2.0 * (fx * dxv + fy * dyv + fz * dzv)
            c2 = fx * fx + fy * fy + fz * fz - r * r
            disc = b * b - 4.0 * d2 * c2
            ok0 = disc >= 0.0
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            inv2a = 1.0 / (2.0 * d2)
            t1 = (-b - sq) * inv2a
            t2 = (-b + sq) * inv2a
            t = jnp.where(t1 >= t_min, t1, t2)
            ok = ok0 & (t >= t_min) & (t < carry[0])
            px = oxv + t * dxv
            py = oyv + t * dyv
            pz = ozv + t * dzv
            gx = px - cx
            gy = py - cy
            gz = pz - cz
            inv_len = jax.lax.rsqrt(gx * gx + gy * gy + gz * gz + 1e-30)
            gx = gx * inv_len
            gy = gy * inv_len
            gz = gz * inv_len
            front = (gx * dxv + gy * dyv + gz * dzv) < 0.0
            sgn = jnp.where(front, 1.0, -1.0)
            return upd(
                carry, ok, t, CODE_SPHERE, s, sph_m[s],
                zero, zero, sgn * gx, sgn * gy, sgn * gz,
                front.astype(jnp.int32),
            )

        # static unroll (bounce.py lesson: fori bodies stall on SMEM
        # loads; Python-int indices fold to static offsets)
        for s in range(n_sph):
            carry = sph_body(s, carry)

        # ---- planes (geometry.rs:474-487) ----
        def pln_body(p, carry):
            px = pln_f[p, 0]
            py = pln_f[p, 1]
            pz = pln_f[p, 2]
            nx_ = pln_f[p, 3]
            ny_ = pln_f[p, 4]
            nz_ = pln_f[p, 5]
            od = (oxv - px) * nx_ + (oyv - py) * ny_ + (ozv - pz) * nz_
            sgn = jnp.where(od >= 0.0, 1.0, -1.0)  # Rust signum
            wnx = sgn * nx_
            wny = sgn * ny_
            wnz = sgn * nz_
            dd = dxv * wnx + dyv * wny + dzv * wnz
            t = jnp.abs(od) / jnp.abs(jnp.where(dd == 0.0, 1.0, dd))
            ok = (dd < 0.0) & (t >= t_min) & (t < carry[0])
            return upd(
                carry, ok, t, CODE_PLANE, p, pln_m[p],
                zero, zero, wnx, wny, wnz, jnp.ones(shape, jnp.int32),
            )

        for p in range(n_pln):
            carry = pln_body(p, carry)

        # ---- standalone triangles (geometry.rs:431-449) ----
        def tri_body(i, carry):
            ok, t, u, v = _mt_test(
                oxv, oyv, ozv, dxv, dyv, dzv,
                tri_f[i, 0], tri_f[i, 1], tri_f[i, 2],
                tri_f[i, 3], tri_f[i, 4], tri_f[i, 5],
                tri_f[i, 6], tri_f[i, 7], tri_f[i, 8],
                t_min, carry[0],
            )
            gnx = tri_f[i, 9]
            gny = tri_f[i, 10]
            gnz = tri_f[i, 11]
            front = (gnx * dxv + gny * dyv + gnz * dzv) < 0.0
            sgn = jnp.where(front, 1.0, -1.0)
            return upd(
                carry, ok, t, CODE_TRI, i, tri_m[i],
                zero, zero, sgn * gnx, sgn * gny, sgn * gnz,
                front.astype(jnp.int32),
            )

        for i in range(n_tri):
            carry = tri_body(i, carry)

        # ---- convex volumes (geometry.rs:502-525) ----
        # unrolled: each volume reads its own uniform plane
        for vi in range(n_vol):
            cx = vol_f[vi, 0]
            cy = vol_f[vi, 1]
            cz = vol_f[vi, 2]
            r = vol_f[vi, 3]
            neg_inv_rho = vol_f[vi, 4]
            fx = oxv - cx
            fy = oyv - cy
            fz = ozv - cz
            b = 2.0 * (fx * dxv + fy * dyv + fz * dzv)
            c2 = fx * fx + fy * fy + fz * fz - r * r
            disc = b * b - 4.0 * d2 * c2
            ok0 = disc >= 0.0
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            inv2a = 1.0 / (2.0 * d2)
            t_entr = (-b - sq) * inv2a
            t_exit = (-b + sq) * inv2a
            exit_ok = ok0 & (t_exit >= t_entr + 1e-4)
            in_range = (t_exit >= t_min) & (t_entr <= carry[0])
            t_start = jnp.maximum(t_entr, t_min)
            t_end = jnp.minimum(t_exit, carry[0])
            dist_in = t_end - t_start
            uvol = uvols[vi][:]
            dist = neg_inv_rho * jnp.log(jnp.maximum(uvol, 1e-38))
            ok = ok0 & exit_ok & in_range & (dist < dist_in)
            t = t_start + dist
            carry = upd(
                carry, ok, t, CODE_VOLUME, vi, vol_m[vi],
                zero, zero, zero, zero, zero, izero,
            )

        # ---- dense meshes: object-space Baldwin–Weber group scans ----
        # Same packed min-key structure as the mega kernel's mesh section
        # (bounce.py): BW rows off SMEM scalars, 16-triangle groups fully
        # unrolled (kmesh ranges are 16-padded with inert zero rows), the
        # only carries are one int32 key (raw bitcast of t — valid
        # candidates have t >= t_min > 0 so pattern order equals float
        # order) and the winning global row. The winner's exact t/u/v are
        # re-derived by intersect_scene_fused from its gathered row; the
        # kernel's u/v/t outputs for mesh winners carry the scan's approx
        # values only as placeholders. Superleaf slab culling for larger
        # meshes (the sorted wavefront keeps blocks coherent).
        from cs397raytracingsp22_tpu.ops.pallas.bounce import (
            SL_MIN_TRIS_DEEP,
            _keycmp_mode,
            _superleaf_mode,
        )

        def bci(x):
            return jax.lax.bitcast_convert_type(x, jnp.int32)

        def bcf(x):
            return jax.lax.bitcast_convert_type(x, jnp.float32)

        def bcu(x):
            return jax.lax.bitcast_convert_type(x, jnp.uint32)

        INTMAX = jnp.int32(2147483647)
        ABS_MASK = jnp.int32(0x7FFFFFFF)
        import numpy as _np

        EPS_BITS = jnp.int32(_np.float32(MT_EPSILON).view(_np.int32))
        unsigned_key = _keycmp_mode() == "u"
        best_t0 = carry[0]
        if unsigned_key:
            # t_min-SHIFTED scan domain + unsigned min (bounce.py v4
            # contract, RT_KEYCMP doc): the mesh-space origin is advanced
            # by t_min·d, so every live candidate is t' = t − t_min ≥ 0
            # whose sign bit replaces the per-triangle `t − t_min` reject
            # subtraction, and rejected candidates are forced to
            # 0xFFFFFFFF — 2 fewer ops per triangle than the signed
            # unshifted chain. The where() guard keeps empty occlusion
            # windows (t_max < t_min, dead rays) losing: their key0 is 0,
            # which no candidate beats unsigned (the signed chain got
            # this from the negative key pattern instead).
            key0 = bci(jnp.where(best_t0 > t_min, best_t0 - t_min, 0.0))
        else:
            key0 = bci(best_t0)
        key = key0
        widx = izero

        for mi, (start, count) in enumerate(mesh_ranges):
            # inverse transform (scalars): o' = R*o + tr, d' = R*d
            # (tables arrive FLATTENED 1-D: a 2-D (rows, C) SMEM window
            # pads its minor dim to 128 lanes — f32[6144,12] would bill
            # ~3.1 MB against the 1 MiB SMEM; same fix as bounce.py)
            xb = mi * 12
            r00 = mesh_xf[xb + 0]
            r01 = mesh_xf[xb + 1]
            r02 = mesh_xf[xb + 2]
            r10 = mesh_xf[xb + 3]
            r11 = mesh_xf[xb + 4]
            r12 = mesh_xf[xb + 5]
            r20 = mesh_xf[xb + 6]
            r21 = mesh_xf[xb + 7]
            r22 = mesh_xf[xb + 8]
            tx = mesh_xf[xb + 9]
            ty = mesh_xf[xb + 10]
            tz = mesh_xf[xb + 11]
            mdx = r00 * dxv + r01 * dyv + r02 * dzv
            mdy = r10 * dxv + r11 * dyv + r12 * dzv
            mdz = r20 * dxv + r21 * dyv + r22 * dzv
            mox = r00 * oxv + r01 * oyv + r02 * ozv + tx
            moy = r10 * oxv + r11 * oyv + r12 * ozv + ty
            moz = r20 * oxv + r21 * oyv + r22 * ozv + tz
            if unsigned_key:
                # advance into the shifted t' domain (once per mesh, not
                # per triangle; hit points mo' + t'·md are identical)
                mox = mox + t_min * mdx
                moy = moy + t_min * mdy
                moz = moz + t_min * mdz

            def mesh_body(i, packed, mox=mox, moy=moy, moz=moz,
                          mdx=mdx, mdy=mdy, mdz=mdz):
                key, widx = packed
                rb = i * 12
                b0 = mesh_bw[rb + 0]
                b1 = mesh_bw[rb + 1]
                b2 = mesh_bw[rb + 2]
                den = b0 * mdx + b1 * mdy + b2 * mdz
                num = mesh_bw[rb + 3] - (b0 * mox + b1 * moy + b2 * moz)
                if exact_recip:
                    t = num / jnp.where(den == 0.0, 1e-30, den)
                else:
                    t = num * pl.reciprocal(den, approx=True)
                px = mox + t * mdx
                py = moy + t * mdy
                pz = moz + t * mdz
                u = (mesh_bw[rb + 4] * px + mesh_bw[rb + 5] * py
                     + mesh_bw[rb + 6] * pz + mesh_bw[rb + 7])
                v = (mesh_bw[rb + 8] * px + mesh_bw[rb + 9] * py
                     + mesh_bw[rb + 10] * pz + mesh_bw[rb + 11])
                if unsigned_key:
                    # t' < 0 loses by its own sign bit under the unsigned
                    # min; rejected → 0xFFFFFFFF (always loses). The
                    # grazing reject keeps this kernel's EXACT |den|-bits
                    # form (a den²−eps² FMA would save one more op but
                    # flips accepts within ulps of the 1e-4 boundary —
                    # the A/B tests assert hit-set equality across modes,
                    # and den is domain-shift-independent, so exactness
                    # here keeps the grazing set identical).
                    rej = (bci(u) | bci(v)) | bci((1.0 - u) - v)
                    rej = rej | ((bci(den) & ABS_MASK) - EPS_BITS)
                    cand = bci(t) | (rej >> 31)
                    ok = bcu(cand) < bcu(key)
                else:
                    rej = (bci(u) | bci(v)) | (
                        bci((1.0 - u) - v) | bci(t - t_min)
                    )
                    rej = rej | ((bci(den) & ABS_MASK) - EPS_BITS)
                    cand = jnp.where(rej < 0, INTMAX, bci(t))
                    ok = cand < key
                return jnp.where(ok, cand, key), jnp.where(ok, i, widx)

            def group_body(s, packed, mesh_body=mesh_body, start=start):
                lo_i = start + s * 16
                for k in range(16):
                    packed = mesh_body(lo_i + k, packed)
                return packed

            sl_first, sl_count = sl_ranges[mi]
            mode = _superleaf_mode()
            cull = (mode == "2") or (
                mode == "1" and count >= SL_MIN_TRIS_DEEP
            )
            if not cull:
                key, widx = jax.lax.fori_loop(
                    0, count // 16, group_body, (key, widx)
                )
                continue

            inv_mdx = 1.0 / mdx
            inv_mdy = 1.0 / mdy
            inv_mdz = 1.0 / mdz

            def sl_body(s, packed, mox=mox, moy=moy, moz=moz,
                        inv_mdx=inv_mdx, inv_mdy=inv_mdy, inv_mdz=inv_mdz,
                        group_body=group_body, sl_first=sl_first):
                row = (sl_first + s) * 6
                t0x = (sl_bounds[row + 0] - mox) * inv_mdx
                t1x = (sl_bounds[row + 3] - mox) * inv_mdx
                t0y = (sl_bounds[row + 1] - moy) * inv_mdy
                t1y = (sl_bounds[row + 4] - moy) * inv_mdy
                t0z = (sl_bounds[row + 2] - moz) * inv_mdz
                t1z = (sl_bounds[row + 5] - moz) * inv_mdz
                # shifted domain (u mode): slab intervals and the decoded
                # best key both live in t' = t − t_min, so the lower
                # clamp is 0 there
                lo_clamp = jnp.float32(0.0) if unsigned_key else t_min
                tlo = jnp.maximum(
                    jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                    jnp.maximum(jnp.minimum(t0z, t1z), lo_clamp),
                )
                thi = jnp.minimum(
                    jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                    jnp.minimum(jnp.maximum(t0z, t1z), bcf(packed[0])),
                )
                any_hit = jnp.sum((thi > tlo).astype(jnp.float32)) > 0.0
                return jax.lax.cond(
                    any_hit, lambda p, s=s: group_body(s, p), lambda p: p, packed
                )

            key, widx = jax.lax.fori_loop(0, sl_count, sl_body, (key, widx))

        best_t, code, idx, mat, uu, vv, nx, ny, nz, ff = carry
        if mesh_ranges:
            # mesh winner merge: decoded approx t (exact t/u/v re-derived
            # by the wrapper); idx is the mesh-local row (winner's global
            # row minus its mesh's start)
            mesh_won = key < key0
            # winners only ever hold valid non-negative patterns, so the
            # signed compare stays correct in u mode; decode re-adds the
            # domain shift (approx placeholder either way — the wrapper
            # re-derives the exact t)
            t_dec = bcf(key) + t_min if unsigned_key else bcf(key)
            best_t = jnp.where(mesh_won, t_dec, best_t)
            for mi, (start, count) in enumerate(mesh_ranges):
                if len(mesh_ranges) == 1:
                    in_mi = mesh_won
                else:
                    hi16 = start + ((count + 15) // 16) * 16
                    in_mi = mesh_won & (widx >= start) & (widx < hi16)
                code = jnp.where(in_mi, CODE_MESH0 + mi, code)
                idx = jnp.where(in_mi, widx - start, idx)
        o_t[:] = best_t
        o_code[:] = code
        o_idx[:] = idx
        o_mat[:] = mat
        o_u[:] = uu
        o_v[:] = vv
        o_nx[:] = nx
        o_ny[:] = ny
        o_nz[:] = nz
        o_ff[:] = ff

    return kernel


def scene_intersect_pallas(
    scene,
    o,
    d,
    t_min,
    t_max,
    u_vol,
    block_rows: int | None = None,
    interpret: bool = False,
):
    """Run the fused kernel over N rays.

    Args:
      scene: compiled SceneData (its k* tables feed SMEM; counts/ranges
        are static metadata).
      o, d: (N, 3); t_min/t_max scalar or (N,); u_vol (N, >=n_volumes).

    Returns (t, code, idx, mat_id, u, v, normal, frontface); code == -1
    means miss (t == t_max).
    """
    interpret = interpret or jax.default_backend() != "tpu"
    if block_rows is None:
        # same scoped-VMEM scaling rule as the mega-bounce kernel: the
        # unrolled dense scan's spill grows with block_rows × dense tris
        # (see bounce._auto_block_rows for the 6k-teapot measurements).
        # RT_BLOCK_ROWS wins outright inside _auto_block_rows, same as
        # the bounce kernel, so sweeps measure what they set.
        from cs397raytracingsp22_tpu.ops.pallas.bounce import _auto_block_rows

        block_rows = _auto_block_rows(sum(c for _, c in scene.kmesh_ranges))
    counts = dict(
        n_sph=scene.n_spheres,
        n_pln=scene.n_planes,
        n_tri=scene.n_tris,
        n_vol=scene.n_volumes,
        mesh_ranges=scene.kmesh_ranges,
        sl_ranges=scene.ksl_ranges,
    )
    n = o.shape[0]
    block = block_rows * LANES
    n_pad = (n + block - 1) // block * block
    grid = n_pad // block

    def plane(x):
        x = jnp.broadcast_to(jnp.asarray(x, jnp.float32), (n,))
        return jnp.pad(x, (0, n_pad - n)).reshape(n_pad // LANES, LANES)

    ray_planes = [
        plane(o[:, 0]), plane(o[:, 1]), plane(o[:, 2]),
        plane(d[:, 0]), plane(d[:, 1]), plane(d[:, 2]),
        plane(t_min), plane(t_max),
    ]
    # one uniform plane per ACTUAL volume (kernel unrolls over n_vol)
    uvol_planes = [plane(u_vol[:, i]) for i in range(counts["n_vol"])]

    ray_spec = pl.BlockSpec(
        (block_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    fshape = jax.ShapeDtypeStruct((n_pad // LANES, LANES), jnp.float32)
    ishape = jax.ShapeDtypeStruct((n_pad // LANES, LANES), jnp.int32)

    kernel = _make_kernel(counts, exact_recip=interpret)
    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[smem] * 11 + [ray_spec] * (8 + len(uvol_planes)),
        out_specs=[ray_spec] * 10,
        out_shape=[fshape, ishape, ishape, ishape] + [fshape] * 5 + [ishape],
        interpret=interpret,
    )(
        scene.ksph_f, scene.ksph_m,
        scene.kpln_f, scene.kpln_m,
        scene.ktri_f, scene.ktri_m,
        scene.kvol_f, scene.kvol_m,
        # mesh tables flattened to 1-D: 2-D SMEM windows pad the minor
        # dim to 128 lanes (f32[6144,12] bills ~3.1 MB vs 1 MiB SMEM)
        scene.kmesh_xf.reshape(-1), scene.kmesh_bw.reshape(-1),
        scene.ksl_bounds.reshape(-1),
        *ray_planes, *uvol_planes,
    )
    t, code, idx, mat_id, u, v, nx, ny, nz, ff = [
        x.reshape(-1)[:n] for x in outs
    ]
    normal = jnp.stack([nx, ny, nz], axis=-1)
    return t, code, idx, mat_id, u, v, normal, ff.astype(bool)
