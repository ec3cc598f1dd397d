"""Mega-bounce kernel: the ENTIRE path-trace loop fused in VMEM.

One pallas_call runs all `path_depth` bounces for a block of rays:
intersection across every primitive class (reusing the fused-scene-kernel
structure), winner material resolve, Threefry-2x32 RNG, the masked BSDF
switch, and the throughput/radiance update — with the whole wavefront
state (origin, direction, throughput, radiance, alive) resident in VMEM
registers. HBM traffic for a whole render chunk is one read of the camera
rays and one write of the radiance: the renderer runs at VPU arithmetic
speed instead of HBM bandwidth.

Applicability (checked by `scene_is_simple`): every mesh is dense
(≤ DENSE_MESH_MAX_TRIS) with an explicit material and no normal map —
exactly the BASELINE north-star scene shape (Cornell + teapot + analytic
primitives). Textured scenes use the staged pipeline
(scene_intersect kernel + jnp resolve/BSDF).

Correctness contract: bit-level algorithm identical to the jnp
integrator.path_trace (same Threefry counters per (uid, site, draw), same
estimator conventions — materials.rs:33-166, tracing.rs:300-324);
asserted by tests/test_bounce_kernel.py in interpret mode.

Mesh scan (v4, packed min-key): the per-triangle Baldwin–Weber test
folds every reject condition (u>=0, v>=0, u+v<=1, t>=t_min) into the
sign bit of one int32 candidate key whose payload is the raw bitcast of
t — every live candidate has t ≥ t_min > 0, and for non-negative floats
the int32 pattern order equals the float order, so a signed `<` chain
keeps the nearest hit with zero per-triangle payload selects. The
winning triangle's row index is the only other per-triangle carry.
After the scan, the winner's Baldwin–Weber rows and octahedral corner
normals are fetched once per bounce by per-lane dynamic gathers
(`take_along_axis` over 128-lane table rows); its t is re-derived from
the gathered plane row with one true divide, then u, v from that exact
t — hit points never see the scan's approx-reciprocal error, and the
hit set matches Möller–Trumbore up to float rounding at triangle edges
(same contract as v3, tests/test_bounce_kernel.py tolerance).

The reference's |det| >= 1e-4 grazing reject (geometry.rs:336) is
replicated in the integer domain (|den| = |MT det| for Baldwin–Weber
rows): it is NOT statistical noise — on small-triangle meshes the det
is ~2·area and the reject fires on a few percent of real hits.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cs397raytracingsp22_tpu.models import materials as matlib
from cs397raytracingsp22_tpu.utils.rng import SITE_BOUNCE0

MT_EPSILON = 1e-4
LANES = 128
# 64 rows × 128 lanes = 8192 rays/block: measured optimum on v5e with the
# v4 packed-key scan (395.7 Mrays/s vs 381.9 at 32, 359.1 at 128, 351.7
# at 16 — the key/widx-only triangle carry halves live vector state, so
# bigger blocks pipeline better before hitting VMEM pressure).
DEFAULT_BLOCK_ROWS = 64
PI = 3.14159265358979
TWO_PI = 2.0 * PI

_ROT = (13, 15, 26, 6, 17, 29, 16, 24)


# Below this dense-mesh size, superleaf culling is disabled on bounce ≥ 1:
# incoherent tiles practically never cull (any-of-2048 rays crosses every
# group box), so the per-group slab + reduce + cond overhead is pure loss —
# measured 267 vs 245 Mrays/s on the 240-tri north-star at depth 8. On
# coherent primary tiles (bounce 0) culling is a 1.5× win (281 vs 185 at
# depth 1), so bounce 0 always culls.
SL_MIN_TRIS_DEEP = 1024


def _superleaf_mode() -> str:
    """RT_SL: "1" auto (cull bounce 0 + big meshes, the default),
    "0" never, "2" always. Diagnostics/benchmark knob."""
    import os

    return os.environ.get("RT_SL", "1")


def _recip_mode() -> str:
    """RT_RECIP: "2" approx reciprocal (default), "1" approx + one
    Newton step, "0" exact divide. Diagnostics/benchmark knob."""
    import os

    return os.environ.get("RT_RECIP", "2")


def _block_rows_default() -> int:
    """Block row count (RT_BLOCK_ROWS overrides for sweeps)."""
    import os

    return int(os.environ.get("RT_BLOCK_ROWS", str(DEFAULT_BLOCK_ROWS)))


def _auto_block_rows(total_dense_tris: int) -> int:
    """Dense-scan block rows scaled by the scene's TOTAL padded dense-mesh
    triangle count. The fully-unrolled 16-tri group bodies spill scoped
    VMEM proportionally to block_rows × live state, and Mosaic's scoped
    budget is fixed — measured on the 6,144-tri teapot (2026-08-17,
    tools/bench_teapot_6k.py): 64 rows fails AOT compile (25.96M > 16M
    scoped vmem), 32 rows runs at 20.66 Mrays/s (vs 11.81 through the
    SMEM-piece big-mesh path — dense wins 1.75× at 6k). RT_BLOCK_ROWS
    still overrides for sweeps."""
    import os

    env = os.environ.get("RT_BLOCK_ROWS")
    if env is not None:
        return int(env)
    if total_dense_tris <= 2048:
        return DEFAULT_BLOCK_ROWS
    if total_dense_tris <= 8192:
        return 32
    return 16


# Groups per fori step in the incoherent dense scan (see _build_bounce).
# Measured on the official north-star dispatch (tools/sweep_dense_unroll,
# 240-tri teapot, 64-row blocks): unroll 1 → 454.1 Mrays/s, 3 → 455.4,
# 5 → 431.8, 15 (full unroll) → scoped-vmem OOM (16.14M > 16M spill
# stack); 96-row blocks lose at any unroll. The fori iteration boundary
# costs ~0.3% — the 16-tri group body is already a big straight-line
# block, so deeper unrolling buys nothing before spill pressure bites.
# The scan is op-count bound, not schedule bound (consistent with the
# round-1 tree-min/index-in-key negative results).
DEFAULT_DENSE_UNROLL = 3


def _dense_unroll_default() -> int:
    """Dense-scan unroll chunk (RT_DENSE_UNROLL overrides for sweeps)."""
    import os

    return int(os.environ.get("RT_DENSE_UNROLL", str(DEFAULT_DENSE_UNROLL)))


def _split_scan() -> bool:
    """RT_SPLIT_SCAN=1: run the incoherent dense scan as TWO independent
    min-key accumulator chains over alternating 16-tri groups, merged
    once (earliest-index tie-break → bit-identical winners). A/B knob
    probing whether the scan's serial select chain is latency-bound;
    read at trace time like every RT_* kernel knob."""
    import os

    return os.environ.get("RT_SPLIT_SCAN", "0") == "1"


def _num_mode() -> str:
    """RT_NUM: "sub" (default) computes num = b3 - b·mo' with the same
    3 loads as den; "neg" reads the negated-normal cols 12-14 for a pure
    seeded FMA chain — 1 fewer vector op but 3 more SMEM loads per
    triangle. A/B knob: measured within noise on the north-star
    (457.1 vs 457.7 Mrays/s), so the fewer-loads form is the default."""
    import os

    return os.environ.get("RT_NUM", "sub")


def _probe() -> frozenset:
    """RT_PROBE: comma-list of DIAGNOSTIC section knockouts for wall-time
    attribution (tools/bounce_cost_probe.py). Each mode removes or
    cheapens one section of the bounce body so its true cycle cost —
    including multi-cycle ops (divide/sqrt/transcendentals) invisible to
    jaxpr eq counts — shows up as a bench delta:

      rng        Threefry → constants
      ball       ball sampling → linear ops (no exp/log/sin/cos/sqrt)
      cbrt       ball cube root only → linear (exp+log share)
      sincos     ball circle point only → linear (sin+cos share)
      mresolve   mesh winner resolve → key-decoded t + constant normal
      mres_t     exact-t re-derive only → key-decoded t (skips the 4
                 plane-row gathers + the true divide; u,v/normals keep)
      mres_uv    u,v recompute only → constants (skips the 8 u/v-plane
                 gather columns)
      mres_nrm   corner-normal fetch/decode/interp/normal-matrix →
                 constant world normal
      ana_res    analytic winner resolve only → constant normal/mat
                 (keeps the packed analytic scan)
      nobsdf     material switch → hemisphere/lambertian only
      noscan     dense mesh scan + resolve removed entirely
      noanalytic analytic primitive scan + resolve removed

    Round-4 measured table (512²·64spp north-star dispatch, v5e,
    283.6 ms base): mresolve −8.0%, noanalytic −4.7%, ball −1.3%,
    nobsdf −0.7%, planerecip (since productionized) −0.6%, rng −0.4%,
    noscan −83.2%; RT_RECIP=1 (Newton in the scan) LOSES 6.0%.

    PARITY-BREAKING by design; never set in production renders. Read at
    trace time (A/B runs use a fresh process per mode, like every RT_*
    kernel knob)."""
    import os

    v = os.environ.get("RT_PROBE", "")
    return frozenset(x for x in v.split(",") if x)


def _keycmp_mode() -> str:
    """RT_KEYCMP: "u" runs the dense-scan min over UNSIGNED key
    patterns — a rejected candidate is forced to 0xFFFFFFFF by or-ing
    in its reject sign (`bci(t) | (rej >> 31)`), and a negative t'
    needs no explicit test at all because its sign bit already makes
    the unsigned pattern lose to every valid key. That drops one `or`
    per triangle from this kernel's signed chain (~3% of the
    op-count-bound scan) with BIT-IDENTICAL winner selection
    (tests/test_bounce_kernel.py), and 2 ops/tri in the staged kernels
    (scene_intersect/tri_scan_big, which also gain the t_min-shifted
    domain in this mode). "s" (default) is the signed INT32_MAX-select
    chain. Default stays "s" until the on-chip smoke confirms Mosaic
    lowers the uint32 compare and the A/B wins (tools/round2_measure.sh
    STEP 1b) — interpret-mode tests can't validate the TPU lowering.

    Like every RT_* kernel knob, the env var is read at TRACE time: a
    program cached by an outer jit (the driver's render_chunk) will NOT
    see a mid-process flip — A/B runs must use fresh processes per mode,
    as bench.py and the runbook do. tri_scan_big threads the mode as a
    static jit arg, which protects its DIRECT (eager/test) callers only.
    """
    import os

    return os.environ.get("RT_KEYCMP", "s")


def _rotl(x, r):
    return (x << jnp.uint32(r)) | (x >> jnp.uint32(32 - r))


def _threefry2x32(k0, k1, c0, c1):
    """Tile-level Threefry-2x32-20, identical to utils/threefry.py."""
    ks2 = k0 ^ k1 ^ jnp.uint32(0x1BD11BDA)
    x0 = c0 + k0
    x1 = c1 + k1
    ks = (k1, ks2, k0)
    for group in range(5):
        for i in range(4):
            x0 = x0 + x1
            x1 = _rotl(x1, _ROT[(group % 2) * 4 + i])
            x1 = x1 ^ x0
        x0 = x0 + ks[group % 3]
        x1 = x1 + ks[(group + 1) % 3] + jnp.uint32(group + 1)
    return x0, x1


def _uniforms(k0, k1, uid_u32, site_u32, m, first=0):
    """Uniform tiles [first, first+m) for a bounce draw site — the exact
    layout of threefry.bounce_uniforms: draws 0-3 (ball xyz + branch
    choice) are the four 16-bit halves of ONE Threefry block (counter
    block 0 — one call instead of two per bounce, ~130 VPU ops/ray
    saved), draws j ≥ 4 (volume free-flight, 24-bit) come 2 per block
    from block 1 + (j-4)//2. A caller that needs only the tail (the
    last bounce's volume draws, first=4) skips block 0 while producing
    bit-identical values."""
    out = []
    base = site_u32 << jnp.uint32(16)
    end = first + m
    if first < 4:
        x0, x1 = _threefry2x32(k0, k1, uid_u32, base)
        s16 = jnp.float32(2.0**-16)
        for w in (x0, x1):
            # halves fit in 16 bits → exact via int32 (Mosaic has no
            # direct uint32→float32 cast)
            out.append(
                (w >> jnp.uint32(16)).astype(jnp.int32).astype(jnp.float32)
                * s16
            )
            out.append(
                (w & jnp.uint32(0xFFFF)).astype(jnp.int32).astype(jnp.float32)
                * s16
            )
        start = 0
    else:
        start = 4 + 2 * ((first - 4) // 2)
    scale = jnp.float32(2.0**-24)
    b0 = 1 + (start - 4) // 2 if start >= 4 else 1
    for blk in range(b0, 1 + max(0, (end - 4 + 1) // 2)):
        x0, x1 = _threefry2x32(k0, k1, uid_u32, base + jnp.uint32(blk))
        # top 24 bits → exact via int32
        out.append((x0 >> jnp.uint32(8)).astype(jnp.int32).astype(jnp.float32) * scale)
        out.append((x1 >> jnp.uint32(8)).astype(jnp.int32).astype(jnp.float32) * scale)
    return out[first - start : first - start + m]


def scene_is_simple(scene) -> bool:
    """True when the mega-bounce kernel can run this scene: all meshes
    dense, explicitly-materialed, not normal-mapped, and every
    ConvexVolume sphere-bounded (general boundaries run the staged
    pipeline's entry/exit scan)."""
    if len(scene.dense_mesh_ids) != len(scene.meshes):
        return False
    if scene.n_gvols:
        return False
    # the kernel's material AND analytic-primitive resolves are
    # per-lane gathers over one 128-lane table row (build_bounce_tables)
    if int(scene.mat_type.shape[0]) > LANES:
        return False
    if (scene.n_spheres + scene.n_planes + scene.n_tris
            + scene.n_volumes) > LANES:
        return False
    for m in scene.meshes:
        if m.mat_id < 0 or m.tex_ids[4] >= 0:
            return False
    return True



def _build_bounce(counts, t_min, max_dist, sph_f, sph_m, pln_f, pln_m, tri_f,
                  tri_m, vol_f, vol_m, mesh_xf, mesh_bw, mesh_meta,
                  mat_g, sl_bounds, bw_v, nrm_v, k0, k1, uid_u, shape,
                  primary=False, exact_recip=False, last=False):
    """Build the single-bounce update used by both the full-loop kernel
    and the per-bounce wavefront step kernel. `site_u32` is the RNG draw
    site (SITE_BOUNCE0 + depth), scalar. `primary` marks a bounce whose
    rays are coherent camera rays: superleaf culling is enabled there
    (and for big meshes at any depth — see SL_MIN_TRIS_DEEP). `last`
    marks the final bounce: its scatter can never be traced, so the
    winner gather, normals, scatter RNG, BSDF switch, and throughput
    update are all compiled out — only emission accumulation remains
    (bit-identical radiance; the volume free-flight draws keep their
    counters via _uniforms(first=4))."""
    n_sph = counts["n_sph"]
    n_pln = counts["n_pln"]
    n_tri = counts["n_tri"]
    n_vol = counts["n_vol"]
    mesh_ranges = counts["mesh_ranges"]
    n_mat = counts["n_mat"]
    mat_present = counts.get("mat_present", (0, 1, 2, 3, 4))
    has_met = matlib.METAL in mat_present
    has_die = matlib.DIELECTRIC in mat_present
    has_par = matlib.PARAMETERIZED in mat_present
    has_iso = matlib.ISOTROPIC in mat_present
    if "nobsdf" in _probe():
        # diagnostic: all non-lambertian branches knocked out (see _probe)
        has_met = has_die = has_par = has_iso = False
    n_mesh = len(mesh_ranges)
    fzero = jnp.zeros(shape, jnp.float32)
    izero = jnp.zeros(shape, jnp.int32)

    def bounce(site_u32, state):
        (sox, soy, soz, sdx, sdy, sdz,
         tr, tg, tb, rr, rg, rb, alive, segs) = state

        # ---------------- intersection ----------------
        d2 = sdx * sdx + sdy * sdy + sdz * sdz
        big = jnp.float32(max_dist)
        # hoisted: the quadratic's 1/(2a) depends only on the ray — one
        # divide per bounce instead of one per sphere AND per volume
        if n_sph or n_vol:
            inv2a = 1.0 / (2.0 * d2)

        # Packed analytic selection (same design as the mesh min-key
        # scan): the only per-primitive carries are the exact winning t
        # and the primitive's global row index — 2 selects instead of
        # the old 7-field (t, code, mat, normal, ff) chain, and ALL
        # per-primitive normal/front-face math disappears; the winner's
        # normal/ff/material are resolved once per bounce from gt rows
        # 11-17 (build_bounce_tables) by per-lane gather.
        at = jnp.full(shape, big, jnp.float32)
        aidx = jnp.full(shape, -1, jnp.int32)

        def sph_body(s, at, aidx):
            cx = sph_f[s, 0]
            cy = sph_f[s, 1]
            cz = sph_f[s, 2]
            r = sph_f[s, 3]
            fx = sox - cx
            fy = soy - cy
            fz = soz - cz
            b = 2.0 * (fx * sdx + fy * sdy + fz * sdz)
            c2 = fx * fx + fy * fy + fz * fz - r * r
            disc = b * b - 4.0 * d2 * c2
            ok0 = disc >= 0.0
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            t1 = (-b - sq) * inv2a
            t2 = (-b + sq) * inv2a
            t = jnp.where(t1 >= t_min, t1, t2)
            ok = ok0 & (t >= t_min) & (t < at)
            return jnp.where(ok, t, at), jnp.where(ok, s, aidx)

        # static unroll: small loops with Python-int indices let Mosaic
        # fold the SMEM loads into static offsets and schedule freely
        for s in range(n_sph):
            at, aidx = sph_body(s, at, aidx)

        def pln_body(p, at, aidx):
            px = pln_f[p, 0]
            py = pln_f[p, 1]
            pz = pln_f[p, 2]
            wx = pln_f[p, 3]
            wy = pln_f[p, 4]
            wz = pln_f[p, 5]
            od = (sox - px) * wx + (soy - py) * wy + (soz - pz) * wz
            dw = sdx * wx + sdy * wy + sdz * wz
            # toward-the-plane ⇔ sign(od) ≠ sign(dw) ⇔ (-od)/dw > 0, and
            # that quotient IS the old |od|/|sgn·dw| bit-for-bit when
            # accepted (sign bits only). dw=0 → ±inf loses to t<at;
            # od=0 → t=±0 (or NaN) loses to t≥t_min: no special cases.
            # TPU uses the approx reciprocal (the true divide was 0.6%
            # of the whole bench dispatch across 5 planes — RT_PROBE
            # planerecip measurement); like the mesh scan, the approx t
            # only steers candidate selection — the WINNER's t is
            # re-derived with one exact divide in the analytic resolve,
            # so hit points never carry the 2^-15.9 reciprocal error.
            if exact_recip or _recip_mode() == "0":
                t = (-od) / dw
            else:
                t = (-od) * pl.reciprocal(dw, approx=True)
            ok = (t >= t_min) & (t < at)
            return jnp.where(ok, t, at), jnp.where(ok, n_sph + p, aidx)

        for p in range(n_pln):
            at, aidx = pln_body(p, at, aidx)

        def mt(ax, ay, az, e1x, e1y, e1z, e2x, e2y, e2z, ox_, oy_, oz_,
               dx_, dy_, dz_, best):
            qx = dy_ * e2z - dz_ * e2y
            qy = dz_ * e2x - dx_ * e2z
            qz = dx_ * e2y - dy_ * e2x
            det = e1x * qx + e1y * qy + e1z * qz
            det_ok = jnp.abs(det) >= MT_EPSILON
            f = 1.0 / jnp.where(det_ok, det, 1.0)
            sx = ox_ - ax
            sy = oy_ - ay
            sz = oz_ - az
            u = f * (sx * qx + sy * qy + sz * qz)
            rx = sy * e1z - sz * e1y
            ry = sz * e1x - sx * e1z
            rz = sx * e1y - sy * e1x
            v = f * (dx_ * rx + dy_ * ry + dz_ * rz)
            t = f * (e2x * rx + e2y * ry + e2z * rz)
            ok = (det_ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                  & (t >= t_min) & (t < best))
            return ok, t, u, v

        def tri_body(i, at, aidx):
            ok, t, u, v = mt(
                tri_f[i, 0], tri_f[i, 1], tri_f[i, 2],
                tri_f[i, 3], tri_f[i, 4], tri_f[i, 5],
                tri_f[i, 6], tri_f[i, 7], tri_f[i, 8],
                sox, soy, soz, sdx, sdy, sdz, at,
            )
            return (jnp.where(ok, t, at),
                    jnp.where(ok, n_sph + n_pln + i, aidx))

        for i in range(n_tri):
            at, aidx = tri_body(i, at, aidx)

        # bounce RNG (drawn before volumes need it): 4 + n_vol uniforms
        # — exactly the draws _bounce_draws makes (2 Threefry calls when
        # the scene has no volumes). The last bounce draws only the
        # volume tail (same counters → bit-identical free flight).
        site = site_u32
        if "rng" in _probe():
            # diagnostic: Threefry knocked out (see _probe)
            us = [sdx * 0.0 + c for c in
                  (0.3, 0.5, 0.7, 0.9) + (0.6,) * n_vol]
        elif last:
            us = [None] * 4 + _uniforms(k0, k1, uid_u, site, n_vol, first=4)
        else:
            us = _uniforms(k0, k1, uid_u, site, 4 + n_vol)

        for vi in range(n_vol):
            cx = vol_f[vi, 0]
            cy = vol_f[vi, 1]
            cz = vol_f[vi, 2]
            r = vol_f[vi, 3]
            neg_inv_rho = vol_f[vi, 4]
            fx = sox - cx
            fy = soy - cy
            fz = soz - cz
            b = 2.0 * (fx * sdx + fy * sdy + fz * sdz)
            c2 = fx * fx + fy * fy + fz * fz - r * r
            disc = b * b - 4.0 * d2 * c2
            ok0 = disc >= 0.0
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            t_entr = (-b - sq) * inv2a
            t_exit = (-b + sq) * inv2a
            exit_ok = ok0 & (t_exit >= t_entr + 1e-4)
            in_range = (t_exit >= t_min) & (t_entr <= at)
            t_start = jnp.maximum(t_entr, jnp.float32(t_min))
            t_end = jnp.minimum(t_exit, at)
            dist = neg_inv_rho * jnp.log(jnp.maximum(us[4 + vi], 1e-38))
            ok = ok0 & exit_ok & in_range & (dist < t_end - t_start)
            t = t_start + dist
            at = jnp.where(ok, t, at)
            aidx = jnp.where(ok, n_sph + n_pln + n_tri + vi, aidx)

        # dense meshes, v4 packed min-key scan (module docstring): the
        # only per-triangle carries are one int32 key and the winning
        # global row index; superleaf culling structure is unchanged
        # (a 16-tri group runs only when some ray in the block hits the
        # group AABB closer than its current best).
        sl_ranges = counts["sl_ranges"]
        INTMAX = jnp.int32(2147483647)
        EPS2 = jnp.float32(float(MT_EPSILON) * float(MT_EPSILON))
        BW_COLS = 15
        tmin_f = jnp.float32(t_min)
        best_t = at

        unsigned_key = _keycmp_mode() == "u"

        def bci(x):
            return jax.lax.bitcast_convert_type(x, jnp.int32)

        def bcf(x):
            return jax.lax.bitcast_convert_type(x, jnp.float32)

        def bcu(x):
            return jax.lax.bitcast_convert_type(x, jnp.uint32)

        # Candidate keys are plain bitcasts of t' = t - t_min (no
        # sign-flip): the whole mesh scan runs in a t_min-SHIFTED ray
        # domain — the mesh-space origin is pre-advanced by t_min·d
        # below — so every live candidate has t' ≥ 0, whose int32
        # pattern order equals float order, and the per-triangle
        # `t - t_min` reject subtraction disappears (the sign bit of t'
        # itself joins the reject or-chain). The shift is exact for hit
        # points (mo' + t'·md ≡ mo + t·md) and monotone for ordering;
        # the winner's true t is re-derived exactly post-scan from the
        # UNSHIFTED origin.
        # (An index-in-key min-TREE variant was measured SLOWER, 466 vs
        # 475 Mrays/s: the kernel is op-count-bound — each jnp op is
        # already 8 vregs of ILP on (64,128) tiles — so the 2 extra
        # pack ops/tri cost more than the shorter dependency chain
        # saved. Kept serial chain; negative result recorded here.)
        key0 = bci(best_t - tmin_f)
        key = key0
        widx = izero
        scan_md: list = []

        for mi, (start, count) in enumerate(mesh_ranges):
            r00 = mesh_xf[mi, 0]
            r01 = mesh_xf[mi, 1]
            r02 = mesh_xf[mi, 2]
            r10 = mesh_xf[mi, 3]
            r11 = mesh_xf[mi, 4]
            r12 = mesh_xf[mi, 5]
            r20 = mesh_xf[mi, 6]
            r21 = mesh_xf[mi, 7]
            r22 = mesh_xf[mi, 8]
            tx = mesh_xf[mi, 9]
            ty = mesh_xf[mi, 10]
            tz = mesh_xf[mi, 11]
            mdx = r00 * sdx + r01 * sdy + r02 * sdz
            mdy = r10 * sdx + r11 * sdy + r12 * sdz
            mdz = r20 * sdx + r21 * sdy + r22 * sdz
            # the winner resolve reuses these exact values (bit-identical
            # by definition; re-deriving them cost 9 VPU ops per mesh)
            scan_md.append((mdx, mdy, mdz))
            # t_min-advanced mesh-space origin: hit points are identical
            # (mo' + t'·md = mo + t·md) but the per-triangle t ≥ t_min
            # reject becomes a free sign test of t' (see key0 above).
            mox = r00 * sox + r01 * soy + r02 * soz + tx + tmin_f * mdx
            moy = r10 * sox + r11 * soy + r12 * soz + ty + tmin_f * mdy
            moz = r20 * sox + r21 * soy + r22 * soz + tz + tmin_f * mdz

            def bw_parts(i, mox=mox, moy=moy, moz=moz,
                         mdx=mdx, mdy=mdy, mdz=mdz):
                # Baldwin–Weber off the precomputed rows (flattened
                # 15-col layout: cols 12–14 are the NEGATED normal row,
                # so `num` is a pure 3-FMA chain seeded with b3 — the
                # standalone subtract disappears; 3 extra SMEM loads
                # ride the otherwise idle scalar unit). Every reject
                # (u<0, v<0, u+v>1, t'<0) lands in the sign bit of
                # `rej`. den≈0 → t = ±inf/NaN whose key pattern loses to
                # any real t including the t_max init (padded zero rows
                # produce NaN and never win).
                base = i * BW_COLS
                b0 = mesh_bw[base + 0]
                b1 = mesh_bw[base + 1]
                b2 = mesh_bw[base + 2]
                den = b0 * mdx + b1 * mdy + b2 * mdz
                if _num_mode() == "neg":
                    num = (mesh_bw[base + 12] * mox
                           + (mesh_bw[base + 13] * moy
                              + (mesh_bw[base + 14] * moz
                                 + mesh_bw[base + 3])))
                else:
                    num = mesh_bw[base + 3] - (
                        b0 * mox + b1 * moy + b2 * moz
                    )
                # t via the VPU's approximate-reciprocal instruction:
                # the exact divide was the single most expensive op of
                # the whole scan (measured 396 → 476 Mrays/s). Error is
                # 2^-15.9 relative (measured on v5e over [1e-3, 1e3]) —
                # it only steers winner selection and the reject tests;
                # the winner's t is re-derived exactly post-scan.
                # RT_RECIP=0 restores exact division; =1 adds one
                # Newton step (~1 ulp). Interpret/CPU runs always divide
                # exactly: interpret-mode pl.reciprocal(approx=True) is
                # only ~2^-8 accurate (vs 2^-15.9 on v5e) — coarse enough
                # to flip edge inside-tests and break CPU/TPU parity.
                mode_r = "0" if exact_recip else _recip_mode()
                if mode_r == "0":
                    t = num / den
                elif mode_r == "1":
                    r = pl.reciprocal(den, approx=True)
                    t = num * (r * (2.0 - den * r))
                else:
                    t = num * pl.reciprocal(den, approx=True)
                px = mox + t * mdx
                py = moy + t * mdy
                pz = moz + t * mdz
                u = (mesh_bw[base + 4] * px + mesh_bw[base + 5] * py
                     + mesh_bw[base + 6] * pz + mesh_bw[base + 7])
                v = (mesh_bw[base + 8] * px + mesh_bw[base + 9] * py
                     + mesh_bw[base + 10] * pz + mesh_bw[base + 11])
                # the reference's |det| >= 1e-4 grazing reject
                # (geometry.rs:336) as one fused op: den² - 1e-8 has the
                # sign bit iff |den| < 1e-4 (den² underflows to 0 for
                # |den| < ~1e-19 — still correctly rejected). Boundary
                # cases within ~2^-25 relative of 1e-4 may flip vs an
                # exact |den| compare — inside the statistical-parity
                # contract. Not statistical noise overall: on
                # small-triangle meshes (|e1×e2| ~ 1e-3) it fires on a
                # few % of hits.
                # Sign-bit edge semantics: a barycentric of exactly -0.0
                # rejects here, where a `>= 0.0` test would accept. Only
                # hits landing exactly on a triangle edge whose dots
                # round to negative zero differ — within the documented
                # edge-rounding tolerance (see module docstring).
                if unsigned_key:
                    # t' < 0 needs no explicit reject op here: its sign
                    # bit makes the candidate's uint32 pattern at least
                    # 0x80000000, which loses the unsigned min to every
                    # valid key — one fewer `or` per triangle.
                    rej = (bci(u) | bci(v)) | bci((1.0 - u) - v)
                else:
                    rej = (bci(u) | bci(v)) | (bci((1.0 - u) - v) | bci(t))
                rej = rej | bci(den * den - EPS2)
                return t, rej

            def mesh_body(i, packed):
                key, widx = packed
                t, rej = bw_parts(i)
                if unsigned_key:
                    # Rejected → 0xFFFFFFFF (max uint32, always loses);
                    # negative t' loses by its own sign bit. Winners only
                    # ever hold valid non-negative patterns, so the
                    # post-scan signed `key < key0` stays correct and the
                    # selection is bit-identical to the signed chain.
                    cand = bci(t) | (rej >> 31)
                    ok = bcu(cand) < bcu(key)
                else:
                    cand = jnp.where(rej < 0, INTMAX, bci(t))
                    ok = cand < key
                return jnp.where(ok, cand, key), jnp.where(ok, i, widx)

            def scan16(packed, lo_i, mesh_body=mesh_body):
                for k in range(16):
                    packed = mesh_body(lo_i + k, packed)
                return packed

            sl_first, sl_count = sl_ranges[mi]
            mode = _superleaf_mode()
            cull = (mode == "2") or (
                mode == "1" and (primary or count >= SL_MIN_TRIS_DEEP)
            )
            if not cull:
                # Incoherent small-mesh scan: plain dense groups, no
                # per-group slab/reduce/cond (they never cull here and
                # their overhead is measurable). The group loop is
                # PARTIALLY unrolled (`dense_unroll` groups per fori
                # step, python-unrolled tail): bigger straight-line
                # blocks let Mosaic hoist SMEM loads ahead of the vector
                # math, but a FULL 240-tri unroll overflows the 16MB
                # scoped-vmem spill stack at 64-row blocks (measured:
                # 16.14M > 16.00M limit) — the partial form keeps
                # liveness bounded.
                u = max(1, counts.get("dense_unroll", 1))
                if _split_scan() and sl_count >= 2:
                    # A/B knob (RT_SPLIT_SCAN=1): TWO independent
                    # (key, widx) accumulator chains over alternating
                    # groups, merged once after the loop. The min-key
                    # select chain is the scan's only loop-carried
                    # dependency; splitting halves its latency chain at
                    # the cost of 2 extra vreg carries + a 4-op merge.
                    # The merge's widx tie-break reproduces the serial
                    # chain's earliest-index-wins semantics exactly, so
                    # winner selection is BIT-IDENTICAL for any
                    # partition (equal int32 keys = equal t patterns;
                    # the smaller row index wins, as serial order would).
                    kA, wA = key, widx
                    kB, wB = key, widx
                    n_chunks = sl_count // u

                    if n_chunks > 0:
                        def chunk_body2(ci, p4, scan16=scan16,
                                        start=start, u=u):
                            kA, wA, kB, wB = p4
                            for k in range(u):
                                lo = start + (ci * u + k) * 16
                                if k % 2 == 0:
                                    kA, wA = scan16((kA, wA), lo)
                                else:
                                    kB, wB = scan16((kB, wB), lo)
                            return kA, wA, kB, wB

                        kA, wA, kB, wB = jax.lax.fori_loop(
                            0, n_chunks, chunk_body2, (kA, wA, kB, wB)
                        )
                    for s in range(n_chunks * u, sl_count):
                        lo = start + s * 16
                        if s % 2 == 0:
                            kA, wA = scan16((kA, wA), lo)
                        else:
                            kB, wB = scan16((kB, wB), lo)
                    if unsigned_key:  # match the scan's compare domain
                        okB = (bcu(kB) < bcu(kA)) | ((kB == kA) & (wB < wA))
                    else:
                        okB = (kB < kA) | ((kB == kA) & (wB < wA))
                    key = jnp.where(okB, kB, kA)
                    widx = jnp.where(okB, wB, wA)
                    continue
                packed = (key, widx)
                n_chunks = sl_count // u

                if n_chunks > 0:
                    def chunk_body(ci, packed, scan16=scan16, start=start,
                                   u=u):
                        for k in range(u):
                            packed = scan16(packed, start + (ci * u + k) * 16)
                        return packed

                    packed = jax.lax.fori_loop(
                        0, n_chunks, chunk_body, packed
                    )
                for s in range(n_chunks * u, sl_count):
                    packed = scan16(packed, start + s * 16)
                key, widx = packed
                continue
            inv_mdx = 1.0 / mdx
            inv_mdy = 1.0 / mdy
            inv_mdz = 1.0 / mdz

            def sl_body(s, packed, mox=mox, moy=moy, moz=moz,
                        inv_mdx=inv_mdx, inv_mdy=inv_mdy, inv_mdz=inv_mdz,
                        scan16=scan16, start=start,
                        sl_first=sl_first):
                keyc = packed[0]
                base = (sl_first + s) * 6
                # mox is the t_min-advanced origin, so these slab
                # t-intervals live in the same shifted t' domain as the
                # keys — the tbest comparison below stays consistent.
                t0x = (sl_bounds[base + 0] - mox) * inv_mdx
                t1x = (sl_bounds[base + 3] - mox) * inv_mdx
                t0y = (sl_bounds[base + 1] - moy) * inv_mdy
                t1y = (sl_bounds[base + 4] - moy) * inv_mdy
                t0z = (sl_bounds[base + 2] - moz) * inv_mdz
                t1z = (sl_bounds[base + 5] - moz) * inv_mdz
                lox = jnp.minimum(t0x, t1x)
                hix = jnp.maximum(t0x, t1x)
                loy = jnp.minimum(t0y, t1y)
                hiy = jnp.maximum(t0y, t1y)
                loz = jnp.minimum(t0z, t1z)
                hiz = jnp.maximum(t0z, t1z)
                # current best decoded from the key (raw t' bitcast)
                tbest = bcf(keyc)
                tlo = jnp.maximum(
                    jnp.maximum(lox, loy), jnp.maximum(loz, jnp.float32(0.0))
                )
                thi = jnp.minimum(jnp.minimum(hix, hiy), jnp.minimum(hiz, tbest))
                any_hit = jnp.sum((thi > tlo).astype(jnp.float32)) > 0.0

                lo_i = start + s * 16
                # Groups are always exactly 16 triangles (the scene
                # compiler pads each dense mesh with inert zero rows —
                # their den is 0 ⇒ NaN key, never a winner), so the group
                # body fully unrolls: one big basic block in which Mosaic
                # can hoist the 12 SMEM loads per triangle ahead of the
                # vector math instead of stalling on each.
                def run_group(p, lo_i=lo_i, scan16=scan16):
                    return scan16(p, lo_i)

                return jax.lax.cond(any_hit, run_group, lambda p: p, packed)

            key, widx = jax.lax.fori_loop(
                0, sl_count, sl_body, (key, widx)
            )

        # ---- post-scan mesh winner resolve (once per bounce) ----
        # Decode the winner, fetch its interpolation rows + corner
        # normals by per-lane dynamic gather, recompute u, v from the
        # exact t, then interpolate/flip/normal-matrix exactly like
        # geometry.rs:350-351, 297.
        def oct_dec(wd):
            scale = jnp.float32(1.0 / 32767.0)
            fu = ((wd & 0xFFFF) - 32767).astype(jnp.float32) * scale
            fv = (((wd >> 16) & 0xFFFF) - 32767).astype(jnp.float32) * scale
            z = 1.0 - jnp.abs(fu) - jnp.abs(fv)
            tt = jnp.maximum(-z, 0.0)
            x = fu + jnp.where(fu >= 0.0, -tt, tt)
            y = fv + jnp.where(fv >= 0.0, -tt, tt)
            inv = jax.lax.rsqrt(x * x + y * y + z * z + 1e-30)
            return x * inv, y * inv, z * inv

        # ---- analytic winner resolve (once per bounce) ----
        # gt rows 11-17 (build_bounce_tables) hold per-primitive
        # [mat id, vec(center/w/normal), plane point]; one per-lane
        # gather per row replaces the old per-primitive normal math +
        # 7-select chain. Volume rows carry a zero vec, which yields
        # the zero normal + ff=0 those hits need with no extra selects;
        # miss lanes (aidx<0) produce garbage normals that every
        # downstream update masks with live_hit (as before).
        n_prim = n_sph + n_pln + n_tri + n_vol
        ai = jnp.maximum(aidx, 0)

        def prim_col(c):
            return jnp.take_along_axis(
                jnp.broadcast_to(mat_g[c][None, :], shape), ai, axis=1
            )

        ana_res_out = "ana_res" in _probe()
        if n_prim and ana_res_out:
            # diagnostic: analytic winner resolve knocked out (see
            # _probe) — scan kept, gathers/normal math replaced
            a_hit = aidx >= 0
            mat = izero
            nx = fzero
            ny = fzero
            nz = jnp.where(a_hit, 1.0, 0.0)
            ff = a_hit.astype(jnp.int32)
        elif n_prim:
            a_hit = aidx >= 0
            mat = jnp.where(a_hit, prim_col(11).astype(jnp.int32), 0)
            nx = fzero
            ny = fzero
            nz = fzero
            ff = izero
        else:
            a_hit = None
            mat = izero
            nx = fzero
            ny = fzero
            nz = fzero
            ff = izero
        if n_prim and not last and not ana_res_out:
            vx = prim_col(12)
            vy = prim_col(13)
            vz = prim_col(14)
            if n_sph:
                # sphere: unit outward normal at the hit point
                apx = sox + at * sdx
                apy = soy + at * sdy
                apz = soz + at * sdz
                sxn = apx - vx
                syn = apy - vy
                szn = apz - vz
                inv_len = jax.lax.rsqrt(
                    sxn * sxn + syn * syn + szn * szn + 1e-30
                )
                is_sph_w = ai < n_sph
                vx = jnp.where(is_sph_w, sxn * inv_len, vx)
                vy = jnp.where(is_sph_w, syn * inv_len, vy)
                vz = jnp.where(is_sph_w, szn * inv_len, vz)
            dotd = vx * sdx + vy * sdy + vz * sdz
            front = dotd < 0.0
            sgn = jnp.where(front, 1.0, -1.0)
            ffc = front
            if n_pln:
                # plane: Rust-signum flip toward the ray origin
                # (geometry.rs plane quirk), front face always
                is_pln_w = (ai >= n_sph) & (ai < n_sph + n_pln)
                od = ((sox - prim_col(15)) * vx
                      + (soy - prim_col(16)) * vy
                      + (soz - prim_col(17)) * vz)
                sgn = jnp.where(
                    is_pln_w, jnp.where(od >= 0.0, 1.0, -1.0), sgn
                )
                ffc = is_pln_w | ffc
                # exact winner t (ONE true divide per bounce, replacing
                # one per plane in the scan): od and dotd here are the
                # same expressions the scan evaluates, so in exact-recip
                # (interpret/CPU) mode this rewrite is a bitwise no-op;
                # on TPU it confines the scan's approx-reciprocal error
                # to winner choice, exactly like the mesh-scan contract.
                t_pl = (-od) / dotd
                best_t = jnp.where(is_pln_w, t_pl, best_t)
            nx = sgn * vx
            ny = sgn * vy
            nz = sgn * vz
            ff = ffc.astype(jnp.int32)

        if n_mesh:
            mesh_won = key < key0

            # winner mesh membership + material (all the last bounce
            # needs from a mesh hit: emission lookup key)
            in_mi_list = []
            for mi, (start, count) in enumerate(mesh_ranges):
                if n_mesh == 1:
                    in_mi = mesh_won
                else:
                    lo16 = start
                    hi16 = start + ((count + 15) // 16) * 16
                    in_mi = mesh_won & (widx >= lo16) & (widx < hi16)
                in_mi_list.append(in_mi)
                mat = jnp.where(in_mi, mesh_meta[mi], mat)

        if n_mesh and not last and "mresolve" in _probe():
            # diagnostic: winner gather/normal knocked out — t decoded
            # straight from the scan key, constant normal (see _probe)
            t_mesh = bcf(key) + tmin_f
            best_t = jnp.where(mesh_won, t_mesh, best_t)
            nx = jnp.where(mesh_won, 0.0, nx)
            ny = jnp.where(mesh_won, 0.0, ny)
            nz = jnp.where(mesh_won, 1.0, nz)
            ff = jnp.where(mesh_won, 1, ff)
        elif n_mesh and not last:
            lane = widx & 127
            piece = widx >> 7
            n_pieces = bw_v.shape[0] // 12

            def gather_col(tab, c):
                acc = None
                for p in range(n_pieces):
                    rowv = tab[c * n_pieces + p, :]
                    g = jnp.take_along_axis(
                        jnp.broadcast_to(rowv[None, :], shape), lane, axis=1
                    )
                    acc = g if acc is None else jnp.where(piece == p, g, acc)
                return acc

            # winner's mesh-space ray: the direction is REUSED from the
            # scan (identical expression — bit-identical value); the
            # UNSHIFTED origin is recomputed exactly as the jnp twin
            # does (the scan's origin is t_min-advanced, and unshifting
            # it would round differently). Single-mesh scenes skip the
            # cross-mesh selects entirely.
            moxw = fzero
            moyw = fzero
            mozw = fzero
            mdxw = fzero
            mdyw = fzero
            mdzw = fzero
            for mi, (start, count) in enumerate(mesh_ranges):
                in_mi = in_mi_list[mi]
                r00 = mesh_xf[mi, 0]
                r01 = mesh_xf[mi, 1]
                r02 = mesh_xf[mi, 2]
                r10 = mesh_xf[mi, 3]
                r11 = mesh_xf[mi, 4]
                r12 = mesh_xf[mi, 5]
                r20 = mesh_xf[mi, 6]
                r21 = mesh_xf[mi, 7]
                r22 = mesh_xf[mi, 8]
                mox = (r00 * sox + r01 * soy + r02 * soz + mesh_xf[mi, 9])
                moy = (r10 * sox + r11 * soy + r12 * soz + mesh_xf[mi, 10])
                moz = (r20 * sox + r21 * soy + r22 * soz + mesh_xf[mi, 11])
                mdx, mdy, mdz = scan_md[mi]
                if n_mesh == 1:
                    moxw, moyw, mozw = mox, moy, moz
                    mdxw, mdyw, mdzw = mdx, mdy, mdz
                else:
                    moxw = jnp.where(in_mi, mox, moxw)
                    moyw = jnp.where(in_mi, moy, moyw)
                    mozw = jnp.where(in_mi, moz, mozw)
                    mdxw = jnp.where(in_mi, mdx, mdxw)
                    mdyw = jnp.where(in_mi, mdy, mdyw)
                    mdzw = jnp.where(in_mi, mdz, mdzw)

            # exact winner t from the gathered Baldwin–Weber normal row
            # (one true divide per bounce): hit points never carry the
            # scan's approx-reciprocal or packed-key truncation error.
            if "mres_t" in _probe():
                # diagnostic: t decoded from the scan key (see _probe)
                t_mesh = bcf(key) + tmin_f
            else:
                b0w = gather_col(bw_v, 0)
                b1w = gather_col(bw_v, 1)
                b2w = gather_col(bw_v, 2)
                denw = b0w * mdxw + b1w * mdyw + b2w * mdzw
                numw = gather_col(bw_v, 3) - (
                    b0w * moxw + b1w * moyw + b2w * mozw
                )
                t_mesh = numw / jnp.where(denw == 0.0, 1.0, denw)
            best_t = jnp.where(mesh_won, t_mesh, best_t)
            pxw = moxw + t_mesh * mdxw
            pyw = moyw + t_mesh * mdyw
            pzw = mozw + t_mesh * mdzw

            if "mres_uv" in _probe():
                # diagnostic: interpolation weights → constants
                uu = fzero + 0.3
                vv = fzero + 0.25
            else:
                uu = (gather_col(bw_v, 4) * pxw + gather_col(bw_v, 5) * pyw
                      + gather_col(bw_v, 6) * pzw + gather_col(bw_v, 7))
                vv = (gather_col(bw_v, 8) * pxw + gather_col(bw_v, 9) * pyw
                      + gather_col(bw_v, 10) * pzw + gather_col(bw_v, 11))

            if "mres_nrm" in _probe():
                # diagnostic: whole normal pipeline (fetch + decode +
                # interp + normal matrix) → constant world normal
                for mi in range(n_mesh):
                    mask = in_mi_list[mi]
                    nx = jnp.where(mask, 0.0, nx)
                    ny = jnp.where(mask, 0.0, ny)
                    nz = jnp.where(mask, 1.0, nz)
                    ff = jnp.where(mask, 1, ff)
            else:
                # corner normals: 3 packed-int gathers + in-register
                # octahedral decode. (A round-4 A/B replaced these with
                # 9 f32 gathers of the pre-decoded values — eq count
                # barely moved and the bench LOST ~1%: Mosaic's per-lane
                # dynamic gather is multi-cycle, so 6 extra gathers cost
                # more than 3 decode blocks + 3 rsqrt. Negative result;
                # kept packed.)
                n0x, n0y, n0z = oct_dec(gather_col(nrm_v, 0))
                n1x, n1y, n1z = oct_dec(gather_col(nrm_v, 1))
                n2x, n2y, n2z = oct_dec(gather_col(nrm_v, 2))
                w = 1.0 - uu - vv
                inx0 = uu * n1x + vv * n2x + w * n0x
                iny0 = uu * n1y + vv * n2y + w * n0y
                inz0 = uu * n1z + vv * n2z + w * n0z
                inv_len = jax.lax.rsqrt(
                    inx0 * inx0 + iny0 * iny0 + inz0 * inz0 + 1e-30
                )
                inx = inx0 * inv_len
                iny = iny0 * inv_len
                inz = inz0 * inv_len

                # frontface vs object-space direction, then normal
                # matrix
                front = (inx * mdxw + iny * mdyw + inz * mdzw) < 0.0
                sgn = jnp.where(front, 1.0, -1.0)
                fx = sgn * inx
                fy = sgn * iny
                fz = sgn * inz
                for mi in range(n_mesh):
                    mask = in_mi_list[mi]
                    # normal matrix = inv_transform[:3,:3]^T (cols
                    # 12..20)
                    m00 = mesh_xf[mi, 12]
                    m01 = mesh_xf[mi, 13]
                    m02 = mesh_xf[mi, 14]
                    m10 = mesh_xf[mi, 15]
                    m11 = mesh_xf[mi, 16]
                    m12 = mesh_xf[mi, 17]
                    m20 = mesh_xf[mi, 18]
                    m21 = mesh_xf[mi, 19]
                    m22 = mesh_xf[mi, 20]
                    wx = m00 * fx + m01 * fy + m02 * fz
                    wy = m10 * fx + m11 * fy + m12 * fz
                    wz = m20 * fx + m21 * fy + m22 * fz
                    inv_len = jax.lax.rsqrt(
                        wx * wx + wy * wy + wz * wz + 1e-30
                    )
                    nx = jnp.where(mask, wx * inv_len, nx)
                    ny = jnp.where(mask, wy * inv_len, ny)
                    nz = jnp.where(mask, wz * inv_len, nz)
                    ff = jnp.where(mask, front.astype(jnp.int32), ff)

        if n_prim and n_mesh:
            hit_valid = a_hit | mesh_won
        elif n_prim:
            hit_valid = a_hit
        elif n_mesh:
            hit_valid = mesh_won
        else:
            hit_valid = izero > 0

        # ---------------- material resolve ----------------
        # Per-lane gather over the 128-lane-padded material table rows
        # (build_bounce_tables): one take_along_axis per column replaces
        # the n_mat × 10 where-loop — 104 vs 367 jaxpr eqs at n_mat=7
        # (the hidden cost of the loop is a scalar broadcast per select).
        # Bit-identical: every lane's mat id ∈ [0, n_mat) picks exactly
        # the row the select chain assigned (misses keep mat = 0, whose
        # values are masked out by live_hit below, same as before).
        def mat_col(c):
            return jnp.take_along_axis(
                jnp.broadcast_to(mat_g[c][None, :], shape), mat, axis=1
            )

        if last:
            # final bounce: its scatter is never traced, so only the
            # emission columns matter
            emi_r = mat_col(4)
            emi_g = mat_col(5)
            emi_b = mat_col(6)
        else:
            mtype = mat_col(0).astype(jnp.int32)
            alb_r = mat_col(1)
            alb_g = mat_col(2)
            alb_b = mat_col(3)
            emi_r = mat_col(4)
            emi_g = mat_col(5)
            emi_b = mat_col(6)
            rough = mat_col(7)
            metal = mat_col(8)
            ior = mat_col(9)

        # ---------------- shading update ----------------
        live_hit = alive & hit_valid

        # radiance += throughput * emission  (misses add black bg)
        rr = rr + jnp.where(live_hit, tr * emi_r, 0.0)
        rg = rg + jnp.where(live_hit, tg * emi_g, 0.0)
        rb = rb + jnp.where(live_hit, tb * emi_b, 0.0)

        if last:
            segs = segs + alive.astype(jnp.float32)
            return (sox, soy, soz, sdx, sdy, sdz,
                    tr, tg, tb, rr, rg, rb, live_hit, segs)

        # hitpoint (affine-invariant: o + t*d for every class)
        px = sox + best_t * sdx
        py = soy + best_t * sdy
        pz = soz + best_t * sdz

        # ball sample from u0..u2 (sampling.ball_vec_from_uniform)
        if "ball" in _probe():
            # diagnostic: transcendental-free stand-in (see _probe)
            bx = us[0] - 0.5
            by = us[1] - 0.5
            bz = us[2] - 0.5
        else:
            zb = 2.0 * us[0] - 1.0
            if "cbrt" in _probe():
                # diagnostic: cube root → linear (isolates the cbrt
                # share of the ball budget from sin/cos/sqrt)
                rad_b_ = us[2]
            else:
                # THE sampling.cbrt_fast function (shared with the jnp
                # sampler — bit-identity by construction): bit-hack
                # seed + 3 division-free Newton steps, ~21 single-cycle
                # ops replacing the exp+log multi-cycle pair.
                from cs397raytracingsp22_tpu.utils import sampling as _smp

                rad_b_ = _smp.cbrt_fast(us[2])
            if "sincos" in _probe():
                # diagnostic: circle point → linear
                cphi = us[1] - 0.5
                sphi = 0.5 - us[1]
            else:
                # THE sampling.sincos_2pi function (pure jnp ops — legal
                # inside the kernel): quadrant-reduced minimax pair, ~27
                # single-cycle ops vs two multi-cycle transcendental
                # instructions (the sin+cos pair measured 1.1% of the
                # whole dispatch — BASELINE.md round-4 attribution).
                # Sharing the function makes kernel↔jnp bit-identity
                # hold by construction.
                from cs397raytracingsp22_tpu.utils import sampling as _smp

                cphi, sphi = _smp.sincos_2pi(us[1])
            sb = jnp.sqrt(jnp.maximum(1.0 - zb * zb, 0.0))
            bx = rad_b_ * (sb * cphi)
            by = rad_b_ * (sb * sphi)
            bz = rad_b_ * zb
        u_choice = us[3]

        # hemisphere fold about n
        bd = bx * nx + by * ny + bz * nz
        hx = jnp.where(bd < 0.0, bx - 2.0 * bd * nx, bx)
        hy = jnp.where(bd < 0.0, by - 2.0 * bd * ny, by)
        hz = jnp.where(bd < 0.0, bz - 2.0 * bd * nz, bz)

        # reflect d about n
        ddn = sdx * nx + sdy * ny + sdz * nz
        rxd = sdx - 2.0 * ddn * nx
        ryd = sdy - 2.0 * ddn * ny
        rzd = sdz - 2.0 * ddn * nz

        # metal dir = reflect + roughness*ball (used by Metal and the
        # Parameterized specular lobe)
        if has_met or has_par:
            mexd = rxd + rough * bx
            meyd = ryd + rough * by
            mezd = rzd + rough * bz

        # dielectric (compiled out when the scene has no Dielectric)
        if has_die:
            ffb = ff > 0
            # 1/ior ships as material-table column 10 (the reciprocal of
            # the same float32 — bit-identical to dividing here, minus
            # the per-ray multi-cycle divide)
            eta = jnp.where(ffb, mat_col(10), ior)
            cos_in = jnp.minimum(-(ddn), 1.0)
            critical = (
                eta * jnp.sqrt(jnp.maximum(1.0 - cos_in * cos_in, 0.0)) > 1.0
            )
            r0 = ((ior - 1.0) / (ior + 1.0)) ** 2
            fres = r0 + (1.0 - r0) * (1.0 - jnp.abs(ddn)) ** 5
            # refract (tracing.rs:64-69)
            ct = jnp.minimum(-(ddn), 1.0)
            perp_x = eta * (sdx + ct * nx)
            perp_y = eta * (sdy + ct * ny)
            perp_z = eta * (sdz + ct * nz)
            perp2 = perp_x * perp_x + perp_y * perp_y + perp_z * perp_z
            par = -jnp.sqrt(jnp.abs(1.0 - perp2))
            refr_x = perp_x + par * nx
            refr_y = perp_y + par * ny
            refr_z = perp_z + par * nz
            will_refract = (~critical) & (u_choice >= fres)
            diex = jnp.where(will_refract, refr_x, rxd)
            diey = jnp.where(will_refract, refr_y, ryd)
            diez = jnp.where(will_refract, refr_z, rzd)

        # parameterized (compiled out when absent)
        if has_par:
            r0_15 = jnp.float32(((1.5 - 1.0) / (1.5 + 1.0)) ** 2)
            fres15 = r0_15 + (1.0 - r0_15) * (1.0 - jnp.abs(ddn)) ** 5
            k_s = fres15 * (1.0 - rough)
            k_d = (1.0 - k_s) * (1.0 - metal)
            diffuse = u_choice < k_d
            par_x = jnp.where(diffuse, hx, mexd)
            par_y = jnp.where(diffuse, hy, meyd)
            par_z = jnp.where(diffuse, hz, mezd)
            par_ar = jnp.where(diffuse, alb_r / PI, 1.0 + (alb_r - 1.0) * metal)
            par_ag = jnp.where(diffuse, alb_g / PI, 1.0 + (alb_g - 1.0) * metal)
            par_ab = jnp.where(diffuse, alb_b / PI, 1.0 + (alb_b - 1.0) * metal)
            par_ipdf = jnp.where(diffuse, jnp.float32(TWO_PI), 1.0)

        # switch (absent classes contribute no selects)
        is_lam = mtype == matlib.LAMBERTIAN

        ndx, ndy, ndz = hx, hy, hz
        if has_met:
            is_met = mtype == matlib.METAL
            ndx = jnp.where(is_met, mexd, ndx)
            ndy = jnp.where(is_met, meyd, ndy)
            ndz = jnp.where(is_met, mezd, ndz)
        if has_die:
            is_die = mtype == matlib.DIELECTRIC
            ndx = jnp.where(is_die, diex, ndx)
            ndy = jnp.where(is_die, diey, ndy)
            ndz = jnp.where(is_die, diez, ndz)
        if has_par:
            is_par = mtype == matlib.PARAMETERIZED
            ndx = jnp.where(is_par, par_x, ndx)
            ndy = jnp.where(is_par, par_y, ndy)
            ndz = jnp.where(is_par, par_z, ndz)
        if has_iso:
            is_iso = mtype == matlib.ISOTROPIC
            ndx = jnp.where(is_iso, bx, ndx)
            ndy = jnp.where(is_iso, by, ndy)
            ndz = jnp.where(is_iso, bz, ndz)

        inv_pi = jnp.float32(1.0 / PI)
        atr = jnp.where(is_lam, alb_r * inv_pi, alb_r)
        atg = jnp.where(is_lam, alb_g * inv_pi, alb_g)
        atb = jnp.where(is_lam, alb_b * inv_pi, alb_b)
        if has_die:
            atr = jnp.where(is_die, 1.0, atr)
            atg = jnp.where(is_die, 1.0, atg)
            atb = jnp.where(is_die, 1.0, atb)
        if has_par:
            atr = jnp.where(is_par, par_ar, atr)
            atg = jnp.where(is_par, par_ag, atg)
            atb = jnp.where(is_par, par_ab, atb)

        # reciprocal pdf (2π for half-ball lobes): applied as a multiply
        # — the divide was a multi-cycle VPU op per ray per bounce
        # (sampling.hemisphere_inv_pdf; jnp twin in ops/bsdf.py)
        ipdf = jnp.where(is_lam, jnp.float32(TWO_PI), 1.0)
        if has_par:
            ipdf = jnp.where(is_par, par_ipdf, ipdf)

        # dot term (tracing.rs:313): |new_dir . n| clamped; 1 when
        # the normal is zero (volume scatter)
        n2 = nx * nx + ny * ny + nz * nz
        dot_nd = jnp.abs(ndx * nx + ndy * ny + ndz * nz)
        dot_term = jnp.where(n2 > 0.0, jnp.clip(dot_nd, 0.0, 1.0), 1.0)
        fac = dot_term * ipdf

        tr = jnp.where(live_hit, tr * fac * atr, tr)
        tg = jnp.where(live_hit, tg * fac * atg, tg)
        tb = jnp.where(live_hit, tb * fac * atb, tb)
        sox = jnp.where(live_hit, px, sox)
        soy = jnp.where(live_hit, py, soy)
        soz = jnp.where(live_hit, pz, soz)
        sdx = jnp.where(live_hit, ndx, sdx)
        sdy = jnp.where(live_hit, ndy, sdy)
        sdz = jnp.where(live_hit, ndz, sdz)
        segs = segs + alive.astype(jnp.float32)
        alive = live_hit

        return (sox, soy, soz, sdx, sdy, sdz,
                tr, tg, tb, rr, rg, rb, alive, segs)

    return bounce

def _make_kernel(counts, *, path_depth, t_min, max_dist, exact_recip=False):
    n_sph = counts["n_sph"]
    n_pln = counts["n_pln"]
    n_tri = counts["n_tri"]
    n_vol = counts["n_vol"]
    mesh_ranges = counts["mesh_ranges"]
    n_mat = counts["n_mat"]
    n_mesh = len(mesh_ranges)

    def kernel(
        key_ref, sph_f, sph_m, pln_f, pln_m, tri_f, tri_m, vol_f, vol_m,
        mesh_xf, mesh_bw, mesh_meta, mat_g, sl_bounds,
        bw_v, nrm_v,
        ox, oy, oz, dx, dy, dz, uid,
        rad_r, rad_g, rad_b, seg_out,
    ):
        shape = ox.shape
        # SMEM scalars: Mosaic broadcasts scalar operands onto tiles
        # natively (an explicit broadcast_to triggers a relayout error).
        k0 = key_ref[0]
        k1 = key_ref[1]
        uid_u = uid[:].astype(jnp.uint32)

        # Loop carries must start as materialized vectors (derived from a
        # load), not splat constants — Mosaic rejects carries whose layout
        # flips from replicated to non-replicated across iterations.
        vec0 = ox[:] * 0.0
        vec1 = vec0 + 1.0
        fzero = jnp.zeros(shape, jnp.float32)
        izero = jnp.zeros(shape, jnp.int32)

        state = (
            ox[:], oy[:], oz[:],          # origin
            dx[:], dy[:], dz[:],          # direction
            vec1, vec1, vec1,              # throughput rgb
            vec0, vec0, vec0,              # radiance rgb
            vec0 == 0.0,                   # alive (all true, vector layout)
            vec0,                          # segments
        )

        common = (
            counts, t_min, max_dist, sph_f, sph_m, pln_f, pln_m, tri_f,
            tri_m, vol_f, vol_m, mesh_xf, mesh_bw, mesh_meta,
            mat_g, sl_bounds, bw_v, nrm_v, k0, k1, uid_u, shape,
        )
        # Unrolled: path_depth is static, and Mosaic cannot legalize an
        # scf.for with this carry structure (bool + 14 vectors). Unrolling
        # also lets the compiler specialize bounce 0 (throughput == 1,
        # coherent camera rays → superleaf culling on) and the LAST
        # bounce (scatter never traced → winner gather/BSDF/scatter RNG
        # compiled out, bit-identical radiance).
        for depth in range(path_depth):
            b = _build_bounce(
                *common,
                primary=depth == 0,
                exact_recip=exact_recip,
                last=depth == path_depth - 1,
            )
            state = b(jnp.uint32(SITE_BOUNCE0 + depth), state)
        (_, _, _, _, _, _, _, _, _, rr, rg, rb, _, segs) = state
        rad_r[:] = rr
        rad_g[:] = rg
        rad_b[:] = rb
        seg_out[:] = segs

    return kernel


def build_bounce_tables(scene):
    """Extra SMEM tables the mega kernel needs beyond SceneData's k*:
    mesh_xf extended with the normal matrix, concatenated corner normals,
    per-mesh material ids, and the material parameter table.

    Pure jnp on tiny arrays — safe to call inside jit (the driver builds
    these at trace time; XLA constant-folds them per compiled scene shape).
    """
    rows = []
    nrms = []
    metas = []
    for mi in scene.dense_mesh_ids:
        m = scene.meshes[mi]
        inv = jnp.asarray(m.inv_transform)
        rows.append(
            jnp.concatenate(
                [
                    inv[:3, :3].reshape(-1),
                    inv[:3, 3],
                    jnp.asarray(m.normal_mat).reshape(-1),
                ]
            )
        )
        # octahedral-packed corner normals, bitcast to int32 for SMEM.
        # (Round-4 negative result: shipping the pre-decoded values as
        # 9 f32 gather columns instead LOST ~1% on the bench — Mosaic's
        # per-lane gather is multi-cycle, costing more than the decode.)
        nr = jax.lax.bitcast_convert_type(
            jnp.asarray(m.tri_noct), jnp.int32
        ).reshape(-1, 3)
        # match the 16-multiple padding of kmesh_bw rows (scene.py) so
        # global row indices line up across tables
        pad = (-nr.shape[0]) % 16
        if pad:
            nr = jnp.concatenate([nr, jnp.zeros((pad, 3), jnp.int32)])
        nrms.append(nr)
        metas.append(m.mat_id)
    mesh_xf = (
        jnp.stack(rows) if rows else jnp.zeros((1, 21), jnp.float32)
    )
    mesh_nrm = (
        jnp.concatenate(nrms, axis=0) if nrms else jnp.zeros((1, 3), jnp.int32)
    )
    mesh_meta = jnp.asarray(metas if metas else [0], jnp.int32)

    mat_tab = jnp.concatenate(
        [
            jnp.asarray(scene.mat_type, jnp.float32)[:, None],
            scene.mat_albedo,
            scene.mat_emission,
            scene.mat_roughness[:, None],
            scene.mat_metallic[:, None],
            scene.mat_ior[:, None],
        ],
        axis=1,
    )
    # 128-lane gather layout: row c holds column c of the material table
    # so the kernel's resolve is one take_along_axis per column
    # (scene_is_simple gates n_mat ≤ 128). Row 10 is 1/ior — the
    # dielectric eta without a per-ray divide (reciprocal of the same
    # float32 the kernel would divide by → bit-identical eta).
    n_mat_rows = mat_tab.shape[0]
    mat_g = jnp.zeros((18, LANES), jnp.float32).at[:10, :n_mat_rows].set(
        mat_tab.T
    )
    mat_g = mat_g.at[10, :n_mat_rows].set(1.0 / mat_tab[:, 9])
    # Rows 11-17: the analytic-primitive resolve table, indexed by the
    # packed scan's winner index aidx (sphere rows, then planes, tris,
    # volumes — the scan's candidate numbering). Row 11 = material id;
    # rows 12-14 = the type's resolve vector (sphere center / plane
    # normal w / triangle geometric normal / zero for volumes — the
    # zero vec IS the volume's zero normal); rows 15-17 = plane point
    # (for the exact od = (o-p)·w signum recompute; zero otherwise).
    n_s, n_p = scene.n_spheres, scene.n_planes
    n_t, n_v = scene.n_tris, scene.n_volumes
    prim_mat = jnp.concatenate([
        jnp.asarray(scene.ksph_m, jnp.float32)[:n_s],
        jnp.asarray(scene.kpln_m, jnp.float32)[:n_p],
        jnp.asarray(scene.ktri_m, jnp.float32)[:n_t],
        jnp.asarray(scene.kvol_m, jnp.float32)[:n_v],
    ])
    prim_vec = jnp.concatenate([
        scene.ksph_f[:n_s, 0:3],
        scene.kpln_f[:n_p, 3:6],
        scene.ktri_f[:n_t, 9:12],
        jnp.zeros((n_v, 3), jnp.float32),
    ], axis=0)
    prim_pt = jnp.concatenate([
        jnp.zeros((n_s, 3), jnp.float32),
        scene.kpln_f[:n_p, 0:3],
        jnp.zeros((n_t + n_v, 3), jnp.float32),
    ], axis=0)
    n_prim = n_s + n_p + n_t + n_v
    if n_prim:
        mat_g = mat_g.at[11, :n_prim].set(prim_mat)
        mat_g = mat_g.at[12:15, :n_prim].set(prim_vec.T)
        mat_g = mat_g.at[15:18, :n_prim].set(prim_pt.T)
    # v4 post-scan gather tables: column-major 128-lane pieces so the
    # winner fetch is a per-lane take_along_axis over one table row.
    # bw_gather[c*P + p, l] = kmesh_bw[p*128 + l, c]; same for normals.
    bw = scene.kmesh_bw
    rows_n = bw.shape[0]
    n_pieces = (rows_n + 127) // 128
    pad = n_pieces * 128 - rows_n
    bw_pad = jnp.concatenate([bw, jnp.zeros((pad, 12), jnp.float32)]) if pad else bw
    bw_gather = bw_pad.T.reshape(12 * n_pieces, 128)
    nrm_pad = (
        jnp.concatenate([mesh_nrm, jnp.zeros((rows_n + pad - mesh_nrm.shape[0], 3), jnp.int32)])
        if mesh_nrm.shape[0] < rows_n + pad
        else mesh_nrm[: rows_n + pad]
    )
    nrm_gather = nrm_pad.T.reshape(3 * n_pieces, 128)
    # SMEM-resident scan tables ship FLAT: a 2-D (rows, C) SMEM window
    # pads its minor dim to 128 lanes (measured: f32[6144,12] billed as
    # 3.1 MB — an SMEM OOM for any dense mesh past ~1.5k rows), while a
    # 1-D row stays 4·rows·C bytes. bw_smem appends the NEGATED normal
    # row (cols 12–14) so the kernel's `num` is a pure seeded FMA chain.
    bw_smem = jnp.concatenate([bw, -bw[:, :3]], axis=1).reshape(-1)
    sl_smem = scene.ksl_bounds.reshape(-1)
    return dict(
        mesh_xf=mesh_xf, mesh_nrm=mesh_nrm, mesh_meta=mesh_meta,
        mat_tab=mat_tab, mat_g=mat_g, bw_gather=bw_gather,
        nrm_gather=nrm_gather,
        bw_smem=bw_smem, sl_smem=sl_smem,
    )


def path_trace_pallas(
    scene,
    tables: dict,
    o,
    d,
    uids,
    rng_key,
    path_depth: int,
    max_trace_dist: float,
    t_min: float = 0.001,
    block_rows: int | None = None,
    interpret: bool = False,
    dense_unroll: int | None = None,
):
    """Run the mega-bounce kernel over N primary rays.

    Args:
      scene: compiled SceneData passing `scene_is_simple`.
      tables: build_bounce_tables(scene) result (device arrays).
      o, d: (N, 3); uids (N,) int32; rng_key (2,) uint32.

    Returns (radiance (N, 3), segments scalar).
    """
    if block_rows is None:
        block_rows = _auto_block_rows(sum(c for _, c in scene.kmesh_ranges))
    if dense_unroll is None:
        dense_unroll = _dense_unroll_default()
    interpret = interpret or jax.default_backend() != "tpu"
    n = o.shape[0]
    block = block_rows * LANES
    n_pad = (n + block - 1) // block * block
    grid = n_pad // block

    def plane(x, dtype=jnp.float32):
        x = jnp.broadcast_to(jnp.asarray(x, dtype), (n,))
        return jnp.pad(x, (0, n_pad - n)).reshape(n_pad // LANES, LANES)

    planes = [
        plane(o[:, 0]), plane(o[:, 1]), plane(o[:, 2]),
        plane(d[:, 0]), plane(d[:, 1]), plane(d[:, 2]),
        plane(uids, jnp.int32),
    ]

    counts = dict(
        n_sph=scene.n_spheres,
        n_pln=scene.n_planes,
        n_tri=scene.n_tris,
        n_vol=scene.n_volumes,
        mesh_ranges=scene.kmesh_ranges,
        sl_ranges=scene.ksl_ranges,
        n_mat=int(scene.mat_type.shape[0]),
        mat_present=scene.mat_types_present,
        dense_unroll=dense_unroll,
    )
    probe = _probe()
    if "noscan" in probe:  # diagnostic (see _probe)
        counts["mesh_ranges"] = ()
        counts["sl_ranges"] = ()
    if "noanalytic" in probe:  # diagnostic (see _probe)
        counts.update(n_sph=0, n_pln=0, n_tri=0, n_vol=0)
    kernel = _make_kernel(
        counts, path_depth=path_depth, t_min=t_min, max_dist=max_trace_dist,
        exact_recip=interpret,
    )

    ray_spec = pl.BlockSpec(
        (block_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem_full = pl.BlockSpec(memory_space=pltpu.VMEM)
    fshape = jax.ShapeDtypeStruct((n_pad // LANES, LANES), jnp.float32)

    rr, rg, rb, segs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[smem] * 12 + [vmem_full] + [smem] + [vmem_full] * 2
        + [ray_spec] * 7,
        out_specs=[ray_spec] * 4,
        out_shape=[fshape] * 4,
        interpret=interpret,
    )(
        rng_key,
        scene.ksph_f, scene.ksph_m, scene.kpln_f, scene.kpln_m,
        scene.ktri_f, scene.ktri_m, scene.kvol_f, scene.kvol_m,
        tables["mesh_xf"], tables["bw_smem"],
        tables["mesh_meta"], tables["mat_g"], tables["sl_smem"],
        tables["bw_gather"], tables["nrm_gather"],
        *planes,
    )
    radiance = jnp.stack(
        [rr.reshape(-1)[:n], rg.reshape(-1)[:n], rb.reshape(-1)[:n]], axis=-1
    )
    # padded lanes were alive rays shooting d=0 — exclude their segments
    segments = jnp.sum(segs.reshape(-1)[:n])
    return radiance, segments


def _make_step_kernel(counts, *, t_min, max_dist, exact_recip=False,
                      last=False):
    """One bounce as its own kernel (wavefront mode): state planes in,
    state planes out. Each grid block skips all compute when none of its
    rays are alive — with dead rays compacted to the tail between bounces
    (path_trace_wavefront), whole blocks of dead rays cost only their
    block DMA. `last` builds the final-bounce variant whose scatter is
    compiled out (same specialization as the fused kernel's last
    unrolled bounce): the caller only consumes radiance after it, so the
    stale scatter-state outputs are never read."""

    def kernel(
        key_ref, sph_f, sph_m, pln_f, pln_m, tri_f, tri_m, vol_f, vol_m,
        mesh_xf, mesh_bw, mesh_meta, mat_g, sl_bounds,
        bw_v, nrm_v,
        ox, oy, oz, dx, dy, dz, uid, tr, tg, tb, rr, rg, rb, alive_i,
        o_ox, o_oy, o_oz, o_dx, o_dy, o_dz,
        o_tr, o_tg, o_tb, o_rr, o_rg, o_rb, o_alive,
    ):
        shape = ox.shape
        k0 = key_ref[0]
        k1 = key_ref[1]
        site = key_ref[2]
        uid_u = uid[:].astype(jnp.uint32)

        # primary=True keeps culling on at every step (the wavefront
        # caller compacts rays between bounces, restoring some coherence)
        bounce = _build_bounce(
            counts, t_min, max_dist, sph_f, sph_m, pln_f, pln_m, tri_f,
            tri_m, vol_f, vol_m, mesh_xf, mesh_bw, mesh_meta,
            mat_g, sl_bounds, bw_v, nrm_v, k0, k1, uid_u, shape,
            primary=True, exact_recip=exact_recip, last=last,
        )

        any_alive = jnp.sum(alive_i[:]) > 0

        # Predicated ref-writes instead of a value-carrying lax.cond: an
        # scf.if with a 14-vector (incl. bool) carry fails Mosaic
        # legalization, but pl.when bodies mutating output refs lower fine.
        @pl.when(any_alive)
        def _():
            state_in = (
                ox[:], oy[:], oz[:], dx[:], dy[:], dz[:],
                tr[:], tg[:], tb[:], rr[:], rg[:], rb[:],
                alive_i[:] > 0, ox[:] * 0.0,  # segs counted by caller
            )
            (sox, soy, soz, sdx, sdy, sdz,
             str_, stg, stb, srr, srg, srb, salive, _) = bounce(site, state_in)
            o_ox[:] = sox
            o_oy[:] = soy
            o_oz[:] = soz
            o_dx[:] = sdx
            o_dy[:] = sdy
            o_dz[:] = sdz
            o_tr[:] = str_
            o_tg[:] = stg
            o_tb[:] = stb
            o_rr[:] = srr
            o_rg[:] = srg
            o_rb[:] = srb
            o_alive[:] = salive.astype(jnp.int32)

        @pl.when(jnp.logical_not(any_alive))
        def _():
            o_ox[:] = ox[:]
            o_oy[:] = oy[:]
            o_oz[:] = oz[:]
            o_dx[:] = dx[:]
            o_dy[:] = dy[:]
            o_dz[:] = dz[:]
            o_tr[:] = tr[:]
            o_tg[:] = tg[:]
            o_tb[:] = tb[:]
            o_rr[:] = rr[:]
            o_rg[:] = rg[:]
            o_rb[:] = rb[:]
            o_alive[:] = alive_i[:]

    return kernel


def _stable_partition(alive_i, arrays):
    """Stable partition of flat arrays: alive rows first, dead rows after,
    order preserved within each class. Deterministic; the content-keyed
    RNG makes results invariant under any permutation of rays."""
    alive = alive_i > 0
    na = jnp.cumsum(alive.astype(jnp.int32))
    nd = jnp.cumsum((~alive).astype(jnp.int32))
    total_alive = na[-1]
    pos = jnp.where(alive, na - 1, total_alive + nd - 1)
    return [jnp.zeros_like(a).at[pos].set(a) for a in arrays]


def path_trace_wavefront(
    scene,
    tables: dict,
    o,
    d,
    uids,
    rng_key,
    path_depth: int,
    max_trace_dist: float,
    t_min: float = 0.001,
    block_rows: int | None = None,
    interpret: bool = False,
    compact: bool = True,
):
    """Wavefront path trace: one step-kernel dispatch per bounce with
    dead-ray compaction in between.

    Equivalent to path_trace_pallas (identical RNG counters per
    (uid, site)), but rays that terminate stop costing compute: after the
    stable partition, blocks whose rays are all dead skip the bounce body
    (lax.cond in the step kernel). On open scenes where ~half the segment
    budget dies mid-path this converts directly into throughput.
    """
    interpret = interpret or jax.default_backend() != "tpu"
    if block_rows is None:
        block_rows = _auto_block_rows(sum(c for _, c in scene.kmesh_ranges))
    n = o.shape[0]
    block = block_rows * LANES
    n_pad = (n + block - 1) // block * block
    grid = n_pad // block

    def flat(x, dtype=jnp.float32, fill=0):
        x = jnp.broadcast_to(jnp.asarray(x, dtype), (n,))
        return jnp.pad(x, (0, n_pad - n), constant_values=fill)

    ox = flat(o[:, 0])
    oy = flat(o[:, 1])
    oz = flat(o[:, 2])
    dx = flat(d[:, 0])
    dy = flat(d[:, 1])
    dz = flat(d[:, 2])
    uid = flat(uids, jnp.int32)
    one = jnp.ones((n_pad,), jnp.float32)
    zero = jnp.zeros((n_pad,), jnp.float32)
    tr = one
    tg = one
    tb = one
    rr = zero
    rg = zero
    rb = zero
    alive = flat(jnp.ones((n,), jnp.int32), jnp.int32)  # padding dead
    idx = jnp.arange(n_pad, dtype=jnp.int32)

    counts = dict(
        n_sph=scene.n_spheres,
        n_pln=scene.n_planes,
        n_tri=scene.n_tris,
        n_vol=scene.n_volumes,
        mesh_ranges=scene.kmesh_ranges,
        sl_ranges=scene.ksl_ranges,
        n_mat=int(scene.mat_type.shape[0]),
        mat_present=scene.mat_types_present,
        dense_unroll=_dense_unroll_default(),
    )
    kernel = _make_step_kernel(
        counts, t_min=t_min, max_dist=max_trace_dist, exact_recip=interpret
    )
    # final bounce: scatter never traced → emission-only variant
    kernel_last = _make_step_kernel(
        counts, t_min=t_min, max_dist=max_trace_dist,
        exact_recip=interpret, last=True,
    )

    ray_spec = pl.BlockSpec(
        (block_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    fshape = jax.ShapeDtypeStruct((n_pad // LANES, LANES), jnp.float32)
    ishape = jax.ShapeDtypeStruct((n_pad // LANES, LANES), jnp.int32)

    def plane(x):
        return x.reshape(n_pad // LANES, LANES)

    segments = jnp.zeros((), jnp.float32)
    from cs397raytracingsp22_tpu.utils.rng import SITE_BOUNCE0 as _S0

    for b in range(path_depth):
        segments = segments + jnp.sum(alive.astype(jnp.float32))
        key3 = jnp.concatenate(
            [jnp.asarray(rng_key, jnp.uint32), jnp.asarray([_S0 + b], jnp.uint32)]
        )
        outs = pl.pallas_call(
            kernel_last if b == path_depth - 1 else kernel,
            grid=(grid,),
            in_specs=[smem] * 12
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] + [smem]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
            + [ray_spec] * 14,
            out_specs=[ray_spec] * 13,
            out_shape=[fshape] * 12 + [ishape],
            interpret=interpret,
        )(
            key3,
            scene.ksph_f, scene.ksph_m, scene.kpln_f, scene.kpln_m,
            scene.ktri_f, scene.ktri_m, scene.kvol_f, scene.kvol_m,
            tables["mesh_xf"], tables["bw_smem"],
            tables["mesh_meta"], tables["mat_g"], tables["sl_smem"],
            tables["bw_gather"], tables["nrm_gather"],
            plane(ox), plane(oy), plane(oz), plane(dx), plane(dy), plane(dz),
            plane(uid), plane(tr), plane(tg), plane(tb),
            plane(rr), plane(rg), plane(rb), plane(alive),
        )
        (ox, oy, oz, dx, dy, dz, tr, tg, tb, rr, rg, rb, alive) = [
            x.reshape(-1) for x in outs
        ]
        if compact and b < path_depth - 1:
            (ox, oy, oz, dx, dy, dz, tr, tg, tb, rr, rg, rb, uid, idx, alive) = (
                _stable_partition(
                    alive,
                    [ox, oy, oz, dx, dy, dz, tr, tg, tb, rr, rg, rb, uid, idx, alive],
                )
            )

    # un-permute radiance back to the caller's ray order
    out_r = jnp.zeros((n_pad,), jnp.float32).at[idx].set(rr)[:n]
    out_g = jnp.zeros((n_pad,), jnp.float32).at[idx].set(rg)[:n]
    out_b = jnp.zeros((n_pad,), jnp.float32).at[idx].set(rb)[:n]
    radiance = jnp.stack([out_r, out_g, out_b], axis=-1)
    return radiance, segments
