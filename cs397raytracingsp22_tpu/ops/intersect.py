"""Scene-level intersection: batched primitive tests + nearest-hit resolve.

The reference walks `Vec<Arc<dyn Intersectable>>` per ray and returns a
`RayHit` holding an `Arc<dyn Material>` (tracing.rs:326-350). The
TPU-native version tests each *primitive class* as one dense batched op
over the whole ray megabatch, reduces to the per-class nearest hit,
arg-mins across classes, and resolves a flat `HitRecord` SoA whose
material parameters are already gathered — downstream shading never
chases pointers.

Replicated reference quirks (SURVEY.md §3.5):
- Mesh hits keep OBJECT-SPACE t (geometry.rs:304-310) and are compared
  against world-space t of other primitives (tracing.rs:335); t_min/t_max
  are likewise applied in object-space units for meshes.
- Plane normals sign-flip toward the ray origin via Rust signum semantics
  (geometry.rs:477-478).
- ConvexVolume samples its scatter distance inside the intersection test
  (geometry.rs:517) and returns a zero normal (geometry.rs:520).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from cs397raytracingsp22_tpu.models import materials as mat
from cs397raytracingsp22_tpu.models.scene import MeshBlock, SceneData
from cs397raytracingsp22_tpu.ops import bvh as bvhlib
from cs397raytracingsp22_tpu.utils import vecmath as vm

# Meshes at or below this many triangles use the dense chunked
# all-triangles test (pure VPU math, no gathers) instead of BVH traversal
# (gather-bound and lockstep-divergent — slow on TPU). Measured crossover
# is in the thousands of triangles.
BRUTE_FORCE_MAX_TRIS = bvhlib.DENSE_MESH_MAX_TRIS

# python float, NOT jnp.float32(...): a module-level device constant would
# initialize the JAX backend at import time, freezing platform selection
# before the CLI/tests can pick CPU vs TPU.
_BIG = float("inf")


def _use_pallas() -> bool:
    """Route hot kernels through Pallas on TPU; jnp elsewhere (tests run
    the CPU backend, where interpret-mode Pallas would be pure overhead).
    RT_PALLAS=0/1 overrides for A/B benchmarking."""
    import os

    env = os.environ.get("RT_PALLAS")
    if env is not None:
        return env == "1"
    return jax.default_backend() == "tpu"


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "valid",
        "t",
        "point",
        "normal",
        "frontface",
        "mtype",
        "albedo",
        "emission",
        "roughness",
        "metallic",
        "ior",
    ],
    meta_fields=[],
)
@dataclasses.dataclass
class HitRecord:
    """Flat per-ray hit SoA (the RayHit of tracing.rs:109-134, with the
    material dereferenced into its parameters)."""

    valid: jnp.ndarray  # (N,) bool
    t: jnp.ndarray  # (N,) raw hit distance (object-space for meshes!)
    point: jnp.ndarray  # (N, 3) world hitpoint
    normal: jnp.ndarray  # (N, 3) world shading normal (0 for volume hits)
    frontface: jnp.ndarray  # (N,) bool
    mtype: jnp.ndarray  # (N,) int32 material type enum
    albedo: jnp.ndarray  # (N, 3)
    emission: jnp.ndarray  # (N, 3)
    roughness: jnp.ndarray  # (N,)
    metallic: jnp.ndarray  # (N,)
    ior: jnp.ndarray  # (N,)


def _gather_material(scene: SceneData, mid: jnp.ndarray) -> dict:
    return dict(
        mtype=scene.mat_type[mid],
        albedo=scene.mat_albedo[mid],
        emission=scene.mat_emission[mid],
        roughness=scene.mat_roughness[mid],
        metallic=scene.mat_metallic[mid],
        ior=scene.mat_ior[mid],
    )


def _sphere_roots(o, d, center, radius):
    """Quadratic roots of the ray/sphere equation (geometry.rs:395-407).

    o, d: (N, 1, 3); center: (S, 3); radius: (S,).
    Returns (disc_ok, t1, t2) each (N, S); t1 <= t2 where disc_ok.
    """
    f = o - center  # (N, S, 3)
    a = vm.magnitude2(d)  # (N, 1)
    b = 2.0 * jnp.sum(f * d, axis=-1)
    c = vm.magnitude2(f) - radius * radius
    disc = b * b - 4.0 * a * c
    ok = disc >= 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t1 = (-b - sq) / (2.0 * a)
    t2 = (-b + sq) / (2.0 * a)
    return ok, t1, t2


def _col(x):
    """Broadcast a scalar-or-(N,) t bound against (N, K) candidate arrays."""
    x = jnp.asarray(x, jnp.float32)
    return x[:, None] if x.ndim == 1 else x


def intersect_spheres(scene: SceneData, o, d, t_min, t_max):
    """Nearest sphere hit per ray. Returns (t, idx, valid), t=(N,)."""
    t_min, t_max = _col(t_min), _col(t_max)
    ok, t1, t2 = _sphere_roots(o[:, None, :], d[:, None, :], scene.sph_center, scene.sph_radius)
    # Root selection per reference: t1 if t1 >= t_min else t2 (geometry.rs:408).
    t = jnp.where(t1 >= t_min, t1, t2)
    valid = ok & (t >= t_min) & (t <= t_max)
    valid &= jnp.arange(t.shape[1]) < scene.n_spheres
    t_m = jnp.where(valid, t, _BIG)
    idx = jnp.argmin(t_m, axis=1).astype(jnp.int32)
    n_idx = jnp.arange(o.shape[0])
    return t_m[n_idx, idx], idx, valid[n_idx, idx]


def intersect_planes(scene: SceneData, o, d, t_min, t_max):
    """Nearest plane hit per ray (geometry.rs:474-487 semantics)."""
    t_min, t_max = _col(t_min), _col(t_max)
    to_origin = o[:, None, :] - scene.pln_point  # (N, P, 3)
    od = jnp.sum(to_origin * scene.pln_normal, axis=-1)  # (N, P)
    n = vm.signum(od)[..., None] * scene.pln_normal  # flipped toward origin
    dd = jnp.sum(d[:, None, :] * n, axis=-1)
    t = jnp.abs(od) / jnp.abs(dd)
    valid = (dd < 0.0) & (t >= t_min) & (t <= t_max)
    valid &= jnp.arange(t.shape[1]) < scene.n_planes
    t_m = jnp.where(valid, t, _BIG)
    idx = jnp.argmin(t_m, axis=1).astype(jnp.int32)
    n_idx = jnp.arange(o.shape[0])
    return t_m[n_idx, idx], idx, valid[n_idx, idx]


def intersect_triangles(scene: SceneData, o, d, t_min, t_max):
    """Nearest standalone-triangle hit per ray (geometry.rs:431-449)."""
    valid, t, _, _ = bvhlib.moller_trumbore(
        o[:, None, :], d[:, None, :], scene.tri_a, scene.tri_b, scene.tri_c,
        _col(t_min), _col(t_max),
    )
    valid &= jnp.arange(t.shape[1]) < scene.n_tris
    t_m = jnp.where(valid, t, _BIG)
    idx = jnp.argmin(t_m, axis=1).astype(jnp.int32)
    n_idx = jnp.arange(o.shape[0])
    return t_m[n_idx, idx], idx, valid[n_idx, idx]


def intersect_volumes(scene: SceneData, o, d, t_min, t_max, u_vol):
    """Nearest participating-medium scatter event per ray.

    Replicates ConvexVolume::intersect_ray (geometry.rs:502-525): entry =
    smaller sphere root over (-inf, inf), exit = larger root (must exceed
    entry + 1e-4), clip to [t_min, t_max], then scatter iff the sampled
    free-flight distance -ln(U)/density fits inside the clipped span.

    u_vol: (N, V) uniforms in [0, 1) — one draw per ray per volume per
    bounce, replacing thread_rng at geometry.rs:517.
    """
    t_min, t_max = _col(t_min), _col(t_max)
    ok, t1, t2 = _sphere_roots(
        o[:, None, :], d[:, None, :], scene.vol_center, scene.vol_radius
    )
    t_entr = t1
    exit_ok = ok & (t2 >= t1 + 1e-4)
    t_exit = t2
    in_range = (t_exit >= t_min) & (t_entr <= t_max)
    t_start = jnp.maximum(t_entr, t_min)
    t_end = jnp.minimum(t_exit, t_max)
    dist_in_volume = t_end - t_start
    # -ln(U)/rho; U in [0,1) — ln(0) = -inf gives dist=inf → no scatter,
    # matching gen_range(0.0..1.0)'s open upper bound closely enough.
    dist_before_scatter = (-1.0 / scene.vol_density) * jnp.log(
        jnp.maximum(u_vol, 1e-38)
    )
    valid = ok & exit_ok & in_range & (dist_before_scatter < dist_in_volume)
    valid &= jnp.arange(t1.shape[1]) < scene.n_volumes
    t = t_start + dist_before_scatter
    t_m = jnp.where(valid, t, _BIG)
    idx = jnp.argmin(t_m, axis=1).astype(jnp.int32)
    n_idx = jnp.arange(o.shape[0])
    return t_m[n_idx, idx], idx, valid[n_idx, idx]


def intersect_general_volume(
    tri_table: jnp.ndarray, density, o, d, t_min, t_max, u,
    eps=bvhlib.MT_EPSILON,
):
    """One general-boundary ConvexVolume (geometry.rs:502-525 with a
    non-sphere `boundary`): two nearest-hit boundary queries — entry over
    (-inf, +inf) (the reference's `f32::MIN..f32::MAX`, geometry.rs:505),
    exit over (t_entr + 1e-4, +inf) — by scanning the boundary's triangle
    table, then the same free-flight sampling as the sphere path.

    tri_table: (T, 9) world-space [a, e1, e2] rows. `eps` is the
    grazing-reject threshold IN WORLD SPACE: the reference intersects a
    StaticMesh boundary in its object space where |det| >= 1e-4
    (geometry.rs:335), and det scales by det(transform) under the
    world pre-transform, so scene compilation passes
    1e-4·|det(transform)| per volume (SceneData.gvol_eps).
    Returns (t, valid), both (N,).
    """
    t_min = jnp.asarray(t_min, jnp.float32)
    t_max = jnp.asarray(t_max, jnp.float32)
    a = tri_table[:, 0:3]
    b = a + tri_table[:, 3:6]
    c = a + tri_table[:, 6:9]
    ok, t, _, _ = bvhlib.moller_trumbore(
        o[:, None, :], d[:, None, :], a, b, c, -_BIG, _BIG, eps=eps
    )
    t_all = jnp.where(ok, t, _BIG)
    t_entr = jnp.min(t_all, axis=1)
    entered = jnp.any(ok, axis=1)
    # exit: nearest boundary hit at least 1e-4 past the entry
    # (geometry.rs:508 `t_entr+0.0001`)
    t_all2 = jnp.where(t_all >= t_entr[:, None] + 1e-4, t_all, _BIG)
    t_exit = jnp.min(t_all2, axis=1)
    exited = jnp.isfinite(t_exit)
    in_range = (t_exit >= t_min) & (t_entr <= t_max)
    t_start = jnp.maximum(t_entr, t_min)
    t_end = jnp.minimum(t_exit, t_max)
    dist_before_scatter = (-1.0 / density) * jnp.log(jnp.maximum(u, 1e-38))
    valid = entered & exited & in_range & (
        dist_before_scatter < t_end - t_start
    )
    return t_start + dist_before_scatter, valid


def _transform_point(m: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """(4,4) @ (N,3) homogeneous point transform (exact VPU arithmetic —
    see vecmath.apply_mat3 for why not a matmul)."""
    return vm.apply_mat4_point(m, p)


def _transform_vector(m: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    return vm.apply_mat4_vector(m, v)


def sample_texture(scene: SceneData, tex_id: int, uv: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor atlas sample, (N, 2) uv → (N, 3) in [0,1].

    Exact replication of texture.rs:26-32: u clamped to [0, 0.999],
    v flipped (1-v) after the same clamp, truncating float→int casts,
    final min with size-1. `tex_id` is static (per-mesh slot binding).
    """
    off = scene.tex_offset[tex_id]
    w = scene.tex_width[tex_id]
    h = scene.tex_height[tex_id]
    u = jnp.clip(uv[:, 0], 0.0, 0.999)
    v = jnp.clip(uv[:, 1], 0.0, 0.999)
    x = jnp.minimum((u * w).astype(jnp.int32), w - 1)
    y = jnp.minimum(((1.0 - v) * h).astype(jnp.int32), h - 1)
    px = scene.tex_pixels[off + y * w + x]
    return px.astype(jnp.float32) / 255.0


def intersect_mesh(mesh: MeshBlock, scene: SceneData, o, d, t_min, t_max):
    """One StaticMesh: object-space traversal + full shading resolve.

    Returns candidate fields dict (t in OBJECT space — but note the ray
    parameter is transform-invariant because the direction is transformed
    WITHOUT renormalization, geometry.rs:304, so t compares directly with
    other primitives').
    """
    o_obj = _transform_point(mesh.inv_transform, o)
    d_obj = _transform_vector(mesh.inv_transform, d)

    if mesh.tri_verts.shape[0] <= BRUTE_FORCE_MAX_TRIS:
        if _use_pallas():
            from cs397raytracingsp22_tpu.ops.pallas.tri_scan import tri_scan_pallas

            hit, t, tri, u, v = tri_scan_pallas(
                o_obj, d_obj, mesh.tri_table, t_min, t_max
            )
        else:
            hit, t, tri, u, v = bvhlib.intersect_tris_scan(
                o_obj, d_obj, mesh.tri_verts, t_min, t_max
            )
    else:
        hit, t, tri, u, v = bvhlib.traverse(
            o_obj,
            d_obj,
            t_min,
            t_max,
            mesh.bounds_min,
            mesh.bounds_max,
            mesh.skip,
            mesh.leaf_start,
            mesh.leaf_count,
            mesh.tri_verts,
            mesh.leaf_size,
        )
    fields = resolve_mesh_hit(mesh, scene, o_obj, d_obj, t, tri, u, v)
    fields["valid"] = hit
    fields["t"] = jnp.where(hit, t, _BIG)
    return fields


def resolve_mesh_hit(mesh: MeshBlock, scene: SceneData, o_obj, d_obj, t, tri, u, v):
    """Shading resolve for mesh hits given (t, tri, u, v) in object space:
    smooth normals, texcoords, TBN normal mapping, world transform, and
    the explicit-or-texture-synthesized material (geometry.rs:274-321)."""
    tri = jnp.maximum(tri, 0)  # safe gather index for miss lanes
    w = 1.0 - u - v

    # Smooth vertex-normal interpolation (geometry.rs:350-351):
    # n = normalize(u*nb + v*nc + (1-u-v)*na).
    nabc = mesh.tri_normals[tri]  # (N, 3corners, 3)
    n_smooth = vm.normalize(
        u[:, None] * nabc[:, 1] + v[:, None] * nabc[:, 2] + w[:, None] * nabc[:, 0],
        eps=1e-30,
    )
    frontface = jnp.sum(n_smooth * d_obj, axis=-1) < 0.0
    n_flip = jnp.where(frontface[:, None], n_smooth, -n_smooth)

    # Texcoord interpolation (geometry.rs:355-356).
    uvabc = mesh.tri_uvs[tri]  # (N, 3, 2)
    uv = u[:, None] * uvabc[:, 1] + v[:, None] * uvabc[:, 2] + w[:, None] * uvabc[:, 0]

    # Normal mapping via per-triangle tangent + Gram-Schmidt TBN
    # (geometry.rs:359-363, 274-296), only when a normal map is bound.
    n_obj = n_flip
    if mesh.tex_ids[4] >= 0:
        tan_approx = mesh.tri_tangent[tri]
        bitangent = vm.normalize(jnp.cross(n_flip, tan_approx), eps=1e-30)
        tangent = vm.normalize(jnp.cross(bitangent, n_flip), eps=1e-30)
        nm = 2.0 * sample_texture(scene, mesh.tex_ids[4], uv) - 1.0
        n_obj = (
            tangent * nm[:, 0:1] + bitangent * nm[:, 1:2] + n_flip * nm[:, 2:3]
        )

    # Normal to world: inverse-transpose, then normalize (geometry.rs:297).
    n_world = vm.normalize(_transform_vector(mesh.normal_mat, n_obj), eps=1e-30)

    # World hitpoint from object-space hitpoint (geometry.rs:307); t stays
    # object-space.
    p_obj = o_obj + t[:, None] * d_obj
    p_world = _transform_point(mesh.transform, p_obj)

    # Material: explicit table row, or synthesized from textures
    # (geometry.rs:253-271).
    if mesh.mat_id >= 0:
        m = _gather_material(scene, jnp.full(t.shape, mesh.mat_id, jnp.int32))
    else:
        n = t.shape[0]
        zero3 = jnp.zeros((n, 3), jnp.float32)
        albedo = (
            sample_texture(scene, mesh.tex_ids[0], uv) if mesh.tex_ids[0] >= 0 else zero3
        )
        emission = (
            sample_texture(scene, mesh.tex_ids[1], uv) if mesh.tex_ids[1] >= 0 else zero3
        )
        metallic = (
            sample_texture(scene, mesh.tex_ids[2], uv)[:, 0]
            if mesh.tex_ids[2] >= 0
            else jnp.zeros((n,), jnp.float32)
        )
        roughness = (
            sample_texture(scene, mesh.tex_ids[3], uv)[:, 0]
            if mesh.tex_ids[3] >= 0
            else jnp.ones((n,), jnp.float32)
        )
        m = dict(
            mtype=jnp.full((n,), mat.PARAMETERIZED, jnp.int32),
            albedo=albedo,
            emission=emission,
            roughness=roughness,
            metallic=metallic,
            ior=jnp.full((n,), 1.5, jnp.float32),
        )

    return dict(
        point=p_world,
        normal=n_world,
        frontface=frontface,
        **m,
    )


def intersect_scene(
    scene: SceneData, o, d, t_min, t_max, u_vol: jnp.ndarray
) -> HitRecord:
    """Nearest hit across all primitive classes (tracing.rs:326-350).

    Args:
      o, d: (N, 3) world-space rays (directions may be unnormalized —
        all t values are in units of |d|, like the reference).
      t_min, t_max: scalar or per-ray bounds.
      u_vol: (N, V) uniforms for volume free-flight sampling.

    Ties across classes are broken by class order (measure-zero difference
    from the reference's list order, SURVEY.md §3.5).

    On TPU this routes through the fused Pallas kernel
    (ops/pallas/scene_intersect.py) with a winner-only resolve; the jnp
    path below is the specification, the CPU/test path, and the fallback.
    """
    if _use_pallas():
        return intersect_scene_fused(scene, o, d, t_min, t_max, u_vol)
    return intersect_scene_jnp(scene, o, d, t_min, t_max, u_vol)


def intersect_scene_jnp(
    scene: SceneData, o, d, t_min, t_max, u_vol: jnp.ndarray
) -> HitRecord:
    """Pure-jnp reference implementation of intersect_scene."""
    n = o.shape[0]
    n_idx = jnp.arange(n)

    candidates: list[dict] = []

    # --- spheres ---
    t_s, i_s, v_s = intersect_spheres(scene, o, d, t_min, t_max)
    center = scene.sph_center[i_s]
    p = o + t_s[:, None] * d
    n_out = vm.normalize(p - center, eps=1e-30)
    ff = jnp.sum(n_out * d, axis=-1) < 0.0
    candidates.append(
        dict(
            valid=v_s,
            t=t_s,
            point=p,
            normal=jnp.where(ff[:, None], n_out, -n_out),
            frontface=ff,
            **_gather_material(scene, scene.sph_mat[i_s]),
        )
    )

    # --- planes ---
    t_p, i_p, v_p = intersect_planes(scene, o, d, t_min, t_max)
    pln_n = scene.pln_normal[i_p]
    pln_pt = scene.pln_point[i_p]
    od = jnp.sum((o - pln_pt) * pln_n, axis=-1)
    n_pre = vm.signum(od)[:, None] * pln_n
    ff = jnp.sum(n_pre * d, axis=-1) < 0.0
    candidates.append(
        dict(
            valid=v_p,
            t=t_p,
            point=o + t_p[:, None] * d,
            normal=jnp.where(ff[:, None], n_pre, -n_pre),
            frontface=ff,
            **_gather_material(scene, scene.pln_mat[i_p]),
        )
    )

    # --- standalone triangles ---
    t_t, i_t, v_t = intersect_triangles(scene, o, d, t_min, t_max)
    e1 = scene.tri_b[i_t] - scene.tri_a[i_t]
    e2 = scene.tri_c[i_t] - scene.tri_a[i_t]
    n_geo = vm.normalize(jnp.cross(e1, e2), eps=1e-30)
    ff = jnp.sum(n_geo * d, axis=-1) < 0.0
    candidates.append(
        dict(
            valid=v_t,
            t=t_t,
            point=o + t_t[:, None] * d,
            normal=jnp.where(ff[:, None], n_geo, -n_geo),
            frontface=ff,
            **_gather_material(scene, scene.tri_mat[i_t]),
        )
    )

    # --- convex volumes (sphere boundaries) ---
    n_vcols = scene.vol_center.shape[0]
    t_v, i_v, v_v = intersect_volumes(
        scene, o, d, t_min, t_max, u_vol[:, :n_vcols]
    )
    candidates.append(
        dict(
            valid=v_v,
            t=t_v,
            point=o + t_v[:, None] * d,
            normal=jnp.zeros((n, 3), jnp.float32),
            frontface=jnp.zeros((n,), bool),
            **_gather_material(scene, scene.vol_mat[i_v]),
        )
    )

    # --- general-boundary convex volumes (static unroll, few per scene) ---
    for g in range(scene.n_gvols):
        t_g, v_g = intersect_general_volume(
            scene.gvol_tri[g], scene.gvol_density[g], o, d, t_min, t_max,
            u_vol[:, n_vcols + g], eps=scene.gvol_eps[g],
        )
        candidates.append(
            dict(
                valid=v_g,
                t=jnp.where(v_g, t_g, _BIG),
                point=o + t_g[:, None] * d,
                normal=jnp.zeros((n, 3), jnp.float32),
                frontface=jnp.zeros((n,), bool),
                **_gather_material(
                    scene, jnp.full((n,), scene.gvol_mat[g], jnp.int32)
                ),
            )
        )

    # --- meshes (static unroll; each traverses its own BVH) ---
    for mesh in scene.meshes:
        candidates.append(intersect_mesh(mesh, scene, o, d, t_min, t_max))

    # Winner: argmin of raw t across classes (object-space t for meshes
    # compares against world t — reference quirk, SURVEY.md §3.5.1).
    ts = jnp.stack([c["t"] for c in candidates], axis=1)  # (N, G)
    winner = jnp.argmin(ts, axis=1)

    def select(field):
        out = candidates[0][field]
        for g in range(1, len(candidates)):
            sel = winner == g
            cg = candidates[g][field]
            if out.ndim > 1:
                sel = sel[:, None]
            out = jnp.where(sel, cg, out)
        return out

    valid = jnp.zeros((n,), bool)
    for g, c in enumerate(candidates):
        valid |= (winner == g) & c["valid"]

    return HitRecord(
        valid=valid,
        t=select("t"),
        point=select("point"),
        normal=select("normal"),
        frontface=select("frontface"),
        mtype=select("mtype"),
        albedo=select("albedo"),
        emission=select("emission"),
        roughness=select("roughness"),
        metallic=select("metallic"),
        ior=select("ior"),
    )


def intersect_scene_fused(
    scene: SceneData, o, d, t_min, t_max, u_vol: jnp.ndarray
) -> HitRecord:
    """TPU fast path: fused Pallas kernel + winner-only resolve.

    The kernel (ops/pallas/scene_intersect.py) returns the nearest hit
    across spheres/planes/triangles/volumes/dense meshes with normals and
    material ids already selected; this wrapper merges BVH-traversed big
    meshes, gathers the winner's material row, and resolves mesh shading
    attributes per dense/big mesh under a winner mask. Semantics match
    intersect_scene_jnp (asserted by tests/test_fused.py).
    """
    from cs397raytracingsp22_tpu.ops.pallas.scene_intersect import (
        CODE_MESH0,
        scene_intersect_pallas,
    )

    n = o.shape[0]
    t, code, idx, mat_id, u, v, normal, ff = scene_intersect_pallas(
        scene, o, d, t_min, t_max, u_vol[:, : scene.vol_center.shape[0]]
    )
    valid = code >= 0

    # object-space rays per mesh, computed once and shared by the
    # rederive, the big-mesh scans, and the merged resolve
    obj_rays = {
        mi: (
            _transform_point(scene.meshes[mi].inv_transform, o),
            _transform_vector(scene.meshes[mi].inv_transform, d),
        )
        for mi in range(len(scene.meshes))
    }

    # Dense-mesh winners: the kernel's packed min-key scan reports only
    # (code, local row); re-derive exact t/u/v from the winner's
    # Baldwin–Weber row so the scan's approx-reciprocal never reaches
    # hit points (tri_scan_big.py wrapper contract). ONE merged gather
    # across all dense meshes: winner rows are global kmesh_bw indices.
    if scene.dense_mesh_ids:
        any_dense = jnp.zeros((n,), bool)
        g_row = jnp.zeros((n,), jnp.int32)
        o_objw = jnp.zeros((n, 3), jnp.float32)
        d_objw = jnp.ones((n, 3), jnp.float32)
        for k, mi in enumerate(scene.dense_mesh_ids):
            start, count = scene.kmesh_ranges[k]
            mask = code == CODE_MESH0 + k
            any_dense |= mask
            g_row = jnp.where(mask, start + jnp.clip(idx, 0, count - 1), g_row)
            o_obj, d_obj = obj_rays[mi]
            o_objw = jnp.where(mask[:, None], o_obj, o_objw)
            d_objw = jnp.where(mask[:, None], d_obj, d_objw)
        rows = jnp.take(scene.kmesh_bw, g_row, axis=0)
        den = (rows[:, 0] * d_objw[:, 0] + rows[:, 1] * d_objw[:, 1]
               + rows[:, 2] * d_objw[:, 2])
        num = rows[:, 3] - (
            rows[:, 0] * o_objw[:, 0] + rows[:, 1] * o_objw[:, 1]
            + rows[:, 2] * o_objw[:, 2]
        )
        t_ex = num / jnp.where(den == 0.0, 1.0, den)
        p = o_objw + t_ex[:, None] * d_objw
        u_ex = (rows[:, 4] * p[:, 0] + rows[:, 5] * p[:, 1]
                + rows[:, 6] * p[:, 2] + rows[:, 7])
        v_ex = (rows[:, 8] * p[:, 0] + rows[:, 9] * p[:, 1]
                + rows[:, 10] * p[:, 2] + rows[:, 11])
        t = jnp.where(any_dense, t_ex, t)
        u = jnp.where(any_dense, u_ex, u)
        v = jnp.where(any_dense, v_ex, v)

    # Merge big (BVH-traversed) meshes; they get codes after the dense ones.
    n_dense = len(scene.dense_mesh_ids)
    big_ids = [
        i for i in range(len(scene.meshes)) if i not in scene.dense_mesh_ids
    ]
    import os as _os

    boxclamp = _os.environ.get("RT_BOXCLAMP", "1") == "1"
    for j, mi in enumerate(big_ids):
        mesh = scene.meshes[mi]
        o_obj, d_obj = obj_rays[mi]
        from cs397raytracingsp22_tpu.ops.pallas.tri_scan_big import (
            tri_scan_big_pallas,
        )

        # running best t as this mesh's far bound: hits already found by
        # the fused kernel or earlier big meshes occlusion-cull whole
        # pieces/superleafs inside the scan (t is a valid bound because
        # the ray parameter is transform-invariant, geometry.rs:304)
        tmin_m = jnp.asarray(t_min, jnp.float32)
        tmax_m = jnp.minimum(jnp.asarray(t_max, jnp.float32), t)
        if boxclamp:
            # Per-ray ROOT-box window clamp: every true hit lies inside
            # the mesh's root AABB, so [entry-ε, exit+ε] is a valid (and
            # much tighter) scan window; rays that miss the box get an
            # EMPTY window and vote "no" in every block-level piece/
            # superleaf cull — with the position-major sort, box-missing
            # rays cluster into whole blocks that skip the entire mesh.
            # ε-padding makes the clamp conservative vs float rounding,
            # so results are bit-identical (tests/test_fused.py).
            root_lo = jnp.min(mesh.big_box[:, 0:3], axis=0)
            root_hi = jnp.max(mesh.big_box[:, 3:6], axis=0)
            inv_d = 1.0 / d_obj
            t0 = (root_lo[None, :] - o_obj) * inv_d
            t1 = (root_hi[None, :] - o_obj) * inv_d
            lo = jnp.where(inv_d < 0.0, t1, t0)
            hi = jnp.where(inv_d < 0.0, t0, t1)
            ent = jnp.max(jnp.fmax(lo, -jnp.inf), axis=-1)
            ext = jnp.min(jnp.fmin(hi, jnp.inf), axis=-1)
            eps = 1e-3 + 1e-3 * jnp.max(
                jnp.abs(jnp.stack([root_lo, root_hi]))
            )
            miss = (
                (ext + eps < ent - eps)
                | (ext + eps < tmin_m)
                | (ent - eps > tmax_m)
            )
            tmin_m = jnp.where(
                miss, 1.0, jnp.maximum(tmin_m, ent - eps)
            )
            tmax_m = jnp.where(
                miss, 0.0, jnp.minimum(tmax_m, ext + eps)
            )
        hit_m, t_m, tri_m, u_m, v_m = tri_scan_big_pallas(
            o_obj, d_obj, mesh.big_bw, mesh.big_box, mesh.big_sl,
            tmin_m, tmax_m,
        )
        better = hit_m & (t_m < t)
        t = jnp.where(better, t_m, t)
        code = jnp.where(better, CODE_MESH0 + n_dense + j, code)
        idx = jnp.where(better, tri_m, idx)
        u = jnp.where(better, u_m, u)
        v = jnp.where(better, v_m, v)
        valid = valid | better

    # General-boundary volumes (rare; jnp merge like big meshes). A gvol
    # winner takes a large code so no mesh-resolve mask matches it; its
    # material flows through mat_id, normal is zero, frontface false
    # (geometry.rs:520 "normal and front_face are arbitrary" — zero
    # normal is what the integrator special-cases).
    CODE_GVOL0 = 1 << 20
    n_vcols = scene.vol_center.shape[0]
    for g in range(scene.n_gvols):
        t_g, v_g = intersect_general_volume(
            scene.gvol_tri[g], scene.gvol_density[g], o, d, t_min, t_max,
            u_vol[:, n_vcols + g], eps=scene.gvol_eps[g],
        )
        better = v_g & (t_g < jnp.where(valid, t, _BIG))
        t = jnp.where(better, t_g, t)
        code = jnp.where(better, CODE_GVOL0 + g, code)
        mat_id = jnp.where(better, scene.gvol_mat[g], mat_id)
        normal = jnp.where(better[:, None], 0.0, normal)
        ff = jnp.where(better, False, ff)
        valid = valid | better

    # Analytic winners: world point + material row.
    point = o + t[:, None] * d
    m = _gather_material(scene, jnp.clip(mat_id, 0, scene.mat_type.shape[0] - 1))
    fields = dict(
        point=point,
        normal=normal,
        frontface=ff,
        **m,
    )

    # Mesh winners: one MERGED shading resolve across every mesh — a
    # single gather from a concatenated per-triangle table plus one
    # atlas gather per texture slot, instead of per-mesh gather chains
    # (XLA gathers are the staged pipeline's hottest op: measured
    # 30 ms/262k rays per mesh for the per-mesh resolve on v5e).
    mesh_order = list(scene.dense_mesh_ids) + big_ids
    if mesh_order:
        fields = _resolve_mesh_winners_merged(
            scene, mesh_order, obj_rays, code, t, idx, u, v, fields
        )

    return HitRecord(
        valid=valid,
        t=jnp.where(valid, t, _BIG),
        **fields,
    )


def _sample_texture_dyn(scene: SceneData, off, w, h, uv):
    """sample_texture with PER-RAY atlas offset/size (texture.rs:26-32
    semantics elementwise): used by the merged resolve where each ray's
    winning mesh binds a different texture to the same slot."""
    u = jnp.clip(uv[:, 0], 0.0, 0.999)
    v = jnp.clip(uv[:, 1], 0.0, 0.999)
    x = jnp.minimum((u * w).astype(jnp.int32), w - 1)
    y = jnp.minimum(((1.0 - v) * h).astype(jnp.int32), h - 1)
    return scene.tex_pixels[off + y * w + x].astype(jnp.float32) / 255.0


def _resolve_mesh_winners_merged(
    scene: SceneData, mesh_order, obj_rays, code, t, idx, u, v, fields
):
    """Shading resolve for ALL mesh winners at once (the fused-path
    replacement for per-mesh resolve_mesh_hit — identical semantics,
    asserted by tests/test_fused.py):

    - ONE gather from a concatenated (ΣT, 18) table of [corner normals
      (oct-decoded f32, identical values to every other path), corner
      uvs, tangent];
    - per-ray transform/normal-matrix/texture-binding obtained by cheap
      masked selects over the (few) meshes;
    - ONE atlas gather per texture slot present in any
      texture-synthesized mesh;
    - explicit materials via the winner's material row.
    """
    from cs397raytracingsp22_tpu.ops.pallas.scene_intersect import CODE_MESH0

    n = code.shape[0]
    meshes = [scene.meshes[mi] for mi in mesh_order]

    # concatenated per-triangle resolve table (constant-folded per
    # compiled scene, like bounce.build_bounce_tables)
    tabs = []
    offs = []
    cursor = 0
    for m in meshes:
        nt = m.tri_normals.shape[0]
        tabs.append(
            jnp.concatenate(
                [
                    m.tri_normals.reshape(nt, 9),
                    m.tri_uvs.reshape(nt, 6),
                    m.tri_tangent,
                ],
                axis=1,
            )
        )
        offs.append(cursor)
        cursor += nt
    table = jnp.concatenate(tabs, axis=0)

    masks = []
    any_mesh = jnp.zeros((n,), bool)
    res_row = jnp.zeros((n,), jnp.int32)
    o_objw = jnp.zeros((n, 3), jnp.float32)
    d_objw = jnp.ones((n, 3), jnp.float32)

    def sel_rows(values, width):
        """Per-ray select of a per-mesh (small, possibly traced) row."""
        out = jnp.zeros((n, width), jnp.float32)
        for mask, row in zip(masks, values):
            out = jnp.where(
                mask[:, None], jnp.asarray(row, jnp.float32)[None, :], out
            )
        return out

    for k, mi in enumerate(mesh_order):
        m = scene.meshes[mi]
        mask = code == CODE_MESH0 + k
        masks.append(mask)
        any_mesh |= mask
        nt = m.tri_normals.shape[0]
        res_row = jnp.where(
            mask, offs[k] + jnp.clip(idx, 0, nt - 1), res_row
        )
        o_obj, d_obj = obj_rays[mi]
        o_objw = jnp.where(mask[:, None], o_obj, o_objw)
        d_objw = jnp.where(mask[:, None], d_obj, d_objw)

    rows = jnp.take(table, res_row, axis=0)  # THE gather
    nabc = rows[:, 0:9].reshape(n, 3, 3)
    uvabc = rows[:, 9:15].reshape(n, 3, 2)
    tan_approx = rows[:, 15:18]

    w_bar = 1.0 - u - v
    # smooth normal (geometry.rs:350-351) + frontface in object space
    n_smooth = vm.normalize(
        u[:, None] * nabc[:, 1] + v[:, None] * nabc[:, 2]
        + w_bar[:, None] * nabc[:, 0],
        eps=1e-30,
    )
    frontface = jnp.sum(n_smooth * d_objw, axis=-1) < 0.0
    n_flip = jnp.where(frontface[:, None], n_smooth, -n_smooth)
    uv = (
        u[:, None] * uvabc[:, 1] + v[:, None] * uvabc[:, 2]
        + w_bar[:, None] * uvabc[:, 0]
    )

    # consolidated texture-slot sampling: per-ray atlas binding by mesh
    def slot_binding(slot):
        off = jnp.zeros((n,), jnp.int32)
        w = jnp.ones((n,), jnp.int32)
        h = jnp.ones((n,), jnp.int32)
        present = jnp.zeros((n,), bool)
        for mask, m in zip(masks, meshes):
            tid = m.tex_ids[slot]
            if tid >= 0:
                off = jnp.where(mask, scene.tex_offset[tid], off)
                w = jnp.where(mask, scene.tex_width[tid], w)
                h = jnp.where(mask, scene.tex_height[tid], h)
                present |= mask
        return off, w, h, present

    def sample_slot(slot):
        off, w, h, present = slot_binding(slot)
        return _sample_texture_dyn(scene, off, w, h, uv), present

    # normal map (slot 4) via per-triangle tangent TBN
    # (geometry.rs:274-298), only for rays whose mesh binds one
    n_obj = n_flip
    if any(m.tex_ids[4] >= 0 for m in meshes):
        nm_rgb, nm_present = sample_slot(4)
        nm = 2.0 * nm_rgb - 1.0
        bitangent = vm.normalize(jnp.cross(n_flip, tan_approx), eps=1e-30)
        tangent = vm.normalize(jnp.cross(bitangent, n_flip), eps=1e-30)
        n_mapped = (
            tangent * nm[:, 0:1] + bitangent * nm[:, 1:2] + n_flip * nm[:, 2:3]
        )
        n_obj = jnp.where(nm_present[:, None], n_mapped, n_flip)

    # normal/hitpoint to world with per-ray selected matrices
    nm_rows = sel_rows(
        [jnp.asarray(m.normal_mat)[:3, :3].reshape(-1) for m in meshes], 9
    )
    xf_rows = sel_rows(
        [jnp.concatenate([
            jnp.asarray(m.transform)[:3, :3].reshape(-1),
            jnp.asarray(m.transform)[:3, 3],
        ]) for m in meshes], 12
    )

    def mat3_apply(rows9, p):
        return jnp.stack(
            [
                rows9[:, 0] * p[:, 0] + rows9[:, 1] * p[:, 1] + rows9[:, 2] * p[:, 2],
                rows9[:, 3] * p[:, 0] + rows9[:, 4] * p[:, 1] + rows9[:, 5] * p[:, 2],
                rows9[:, 6] * p[:, 0] + rows9[:, 7] * p[:, 1] + rows9[:, 8] * p[:, 2],
            ],
            axis=-1,
        )

    n_world = vm.normalize(mat3_apply(nm_rows, n_obj), eps=1e-30)
    p_obj = o_objw + t[:, None] * d_objw
    p_world = mat3_apply(xf_rows, p_obj) + xf_rows[:, 9:12]

    # material: explicit rows vs texture synthesis (geometry.rs:253-271)
    mat_ids = jnp.zeros((n,), jnp.int32)
    synth = jnp.zeros((n,), bool)
    for mask, m in zip(masks, meshes):
        if m.mat_id >= 0:
            mat_ids = jnp.where(mask, m.mat_id, mat_ids)
        else:
            synth |= mask
    mm = _gather_material(scene, mat_ids)
    if any(m.mat_id < 0 for m in meshes):
        alb, alb_p = sample_slot(0)
        emi, emi_p = sample_slot(1)
        met, met_p = sample_slot(2)
        rou, rou_p = sample_slot(3)
        zero3 = jnp.zeros((n, 3), jnp.float32)
        mm = dict(
            mtype=jnp.where(synth, mat.PARAMETERIZED, mm["mtype"]),
            albedo=jnp.where(
                synth[:, None], jnp.where(alb_p[:, None], alb, zero3), mm["albedo"]
            ),
            emission=jnp.where(
                synth[:, None], jnp.where(emi_p[:, None], emi, zero3), mm["emission"]
            ),
            metallic=jnp.where(
                synth, jnp.where(met_p, met[:, 0], 0.0), mm["metallic"]
            ),
            roughness=jnp.where(
                synth, jnp.where(rou_p, rou[:, 0], 1.0), mm["roughness"]
            ),
            ior=jnp.where(synth, 1.5, mm["ior"]),
        )

    mf = dict(point=p_world, normal=n_world, frontface=frontface, **mm)
    for key in fields:
        sel = any_mesh[:, None] if fields[key].ndim > 1 else any_mesh
        fields[key] = jnp.where(sel, mf[key], fields[key])
    return fields
