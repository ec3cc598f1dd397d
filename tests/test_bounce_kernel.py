"""Mega-bounce kernel vs the jnp integrator (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cs397raytracingsp22_tpu.ops.pallas import bounce
from cs397raytracingsp22_tpu.render import integrator
from cs397raytracingsp22_tpu.utils import threefry
from scenes import cornell


@pytest.fixture(scope="module")
def bench_like_scene():
    """Cornell walls + spheres + light + a small mesh with explicit
    material — everything the mega kernel supports."""
    from cs397raytracingsp22_tpu import Lambertian, Metal, Scene
    from cs397raytracingsp22_tpu.models import transform as tf
    from tests.test_mesh import make_mesh

    base = cornell.build_config3(width=16, height=16, spp=4, path_depth=4)
    mesh = make_mesh(
        [[-1.0, 0.0, -1.0], [1.0, 0.0, -1.0], [0.0, 1.5, -1.0]],
        [[0, 1, 2]],
        material=Metal(albedo=(0.7, 0.7, 0.9), roughness=0.15),
        transform=tf.translate(0.0, 0.4, 0.4) @ tf.rotate_y(25.0),
    )
    scene = Scene(camera=base.camera, objects=list(base.objects) + [mesh])
    return scene


def test_scene_qualifies(bench_like_scene):
    data = bench_like_scene.compile()
    assert bounce.scene_is_simple(data)


def test_textured_scene_disqualified():
    from scenes import textured_spheres

    data = textured_spheres.build(width=8, height=8, spp=1).compile()
    assert not bounce.scene_is_simple(data)


@pytest.mark.slow
@pytest.mark.heavy
def test_kernel_matches_jnp_integrator(bench_like_scene):
    scene = bench_like_scene
    data = scene.compile()
    tables = bounce.build_bounce_tables(data)

    n = 512
    key = threefry.key_words(123)
    o, d = scene.camera.generate_rays(
        key, jnp.arange(n // 4, dtype=jnp.int32), spp=4
    )
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)
    uids = jnp.arange(n, dtype=jnp.int32)

    ref_rad, ref_segs = integrator.path_trace(
        data, o, d, uids, key, 4, scene.camera.max_trace_dist
    )
    out_rad, out_segs = bounce.path_trace_pallas(
        data, tables, o, d, uids, key, 4, scene.camera.max_trace_dist
    )

    ref = np.asarray(ref_rad)
    out = np.asarray(out_rad)
    # identical RNG + identical estimator → near-bitwise agreement (the
    # kernel's rsqrt-based normalize differs at float ulp level)
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(float(out_segs), float(ref_segs))


@pytest.mark.slow
@pytest.mark.heavy
def test_kernel_volume_scene():
    """Volumes (zero-normal hits, free-flight RNG) through the kernel."""
    from cs397raytracingsp22_tpu import (
        Camera, ConvexVolume, Isotropic, Lambertian, Plane, Scene, Sphere,
    )

    scene = Scene(
        camera=Camera(screen_width=8, screen_height=8, aa_sample_count=4),
        objects=[
            Plane(point=(0, 0, 0), normal=(0, 1, 0), material=Lambertian()),
            Sphere(center=(0, 8, -3), radius=2.0,
                   material=Lambertian(albedo=(0, 0, 0), emission=(4, 4, 4))),
            ConvexVolume(
                boundary=Sphere(center=(0, 1.5, -3), radius=1.0, material=Lambertian()),
                phase_function=Isotropic(albedo=(0.9, 0.9, 0.9)),
                density=1.5,
            ),
        ],
    )
    data = scene.compile()
    assert bounce.scene_is_simple(data)
    tables = bounce.build_bounce_tables(data)

    key = threefry.key_words(9)
    n = 256
    o = jnp.tile(jnp.asarray([[0.0, 1.5, 2.0]]), (n, 1))
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (n, 1))
    uids = jnp.arange(n, dtype=jnp.int32)

    ref_rad, ref_segs = integrator.path_trace(data, o, d, uids, key, 6, 100.0)
    out_rad, out_segs = bounce.path_trace_pallas(data, tables, o, d, uids, key, 6, 100.0)
    np.testing.assert_allclose(
        np.asarray(out_rad), np.asarray(ref_rad), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(float(out_segs), float(ref_segs))


@pytest.mark.slow
@pytest.mark.heavy
def test_wavefront_matches_full_kernel(bench_like_scene):
    """Per-bounce wavefront with compaction must produce the same image
    as the full-loop kernel and the jnp integrator (identical RNG per
    (uid, site) regardless of ray permutation)."""
    scene = bench_like_scene
    data = scene.compile()
    tables = bounce.build_bounce_tables(data)

    n = 512
    key = threefry.key_words(77)
    o, d = scene.camera.generate_rays(key, jnp.arange(n // 4, dtype=jnp.int32), spp=4)
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)
    uids = jnp.arange(n, dtype=jnp.int32)

    ref_rad, ref_segs = integrator.path_trace(
        data, o, d, uids, key, 4, scene.camera.max_trace_dist
    )
    wf_rad, wf_segs = bounce.path_trace_wavefront(
        data, tables, o, d, uids, key, 4, scene.camera.max_trace_dist
    )
    np.testing.assert_allclose(
        np.asarray(wf_rad), np.asarray(ref_rad), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(float(wf_segs), float(ref_segs))

    # no-compaction variant must be identical too
    wf2_rad, wf2_segs = bounce.path_trace_wavefront(
        data, tables, o, d, uids, key, 4, scene.camera.max_trace_dist, compact=False
    )
    np.testing.assert_allclose(
        np.asarray(wf2_rad), np.asarray(wf_rad), rtol=1e-5, atol=1e-6
    )


@pytest.mark.slow
@pytest.mark.heavy
def test_keycmp_unsigned_matches_signed(bench_like_scene, monkeypatch):
    """RT_KEYCMP=u (unsigned min over key patterns) must
    pick bit-identical winners vs =s (the signed INT32_MAX select
    chain): rejected candidates are forced to 0xFFFFFFFF and negative
    t' loses by its own sign bit, so the surviving key sequence is the
    same (bounce.py::_keycmp_mode)."""
    scene = bench_like_scene
    data = scene.compile()
    tables = bounce.build_bounce_tables(data)

    n = 512
    key = threefry.key_words(41)
    o, d = scene.camera.generate_rays(
        key, jnp.arange(n // 4, dtype=jnp.int32), spp=4
    )
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)
    uids = jnp.arange(n, dtype=jnp.int32)

    outs = {}
    for mode in ("u", "s"):
        monkeypatch.setenv("RT_KEYCMP", mode)
        rad, segs = bounce.path_trace_pallas(
            data, tables, o, d, uids, key, 4, scene.camera.max_trace_dist
        )
        outs[mode] = (np.asarray(rad), float(segs))
    np.testing.assert_array_equal(outs["u"][0], outs["s"][0])
    assert outs["u"][1] == outs["s"][1]


def test_auto_block_rows_schedule():
    """The scoped-VMEM block-rows schedule (measured 2026-08-17, v5e:
    64 rows OOMs AOT compile above 2048 dense tris; 32 rows runs a
    6,144-tri mesh at 20.66 Mrays/s)."""
    assert bounce._auto_block_rows(240) == bounce.DEFAULT_BLOCK_ROWS
    assert bounce._auto_block_rows(2048) == bounce.DEFAULT_BLOCK_ROWS
    assert bounce._auto_block_rows(2049) == 32
    assert bounce._auto_block_rows(8192) == 32
    assert bounce._auto_block_rows(8193) == 16


@pytest.mark.slow
@pytest.mark.heavy
def test_kernel_middle_tier_dense_mesh():
    """A >2048-tri dense mesh (the raised DENSE_MESH_MAX_TRIS middle
    tier) through the mega kernel: exercises the auto 32-row block path
    and the multi-superleaf scan at a size the old 2048 cap excluded."""
    from cs397raytracingsp22_tpu import Camera, Lambertian, Scene, Sphere
    from cs397raytracingsp22_tpu.ops.bvh import DENSE_MESH_MAX_TRIS
    from tests.test_mesh import make_mesh

    # procedural bumpy grid: 36×36 quads = 2,592 triangles
    g = 36
    xs = np.linspace(-1.2, 1.2, g + 1, dtype=np.float32)
    px, pz = np.meshgrid(xs, xs, indexing="ij")
    py = 0.25 * np.sin(3.0 * px) * np.cos(3.0 * pz)
    positions = np.stack([px, py, pz], axis=-1).reshape(-1, 3)
    vid = np.arange((g + 1) * (g + 1), dtype=np.int32).reshape(g + 1, g + 1)
    a = vid[:-1, :-1].ravel()
    b = vid[1:, :-1].ravel()
    c = vid[1:, 1:].ravel()
    d4 = vid[:-1, 1:].ravel()
    faces = np.concatenate(
        [np.stack([a, b, c], axis=-1), np.stack([a, c, d4], axis=-1)]
    )
    assert 2048 < len(faces) <= DENSE_MESH_MAX_TRIS
    mesh = make_mesh(positions, faces,
                     material=Lambertian(albedo=(0.6, 0.5, 0.4)))

    cam = Camera(
        eyepoint=(0.0, 1.6, 3.2), view_dir=(0.0, -0.45, -1.0),
        screen_width=8, screen_height=8, aa_sample_count=1,
        path_depth=3, path_samples=1,
    )
    light = Sphere(center=(0.0, 3.0, 0.0), radius=0.8,
                   material=Lambertian(albedo=(1.0, 1.0, 1.0),
                                       emission=(5.0, 5.0, 5.0)))
    scene = Scene(camera=cam, objects=[mesh, light])
    data = scene.compile()
    assert bounce.scene_is_simple(data)
    assert bounce._auto_block_rows(sum(c_ for _, c_ in data.kmesh_ranges)) == 32

    tables = bounce.build_bounce_tables(data)
    n = 64
    key = threefry.key_words(9)
    o, d = cam.generate_rays(key, jnp.arange(n, dtype=jnp.int32), spp=1)
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)
    uids = jnp.arange(n, dtype=jnp.int32)

    ref_rad, ref_segs = integrator.path_trace(
        data, o, d, uids, key, 3, cam.max_trace_dist
    )
    out_rad, out_segs = bounce.path_trace_pallas(
        data, tables, o, d, uids, key, 3, cam.max_trace_dist
    )
    np.testing.assert_allclose(
        np.asarray(out_rad), np.asarray(ref_rad), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(float(out_segs), float(ref_segs))


def test_dense_budget_is_total_not_per_mesh():
    """Several per-mesh-admissible meshes must not overflow the SMEM
    scan-table budget: dense admission is smallest-first up to
    DENSE_MESH_MAX_TRIS TOTAL padded rows; the rest take the big path."""
    from cs397raytracingsp22_tpu import Camera, Lambertian, Scene
    from cs397raytracingsp22_tpu.ops.bvh import DENSE_MESH_MAX_TRIS
    from tests.test_mesh import make_mesh

    def grid_mesh(g, dz):
        xs = np.linspace(-1.0, 1.0, g + 1, dtype=np.float32)
        px, pz = np.meshgrid(xs, xs, indexing="ij")
        positions = np.stack(
            [px, np.zeros_like(px), pz + dz], axis=-1
        ).reshape(-1, 3)
        vid = np.arange((g + 1) * (g + 1), dtype=np.int32).reshape(g + 1, g + 1)
        a, b = vid[:-1, :-1].ravel(), vid[1:, :-1].ravel()
        c, d4 = vid[1:, 1:].ravel(), vid[:-1, 1:].ravel()
        faces = np.concatenate(
            [np.stack([a, b, c], axis=-1), np.stack([a, c, d4], axis=-1)]
        )
        return make_mesh(positions, faces,
                         material=Lambertian(albedo=(0.5, 0.5, 0.5)))

    # three 5,000-tri meshes: each under the 8192 per-mesh cap, total
    # 15,000 over the budget → only one admitted dense
    meshes = [grid_mesh(50, dz) for dz in (-2.0, 0.0, 2.0)]  # 5000 tris each
    cam = Camera(eyepoint=(0, 2, 5), view_dir=(0, -0.3, -1),
                 screen_width=4, screen_height=4, aa_sample_count=1)
    data = Scene(camera=cam, objects=meshes).compile()
    n_dense = len(data.dense_mesh_ids)
    total = sum(
        (int(data.meshes[i].tri_verts.shape[0]) + 15) // 16 * 16
        for i in data.dense_mesh_ids
    )
    assert total <= DENSE_MESH_MAX_TRIS
    assert n_dense == 1 and len(data.meshes) == 3


def test_uniforms_tail_counters_match():
    """_uniforms(first=k) must reproduce exactly the tail of the full
    draw sequence (the last bounce skips the scatter draws but the
    volume free-flight draws keep their counters)."""
    k0 = jnp.uint32(0x12345678)
    k1 = jnp.uint32(0x9ABCDEF0)
    uid = jnp.full((2, 4), 7, jnp.uint32)
    site = jnp.uint32(11)
    full = bounce._uniforms(k0, k1, uid, site, 7)
    tail = bounce._uniforms(k0, k1, uid, site, 3, first=4)
    for a, b in zip(full[4:7], tail):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    odd = bounce._uniforms(k0, k1, uid, site, 2, first=3)
    for a, b in zip(full[3:5], odd):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
