"""Fused Pallas scene-intersection kernel vs the jnp specification.

Runs the kernel in interpreter mode on CPU (tests never need TPU) and
asserts hit-for-hit agreement with intersect_scene_jnp on a scene using
every primitive class: spheres, planes, standalone triangles, volumes,
a dense mesh, and (separately) a big BVH mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cs397raytracingsp22_tpu import (
    Camera,
    ConvexVolume,
    Dielectric,
    Isotropic,
    Lambertian,
    Metal,
    Plane,
    Scene,
    Sphere,
    Triangle,
)
from cs397raytracingsp22_tpu.models import transform as tf
from cs397raytracingsp22_tpu.ops.intersect import (
    intersect_scene_fused,
    intersect_scene_jnp,
)
from tests.test_mesh import make_mesh


def full_scene():
    mesh = make_mesh(
        [[-1.5, 0, -4], [1.5, 0, -4], [0, 2, -4]],
        [[0, 1, 2]],
        material=Metal(albedo=(0.9, 0.9, 0.9)),
        transform=tf.translate(0.5, 0.0, 0.0) @ tf.scale(0.8),
    )
    objects = [
        Sphere(center=(0, 0, -5), radius=1.0, material=Lambertian(albedo=(0.5, 0.5, 0.5))),
        Sphere(center=(2, 1, -6), radius=1.5, material=Dielectric()),
        Plane(point=(0, -2, 0), normal=(0, 1, 0), material=Lambertian()),
        Plane(point=(0, 8, 0), normal=(0, -1, 0), material=Lambertian(emission=(5, 5, 5))),
        Triangle(a=(-3, 0, -3), b=(-1, 0, -3), c=(-2, 2, -3), material=Metal()),
        ConvexVolume(
            boundary=Sphere(center=(-2, -1, -4), radius=1.2, material=Lambertian()),
            phase_function=Isotropic(albedo=(1, 1, 1)),
            density=0.7,
        ),
        mesh,
    ]
    return Scene(camera=Camera(), objects=objects).compile()


def rays(n, seed=0):
    key = jax.random.key(seed)
    k1, k2 = jax.random.split(key)
    o = jax.random.uniform(k1, (n, 3), minval=-1.5, maxval=1.5)
    d = jax.random.normal(k2, (n, 3))
    # aim most rays into the scene (toward -z)
    d = d.at[:, 2].set(-jnp.abs(d[:, 2]) - 0.3)
    return o, d


@pytest.mark.slow
def test_fused_matches_jnp():
    scene = full_scene()
    n = 512
    o, d = rays(n)
    u_vol = jax.random.uniform(jax.random.key(7), (n, scene.vol_center.shape[0]))

    ref = intersect_scene_jnp(scene, o, d, 0.001, 100.0, u_vol)
    out = intersect_scene_fused(scene, o, d, 0.001, 100.0, u_vol)

    rv = np.asarray(ref.valid)
    ov = np.asarray(out.valid)
    np.testing.assert_array_equal(rv, ov)
    assert rv.sum() > n // 4, "scene should have plenty of hits"
    m = rv
    np.testing.assert_allclose(np.asarray(out.t)[m], np.asarray(ref.t)[m], rtol=2e-5)
    np.testing.assert_allclose(
        np.asarray(out.point)[m], np.asarray(ref.point)[m], rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.normal)[m], np.asarray(ref.normal)[m], rtol=1e-3, atol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(out.frontface)[m], np.asarray(ref.frontface)[m]
    )
    np.testing.assert_array_equal(np.asarray(out.mtype)[m], np.asarray(ref.mtype)[m])
    np.testing.assert_allclose(
        np.asarray(out.albedo)[m], np.asarray(ref.albedo)[m], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out.emission)[m], np.asarray(ref.emission)[m], atol=1e-6
    )


@pytest.mark.slow
def test_fused_per_ray_bounds():
    scene = full_scene()
    n = 256
    o, d = rays(n, seed=3)
    u_vol = jax.random.uniform(jax.random.key(8), (n, scene.vol_center.shape[0]))
    t_max = jax.random.uniform(jax.random.key(9), (n,), minval=2.0, maxval=50.0)

    ref = intersect_scene_jnp(scene, o, d, 0.0, t_max, u_vol)
    out = intersect_scene_fused(scene, o, d, 0.0, t_max, u_vol)
    np.testing.assert_array_equal(np.asarray(ref.valid), np.asarray(out.valid))
    m = np.asarray(ref.valid)
    np.testing.assert_allclose(np.asarray(out.t)[m], np.asarray(ref.t)[m], rtol=2e-5)


@pytest.mark.slow
def test_fused_keycmp_modes_agree(monkeypatch):
    """RT_KEYCMP=u (t_min-shifted unsigned mesh scan) vs
    =s (signed unshifted chain): same hit set and winners. The domains
    differ by float ulps, so t agreement is tight-tolerance rather than
    bitwise (winner t is re-derived from the unshifted ray either way)."""
    scene = full_scene()
    n = 256
    o, d = rays(n, seed=5)
    u_vol = jax.random.uniform(jax.random.key(12), (n, scene.vol_center.shape[0]))
    t_max = jax.random.uniform(jax.random.key(13), (n,), minval=0.5, maxval=50.0)

    outs = {}
    for mode in ("u", "s"):
        monkeypatch.setenv("RT_KEYCMP", mode)
        outs[mode] = intersect_scene_fused(scene, o, d, 0.001, t_max, u_vol)
    a, b = outs["u"], outs["s"]
    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))
    m = np.asarray(a.valid)
    np.testing.assert_allclose(
        np.asarray(a.t)[m], np.asarray(b.t)[m], rtol=1e-6, atol=1e-7
    )
    np.testing.assert_array_equal(
        np.asarray(a.mtype)[m], np.asarray(b.mtype)[m]
    )


@pytest.mark.slow
def test_fused_empty_windows(monkeypatch):
    """Empty per-ray occlusion windows (t_max < t_min — the dead-ray
    convention of the shrinking wavefront) must produce NO mesh hits in
    both key-compare modes: u mode guards with key0 = bci(0), s mode
    with the negative key pattern."""
    scene = full_scene()
    n = 128
    o, d = rays(n, seed=6)
    u_vol = jax.random.uniform(jax.random.key(14), (n, scene.vol_center.shape[0]))
    for mode in ("u", "s"):
        monkeypatch.setenv("RT_KEYCMP", mode)
        out = intersect_scene_fused(scene, o, d, 0.001, jnp.full((n,), 5e-4), u_vol)
        assert not np.asarray(out.valid).any(), mode


@pytest.mark.slow
def test_big_mesh_kernel_matches_traverse():
    """tri_scan_big (VMEM-table dense kernel) vs BVH traversal on a
    synthetic 1k-triangle mesh."""
    import numpy as np

    from cs397raytracingsp22_tpu.models.scene import _baldwin_weber_rows
    from cs397raytracingsp22_tpu.ops import bvh as bvhlib
    from cs397raytracingsp22_tpu.ops.pallas.tri_scan_big import (
        pack_big_tables,
        tri_scan_big_pallas,
    )

    rng = np.random.default_rng(11)
    centers = rng.uniform(-4, 4, size=(1001, 1, 3))
    tris = (centers + rng.uniform(-0.4, 0.4, size=(1001, 3, 3))).astype(np.float32)
    table = np.concatenate(
        [tris[:, 0], tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0]], axis=1
    ).astype(np.float32)
    bw = _baldwin_weber_rows(tris)
    big_bw, big_box, big_sl = pack_big_tables(bw, table)

    o = rng.uniform(-8, 8, size=(300, 3)).astype(np.float32)
    targets = tris[rng.integers(0, len(tris), 300)].mean(axis=1)
    d = (targets - o).astype(np.float32)

    hb, tb, ib, ub, vb = bvhlib.intersect_tris_bruteforce(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(tris), 0.001, 100.0
    )
    hp, tp, ip, up, vp = tri_scan_big_pallas(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(big_bw),
        jnp.asarray(big_box), jnp.asarray(big_sl), 0.001, 100.0
    )
    np.testing.assert_array_equal(np.asarray(hb), np.asarray(hp))
    m = np.asarray(hb)
    assert m.sum() > 100
    np.testing.assert_allclose(np.asarray(tb)[m], np.asarray(tp)[m], rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(ib)[m], np.asarray(ip)[m])
    np.testing.assert_allclose(np.asarray(ub)[m], np.asarray(up)[m], atol=2e-4)


@pytest.mark.slow
def test_big_mesh_kernel_keycmp_modes(monkeypatch):
    """tri_scan_big RT_KEYCMP=u vs =s: same hit set/winners on random
    rays, and zero hits for empty occlusion windows (t_max < t_min) in
    both modes (the u-mode wrapper clamp)."""
    import numpy as np

    from cs397raytracingsp22_tpu.models.scene import _baldwin_weber_rows
    from cs397raytracingsp22_tpu.ops.pallas.tri_scan_big import (
        pack_big_tables,
        tri_scan_big_pallas,
    )

    rng = np.random.default_rng(21)
    centers = rng.uniform(-4, 4, size=(600, 1, 3))
    tris = (centers + rng.uniform(-0.4, 0.4, size=(600, 3, 3))).astype(np.float32)
    table = np.concatenate(
        [tris[:, 0], tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0]], axis=1
    ).astype(np.float32)
    big_bw, big_box, big_sl = pack_big_tables(_baldwin_weber_rows(tris), table)

    o = rng.uniform(-8, 8, size=(200, 3)).astype(np.float32)
    targets = tris[rng.integers(0, len(tris), 200)].mean(axis=1)
    d = (targets - o).astype(np.float32)
    args = (jnp.asarray(o), jnp.asarray(d), jnp.asarray(big_bw),
            jnp.asarray(big_box), jnp.asarray(big_sl))

    outs = {}
    for mode in ("u", "s"):
        monkeypatch.setenv("RT_KEYCMP", mode)
        outs[mode] = tri_scan_big_pallas(*args, 0.001, 100.0)
        # empty windows: no hits regardless of mode
        he, *_ = tri_scan_big_pallas(*args, 0.001, jnp.full((200,), 5e-4))
        assert not np.asarray(he).any(), mode
    (hu, tu, iu, *_), (hs, ts, is_, *_) = outs["u"], outs["s"]
    np.testing.assert_array_equal(np.asarray(hu), np.asarray(hs))
    m = np.asarray(hu)
    assert m.sum() > 50
    np.testing.assert_array_equal(np.asarray(iu)[m], np.asarray(is_)[m])
    np.testing.assert_allclose(np.asarray(tu)[m], np.asarray(ts)[m], rtol=1e-6)
