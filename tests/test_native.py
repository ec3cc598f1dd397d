"""Native (C++) runtime vs pure-Python specification."""

import os

import numpy as np
import pytest

from cs397raytracingsp22_tpu.ops import bvh as bvhlib
from cs397raytracingsp22_tpu.utils import native, obj_loader

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)

ASSET_DIR = "/root/reference/obj"


@pytest.mark.parametrize("name", ["cube.obj", "teapot.obj", "drone.obj"])
def test_native_obj_matches_python(name):
    path = os.path.join(ASSET_DIR, name)
    if not os.path.exists(path):
        pytest.skip("asset absent")
    py = obj_loader.load_obj(path, use_native=False)
    nat = obj_loader.load_obj(path, use_native=True)
    assert nat.num_triangles == py.num_triangles
    assert nat.num_vertices == py.num_vertices
    np.testing.assert_allclose(nat.positions, py.positions, rtol=1e-6)
    np.testing.assert_allclose(nat.normals, py.normals, rtol=1e-6)
    np.testing.assert_allclose(nat.texcoords, py.texcoords, rtol=1e-6)
    np.testing.assert_array_equal(nat.indices, py.indices)
    assert nat.has_normals == py.has_normals
    assert nat.has_texcoords == py.has_texcoords


def test_native_bvh_valid_and_equivalent():
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    centers = rng.uniform(-5, 5, size=(403, 1, 3))
    tris = (centers + rng.uniform(-0.5, 0.5, size=(403, 3, 3))).astype(np.float32)

    nat = bvhlib.build_bvh(tris, leaf_size=4, use_native=True)
    py = bvhlib.build_bvh(tris, leaf_size=4, use_native=False)

    # structural invariants
    for b in (nat, py):
        nn = b.skip.shape[0]
        assert sorted(b.tri_order.tolist()) == list(range(403))
        assert (b.skip > np.arange(nn)).all() and (b.skip <= nn).all()
        leaves = b.leaf_start >= 0
        assert b.leaf_count[leaves].sum() == 403

    # identical traversal results on random rays
    o = rng.uniform(-8, 8, size=(128, 3)).astype(np.float32)
    targets = tris[rng.integers(0, 403, 128)].mean(axis=1)
    d = (targets - o).astype(np.float32)

    def trav(b):
        return bvhlib.traverse(
            jnp.asarray(o), jnp.asarray(d), 0.001, 100.0,
            jnp.asarray(b.bounds_min), jnp.asarray(b.bounds_max),
            jnp.asarray(b.skip), jnp.asarray(b.leaf_start),
            jnp.asarray(b.leaf_count), jnp.asarray(tris[b.tri_order]), 4,
        )

    hn, tn, in_, _, _ = trav(nat)
    hp, tp, ip, _, _ = trav(py)
    np.testing.assert_array_equal(np.asarray(hn), np.asarray(hp))
    m = np.asarray(hn)
    assert m.sum() > 50
    np.testing.assert_allclose(np.asarray(tn)[m], np.asarray(tp)[m], rtol=1e-5)
    # original tri ids must agree
    np.testing.assert_array_equal(
        nat.tri_order[np.asarray(in_)[m]], py.tri_order[np.asarray(ip)[m]]
    )
