"""Multi-device rendering on the 8-virtual-CPU-device mesh: the sharded
render must be bit-identical to single-device (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cs397raytracingsp22_tpu.parallel import sharding
from cs397raytracingsp22_tpu.render.driver import render_chunk
from scenes import cornell


@pytest.fixture(scope="module")
def small_scene():
    scene = cornell.build(width=16, height=16, spp=8, path_depth=3)
    return scene, scene.compile()


def test_eight_devices_available():
    assert len(jax.devices()) == 8, "conftest must fake 8 CPU devices"


@pytest.mark.parametrize("shape", [(8, 1), (4, 2), (2, 4), (1, 8)])
def test_sharded_matches_single_device(small_scene, shape):
    scene, data = small_scene
    n_dp, n_sp = shape
    mesh = sharding.make_device_mesh(n_dp=n_dp, n_sp=n_sp)
    spp = scene.camera.aa_sample_count

    from cs397raytracingsp22_tpu.utils import threefry

    key = threefry.key_words(11)
    pixel_ids = jnp.arange(256, dtype=jnp.int32)

    ref_sum, ref_segs = render_chunk(
        data, scene.camera, pixel_ids, key, jnp.int32(0), spp, 1
    )

    fn = sharding.make_sharded_render_chunk(mesh, scene.camera, spp)
    out_sum, out_segs = fn(data, pixel_ids, key, jnp.int32(0))

    np.testing.assert_array_equal(np.asarray(ref_sum), np.asarray(out_sum))
    np.testing.assert_allclose(float(ref_segs), float(out_segs))


def test_mesh_construction():
    mesh = sharding.make_device_mesh(n_dp=4, n_sp=2)
    assert mesh.shape["dp"] == 4 and mesh.shape["sp"] == 2


def test_render_to_image_sharded_matches_driver(small_scene):
    """Full sharded image == single-device driver image, bit for bit."""
    from cs397raytracingsp22_tpu.render.driver import render_to_image

    scene, _ = small_scene
    img_ref, _ = render_to_image(scene, seed=4, verbose=False)
    mesh = sharding.make_device_mesh(n_dp=4, n_sp=2)
    img_sh, stats = sharding.render_to_image_sharded(scene, mesh, seed=4, verbose=False)
    np.testing.assert_array_equal(img_ref, img_sh)
    assert stats.device_count == 8
