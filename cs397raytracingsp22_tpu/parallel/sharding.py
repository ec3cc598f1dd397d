"""Pixel-tile + sample sharding over a jax.sharding.Mesh.

The reference's only parallelism is rayon fork-join over image rows on one
machine (tracing.rs:228). The TPU-native equivalent is SPMD over a device
mesh with two axes:

- "dp" (data parallel): the pixel batch shards across devices — tiles are
  embarrassingly parallel, so this axis needs no communication at all
  until image assembly (XLA gathers the sharded output).
- "sp" (sample parallel): samples-per-pixel shard across devices; each
  device integrates its slice of the spp range and the per-pixel sums are
  combined with one `psum` over the "sp" axis — the only collective in
  the renderer, riding ICI.

Because the RNG is content-keyed (utils/rng.py), any mesh shape produces
bit-identical images to the single-device render — asserted by
tests/test_sharding.py on the 8-virtual-device CPU mesh.

Scene arrays are small (KBs–MBs) and replicated (in_spec P()); scaling
state is the ray megabatch, not the scene.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from cs397raytracingsp22_tpu.models.camera import Camera
from cs397raytracingsp22_tpu.models.scene import SceneData
from cs397raytracingsp22_tpu.render.driver import render_chunk_core

try:  # jax >= 0.6 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def make_device_mesh(
    n_dp: Optional[int] = None,
    n_sp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ("dp", "sp") mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_dp is None:
        n_dp = len(devices) // n_sp
    assert n_dp * n_sp <= len(devices), "mesh larger than device count"
    arr = np.asarray(devices[: n_dp * n_sp]).reshape(n_dp, n_sp)
    return Mesh(arr, ("dp", "sp"))


def make_sharded_render_chunk(
    mesh: Mesh, camera: Camera, spp: int, n_chains: int = 1
):
    """Build a jitted sharded chunk renderer for a fixed camera/spp.

    Returns fn(scene_data, pixel_ids, base_key, sample_offset) →
    (radiance_sum (N_px, 3), segments). pixel_ids length must divide by
    the mesh's dp size; spp by its sp size.
    """
    n_sp = mesh.shape["sp"]
    assert spp % n_sp == 0, f"spp {spp} not divisible by sp axis {n_sp}"
    spp_local = spp // n_sp

    def local(scene: SceneData, pixel_ids, base_key, sample_offset):
        sp_idx = jax.lax.axis_index("sp")
        local_offset = sample_offset + sp_idx * spp_local
        rad_sum, segs = render_chunk_core(
            scene, camera, pixel_ids, base_key, local_offset, spp_local, n_chains
        )
        # The renderer's one collective: combine per-device spp slices.
        rad_sum = jax.lax.psum(rad_sum, "sp")
        segs = jax.lax.psum(segs, ("dp", "sp"))
        return rad_sum, segs

    sharded = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P("dp"), P(), P()),
        out_specs=(P("dp"), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def render_to_image_sharded(
    scene,
    mesh: Mesh,
    seed: int = 0,
    verbose: bool = True,
):
    """Full sharded render: the multi-device render_to_image.

    Pixels shard over "dp", samples over "sp"; the image is assembled on
    the host. Bit-identical to the single-device driver (content-keyed
    RNG). For multi-host (DCN-connected slices), initialize
    jax.distributed first and pass a global mesh — each process
    contributes its addressable devices; rendering needs no cross-host
    traffic beyond the final gather.
    """
    import time

    import numpy as np

    from cs397raytracingsp22_tpu.ops import tonemap as tonemap_ops
    from cs397raytracingsp22_tpu.render.driver import RenderStats
    from cs397raytracingsp22_tpu.utils import threefry

    cam = scene.camera
    w, h = cam.screen_width, cam.screen_height
    n_px = w * h
    spp = cam.aa_sample_count
    n_dp = mesh.shape["dp"]

    data = scene.compile()
    fn = make_sharded_render_chunk(mesh, cam, spp, max(1, cam.path_samples))

    pad = (n_dp - n_px % n_dp) % n_dp
    pixel_ids = jnp.arange(n_px + pad, dtype=jnp.int32) % n_px
    key = threefry.key_words(seed)

    t0 = time.perf_counter()
    rad_sum, segs = fn(data, pixel_ids, key, jnp.int32(0))
    rad_sum = np.asarray(jax.block_until_ready(rad_sum), np.float64)[:n_px]
    wall = time.perf_counter() - t0

    stats = RenderStats(
        width=w, height=h, spp=spp, path_depth=cam.path_depth,
        wall_seconds=wall, primary_rays=n_px * spp,
        path_segments=float(segs),
        device_count=mesh.devices.size,
    )
    mean = (rad_sum / spp).astype(np.float32).reshape(h, w, 3)
    img = np.asarray(tonemap_ops.tonemap(jnp.asarray(mean), cam.gamma))
    if verbose:
        print("[render-sharded] " + stats.summary())
    return img, stats
