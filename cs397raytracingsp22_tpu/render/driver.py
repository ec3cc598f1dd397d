"""Render driver: chunked megabatch rendering, accumulation, image I/O.

Replaces the reference's rayon row loop (tracing.rs:221-263) with a
jit-compiled chunk kernel: pixels are processed in fixed-size chunks
(static shapes → one compile), each chunk generating pixel×spp rays,
integrating them with the wavefront loop, and averaging samples. spp can
additionally be chunked for memory control and checkpointed accumulation
(SURVEY.md §5 checkpoint/resume — the reference loses a render killed at
99%; we persist the running HDR accumulator).

All chunking is invisible to the image: RNG is content-keyed, so the
sample VALUES never depend on (pixel_chunk, spp_chunk, device count).
Pixel chunking and device sharding are pure partitions — bit-identical
output. spp chunking splits the per-pixel f32 sample sum into partial
sums combined in f64, so a pixel sitting exactly on a u8 quantization
boundary can round differently (measured: ≤1 u8 on ~1e-6 of subpixels
at 512²x64spp; zero on smaller configs).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from cs397raytracingsp22_tpu.models.camera import Camera, ShadingMode
from cs397raytracingsp22_tpu.models.scene import Scene, SceneData
from cs397raytracingsp22_tpu.ops import tonemap as tonemap_ops
from cs397raytracingsp22_tpu.render import integrator
from cs397raytracingsp22_tpu.utils import threefry


@dataclasses.dataclass
class RenderStats:
    """Per-render metrics (SURVEY.md §5 observability)."""

    width: int = 0
    height: int = 0
    spp: int = 0
    path_depth: int = 0
    wall_seconds: float = 0.0
    compile_seconds: float = 0.0
    primary_rays: int = 0
    path_segments: float = 0.0
    # post-first-chunk accounting: the first chunk's wall time is
    # dominated by compile, so steady-state rates come from the
    # remaining chunks (zero for single-chunk renders → rates fall back
    # to whole-wall, the only measurement available)
    steady_seconds: float = 0.0
    steady_segments: float = 0.0
    steady_primary: int = 0
    device_count: int = 1

    @property
    def primary_mrays_per_sec(self) -> float:
        if self.steady_seconds > 0:
            return self.steady_primary / self.steady_seconds / 1e6
        return self.primary_rays / (self.wall_seconds or 1e-9) / 1e6

    @property
    def segment_mrays_per_sec(self) -> float:
        if self.steady_seconds > 0:
            return self.steady_segments / self.steady_seconds / 1e6
        return self.path_segments / (self.wall_seconds or 1e-9) / 1e6

    def summary(self) -> str:
        return (
            f"{self.width}x{self.height} @ {self.spp}spp depth {self.path_depth} | "
            f"{self.wall_seconds:.2f}s wall ({self.compile_seconds:.2f}s compile) | "
            f"{self.primary_mrays_per_sec:.1f} Mrays/s primary, "
            f"{self.segment_mrays_per_sec:.1f} Mrays/s segments | "
            f"{self.device_count} device(s)"
        )


def render_chunk_core(
    scene: SceneData,
    camera: Camera,
    pixel_ids: jnp.ndarray,
    rng_key,
    sample_offset: jnp.ndarray,
    spp: int,
    n_chains: int = 1,
):
    """Render one pixel chunk at `spp` samples (trace-level core).

    `n_chains` replicates each camera sample into independent bounce
    chains (the path_samples analogue — see integrator docstring).
    Returns (radiance_sum, segments): per-pixel SUM over this chunk's
    samples (caller accumulates and divides) and traced segment count.
    Pure function of its inputs — used directly under jit (render_chunk)
    and inside shard_map (parallel.sharding).
    """
    n_px = pixel_ids.shape[0]
    o, d = camera.generate_rays(rng_key, pixel_ids, spp=spp, sample_offset=sample_offset)
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)

    # Chain uids: distinct bounce RNG per replicated chain.
    sample_ids = sample_offset + jnp.arange(spp, dtype=jnp.int32)
    uids = pixel_ids[:, None] * jnp.int32(camera.aa_sample_count) + sample_ids[None, :]
    uids = uids.reshape(-1)
    if n_chains > 1:
        o = jnp.repeat(o, n_chains, axis=0)
        d = jnp.repeat(d, n_chains, axis=0)
        uids = uids[:, None] * jnp.int32(n_chains) + jnp.arange(
            n_chains, dtype=jnp.int32
        )
        uids = uids.reshape(-1)

    if camera.shading_mode is ShadingMode.PHONG:
        radiance = integrator.phong_trace(
            scene, o, d, uids, rng_key, camera.eyepoint, camera.max_trace_dist
        )
        segments = jnp.asarray(float(o.shape[0]), jnp.float32)
    else:
        from cs397raytracingsp22_tpu.ops.intersect import _use_pallas
        from cs397raytracingsp22_tpu.ops.pallas import bounce as bounce_kernel

        if _use_pallas() and bounce_kernel.scene_is_simple(scene):
            # Mega-bounce kernel: the whole path-trace loop in VMEM.
            tables = bounce_kernel.build_bounce_tables(scene)
            radiance, segments = bounce_kernel.path_trace_pallas(
                scene, tables, o, d, uids, rng_key,
                camera.path_depth, camera.max_trace_dist,
            )
        else:
            radiance, segments = integrator.path_trace(
                scene, o, d, uids, rng_key, camera.path_depth, camera.max_trace_dist
            )

    radiance = radiance.reshape(n_px, spp * n_chains, 3)
    return jnp.sum(radiance, axis=1) / n_chains, segments


render_chunk = jax.jit(
    render_chunk_core, static_argnames=("camera", "spp", "n_chains")
)


def _run_chunk_with_retry(scene, cam, ids, key, s0, spp, n_chains, retries: int = 2):
    """Failure detection + recovery (SURVEY.md §5): chunks are stateless,
    so a transient device error (preempted remote TPU, infra hiccup) is
    recovered by simply re-running the chunk."""
    for attempt in range(retries + 1):
        try:
            rad_sum, segs = render_chunk(scene, cam, ids, key, s0, spp, n_chains)
            return jax.block_until_ready(rad_sum), segs
        except jax.errors.JaxRuntimeError as e:
            if attempt == retries:
                raise
            print(
                f"\n[render] device error ({type(e).__name__}); retrying chunk "
                f"({attempt + 1}/{retries})"
            )
            time.sleep(1.0 + attempt)


def render_to_image(
    scene: Scene,
    seed: int = 0,
    pixel_chunk: Optional[int] = None,
    spp_chunk: Optional[int] = None,
    checkpoint_path: Optional[str] = None,
    verbose: bool = True,
    scene_data: Optional[SceneData] = None,
) -> tuple[np.ndarray, RenderStats]:
    """Full render: returns ((H, W, 3) uint8 image, RenderStats).

    Equivalent surface to Scene::render_to_image (tracing.rs:221-263):
    generate AA rays per pixel, shade by camera.shading_mode, average,
    channel-bleed + gamma + quantize.

    checkpoint_path: if set, the running HDR accumulator is persisted
    after every spp chunk and restored on restart, making long renders
    resumable and previewable.
    """
    cam = scene.camera
    w, h = cam.screen_width, cam.screen_height
    n_px_total = w * h
    spp = cam.aa_sample_count
    n_chains = max(1, cam.path_samples)

    if scene_data is None:
        scene_data = scene.compile()

    if pixel_chunk is None:
        # Budget per dispatch by WORK (ray-segments × primitive tests),
        # not just ray count: big dispatches pipeline Pallas grid blocks
        # and amortize dispatch latency (measured 2× vs small chunks),
        # but a dispatch that runs for minutes trips device timeouts.
        # budget against the spp actually dispatched per chunk — a
        # checkpointed 1000-spp render with spp_chunk=50 dispatches
        # 50-spp chunks, so sizing by the full spp would shrink pixel
        # chunks 20x for nothing
        eff_spp = min(spp, spp_chunk) if spp_chunk else spp
        per_px_rays = max(1, eff_spp * n_chains)
        prim_tests = (
            scene_data.n_spheres
            + scene_data.n_planes
            + scene_data.n_tris
            + scene_data.n_volumes
            + sum(int(m.tri_verts.shape[0]) for m in scene_data.meshes)
        )
        work_per_px = per_px_rays * max(1, cam.path_depth) * max(16, prim_tests)
        budget = 1 << 36  # ~7e10 ray·prim·bounce units ≈ a few seconds
        if len(scene_data.dense_mesh_ids) < len(scene_data.meshes):
            # big-mesh scenes run the sorted wavefront, whose
            # piece/superleaf culling improves with batch size (more
            # rays per Morton cell → more coherent blocks), and their
            # effective work is far below the dense product above
            # thanks to that culling — so allow 4× bigger dispatches
            budget <<= 2
        pixel_chunk = max(1, min(n_px_total, budget // work_per_px))
        # round down to a power of two: the chunk size sets the compiled
        # program's shape, and pow2 sizes collapse the (resolution, spp,
        # scene) space onto few distinct shapes — far fewer multi-minute
        # Mosaic compiles and far more persistent-cache hits. Output is
        # bit-identical for any chunking (content-keyed RNG).
        if pixel_chunk < n_px_total:
            pixel_chunk = 1 << (pixel_chunk.bit_length() - 1)
    if spp_chunk is None:
        spp_chunk = spp
    spp_chunk = min(spp_chunk, spp)

    rng_key = threefry.key_words(seed)

    if checkpoint_path and not checkpoint_path.endswith(".npz"):
        checkpoint_path = checkpoint_path + ".npz"

    accum = np.zeros((n_px_total, 3), np.float64)
    spp_done = 0
    if checkpoint_path and os.path.exists(checkpoint_path):
        ckpt = np.load(checkpoint_path, allow_pickle=False)
        if ckpt["accum"].shape == accum.shape and int(ckpt["seed"]) == seed:
            accum = ckpt["accum"].astype(np.float64)
            spp_done = int(ckpt["spp_done"])
            if verbose:
                print(f"[render] resuming from {checkpoint_path} at {spp_done} spp")

    stats = RenderStats(
        width=w,
        height=h,
        spp=spp,
        path_depth=cam.path_depth,
        device_count=1,
    )

    t_start = time.perf_counter()
    first_chunk_done = False
    total_segments = 0.0

    all_pixel_ids = np.arange(n_px_total, dtype=np.int32)
    n_pixel_chunks = (n_px_total + pixel_chunk - 1) // pixel_chunk

    # One-deep dispatch pipeline: chunk k+1 is enqueued (async jax
    # dispatch) BEFORE chunk k's radiance is materialized to host, so
    # the device computes the next chunk while the previous result
    # crosses the device→host link — which dominates pure-analytic
    # scenes on tunneled TPUs (BASELINE.md: Cornell 512² is ~0.1 s of
    # device work inside ~0.55 s wall). A device error surfaces at
    # materialization; the pending chunk's arguments ride along so the
    # retry path (SURVEY §5 failure recovery) re-runs exactly that
    # chunk, synchronously.
    pending = None  # (rad_dev, segs_dev, ci, n_valid, args, t_disp, s0, s_count)
    last_done = None  # completion time of the previous flush

    def flush(p):
        nonlocal first_chunk_done, total_segments, last_done
        rad_dev, segs_dev, ci, n_valid, args, t0, ps0, ps_count = p
        try:
            rad_sum = np.asarray(jax.block_until_ready(rad_dev), np.float64)
            segs = float(segs_dev)
        except jax.errors.JaxRuntimeError:
            rad_sum, segs = _run_chunk_with_retry(*args)
            rad_sum = np.asarray(rad_sum, np.float64)
            segs = float(segs)
        now = time.perf_counter()
        if not first_chunk_done:
            stats.compile_seconds = now - t0
            first_chunk_done = True
        else:
            # flush-to-flush delta: dispatch intervals overlap under the
            # one-deep pipeline, so per-chunk (now - t0) would double
            # count wall time
            stats.steady_seconds += now - (last_done if last_done else t0)
            stats.steady_segments += segs
            stats.steady_primary += n_valid * ps_count * n_chains
        last_done = now
        total_segments += segs
        accum[ci * pixel_chunk : ci * pixel_chunk + n_valid] += rad_sum[:n_valid]
        if verbose:
            # progress with elapsed/ETA (the reference's indicatif bar,
            # tracing.rs:223-224)
            done_frac = (
                (ps0 - spp_done + ps_count) * (ci + 1) / n_pixel_chunks
            ) / max(1, spp - spp_done)
            done_frac = min(1.0, max(1e-9, done_frac))
            elapsed = time.perf_counter() - t_start
            eta = elapsed / done_frac - elapsed
            print(
                f"\r[render] spp {ps0 + ps_count}/{spp}, chunk "
                f"{ci + 1}/{n_pixel_chunks} ({100 * done_frac:.0f}%, "
                f"elapsed {elapsed:.1f}s, eta {eta:.1f}s)",
                end="",
                flush=True,
            )

    for s0 in range(spp_done, spp, spp_chunk):
        s_count = min(spp_chunk, spp - s0)
        for ci in range(n_pixel_chunks):
            ids = all_pixel_ids[ci * pixel_chunk : (ci + 1) * pixel_chunk]
            n_valid = ids.shape[0]
            if n_valid < pixel_chunk:  # pad to static shape
                ids = np.concatenate(
                    [ids, np.zeros(pixel_chunk - n_valid, np.int32)]
                )
            args = (
                scene_data,
                cam,
                jnp.asarray(ids),
                rng_key,
                jnp.int32(s0),
                s_count,
                n_chains,
            )
            t0 = time.perf_counter()
            try:
                rad_dev, segs_dev = render_chunk(*args)
            except jax.errors.JaxRuntimeError:
                rad_dev, segs_dev = _run_chunk_with_retry(*args)
            if pending is not None:
                flush(pending)
            pending = (rad_dev, segs_dev, ci, n_valid, args, t0, s0, s_count)
        if checkpoint_path:
            # the accumulator must be complete for this spp chunk before
            # it is persisted
            if pending is not None:
                flush(pending)
                pending = None
            np.savez(
                checkpoint_path,
                accum=accum,
                spp_done=np.int64(s0 + s_count),
                seed=np.int64(seed),
            )
            # don't charge the checkpoint write (host I/O between spp
            # chunks) to the next chunk's steady-state window
            last_done = time.perf_counter()
    if pending is not None:
        flush(pending)
    if verbose:
        print()

    stats.wall_seconds = time.perf_counter() - t_start
    stats.primary_rays = n_px_total * (spp - spp_done) * n_chains
    stats.path_segments = total_segments

    mean = (accum / max(spp, 1)).astype(np.float32).reshape(h, w, 3)
    img = np.asarray(tonemap_ops.tonemap(jnp.asarray(mean), cam.gamma))
    if verbose:
        print("[render] " + stats.summary())
    return img, stats


def save_png(img: np.ndarray, path: str) -> None:
    """Write an (H, W, 3) uint8 image as PNG (reference tracing.rs:546)."""
    from PIL import Image

    Image.fromarray(img, mode="RGB").save(path, format="PNG")


def render_and_save(scene: Scene, path: str = "render.png", **kw):
    img, stats = render_to_image(scene, **kw)
    save_png(img, path)
    return img, stats
