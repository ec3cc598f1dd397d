"""cs397raytracingsp22_tpu — a TPU-native Monte-Carlo path-tracing framework.

A from-scratch rebuild of the capabilities of the reference Rust CPU ray
tracer (mbk6/CS397RayTracingSP22) as an idiomatic JAX/XLA/Pallas wavefront
renderer:

- Scene descriptions compile to flat structure-of-arrays pytrees
  (sphere/plane/triangle tables, concatenated mesh vertex/index buffers,
  threaded flat BVHs, a material parameter table, and a packed texture
  atlas) instead of the reference's `Arc<dyn Intersectable>` object graph.
- The recursive `shade_ray` (reference src/util/tracing.rs:300-324) becomes
  an iterative bounce loop over ray megabatches with alive masks.
- Per-hit `Arc<dyn Material>` dynamic dispatch (tracing.rs:113) becomes a
  branchless masked BSDF switch over a material-type enum.
- Ambient `rand::thread_rng()` becomes counter-based threefry keyed by
  (pixel, sample, bounce) — renders are deterministic given a seed.
- rayon row-parallelism (tracing.rs:228) becomes pixel/sample sharding over
  a `jax.sharding.Mesh` via `shard_map`.

Public API mirrors the reference's scene-description surface: `Camera`,
`Scene`, `Sphere`, `Triangle`, `Plane`, `ConvexVolume`, `StaticMesh`, and
the material types `Lambertian`, `Metal`, `Dielectric`,
`ParameterizedMaterial`, `Isotropic`.
"""

import os as _os

# Persistent XLA/Mosaic compilation cache: the fused path-trace kernels
# take minutes of Mosaic compile per (scene-shape, chunk-shape); caching
# makes that a once-ever cost instead of once-per-process. Opt out with
# RT_COMPILE_CACHE=0; relocate with RT_COMPILE_CACHE_DIR.
if _os.environ.get("RT_COMPILE_CACHE", "1") != "0":
    import jax as _jax

    _cache_dir = _os.environ.get(
        "RT_COMPILE_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache", "cs397rt_jax"),
    )
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:  # older jax without these knobs: run uncached
        pass

from cs397raytracingsp22_tpu.models.camera import (
    Camera,
    CameraProjectionMode,
    ShadingMode,
)
from cs397raytracingsp22_tpu.models.materials import (
    Dielectric,
    Isotropic,
    Lambertian,
    Metal,
    ParameterizedMaterial,
)
from cs397raytracingsp22_tpu.models.geometry import (
    ConvexVolume,
    Plane,
    Sphere,
    StaticMesh,
    Triangle,
)
from cs397raytracingsp22_tpu.models.scene import Scene

__version__ = "0.1.0"

__all__ = [
    "Camera",
    "CameraProjectionMode",
    "ShadingMode",
    "Scene",
    "Sphere",
    "Triangle",
    "Plane",
    "ConvexVolume",
    "StaticMesh",
    "Lambertian",
    "Metal",
    "Dielectric",
    "ParameterizedMaterial",
    "Isotropic",
]
