"""Roofline ceiling for the mega-bounce kernel: measured VPU peaks ×
static op-class counts → implied Mrays/s ceiling vs HEAD.

Walks the traced bounce body's jaxpr (the same accounting as
tools/count_bounce_ops.py) and splits equations into issue classes:

  f32    float arithmetic (FMA/mul/add/sub/min/max/select on f32)
  i32    integer/bool/logical ops (and/or/shift/compare/select)
  free   bitcasts + broadcasts + converts Mosaic folds into reads
  multi  multi-cycle ops (div/sqrt/rsqrt/exp/log/recip approximations
         count 1 here; their true cost shows in the knockout probes)
  gather per-lane dynamic gathers (take_along_axis; multi-cycle)

With the measured marginal issue rates from tools/vpu_peak.py (f32 FMA
and i32 chains on the same (64,128) tiles), the implied per-port floor
for one full-width dispatch is

  wall_port = lanes × bounces × ops_port / peak_port

and the kernel's ceiling is the slowest port, assuming perfect overlap
of the other ports — optimistic by construction, which is what a
ceiling needs. BASELINE.md's round-5 roofline section records the
resulting chain next to the measured HEAD dispatch wall.

Run on CPU: JAX_PLATFORMS=cpu python tools/roofline.py
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench
from cs397raytracingsp22_tpu.models.scene import compile_scene
from cs397raytracingsp22_tpu.ops.pallas import bounce as B

FREE = {"bitcast_convert_type", "broadcast_in_dim", "convert_element_type",
        "reshape", "squeeze"}
MULTI = {"div", "sqrt", "rsqrt", "exp", "log", "sin", "cos", "erf_inv",
         "integer_pow", "pow", "reciprocal"}


def classify(jaxpr, counts):
    for eq in jaxpr.eqns:
        for v in eq.params.values():
            if hasattr(v, "jaxpr"):
                classify(v.jaxpr, counts)
            if isinstance(v, (list, tuple)):
                for x in v:
                    if hasattr(x, "jaxpr"):
                        classify(x.jaxpr, counts)
        name = eq.primitive.name
        if name in ("pjit", "closed_call", "custom_jvp_call", "cond",
                    "while", "scan"):
            continue  # inner jaxprs already walked above
        if name == "gather":
            counts["gather"] += 1
            continue
        if name in FREE:
            counts["free"] += 1
            continue
        out_dtypes = [getattr(ov.aval, "dtype", None) for ov in eq.outvars]
        is_f32 = any(d is not None and jnp.issubdtype(d, jnp.floating)
                     for d in out_dtypes)
        bucket = "multi" if name in MULTI else ("f32" if is_f32 else "i32")
        counts[bucket] += 1
    return counts


def main():
    scene_desc = bench.build_bench_scene(512, 512, spp=64, path_depth=8)
    scene = compile_scene(scene_desc)
    tables = B.build_bounce_tables(scene)
    shape = (64, 128)
    counts_cfg = dict(
        n_sph=scene.n_spheres, n_pln=scene.n_planes, n_tri=scene.n_tris,
        n_vol=scene.n_volumes, mesh_ranges=scene.kmesh_ranges,
        sl_ranges=scene.ksl_ranges, n_mat=int(scene.mat_type.shape[0]),
        mat_present=scene.mat_types_present,
        dense_unroll=B._dense_unroll_default(),
    )
    f32 = jnp.zeros(shape, jnp.float32)
    state = (f32, f32, f32, f32 + 1.0, f32, f32,
             f32 + 1.0, f32 + 1.0, f32 + 1.0, f32, f32, f32,
             f32 > -1.0, f32)
    args = dict(
        t_min=0.001, max_dist=1e6,
        sph_f=jnp.asarray(scene.ksph_f), sph_m=jnp.asarray(scene.ksph_m),
        pln_f=jnp.asarray(scene.kpln_f), pln_m=jnp.asarray(scene.kpln_m),
        tri_f=jnp.asarray(scene.ktri_f), tri_m=jnp.asarray(scene.ktri_m),
        vol_f=jnp.asarray(scene.kvol_f), vol_m=jnp.asarray(scene.kvol_m),
        mesh_xf=tables["mesh_xf"], mesh_bw=tables["bw_smem"],
        mesh_meta=tables["mesh_meta"], mat_g=tables["mat_g"],
        sl_bounds=tables["sl_smem"], bw_v=tables["bw_gather"],
        nrm_v=tables["nrm_gather"],
        k0=jnp.uint32(1), k1=jnp.uint32(2),
        uid_u=jnp.zeros(shape, jnp.uint32), shape=shape,
    )
    b = B._build_bounce(counts_cfg, **args, primary=False, last=False)
    jaxpr = jax.make_jaxpr(lambda st: b(jnp.uint32(7), st))(state)
    c = {"f32": 0, "i32": 0, "free": 0, "multi": 0, "gather": 0}
    classify(jaxpr.jaxpr, c)
    total = sum(c.values())
    print(f"bounce-body eqs by class (per lane per bounce): {c}"
          f"  total={total}")

    # measured marginal issue rates (tools/vpu_peak.py, 2026-08-21,
    # 1× TPU v5 lite; override via env for re-derivation)
    f32_peak = float(os.environ.get("RL_F32_PEAK", "3.09e12"))
    i32_peak = float(os.environ.get("RL_I32_PEAK", "6.0e12"))
    lanes = 512 * 512 * 64
    bounces = 8
    lane_bounces = lanes * bounces
    wall_f32 = lane_bounces * c["f32"] / f32_peak
    wall_i32 = lane_bounces * c["i32"] / i32_peak
    floor = max(wall_f32, wall_i32)
    print(f"per-dispatch port floors: f32 {wall_f32*1e3:.1f} ms, "
          f"i32 {wall_i32*1e3:.1f} ms (multi/gather assumed overlapped)")
    print(f"ceiling (binding port only): "
          f"{lane_bounces/floor/1e6:.0f} Mrays/s")
    head = float(os.environ.get("RL_HEAD_WALL_S", "0.2790"))
    print(f"HEAD dispatch wall {head*1e3:.1f} ms = "
          f"{lane_bounces/head/1e6:.1f} Mrays/s "
          f"-> {100*floor/head:.1f}% of the binding-port ceiling")


if __name__ == "__main__":
    main()
