"""Static attribution of the mega-bounce kernel's per-bounce op budget.

Traces _build_bounce on the north-star scene shape and counts jaxpr
equations per section by knocking out one section at a time (n_sph=0,
no RNG, no mesh resolve, ...). Equations ≈ VPU ops at this kernel's
(64,128)-tile granularity — the same accounting BASELINE.md used for
the last-bounce specialization (1,373 of 9,162 bounce-body equations).

Run on CPU: JAX_PLATFORMS=cpu python tools/count_bounce_ops.py
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench
from cs397raytracingsp22_tpu.models.scene import compile_scene
from cs397raytracingsp22_tpu.ops.pallas import bounce as B


def count_eqs(fn, *args):
    jaxpr = jax.make_jaxpr(fn)(*args)
    n = 0

    def walk(jx):
        nonlocal n
        for eq in jx.eqns:
            n += 1
            for v in eq.params.values():
                if hasattr(v, "jaxpr"):
                    walk(v.jaxpr)
                if isinstance(v, (list, tuple)):
                    for x in v:
                        if hasattr(x, "jaxpr"):
                            walk(x.jaxpr)
        return n

    walk(jaxpr.jaxpr)
    return n


def main():
    scene_desc = bench.build_bench_scene(512, 512, spp=64, path_depth=8)
    scene = compile_scene(scene_desc)
    tables = B.build_bounce_tables(scene)

    shape = (64, 128)
    counts = dict(
        n_sph=scene.n_spheres,
        n_pln=scene.n_planes,
        n_tri=scene.n_tris,
        n_vol=scene.n_volumes,
        mesh_ranges=scene.kmesh_ranges,
        sl_ranges=scene.ksl_ranges,
        n_mat=int(scene.mat_type.shape[0]),
        mat_present=scene.mat_types_present,
        dense_unroll=B._dense_unroll_default(),
    )
    print("counts:", {k: v for k, v in counts.items()})

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

    def trace(c, primary=False, last=False):
        b = B._build_bounce(c, **args, primary=primary, last=last)
        return count_eqs(lambda st: b(jnp.uint32(7), st), state)

    full = trace(counts)
    print(f"full bounce body:            {full:6d} eqs")
    last = trace(counts, last=True)
    print(f"last-bounce body:            {last:6d} eqs")

    c = dict(counts); c["mesh_ranges"] = (); c["sl_ranges"] = ()
    nomesh = trace(c)
    print(f"no meshes (scan+resolve out): {nomesh:6d} eqs  -> mesh scan+resolve = {full-nomesh}")

    c2 = dict(counts)
    c2["n_sph"] = 0; c2["n_pln"] = 0; c2["n_tri"] = 0; c2["n_vol"] = 0
    noana = trace(c2)
    print(f"no analytic prims:           {noana:6d} eqs  -> analytic = {full-noana}")

    c3 = dict(counts); c3["n_mat"] = 1; c3["mat_present"] = (0,)
    nomat = trace(c3)
    print(f"lambertian-only 1 material:  {nomat:6d} eqs  -> mat resolve+BSDF delta = {full-nomat}")

    # mesh scan alone (resolve knocked out by last=True minus emission path):
    # estimate resolve = (full - nomesh) - scan where scan = last - nomesh_last
    c4 = dict(counts); c4["mesh_ranges"] = (); c4["sl_ranges"] = ()
    nomesh_last = trace(c4, last=True)
    scan_only = last - nomesh_last
    print(f"scan only (via last):        {scan_only:6d} eqs; resolve = {(full-nomesh) - scan_only}")

    # RNG: count one _uniforms(4) at this shape
    rng = count_eqs(
        lambda u: sum(B._uniforms(jnp.uint32(1), jnp.uint32(2), u, jnp.uint32(7), 4)),
        jnp.zeros(shape, jnp.uint32),
    ) - 1  # minus the sum
    print(f"RNG _uniforms(4):            {rng:6d} eqs")


if __name__ == "__main__":
    main()
