"""FMA issue rate vs fori body size — the SHAPE-MATCHED roofline anchor.

The straight-line peak (tools/vpu_peak.py, 3.09 T FMA/s) overstates what
a loop-structured kernel can reach: a fori_loop body of B independent
FMAs measures (2026-08-21, v5e)

    B=8: 0.851 T   B=64: 2.348   B=384: 2.842   B=1408: 2.928   B=4096: 2.958

The mega-bounce kernel's dense scan iterates a ~1,400-op body
(dense_unroll=3 x 16 tris x ~29 ops), so its shape-matched f32 peak is
~2.93 T — 5% under straight-line. BASELINE.md's round-5 ceiling chain
uses this corrected denominator.

Run on TPU: python tools/vpu_peak_shape.py
"""
import sys, time
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
ROWS, LANES, CHAINS = 64, 128, 8

def make_kernel(u, steps):
    def kernel(x, o):
        v0 = [x[:] * (1.0 + 0.001 * i) for i in range(CHAINS)]
        def body(i, v):
            for r in range(u):  # u unrolled rounds per fori iteration
                v = [vi * vi + 0.4 for vi in v]
            return v
        v = jax.lax.fori_loop(0, steps, body, v0)
        acc = v[0]
        for vi in v[1:]:
            acc = acc + vi
        o[:] = acc
    return kernel

def run(u, steps, reps=10):
    n_rows = 2048 * ROWS
    x = jnp.full((n_rows, LANES), 0.3, jnp.float32)
    f = pl.pallas_call(
        make_kernel(u, steps), grid=(n_rows // ROWS,),
        in_specs=[pl.BlockSpec((ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32))
    g = jax.jit(lambda x: f(x)[0, 0])
    s = float(g(x))
    t0 = time.perf_counter()
    for _ in range(reps): s = g(x)
    s = float(s)
    wall = (time.perf_counter() - t0) / reps
    ops = n_rows * LANES * CHAINS * u * steps
    print(f"body={CHAINS*u:5d} FMAs x {steps:4d} iters: {wall*1e3:7.2f} ms -> {ops/wall/1e12:.3f} T FMA/s")

# total ops fixed at 8*4096 per lane; body sizes bracketing the scan's
# ~1400-op fori body (dense_unroll=3 -> 48 tris x ~29 ops)
for u, steps in [(1, 4096), (8, 512), (48, 85), (176, 23), (512, 8)]:
    run(u, steps)
