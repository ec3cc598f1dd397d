"""SMEM scalar-load issue cost: ~ZERO (measured 2026-08-21, v5e).

An FMA chain whose every step consumes a FRESH SMEM scalar (the scan's
per-triangle coefficient pattern) runs at the same rate as the
constant-coefficient control (82.6 vs 83.4 ms, -1% = noise): scalar
loads issue on the scalar core concurrently with vector ops, so the
mega-bounce kernel's 12-15 SMEM loads per triangle cost no vector issue
slots. Closes the "are scalar loads an unmodelled floor?" question in
BASELINE.md's round-5 ceiling chain.

Run on TPU: python tools/vpu_peak_smem.py
"""
import sys, time
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
ROWS, LANES, CHAINS = 64, 128, 8
STEPS = 512

def make_kernel(with_loads):
    def kernel(x, coefs, o):
        v0 = [x[:] * (1.0 + 0.001 * i) for i in range(CHAINS)]
        def body(i, v):
            base = i * CHAINS
            out = []
            for k in range(CHAINS):
                if with_loads:
                    c = coefs[base + k]   # fresh SMEM scalar per FMA
                else:
                    c = 0.4
                out.append(v[k] * v[k] + c)
            return out
        v = jax.lax.fori_loop(0, STEPS, body, v0)
        acc = v[0]
        for vi in v[1:]:
            acc = acc + vi
        o[:] = acc
    return kernel

def run(with_loads, reps=10):
    n_rows = 2048 * ROWS
    x = jnp.full((n_rows, LANES), 0.3, jnp.float32)
    coefs = jnp.asarray(np.random.default_rng(0).random(STEPS * CHAINS, dtype=np.float32))
    f = pl.pallas_call(
        make_kernel(with_loads),
        grid=(n_rows // ROWS,),
        in_specs=[pl.BlockSpec((ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32))
    g = jax.jit(lambda x, c: f(x, c)[0, 0])
    s = float(g(x, coefs))
    t0 = time.perf_counter()
    for _ in range(reps):
        s = g(x, coefs)
    s = float(s)
    wall = (time.perf_counter() - t0) / reps
    ops = n_rows * LANES * CHAINS * STEPS
    tag = "fma+smem-load" if with_loads else "fma only (fori)"
    print(f"{tag}: wall={wall*1e3:7.2f} ms -> {ops/wall/1e12:.3f} T FMA/s")
    return wall

w0 = run(False)
w1 = run(True)
print(f"SMEM load cost: {(w1-w0)/w0*100:.1f}% -> per-load slot cost ≈ {(w1/w0-1):.2f} of an FMA slot")
