"""Measured VPU f32 lane-op peak — the roofline anchor for the scan.

A Pallas kernel issues a long straight-line block of independent FMA
chains (8 chains × UNROLL FMAs each) over (64, 128) f32 tiles — the same
tile shape and op mix as the mega-bounce kernel's dense triangle scan —
and the tool reports lane-ops/s: ops = grid × rows × 128 × 8 × UNROLL
(one FMA = one lane-op; the VPU has no separate mul+add issue for f32).

The dense scan's achieved rate (28.8 eqs/tri × 240 tris × measured
Mrays/s) divided by this peak is the scan's VPU issue utilization — the
number BASELINE.md's round-4 roofline section cites.

Run on TPU:  python tools/vpu_peak.py [unroll] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 64
LANES = 128
CHAINS = 8


def make_kernel(unroll):
    def kernel(x, o):
        v = [x[:] * (1.0 + 0.001 * i) for i in range(CHAINS)]
        # independent chains: each step one FMA per chain, constants
        # from SMEM-free immediates (same scheduling regime as the
        # scan's SMEM-broadcast FMAs)
        for i in range(unroll):
            c = 1.0 + 1e-6 * i
            v = [vi * c + 0.5 for vi in v]
        acc = v[0]
        for vi in v[1:]:
            acc = acc + vi
        o[:] = acc

    return kernel


def main():
    unroll = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    n_rows = 2048 * ROWS  # 16.7M lanes, ~the bench dispatch's ray count
    x = jnp.ones((n_rows, LANES), jnp.float32)
    grid = n_rows // ROWS
    f = pl.pallas_call(
        make_kernel(unroll),
        grid=(grid,),
        in_specs=[pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32),
    )
    g = jax.jit(f)
    out = g(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = g(x)
    jax.block_until_ready(out)
    wall = (time.perf_counter() - t0) / reps
    ops = n_rows * LANES * CHAINS * unroll
    print(
        f"unroll={unroll} wall={wall*1e3:.2f} ms  "
        f"FMA lane-ops={ops/1e9:.2f}G  -> {ops/wall/1e12:.3f} Tops/s"
    )


if __name__ == "__main__":
    main()
