"""Measured VPU lane-op peaks — the roofline anchors for the scan.

Pallas kernels issue long straight-line blocks of independent op chains
(8 chains × UNROLL ops each) over (64, 128) tiles — the same tile shape
and scheduling regime as the mega-bounce kernel's dense triangle scan —
and the tool reports lane-ops/s for three op mixes:

  f32 FMA     v = v*v + c        (one FMA per step; the scan's float mix)
  i32 alu     v = (v & m) + c    (two int ops per step; the packed-key mix)
  f32 mul     v = v*v            (one mul per step)

Two methodology traps this tool hit in round 4 (both now fixed):
  1. An affine chain with compile-time constants (v = v*c + k) is
     algebraically foldable — the whole unrolled chain collapses to one
     FMA and the "peak" reads 100-1000× over hardware. The chains here
     are non-affine (v*v + c), which no compiler can fold.
  2. On this environment's tunneled (axon) TPU, a timing loop whose
     warmup never touches host memory can read ~500× fast; after a
     warmup that includes ONE host fetch, block_until_ready / host
     fetches all agree (tools note, measured 2026-08-21). The tool
     times with a device-side reduce + scalar host fetch, which is
     robust either way.

Measured 2026-08-21 on the 1× TPU v5 lite chip (unroll 1024, reps 10):
  f32 FMA ≈ 2.89 Tops/s sustained, ≈ 3.09 Tops/s marginal (incremental
  slope between unroll 256 and 1024, dispatch overhead removed) —
  consistent with 8×128 lanes × 4 ALUs × ~0.94 GHz = 3.85 T with ~80%
  issue efficiency. BASELINE.md's round-5 roofline section cites these.

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


def make_kernel(unroll, mix):
    def kernel(x, o):
        if mix == "both":
            # 4 f32 chains + 4 i32 chains, interleaved: measures whether
            # float and integer lane-ops DUAL-ISSUE. marginal(both) ≈
            # marginal(fma) → they share one port (int is not free);
            # ≈ 2× → separate ports. This single number decides the
            # mega-bounce roofline (tools/roofline.py): the kernel is
            # 37% f32 / 40% i32 by eq count.
            vf = [x[:] * (1.0 + 0.001 * i) for i in range(CHAINS // 2)]
            xi = x[:].astype(jnp.int32)
            vi_ = [xi + i for i in range(CHAINS // 2)]
            for i in range(unroll):
                vf = [v * v + 0.4 for v in vf]
                vi_ = [(v ^ jnp.int32(0x5A5A5A5)) + jnp.int32(12345)
                       for v in vi_]
            acc = vf[0]
            for v in vf[1:]:
                acc = acc + v
            ai = vi_[0]
            for v in vi_[1:]:
                ai = ai ^ v
            o[:] = acc + ai.astype(jnp.float32)
            return
        if mix == "i32":
            xi = x[:].astype(jnp.int32)
            v = [xi + i for i in range(CHAINS)]
            for i in range(unroll):
                # two int lane-ops per step, non-foldable
                v = [(vi & jnp.int32(0x7FFFFFF1)) + jnp.int32(12345)
                     for vi in v]
            acc = v[0]
            for vi in v[1:]:
                acc = acc ^ vi
            o[:] = acc.astype(jnp.float32)
            return
        v = [x[:] * (1.0 + 0.001 * i) for i in range(CHAINS)]
        for i in range(unroll):
            # non-affine chains: cannot be constant-folded across steps
            if mix == "fma":
                v = [vi * vi + 0.4 for vi in v]
            else:  # mul
                v = [vi * vi for vi in v]
        acc = v[0]
        for vi in v[1:]:
            acc = acc + vi
        o[:] = acc

    return kernel


def run(mix, unroll, reps):
    n_rows = 2048 * ROWS  # 16.7M lanes, ~the bench dispatch's ray count
    x = jnp.full((n_rows, LANES), 0.3, jnp.float32)
    f = pl.pallas_call(
        make_kernel(unroll, mix),
        grid=(n_rows // ROWS,),
        in_specs=[pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32),
    )
    # device-side reduce: the host fetch that forces a true sync moves
    # 4 bytes, not the 64 MB output
    g = jax.jit(lambda x: f(x)[0, 0])
    s = float(g(x))  # warmup: compile + one true host sync
    t0 = time.perf_counter()
    for _ in range(reps):
        s = g(x)
    s = float(s)
    wall = (time.perf_counter() - t0) / reps
    # lane-ops per unroll step: fma/mul = 1/chain; i32 = 2/chain
    # (and+add); both = 4 f32 + 4×2 i32 = 12 across the 8 chains
    if mix == "both":
        ops = n_rows * LANES * 12 * unroll
    else:
        ops_per_step = 2 if mix == "i32" else 1
        ops = n_rows * LANES * CHAINS * unroll * ops_per_step
    print(
        f"{mix:4s} unroll={unroll:5d} wall={wall*1e3:8.2f} ms  "
        f"lane-ops={ops/1e9:7.2f}G  -> {ops/wall/1e12:.3f} Tops/s"
    )
    return wall, ops


def main():
    unroll = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    mixes = sys.argv[3].split(",") if len(sys.argv) > 3 else (
        "fma", "i32", "both")
    for mix in mixes:
        # two unrolls: the incremental slope removes the fixed
        # dispatch/DMA overhead -> marginal (true issue-rate) peak
        w1, o1 = run(mix, unroll // 4, reps)
        w2, o2 = run(mix, unroll, reps)
        marginal = (o2 - o1) / (w2 - w1)
        print(f"{mix:4s} marginal issue rate: {marginal/1e12:.3f} Tops/s")


if __name__ == "__main__":
    main()
