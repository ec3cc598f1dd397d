"""Microbench: SMEM-scalar Baldwin-Weber scan vs MXU matmul formulation.

256 triangles x 8192-ray blocks x NBLK grid blocks. Both kernels produce
the packed min-key (nearest-hit) per ray; parity is checked on the
winner t decode (approx reciprocal in both).
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

G = 256          # triangles (16-padded)
GSTEP = 64       # tris per matmul group (VMEM pressure)
ROWS, LANES = 64, 128
N = ROWS * LANES # rays per block
NBLK = 64

TMIN = 1e-3


def _consts():
    return (jnp.int32(2147483647), jnp.int32(0x7FFFFFFF),
            jnp.int32(np.float32(1e-4).view(np.int32)))


def bci(x):
    return jax.lax.bitcast_convert_type(x, jnp.int32)


# ---------------- scalar (current) kernel ----------------
def scalar_kernel(bw, ox, oy, oz, dx, dy, dz, key_out):
    INTMAX, ABS_MASK, EPS_BITS = _consts()
    o_x, o_y, o_z = ox[:], oy[:], oz[:]
    d_x, d_y, d_z = dx[:], dy[:], dz[:]
    key = bci(o_x * 0.0 + 1e9)
    widx = (o_x * 0.0).astype(jnp.int32)

    def tri(i, packed):
        key, widx = packed
        b0 = bw[i, 0]; b1 = bw[i, 1]; b2 = bw[i, 2]
        den = b0 * d_x + b1 * d_y + b2 * d_z
        num = bw[i, 3] - (b0 * o_x + b1 * o_y + b2 * o_z)
        t = num * pl.reciprocal(den, approx=True)
        px = o_x + t * d_x; py = o_y + t * d_y; pz = o_z + t * d_z
        u = bw[i, 4] * px + bw[i, 5] * py + bw[i, 6] * pz + bw[i, 7]
        v = bw[i, 8] * px + bw[i, 9] * py + bw[i, 10] * pz + bw[i, 11]
        rej = (bci(u) | bci(v)) | (bci((1.0 - u) - v) | bci(t - TMIN))
        rej = rej | ((bci(den) & ABS_MASK) - EPS_BITS)
        cand = jnp.where(rej < 0, INTMAX, bci(t))
        ok = cand < key
        return jnp.where(ok, cand, key), jnp.where(ok, i, widx)

    def group(s, packed):
        for k in range(16):
            packed = tri(s * 16 + k, packed)
        return packed

    key, widx = jax.lax.fori_loop(0, G // 16, group, (key, widx))
    key_out[:] = key


# ---------------- MXU kernel ----------------
# lhs_o (3G, 4): [ [-b0,-b1,-b2,b3]; [q4..q7]; [q8..q11] ] per group
# lhs_d (3G, 4): [ [b0,b1,b2,0]; [q4,q5,q6,0]; [q8,q9,q10,0] ]
# rhs O4 (4, N): [ox;oy;oz;1], D4 (4, N): [dx;dy;dz;0]
def mxu_kernel(lhs_o, lhs_d, o4, d4, key_out):
    INTMAX, ABS_MASK, EPS_BITS = _consts()
    O4 = o4[:]
    D4 = d4[:]
    key = bci(O4[0:1, :] * 0.0 + 1e9)  # (1, N)

    n_groups = G // GSTEP
    for g in range(n_groups):
        lo = lhs_o[3 * GSTEP * g : 3 * GSTEP * (g + 1), :]
        ld = lhs_d[3 * GSTEP * g : 3 * GSTEP * (g + 1), :]
        MO = jax.lax.dot_general(
            lo, O4, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        MD = jax.lax.dot_general(
            ld, D4, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        num = MO[0:GSTEP, :]
        u0 = MO[GSTEP : 2 * GSTEP, :]
        v0 = MO[2 * GSTEP : 3 * GSTEP, :]
        den = MD[0:GSTEP, :]
        ud = MD[GSTEP : 2 * GSTEP, :]
        vd = MD[2 * GSTEP : 3 * GSTEP, :]
        t = num * pl.reciprocal(den, approx=True)
        u = u0 + t * ud
        v = v0 + t * vd
        rej = (bci(u) | bci(v)) | (bci((1.0 - u) - v) | bci(t - TMIN))
        rej = rej | ((bci(den) & ABS_MASK) - EPS_BITS)
        ridx = jax.lax.broadcasted_iota(jnp.int32, (GSTEP, N), 0) + (g * GSTEP)
        cand = jnp.where(rej < 0, INTMAX, (bci(t) & jnp.int32(-4096)) | ridx)
        gmin = jnp.min(cand, axis=0, keepdims=True)  # (1, N)
        key = jnp.minimum(key, gmin)

    key_out[:] = key


def main():
    rng = np.random.default_rng(0)
    # teapot-scale triangles around origin
    centers = rng.uniform(-1.5, 1.5, (G, 1, 3))
    tris = (centers + rng.uniform(-0.3, 0.3, (G, 3, 3))).astype(np.float32)
    from cs397raytracingsp22_tpu.models.scene import _baldwin_weber_rows
    bw = _baldwin_weber_rows(tris)  # (G, 12)

    o = rng.uniform(-3, 3, (NBLK * N, 3)).astype(np.float32)
    d = rng.normal(size=(NBLK * N, 3)).astype(np.float32)

    # scalar kernel inputs
    planes = [
        jnp.asarray(x).reshape(NBLK * ROWS, LANES)
        for x in (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2])
    ]
    ray_spec = pl.BlockSpec((ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    ishape = jax.ShapeDtypeStruct((NBLK * ROWS, LANES), jnp.int32)

    f_scalar = jax.jit(lambda *a: pl.pallas_call(
        scalar_kernel, grid=(NBLK,), in_specs=[smem] + [ray_spec] * 6,
        out_specs=ray_spec, out_shape=ishape)(*a))

    # MXU kernel inputs
    lhs_o = np.concatenate([
        np.stack([-bw[:, 0], -bw[:, 1], -bw[:, 2], bw[:, 3]], 1).reshape(G // GSTEP, GSTEP, 4),
        np.stack([bw[:, 4], bw[:, 5], bw[:, 6], bw[:, 7]], 1).reshape(G // GSTEP, GSTEP, 4),
        np.stack([bw[:, 8], bw[:, 9], bw[:, 10], bw[:, 11]], 1).reshape(G // GSTEP, GSTEP, 4),
    ], axis=1).reshape(3 * G, 4).astype(np.float32)
    lhs_d = np.concatenate([
        np.stack([bw[:, 0], bw[:, 1], bw[:, 2], 0 * bw[:, 0]], 1).reshape(G // GSTEP, GSTEP, 4),
        np.stack([bw[:, 4], bw[:, 5], bw[:, 6], 0 * bw[:, 0]], 1).reshape(G // GSTEP, GSTEP, 4),
        np.stack([bw[:, 8], bw[:, 9], bw[:, 10], 0 * bw[:, 0]], 1).reshape(G // GSTEP, GSTEP, 4),
    ], axis=1).reshape(3 * G, 4).astype(np.float32)

    o4 = np.concatenate([o.T, np.ones((1, NBLK * N), np.float32)]).astype(np.float32)  # (4, NBLK*N)
    d4 = np.concatenate([d.T, np.zeros((1, NBLK * N), np.float32)]).astype(np.float32)

    o4_spec = pl.BlockSpec((4, N), lambda i: (0, i), memory_space=pltpu.VMEM)
    lhs_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    kshape = jax.ShapeDtypeStruct((1, NBLK * N), jnp.int32)
    kspec = pl.BlockSpec((1, N), lambda i: (0, i), memory_space=pltpu.VMEM)

    f_mxu = jax.jit(lambda *a: pl.pallas_call(
        mxu_kernel, grid=(NBLK,), in_specs=[lhs_spec, lhs_spec, o4_spec, o4_spec],
        out_specs=kspec, out_shape=kshape)(*a))

    ks = f_scalar(jnp.asarray(bw), *planes)
    km = f_mxu(jnp.asarray(lhs_o), jnp.asarray(lhs_d), jnp.asarray(o4), jnp.asarray(d4))
    jax.block_until_ready((ks, km))

    # parity: decode winner t (scalar exact pattern; mxu low 12 bits = idx)
    ts = np.asarray(ks).reshape(-1).view(np.float32)
    tm = (np.asarray(km).reshape(-1) & ~np.int32(4095)).view(np.float32)
    hit_s = ts < 1e8
    hit_m = tm < 1e8
    agree = (hit_s == hit_m).mean()
    rel = np.abs(ts[hit_s & hit_m] - tm[hit_s & hit_m]) / np.maximum(ts[hit_s & hit_m], 1e-6)
    print(f"hit agree: {agree:.5f}; hit frac {hit_s.mean():.3f}; t rel diff p99 {np.percentile(rel, 99):.2e}")

    for name, f, args in [
        ("scalar", f_scalar, (jnp.asarray(bw), *planes)),
        ("mxu   ", f_mxu, (jnp.asarray(lhs_o), jnp.asarray(lhs_d), jnp.asarray(o4), jnp.asarray(d4))),
    ]:
        out = f(*args); jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(10):
            out = f(*args)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / 10
        rate = NBLK * N / dt / 1e6
        print(f"{name}: {dt*1e3:7.2f} ms  {rate:8.1f} Mrays/s over {G} tris  ({rate*G/1e3:.1f} Gtri-tests/s)")


main()
