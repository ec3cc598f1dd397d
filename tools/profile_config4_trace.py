"""Device-trace attribution of the config-4 STATIC fused chunk.

Compiles ONE path_trace_static program for the 262144-ray config-4
chunk (width schedule hardcoded from the measured live counts so the
shrink-phase compiles are skipped), times it, then captures a
jax.profiler trace and prints the device-time split by op — the
wall-time attribution (sort / piece kernels / winner resolve gathers /
BSDF) VERDICT round-3 asked for, measured INSIDE the fused program
where eager per-stage timing would be ~25 ms-RTT-floored.

Run on TPU:  python tools/profile_config4_trace.py [n_log2]
Knobs (fresh process each): RT_VIS_BITS, RT_SORT, RT_BIG_ROWS.
"""

import collections
import glob
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from scenes import textured_spheres
from cs397raytracingsp22_tpu.render import integrator
from cs397raytracingsp22_tpu.utils import threefry

# measured on the default chunk (tools/profile_config4_static.py):
# live = [130305, 40312, 22640, 10082, 6626, 3974, 2910, 2023]
WIDTHS_18 = (262144, 262144, 65536, 65536, 16384, 16384, 8192, 8192)


def main():
    nlog = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    n = 1 << nlog
    shift = 18 - nlog
    widths = tuple(max(w >> shift, 4096) for w in WIDTHS_18)
    widths = (n,) + tuple(min(w, n) for w in widths[1:])
    scene = textured_spheres.build(width=512, height=512, spp=64)
    data = scene.compile()
    cam = scene.camera
    key = threefry.key_words(0)
    ids = jnp.arange(n, dtype=jnp.int32) % (512 * 512)
    o, d = cam.generate_rays(key, ids, spp=1, sample_offset=jnp.int32(0))
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)

    f = lambda: integrator.path_trace_static(
        data, o, d, ids, key, cam.path_depth, cam.max_trace_dist, widths
    )
    t0 = time.perf_counter()
    out = f()
    jax.block_until_ready(out)
    print(f"compile+first: {time.perf_counter()-t0:.1f} s", flush=True)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        rad, segs, ok = f()
    jax.block_until_ready(rad)
    wall = (time.perf_counter() - t0) / reps
    segs = float(segs)
    print(
        f"static fused: {wall*1e3:7.1f} ms  {segs/1e6:.3f}M live segs  "
        f"-> {segs/wall/1e6:.2f} Mrays/s  ok={bool(ok)}",
        flush=True,
    )

    tdir = tempfile.mkdtemp(prefix="p4trace_")
    with jax.profiler.trace(tdir):
        rad, _, _ = f()
        jax.block_until_ready(rad)

    files = glob.glob(os.path.join(tdir, "**", "*.xplane.pb"), recursive=True)
    if not files:
        print(f"no xplane files under {tdir}", flush=True)
        return
    from jax.profiler import ProfileData

    data_p = ProfileData.from_file(files[0])
    bucket = collections.Counter()
    total = 0.0
    for plane in data_p.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        for line in plane.lines:
            lname = line.name.lower()
            if "step" in lname:
                continue
            for ev in line.events:
                dur = ev.duration_ns / 1e6
                name = ev.name
                bucket[name] += dur
                total += dur
    print(f"\ndevice op time total {total:.1f} ms (plane sum)")
    for name, ms in bucket.most_common(30):
        print(f"  {ms:8.2f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
