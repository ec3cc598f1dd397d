"""Wall-time attribution of the mega-bounce kernel's sections on chip.

Runs the official north-star dispatch (bench.py scene, full-image chunk)
with each RT_PROBE section knockout (ops/pallas/bounce.py::_probe) in its
own subprocess and reports the WALL TIME per dispatch — not Mrays/s,
because knocking a section out changes which rays survive and would
contaminate a segments-normalized rate. The wall delta vs base is the
section's true cycle cost, including multi-cycle ops (divide, sqrt,
exp/log/sin/cos) that jaxpr eq counts bill as one.

Usage:
  python tools/bounce_cost_probe.py            # run all modes, print table
  python tools/bounce_cost_probe.py --one M    # measure one mode (internal)
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODES = [
    ("base", ""),
    ("rng", "rng"),
    ("ball", "ball"),
    ("mresolve", "mresolve"),
    ("mres_t", "mres_t"),
    ("mres_uv", "mres_uv"),
    ("mres_nrm", "mres_nrm"),
    ("ana_res", "ana_res"),
    ("nobsdf", "nobsdf"),
    ("noanalytic", "noanalytic"),
    ("noscan", "noscan"),
    ("recip1", ""),  # RT_RECIP=1: Newton step in the scan
]


def measure_one():
    import jax
    import jax.numpy as jnp

    from bench import build_bench_scene
    from cs397raytracingsp22_tpu.render.driver import render_chunk
    from cs397raytracingsp22_tpu.utils import threefry

    spp = 64
    width = 512
    scene = build_bench_scene(width, width, spp=spp)
    data = scene.compile()
    cam = scene.camera
    n_px = width * width
    chunk_px = min(n_px, max(1, (1 << 24) // spp))
    ids = jnp.arange(chunk_px, dtype=jnp.int32)
    key = threefry.key_words(0)

    rad, segs = render_chunk(data, cam, ids, key, jnp.int32(0), spp, 1)
    jax.block_until_ready(rad)
    reps = 4
    t0 = time.perf_counter()
    out = []
    for _ in range(reps):
        rad, segs = render_chunk(data, cam, ids, key, jnp.int32(0), spp, 1)
        out.append(segs)
    jax.block_until_ready(out)
    wall = (time.perf_counter() - t0) / reps
    print(json.dumps({"wall_s": wall, "segs": float(out[0])}), flush=True)


def main():
    if "--one" in sys.argv:
        measure_one()
        return
    # optional positional args: subset of mode names to run (base is
    # always run first for the delta)
    want = [a for a in sys.argv[1:] if not a.startswith("-")]
    modes = MODES
    if want:
        modes = [("base", "")] + [m for m in MODES if m[0] in want and m[0] != "base"]
    results = {}
    for name, probe in modes:
        env = dict(os.environ)
        env["RT_PROBE"] = probe
        if name == "recip1":
            env["RT_RECIP"] = "1"
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", name],
            env=env, capture_output=True, text=True, timeout=900,
        )
        line = [l for l in r.stdout.splitlines() if l.startswith("{")]
        if not line:
            print(f"{name:12s} FAILED: {r.stderr[-500:]}")
            continue
        d = json.loads(line[-1])
        results[name] = d
        base = results.get("base", d)["wall_s"]
        dmsg = (f"  delta vs base: {(d['wall_s']-base)*1e3:+7.1f} ms "
                f"({(d['wall_s']-base)/base*100:+5.1f}%)" if name != "base" else "")
        print(f"{name:12s} wall/dispatch = {d['wall_s']*1e3:8.1f} ms  "
              f"segs={d['segs']/1e6:6.1f}M{dmsg}", flush=True)


if __name__ == "__main__":
    main()
