#!/bin/bash
# Round-2 TPU measurement agenda — run serially the moment the chip is
# reachable (ONE TPU job at a time; see memory: axon-env-quirks).
# Usage: bash tools/round2_measure.sh [logfile]
# Each step is bounded; a tunnel death mid-run leaves the log readable.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r2_measure.log}
: > "$LOG"
say() { echo "=== $(date +%H:%M:%S) $*" | tee -a "$LOG"; }
run() { local t=$1; shift; say "run: $*"; timeout "$t" "$@" >> "$LOG" 2>&1; say "exit=$?"; }

say "STEP 0: kernel smoke (new code paths must compile + match jnp on chip)"
run 900 python tools/tpu_smoke.py

say "STEP 1: north-star bench (expect ~461.6 + last-bounce spec; auto block rows unchanged at 64 for 240-tri)"
run 700 python bench.py

say "STEP 1b: block-rows/unroll resweep post last-bounce specialization (less live state may shift the 64-row optimum)"
for br in 64 96 32; do
  run 700 env RT_BLOCK_ROWS=$br python bench.py
done
run 700 env RT_DENSE_UNROLL=5 python bench.py
run 700 env RT_NUM=neg python bench.py

say "STEP 1c: RT_KEYCMP=u (unsigned-min scan, -1 op/tri mega, -3 staged; smoke stage 4 must have passed). If it wins, flip the _keycmp_mode default in bounce.py"
run 700 env RT_KEYCMP=u python bench.py
run 700 env RT_KEYCMP=u RT_BLOCK_ROWS=96 python bench.py

say "STEP 2: teapot 6k dense at defaults (auto 32-row blocks; expect ~20.7)"
run 700 python tools/bench_teapot_6k.py

say "STEP 3: teapot 12k dense, auto 16-row blocks (crossover upper point)"
[ -f /tmp/teapot_12k.obj ] || python tools/subdivide_teapot.py /root/reference/obj/teapot.obj /tmp/teapot_12k.obj 12000 >> "$LOG" 2>&1
run 700 env RT_TEAPOT=/tmp/teapot_12k.obj RT_DENSE_MAX_TRIS=16384 \
  python tools/bench_teapot_6k.py

say "STEP 4: time-to-64spp Cornell 512^2 (device-resident accumulation; target <=0.15s)"
run 700 python tools/bench_time_to_64spp.py

say "STEP 5: config-4 phase profile (staged pipeline split)"
run 900 python tools/profile_config4.py

say "STEP 6: config-4 end-to-end wall (512^2 x 64spp; round-1 ref 1.625 Mrays/s segments)"
run 1800 python -m cs397raytracingsp22_tpu.cli scenes/textured_spheres.py \
  -o /tmp/r2_cfg4.png --width 512 --height 512 --spp 64 --stats-json /tmp/r2_cfg4.json
say "cfg4 stats:"; cat /tmp/r2_cfg4.json >> "$LOG" 2>&1

say "STEP 6b: NEE on-chip (compiles + lights every pixel at 8spp; feature gate for --nee)"
run 900 python -m cs397raytracingsp22_tpu.cli scenes/cornell.py --nee \
  -o /tmp/r2_nee.png --width 256 --height 256 --spp 8 --stats-json /tmp/r2_nee.json
run 120 python - <<'EOF'
import numpy as np
from PIL import Image
a = np.asarray(Image.open("/tmp/r2_nee.png"))
frac = (a.sum(-1) > 0).mean()
print("nee nonblack frac", frac, "mean", a.mean())
assert frac > 0.95, "NEE render should light every pixel at 8spp"
EOF

say "STEP 7: artifact diff vs committed golden (parity gate)"
run 700 python - <<'EOF'
import numpy as np
from PIL import Image
import bench
from cs397raytracingsp22_tpu.render.driver import render_to_image
scene = bench.build_bench_scene(512, 512, spp=64, path_depth=8)
img, st = render_to_image(scene, seed=0, verbose=False)
gold = np.asarray(Image.open("artifacts/bench_cornell_teapot_512_tpu.png"))
d = np.abs(img.astype(np.int32) - gold.astype(np.int32))
print("mean|diff|", d.mean(), "frac>0", (d > 0).mean(), "max", d.max())
assert d.mean() < 0.05, "artifact drift!"
EOF

say "STEP 8: config-5 FULL spec re-measure (1024^2 x 1000spp x depth 10; round-1 wall 2387 s pre-retune, target < 600 s)"
run 5400 python tools/make_artifacts.py config5_demo_1024_1000spp_tpu.png

say "DONE — see $LOG"
