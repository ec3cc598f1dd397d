"""Regenerate the committed render artifacts from current code.

One deterministic recipe per artifact (scene builder, resolution, spp,
seed) so `artifacts/` can always be reproduced and diffed against a
fresh render — images are bit-reproducible for a fixed code version
(content-keyed Threefry RNG).

Usage: python tools/make_artifacts.py [name ...]   (default: all)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RECIPES = {
    # name: (scene module, builder, kwargs)
    "config1_cornell_tpu.png": ("scenes.cornell", "build", dict(width=256, height=256, spp=16)),
    "config2_teapot_phong_tpu.png": ("scenes.teapot", "build", dict(width=256, height=256)),
    "config3_metal_glass_tpu.png": ("scenes.cornell", "build_config3", dict(width=256, height=256, spp=64)),
    "config4_textured_tpu.png": ("scenes.textured_spheres", "build", dict(width=256, height=256, spp=32)),
    "config5_demo_tpu.png": ("scenes.drone_demo", "build", dict(width=128, height=128, spp=16)),
    "bench_cornell_teapot_512_tpu.png": ("bench", "build_bench_scene", dict(width=512, height=512, spp=64)),
}


def main(argv):
    import importlib

    from cs397raytracingsp22_tpu.render.driver import render_to_image, save_png

    names = argv[1:] or list(RECIPES)
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "artifacts")
    for name in names:
        mod_name, fn_name, kwargs = RECIPES[name]
        scene = getattr(importlib.import_module(mod_name), fn_name)(**kwargs)
        t0 = time.time()
        img, stats = render_to_image(scene, seed=0, verbose=False)
        save_png(img, os.path.join(out_dir, name))
        print(f"{name}: {stats.summary()}")


if __name__ == "__main__":
    main(sys.argv)
