"""Tests for the repo tools (checkpoint preview)."""

import importlib.util
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_preview_checkpoint_roundtrip(tmp_path):
    """tools/preview_checkpoint.py tonemaps a driver checkpoint into a
    PNG of the right shape using the committed tonemap pipeline."""
    ck = str(tmp_path / "ck.npz")
    accum = np.random.default_rng(0).uniform(0, 4, (64 * 48, 3))
    np.savez(ck, accum=accum, spp_done=np.int64(4), seed=np.int64(0))
    out = str(tmp_path / "out.png")

    pc = _load(os.path.join(REPO, "tools", "preview_checkpoint.py"), "pc")
    assert pc.main(["preview", ck, out, "64", "48"]) == 0

    from PIL import Image

    img = np.asarray(Image.open(out))
    assert img.shape == (48, 64, 3)
    assert img.dtype == np.uint8

    # wrong resolution is rejected, not mis-reshaped
    assert pc.main(["preview", ck, out, "32", "32"]) == 1
