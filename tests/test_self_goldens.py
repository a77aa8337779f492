"""Regression goldens for the extended scenes (no reference golden
exists for glass/checker) — 4000-spp TPU renders at 100x100 committed
as assets; low-spp CPU renders must track them.  Guards transport
regressions like the refraction stuck-ray bug."""

import dataclasses
import os

import numpy as np
import pytest

import pathtrace_tpu as pt
from pathtrace_tpu.io.image_io import to_display

HERE = os.path.dirname(os.path.abspath(__file__))


@pytest.mark.parametrize("name,spp,tol", [
    ("cornell_glass", 48, 0.085),
    ("cornell_checker", 48, 0.085),
])
def test_tracks_self_golden(name, spp, tol):
    from PIL import Image

    golden_path = os.path.join(HERE, "goldens", f"{name}_100.png")
    if not os.path.exists(golden_path):
        pytest.skip("golden asset not generated")
    gold = np.asarray(Image.open(golden_path), np.float32) / 255.0

    scene = dataclasses.replace(
        pt.load_scene(os.path.join(HERE, "..", "scenes", f"{name}.txt")),
        resolution=(100, 100),
    )
    acc, _ = pt.pathtrace_batch(scene, 1, spp, remat=False)
    img = np.clip(
        to_display(np.asarray(acc), 100, 100, spp), 0, 1
    )
    diff = np.abs(img - gold)
    assert diff.mean() < tol, f"{name}: mean|diff|={diff.mean():.4f}"
    np.testing.assert_allclose(
        img.mean(axis=(0, 1)), gold.mean(axis=(0, 1)), atol=0.05
    )
