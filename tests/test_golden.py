"""Golden-image convergence vs the reference renders.

The reference ships converged 5000-spp PNGs as perceptual goldens
(img/REFERENCE_*.png; "probably won't match precisely", README.md:42-43).
Full-res 5000-spp comparisons run on TPU (PT_TEST_TPU=1 or the bench
driver); the hermetic CPU test renders a low-spp cornell and checks
distance to a downsampled golden with a spp-appropriate threshold.

Measured on TPU (recorded in BENCHMARKS.md):
  cornell 800x800 @5000spp: mean|diff| = 0.0103, RMSE = 0.024
  sphere  800x800 @5000spp: mean|diff| = 0.0020
  (sphere blob matches the analytic pinhole projection exactly;
  the golden's blob is ~2% wider than the exact projection)
"""

import dataclasses
import os

import numpy as np
import pytest

import pathtrace_tpu as pt
from pathtrace_tpu.io.image_io import to_display, to_uint8

GOLDEN = "/root/reference/img/REFERENCE_cornell.5000samp.png"


@pytest.mark.skipif(not os.path.exists(GOLDEN), reason="no golden image")
def test_cornell_low_spp_tracks_golden(cornell_scene):
    from PIL import Image

    res = 100
    spp = 64
    small = dataclasses.replace(cornell_scene, resolution=(res, res))
    accum, _ = pt.pathtrace_batch(small, 1, spp, remat=False)
    img = to_display(np.asarray(accum), res, res, spp)
    ours = to_uint8(img).astype(np.float32) / 255.0

    g = Image.open(GOLDEN).resize((res, res), Image.BILINEAR)
    gold = np.asarray(g, np.float32) / 255.0

    diff = np.abs(ours - gold)
    # 64 spp Monte-Carlo noise at 100x100: generous but directional —
    # catches orientation flips, brightness bugs, wrong walls
    assert diff.mean() < 0.06
    # channel means converge to the golden's
    np.testing.assert_allclose(
        ours.mean(axis=(0, 1)), gold.mean(axis=(0, 1)), atol=0.06
    )
    # red wall left, green wall right (sign structure)
    left = ours[:, : res // 3]
    right = ours[:, -res // 3:]
    assert left[..., 0].mean() > left[..., 1].mean()
    assert right[..., 1].mean() > right[..., 0].mean()
