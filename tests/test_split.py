"""Split megakernel engine (re-densified wavefront of spans).

The reference's stream compaction (README.md:83-86, spec at
src/pathtrace.cu:152-156) recast for the TPU: the trace runs as two
fixed-shape kernel spans with an XLA-level stable live-first gather
between them, and the second span's dead-tail tiles are predicated
off by a scalar tile count.  The contract is BIT-identity with the
monolithic megakernel — same per-lane ops, same per-pixel
accumulation order — so these tests are exact equality, not allclose.
"""

import dataclasses

import numpy as np
import pytest

import pathtrace_tpu as pt
from pathtrace_tpu.ops.pallas.megakernel import (
    pathtrace_batch_pallas, pathtrace_batch_split,
)


def _cmp(scene, split, nee=False, rr=False, spp=2):
    a, ca = pathtrace_batch_pallas(scene, 1, spp, interpret=True,
                                   nee=nee, rr=rr)
    b, cb = pathtrace_batch_split(scene, 1, spp, split=split,
                                  interpret=True, nee=nee, rr=rr)
    assert np.array_equal(np.asarray(a), np.asarray(b))
    assert np.array_equal(np.asarray(ca), np.asarray(cb))
    return np.asarray(b)


@pytest.fixture(scope="module")
def small(cornell_scene):
    return dataclasses.replace(
        cornell_scene, resolution=(32, 32), trace_depth=5
    )


def test_bit_identical_plain(small):
    r = _cmp(small, split=2)
    assert r.sum() > 0


def test_bit_identical_nee(small):
    _cmp(small, split=2, nee=True)


def test_bit_identical_glass():
    sc = pt.load_scene("scenes/cornell_glass.txt")
    sc = dataclasses.replace(sc, resolution=(32, 32), trace_depth=5)
    _cmp(sc, split=2, nee=True)


def test_bit_identical_mesh_bvh():
    sc = pt.load_scene("scenes/cornell_mesh.txt")
    sc = dataclasses.replace(sc, resolution=(32, 32), trace_depth=5)
    _cmp(sc, split=2, nee=True)


def test_split_clamped_to_depth(small):
    """split >= depth degrades to the monolithic kernel, split<=0 too."""
    sc = dataclasses.replace(small, trace_depth=1)
    a, _ = pathtrace_batch_pallas(sc, 1, 1, interpret=True)
    b, _ = pathtrace_batch_split(sc, 1, 1, split=4, interpret=True)
    assert np.array_equal(np.asarray(a), np.asarray(b))


def test_unaligned_pixel_count():
    """Non-TILE-multiple images: padding lanes are never live and
    their pixel ids drop out of the scatter."""
    sc = pt.load_scene("scenes/cornell.txt")
    sc = dataclasses.replace(sc, resolution=(20, 27), trace_depth=4)
    _cmp(sc, split=2, nee=True, spp=1)
