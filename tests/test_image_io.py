"""Image output conventions (src/main.cpp:49-70, src/image.cpp:22-45)."""

import numpy as np

from pathtrace_tpu.io import image_io


def test_to_display_mirrors_x_and_divides():
    accum = np.zeros((2 * 3, 3), np.float32)
    accum[0] = [4.0, 0, 0]  # pixel (x=0, y=0)
    img = image_io.to_display(accum, width=3, height=2, samples=4)
    assert img.shape == (2, 3, 3)
    # x-mirror: buffer x=0 lands at saved x = width-1
    np.testing.assert_allclose(img[0, 2], [1.0, 0, 0])
    np.testing.assert_allclose(img[0, 0], 0.0)


def test_to_uint8_clamps_then_scales():
    img = np.asarray([[[-0.5, 0.5, 2.0]]], np.float32)
    u8 = image_io.to_uint8(img)
    assert u8.tolist() == [[[0, 127, 255]]]


def test_png_roundtrip(tmp_path):
    from PIL import Image

    img = np.random.RandomState(0).rand(8, 8, 3).astype(np.float32)
    p = tmp_path / "t.png"
    image_io.save_png(str(p), img)
    back = np.asarray(Image.open(p), dtype=np.float32) / 255.0
    assert np.abs(back - np.clip(img, 0, 1)).max() < 1 / 255.0 + 1e-6


def test_hdr_roundtrip(tmp_path):
    img = np.abs(np.random.RandomState(1).rand(4, 4, 3)).astype(np.float32)
    img[0, 0] = [5.0, 2.0, 0.1]  # HDR value beyond 1
    p = tmp_path / "t.hdr"
    image_io.save_hdr(str(p), img)
    # decode Radiance RGBE independently (flat runs, no RLE)
    raw = p.read_bytes()
    header, _, body = raw.partition(b"\n\n")
    assert b"32-bit_rle_rgbe" in header
    dims, _, pix = body.partition(b"\n")
    assert dims == b"-Y 4 +X 4"
    rgbe = np.frombuffer(pix, dtype=np.uint8).reshape(4, 4, 4)
    exp = rgbe[..., 3].astype(np.int32) - 128
    scale = np.where(rgbe[..., 3] > 0, np.ldexp(1.0, exp - 8), 0.0)
    back = rgbe[..., :3].astype(np.float32) * scale[..., None]
    np.testing.assert_allclose(back, img, rtol=0.01, atol=0.01)


def test_filename_convention():
    fn = image_io.render_filename("cornell", "2026-01-01_00-00-00z", 5000)
    assert fn == "cornell.2026-01-01_00-00-00z.5000samp.png"
