"""Native C++ runtime: PNG codec parity vs PIL, batch dataset ingest."""

import numpy as np
import pytest
from PIL import Image

from dream2real_tpu import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library not buildable in this environment")
    return lib


def test_png_decode_rgb(lib, tmp_path, rng):
    img = rng.integers(0, 255, (37, 53, 3), dtype=np.uint8)
    p = str(tmp_path / "a.png")
    Image.fromarray(img).save(p)
    out = native.png_read(p)
    assert out is not None
    np.testing.assert_array_equal(out, img)


def test_png_decode_rgba_and_gray16(lib, tmp_path, rng):
    rgba = rng.integers(0, 255, (16, 24, 4), dtype=np.uint8)
    p1 = str(tmp_path / "rgba.png")
    Image.fromarray(rgba).save(p1)
    np.testing.assert_array_equal(native.png_read(p1), rgba)

    depth = rng.integers(0, 65535, (20, 30), dtype=np.uint16)
    p2 = str(tmp_path / "d16.png")
    Image.fromarray(depth).save(p2)
    out = native.png_read(p2)
    assert out.dtype == np.uint16
    np.testing.assert_array_equal(out, depth)


def test_png_encode_roundtrip(lib, tmp_path, rng):
    for arr in (
        rng.integers(0, 255, (11, 13, 3), dtype=np.uint8),
        rng.integers(0, 255, (9, 7), dtype=np.uint8),
        rng.integers(0, 65535, (12, 8), dtype=np.uint16),
    ):
        p = str(tmp_path / "x.png")
        assert native.png_write(p, arr)
        # Cross-check with PIL's decoder.
        ref = np.asarray(Image.open(p))
        np.testing.assert_array_equal(ref, arr)
        # And with our own decoder.
        np.testing.assert_array_equal(native.png_read(p), arr)


def test_batch_dataset_ingest(lib, tmp_path, rng):
    import os

    d = str(tmp_path)
    os.makedirs(f"{d}/images")
    os.makedirs(f"{d}/depth")
    h, w, n = 18, 26, 3
    rgbs = rng.integers(0, 255, (n, h, w, 3), dtype=np.uint8)
    depths_mm = rng.integers(0, 3000, (n, h, w), dtype=np.uint16)
    for i in range(n):
        Image.fromarray(rgbs[i]).save(f"{d}/images/rgb_{i:04d}.png")
        Image.fromarray(depths_mm[i]).save(f"{d}/depth/depth_{i:04d}.png")
    out = native.load_rgbd_dataset(d, n, h, w)
    assert out is not None
    rgb_out, depth_out = out
    np.testing.assert_array_equal(rgb_out, rgbs)
    np.testing.assert_allclose(depth_out, depths_mm.astype(np.float32) / 1000.0, atol=1e-6)
