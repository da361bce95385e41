"""PNG IO: pure-Python decoder vs libpng (via cv2), KITTI artifact bytes."""

import numpy as np
import pytest

from cuda_optical_flow_2_tpu.utils import io

cv2 = pytest.importorskip("cv2")


def _pure_decode(path):
    """Bypass the cv2 fast path to exercise the pure-Python filters."""
    real = io._read_png_cv2
    io._read_png_cv2 = lambda p: None
    try:
        return io._read_png(path)
    finally:
        io._read_png_cv2 = real


@pytest.mark.parametrize("depth", [np.uint8, np.uint16])
@pytest.mark.parametrize("channels", [1, 3])
def test_pure_decoder_matches_libpng(tmp_path, rng, depth, channels):
    """cv2.imwrite uses libpng with adaptive per-row filters (sub/up/avg/
    paeth) — the pure decoder must reconstruct the identical samples."""
    h, w = 57, 83
    hi = 256 if depth == np.uint8 else 65536
    # Smooth gradient + noise so libpng actually picks predictive filters.
    yy, xx = np.mgrid[:h, :w]
    base = (yy * 7 + xx * 3) % hi
    img = ((base + rng.integers(0, hi // 8, (h, w))) % hi).astype(depth)
    if channels == 3:
        i64 = img.astype(np.int64)
        img = np.stack([i64, i64 // 2, (i64 * 3) % hi], axis=-1).astype(depth)
    path = str(tmp_path / "t.png")
    bgr = img if channels == 1 else img[..., ::-1]
    assert cv2.imwrite(path, bgr)

    pure = _pure_decode(path)
    fast = io._read_png(path)
    np.testing.assert_array_equal(pure, img)
    np.testing.assert_array_equal(fast, img)


def test_flow_png_invalid_pixels_zeroed(tmp_path):
    """KITTI devkit writes literal (0,0,0) at unknown pixels (ADVICE r2)."""
    flow = np.ones((8, 10, 2), np.float32)
    valid = np.ones((8, 10), bool)
    valid[2, 3] = False
    path = str(tmp_path / "f.png")
    io.write_flow_png(path, flow, valid)
    raw = _pure_decode(path)
    assert raw.dtype == np.uint16
    assert tuple(raw[2, 3]) == (0, 0, 0)
    assert tuple(raw[0, 0]) == (64 + 32768, 64 + 32768, 1)
    back = io.read_flow_png(path)
    assert np.isnan(back[2, 3]).all()
    np.testing.assert_allclose(back[0, 0], [1.0, 1.0])


def test_flow_png_saturation_warns(tmp_path):
    flow = np.zeros((4, 4, 2), np.float32)
    flow[0, 0, 0] = 600.0  # beyond the ~511.98 px representable range
    with pytest.warns(RuntimeWarning, match="KITTI PNG range"):
        io.write_flow_png(str(tmp_path / "f.png"), flow)
