"""Validate the vectorized NumPy oracle against direct loop transliterations.

The oracle (cuda_optical_flow_2_tpu.oracle.cpu_reference) is vectorized for
speed; these tests pin it, on tiny images, against straight per-pixel Python
transliterations of the reference C++ (cited per function), so any
vectorization mistake is caught against an independently-written twin.
"""

import numpy as np
import pytest

from conftest import make_translating_pair
from cuda_optical_flow_2_tpu.constants import (
    DX_3X3,
    DY_3X3,
    GAUS_KERNEL_3X3,
    generate_gaussian_kernel,
)
from cuda_optical_flow_2_tpu.oracle import cpu_reference as cpu
from cuda_optical_flow_2_tpu.oracle import gpu_reference as gpu


def _c_uchar(x: float) -> int:
    """C (unsigned char)(int) conversion: trunc toward zero then mod 256."""
    return int(np.trunc(x)) % 256


def loop_conv_3ch_to_1ch(src, mask):
    """Direct transliteration of OptFlowCPU.cpp:75-109."""
    h, w = src.shape[:2]
    mh, mw = mask.shape
    hmh, hmw = mh >> 1, mw >> 1
    out = np.zeros((h, w), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            tmp = 0  # C int accumulator
            for i in range(mh):
                for j in range(mw):
                    ty, tx = y - hmh + i, x - hmw + j
                    if 0 <= ty < h and 0 <= tx < w:
                        tmp = int(np.trunc(tmp + float(src[ty, tx, 0]) * float(mask[i, j])))
            out[y, x] = tmp % 256
    return out


def loop_srm_1ch(a, b, ww, wh):
    """Direct transliteration of OptFlowCPU.cpp:162-200."""
    h, w = a.shape
    hww, hwh = ww >> 1, wh >> 1
    out = np.zeros((h, w), dtype=np.int32)
    for i in range(h):
        for j in range(w):
            tmp = 0
            for p in range(wh):
                ty = i - hwh + p
                if ty < 0 or ty >= h:
                    continue
                for q in range(ww):
                    tx = j - hww + q
                    if tx < 0 or tx >= w:
                        continue
                    tmp += int(a[ty, tx]) * int(b[ty, tx])
            out[i, j] = tmp
    return out


def loop_downscale_gaussian(src, mask):
    """Direct transliteration of OptFlowCPU.cpp:112-148."""
    sh, sw = src.shape[:2]
    h, w = sh >> 1, sw >> 1
    mh, mw = mask.shape
    hmh, hmw = mh >> 1, mw >> 1
    out = np.zeros((h, w, 3), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            tmp = np.zeros(3, dtype=np.float32)
            for p in range(mh):
                for q in range(mw):
                    cy = (y << 1) - hmh + p
                    cx = (x << 1) - hmw + q
                    if 0 <= cy < 2 * h and 0 <= cx < 2 * w:
                        tmp = tmp + np.float32(mask[p, q]) * src[cy, cx].astype(
                            np.float32
                        )
            out[y, x] = [(int(np.trunc(v)) % 256) for v in tmp]
    return out


@pytest.fixture
def small_img(rng):
    return rng.integers(0, 256, (12, 16, 3), dtype=np.uint8)


def test_grayscale(small_img):
    got = cpu.grayscale_avg(small_img)
    s = small_img.astype(np.int32)
    want = ((s[..., 0] + s[..., 1] + s[..., 2]) // 3).astype(np.uint8)
    assert np.array_equal(got[..., 0], want)
    assert np.array_equal(got[..., 1], want)
    assert np.array_equal(got[..., 2], want)


@pytest.mark.parametrize("mask", [DX_3X3, DY_3X3, GAUS_KERNEL_3X3], ids=["dx", "dy", "gauss"])
def test_conv_3ch_to_1ch_matches_loop(small_img, mask):
    got = cpu.conv_3ch_to_1ch(small_img, mask)
    want = loop_conv_3ch_to_1ch(small_img, mask)
    assert np.array_equal(got, want)


@pytest.mark.parametrize("window", [3, 9])
def test_srm_matches_loop(rng, window):
    a = rng.integers(0, 256, (10, 13), dtype=np.uint8)
    b = rng.integers(0, 256, (10, 13), dtype=np.uint8)
    got = cpu.srm_1ch(a, b, window, window)
    want = loop_srm_1ch(a, b, window, window)
    assert np.array_equal(got, want)


def test_downscale_matches_loop(rng):
    src = rng.integers(0, 256, (12, 16, 3), dtype=np.uint8)
    got = cpu.downscale_gaussian(src, GAUS_KERNEL_3X3)
    want = loop_downscale_gaussian(src, GAUS_KERNEL_3X3)
    assert np.array_equal(got, want)


def test_sub_arr_wraps():
    a = np.array([5, 0, 255], dtype=np.uint8)
    b = np.array([10, 1, 255], dtype=np.uint8)
    assert np.array_equal(cpu.sub_arr(a, b), np.array([251, 255, 0], dtype=np.uint8))


def test_shift_back_uses_origin_flow_only(rng):
    """The 1>>offset bug: warp shift comes from flow[k][0,0] alone."""
    src = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    levels = 2
    flow = [np.zeros((8, 8, 2), np.float32), np.zeros((4, 4, 2), np.float32)]
    flow[1][:, :] = 99.0  # everywhere large...
    flow[1][0, 0] = [1.0, 0.0]  # ...but only (0,0) matters
    got = cpu.shift_back_pyramid(src, 0, levels, flow)
    want = src.copy()
    want[:, :-2] = src[:, 2:]  # u_total = 2 * 1.0
    assert np.array_equal(got, want)


def test_gaussian_kernel_generator():
    k = generate_gaussian_kernel(2.0, 9)
    assert k.shape == (9, 9)
    assert abs(k.sum() - 1.0) < 1e-12
    assert np.array_equal(k, k.T)
    assert np.array_equal(k, k[::-1, ::-1])
    assert k[4, 4] == k.max()
    # size -1 derives ~2*pi*sigma, bumped to odd (OptFlowUtils.cpp:70-77)
    assert generate_gaussian_kernel(2.0, -1).shape == (13, 13)


def test_gpu_single_level_recovers_translation():
    """GPU-path oracle: single-level LK on a translating texture.

    The reference's unnormalized Dt_3x3 (sum 15, kernels.cpp:20-24) against
    Sobel's gain of 8 biases flow magnitudes by ~15/8 = 1.875 — a property of
    the reference algorithm that the oracle must preserve.  Checked here:
    direction is right and the 1.875-descaled magnitude recovers the shift.
    """
    prev, nxt = make_translating_pair(64, 64, dx=1, dy=0)
    flow = [np.zeros((64, 64, 2), np.float32)]
    gpu.calc_opt_flow(prev, nxt, flow, 0, 1, window=19)
    inner = flow[0][20:-20, 20:-20]
    assert np.isfinite(inner).all()
    u = np.median(inner[..., 0])
    v = np.median(inner[..., 1])
    assert 1.2 < u < 1.9, f"median u {u} (expected ~1.875 * 1.0 biased)"
    assert abs(v) < 0.2, f"median v {v}"
    err = np.hypot(inner[..., 0] / 1.875 - 1.0, inner[..., 1] / 1.875)
    assert np.median(err) < 0.35, f"median descaled EPE {np.median(err)}"


def test_bilateral_close_to_identity_on_flat_image():
    img = np.full((10, 10, 3), 100, dtype=np.uint8)
    out = cpu.bilateral_filter_3ch(img, img, 9, 9, 2.0, 10.0)
    # flat image: weighted average of identical values, trunc -> 99 or 100
    assert np.all((out >= 99) & (out <= 100))


def loop_srm_3ch(arr1, arr2, ww, wh):
    """Direct transliteration of cpu::srm_3ch (OptFlowCPU.cpp:202-238),
    including the `cx > w || cy > h` off-by-one: in-buffer flat reads at
    cx == w wrap to pixel (cy+1, 0); genuinely past-the-end reads -> 0."""
    h, w = arr1.shape[:2]
    f1 = arr1.reshape(-1).astype(np.int64)
    f2 = arr2.reshape(-1).astype(np.int64)
    n = h * w * 3
    out = np.zeros((h, w, 3), np.int64)
    hkw, hkh = ww >> 1, wh >> 1
    for i in range(h):
        for j in range(w):
            for y in range(wh):
                for x in range(ww):
                    cx, cy = j - hkw + x, i - hkh + y
                    if cx < 0 or cy < 0 or cx > w or cy > h:
                        continue
                    pos = cy * w + cx
                    for ch in range(3):
                        if pos * 3 + ch < n:
                            out[i, j, ch] += f1[pos * 3 + ch] * f2[pos * 3 + ch]
    return out.astype(np.int32)


def test_srm_3ch_matches_loop(rng):
    a = rng.integers(0, 256, (7, 6, 3), dtype=np.uint8)
    b = rng.integers(0, 256, (7, 6, 3), dtype=np.uint8)
    got = cpu.srm_3ch(a, b, 3, 3)
    want = loop_srm_3ch(a, b, 3, 3)
    np.testing.assert_array_equal(got, want)


def test_inverse_matrix_int_twin(rng):
    """Int-sum solve (OptFlowCPU.cpp:285-309): formula check + unguarded det."""
    shape = (5, 4)
    ix2 = rng.integers(1, 100, shape).astype(np.int32)
    iy2 = rng.integers(1, 100, shape).astype(np.int32)
    ixiy = rng.integers(-30, 30, shape).astype(np.int32)
    ixit = rng.integers(-50, 50, shape).astype(np.int32)
    iyit = rng.integers(-50, 50, shape).astype(np.int32)
    flow = cpu.inverse_matrix(ix2, iy2, ixiy, ixit, iyit)
    a, b = ix2.astype(np.float64), ixiy.astype(np.float64)
    d = iy2.astype(np.float64)
    det = a * d - b * b
    ok = np.abs(det) > 1e-6
    u = (-d * ixit + b * iyit) / det
    v = (b * ixit - a * iyit) / det
    np.testing.assert_allclose(flow[..., 0][ok], u[ok], rtol=1e-4)
    np.testing.assert_allclose(flow[..., 1][ok], v[ok], rtol=1e-4)
    # det == 0 passes inf/nan through, as in the C code (no guard).
    zero = cpu.inverse_matrix(
        np.ones(shape, np.int32), np.ones(shape, np.int32),
        np.ones(shape, np.int32), np.ones(shape, np.int32),
        np.ones(shape, np.int32),
    )
    assert not np.isfinite(zero).all()


def test_bilateral_rectangular_window_rejected(rng):
    """ww != wh is undefined behavior in the reference (it generates only a
    ww x ww spatial kernel into a ww*wh buffer, OptFlowCPU.cpp:403-404) —
    the oracle rejects it with a precise error instead of crashing or
    silently misweighting taps."""
    import pytest

    src = rng.integers(0, 256, (8, 9, 3), dtype=np.uint8)
    gray = cpu.grayscale_avg(src)
    with pytest.raises(ValueError, match="rectangular"):
        cpu.bilateral_filter_3ch(src, gray, 5, 9, 2.0, 10.0)
