"""Native ingestion runtime (ctypes) vs oracle/NumPy fallbacks."""

import numpy as np
import pytest

from cuda_optical_flow_2_tpu.oracle import cpu_reference as cpu
from cuda_optical_flow_2_tpu.utils import io as uio
from cuda_optical_flow_2_tpu.utils import native


needs_native = pytest.mark.skipif(
    not (native.available() or native.build()), reason="native toolchain missing"
)


@needs_native
def test_gray_u8_matches_oracle(rng):
    rgb = rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)
    assert np.array_equal(native.gray_u8(rgb), cpu.grayscale_avg(rgb)[..., 0])


@needs_native
def test_gray_f32_matches_mean(rng):
    rgb = rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)
    want = rgb.astype(np.float32).mean(-1)
    np.testing.assert_allclose(native.gray_f32(rgb), want, atol=5e-5)


@needs_native
def test_synthetic_matches_python():
    want = uio.synthetic_sequence(4, 48, 64, velocity=(2.0, 1.0), noise=0)[3]
    got = native.synthetic_frame(3, 48, 64, 2.0, 1.0)
    assert np.array_equal(got, want)


def test_fallbacks_without_native(rng, monkeypatch):
    monkeypatch.setattr(native, "_try_load", lambda: None)
    rgb = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    assert np.array_equal(native.gray_u8(rgb), cpu.grayscale_avg(rgb)[..., 0])
    np.testing.assert_allclose(
        native.gray_f32(rgb), rgb.astype(np.float32).mean(-1), atol=5e-5
    )
    want = uio.synthetic_sequence(2, 24, 32, velocity=(1.0, 0.0), noise=0)[1]
    assert np.array_equal(native.synthetic_frame(1, 24, 32, 1.0, 0.0), want)
