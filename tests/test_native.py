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


def test_frame_stream_synthetic_matches_direct():
    from cuda_optical_flow_2_tpu.utils import io
    from cuda_optical_flow_2_tpu.utils.native import FrameStream

    frames = io.synthetic_sequence(5, 24, 32, velocity=(2.0, 1.0), noise=0.0)
    got = []
    with FrameStream.synthetic(5, 24, 32, vx=2.0, vy=1.0) as src:
        for t, frame in src:
            assert frame.shape == (24, 32) and frame.dtype == np.float32
            got.append((t, frame))
    assert [t for t, _ in got] == [0, 1, 2, 3, 4]
    for t, frame in got:
        np.testing.assert_allclose(frame, frames[t].astype(np.float32))


def test_frame_stream_ppm(tmp_path):
    from cuda_optical_flow_2_tpu.utils import io
    from cuda_optical_flow_2_tpu.utils.native import FrameStream, gray_f32

    rng = np.random.default_rng(3)
    paths = []
    imgs = []
    for t in range(3):
        img = rng.integers(0, 256, (16, 20, 3), dtype=np.uint8)
        path = str(tmp_path / f"f{t}.ppm")
        io.write_ppm(path, img)
        paths.append(path)
        imgs.append(img)
    with FrameStream.from_ppm(paths, prefetch=2) as src:
        assert (src.h, src.w, src.nframes) == (16, 20, 3)
        for t, frame in src:
            np.testing.assert_allclose(frame, gray_f32(imgs[t]), atol=1e-5)


def test_frame_stream_early_close():
    from cuda_optical_flow_2_tpu.utils.native import FrameStream

    src = FrameStream.synthetic(100, 64, 64, vx=1.0, vy=0.0, prefetch=2)
    next(src)
    src.close()  # must not deadlock or leak the worker


def test_frame_stream_python_fallback(monkeypatch):
    """FrameStream must yield identical frames with the native lib disabled."""
    from cuda_optical_flow_2_tpu.utils import native as nat

    with nat.FrameStream.synthetic(3, 24, 32, vx=2.0, vy=1.0) as src:
        native_frames = [f for _, f in src]
    monkeypatch.setattr(nat, "_lib", None)
    monkeypatch.setattr(nat, "_load_attempted", True)
    with nat.FrameStream.synthetic(3, 24, 32, vx=2.0, vy=1.0) as src:
        fallback_frames = [f for _, f in src]
    assert len(fallback_frames) == 3
    for a, b in zip(native_frames, fallback_frames):
        np.testing.assert_allclose(a, b)
