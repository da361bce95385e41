"""Reference-exactness: JAX compat pipelines vs the NumPy oracle.

BASELINE config 1 demands exact agreement with OptFlowCPU semantics; these
tests pin every stage of models/compat.py against oracle/cpu_reference.py
(bit-exact for the integer stages, tight float tolerance for the solve) and
the full GPU-path pyramid against oracle/gpu_reference.py.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import make_translating_pair
from cuda_optical_flow_2_tpu.constants import DT_3X3, DX_3X3, DY_3X3, GAUS_KERNEL_3X3
from cuda_optical_flow_2_tpu.models import compat
from cuda_optical_flow_2_tpu.oracle import cpu_reference as cpu
from cuda_optical_flow_2_tpu.oracle import gpu_reference as gpu


@pytest.fixture
def img(rng):
    return rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)


@pytest.mark.parametrize("mask", [DX_3X3, DY_3X3, GAUS_KERNEL_3X3], ids=["dx", "dy", "gauss"])
def test_conv_u8_exact(img, mask):
    got = np.asarray(compat.conv_3ch_to_1ch_u8(jnp.asarray(img), mask))
    want = cpu.conv_3ch_to_1ch(img, mask)
    assert np.array_equal(got, want)


@pytest.mark.parametrize("mask", [DX_3X3, DT_3X3], ids=["dx", "dt"])
def test_conv_f32_exact(img, mask):
    got = np.asarray(compat.conv_3ch_1ch_f32(jnp.asarray(img), mask))
    want = gpu.conv_3ch_1ch_float(img, mask)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-3)


def test_downscale_u8_exact(img):
    got = np.asarray(compat.downscale_gaussian_u8(jnp.asarray(img)))
    want = cpu.downscale_gaussian(img, GAUS_KERNEL_3X3)
    assert np.array_equal(got, want)


def test_pyramid_u8_exact(img):
    got = [np.asarray(p) for p in compat.build_pyramid_u8(jnp.asarray(img), 3)]
    want = cpu.gauss_pyramid(img, 3)
    for g, w in zip(got, want):
        assert np.array_equal(g, w)


def test_srm_exact(rng):
    a = rng.integers(0, 256, (20, 24), dtype=np.uint8)
    b = rng.integers(0, 256, (20, 24), dtype=np.uint8)
    got = np.asarray(compat.srm_1ch_i32(jnp.asarray(a), jnp.asarray(b), 9))
    want = cpu.srm_1ch(a, b, 9, 9)
    assert np.array_equal(got, want)


def test_shift_back_exact(rng):
    src = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    flow = [
        np.zeros((16, 16, 2), np.float32),
        (rng.normal(0, 2, (8, 8, 2)).astype(np.float32)),
    ]
    got = np.asarray(
        compat.shift_back_exact(jnp.asarray(src), 0, 2, [jnp.asarray(f) for f in flow])
    )
    want = cpu.shift_back_pyramid(src, 0, 2, flow)
    assert np.array_equal(got, want)


def _epe(a: np.ndarray, b: np.ndarray) -> float:
    # inf/nan-tolerant comparison: identical non-finite patterns, EPE on finite
    fa, fb = np.isfinite(a).all(axis=-1), np.isfinite(b).all(axis=-1)
    assert np.array_equal(fa, fb), "non-finite masks differ"
    d = a[fa] - b[fb]
    if d.size == 0:
        return 0.0
    return float(np.hypot(d[..., 0], d[..., 1]).mean())


def test_cpu_profile_single_level_exact():
    prev, nxt = make_translating_pair(32, 32, dx=1, dy=0)
    got = compat.pyramidal_lk_exact(jnp.asarray(prev), jnp.asarray(nxt), levels=1, profile="cpu")
    want = cpu.calc_optical_flow_pyramid([prev], [nxt], window=9)
    assert _epe(np.asarray(got[0]), want[0]) < 1e-6


def test_cpu_profile_full_pyramid_matches_oracle():
    prev, nxt = make_translating_pair(64, 64, dx=2, dy=1)
    got = compat.pyramidal_lk_exact(jnp.asarray(prev), jnp.asarray(nxt), levels=4, profile="cpu")
    want = cpu.calc_optical_flow_pyramid(
        cpu.gauss_pyramid(prev, 4), cpu.gauss_pyramid(nxt, 4), window=9
    )
    for k in range(4):
        assert _epe(np.asarray(got[k]), want[k]) < 1e-5, f"level {k}"


def test_gpu_profile_full_pyramid_matches_oracle():
    prev, nxt = make_translating_pair(64, 64, dx=1, dy=1)
    got = compat.pyramidal_lk_exact(jnp.asarray(prev), jnp.asarray(nxt), levels=4, profile="gpu")
    want = gpu.calc_opt_flow_pyramid(
        gpu.gauss_pyramid(prev, 4), gpu.gauss_pyramid(nxt, 4), window=19
    )
    for k in range(4):
        g, w = np.asarray(got[k]), want[k]
        fm = np.isfinite(w).all(axis=-1)
        # float window sums accumulate in different orders; fp32 tolerance
        np.testing.assert_allclose(g[fm], w[fm], rtol=2e-3, atol=2e-3)
