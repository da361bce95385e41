"""Fused Pallas LK kernel vs the XLA ops path (interpreter mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

import cuda_optical_flow_2_tpu as of
from cuda_optical_flow_2_tpu.kernels import lk_fused
from cuda_optical_flow_2_tpu.models.lucas_kanade import _lk_residual_xla


def _pair(rng, h, w):
    prev = jnp.asarray(rng.integers(0, 256, (h, w)).astype(np.float32))
    nxt = jnp.asarray(rng.integers(0, 256, (h, w)).astype(np.float32))
    return prev, nxt


@pytest.mark.parametrize(
    "shape,window,tk,norm",
    [
        ((64, 80), 9, "gauss3", True),
        ((61, 77), 19, "dt3", False),
        ((128, 200), 15, "dt3", True),
        ((40, 640), 31, "dt3", True),
    ],
)
def test_fused_matches_xla(rng, shape, window, tk, norm):
    prev, nxt = _pair(rng, *shape)
    cfg = of.LKConfig(
        levels=1, window=window, temporal_kernel=tk,
        normalize_gradients=norm, use_pallas=False,
    )
    want = np.asarray(_lk_residual_xla(prev, nxt, cfg))
    got = np.asarray(lk_fused.lk_residual(prev, nxt, cfg, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_fused_batched(rng):
    prev, nxt = _pair(rng, 48, 64)
    prev2, nxt2 = _pair(rng, 48, 64)
    cfg = of.LKConfig(levels=1, window=9, use_pallas=False)
    single0 = np.asarray(lk_fused.lk_residual(prev, nxt, cfg, interpret=True))
    single1 = np.asarray(lk_fused.lk_residual(prev2, nxt2, cfg, interpret=True))
    batched = np.asarray(
        lk_fused.lk_residual(
            jnp.stack([prev, prev2]), jnp.stack([nxt, nxt2]), cfg, interpret=True
        )
    )
    np.testing.assert_allclose(batched[0], single0, rtol=1e-6)
    np.testing.assert_allclose(batched[1], single1, rtol=1e-6)


def test_fused_unguarded_solve(rng):
    # det_eps=0 reproduces the reference's raw 1/det (inf/nan pass through)
    prev = jnp.zeros((32, 40), jnp.float32)  # flat image -> det == 0
    nxt = jnp.zeros((32, 40), jnp.float32)
    cfg = of.LKConfig(levels=1, window=9, det_eps=0.0, use_pallas=False)
    got = np.asarray(lk_fused.lk_residual(prev, nxt, cfg, interpret=True))
    assert not np.isfinite(got).all()
    cfg_g = of.LKConfig(levels=1, window=9, det_eps=1e-8, use_pallas=False)
    got_g = np.asarray(lk_fused.lk_residual(prev, nxt, cfg_g, interpret=True))
    assert np.all(got_g == 0.0)


def test_supported_gates_backend(rng):
    prev, _ = _pair(rng, 32, 32)
    # tests force the CPU backend, so the TPU kernel must not claim support
    assert not lk_fused.supported(prev, of.LKConfig(levels=1, window=9))
