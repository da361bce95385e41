"""Structure-tensor confidence tests."""

import numpy as np

import jax.numpy as jnp

import cuda_optical_flow_2_tpu as of
from cuda_optical_flow_2_tpu.models import confidence


def test_min_eigenvalue_flat_vs_textured():
    rng = np.random.default_rng(0)
    h, w = 64, 96
    frame = np.zeros((h, w), np.float32)
    frame[:, w // 2:] = rng.integers(0, 256, (h, w // 2)).astype(np.float32)
    lam = np.asarray(confidence.min_eigenvalue(
        jnp.asarray(frame), of.LKConfig(window=9)))
    flat = lam[8:-8, 8 : w // 2 - 12]
    tex = lam[8:-8, w // 2 + 12 : -8]
    assert flat.max() < 1e-3
    assert tex.min() > 10.0


def test_min_eigenvalue_aperture_edge():
    """A single vertical edge: gradient energy but rank-1 tensor -> small
    lambda_min relative to lambda_max."""
    h, w = 64, 96
    xs = np.arange(w, dtype=np.float32)
    frame = np.broadcast_to(np.clip((xs - w / 2) * 20, 0, 255), (h, w)).copy()
    cfg = of.LKConfig(window=9)
    lam = np.asarray(confidence.min_eigenvalue(jnp.asarray(frame), cfg))
    # on the ramp edge region, lambda_min stays ~0 (aperture problem)
    assert lam[20:-20, 20:-20].max() < 1e-2


def test_confidence_mask_threshold():
    rng = np.random.default_rng(1)
    frame = rng.integers(0, 256, (48, 64)).astype(np.float32)
    m = np.asarray(confidence.confidence_mask(
        jnp.asarray(frame), of.LKConfig(window=9), threshold=1.0))
    assert m[8:-8, 8:-8].mean() > 0.9
