"""Horn-Schunck model family (extension beyond the reference)."""

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import make_translating_pair
from cuda_optical_flow_2_tpu.models import horn_schunck as hs
from cuda_optical_flow_2_tpu.utils import io


def _pair(h, w, vx, vy):
    fr = io.synthetic_sequence(2, h, w, velocity=(vx, vy), period=24)
    return (
        jnp.asarray(fr[0].astype(np.float32)),
        jnp.asarray(fr[1].astype(np.float32)),
    )


def test_single_scale_recovers_subpixel_translation():
    p, n = _pair(96, 128, 0.7, 0.4)
    cfg = hs.HSConfig(alpha=8.0, iterations=200, levels=1)
    flow = np.asarray(hs.horn_schunck(p, n, cfg))
    inner = flow[16:-16, 16:-16]
    assert abs(np.median(inner[..., 0]) - 0.7) < 0.15
    assert abs(np.median(inner[..., 1]) - 0.4) < 0.15


def test_pyramidal_recovers_large_translation():
    p, n = _pair(128, 160, 3.0, 2.0)
    cfg = hs.HSConfig(alpha=8.0, iterations=120, levels=3)
    flow = np.asarray(hs.pyramidal_hs_jit(p, n, cfg))
    inner = flow[24:-24, 24:-24]
    epe = np.hypot(inner[..., 0] - 3.0, inner[..., 1] - 2.0)
    assert epe.mean() < 0.35, epe.mean()


def test_fills_textureless_regions():
    """Where LK's structure tensor is singular, HS propagates flow inward."""
    p, n = _pair(96, 128, 1.0, 0.0)
    # flatten a textureless hole in both frames
    p = p.at[40:56, 50:80].set(127.0)
    n = n.at[40:56, 50:80].set(127.0)
    cfg = hs.HSConfig(alpha=10.0, iterations=300, levels=1)
    flow = np.asarray(hs.horn_schunck(p, n, cfg))
    hole = flow[46:50, 60:70]
    assert abs(np.median(hole[..., 0]) - 1.0) < 0.3, np.median(hole[..., 0])


def test_batched_and_config_validation():
    p, n = _pair(64, 64, 1.0, 0.0)
    pb = jnp.stack([p, p])
    nb = jnp.stack([n, n])
    cfg = hs.HSConfig(alpha=8.0, iterations=50, levels=2)
    flow = hs.pyramidal_hs(pb, nb, cfg)
    assert flow.shape == (2, 64, 64, 2)
    with pytest.raises(ValueError):
        hs.HSConfig(alpha=0.0)
