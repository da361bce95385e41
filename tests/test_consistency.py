"""Forward-backward consistency tests."""

import numpy as np

import jax.numpy as jnp

import cuda_optical_flow_2_tpu as of
from cuda_optical_flow_2_tpu.models import consistency
from cuda_optical_flow_2_tpu.utils import io


def _pair(h, w, dx, dy):
    fr = io.synthetic_sequence(2, h, w, velocity=(dx, dy))
    return (jnp.asarray(fr[0].astype(np.float32)),
            jnp.asarray(fr[1].astype(np.float32)))


def test_cycle_residual_zero_for_exact_inverse():
    h, w = 32, 48
    fw = jnp.full((h, w, 2), 1.5).at[..., 1].set(-0.75)
    bw = -fw
    res = np.asarray(consistency.fb_consistency(fw, bw))
    # interior: residual exactly 0 (uniform fields)
    assert res[4:-4, 4:-4].max() < 1e-5


def test_occlusion_mask_flags_mismatch():
    h, w = 32, 48
    fw = jnp.full((h, w, 2), 2.0)
    bw = -fw
    bad = bw.at[10:20, 10:20].set(5.0)  # inconsistent block
    m = np.asarray(consistency.occlusion_mask(fw, bad))
    assert m[12:16, 12:16].all()
    assert not m[2:6, 30:40].any()


def test_consistent_flow_translating_pair():
    p, n = _pair(96, 128, 2.0, 1.0)
    cfg = of.LKConfig(levels=2, window=11, iterations=2,
                      temporal_kernel="gauss3", use_pallas=False)
    flow, occ = consistency.consistent_flow(p, n, cfg)
    inner = np.asarray(flow)[24:-24, 24:-24]
    m = np.median(inner, axis=(0, 1))
    assert abs(m[0] - 2) < 0.2 and abs(m[1] - 1) < 0.2
    # interior of a clean translation: overwhelmingly consistent
    occ_in = np.asarray(occ)[24:-24, 24:-24]
    assert occ_in.mean() < 0.05
