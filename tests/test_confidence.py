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


def test_good_features_finds_corners():
    """good_features lands on the checker corners, respects min_distance and
    the border margin, and its seeds track correctly end to end."""
    import jax
    import jax.numpy as jnp

    from cuda_optical_flow_2_tpu.models import good_features, track_sequence
    from cuda_optical_flow_2_tpu.utils import io

    cfg = of.LKConfig(levels=2, window=9, iterations=2, use_pallas=False)
    # a few isolated bright squares on a dark field: corners are the only
    # high-min-eigenvalue sites
    img = np.zeros((96, 128), np.float32)
    centers = [(30, 40), (30, 90), (70, 64)]
    for cy, cx in centers:
        img[cy - 6 : cy + 6, cx - 6 : cx + 6] = 255.0
    pts, scores = jax.jit(
        lambda f: good_features(f, cfg, 12, min_distance=5)
    )(jnp.asarray(img))
    pts, scores = np.asarray(pts), np.asarray(scores)
    good = pts[scores > 1.0]
    assert 3 <= len(good) <= 12
    # every strong point is within a few px of some square corner
    corners = np.asarray(
        [
            (cx + dx, cy + dy)
            for cy, cx in centers
            for dy in (-6, 5)
            for dx in (-6, 5)
        ],
        np.float32,
    )
    # the window-averaged eigenvalue peaks a few px INSIDE each corner
    for p in good:
        assert np.min(np.hypot(*(corners - p).T)) < 6.0, p
    # min_distance: no two selected points closer than 5 px
    for i in range(len(good)):
        for j in range(i + 1, len(good)):
            assert np.hypot(*(good[i] - good[j])) > 5.0
    # border margin: nothing inside the zero-pad ring
    m = cfg.window // 2 + 2
    assert (good[:, 0] >= m).all() and (good[:, 1] >= m).all()

    # the seeds track: translate the pattern and check the trajectories
    frames = io.synthetic_sequence(3, 96, 128, velocity=(2.0, 1.0), noise=0.0)
    stack = jnp.asarray(np.stack(frames).astype(np.float32))
    seeds, sc = good_features(stack[0], cfg, 8)
    seeds = np.asarray(seeds)[np.asarray(sc) > 1.0]
    pos, alive = track_sequence(stack, jnp.asarray(seeds), cfg)
    np.testing.assert_allclose(
        np.asarray(pos)[-1], seeds + 2 * np.asarray([2.0, 1.0]), atol=0.5
    )
