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


@pytest.mark.parametrize("weights", ["tri", "gauss"])
def test_fused_weighted_window_matches_xla(rng, weights):
    """Weighted integration windows (LKConfig.window_weights) in the fused
    residual kernel vs the XLA sep-conv taps path."""
    prev, nxt = _pair(rng, 61, 77)
    cfg = of.LKConfig(
        levels=1, window=19, window_weights=weights, use_pallas=False
    )
    want = np.asarray(_lk_residual_xla(prev, nxt, cfg))
    got = np.asarray(lk_fused.lk_residual(prev, nxt, cfg, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("weights", ["tri", "gauss"])
def test_fused_step_weighted_window_matches_xla(rng, weights):
    """Weighted windows through the fully-fused level-step kernel (smooth
    flow so the select-warp's smoothness contract holds)."""
    from cuda_optical_flow_2_tpu.kernels import lk_step_fused
    from cuda_optical_flow_2_tpu.ops.warp import warp_bilinear

    prev, nxt = _pair(rng, 64, 96)
    ys, xs = np.mgrid[0:64, 0:96]
    flow = jnp.asarray(
        np.stack(
            [2.0 + 0.01 * xs - 0.008 * ys, -1.0 + 0.006 * xs + 0.012 * ys], -1
        ),
        jnp.float32,
    )
    cfg = of.LKConfig(
        levels=1, window=19, window_weights=weights, use_pallas=False,
        max_displacement=8, iterations=1,
    )
    fc = jnp.clip(flow, -8, 8)
    want = np.asarray(fc + _lk_residual_xla(prev, warp_bilinear(nxt, fc), cfg))
    got = np.asarray(
        lk_step_fused.lk_level_step(prev, nxt, flow, cfg, interpret=True)
    )
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


def test_full_pipeline_dispatches_pallas(rng, monkeypatch):
    # levels=1: no warp, so the fused-LK dispatch must match XLA exactly even
    # on rough random images (the select-warp's smoothness condition doesn't
    # apply; the warped multi-level case is covered on realistic frames in
    # test_pipeline_with_pallas_warp_matches_xla).
    monkeypatch.setenv("OF2_PALLAS_INTERPRET", "1")
    prev, nxt = _pair(rng, 64, 96)
    cfg_pallas = of.LKConfig(levels=1, window=9, use_pallas=True)
    cfg_xla = of.LKConfig(levels=1, window=9, use_pallas=False)
    got = np.asarray(of.pyramidal_lk(prev, nxt, cfg_pallas))
    want = np.asarray(of.pyramidal_lk(prev, nxt, cfg_xla))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def _smooth_flow(h, w, amp=5.0):
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    return np.stack(
        [
            amp * np.sin(2 * np.pi * ys / 90) + 3.0 * np.cos(2 * np.pi * xs / 120),
            amp * 0.8 * np.cos(2 * np.pi * (xs + ys) / 150),
        ],
        axis=-1,
    ).astype(np.float32)


def test_select_warp_matches_gather_on_smooth_flow(rng):
    from cuda_optical_flow_2_tpu.kernels.warp_select import warp_bilinear_select
    from cuda_optical_flow_2_tpu.ops.warp import warp_bilinear

    img = jnp.asarray(rng.normal(0, 50, (96, 144)).astype(np.float32) + 128)
    flow = jnp.asarray(_smooth_flow(96, 144))
    want = np.asarray(warp_bilinear(img, flow))
    got = np.asarray(warp_bilinear_select(img, flow, 16, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_select_warp_out_of_bounds_keeps_pixels(rng):
    from cuda_optical_flow_2_tpu.kernels.warp_select import warp_bilinear_select
    from cuda_optical_flow_2_tpu.ops.warp import warp_bilinear

    img = jnp.asarray(rng.normal(0, 50, (32, 64)).astype(np.float32))
    flow = jnp.asarray(np.full((32, 64, 2), 7.0, np.float32))
    want = np.asarray(warp_bilinear(img, flow))
    got = np.asarray(warp_bilinear_select(img, flow, 8, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_select_warp_clamps_to_budget(rng):
    from cuda_optical_flow_2_tpu.kernels.warp_select import warp_bilinear_select

    img = jnp.asarray(rng.normal(0, 50, (32, 64)).astype(np.float32))
    flow = jnp.asarray(np.full((32, 64, 2), 100.0, np.float32))  # > budget
    got = np.asarray(warp_bilinear_select(img, flow, 8, interpret=True))
    assert np.isfinite(got).all()


def test_pipeline_with_pallas_warp_matches_xla(rng, monkeypatch):
    monkeypatch.setenv("OF2_PALLAS_INTERPRET", "1")
    from conftest import make_translating_pair

    prev, nxt = make_translating_pair(96, 96, dx=2, dy=1, period=16)
    p = jnp.asarray(prev[..., 0].astype(np.float32))
    n = jnp.asarray(nxt[..., 0].astype(np.float32))
    cfg_pallas = of.LKConfig(levels=3, window=9, iterations=2, use_pallas=True)
    cfg_xla = of.LKConfig(levels=3, window=9, iterations=2, use_pallas=False)
    got = np.asarray(of.pyramidal_lk(p, n, cfg_pallas))
    want = np.asarray(of.pyramidal_lk(p, n, cfg_xla))
    # same algorithm, different warp kernels: flows agree to sub-centipixel
    err = np.abs(got - want)
    assert np.median(err) < 2e-3, np.median(err)
    assert np.percentile(err, 99) < 0.1, np.percentile(err, 99)


def test_random_config_parity_sweep(monkeypatch):
    """Seeded sweep over the LK config space: Pallas (interpret) vs XLA on
    random shapes (incl. odd), windows, temporal kernels, iteration counts
    and normalization — insurance against dispatch/config-space regressions
    a fixed-config test can't see."""
    monkeypatch.setenv("OF2_PALLAS_INTERPRET", "1")
    from cuda_optical_flow_2_tpu.utils import io

    rng_ = np.random.default_rng(7)
    for case in range(4):
        h = int(rng_.integers(48, 96))
        w = int(rng_.integers(56, 112))
        v = (float(rng_.uniform(-2, 2)), float(rng_.uniform(-1.5, 1.5)))
        seq = io.synthetic_sequence(2, h, w, velocity=v, noise=0.0)
        p, n = (jnp.asarray(s, jnp.float32) for s in seq)
        kw = dict(
            levels=int(rng_.integers(1, 3)),
            window=int(rng_.choice([5, 9, 11, 15])),
            iterations=int(rng_.integers(1, 3)),
            temporal_kernel=str(rng_.choice(["dt3", "gauss3"])),
            normalize_gradients=bool(rng_.integers(0, 2)),
            max_displacement=8.0,
        )
        got = np.asarray(of.pyramidal_lk(p, n, of.LKConfig(use_pallas=True, **kw)))
        want = np.asarray(of.pyramidal_lk(p, n, of.LKConfig(use_pallas=False, **kw)))
        err = np.abs(got - want)
        assert np.median(err) < 2e-3, (case, kw, np.median(err))
        assert np.percentile(err, 99) < 0.1, (case, kw, np.percentile(err, 99))

    # one random case per extension family (same insurance, wider surface)
    from cuda_optical_flow_2_tpu.models import (
        FBConfig,
        HSConfig,
        TVL1Config,
        pyramidal_flow,
    )

    h = int(rng_.integers(48, 96))
    w = int(rng_.integers(56, 112))
    seq = io.synthetic_sequence(2, h, w, velocity=(1.5, -1.0), noise=0.0)
    p, n = (jnp.asarray(s, jnp.float32) for s in seq)
    for cfg_t, cfg_x in [
        (HSConfig(levels=2, iterations=int(rng_.integers(8, 20)),
                  use_pallas=True, max_displacement=8),
         None),
        (FBConfig(levels=2, iterations=int(rng_.integers(1, 3)),
                  winsize=int(rng_.choice([9, 11, 15])),
                  use_pallas=True, max_displacement=4),
         None),
        (TVL1Config(levels=2, warps=1, iterations=int(rng_.integers(5, 12)),
                    use_pallas=True, max_displacement=8,
                    median_filtering=5),
         None),
    ]:
        import dataclasses

        cfg_x = dataclasses.replace(cfg_t, use_pallas=False)
        got = np.asarray(pyramidal_flow(p, n, cfg_t))
        want = np.asarray(pyramidal_flow(p, n, cfg_x))
        err = np.abs(got - want)
        assert np.median(err) < 2e-3, (type(cfg_t).__name__, np.median(err))
        assert np.percentile(err, 99) < 0.1, (
            type(cfg_t).__name__, np.percentile(err, 99))


def test_lk_step_fused_matches_xla_composition(rng):
    from cuda_optical_flow_2_tpu.kernels import lk_step_fused
    from cuda_optical_flow_2_tpu.models.lucas_kanade import _lk_residual_xla
    from cuda_optical_flow_2_tpu.ops.warp import warp_bilinear

    for h, w in [(96, 144), (61, 200)]:
        prev = jnp.asarray(rng.normal(0, 50, (h, w)).astype(np.float32) + 128)
        nxt = jnp.asarray(rng.normal(0, 50, (h, w)).astype(np.float32) + 128)
        ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
        flow = jnp.asarray(
            np.stack(
                [4.0 * np.sin(2 * np.pi * ys / 90) + 1.5,
                 3.0 * np.cos(2 * np.pi * (xs + ys) / 150)],
                -1,
            ).astype(np.float32)
        )
        cfg = of.LKConfig(levels=1, window=11, temporal_kernel="gauss3", use_pallas=False)
        want = np.asarray(flow + _lk_residual_xla(prev, warp_bilinear(nxt, flow), cfg))
        got = np.asarray(
            lk_step_fused.lk_level_step(prev, nxt, flow, cfg, interpret=True)
        )
        np.testing.assert_allclose(got, want, atol=1e-4), (h, w)


def test_select_warp_exact_on_large_uniform_flow(rng):
    """A uniform flow near the budget (zero within-tile variation — squarely
    inside the documented exactness condition) must match the gather warp
    bit-for-bit.  Regression: the per-tile recentering mean averaged the
    zero-flow lane/halo padding, biasing (u0, v0) toward zero so the
    +-d_local clamp silently truncated the applied flow (measured max error
    194.6 intensity levels at 28 px)."""
    from cuda_optical_flow_2_tpu.kernels import warp_select
    from cuda_optical_flow_2_tpu.ops.warp import warp_bilinear

    img = jnp.asarray(rng.normal(0, 50, (32, 64)).astype(np.float32) + 128)
    for uv in [(28.0, 0.0), (0.0, 28.0), (-25.0, 19.0)]:
        flow = jnp.asarray(np.full((32, 64, 2), 0.0, np.float32))
        flow = flow.at[..., 0].set(uv[0]).at[..., 1].set(uv[1])
        got = np.asarray(
            warp_select.warp_bilinear_select(
                img, flow, max_displacement=32, interpret=True
            )
        )
        want = np.asarray(warp_bilinear(img, flow))
        np.testing.assert_array_equal(got, want), uv


def test_lk_step_fused_over_budget_flow_matches_twin(rng):
    """Flow beyond max_displacement: the fused kernel must match the
    clip -> warp -> residual twin.  Regression: the out-of-bounds valid mask
    tested the RAW flow while sampling with the clamped flow, keeping the
    unwarped pixel for samples the twin takes in-bounds (0.43 px divergence
    on rows where only the raw target is out of range)."""
    from cuda_optical_flow_2_tpu.kernels import lk_step_fused
    from cuda_optical_flow_2_tpu.models.lucas_kanade import _lk_residual_xla
    from cuda_optical_flow_2_tpu.ops.warp import warp_bilinear

    h, w = 32, 64
    prev = jnp.asarray(rng.normal(0, 50, (h, w)).astype(np.float32) + 128)
    nxt = jnp.asarray(rng.normal(0, 50, (h, w)).astype(np.float32) + 128)
    flow = jnp.asarray(np.full((h, w, 2), 0.0, np.float32)).at[..., 1].set(20.0)
    cfg = of.LKConfig(levels=1, window=9, temporal_kernel="gauss3",
                      use_pallas=False, max_displacement=8.0)
    clipped = jnp.clip(flow, -8.0, 8.0)
    want = np.asarray(
        clipped + _lk_residual_xla(prev, warp_bilinear(nxt, clipped), cfg)
    )
    got = np.asarray(
        lk_step_fused.lk_level_step(prev, nxt, flow, cfg, interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_lk_step_fused_batched(rng):
    from cuda_optical_flow_2_tpu.kernels import lk_step_fused

    prev = jnp.asarray(rng.normal(0, 50, (2, 48, 64)).astype(np.float32))
    nxt = jnp.asarray(rng.normal(0, 50, (2, 48, 64)).astype(np.float32))
    flow = jnp.asarray(np.full((2, 48, 64, 2), 1.5, np.float32))
    cfg = of.LKConfig(levels=1, window=9, use_pallas=False)
    batched = np.asarray(lk_step_fused.lk_level_step(prev, nxt, flow, cfg, interpret=True))
    for b in range(2):
        single = np.asarray(
            lk_step_fused.lk_level_step(prev[b], nxt[b], flow[b], cfg, interpret=True)
        )
        np.testing.assert_allclose(batched[b], single, rtol=1e-6)


def test_pyr_down_pallas_matches_xla(rng):
    from cuda_optical_flow_2_tpu.kernels.pyr_down import pyr_down_pallas
    from cuda_optical_flow_2_tpu.ops.pyramid import pyr_down

    for h, w in [(64, 128), (61, 200)]:
        x = jnp.asarray(rng.normal(0, 50, (h, w)).astype(np.float32))
        want = np.asarray(pyr_down(x, use_pallas=False))
        got = np.asarray(pyr_down_pallas(x, interpret=True))
        np.testing.assert_allclose(got, want, atol=1e-4)


def test_band_step_matches_full_image(rng):
    """lk_band_step on an interior band == lk_level_step rows, bit-exact.

    The band kernel masks/clamps against GLOBAL coordinates (row0, h_global),
    so kept rows (>= halo from the band edge) must match the whole-image
    fused step exactly; per-tile warp recentering differs but only changes
    which candidates are selected, never the selected values.
    """
    from cuda_optical_flow_2_tpu.kernels import lk_step_fused

    h, w = 64, 80
    prev = jnp.asarray(rng.integers(0, 256, (h, w)).astype(np.float32))
    nxt = jnp.asarray(rng.integers(0, 256, (h, w)).astype(np.float32))
    flow = jnp.asarray(rng.normal(0, 1.5, (h, w, 2)).astype(np.float32))
    cfg = of.LKConfig(levels=1, window=9, max_displacement=4.0)
    full = np.asarray(
        lk_step_fused.lk_level_step(prev, nxt, flow, cfg, interpret=True)
    )
    halo = 12  # r_grad + d + 2 = 6 + 4 + 2
    for lo, hi in ((16, 48), (0, 32)):  # interior band + global-edge band
        a, b = max(lo - halo, 0), min(hi + halo, h)
        band = np.asarray(
            lk_step_fused.lk_band_step(
                prev[a:b], nxt[a:b], flow[a:b], a, cfg, h, interpret=True
            )
        )
        np.testing.assert_allclose(
            band[lo - a : hi - a], full[lo:hi], atol=1e-5, rtol=1e-5
        )


def test_bilateral_kernel_matches_xla(rng):
    """Fused bilateral tap kernel (kernels/bilateral_tap.py) == XLA op, incl.
    the band entry with global-coordinate tap masking (VERDICT r1 item 4)."""
    from cuda_optical_flow_2_tpu.kernels import bilateral_tap
    from cuda_optical_flow_2_tpu.ops.bilateral import bilateral_filter

    img = jnp.asarray(rng.integers(0, 256, (64, 80)).astype(np.float32))
    want = np.asarray(bilateral_filter(img, None, 9, 2.0, 10.0))
    got = np.asarray(
        bilateral_tap.bilateral_kernel(img, 9, 2.0, 10.0, interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=1e-4)
    # bands: interior + both global edges; kept rows must match exactly
    h, halo = 64, 5
    for lo, hi in ((16, 48), (0, 32), (32, 64)):
        a, b = max(lo - halo, 0), min(hi + halo, h)
        band = np.asarray(
            bilateral_tap.bilateral_kernel_band(
                img[a:b], a, h, 9, 2.0, 10.0, interpret=True
            )
        )
        np.testing.assert_allclose(
            band[lo - a : hi - a], want[lo:hi], atol=1e-4
        )
    # batched lead dims, non-default window
    imgs = jnp.asarray(rng.integers(0, 256, (3, 40, 48)).astype(np.float32))
    wantb = np.asarray(bilateral_filter(imgs, None, 5, 1.5, 8.0))
    gotb = np.asarray(
        bilateral_tap.bilateral_kernel(imgs, 5, 1.5, 8.0, interpret=True)
    )
    np.testing.assert_allclose(gotb, wantb, atol=1e-4)


def test_prefilter_dispatches_to_kernel(rng, monkeypatch):
    """preprocess routes the prefilter through the Pallas kernel when
    use_pallas is on (interpret mode pins the dispatch path)."""
    monkeypatch.setenv("OF2_PALLAS_INTERPRET", "1")
    import cuda_optical_flow_2_tpu as of
    from cuda_optical_flow_2_tpu.models.lucas_kanade import preprocess

    frame = jnp.asarray(rng.integers(0, 256, (48, 64)).astype(np.float32))
    pf = of.BilateralConfig()
    pal = preprocess(frame, of.LKConfig(levels=2, prefilter=pf, use_pallas=True))
    xla = preprocess(frame, of.LKConfig(levels=2, prefilter=pf, use_pallas=False))
    for a, b in zip(pal, xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_fb_band_step_matches_full_image(rng):
    """fb_band_step on a band == fb_level_step rows (global-coordinate
    masking), incl. global-edge bands."""
    from cuda_optical_flow_2_tpu.kernels import fb_step_fused
    from cuda_optical_flow_2_tpu.models.farneback import FBConfig
    from cuda_optical_flow_2_tpu.ops.poly_exp import poly_expansion

    h, w = 64, 80
    prev = jnp.asarray(rng.integers(0, 256, (h, w)).astype(np.float32))
    nxt = jnp.asarray(rng.integers(0, 256, (h, w)).astype(np.float32))
    flow = jnp.asarray(rng.normal(0, 1.5, (h, w, 2)).astype(np.float32))
    cfg = FBConfig(levels=1, iterations=1, winsize=9, poly_n=5,
                   max_displacement=4)
    exp1 = poly_expansion(prev, cfg.poly_n, cfg.poly_sigma)
    full = np.asarray(
        fb_step_fused.fb_level_step(nxt, exp1, flow, cfg, interpret=True)
    )
    halo = 8 + 4 + 2  # rb(round_up(r_win+r_poly+1, 4)) + d + 2
    for lo, hi in ((24, 48), (0, 32), (32, 64)):
        a, b = max(lo - halo, 0), min(hi + halo, h)
        band = np.asarray(
            fb_step_fused.fb_band_step(
                nxt[a:b], tuple(x[a:b] for x in exp1), flow[a:b], a, cfg, h,
                interpret=True,
            )
        )
        np.testing.assert_allclose(
            band[lo - a : hi - a], full[lo:hi], atol=1e-5
        )


def test_warp_select_band_matches_full_image(rng):
    """warp_bilinear_select_band on a band == the whole-image select warp."""
    from cuda_optical_flow_2_tpu.kernels import warp_select

    h, w = 64, 80
    img = jnp.asarray(rng.integers(0, 256, (h, w)).astype(np.float32))
    flow = jnp.asarray(rng.normal(0, 2.0, (h, w, 2)).astype(np.float32))
    full = np.asarray(
        warp_select.warp_bilinear_select(
            img, flow, max_displacement=4, interpret=True
        )
    )
    halo = 4 + 2
    for lo, hi in ((24, 48), (0, 32), (32, 64)):
        a, b = max(lo - halo, 0), min(hi + halo, h)
        band = np.asarray(
            warp_select.warp_bilinear_select_band(
                img[a:b], flow[a:b], a, h, max_displacement=4, interpret=True
            )
        )
        np.testing.assert_array_equal(band[lo - a : hi - a], full[lo:hi])


def test_warp_select_band_zero_filled_boundary_halo(rng):
    """Boundary shards exactly as production builds them: halo_exchange
    ZERO-FILLS the out-of-image halo rows (parallel/spatial.halo_exchange
    boundary='zero') and row0 goes negative on the top shard.  Regression
    test: those rows must not enter the per-tile recentering mean nor gain
    pseudo-flow from the global border clamp — a uniform in-budget flow was
    recentered wrong on 85% of kept pixels before the fix."""
    from cuda_optical_flow_2_tpu.kernels import warp_select

    h, w = 96, 80
    img = jnp.asarray(rng.integers(0, 256, (h, w)).astype(np.float32))
    uniform = jnp.zeros((h, w, 2), jnp.float32).at[..., 1].set(-7.0)
    random = jnp.asarray(rng.normal(0, 2.0, (h, w, 2)).astype(np.float32))
    r_img = 40  # production: r_out + ceil(max_displacement) + 2
    for flow in (uniform, random):
        full = np.asarray(
            warp_select.warp_bilinear_select(
                img, flow, max_displacement=32, d_local=7, c_max=1,
                interpret=True,
            )
        )
        for lo, hi in ((0, 48), (48, 96), (24, 72)):
            a, b = lo - r_img, hi + r_img
            band_img = np.zeros((b - a, w), np.float32)
            band_flow = np.zeros((b - a, w, 2), np.float32)
            ca, cb = max(a, 0), min(b, h)
            band_img[ca - a : cb - a] = np.asarray(img[ca:cb])
            band_flow[ca - a : cb - a] = np.asarray(flow[ca:cb])
            band = np.asarray(
                warp_select.warp_bilinear_select_band(
                    jnp.asarray(band_img), jnp.asarray(band_flow), a, h,
                    max_displacement=32, d_local=7, c_max=1, interpret=True,
                )
            )
            np.testing.assert_array_equal(
                band[lo - a : hi - a], full[lo:hi]
            )


def test_hs_relax_band_matches_full_image(rng):
    """hs_relax_band on a band == hs_relax rows (global-coordinate zero-pad
    boundary), incl. global-edge bands; caller halo = sweeps + 2."""
    from cuda_optical_flow_2_tpu.kernels import hs_sweep

    h, w = 64, 80
    prev, nxt = _pair(rng, h, w)
    kw = dict(alpha=8.0, temporal_kernel="gauss3", interpret=True)
    full = np.asarray(hs_sweep.hs_relax(prev, nxt, None, iterations=8, **kw))
    rg = 8 + 2
    for lo, hi in ((24, 48), (0, 32), (32, 64)):
        a, b = max(lo - rg, 0), min(hi + rg, h)
        band = np.asarray(
            hs_sweep.hs_relax_band(
                prev[a:b], nxt[a:b], None, a, h, sweeps=8, **kw
            )
        )
        np.testing.assert_array_equal(band[lo - a : hi - a], full[lo:hi])


def test_tvl1_relax_band_matches_full_image(rng):
    """tvl1_relax_band on a band == tvl1_relax rows (global-coordinate
    Neumann boundary), all six carried state planes exact."""
    from cuda_optical_flow_2_tpu.kernels import tvl1_sweep

    h, w = 64, 80
    prev, warped = _pair(rng, h, w)
    flow = jnp.asarray(rng.normal(0, 1.0, (h, w, 2)).astype(np.float32))
    kw = dict(lambda_=0.15, theta=0.3, tau=0.25, eps=1e-6, interpret=True)
    full = np.asarray(
        tvl1_sweep.tvl1_relax(prev, warped, flow, flow, iterations=10, **kw)
    )
    rg = 10 + 2
    for lo, hi in ((24, 48), (0, 32), (32, 64)):
        a, b = max(lo - rg, 0), min(hi + rg, h)
        st = (flow[a:b, :, 0], flow[a:b, :, 1]) + (
            jnp.zeros((b - a, w), jnp.float32),
        ) * 4
        out = tvl1_sweep.tvl1_relax_band(
            prev[a:b], warped[a:b], flow[a:b], st, a, h, iterations=10, **kw
        )
        band = np.stack([np.asarray(out[0]), np.asarray(out[1])], -1)
        np.testing.assert_array_equal(band[lo - a : hi - a], full[lo:hi])


def test_lk_band_step_interior_pad_rows_excluded_from_recentering(rng):
    """Interior-shard band whose LAST tile straddles kept rows and the
    band's own zero-flow jnp.pad rows (their GLOBAL rows are inside the
    image, so the global `inside` mask alone keeps them): the recentering
    mean must exclude them or a large uniform flow is truncated through the
    d_local clamp on kept rows (measured 0.83 px divergence pre-fix).
    w forces a VMEM-budget tile_h that makes the last tile mostly pad."""
    from cuda_optical_flow_2_tpu.kernels import lk_step_fused

    w, h_global, a, hb = 1280, 300, 50, 219
    halo = 8 + 32 + 2  # rw + d + 2 (caller provisioning)
    prev = jnp.asarray(rng.integers(0, 256, (h_global, w)).astype(np.float32))
    nxt = jnp.asarray(rng.integers(0, 256, (h_global, w)).astype(np.float32))
    flow = jnp.zeros((h_global, w, 2), jnp.float32).at[..., 1].set(-32.0)
    cfg = of.LKConfig(
        levels=1, window=9, max_displacement=32, d_local=7, c_max=1
    )
    full = np.asarray(
        lk_step_fused.lk_level_step(prev, nxt, flow, cfg, interpret=True)
    )
    band = np.asarray(
        lk_step_fused.lk_band_step(
            prev[a : a + hb], nxt[a : a + hb], flow[a : a + hb], a, cfg,
            h_global, interpret=True,
        )
    )
    np.testing.assert_array_equal(
        band[halo : hb - halo], full[a + halo : a + hb - halo]
    )


def test_fb_band_step_interior_pad_rows_excluded_from_recentering(rng):
    """Same recentering-bias class for the fused FB band kernel (measured
    1.16 px kept-row divergence pre-fix at this geometry)."""
    from cuda_optical_flow_2_tpu.kernels import fb_step_fused
    from cuda_optical_flow_2_tpu.models.farneback import FBConfig
    from cuda_optical_flow_2_tpu.ops.poly_exp import poly_expansion

    w, h_global, a, hb = 1280, 250, 50, 171
    halo = 8 + 32 + 2  # rb + d + 2
    prev = jnp.asarray(rng.integers(0, 256, (h_global, w)).astype(np.float32))
    nxt = jnp.asarray(rng.integers(0, 256, (h_global, w)).astype(np.float32))
    flow = jnp.zeros((h_global, w, 2), jnp.float32).at[..., 1].set(-32.0)
    cfg = FBConfig(
        levels=1, iterations=1, winsize=9, poly_n=5, max_displacement=32,
        d_local=7, c_max=1,
    )
    exp1 = poly_expansion(prev, cfg.poly_n, cfg.poly_sigma)
    full = np.asarray(
        fb_step_fused.fb_level_step(nxt, exp1, flow, cfg, interpret=True)
    )
    band = np.asarray(
        fb_step_fused.fb_band_step(
            nxt[a : a + hb], tuple(x[a : a + hb] for x in exp1),
            flow[a : a + hb], a, cfg, h_global, interpret=True,
        )
    )
    np.testing.assert_array_equal(
        band[halo : hb - halo], full[a + halo : a + hb - halo]
    )


def test_select_warp_localizes_nonfinite_flow(rng):
    """One NaN flow pixel (legal under det_eps=0.0 reference-parity configs)
    must not corrupt the whole tile: the recentering mean skips non-finite
    entries, and the NaN pixel itself keeps the unwarped value — exactly the
    XLA gather twin's behavior (its valid test fails there)."""
    from cuda_optical_flow_2_tpu.kernels.warp_select import warp_bilinear_select
    from cuda_optical_flow_2_tpu.ops.warp import warp_bilinear

    img = jnp.asarray(rng.normal(0, 50, (96, 144)).astype(np.float32) + 128)
    flow = jnp.asarray(_smooth_flow(96, 144))
    flow = flow.at[10, 12, 1].set(np.nan).at[40, 90, 0].set(np.inf)
    want = np.asarray(warp_bilinear(img, flow))
    got = np.asarray(warp_bilinear_select(img, flow, 16, interpret=True))
    assert np.isfinite(got).all()
    # Damage is LOCALIZED (pre-fix the whole 13824-px tile mis-warped):
    # the inf pixel itself may differ (budget-clamp warps it, the gather
    # twin's raw-flow valid test keeps it unwarped), and same-row pixels
    # within the horizontal select reach of the NaN pixel may pick their
    # row through its zeroed vi — everything else is exact.
    mask = np.ones((96, 144), bool)
    mask[10, :30] = False   # NaN pixel's row within select reach
    mask[40, 90] = False    # the inf pixel
    np.testing.assert_allclose(got[mask], want[mask], atol=1e-3)
    assert np.abs(got - want)[~mask].max() < 255  # bounded, not garbage


def test_relax_kernels_zero_iterations_are_identity(rng):
    """iterations=0 is the identity on the initial flow, not a
    ZeroDivisionError at trace time (divmod by the chunk size)."""
    from cuda_optical_flow_2_tpu.kernels import hs_sweep, tvl1_sweep

    prev, nxt = _pair(rng, 32, 40)
    init = jnp.asarray(rng.normal(0, 1, (32, 40, 2)).astype(np.float32))
    out = np.asarray(hs_sweep.hs_relax(
        prev, nxt, init, iterations=0, alpha=8.0,
        temporal_kernel="gauss3", interpret=True,
    ))
    np.testing.assert_array_equal(out, np.asarray(init))
    out0 = np.asarray(hs_sweep.hs_relax(
        prev, nxt, None, iterations=0, alpha=8.0,
        temporal_kernel="gauss3", interpret=True,
    ))
    assert out0.shape == (32, 40, 2) and (out0 == 0).all()
    tv = np.asarray(tvl1_sweep.tvl1_relax(
        prev, nxt, init, init, iterations=0, lambda_=0.15, theta=0.3,
        tau=0.25, eps=1e-6, interpret=True,
    ))
    np.testing.assert_array_equal(tv, np.asarray(init))


def test_band_geometry_fuzz():
    """Randomized band geometries for the warp-bearing band kernels.

    The recentering-bias class recurred with every NEW band geometry (lane
    padding, boundary halos, interior pad rows); the fixed tests above pin
    the known trigger shapes, this seeded sweep is insurance for unknown
    ones: random image sizes (odd widths force lane padding, heights force
    partial tiles), random interior/boundary/global-edge bands built exactly
    as production halo_exchange does (zero-filled out-of-global rows), and
    near-budget uniform flows with sub-pixel jitter (the silent-truncation
    trigger).  Kept rows must match the unsharded kernel.
    """
    from cuda_optical_flow_2_tpu.kernels import lk_step_fused, warp_select
    from cuda_optical_flow_2_tpu.parallel.spatial import _halo_radius

    rng_ = np.random.default_rng(11)

    def zero_filled(arr, a, b):
        h = arr.shape[0]
        out = np.zeros((b - a,) + arr.shape[1:], np.float32)
        ca, cb = max(a, 0), min(b, h)
        out[ca - a : cb - a] = np.asarray(arr[ca:cb])
        return jnp.asarray(out)

    for case in range(4):
        h = int(rng_.integers(80, 200))
        w = int(rng_.choice([96, 160, 200, 333]))
        window = int(rng_.choice([5, 9, 15]))
        d = int(rng_.choice([8, 32]))
        d_local = int(rng_.choice([5, 7]))
        v = float(rng_.uniform(0.5, 0.95) * d * rng_.choice([-1, 1]))
        prev = jnp.asarray(rng_.integers(0, 256, (h, w)).astype(np.float32))
        nxt = jnp.asarray(rng_.integers(0, 256, (h, w)).astype(np.float32))
        fl = np.zeros((h, w, 2), np.float32)
        fl[..., 1] = v
        fl[..., 0] = rng_.uniform(-0.3, 0.3, (h, w))
        flow = jnp.asarray(fl)
        cfg = of.LKConfig(levels=1, window=window, max_displacement=d,
                          d_local=d_local, c_max=1)
        lo = int(rng_.integers(0, h - 48))
        hi = lo + int(rng_.integers(32, min(97, h - lo + 1)))
        label = (case, h, w, window, d, d_local, v, lo, hi)

        full = np.asarray(
            lk_step_fused.lk_level_step(prev, nxt, flow, cfg, interpret=True)
        )
        _, r_img = _halo_radius(cfg)
        a, b = lo - r_img, hi + r_img
        band = np.asarray(lk_step_fused.lk_band_step(
            zero_filled(prev, a, b), zero_filled(nxt, a, b),
            zero_filled(flow, a, b), a, cfg, h, interpret=True,
        ))
        np.testing.assert_allclose(
            band[lo - a : hi - a], full[lo:hi], atol=1e-5, err_msg=str(label)
        )

        wfull = np.asarray(warp_select.warp_bilinear_select(
            nxt, flow, max_displacement=d, d_local=d_local, c_max=1,
            interpret=True,
        ))
        a, b = lo - (d + 4), hi + (d + 4)
        wband = np.asarray(warp_select.warp_bilinear_select_band(
            zero_filled(nxt, a, b), zero_filled(flow, a, b), a, h,
            max_displacement=d, d_local=d_local, c_max=1, interpret=True,
        ))
        np.testing.assert_allclose(
            wband[lo - a : hi - a], wfull[lo:hi], atol=1e-5,
            err_msg=str(label),
        )


def test_fb_band_geometry_fuzz():
    """Same randomized-band insurance for the fused FB kernel (its in-kernel
    warp was a separate instance of the recentering-bias class)."""
    from cuda_optical_flow_2_tpu.kernels import fb_step_fused
    from cuda_optical_flow_2_tpu.models.farneback import FBConfig
    from cuda_optical_flow_2_tpu.ops.poly_exp import poly_expansion

    rng_ = np.random.default_rng(13)
    for case in range(2):
        h = int(rng_.integers(80, 160))
        w = int(rng_.choice([96, 200, 333]))
        winsize = int(rng_.choice([9, 15]))
        d = int(rng_.choice([4, 16]))
        v = float(rng_.uniform(0.5, 0.95) * d * rng_.choice([-1, 1]))
        prev = jnp.asarray(rng_.integers(0, 256, (h, w)).astype(np.float32))
        nxt = jnp.asarray(rng_.integers(0, 256, (h, w)).astype(np.float32))
        fl = np.zeros((h, w, 2), np.float32)
        fl[..., 1] = v
        fl[..., 0] = rng_.uniform(-0.3, 0.3, (h, w))
        flow = jnp.asarray(fl)
        cfg = FBConfig(levels=1, iterations=1, winsize=winsize, poly_n=5,
                       max_displacement=d)
        exp1 = poly_expansion(prev, cfg.poly_n, cfg.poly_sigma)
        full = np.asarray(
            fb_step_fused.fb_level_step(nxt, exp1, flow, cfg, interpret=True)
        )
        lo = int(rng_.integers(0, h - 48))
        hi = lo + int(rng_.integers(32, min(97, h - lo + 1)))
        r_img = fb_step_fused.band_margin(cfg) + d + 2
        a, b = lo - r_img, hi + r_img

        def zf(arr):
            out = np.zeros((b - a,) + arr.shape[1:], np.float32)
            ca, cb = max(a, 0), min(b, h)
            out[ca - a : cb - a] = np.asarray(arr[ca:cb])
            return jnp.asarray(out)

        band = np.asarray(fb_step_fused.fb_band_step(
            zf(nxt), tuple(zf(x) for x in exp1), zf(flow), a, cfg, h,
            interpret=True,
        ))
        np.testing.assert_allclose(
            band[lo - a : hi - a], full[lo:hi], atol=1e-5,
            err_msg=str((case, h, w, winsize, d, v, lo, hi)),
        )

def test_lk_step_fused_half_upsample_matches_xla_upsample(rng):
    """flow_half: the in-kernel 2x flow upsample (row stack+reshape + lane
    interleave network, kernels/updown.py) is float-exact against
    upsample_flow + the full-res kernel, across tiles and batch."""
    import cuda_optical_flow_2_tpu as of
    from cuda_optical_flow_2_tpu.kernels import lk_step_fused
    from cuda_optical_flow_2_tpu.ops.resize import upsample_flow

    cfg = of.LKConfig(levels=2, window=9, max_displacement=8, d_local=7)
    h, w = 64, 448  # wp = 512: power-of-two lane extent
    prev = jnp.asarray(rng.uniform(0, 255, (2, h, w)).astype(np.float32))
    nxt = jnp.asarray(rng.uniform(0, 255, (2, h, w)).astype(np.float32))
    half = jnp.asarray(
        rng.uniform(-2, 2, (2, h // 2, w // 2, 2)).astype(np.float32)
    )
    got = lk_step_fused.lk_level_step(
        prev, nxt, half, cfg, interpret=True, flow_half=True
    )
    want = lk_step_fused.lk_level_step(
        prev, nxt, upsample_flow(half, (h, w)), cfg, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5
    )
    # non-power-of-two widths are rejected, not silently wrong
    assert not lk_step_fused.supported_half(jnp.zeros((64, 224)), cfg)


def test_interleave_primitives(rng):
    from cuda_optical_flow_2_tpu.kernels import updown

    a = rng.normal(size=(6, 64)).astype(np.float32)
    b = rng.normal(size=(6, 64)).astype(np.float32)
    rows = np.asarray(updown.interleave_rows(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_array_equal(rows[0::2], a)
    np.testing.assert_array_equal(rows[1::2], b)
    lanes = np.asarray(updown.interleave_lanes(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_array_equal(lanes[:, 0::2], a)
    np.testing.assert_array_equal(lanes[:, 1::2], b)
    with pytest.raises(ValueError, match="power-of-two"):
        updown.interleave_lanes(jnp.zeros((4, 48)), jnp.zeros((4, 48)))


def test_mosaic_dispatch_rejects_x64(monkeypatch):
    """x64 sessions must fall back to the XLA twins on TPU backends.

    Under jax_enable_x64, Python-int roll shifts and index-map scalars stage
    as i64, which Mosaic rejects at verification — dispatching the compiled
    kernel would raise deep inside lowering.  supported() must say no up
    front (the suite runs with x64 on, so only the backend needs faking).
    """
    import jax

    from cuda_optical_flow_2_tpu.kernels import lk_fused

    monkeypatch.delenv("OF2_PALLAS_INTERPRET", raising=False)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert jax.config.jax_enable_x64  # conftest turns it on
    assert not lk_fused.mosaic_ok()
    cfg = __import__("cuda_optical_flow_2_tpu").LKConfig(levels=1, window=5)
    assert not lk_fused.supported(jnp.zeros((64, 64), jnp.float32), cfg)
    # interpret mode is x64-clean and stays available
    monkeypatch.setenv("OF2_PALLAS_INTERPRET", "1")
    assert lk_fused.mosaic_ok()
