"""Farnebäck model family (extension): polynomial expansion + displacement."""

import numpy as np
import pytest

import jax.numpy as jnp

from cuda_optical_flow_2_tpu.models import farneback as fb
from cuda_optical_flow_2_tpu.ops import poly_exp
from cuda_optical_flow_2_tpu.utils import io


def _pair(h, w, vx, vy, n_frames=2):
    fr = io.synthetic_sequence(n_frames, h, w, velocity=(vx, vy), period=24)
    return (
        jnp.asarray(fr[0].astype(np.float32)),
        jnp.asarray(fr[1].astype(np.float32)),
    )


def _poly_exp_oracle(f: np.ndarray, n: int, sigma: float):
    """Direct per-pixel weighted least squares on the zero-padded image."""
    g = poly_exp.gaussian_1d(n, sigma)
    r = n // 2
    o = np.arange(n) - r
    yy, xx = np.meshgrid(o, o, indexing="ij")
    w = np.outer(g, g)
    basis = np.stack(
        [np.ones_like(xx), xx, yy, xx * xx, yy * yy, xx * yy], axis=-1
    ).astype(np.float64)
    G = np.einsum("yx,yxk,yxl->kl", w, basis, basis)
    Ginv = np.linalg.inv(G)
    h_, w_ = f.shape
    fp = np.zeros((h_ + 2 * r, w_ + 2 * r), np.float64)
    fp[r : r + h_, r : r + w_] = f
    out = np.zeros((h_, w_, 5), np.float64)
    for i in range(h_):
        for j in range(w_):
            patch = fp[i : i + n, j : j + n]
            v = np.einsum("yx,yxk->k", w * patch, basis)
            rcoef = Ginv @ v
            out[i, j] = [rcoef[1], rcoef[2], rcoef[3], rcoef[4], rcoef[5] / 2]
    return out


def test_poly_expansion_matches_direct_lsq(rng):
    f = rng.integers(0, 256, (20, 24)).astype(np.float32)
    want = _poly_exp_oracle(f, 5, 1.1)
    got = np.stack(
        [np.asarray(p) for p in poly_exp.poly_expansion(jnp.asarray(f), 5, 1.1)],
        axis=-1,
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_poly_expansion_recovers_exact_quadratic():
    """On an exact quadratic surface the interior fit is the surface itself."""
    h, w = 32, 40
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    f = 0.03 * xs * xs + 0.02 * ys * ys - 0.04 * xs * ys + 1.5 * xs - 0.7 * ys
    bx, by, axx, ayy, axy = (
        np.asarray(p) for p in poly_exp.poly_expansion(jnp.asarray(f), 7, 1.5)
    )
    # Interior pixel (away from the zero-pad boundary): the local expansion
    # of a global quadratic q(X + o) has A = global A,
    # b = grad q(X) = (2*0.03*X - 0.04*Y + 1.5, 2*0.02*Y - 0.04*X - 0.7).
    i, j = 16, 20
    assert abs(axx[i, j] - 0.03) < 1e-3
    assert abs(ayy[i, j] - 0.02) < 1e-3
    assert abs(axy[i, j] - (-0.02)) < 1e-3
    assert abs(bx[i, j] - (0.06 * j - 0.04 * i + 1.5)) < 1e-2
    assert abs(by[i, j] - (0.04 * i - 0.04 * j - 0.7)) < 1e-2


def test_single_level_recovers_subpixel_translation():
    p, n = _pair(96, 128, 0.7, 0.4)
    cfg = fb.FBConfig(levels=1, iterations=3, winsize=15)
    flow = np.asarray(fb.pyramidal_farneback(p, n, cfg))
    inner = flow[16:-16, 16:-16]
    assert abs(np.median(inner[..., 0]) - 0.7) < 0.1
    assert abs(np.median(inner[..., 1]) - 0.4) < 0.1


def test_pyramidal_recovers_large_translation():
    p, n = _pair(128, 160, 5.0, 3.0)
    cfg = fb.FBConfig(levels=3, iterations=3, winsize=15)
    flow = np.asarray(fb.pyramidal_farneback_jit(p, n, cfg))
    inner = flow[24:-24, 24:-24]
    epe = np.hypot(inner[..., 0] - 5.0, inner[..., 1] - 3.0)
    assert epe.mean() < 0.35, epe.mean()


def test_gaussian_window_and_poly5():
    p, n = _pair(96, 128, 1.5, -1.0)
    cfg = fb.FBConfig(
        levels=2, iterations=2, poly_n=5, poly_sigma=1.1,
        winsize=13, gaussian_window=True,
    )
    flow = np.asarray(fb.pyramidal_farneback(p, n, cfg))
    inner = flow[20:-20, 20:-20]
    assert abs(np.median(inner[..., 0]) - 1.5) < 0.15
    assert abs(np.median(inner[..., 1]) + 1.0) < 0.15


def test_batched_and_validation():
    p, n = _pair(64, 64, 1.0, 0.0)
    cfg = fb.FBConfig(levels=2, iterations=2)
    flow = fb.pyramidal_farneback(jnp.stack([p, p]), jnp.stack([n, n]), cfg)
    assert flow.shape == (2, 64, 64, 2)
    np.testing.assert_allclose(
        np.asarray(flow[0]), np.asarray(flow[1]), atol=1e-6
    )
    with pytest.raises(ValueError):
        fb.FBConfig(poly_n=4)
    with pytest.raises(ValueError):
        fb.FBConfig(winsize=10)
    with pytest.raises(ValueError):
        fb.FBConfig(poly_sigma=0.0)


def test_win_solve_kernel_matches_xla(rng):
    """Fused window+solve kernel (interpret mode) vs the XLA fallback."""
    from cuda_optical_flow_2_tpu.kernels import win_solve

    prods = tuple(
        jnp.asarray(rng.standard_normal((45, 70)).astype(np.float32))
        for _ in range(5)
    )
    # make G SPD-ish so the solve is well-conditioned
    prods = (jnp.abs(prods[0]) + 1.0, prods[1], jnp.abs(prods[2]) + 1.0,
             prods[3], prods[4])
    cfg = fb.FBConfig(winsize=9, use_pallas=False)
    want = np.asarray(fb._window_solve(prods, cfg))
    got = np.asarray(
        win_solve.window_solve(*prods, window=9, det_eps=cfg.det_eps, interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_win_solve_kernel_batched(rng):
    from cuda_optical_flow_2_tpu.kernels import win_solve

    prods = tuple(
        jnp.asarray(rng.standard_normal((2, 24, 40)).astype(np.float32))
        for _ in range(5)
    )
    got = np.asarray(
        win_solve.window_solve(*prods, window=5, det_eps=1e-6, interpret=True)
    )
    for b in range(2):
        single = np.asarray(
            win_solve.window_solve(
                *(p[b] for p in prods), window=5, det_eps=1e-6, interpret=True
            )
        )
        np.testing.assert_allclose(got[b], single, atol=1e-6)


def test_fb_dispatch_forced_interpret(monkeypatch):
    """use_pallas=True routes the window+solve through the kernel on CPU."""
    monkeypatch.setenv("OF2_PALLAS_INTERPRET", "1")
    p, n = _pair(48, 64, 0.5, 0.3)
    cfg = fb.FBConfig(levels=2, iterations=2)
    want = np.asarray(
        fb.pyramidal_farneback(p, n, fb.dataclasses.replace(cfg, use_pallas=False))
    )
    got = np.asarray(fb.pyramidal_farneback(p, n, cfg))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_fb_image_formulation_matches_accuracy():
    """warp_planes='image' and 'coeff' agree to sub-pixel on translation."""
    p, n = _pair(64, 96, 2.0, 1.0)
    fi = np.asarray(fb.pyramidal_farneback(
        p, n, fb.FBConfig(levels=2, iterations=2, use_pallas=False,
                          warp_planes="image")))
    fc = np.asarray(fb.pyramidal_farneback(
        p, n, fb.FBConfig(levels=2, iterations=2, use_pallas=False,
                          warp_planes="coeff")))
    c = (slice(20, -20), slice(20, -20))
    assert np.abs(fi[c] - fc[c]).mean() < 0.05


def test_fb_step_fused_matches_xla_image(monkeypatch):
    """The fused kernel (interpret) == the XLA image-warp path, float-tight."""
    monkeypatch.setenv("OF2_PALLAS_INTERPRET", "1")
    p, n = _pair(96, 128, 2.0, 1.0)
    cfg_x = fb.FBConfig(levels=2, iterations=2, use_pallas=False)
    cfg_k = fb.FBConfig(levels=2, iterations=2, use_pallas=True)
    fx = np.asarray(fb.pyramidal_farneback(p, n, cfg_x))
    fk = np.asarray(fb.pyramidal_farneback(p, n, cfg_k))
    np.testing.assert_allclose(fk, fx, atol=1e-4)


def test_fb_step_fused_first_iteration(monkeypatch):
    """first=True skips the warp: fused == XLA with iterations=1, no prior."""
    monkeypatch.setenv("OF2_PALLAS_INTERPRET", "1")
    from cuda_optical_flow_2_tpu.kernels import fb_step_fused
    from cuda_optical_flow_2_tpu.ops.poly_exp import poly_expansion
    import jax.numpy as jnp

    p, n = _pair(48, 64, 1.0, 0.5)
    cfg = fb.FBConfig(levels=1, iterations=1)
    exp1 = poly_expansion(p, cfg.poly_n, cfg.poly_sigma)
    want = np.asarray(fb.fb_level_image(n, exp1, None, fb.dataclasses.replace(cfg, use_pallas=False)))
    got = np.asarray(fb_step_fused.fb_level_step(
        n, exp1, jnp.zeros(n.shape + (2,), jnp.float32), cfg,
        first=True, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_poly_exp_kernel_matches_xla(rng):
    from cuda_optical_flow_2_tpu.kernels import poly_exp_fused
    from cuda_optical_flow_2_tpu.ops.poly_exp import poly_expansion

    x = jnp.asarray(rng.random((37, 61)).astype(np.float32) * 255)
    want = poly_expansion(x, 7, 1.5)
    got = poly_exp_fused.poly_expansion_kernel(x, 7, 1.5, interpret=True)
    for a, b in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-4
        )


def test_fb_expand_dispatch_forced_interpret(monkeypatch):
    """use_pallas routes expansion through the kernel; pipeline unchanged."""
    monkeypatch.setenv("OF2_PALLAS_INTERPRET", "1")
    p, n = _pair(64, 96, 1.0, 0.5)
    cfg = fb.FBConfig(levels=2, iterations=2)
    want = np.asarray(fb.pyramidal_farneback(
        p, n, fb.dataclasses.replace(cfg, use_pallas=False)))
    got = np.asarray(fb.pyramidal_farneback(p, n, cfg))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_fb_step_fused_odd_sizes(monkeypatch):
    """Pyramid levels produce odd sizes (1080p level 4 = 67x120): fused step
    must pad/crop exactly at non-aligned shapes."""
    monkeypatch.setenv("OF2_PALLAS_INTERPRET", "1")
    for h, w in ((67, 120), (35, 53)):
        p, n = _pair(h, w, 1.0, 0.5)
        cfg_x = fb.FBConfig(levels=1, iterations=2, winsize=9, use_pallas=False)
        cfg_k = fb.FBConfig(levels=1, iterations=2, winsize=9, use_pallas=True)
        fx = np.asarray(fb.pyramidal_farneback(p, n, cfg_x))
        fk = np.asarray(fb.pyramidal_farneback(p, n, cfg_k))
        np.testing.assert_allclose(fk, fx, atol=1e-4)
