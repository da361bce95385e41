"""DIS-style (dense inverse search) model family tests."""

import dataclasses

import numpy as np

import jax.numpy as jnp
import pytest

from cuda_optical_flow_2_tpu.models import dis
from cuda_optical_flow_2_tpu.utils import io


def _pair(h, w, dx, dy, period=16, bright=0.0):
    fr = io.synthetic_sequence(2, h, w, velocity=(dx, dy), period=period)
    return (jnp.asarray(fr[0].astype(np.float32)),
            jnp.asarray(fr[1].astype(np.float32) + bright))


def _epe(flow, dx, dy, margin=16):
    e = np.hypot(np.asarray(flow[..., 0]) - dx, np.asarray(flow[..., 1]) - dy)
    return float(e[margin:-margin, margin:-margin].mean())


def test_translation_accuracy():
    p, n = _pair(96, 128, 2.0, 1.0)
    cfg = dis.DISConfig(levels=3, use_pallas=False)
    assert _epe(dis.pyramidal_dis(p, n, cfg), 2.0, 1.0) < 0.15


def test_large_displacement_beats_plain_lk():
    """Iterated mean-normalized search + refinement on a (7,4) shift."""
    from cuda_optical_flow_2_tpu.models import lucas_kanade as lk

    p, n = _pair(128, 160, 7.0, 4.0, period=40)
    f = dis.pyramidal_dis(p, n, dis.DISConfig(levels=4, use_pallas=False))
    g = lk.pyramidal_lk(
        p, n, lk.LKConfig(levels=4, window=9, use_pallas=False))
    assert _epe(f, 7.0, 4.0, 24) < 0.2
    assert _epe(f, 7.0, 4.0, 24) < _epe(g, 7.0, 4.0, 24)


def test_illumination_robustness():
    """A +25 global brightness offset must not move the DIS estimate (the
    mean-normalized data term's reason to exist); plain LK degrades badly
    on the same pair."""
    from cuda_optical_flow_2_tpu.models import lucas_kanade as lk

    p, n = _pair(96, 128, 2.0, 1.0)
    _, nb = _pair(96, 128, 2.0, 1.0, bright=25.0)
    cfg = dis.DISConfig(levels=3, use_pallas=False)
    clean = _epe(dis.pyramidal_dis(p, n, cfg), 2.0, 1.0)
    bright = _epe(dis.pyramidal_dis(p, nb, cfg), 2.0, 1.0)
    assert abs(bright - clean) < 0.05, (clean, bright)
    lk_bright = _epe(
        lk.pyramidal_lk(p, nb, lk.LKConfig(levels=3, window=9,
                                           use_pallas=False)), 2.0, 1.0)
    assert lk_bright > 4 * bright, (lk_bright, bright)


def test_refinement_centered_data_term():
    """Refinement alone must also hold under the brightness offset (its raw
    warped difference would otherwise absorb the +25 into the flow)."""
    p, n = _pair(96, 128, 2.0, 1.0)
    _, nb = _pair(96, 128, 2.0, 1.0, bright=25.0)
    cfg = dis.DISConfig(levels=3, iterations=1, refine_iterations=8,
                        use_pallas=False)
    clean = _epe(dis.pyramidal_dis(p, n, cfg), 2.0, 1.0)
    bright = _epe(dis.pyramidal_dis(p, nb, cfg), 2.0, 1.0)
    assert abs(bright - clean) < 0.05, (clean, bright)


def test_centered_sums_equal_explicit_covariance():
    """centered_structure_tensor_sums == the direct windowed covariance."""
    from cuda_optical_flow_2_tpu.ops.window import (
        centered_structure_tensor_sums,
    )

    rng = np.random.default_rng(0)
    h, w, win = 17, 23, 5
    ix, iy, it = (jnp.asarray(rng.standard_normal((h, w)).astype(np.float32))
                  for _ in range(3))
    got = centered_structure_tensor_sums(ix, iy, it, win)

    r = win // 2
    a = {k: np.zeros((h, w), np.float32) for k in range(5)}
    planes = [(ix, ix), (iy, iy), (ix, iy), (ix, it), (iy, it)]
    for y in range(h):
        for x in range(w):
            ys = slice(max(0, y - r), min(h, y + r + 1))
            xs = slice(max(0, x - r), min(w, x + r + 1))
            n = (ys.stop - ys.start) * (xs.stop - xs.start)
            for k, (pa, pb) in enumerate(planes):
                wa = np.asarray(pa[ys, xs])
                wb = np.asarray(pb[ys, xs])
                a[k][y, x] = (wa * wb).sum() - wa.sum() * wb.sum() / n
    for k in range(5):
        np.testing.assert_allclose(np.asarray(got[k]), a[k],
                                   rtol=1e-4, atol=1e-4)


def test_centered_residual_kernel_matches_xla(monkeypatch):
    """Fused centered LK residual (interpret) == the XLA covariance path."""
    monkeypatch.setenv("OF2_PALLAS_INTERPRET", "1")
    from cuda_optical_flow_2_tpu.kernels import lk_fused

    p, n = _pair(67, 93, 1.0, 0.5)  # odd sizes on purpose
    cfg = dis.DISConfig(levels=1, use_pallas=False)
    want = np.asarray(dis._dis_residual_xla(p, n, cfg))
    got = np.asarray(lk_fused.lk_residual(
        p, n, dis._lk_like(cfg), interpret=True, centered=True))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_refine_offset_kernel_matches_xla(monkeypatch):
    """hs_relax with the it_offset plane (interpret) == the XLA sweep."""
    monkeypatch.setenv("OF2_PALLAS_INTERPRET", "1")
    p, n = _pair(67, 93, 1.0, 0.5)
    flow0 = jnp.full((67, 93, 2), 0.5, jnp.float32)
    cfg = dis.DISConfig(levels=1, refine_iterations=6)
    fx = dis._refine(p, n, flow0, dataclasses.replace(cfg, use_pallas=False))
    fk = dis._refine(p, n, flow0, dataclasses.replace(cfg, use_pallas=True))
    np.testing.assert_allclose(np.asarray(fk), np.asarray(fx), atol=1e-5)


def test_dis_dispatch_forced_interpret(monkeypatch):
    """Full pipeline: fused path == XLA path (border rows differ by the
    select-vs-gather warp semantics, as for the other families)."""
    monkeypatch.setenv("OF2_PALLAS_INTERPRET", "1")
    p, n = _pair(96, 128, 2.0, 1.0)
    cfg = dis.DISConfig(levels=3, use_pallas=False)
    fx = np.asarray(dis.pyramidal_dis(p, n, cfg))
    fk = np.asarray(dis.pyramidal_dis(
        p, n, dataclasses.replace(cfg, use_pallas=True)))
    np.testing.assert_allclose(fk[16:-16, 16:-16], fx[16:-16, 16:-16],
                               atol=1e-4)
    assert np.abs(fk - fx).max() < 0.05


def test_finest_level_upsamples():
    """finest_level=1 solves at half resolution and upsamples; the flow is
    full-size and still tracks the translation."""
    p, n = _pair(96, 128, 2.0, 1.0)
    cfg = dis.DISConfig(levels=3, finest_level=1, use_pallas=False)
    f = dis.pyramidal_dis(p, n, cfg)
    assert f.shape == (96, 128, 2)
    assert _epe(f, 2.0, 1.0) < 0.3


def test_batched_matches_single():
    p, n = _pair(64, 96, 1.0, 0.5)
    cfg = dis.DISConfig(levels=2, use_pallas=False)
    single = dis.pyramidal_dis(p, n, cfg)
    batched = dis.pyramidal_dis(jnp.stack([p, p]), jnp.stack([n, n]), cfg)
    np.testing.assert_allclose(np.asarray(batched[0]), np.asarray(single),
                               atol=1e-5)


def test_streaming_dis_matches_pairwise():
    from cuda_optical_flow_2_tpu.models import streaming

    frames = io.synthetic_sequence(3, 96, 128, velocity=(1.0, 0.5))
    cfg = dis.DISConfig(levels=2, refine_iterations=3, use_pallas=False)
    flows = {i: np.asarray(f)
             for i, f in streaming.process_sequence(frames, cfg)}
    assert sorted(flows) == [1, 2]
    for i in (1, 2):
        pair = np.asarray(dis.pyramidal_dis(
            jnp.asarray(frames[i - 1].astype(np.float32)),
            jnp.asarray(frames[i].astype(np.float32)), cfg))
        np.testing.assert_allclose(flows[i], pair, atol=1e-5)


def test_pyramidal_flow_dispatches_dis():
    from cuda_optical_flow_2_tpu.models import pyramidal_flow

    p, n = _pair(64, 96, 1.0, 0.5)
    cfg = dis.DISConfig(levels=2, use_pallas=False)
    np.testing.assert_allclose(
        np.asarray(pyramidal_flow(p, n, cfg)),
        np.asarray(dis.pyramidal_dis(p, n, cfg)), atol=0)


def test_config_validation():
    with pytest.raises(ValueError):
        dis.DISConfig(levels=0)
    with pytest.raises(ValueError):
        dis.DISConfig(finest_level=5, levels=5)
    with pytest.raises(ValueError):
        dis.DISConfig(window=4)
    with pytest.raises(ValueError):
        dis.DISConfig(refine_iterations=-1)
    with pytest.raises(ValueError):
        dis.DISConfig(refine_alpha=0.0)
    with pytest.raises(ValueError):
        dis.DISConfig(temporal_kernel="nope")


def test_dis_realtime_preset():
    from cuda_optical_flow_2_tpu.models import DIS_REALTIME

    assert DIS_REALTIME.finest_level == 1
    p, n = _pair(128, 96, 2.0, 1.0)
    cfg = dataclasses.replace(DIS_REALTIME, levels=3, use_pallas=False)
    f = dis.pyramidal_dis(p, n, cfg)
    m = np.median(np.asarray(f)[24:-24, 24:-24], axis=(0, 1))
    assert abs(m[0] - 2) < 0.3 and abs(m[1] - 1) < 0.3, m

def test_dis_fused_half_upsample_matches(monkeypatch):
    """DIS's coarse-to-fine consumes the coarser flow directly in the fused
    kernel (in-kernel 2x upsample) and matches the XLA-upsample route."""
    monkeypatch.setenv("OF2_PALLAS_INTERPRET", "1")
    from cuda_optical_flow_2_tpu.models import dis
    from cuda_optical_flow_2_tpu.models import lucas_kanade as lk
    from cuda_optical_flow_2_tpu.utils import io

    fr = io.synthetic_sequence(2, 128, 448, velocity=(2.0, 1.0))
    p, n = (jnp.asarray(f, jnp.float32) for f in fr)
    cfg = dis.DISConfig(
        levels=2, iterations=2, refine_iterations=2, max_displacement=8,
        fused_half_upsample=True,
    )
    got = np.asarray(dis.pyramidal_dis(p, n, cfg))
    monkeypatch.setattr(lk, "_fused_half_upsample", lambda *a: False)
    want = np.asarray(dis.pyramidal_dis(p, n, cfg))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_charbonnier_relax_kernel_matches_xla():
    """Robust (lagged-diffusivity Charbonnier) hs_relax (interpret kernel)
    == models.dis._robust_relax_xla, including the chunk-edge sweep counts
    (16 = exactly one MAX_SWEEPS chunk, where the weights' extra halo row
    matters; 33 = two chunks + remainder)."""
    from cuda_optical_flow_2_tpu.constants import MASKS
    from cuda_optical_flow_2_tpu.kernels import hs_sweep
    from cuda_optical_flow_2_tpu.ops.conv import stencil2d
    from cuda_optical_flow_2_tpu.ops.gradients import SOBEL_GAIN

    rng = np.random.default_rng(0)
    h, w = 64, 96
    prev = jnp.asarray(rng.random((h, w)).astype(np.float32) * 255)
    nxt = jnp.asarray(np.roll(np.asarray(prev), 2, axis=1))
    flow0 = jnp.asarray(rng.normal(0, 2, (h, w, 2)).astype(np.float32))
    off = jnp.asarray(rng.normal(0, 1, (h, w)).astype(np.float32))
    s = 1.0 / SOBEL_GAIN
    ix = stencil2d(prev, MASKS["sobel_x"] * s)
    iy = stencil2d(prev, MASKS["sobel_y"] * s)
    tm = MASKS["dt3"] / MASKS["dt3"].sum()
    itg = stencil2d(nxt - prev, tm) + off
    for iters in (5, 16, 33):
        got = np.asarray(hs_sweep.hs_relax(
            prev, nxt, flow0, iterations=iters, alpha=20.0,
            temporal_kernel="dt3", interpret=True, it_offset=off,
            robust=(3.0, 0.1)))
        want = np.asarray(dis._robust_relax_xla(
            flow0, ix, iy, itg, iters, 20.0, (3.0, 0.1)))
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_charbonnier_eps_inf_reduces_to_quadratic_interior():
    """eps_data, eps_smooth -> inf turns both Charbonnier weights into 1,
    recovering the quadratic update exactly in the interior.  (The border
    ring differs by design: robust mode's S normalization with ws=0
    outside is a Neumann boundary instead of the quadratic zero-pad
    Dirichlet drag — kernels/hs_sweep.py.)"""
    p, n = _pair(96, 128, 2.0, 1.0)
    base = dict(levels=2, iterations=2, refine_iterations=5,
                use_pallas=False)
    fq = np.asarray(dis.pyramidal_dis(
        p, n, dis.DISConfig(**base, refine_penalty="quadratic")))
    fi = np.asarray(dis.pyramidal_dis(p, n, dis.DISConfig(
        **base, refine_penalty="charbonnier",
        refine_eps_data=1e7, refine_eps_smooth=1e7)))
    assert np.abs(fq[8:-8, 8:-8] - fi[8:-8, 8:-8]).max() < 5e-2
    assert np.abs(fq[8:-8, 8:-8] - fi[8:-8, 8:-8]).mean() < 2e-3


def test_charbonnier_decouples_boundary_from_smoothing():
    """The round-4 documented tradeoff, removed (VERDICT r4 item 2): at
    deep refinement the quadratic penalty trades boundary sharpness for
    smooth-region accuracy as alpha grows; Charbonnier at the same alpha
    matches the smooth-region accuracy while keeping the discontinuity
    band SHARPER.  Bounds from docs/studies/charbonnier_study.py (bar
    case, refine_iterations=20: quadratic a=80 band 2.17 / overall 0.324;
    charbonnier a=80 band 1.99 / overall 0.278)."""
    from cuda_optical_flow_2_tpu.utils.layered import (
        Layer, boundary_band, layered_scene,
    )

    h, w = 192, 256
    sc = layered_scene(
        h, w, bg_flow=(-3.0, 0.0),
        layers=[Layer("rect", (96.0, 128.0), (120.0, 22.0), (4.0, 0.0))],
        seed=7,
    )
    base = dict(levels=4, refine_iterations=20, refine_alpha=80.0,
                use_pallas=False, max_displacement=8)
    interior = np.zeros((h, w), bool)
    interior[16:-16, 16:-16] = True
    band = boundary_band(sc.owner, 6) & interior

    def metrics(cfg):
        f = np.asarray(dis.pyramidal_dis(
            jnp.asarray(sc.prev, jnp.float32),
            jnp.asarray(sc.nxt, jnp.float32), cfg))
        epe = np.hypot(*(f - sc.flow).transpose(2, 0, 1))
        return float(epe[interior].mean()), float(epe[band].mean())

    quad_all, quad_band = metrics(dis.DISConfig(**base))
    charb_all, charb_band = metrics(dis.DISConfig(
        **base, refine_penalty="charbonnier", refine_eps_data=10.0))
    # same or better everywhere; band at least 5% sharper
    assert charb_all < quad_all + 0.01, (charb_all, quad_all)
    assert charb_band < quad_band - 0.05, (charb_band, quad_band)


def test_charbonnier_config_validation():
    with pytest.raises(ValueError, match="refine_penalty"):
        dis.DISConfig(refine_penalty="huber")
    with pytest.raises(ValueError, match="refine_eps_data"):
        dis.DISConfig(refine_eps_data=0.0)
    with pytest.raises(ValueError, match="refine_eps_smooth"):
        dis.DISConfig(refine_eps_smooth=-1.0)
