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
