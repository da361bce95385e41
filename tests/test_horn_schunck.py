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


def _hs_xla(p, n, flow_init, cfg):
    return hs.hs_level(
        p, n, flow_init, hs.dataclasses.replace(cfg, use_pallas=False)
    )


@pytest.mark.parametrize(
    "shape,iters,alpha",
    [
        ((64, 80), 16, 8.0),      # exactly one fused block
        ((61, 77), 21, 10.0),     # scan block + remainder, odd shape
        ((80, 96), 50, 5.0),      # multiple scan blocks
    ],
)
def test_pallas_relax_matches_xla(shape, iters, alpha):
    from cuda_optical_flow_2_tpu.kernels import hs_sweep

    p, n = _pair(*shape, 0.8, -0.5)
    cfg = hs.HSConfig(alpha=alpha, iterations=iters, levels=1)
    want = np.asarray(_hs_xla(p, n, None, cfg))
    got = np.asarray(
        hs_sweep.hs_relax(
            p, n, None,
            iterations=iters, alpha=alpha,
            temporal_kernel=cfg.temporal_kernel, interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pallas_relax_multiband(monkeypatch):
    """Force small row bands so the K-row halo / trapezoid logic is exercised."""
    from cuda_optical_flow_2_tpu.kernels import hs_sweep

    monkeypatch.setattr(hs_sweep, "_pick_tile_h", lambda wp, halo_y, h: 16)
    p, n = _pair(90, 70, 1.2, 0.6)
    cfg = hs.HSConfig(alpha=8.0, iterations=40, levels=1)
    want = np.asarray(_hs_xla(p, n, None, cfg))
    got = np.asarray(
        hs_sweep.hs_relax(
            p, n, None,
            iterations=40, alpha=8.0,
            temporal_kernel=cfg.temporal_kernel, interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pallas_relax_flow_init_and_batch():
    from cuda_optical_flow_2_tpu.kernels import hs_sweep

    p, n = _pair(48, 64, 0.5, 0.3)
    cfg = hs.HSConfig(alpha=8.0, iterations=12, levels=1)
    f0 = jnp.full(p.shape + (2,), 0.25, jnp.float32)
    want = np.asarray(_hs_xla(p, n, f0, cfg))
    got = np.asarray(
        hs_sweep.hs_relax(
            p, n, f0,
            iterations=12, alpha=8.0,
            temporal_kernel=cfg.temporal_kernel, interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    pb, nb = jnp.stack([p, n]), jnp.stack([n, p])
    wantb = np.asarray(_hs_xla(pb, nb, None, cfg))
    gotb = np.asarray(
        hs_sweep.hs_relax(
            pb, nb, None,
            iterations=12, alpha=8.0,
            temporal_kernel=cfg.temporal_kernel, interpret=True,
        )
    )
    np.testing.assert_allclose(gotb, wantb, rtol=1e-4, atol=1e-4)


def test_dispatch_forced_interpret(monkeypatch):
    """use_pallas=True routes hs_level through the kernel under the env hook."""
    monkeypatch.setenv("OF2_PALLAS_INTERPRET", "1")
    p, n = _pair(48, 64, 0.5, 0.3)
    cfg = hs.HSConfig(alpha=8.0, iterations=10, levels=1)
    want = np.asarray(_hs_xla(p, n, None, cfg))
    got = np.asarray(hs.hs_level(p, n, None, cfg))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_batched_and_config_validation():
    p, n = _pair(64, 64, 1.0, 0.0)
    pb = jnp.stack([p, p])
    nb = jnp.stack([n, n])
    cfg = hs.HSConfig(alpha=8.0, iterations=50, levels=2)
    flow = hs.pyramidal_hs(pb, nb, cfg)
    assert flow.shape == (2, 64, 64, 2)
    with pytest.raises(ValueError):
        hs.HSConfig(alpha=0.0)


def test_hs_charbonnier_kernel_matches_xla(monkeypatch):
    """Robust HS (HSConfig.penalty='charbonnier'): interpret-mode kernel ==
    the chunk-matched XLA twin through the full pyramidal pipeline."""
    monkeypatch.setenv("OF2_PALLAS_INTERPRET", "1")
    p, n = _pair(96, 128, 2.0, 1.0)
    cfg = hs.HSConfig(
        alpha=20.0, iterations=20, levels=2, penalty="charbonnier",
        max_displacement=8, use_pallas=False,
    )
    fx = np.asarray(hs.pyramidal_hs(p, n, cfg))
    import dataclasses

    fk = np.asarray(hs.pyramidal_hs(
        p, n, dataclasses.replace(cfg, use_pallas=True)))
    np.testing.assert_allclose(
        fk[16:-16, 16:-16], fx[16:-16, 16:-16], atol=1e-4
    )


def test_hs_charbonnier_beats_quadratic_frontier_on_boundaries():
    """Robust HS as a 'TV-lite' operating point (round 5): at its a=40
    recommended point it beats quadratic HS at the SAME alpha on both the
    matched region and the discontinuity band of the layered bar case
    (study sweep: quad a=40 matched 0.299 / band 2.37; charb a=40 0.257 /
    2.17 — the quadratic frontier never reaches either number even at
    a=60).  Bounds leave ~half the measured gap as margin."""
    from cuda_optical_flow_2_tpu.utils.layered import (
        Layer, boundary_band, layered_scene,
    )

    h, w = 192, 256
    sc = layered_scene(
        h, w, bg_flow=(-3.0, 0.0),
        layers=[Layer("rect", (96.0, 128.0), (120.0, 22.0), (4.0, 0.0))],
        seed=7,
    )
    interior = np.zeros((h, w), bool)
    interior[16:-16, 16:-16] = True
    band = boundary_band(sc.owner, 6) & interior

    def metrics(cfg):
        f = np.asarray(hs.pyramidal_hs(
            jnp.asarray(sc.prev, jnp.float32),
            jnp.asarray(sc.nxt, jnp.float32), cfg))
        epe = np.hypot(*(f - sc.flow).transpose(2, 0, 1))
        return epe[interior & ~sc.occ].mean(), epe[band].mean()

    base = dict(levels=4, iterations=100, alpha=40.0, use_pallas=False,
                max_displacement=8)
    qm, qb = metrics(hs.HSConfig(**base))
    cm, cb = metrics(hs.HSConfig(**base, penalty="charbonnier"))
    assert cm < qm - 0.02, (cm, qm)
    assert cb < qb - 0.1, (cb, qb)


def test_hs_charbonnier_config_validation():
    with pytest.raises(ValueError, match="penalty"):
        hs.HSConfig(penalty="huber")
    with pytest.raises(ValueError, match="eps"):
        hs.HSConfig(penalty="charbonnier", eps_smooth=0.0)
