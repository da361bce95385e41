"""Fully-fused Farnebäck iteration: warp + re-expansion + window solve.

One Pallas kernel per displacement refinement computes, for each
VMEM-resident row band:

    warped    = backward-warp(next, flow)            (select_core.warp_core)
    exp_w     = quadratic polynomial expansion of the warped band
                (separable {g, g*o, g*o^2} correlations + constant mixing,
                 the in-VMEM twin of ops/poly_exp.poly_expansion)
    products  = Farnebäck normal-equation products vs the prev expansion
    sums      = 5 windowed box sums (shift-doubling)
    flow_out  = guarded 2x2 solve (TOTAL displacement, not residual)

This is the ``warp_planes="image"`` formulation (models/farneback.py): warp
the next FRAME once and re-expand, instead of warping all five coefficient
planes.  Measured equal-or-better accuracy (EPE 0.0223 vs 0.0250 on a
rotation+shear field, docs/PERF.md) at ~1/5 the select-warp work — the warp's
select-loops are the dominant cost and scale with the number of planes moved.

Compared to the unfused Pallas path (5-plane warp_select + XLA products +
win_solve) it also removes ~15 image-sized HBM round trips per iteration and
computes the flow clamp/valid masks once instead of five times (the batched
5-plane warp re-derives them per plane).

Boundary semantics match the XLA image path: zero padding outside the image
for the expansion and window sums, out-of-bounds warp samples keep the
unwarped pixel, and the products use the budget-clamped input flow.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuda_optical_flow_2_tpu.kernels import select_core
from cuda_optical_flow_2_tpu.kernels.lk_fused import (
    _box_sum,
    _roll,
    _round_up,
    interpret_forced,
    mosaic_ok,
)
from cuda_optical_flow_2_tpu.ops.poly_exp import gaussian_1d, mixing_matrix

__all__ = [
    "supported",
    "band_expansion",
    "band_margin",
    "fb_level_step",
    "fb_band_step",
]

_LANE = 128
_SUBLANE = 8


def band_margin(config) -> int:
    """Rows at each band edge the kernel treats as margin (garbage on
    output).  Spatial-TP callers must provision their halo_exchange from
    THIS value (plus the warp budget) so it can never desync from the
    kernel's internal ``rb``."""
    r_win = config.winsize // 2
    r_poly = config.poly_n // 2
    return _round_up(r_win + r_poly + 1, 4)



def supported(img: jax.Array, config) -> bool:
    h, w = img.shape[-2:]
    if h < _SUBLANE or w < _SUBLANE:
        return False
    if config.max_displacement > 96 or config.winsize > 33:
        return False
    if config.gaussian_window:
        return False
    return mosaic_ok()


def _corr1d_band(x: jax.Array, taps: np.ndarray, axis: int) -> jax.Array:
    """Static shifted-add correlation along ``axis`` (wraps; margin-safe)."""
    rr = taps.size // 2
    acc = None
    for j, c in enumerate(taps):
        c = float(c)
        if c == 0.0:
            continue
        piece = _roll(x, j - rr, axis) * c
        acc = piece if acc is None else acc + piece
    return acc


def band_expansion(
    band: jax.Array,
    g0: np.ndarray,
    g1: np.ndarray,
    g2: np.ndarray,
    mix: np.ndarray,
) -> tuple[jax.Array, ...]:
    """In-VMEM polynomial expansion of a band: separable {g, g*o, g*o^2}
    correlations + constant mixing -> (bx, by, axx, ayy, axy).

    Shared by this kernel and poly_exp_fused.py; rolls wrap, so the band's
    outer ``len(g0)//2`` rows/cols are contaminated and callers must keep a
    margin.
    """
    ty0 = _corr1d_band(band, g0, 0)
    ty1 = _corr1d_band(band, g1, 0)
    ty2 = _corr1d_band(band, g2, 0)
    moments = (
        _corr1d_band(ty0, g0, 1),  # m00
        _corr1d_band(ty0, g1, 1),  # m10
        _corr1d_band(ty1, g0, 1),  # m01
        _corr1d_band(ty0, g2, 1),  # m20
        _corr1d_band(ty2, g0, 1),  # m02
        _corr1d_band(ty1, g1, 1),  # m11
    )

    def mix_row(k, scale=1.0):
        acc = None
        for l in range(6):
            c = float(mix[k, l]) * scale
            if abs(c) < 1e-15:
                continue
            piece = moments[l] * c
            acc = piece if acc is None else acc + piece
        return acc

    return mix_row(0), mix_row(1), mix_row(2), mix_row(3), mix_row(4, 0.5)


def _kernel(
    row0_ref,
    nxt_ref,
    bx1_ref,
    by1_ref,
    axx1_ref,
    ayy1_ref,
    axy1_ref,
    u_ref,
    v_ref,
    uo_ref,
    vo_ref,
    *,
    tile_h: int,
    rb: int,
    halo_n: int,
    halo_x: int,
    img_h: int,
    img_w: int,
    band_h: int,
    r_win: int,
    g0: np.ndarray,
    g1: np.ndarray,
    g2: np.ndarray,
    mix: np.ndarray,
    d_max: int,
    d_local: int,
    c_max: int,
    det_eps: float,
    first: bool,
):
    nxt = nxt_ref[0]
    u_in = u_ref[0]
    v_in = v_ref[0]
    text, wp = u_in.shape  # text = tile_h + 2*rb

    i = pl.program_id(1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (text, wp), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (text, wp), 1)
    # GLOBAL image row of each band cell: row0_ref holds the global row of
    # input row 0 (zero for the whole-image entry; the spatial-TP band entry
    # passes the shard offset so clamping/masking act on the global image).
    lrow = row_ids + i * tile_h - rb  # band-LOCAL row; pad rows fall outside
    img_row = lrow + row0_ref[0]
    img_col = col_ids - halo_x
    zero = jnp.zeros((text, wp), jnp.float32)
    # Budget + border clamping, recentering mask, valid mask (the shared
    # pre-warp invariant — select_core.global_clamp).
    u_b, v_b, u_c, v_c, inside, valid = select_core.global_clamp(
        u_in, v_in, img_row, img_col, img_h, img_w, d_max
    )
    # Recentering mask: exclude the band's own zero-flow jnp.pad rows,
    # whose global rows are inside the image on interior shards — same
    # bias class as lk_step_fused (band_h == img_h for the whole image).
    real = inside & (lrow >= 0) & (lrow < band_h)

    if first:
        # First iteration: no prior flow — the "warped" band is just next.
        warped = nxt[halo_n - rb : halo_n - rb + text, :]
        u_b = zero
        v_b = zero
    else:
        warped, _, _ = select_core.warp_core(
            nxt, u_c, v_c, row0=halo_n - rb, d_local=d_local, c_max=c_max,
            mask=real,
        )
        nxt_center = nxt[halo_n - rb : halo_n - rb + text, :]
        warped = jnp.where(valid, warped, nxt_center)
    warped = jnp.where(inside, warped, zero)

    # --- Polynomial expansion of the warped band (valid over the interior
    # rows/cols; the outer r_poly rolled-wrap rows are outside the window
    # region because rb >= r_win + r_poly and halo_x covers the columns).
    w_bx, w_by, w_axx, w_ayy, w_axy = band_expansion(warped, g0, g1, g2, mix)

    # --- Farnebäck products vs the prev expansion (db uses budget-clamped
    # flow, matching the XLA image path).  The exp1 tiles carry a rounded
    # halo_e >= rb margin; slice them to the working band.
    def band(ref):
        x = ref[0]
        off = (x.shape[0] - text) // 2
        return x[off : off + text, :]

    axx = 0.5 * (band(axx1_ref) + w_axx)
    ayy = 0.5 * (band(ayy1_ref) + w_ayy)
    axy = 0.5 * (band(axy1_ref) + w_axy)
    db_x = 0.5 * (band(bx1_ref) - w_bx) + axx * u_b + axy * v_b
    db_y = 0.5 * (band(by1_ref) - w_by) + axy * u_b + ayy * v_b

    def win(prod):
        rows = _box_sum(jnp.where(inside, prod, zero), r_win, 0)[
            rb : rb + tile_h, :
        ]
        return _box_sum(rows, r_win, 1)

    s11 = win(axx * axx + axy * axy)
    s12 = win(axy * (axx + ayy))
    s22 = win(axy * axy + ayy * ayy)
    h1 = win(axx * db_x + axy * db_y)
    h2 = win(axy * db_x + ayy * db_y)

    det = s11 * s22 - s12 * s12
    safe = jnp.abs(det) >= det_eps
    inv_det = 1.0 / jnp.where(safe, det, jnp.ones_like(det))
    zc = jnp.zeros_like(det)
    uo_ref[:, :] = jnp.where(safe, (s22 * h1 - s12 * h2) * inv_det, zc)
    vo_ref[:, :] = jnp.where(safe, (s11 * h2 - s12 * h1) * inv_det, zc)


def fb_level_step(
    nxt: jax.Array,
    exp1: tuple[jax.Array, ...],
    flow: jax.Array,
    config,
    first: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """One fused Farnebäck displacement refinement (image formulation).

    Args:
      nxt: (..., H, W) float32 next frame at this pyramid level.
      exp1: (bx, by, axx, ayy, axy) expansion planes of the PREV frame.
      flow: (..., H, W, 2) prior total flow (ignored when ``first``).
      config: FBConfig (static).
      first: no prior flow — skip the warp, expand next directly.
    Returns the refined TOTAL flow (..., H, W, 2).
    """
    h = nxt.shape[-2]
    return _step_impl(
        nxt, exp1, flow, jnp.zeros((1,), jnp.int32), h, config, first,
        interpret,
    )


def fb_band_step(
    nxt: jax.Array,
    exp1: tuple[jax.Array, ...],
    flow: jax.Array,
    row0,
    config,
    h_global: int,
    first: bool = False,
    interpret: bool = False,
    vma: tuple[str, ...] = (),
) -> jax.Array:
    """Fused FB refinement on a row BAND of an ``h_global``-row image.

    The spatial-TP entry (parallel/spatial_models.py): inputs are one
    shard's halo-extended band, ``row0`` the (traced) global row of band
    row 0.  Warp border clamping and outside-image masking act on GLOBAL
    coordinates, so kept rows (those whose reads stay within the caller's
    real halo data) match the whole-image step; band-edge rows are garbage
    and must be cropped by the caller.  ``vma`` names the shard_map mesh
    axes the band varies over.
    """
    row0_arr = jnp.reshape(jnp.asarray(row0, jnp.int32), (1,))
    return _step_impl(
        nxt, exp1, flow, row0_arr, h_global, config, first, interpret, vma
    )


@functools.partial(
    jax.jit,
    static_argnames=("config", "h_global", "first", "interpret", "vma"),
)
def _step_impl(
    nxt: jax.Array,
    exp1: tuple[jax.Array, ...],
    flow: jax.Array,
    row0_arr: jax.Array,
    h_global: int,
    config,
    first: bool,
    interpret: bool,
    vma: tuple[str, ...] = (),
) -> jax.Array:
    lead = nxt.shape[:-2]
    h, w = nxt.shape[-2:]
    n = nxt.reshape((-1, h, w)).astype(jnp.float32)
    planes1 = [x.reshape((-1, h, w)).astype(jnp.float32) for x in exp1]
    f = flow.reshape((-1, h, w, 2)).astype(jnp.float32)
    b = n.shape[0]

    r_win = config.winsize // 2
    r_poly = config.poly_n // 2
    # Band margin: window sums need r_win product rows; the in-band expansion
    # needs r_poly more warped rows below/above those.  Multiple of 4 keeps
    # the Element block heights sublane-divisible.
    rb = band_margin(config)
    d = int(config.max_displacement)
    d_local = config.d_local
    c_max = config.c_max

    halo_e = _round_up(rb, _SUBLANE)  # exp1-plane band extension
    halo_n = _round_up(select_core.halo_y(d, d_local, c_max) + rb, _SUBLANE)
    halo_x = max(select_core.halo_x(d, d_local), rb + 1)
    wp = _round_up(w + 2 * halo_x, _LANE)

    # VMEM: warp core scratch (3*ncands+2 band arrays) + expansion
    # temporaries (~14) + exp1 tiles (5) + products/sums (~10) + masks (~8).
    arrays = 37 + 19
    budget = 40 * 1024 * 1024 // 4
    th_max = (budget // wp - 2 * (halo_n + rb)) // arrays
    tile_h = max(
        _SUBLANE, min(_round_up(h, _SUBLANE), (th_max // _SUBLANE) * _SUBLANE)
    )
    ht = pl.cdiv(h, tile_h)

    hp_n = ht * tile_h + 2 * halo_n
    hp_e = ht * tile_h + 2 * halo_e
    hp_f = ht * tile_h + 2 * rb

    np_ = jnp.pad(n, ((0, 0), (halo_n, hp_n - h - halo_n), (halo_x, wp - w - halo_x)))
    pad_e = ((0, 0), (halo_e, hp_e - h - halo_e), (halo_x, wp - w - halo_x))
    pe = [jnp.pad(x, pad_e) for x in planes1]
    pad_f = ((0, 0), (rb, hp_f - h - rb), (halo_x, wp - w - halo_x))
    uf = jnp.pad(f[..., 0], pad_f)
    vf = jnp.pad(f[..., 1], pad_f)

    g = gaussian_1d(config.poly_n, config.poly_sigma)
    o = np.arange(config.poly_n, dtype=np.float64) - r_poly
    mix = mixing_matrix(config.poly_n, float(config.poly_sigma))

    kernel = functools.partial(
        _kernel,
        tile_h=tile_h,
        rb=rb,
        halo_n=halo_n,
        halo_x=halo_x,
        img_h=h_global,
        img_w=w,
        band_h=h,
        r_win=r_win,
        g0=g.astype(np.float32),
        g1=(g * o).astype(np.float32),
        g2=(g * o * o).astype(np.float32),
        mix=mix,
        d_max=d,
        d_local=d_local,
        c_max=c_max,
        det_eps=config.det_eps,
        first=first,
    )

    def espec(gy):
        return pl.BlockSpec(
            (pl.Element(1), pl.Element(tile_h + 2 * gy), pl.Element(wp)),
            lambda bb, i: (bb, i * tile_h, 0),
            memory_space=pltpu.VMEM,
        )

    out_spec = pl.BlockSpec(
        (None, tile_h, wp), lambda bb, i: (bb, i, 0), memory_space=pltpu.VMEM
    )
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    uo, vo = pl.pallas_call(
        kernel,
        grid=(b, ht),
        in_specs=[smem_spec, espec(halo_n)] + [espec(halo_e)] * 5
        + [espec(rb)] * 2,
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct(
                (b, ht * tile_h, wp), jnp.float32, vma=frozenset(vma)
            ),
            jax.ShapeDtypeStruct(
                (b, ht * tile_h, wp), jnp.float32, vma=frozenset(vma)
            ),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(row0_arr, np_, *pe, uf, vf)
    out = jnp.stack(
        [uo[:, :h, halo_x : halo_x + w], vo[:, :h, halo_x : halo_x + w]], axis=-1
    )
    return out.reshape(lead + (h, w, 2))
