"""Fused joint-bilateral prefilter kernel (G18, OptFlowGpu.cu:1984-2083).

The reference's live prefilter (main.cu:240: 9x9, sigmaS=2, sigmaB=10) is an
O(window^2)-tap loop of range-weighted accumulations.  The XLA op
(ops/bilateral.py) unrolls the taps as shifted adds over HBM-resident
arrays; this kernel runs the whole tap loop on VMEM row bands so each pixel
is read once from HBM regardless of window size, with the per-tap work
(static shift, one VPU exp, 3 FMAs) on registers-adjacent tiles.

Same layout playbook as kernels/lk_fused.py (see the module docstring
there): Element-indexed overlapping row bands, halo >= r+1 so roll
wraparound never reaches a window read, and out-of-image taps masked by
GLOBAL row/col coordinates — ``row0`` biases the row coordinates so the
spatial-TP path (parallel/spatial.py) can run the same kernel on a shard's
halo-extended band.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuda_optical_flow_2_tpu.constants import generate_gaussian_kernel
from cuda_optical_flow_2_tpu.kernels.lk_fused import (
    _round_up,
    _shift,
    interpret_forced,
    mosaic_ok,
)

__all__ = ["supported", "bilateral_kernel", "bilateral_kernel_band"]

_LANE = 128
_SUBLANE = 8
_MAX_WINDOW = 19


def supported(img: jax.Array, window: int) -> bool:
    if img.dtype not in (jnp.float32, jnp.uint8):
        return False
    if window > _MAX_WINDOW:
        return False
    h, w = img.shape[-2:]
    if h < _SUBLANE or w < _SUBLANE:
        return False
    return mosaic_ok()


def _kernel(
    row0_ref,
    img_ref,
    guide_ref,
    out_ref,
    *,
    tile_h: int,
    halo_y: int,
    halo_x: int,
    img_h: int,
    img_w: int,
    spatial: np.ndarray,
    inv_2s2: float,
    range_norm: float,
):
    img = img_ref[0]
    gd = guide_ref[0]
    g, wp = img.shape
    wh, ww = spatial.shape
    hwh, hww = wh >> 1, ww >> 1

    i = pl.program_id(1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (g, wp), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (g, wp), 1)
    # Global image coordinates of each band cell (row0 = global row of band
    # row 0; zero for the whole-image entry).
    img_row = row_ids + i * tile_h - halo_y + row0_ref[0]
    img_col = col_ids - halo_x
    inside = (
        (img_row >= 0) & (img_row < img_h) & (img_col >= 0) & (img_col < img_w)
    )
    # Out-of-image masking rides the range kernel for free: guide cells
    # outside the image become +inf, so any tap reading them gets
    # k = inf -> exp(-inf) = 0 weight — no per-tap mask shift/multiply
    # (a third of the tap loop's rolls).  Center cells with gd = inf
    # produce NaN lanes, but only outside the image, which the caller crops.
    gd = jnp.where(inside, gd, jnp.float32(np.inf))

    num = jnp.zeros((g, wp), jnp.float32)
    den = jnp.zeros((g, wp), jnp.float32)
    for m in range(wh):
        for n in range(ww):
            dy, dx = m - hwh, n - hww
            g_s = _shift(gd, dy, dx)
            i_s = _shift(img, dy, dx)
            k = g_s - gd
            # Same expression order as ops/bilateral.py: range_norm * exp *
            # spatial tap (the norm cancels in num/den; kept for parity).
            wgt = (
                np.float32(range_norm)
                * jnp.exp(-(k * k) * np.float32(inv_2s2))
                * np.float32(spatial[m, n])
            )
            num = num + i_s * wgt
            den = den + wgt
    # den == 0 only outside the image (every tap masked); those cells are
    # cropped by the caller — guard to keep the lanes finite.
    out = num / jnp.maximum(den, jnp.float32(1e-30))
    out_ref[:] = out[halo_y : halo_y + tile_h, :]


def _pick_tile_h(wp: int, halo_y: int, h: int) -> int:
    budget = 10 * 1024 * 1024
    cap = max(8, ((h + 7) // 8) * 8)  # never exceed the image height
    for th in (512, 256, 128, 64, 32, 16, 8):
        g = th + 2 * halo_y
        est = 7 * g * wp * 4
        if est <= budget:
            return min(th, cap)
    return 8


@functools.partial(
    jax.jit,
    static_argnames=(
        "window", "sigma_spatial", "sigma_range", "h_global", "interpret",
        "vma",
    ),
)
def _impl(
    img: jax.Array,
    guide: jax.Array,
    row0: jax.Array,
    window: int,
    sigma_spatial: float,
    sigma_range: float,
    h_global: int,
    interpret: bool,
    vma: tuple[str, ...] = (),
) -> jax.Array:
    lead = img.shape[:-2]
    h, w = img.shape[-2:]
    x = img.reshape((-1, h, w)).astype(jnp.float32)
    gde = guide.reshape((-1, h, w)).astype(jnp.float32)
    b = x.shape[0]

    spatial = generate_gaussian_kernel(sigma_spatial, window).astype(np.float32)
    r = max(spatial.shape[0] >> 1, spatial.shape[1] >> 1)
    sigma_b2 = float(sigma_range) ** 2

    halo_x = r + 1
    halo_y = _round_up(r + 1, _SUBLANE)
    wp = _round_up(w + 2 * halo_x, _LANE)
    tile_h = _pick_tile_h(wp, halo_y, h)
    ht = pl.cdiv(h, tile_h)
    hp = ht * tile_h + 2 * halo_y

    pad = ((0, 0), (halo_y, hp - h - halo_y), (halo_x, wp - w - halo_x))
    xp = jnp.pad(x, pad)
    gp = jnp.pad(gde, pad)

    kernel = functools.partial(
        _kernel,
        tile_h=tile_h,
        halo_y=halo_y,
        halo_x=halo_x,
        img_h=h_global,
        img_w=w,
        spatial=spatial,
        inv_2s2=0.5 / sigma_b2,
        range_norm=1.0 / (2.0 * np.pi * sigma_b2),
    )
    g = tile_h + 2 * halo_y
    in_spec = pl.BlockSpec(
        (pl.Element(1), pl.Element(g), pl.Element(wp)),
        lambda bb, i: (bb, i * tile_h, 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (None, tile_h, wp), lambda bb, i: (bb, i, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, ht),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), in_spec, in_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct(
            (b, ht * tile_h, wp), jnp.float32, vma=frozenset(vma)
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(row0, xp, gp)
    return out[:, :h, halo_x : halo_x + w].reshape(lead + (h, w))


def bilateral_kernel(
    img: jax.Array,
    window: int = 9,
    sigma_spatial: float = 2.0,
    sigma_range: float = 10.0,
    guide: jax.Array | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused bilateral of (..., H, W) — drop-in for ops.bilateral_filter."""
    if guide is None:
        guide = img
    h = img.shape[-2]
    return _impl(
        img, guide, jnp.zeros((1,), jnp.int32), window,
        float(sigma_spatial), float(sigma_range), h, interpret,
    )


def bilateral_kernel_band(
    img_band: jax.Array,
    row0,
    h_global: int,
    window: int = 9,
    sigma_spatial: float = 2.0,
    sigma_range: float = 10.0,
    interpret: bool = False,
    vma: tuple[str, ...] = (),
) -> jax.Array:
    """Bilateral on a row BAND of a larger image (spatial-TP shard local).

    ``row0`` is the (traced) global row index of band row 0; out-of-image
    tap masking acts on global rows, so kept rows (>= window//2 from the
    band edge) match the whole-image filter float-for-float.  ``vma`` names
    the shard_map mesh axes the band varies over.
    """
    row0_arr = jnp.reshape(jnp.asarray(row0, jnp.int32), (1,))
    return _impl(
        img_band, img_band, row0_arr, window,
        float(sigma_spatial), float(sigma_range), h_global, interpret, vma,
    )
