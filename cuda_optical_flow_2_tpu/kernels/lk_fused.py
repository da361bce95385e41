"""Fused LK level kernel: gradients + windowed sums + 2x2 solve in VMEM.

Replaces the composition G7 + G13 + G16 of the reference hot path
(OptFlowGpu.cu:1929-1964): where the reference launches 12 kernels with ~24
PCIe transfers per level, this computes the residual flow for a whole image
row-band without leaving VMEM.

Design (TPU-first; see /opt/skills/guides/pallas_guide.md):

* The image is zero-padded once in XLA — zero padding IS the reference's
  boundary semantics (bounds-check-and-skip, OptFlowGpu.cu:1569-1586) — with a
  row halo of ``>= r+1`` (rounded to sublane multiples) and the width padded
  to a lane multiple of 128.
* The grid tiles rows; input blocks overlap by the halo via
  ``pl.Element``-indexed BlockSpecs, so Mosaic still auto-pipelines the
  HBM->VMEM streaming (its own double buffering) — the TPU analogue of the
  reference's shared-memory halo loads (OptFlowGpu.cu:504-707), minus the
  manual index arithmetic.
* All stencils are static-shift rolls on full (G, WP) tiles on the VPU.
  Roll wraparound only ever contaminates the outermost row/column ring,
  which the halo margin keeps out of every window read (proof in comments).
* The box window sum uses a shift-doubling decomposition: O(log window)
  vector adds instead of the reference's O(window^2) taps per pixel
  (361 MACs for the 19x19 window, x5 sums).
* The 2x2 solve runs fused on the same tile; only (u, v) ever return to HBM.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuda_optical_flow_2_tpu.config import LKConfig
from cuda_optical_flow_2_tpu.constants import MASKS
from cuda_optical_flow_2_tpu.ops.gradients import SOBEL_GAIN

__all__ = ["supported", "lk_residual"]

_LANE = 128
_SUBLANE = 8
_MAX_WINDOW = 33


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def interpret_forced() -> bool:
    """Test hook: OF2_PALLAS_INTERPRET=1 runs the kernel in interpreter mode
    on any backend, so the dispatch path is exercisable without a TPU."""
    import os

    return os.environ.get("OF2_PALLAS_INTERPRET", "") == "1"


def mosaic_ok() -> bool:
    """Compiled Mosaic dispatch is available on this backend/config.

    Under ``jax_enable_x64`` Python-int scalars (roll shifts, index-map and
    grid arithmetic) stage as i64, which Mosaic rejects at verification
    (``tpu.dynamic_rotate`` wants i32; ``func.return`` legalization fails on
    i64 scalars) — x64 sessions fall back to the XLA twin path, which is
    x64-clean.  Interpret mode has no such constraint.
    """
    if interpret_forced():
        return True
    return jax.default_backend() == "tpu" and not jax.config.jax_enable_x64


def supported(prev: jax.Array, config: LKConfig) -> bool:
    """Whether the fused Pallas kernel handles this shape/config/backend."""
    if prev.dtype != jnp.float32:
        return False
    if config.window > _MAX_WINDOW:
        return False
    h, w = prev.shape[-2:]
    if h < 8 or w < 8:
        return False
    return mosaic_ok()


def _roll(x: jax.Array, d: int, axis: int) -> jax.Array:
    """out[i] = x[i + d] along ``axis``, with wraparound.

    pltpu.roll requires a non-negative shift; rolling by ``(-d) mod size`` is
    the same rotation.
    """
    size = x.shape[axis]
    s = (-d) % size
    # Plain Python-int shift: stages as a static rotate.  (Under
    # jax_enable_x64 it would stage as i64 and fail Mosaic verification,
    # but mosaic_ok() keeps x64 sessions off this path entirely.)
    return pltpu.roll(x, s, axis) if s else x


def _shift(x: jax.Array, dy: int, dx: int) -> jax.Array:
    """out[i, j] = x[i + dy, j + dx] with wraparound (callers keep a margin)."""
    if dy:
        x = _roll(x, dy, 0)
    if dx:
        x = _roll(x, dx, 1)
    return x


def _stencil3(x: jax.Array, mask: np.ndarray) -> jax.Array:
    """3x3 correlation via static shifted adds (zero taps skipped)."""
    acc = None
    for p in range(3):
        for q in range(3):
            c = float(mask[p, q])
            if c == 0.0:
                continue
            t = _shift(x, p - 1, q - 1) * c
            acc = t if acc is None else acc + t
    return acc


def _box_sum(x: jax.Array, r: int, axis: int) -> jax.Array:
    """sum_{d=-r..r} shift(x, d) along ``axis`` via run-doubling.

    Builds prefix-run sums of power-of-two lengths (runs[k][i] = sum of
    x[i..i+k-1]) and composes the (2r+1)-run starting at offset -r from the
    binary decomposition — O(log r) shifted adds instead of 2r.
    """
    n = 2 * r + 1
    runs = {1: x}
    k = 1
    while 2 * k <= n:
        prev = runs[k]
        runs[2 * k] = prev + _roll(prev, k, axis)
        k *= 2
    total = None
    offset = -r
    rem = n
    for p in sorted(runs, reverse=True):
        while rem >= p:
            piece = _roll(runs[p], offset, axis)
            total = piece if total is None else total + piece
            offset += p
            rem -= p
    return total


def _win_sum(x: jax.Array, r: int, axis: int, weights: str = "box") -> jax.Array:
    """Weighted windowed sum along ``axis`` (LKConfig.window_weights).

    * "box":   the O(log r) run-doubling flat sum (:func:`_box_sum`).
    * "tri":   two iterated box passes (radii r//2 and r - r//2) — a
               trapezoid whose transfer function has no significant negative
               sidelobes (ops/window.window_weight_taps), scaled to match
               the XLA taps (each axis sums to 2r+1).
    * "gauss": explicit truncated-Gaussian taps, sigma = (2r+1)/6 — r
               symmetric-pair FMAs via static rolls.

    All three keep the same reach r per axis, so halo sizing is identical.
    """
    if weights == "box":
        return _box_sum(x, r, axis)
    if weights == "tri":
        r1, r2 = r // 2, r - r // 2
        scale = (2 * r + 1) / float((2 * r1 + 1) * (2 * r2 + 1))
        return _box_sum(_box_sum(x, r1, axis), r2, axis) * scale
    if weights == "gauss":
        from cuda_optical_flow_2_tpu.ops.window import window_weight_taps

        taps = window_weight_taps(2 * r + 1, "gauss")
        acc = x * float(taps[r])
        for d in range(1, r + 1):
            # taps are symmetric: one multiply per distance pair
            acc = acc + (_roll(x, d, axis) + _roll(x, -d, axis)) * float(
                taps[r - d]
            )
        return acc
    raise ValueError(f"unknown window_weights {weights!r}")


def _lk_kernel(
    prev_ref,
    nxt_ref,
    u_ref,
    v_ref,
    *,
    tile_h: int,
    halo_y: int,
    halo_x: int,
    img_h: int,
    img_w: int,
    r: int,
    sobel_scale: float,
    temporal_mask: np.ndarray,
    det_eps: float,
    centered: bool,
    window_weights: str = "box",
):
    # Input blocks are (1, G, WP) — Mosaic requires every dim of an
    # Element-indexed BlockSpec to be an Element, so the batch dim is a
    # size-1 Element rather than squeezed.
    p = prev_ref[0]
    n = nxt_ref[0]
    g, wp = p.shape

    sx = MASKS["sobel_x"] * sobel_scale
    sy = MASKS["sobel_y"] * sobel_scale
    ix = _stencil3(p, sx)
    iy = _stencil3(p, sy)
    it = _stencil3(n - p, temporal_mask)

    # Zero the gradients outside the image: the stencils produce nonzero
    # values in the halo ring just outside the image border, but the
    # reference's window sums see zero there (bounds-check-and-skip,
    # OptFlowGpu.cu:1569-1586).
    i = pl.program_id(1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (g, wp), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (g, wp), 1)
    img_row = row_ids + i * tile_h - halo_y
    inside = (
        (img_row >= 0)
        & (img_row < img_h)
        & (col_ids >= halo_x)
        & (col_ids < halo_x + img_w)
    )
    zero = jnp.zeros((g, wp), jnp.float32)
    ix = jnp.where(inside, ix, zero)
    iy = jnp.where(inside, iy, zero)
    it = jnp.where(inside, it, zero)

    def win(prod):
        # Row pass first, then crop to the output band, then column pass.
        # Reads stay in [1, G-2] x [1, WP-2]: gradient rolls only contaminate
        # the outermost ring, and halo_y, halo_x >= r+1 keep every window
        # read off it (see module docstring).  The weighting keeps reach r.
        rows = _win_sum(prod, r, 0, window_weights)[halo_y : halo_y + tile_h, :]
        return _win_sum(rows, r, 1, window_weights)

    sum_ix2 = win(ix * ix)
    sum_iy2 = win(iy * iy)
    sum_ixiy = win(ix * iy)
    sum_ixit = win(ix * it)
    sum_iyit = win(iy * it)

    if centered:
        # Mean-normalized (DIS-style) normal equations: replace every raw
        # product sum with the centered one, S_ab - S_a S_b / n, n = the
        # window's in-image pixel count (ops/window.
        # centered_structure_tensor_sums is the XLA twin).
        sum_ix2, sum_iy2, sum_ixiy, sum_ixit, sum_iyit = _center_sums(
            win, inside, ix, iy, it,
            sum_ix2, sum_iy2, sum_ixiy, sum_ixit, sum_iyit,
        )

    u, v = _solve2x2(
        sum_ix2, sum_iy2, sum_ixiy, sum_ixit, sum_iyit, det_eps
    )
    u_ref[:] = u
    v_ref[:] = v


def _center_sums(
    win, inside, ix, iy, it,
    sum_ix2, sum_iy2, sum_ixiy, sum_ixit, sum_iyit,
):
    """Center the five window sums in VMEM (shared with lk_step_fused).

    Four extra box sums (S_ix, S_iy, S_it and the in-image count) turn the
    raw product sums into per-window covariances — the Gauss-Newton normal
    equations of the mean-subtracted residual.
    """
    ones = jnp.where(inside, jnp.ones_like(ix), jnp.zeros_like(ix))
    s_ix = win(ix)
    s_iy = win(iy)
    s_it = win(it)
    inv_n = 1.0 / jnp.maximum(win(ones), 1.0)
    return (
        sum_ix2 - s_ix * s_ix * inv_n,
        sum_iy2 - s_iy * s_iy * inv_n,
        sum_ixiy - s_ix * s_iy * inv_n,
        sum_ixit - s_ix * s_it * inv_n,
        sum_iyit - s_iy * s_it * inv_n,
    )


def _solve2x2(sum_ix2, sum_iy2, sum_ixiy, sum_ixit, sum_iyit, det_eps: float):
    """Guarded per-pixel 2x2 LK solve (elementwise VPU math).

    det_eps=0 reproduces the reference's raw 1/det (OptFlowGpu.cu:1835).
    SHARED by lk_fused and lk_step_fused so the guard semantics cannot
    drift between the fused-level and residual-only kernels.
    """
    det = sum_ix2 * sum_iy2 - sum_ixiy * sum_ixiy
    if det_eps > 0.0:
        safe = jnp.abs(det) >= det_eps
        inv_det = 1.0 / jnp.where(safe, det, jnp.ones_like(det))
        zero = jnp.zeros_like(det)
        u = jnp.where(safe, (-sum_iy2 * sum_ixit + sum_ixiy * sum_iyit) * inv_det, zero)
        v = jnp.where(safe, (sum_ixiy * sum_ixit - sum_ix2 * sum_iyit) * inv_det, zero)
    else:
        inv_det = 1.0 / det
        u = (-sum_iy2 * sum_ixit + sum_ixiy * sum_iyit) * inv_det
        v = (sum_ixiy * sum_ixit - sum_ix2 * sum_iyit) * inv_det
    return u, v


def _pick_tile_h(h: int, wp: int, halo_y: int) -> int:
    """Largest row band whose working set fits comfortably in VMEM (~10 MB),
    capped at the image height (a 135-row level must not pay for a padded
    256-row band)."""
    budget = 10 * 1024 * 1024
    cap = max(8, ((h + 7) // 8) * 8)  # never exceed the image height
    for th in (256, 128, 64, 32, 16, 8):
        g = th + 2 * halo_y
        # ~7 live (G, WP) tiles (p, n, ix, iy, it, transients) + ~6 (TH, WP)
        est = (7 * g + 6 * th) * wp * 4
        if est <= budget:
            return min(th, cap)
    return 8


@functools.partial(
    jax.jit, static_argnames=("config", "interpret", "centered")
)
def lk_residual(
    prev: jax.Array,
    nxt: jax.Array,
    config: LKConfig,
    interpret: bool = False,
    centered: bool = False,
) -> jax.Array:
    """Residual flow between prev and (already warped) next — fused TPU path.

    Drop-in replacement for the XLA composition in
    models/lucas_kanade._lk_residual_xla; returns (..., H, W, 2) float32.
    ``centered=True`` mean-normalizes the window sums (the DIS-style,
    illumination-offset-invariant data term — models/dis.py).
    """
    lead = prev.shape[:-2]
    h, w = prev.shape[-2:]
    x = prev.reshape((-1,) + (h, w)).astype(jnp.float32)
    y = nxt.reshape((-1,) + (h, w)).astype(jnp.float32)
    b = x.shape[0]

    r = config.window // 2
    halo_x = r + 1
    halo_y = _round_up(r + 1, _SUBLANE)
    wp = _round_up(w + 2 * halo_x, _LANE)
    tile_h = _pick_tile_h(h, wp, halo_y)
    ht = pl.cdiv(h, tile_h)
    hp = ht * tile_h + 2 * halo_y

    pad = ((0, 0), (halo_y, hp - h - halo_y), (halo_x, wp - w - halo_x))
    xp = jnp.pad(x, pad)
    yp = jnp.pad(y, pad)

    tmask = MASKS[config.temporal_kernel]
    if config.normalize_gradients:
        tmask = tmask / tmask.sum()
        sobel_scale = 1.0 / SOBEL_GAIN
    else:
        sobel_scale = 1.0

    g = tile_h + 2 * halo_y
    kernel = functools.partial(
        _lk_kernel,
        tile_h=tile_h,
        halo_y=halo_y,
        halo_x=halo_x,
        img_h=h,
        img_w=w,
        r=r,
        sobel_scale=sobel_scale,
        temporal_mask=tmask,
        det_eps=config.det_eps,
        centered=centered,
        window_weights=getattr(config, "window_weights", "box"),
    )
    in_spec = pl.BlockSpec(
        (pl.Element(1), pl.Element(g), pl.Element(wp)),
        lambda bb, i: (bb, i * tile_h, 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (None, tile_h, wp), lambda bb, i: (bb, i, 0), memory_space=pltpu.VMEM
    )
    u, v = pl.pallas_call(
        kernel,
        grid=(b, ht),
        in_specs=[in_spec, in_spec],
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((b, ht * tile_h, wp), jnp.float32),
            jax.ShapeDtypeStruct((b, ht * tile_h, wp), jnp.float32),
        ),
        interpret=interpret,
    )(xp, yp)
    flow = jnp.stack(
        [u[:, :h, halo_x : halo_x + w], v[:, :h, halo_x : halo_x + w]], axis=-1
    )
    return flow.reshape(lead + (h, w, 2))
