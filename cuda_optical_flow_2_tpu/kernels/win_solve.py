"""Fused windowed-sums + guarded 2x2 solve Pallas kernel.

Generic "normal equations" tail shared by flow models: given five per-pixel
product planes (G11, G12, G22, H1, H2), box-sum each over a window x window
neighborhood and solve [[G11,G12],[G12,G22]] d = (H1, H2) per pixel.  The
Farnebäck displacement step (models/farneback.py) is exactly this on its
averaged-coefficient products; LK's equivalent lives fused with the gradient
computation in lk_fused.py.

Why a kernel: the XLA path (separable ones-convolution per plane) hits the
slow TPU conv emitter when a downstream custom call pins its layout
(docs/PERF.md finding 2 — measured ~7x slower in context than standalone
inside the FB iteration, whose warp is a Pallas call), and round-trips 7
image-sized arrays through HBM.  Here each row band is loaded once; the box
sums are shift-doubling rolls in VMEM (O(log window) adds) and only (u, v)
return to HBM.  Same halo/tiling scheme as lk_fused.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuda_optical_flow_2_tpu.kernels.lk_fused import (
    _box_sum,
    _round_up,
    interpret_forced,
    mosaic_ok,
)

__all__ = ["supported", "window_solve"]

_LANE = 128
_SUBLANE = 8
_MAX_WINDOW = 33


def supported(x: jax.Array, window: int) -> bool:
    h, w = x.shape[-2:]
    if h < _SUBLANE or w < _SUBLANE or window > _MAX_WINDOW:
        return False
    return mosaic_ok()


def _kernel(
    p11_ref, p12_ref, p22_ref, h1_ref, h2_ref, u_ref, v_ref,
    *, tile_h: int, halo_y: int, r: int, det_eps: float,
):
    def win(ref):
        rows = _box_sum(ref[0], r, 0)[halo_y : halo_y + tile_h, :]
        return _box_sum(rows, r, 1)

    g11 = win(p11_ref)
    g12 = win(p12_ref)
    g22 = win(p22_ref)
    h1 = win(h1_ref)
    h2 = win(h2_ref)

    det = g11 * g22 - g12 * g12
    safe = jnp.abs(det) >= det_eps
    inv_det = 1.0 / jnp.where(safe, det, jnp.ones_like(det))
    zero = jnp.zeros_like(det)
    u_ref[:] = jnp.where(safe, (g22 * h1 - g12 * h2) * inv_det, zero)
    v_ref[:] = jnp.where(safe, (g11 * h2 - g12 * h1) * inv_det, zero)


def _pick_tile_h(wp: int, halo_y: int, h: int) -> int:
    """Largest band whose ~8 live (G, WP) f32 tiles fit in ~20 MB VMEM."""
    budget = 20 * 1024 * 1024
    cap = max(8, ((h + 7) // 8) * 8)  # never exceed the image height
    for th in (256, 128, 64, 32, 16, 8):
        g = th + 2 * halo_y
        if 8 * g * wp * 4 <= budget:
            return min(th, cap)
    return 8


@functools.partial(jax.jit, static_argnames=("window", "det_eps", "interpret"))
def window_solve(
    p11: jax.Array,
    p12: jax.Array,
    p22: jax.Array,
    h1: jax.Array,
    h2: jax.Array,
    window: int,
    det_eps: float = 1e-6,
    interpret: bool = False,
) -> jax.Array:
    """Box-window the five (..., H, W) planes and solve -> flow (..., H, W, 2).

    Windows are zero-padded outside the image (same semantics as
    ops/window.window_sum).  det_eps <= 0 disables the singularity guard.
    """
    lead = p11.shape[:-2]
    h, w = p11.shape[-2:]
    planes = [
        x.reshape((-1, h, w)).astype(jnp.float32) for x in (p11, p12, p22, h1, h2)
    ]
    b = planes[0].shape[0]

    r = window // 2
    halo_x = r + 1
    halo_y = _round_up(r + 1, _SUBLANE)
    wp = _round_up(w + 2 * halo_x, _LANE)
    tile_h = _pick_tile_h(wp, halo_y, h)
    ht = pl.cdiv(h, tile_h)
    hp = ht * tile_h + 2 * halo_y

    pad = ((0, 0), (halo_y, hp - h - halo_y), (halo_x, wp - w - halo_x))
    padded = [jnp.pad(x, pad) for x in planes]

    g = tile_h + 2 * halo_y
    kernel = functools.partial(
        _kernel, tile_h=tile_h, halo_y=halo_y, r=r, det_eps=det_eps
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
        in_specs=[in_spec] * 5,
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((b, ht * tile_h, wp), jnp.float32),
            jax.ShapeDtypeStruct((b, ht * tile_h, wp), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*padded)
    flow = jnp.stack(
        [u[:, :h, halo_x : halo_x + w], v[:, :h, halo_x : halo_x + w]], axis=-1
    )
    return flow.reshape(lead + (h, w, 2))
