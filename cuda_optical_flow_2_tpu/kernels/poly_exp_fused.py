"""Pallas polynomial-expansion kernel (Farnebäck quadratic fit).

In-VMEM twin of ops/poly_exp.poly_expansion: per row band, three vertical
{g, g*o, g*o^2} correlations, six horizontal moment correlations, and the
constant G^{-1} mixing, writing the five coefficient planes.  One pass over
the image; the XLA shifted-add formulation is fast standalone but its output
feeds the Pallas step kernels, and an XLA producer whose consumer is a custom
call gets its layout pinned (docs/PERF.md finding 2) — keeping the expansion
in Pallas keeps the whole Farnebäck hot path custom-call to custom-call.

Zero-padding semantics match ops/poly_exp.poly_expansion exactly (zero-padded
frame, interior mixing matrix everywhere).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuda_optical_flow_2_tpu.kernels.fb_step_fused import band_expansion
from cuda_optical_flow_2_tpu.kernels.lk_fused import _round_up, interpret_forced, mosaic_ok
from cuda_optical_flow_2_tpu.ops.poly_exp import gaussian_1d, mixing_matrix

__all__ = ["supported", "poly_expansion_kernel"]

_LANE = 128
_SUBLANE = 8



def supported(img: jax.Array, n: int) -> bool:
    h, w = img.shape[-2:]
    if h < _SUBLANE or w < _SUBLANE or n > 31:
        return False
    return mosaic_ok()


def _kernel(
    img_ref,
    bx_ref,
    by_ref,
    axx_ref,
    ayy_ref,
    axy_ref,
    *,
    tile_h: int,
    halo_y: int,
    r: int,
    g0: np.ndarray,
    g1: np.ndarray,
    g2: np.ndarray,
    mix: np.ndarray,
):
    # Shared in-VMEM expansion on the halo'd band (wrap-contaminated rows
    # stay inside the halo because halo_y >= r), then the sublane-aligned
    # slice to the output rows.
    outs = band_expansion(img_ref[0], g0, g1, g2, mix)
    for ref, plane in zip((bx_ref, by_ref, axx_ref, ayy_ref, axy_ref), outs):
        ref[:, :] = plane[halo_y : halo_y + tile_h, :]


@functools.partial(jax.jit, static_argnames=("n", "sigma", "interpret"))
def poly_expansion_kernel(
    f: jax.Array, n: int = 7, sigma: float = 1.5, interpret: bool = False
) -> tuple[jax.Array, ...]:
    """(..., H, W) -> (bx, by, axx, ayy, axy), all (..., H, W) float32."""
    lead = f.shape[:-2]
    h, w = f.shape[-2:]
    x = f.reshape((-1, h, w)).astype(jnp.float32)
    b = x.shape[0]

    r = n // 2
    halo_y = _round_up(r, _SUBLANE)
    halo_x = r
    wp = _round_up(w + 2 * halo_x, _LANE)

    # ~16 live band arrays (band + 3 ty + 6 moments + 5 outs + temp).
    budget = 24 * 1024 * 1024 // 4
    th_max = (budget // wp - 2 * halo_y) // 16
    tile_h = max(
        _SUBLANE, min(_round_up(h, _SUBLANE), (th_max // _SUBLANE) * _SUBLANE)
    )
    ht = pl.cdiv(h, tile_h)
    hp = ht * tile_h + 2 * halo_y

    xp = jnp.pad(x, ((0, 0), (halo_y, hp - h - halo_y), (halo_x, wp - w - halo_x)))

    g = gaussian_1d(n, sigma)
    o = np.arange(n, dtype=np.float64) - r
    mix = mixing_matrix(n, float(sigma))

    kernel = functools.partial(
        _kernel,
        tile_h=tile_h,
        halo_y=halo_y,
        r=r,
        g0=g.astype(np.float32),
        g1=(g * o).astype(np.float32),
        g2=(g * o * o).astype(np.float32),
        mix=mix,
    )
    in_spec = pl.BlockSpec(
        (pl.Element(1), pl.Element(tile_h + 2 * halo_y), pl.Element(wp)),
        lambda bb, i: (bb, i * tile_h, 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (None, tile_h, wp), lambda bb, i: (bb, i, 0), memory_space=pltpu.VMEM
    )
    shape = jax.ShapeDtypeStruct((b, ht * tile_h, wp), jnp.float32)
    outs = pl.pallas_call(
        kernel,
        grid=(b, ht),
        in_specs=[in_spec],
        out_specs=(out_spec,) * 5,
        out_shape=(shape,) * 5,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(xp)
    return tuple(
        o[:, :h, halo_x : halo_x + w].reshape(lead + (h, w)) for o in outs
    )
