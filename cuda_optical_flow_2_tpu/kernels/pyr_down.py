"""Pallas fused Gaussian blur + 2x subsample (pyramid level).

TPU-native replacement for G9 (g_gauss_pyramid, OptFlowGpu.cu:1193-1271):
the reference evaluates the dense 3x3 binomial at source coords
(2x-1..2x+1, 2y-1..2y+1) per output pixel; here each VMEM tile applies the
stencil with static rolls (free on the sublane axis) and subsamples with a
stride-2 slice, writing the half-resolution tile straight back to HBM —
half the traffic of blur-then-subsample through XLA.

Grid alignment matches ops/pyramid.py pyr_down exactly: output (x, y) is the
zero-padded stencil centered on source (2x, 2y).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuda_optical_flow_2_tpu.constants import GAUS_KERNEL_3X3
from cuda_optical_flow_2_tpu.kernels.lk_fused import _roll, _round_up

__all__ = ["pyr_down_pallas", "supported"]

_LANE = 128
_SUBLANE = 8
_HALO = 4  # rows/cols of margin around the 2x-scale tile (stencil radius 1)



def supported(x: jax.Array) -> bool:
    # Mosaic currently rejects both lane-strided slices and the
    # (to, wp//2, 2) subsample reshape this kernel needs ("Shape mismatch in
    # input, indices and output"), so TPU dispatch stays off; the kernel is
    # validated in interpreter mode and the XLA strided conv (1.5 ms for a
    # full 5-level 1080p pyramid) serves the TPU path.
    return False



def _kernel(src_ref, out_ref, *, to: int, mask: np.ndarray):
    src = src_ref[0]
    g, wp = src.shape
    blurred = None
    for p in range(3):
        for q in range(3):
            t = _roll(src, p - 1, 0)
            t = _roll(t, q - 1, 1)
            t = t * float(mask[p, q])
            blurred = t if blurred is None else blurred + t
    # Output row t samples blurred tile row 2t + HALO; col c samples
    # 2c + HALO.  Shift by HALO, stride-2 the sublane axis directly, and
    # halve the lane axis via a (to, wp//2, 2) reshape (Mosaic rejects
    # lane-strided slices but handles the relayout).
    shifted = _roll(_roll(blurred, _HALO, 0), _HALO, 1)
    rows = shifted[: 2 * to : 2, :]
    out_ref[:, :] = rows.reshape(to, wp // 2, 2)[:, :, 0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def pyr_down_pallas(x: jax.Array, interpret: bool = False) -> jax.Array:
    """(..., H, W) float32 -> (..., H//2, W//2), fused blur + subsample."""
    lead = x.shape[:-2]
    h, w = x.shape[-2:]
    oh, ow = h // 2, w // 2
    xb = x[..., : 2 * oh, : 2 * ow].reshape((-1, 2 * oh, 2 * ow)).astype(jnp.float32)
    b = xb.shape[0]

    # Output tile (TO, WPo); input tile (2*TO + 2*HALO, 2*WPo).
    wpo = _round_up(ow, _LANE)
    wp = 2 * wpo
    budget = 8 * 1024 * 1024 // 4
    to_max = budget // (8 * wp)  # ~4 live tile-sized arrays at 2x rows
    to = max(_SUBLANE, min(_round_up(oh, _SUBLANE), (to_max // _SUBLANE) * _SUBLANE))
    ht = pl.cdiv(oh, to)
    hp = 2 * (ht * to) + 2 * _HALO

    xp = jnp.pad(
        xb, ((0, 0), (_HALO, hp - 2 * oh - _HALO), (_HALO, wp - 2 * ow - _HALO))
    )
    kernel = functools.partial(_kernel, to=to, mask=GAUS_KERNEL_3X3)
    out = pl.pallas_call(
        kernel,
        grid=(b, ht),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(1), pl.Element(2 * to + 2 * _HALO), pl.Element(wp)),
                lambda bb, i: (bb, i * 2 * to, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (None, to, wpo), lambda bb, i: (bb, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, ht * to, wpo), jnp.float32),
        interpret=interpret,
    )(xp)
    # Output col c sampled input col 2c + HALO - HALO_pad... the stride-2
    # slice starts at padded col HALO, i.e. source col 0's stencil center —
    # so out col c corresponds to image col c directly; crop rows/cols.
    out = out[:, :oh, :ow]
    return out.reshape(lead + (oh, ow))
