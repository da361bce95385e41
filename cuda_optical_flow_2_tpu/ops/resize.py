"""Flow upsampling and nearest-neighbor upscaling.

``upsample_flow`` is the coarse-to-fine propagation step: the reference never
materializes an upsampled flow — its warp samples the coarser field directly
at (i >> s, j >> s) and scales by 2^s (the *correct* accumulation lives in the
visualizer, main.cu:138-147) — but the production pipeline carries a single
dense flow down the pyramid, so the coarser field is resized to the finer grid
and doubled.

``upscale_nn`` is the debug-path twin of utils::upscale_1ch/upscale_3ch
(OptFlowUtils.cpp:21-61): exact 2^n pixel replication.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["upsample_flow", "upscale_nn"]


def upsample_flow(flow: jax.Array, shape: tuple[int, int]) -> jax.Array:
    """Resize (..., h, w, 2) flow to (..., H, W, 2) and scale values by H/h.

    Bilinear resize (jax.image) with the pixel-magnitude scaling the finer
    grid requires; for the exact 2x pyramid step this is a doubling, matching
    the visualizer's 2^scale multiplier (main.cu:144-146).
    """
    th, tw = shape
    h, w = flow.shape[-3:-1]
    if (th, tw) == (h, w):
        return flow
    scale = jnp.asarray([tw / w, th / h], dtype=flow.dtype)
    out = jax.image.resize(
        flow, flow.shape[:-3] + (th, tw, 2), method="bilinear", antialias=False
    )
    return out * scale


def upscale_nn(img: jax.Array, n: int) -> jax.Array:
    """Replicate each pixel into a 2^n x 2^n block (debug visualization).

    Twin of utils::upscale_1ch / upscale_3ch (OptFlowUtils.cpp:21-61); operates
    on (..., H, W) planes.
    """
    f = 1 << n
    out = jnp.repeat(img, f, axis=-2)
    return jnp.repeat(out, f, axis=-1)
