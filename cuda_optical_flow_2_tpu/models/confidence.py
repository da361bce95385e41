"""Per-pixel flow confidence from the structure tensor (extension).

NOT in the reference (its solve divides by the raw determinant with no
validity signal, OptFlowGpu.cu:1810-1899); provided because downstream
consumers need to know WHERE dense LK is trustworthy: the smaller eigenvalue
of the windowed structure tensor G = [[sum Ix^2, sum IxIy], [sum IxIy,
sum Iy^2]] is the classic trackability measure (Shi-Tomasi "good features",
OpenCV's minEigThreshold) — ~0 in flat or single-edge (aperture-problem)
regions, large on corners/texture where the 2x2 solve is well-conditioned.

TPU-first: gradients + one stacked windowed reduction + elementwise
eigenvalue math, all jittable; combine with
models/consistency.occlusion_mask for a motion-dependent signal.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cuda_optical_flow_2_tpu.config import LKConfig
from cuda_optical_flow_2_tpu.ops.gradients import spatial_gradients
from cuda_optical_flow_2_tpu.ops.window import window_sum

__all__ = ["min_eigenvalue", "confidence_mask"]


def min_eigenvalue(frame: jax.Array, config: LKConfig) -> jax.Array:
    """Smaller eigenvalue of the windowed structure tensor, per pixel.

    Args:
      frame: (..., H, W) float grayscale (the PREV frame of a pair — the
        gradients the LK solve actually uses).
      config: supplies the window size and gradient normalization.
    Returns: (..., H, W) float32, normalized by the window pixel count so the
    scale is per-pixel mean squared gradient (comparable across windows).
    """
    ix, iy = spatial_gradients(frame, normalize=config.normalize_gradients)
    sums = window_sum(jnp.stack([ix * ix, iy * iy, ix * iy]), config.window)
    s11, s22, s12 = sums[0], sums[1], sums[2]
    half_tr = 0.5 * (s11 + s22)
    rad = jnp.sqrt(0.25 * (s11 - s22) ** 2 + s12 * s12)
    return (half_tr - rad) / float(config.window * config.window)


def confidence_mask(
    frame: jax.Array, config: LKConfig, threshold: float = 1.0
) -> jax.Array:
    """Boolean mask: True where the LK solve is well-conditioned.

    ``threshold`` is in per-pixel mean-squared-gradient units (uint8-scale
    frames: ~1.0 keeps textured regions, drops flat sky/walls).
    """
    return min_eigenvalue(frame, config) >= threshold
