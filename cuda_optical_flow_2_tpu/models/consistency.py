"""Forward-backward consistency / occlusion masking (extension).

NOT in the reference (Kr-Stam/CUDA_Optical_Flow_2 has no flow validation at
all — its only QA is the visual arrow overlay, main.cu:114-174); provided
because dense-flow consumers routinely need a per-pixel validity signal:
backward warping the reverse flow and testing the cycle residual is the
standard occlusion test (|F_fw(x) + F_bw(x + F_fw(x))| small where the
estimate is trustworthy).

TPU-first: the check is a warp (the same backward-warp primitive the models
use) plus elementwise math — it jits into the surrounding pipeline, and
``consistent_flow`` runs forward and backward estimation as one program so
XLA can schedule the two independent passes back to back on-device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cuda_optical_flow_2_tpu.ops.warp import warp_bilinear

__all__ = [
    "fb_consistency",
    "occlusion_mask",
    "occlusion_score",
    "consistent_flow",
]


def fb_consistency(
    flow_fw: jax.Array, flow_bw: jax.Array
) -> jax.Array:
    """Cycle residual |F_fw(x) + F_bw(x + F_fw(x))| per pixel.

    Args:
      flow_fw: (..., H, W, 2) forward flow (prev -> next, the framework's
        convention prev(x) = next(x + d)).
      flow_bw: (..., H, W, 2) backward flow (next -> prev).
    Returns: (..., H, W) float residual magnitude; ~0 where the two fields
    are cycle-consistent, large at occlusions and mistracks.
    """
    cyc2, _ = _cycle_terms(flow_fw, flow_bw)
    return jnp.sqrt(cyc2)


def occlusion_mask(
    flow_fw: jax.Array,
    flow_bw: jax.Array,
    alpha: float = 0.01,
    beta: float = 0.5,
) -> jax.Array:
    """Boolean occlusion/mistrack mask from the cycle residual.

    Uses the standard magnitude-adaptive threshold (Sundaram et al. 2010):
    occluded where |cycle|^2 > alpha * (|F_fw|^2 + |F_bw(x+F_fw)|^2) + beta.
    Returns True where the flow should NOT be trusted.
    """
    return occlusion_score(flow_fw, flow_bw, alpha=alpha) > beta


def occlusion_score(
    flow_fw: jax.Array, flow_bw: jax.Array, alpha: float = 0.01
) -> jax.Array:
    """Continuous occlusion evidence: ``|cycle|^2 - alpha * mag^2``.

    :func:`occlusion_mask` is exactly ``occlusion_score(...) > beta`` — the
    score is the thresholdable form, so precision/recall tradeoffs can be
    swept over ``beta`` from ONE forward/backward flow pair (the layered-
    motion benchmark's PR curves, docs/studies/layered_motion_study.py).
    """
    cyc2, mag2 = _cycle_terms(flow_fw, flow_bw)
    return cyc2 - alpha * mag2


def _cycle_terms(
    flow_fw: jax.Array, flow_bw: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Shared core of the cycle test: backward-warp the reverse flow once,
    return (|cycle|^2, |F_fw|^2 + |F_bw(x+F_fw)|^2)."""
    bw_u = warp_bilinear(flow_bw[..., 0], flow_fw)
    bw_v = warp_bilinear(flow_bw[..., 1], flow_fw)
    ru = flow_fw[..., 0] + bw_u
    rv = flow_fw[..., 1] + bw_v
    cyc2 = ru * ru + rv * rv
    mag2 = (
        flow_fw[..., 0] ** 2
        + flow_fw[..., 1] ** 2
        + bw_u * bw_u
        + bw_v * bw_v
    )
    return cyc2, mag2


def consistent_flow(
    prev: jax.Array,
    nxt: jax.Array,
    config,
    alpha: float = 0.01,
    beta: float = 0.5,
) -> tuple[jax.Array, jax.Array]:
    """Forward flow plus its occlusion mask, in one jittable call.

    Runs the configured model (LK/HS/FB via the config type) in both
    directions and applies :func:`occlusion_mask`.

    Returns (flow, occluded): (..., H, W, 2) and boolean (..., H, W).
    """
    from cuda_optical_flow_2_tpu.models import pyramidal_flow

    flow_fw = pyramidal_flow(prev, nxt, config)
    flow_bw = pyramidal_flow(nxt, prev, config)
    return flow_fw, occlusion_mask(flow_fw, flow_bw, alpha=alpha, beta=beta)
