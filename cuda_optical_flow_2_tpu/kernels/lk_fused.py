"""Fused LK level kernel: gradients + windowed sums + 2x2 solve in VMEM.

Replaces the composition G7 + G13 + G16 of the reference hot path
(OptFlowGpu.cu:1929-1964): where the reference launches 12 kernels with ~24
PCIe transfers per level, this computes the residual flow for a whole image
tile without leaving VMEM.

This module is the dispatch point; the kernel itself lands in the next
milestone — ``supported`` returns False until then and the pipeline uses the
pure-XLA ops path.
"""

from __future__ import annotations

import jax

from cuda_optical_flow_2_tpu.config import LKConfig

__all__ = ["supported", "lk_residual"]


def supported(prev: jax.Array, config: LKConfig) -> bool:
    """Whether the fused Pallas kernel can handle this shape/config."""
    return False


def lk_residual(prev: jax.Array, nxt: jax.Array, config: LKConfig) -> jax.Array:
    raise NotImplementedError("fused Pallas LK kernel lands in the next milestone")
