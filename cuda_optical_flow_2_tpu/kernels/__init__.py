"""Pallas TPU kernels for the fused hot stages.

These replace the reference's CUDA shared-memory tiling (G4/G6/G14,
OptFlowGpu.cu:282-371, :461-766, :1627-1716) with VMEM ``BlockSpec`` tiling:
the fused LK kernel computes gradients + separable window sums + the 2x2
solve for a whole image tile resident in VMEM, eliminating the reference's 12
kernel launches and ~24 PCIe transfers per level (SURVEY.md section 3.2).
"""

from cuda_optical_flow_2_tpu.kernels import lk_fused

__all__ = ["lk_fused"]
