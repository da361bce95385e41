"""Flow-estimation pipelines (the reference's L3 orchestration layer)."""

from cuda_optical_flow_2_tpu.models.lucas_kanade import (
    lk_level,
    pyramidal_lk,
    pyramidal_lk_pyramid,
    compose_flow_pyramid,
)

__all__ = [
    "lk_level",
    "pyramidal_lk",
    "pyramidal_lk_pyramid",
    "compose_flow_pyramid",
]
