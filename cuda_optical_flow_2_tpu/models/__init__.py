"""Flow-estimation pipelines (the reference's L3 orchestration layer)."""

# NOTE: the bare function ``horn_schunck`` is deliberately not re-exported —
# it would shadow the ``models.horn_schunck`` submodule attribute; use
# ``pyramidal_hs`` or ``models.horn_schunck.horn_schunck``.
from cuda_optical_flow_2_tpu.models.farneback import FBConfig, pyramidal_farneback
from cuda_optical_flow_2_tpu.models.horn_schunck import HSConfig, pyramidal_hs
from cuda_optical_flow_2_tpu.models.lucas_kanade import (
    coarse_to_fine,
    compose_flow_pyramid,
    lk_level,
    preprocess,
    pyramidal_lk,
    pyramidal_lk_pyramid,
)
from cuda_optical_flow_2_tpu.models.streaming import (
    FlowState,
    init_state,
    process_sequence,
    step,
)

__all__ = [
    "lk_level",
    "pyramidal_lk",
    "pyramidal_lk_pyramid",
    "compose_flow_pyramid",
    "coarse_to_fine",
    "preprocess",
    "FlowState",
    "init_state",
    "step",
    "process_sequence",
    "HSConfig",
    "pyramidal_hs",
    "FBConfig",
    "pyramidal_farneback",
]
