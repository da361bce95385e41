"""Flow-estimation pipelines (the reference's L3 orchestration layer)."""

# NOTE: the bare function ``horn_schunck`` is deliberately not re-exported —
# it would shadow the ``models.horn_schunck`` submodule attribute; use
# ``pyramidal_hs`` or ``models.horn_schunck.horn_schunck``.
from cuda_optical_flow_2_tpu.models.farneback import FBConfig, pyramidal_farneback
from cuda_optical_flow_2_tpu.models.horn_schunck import HSConfig, pyramidal_hs
from cuda_optical_flow_2_tpu.config import LKConfig
from cuda_optical_flow_2_tpu.models.lucas_kanade import (
    coarse_to_fine,
    compose_flow_pyramid,
    lk_level,
    preprocess,
    pyramidal_lk,
    pyramidal_lk_pyramid,
)
from cuda_optical_flow_2_tpu.models.confidence import (
    confidence_mask,
    good_features,
    min_eigenvalue,
)
from cuda_optical_flow_2_tpu.models.consistency import (
    consistent_flow,
    fb_consistency,
    occlusion_mask,
)
from cuda_optical_flow_2_tpu.models.tvl1 import (
    TVL1_REALTIME,
    TVL1Config,
    pyramidal_tvl1,
)
from cuda_optical_flow_2_tpu.models.dis import (
    DIS_REALTIME,
    DISConfig,
    pyramidal_dis,
)
from cuda_optical_flow_2_tpu.models.streaming import (
    FlowState,
    init_state,
    process_sequence,
    step,
)
from cuda_optical_flow_2_tpu.models.tracking import (
    advect_points,
    sample_flow,
    track_points,
    track_sequence,
)


def pyramidal_flow(prev, nxt, config):
    """Dense flow for one frame pair, dispatched on the config type.

    ``LKConfig`` -> :func:`pyramidal_lk`, ``HSConfig`` -> :func:`pyramidal_hs`,
    ``FBConfig`` -> :func:`pyramidal_farneback`, ``TVL1Config`` ->
    :func:`pyramidal_tvl1`, ``DISConfig`` -> :func:`pyramidal_dis`.  The
    model-generic entry the streaming and parallel layers build on.
    """
    if isinstance(config, HSConfig):
        return pyramidal_hs(prev, nxt, config)
    if isinstance(config, FBConfig):
        return pyramidal_farneback(prev, nxt, config)
    if isinstance(config, TVL1Config):
        return pyramidal_tvl1(prev, nxt, config)
    if isinstance(config, DISConfig):
        return pyramidal_dis(prev, nxt, config)
    if isinstance(config, LKConfig):
        return pyramidal_lk(prev, nxt, config)
    # Explicit rejection: a duck-typed or stale (module-reloaded) config
    # must not silently run the wrong model or die deep inside LK.
    raise TypeError(
        f"config must be an LKConfig / HSConfig / FBConfig / TVL1Config / "
        f"DISConfig instance; got "
        f"{type(config).__module__}.{type(config).__qualname__}"
    )


__all__ = [
    "pyramidal_flow",
    "consistent_flow",
    "fb_consistency",
    "occlusion_mask",
    "confidence_mask",
    "good_features",
    "min_eigenvalue",
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
    "sample_flow",
    "advect_points",
    "track_points",
    "track_sequence",
    "HSConfig",
    "pyramidal_hs",
    "FBConfig",
    "pyramidal_farneback",
    "TVL1_REALTIME",
    "TVL1Config",
    "pyramidal_tvl1",
    "DIS_REALTIME",
    "DISConfig",
    "pyramidal_dis",
]
