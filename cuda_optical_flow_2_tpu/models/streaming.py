"""Streaming video flow: carried pyramid state across frames.

TPU-native replacement for the reference's main loop state management
(main.cu:222-275): the reference keeps prev/cur image pyramids in host memory
and pointer-swaps them each frame (main.cu:270-272); here the carried state is
a device-resident pytree of pyramid levels, the per-frame step is one jitted
function, and the state buffers are donated so XLA reuses them in place — the
functional equivalent of the pointer swap, with zero host round trips.

    state = init_state(first_frame, config)
    for frame in frames:
        state, flow = step(state, frame, config)   # jitted, donates state
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from cuda_optical_flow_2_tpu.models.farneback import (
    FBConfig,
    fb_coarse_to_fine,
    fb_preprocess,
)
from cuda_optical_flow_2_tpu.models.horn_schunck import (
    HSConfig,
    hs_coarse_to_fine,
    hs_preprocess,
)
from cuda_optical_flow_2_tpu.models.lucas_kanade import (
    _validate,
    coarse_to_fine,
    preprocess,
)
from cuda_optical_flow_2_tpu.models.tvl1 import (
    TVL1Config,
    tvl1_coarse_to_fine,
    tvl1_preprocess,
)
from cuda_optical_flow_2_tpu.models.dis import (
    DISConfig,
    dis_coarse_to_fine,
    dis_preprocess,
)
from cuda_optical_flow_2_tpu.ops.resize import downsample_flow

__all__ = ["FlowState", "init_state", "step", "process_sequence"]


def _preprocess(frame: jax.Array, config) -> list[jax.Array]:
    """Model-generic preprocess: dispatches on the config type
    (LK/HS/FB/TVL1/DIS)."""
    if isinstance(config, HSConfig):
        return hs_preprocess(frame, config)
    if isinstance(config, FBConfig):
        return fb_preprocess(frame, config)
    if isinstance(config, TVL1Config):
        return tvl1_preprocess(frame, config)
    if isinstance(config, DISConfig):
        return dis_preprocess(frame, config)
    return preprocess(frame, config)


def _flow(
    prev_pyr: list[jax.Array],
    next_pyr: list[jax.Array],
    config,
    init_flow: jax.Array | None = None,
) -> jax.Array:
    if isinstance(config, HSConfig):
        return hs_coarse_to_fine(prev_pyr, next_pyr, config, init_flow)
    if isinstance(config, FBConfig):
        return fb_coarse_to_fine(prev_pyr, next_pyr, config, init_flow)
    if isinstance(config, TVL1Config):
        return tvl1_coarse_to_fine(prev_pyr, next_pyr, config, init_flow)
    if isinstance(config, DISConfig):
        return dis_coarse_to_fine(prev_pyr, next_pyr, config, init_flow)
    return coarse_to_fine(prev_pyr, next_pyr, config, init_flow)[0]


class FlowState(NamedTuple):
    """Carried per-stream state: the previous frame's pyramid (coarse last)
    and, when warm-starting, the previous pair's flow (else None)."""

    pyramid: tuple[jax.Array, ...]
    flow: jax.Array | None = None


@functools.partial(jax.jit, static_argnames=("config",))
def init_state(frame: jax.Array, config) -> FlowState:
    """Build the initial state from the first frame (main.cu:209 equivalent).

    ``config`` is an :class:`LKConfig` or :class:`HSConfig` — the streaming
    layer is model-generic over the pyramidal families.
    """
    return FlowState(tuple(_preprocess(frame.astype(jnp.float32), config)))


@functools.partial(
    jax.jit, static_argnames=("config", "warm_start"), donate_argnums=(0,)
)
def step(
    state: FlowState, frame: jax.Array, config, warm_start: bool = False
) -> tuple[FlowState, jax.Array]:
    """One frame step: returns (new state, dense flow prev->frame).

    The old pyramid buffers are donated; XLA writes the new pyramid into
    them — the TPU-native version of the reference's pointer swap
    (main.cu:270-272).

    ``warm_start=True`` seeds the coarsest level with the previous pair's
    flow (downsampled through the pyramid's floor-halving grids).  Tracked
    motion then stays within the per-level search range even with a shallow
    pyramid — the serving configuration is fewer levels + warm start.
    """
    pyr = _preprocess(frame.astype(jnp.float32), config)
    init = None
    if warm_start and state.flow is not None:
        init = downsample_flow(state.flow, pyr[-1].shape[-2:])
    flow = _flow(list(state.pyramid), pyr, config, init)
    return FlowState(tuple(pyr), flow if warm_start else None), flow


def process_sequence(frames, config, warm_start: bool = False):
    """Convenience driver: yields (frame_index, flow) for frames[1:].

    ``frames`` is any iterable of (H, W) arrays (NumPy or jax) — finite OR
    unbounded (the live-capture twin of the reference's while(true) loop,
    main.cu:222-275).  A :class:`utils.native.FrameStream` yields
    ``(t, frame)`` tuples, so unpack it first::

        with FrameStream.synthetic(None, h, w, vx=2, vy=1) as src:
            for i, flow in process_sequence((f for _, f in src), cfg):
                ...
    ``config`` selects the model family (LKConfig / HSConfig / FBConfig /
    TVL1Config / DISConfig).  Host->device transfer happens once per frame at this
    boundary — the reference crosses PCIe ~24 times per level per frame
    (SURVEY.md section 3.1) — and in the frame's NATIVE dtype: a uint8
    source (PNG/Y4M/native stream) ships 1 byte/px over the host link and
    is cast to float32 on device inside the jitted step, not 4 bytes/px
    after a host-side cast.  ``warm_start`` seeds each pair with the
    previous pair's flow (see :func:`step`).

    Decode-failure recovery: a ``None`` element (how
    :class:`utils.native.FrameStream` reports a per-frame decode failure)
    is SKIPPED — no flow is yielded for it, the next good frame pairs with
    the last good frame, and the carried warm flow is dropped (the motion
    gap across the lost frame invalidates it as a seed).  Memory stays
    bounded: the carried state is one pyramid + one flow regardless of
    stream length.
    """
    it = iter(frames)
    # Pull frames until the first GOOD one (leading decode failures skip).
    first = None
    offset = 0
    for offset, frame in enumerate(it):
        if frame is not None:
            first = jnp.asarray(frame)
            break
    if first is None:
        return
    # Shape/levels validation is model-generic (every config has .levels);
    # fail with the friendly error before tracing any model's preprocess.
    _validate(first, first, config)
    state = init_state(first, config)
    for i, frame in enumerate(it, start=offset + 1):
        if frame is None:
            if state.flow is not None:
                state = FlowState(state.pyramid, None)
            continue
        state, flow = step(state, jnp.asarray(frame), config, warm_start)
        yield i, flow
