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

from cuda_optical_flow_2_tpu.config import LKConfig
from cuda_optical_flow_2_tpu.models.lucas_kanade import (
    _validate,
    coarse_to_fine,
    preprocess,
)

__all__ = ["FlowState", "init_state", "step", "process_sequence"]


class FlowState(NamedTuple):
    """Carried per-stream state: the previous frame's pyramid (coarse last)."""

    pyramid: tuple[jax.Array, ...]


@functools.partial(jax.jit, static_argnames=("config",))
def init_state(frame: jax.Array, config: LKConfig) -> FlowState:
    """Build the initial state from the first frame (main.cu:209 equivalent)."""
    return FlowState(tuple(preprocess(frame.astype(jnp.float32), config)))


@functools.partial(jax.jit, static_argnames=("config",), donate_argnums=(0,))
def step(
    state: FlowState, frame: jax.Array, config: LKConfig
) -> tuple[FlowState, jax.Array]:
    """One frame step: returns (new state, dense flow prev->frame).

    The old pyramid buffers are donated; XLA writes the new pyramid into
    them — the TPU-native version of the reference's pointer swap
    (main.cu:270-272).
    """
    pyr = preprocess(frame.astype(jnp.float32), config)
    flow = coarse_to_fine(list(state.pyramid), pyr, config)[0]
    return FlowState(tuple(pyr)), flow


def process_sequence(frames, config: LKConfig):
    """Convenience driver: yields (frame_index, flow) for frames[1:].

    ``frames`` is any iterable of (H, W) arrays (NumPy or jax).  Host->device
    transfer happens once per frame at this boundary — the reference crosses
    PCIe ~24 times per level per frame (SURVEY.md section 3.1).
    """
    it = iter(frames)
    first = jnp.asarray(next(it), dtype=jnp.float32)
    _validate(first, first, config)
    state = init_state(first, config)
    for i, frame in enumerate(it, start=1):
        state, flow = step(state, jnp.asarray(frame, dtype=jnp.float32), config)
        yield i, flow
