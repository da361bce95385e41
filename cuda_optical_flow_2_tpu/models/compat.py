"""Reference-exact JAX pipelines (compat profiles).

BASELINE config 1 requires the framework to reproduce the reference CPU
implementation *exactly* ("exact vs OptFlowCPU semantics"), and the north star
requires matching its flow fields within float32 tolerance at every level.
This module implements both reference paths in JAX, bug-for-bug:

* ``cpu``: the OptFlowCPU.cpp path — uchar-truncating convolutions, uint8
  wraparound It, 9x9 integer window sums, double solve with the unscaled-``c``
  bug, (0,0)-sampled nearest warp.
* ``gpu``: the live OptFlowGpu.cu path — float gradients, unnormalized Dt_3x3
  temporal kernel, 19x19 float window sums, double solve (all four scaled),
  same buggy warp (the GPU path calls the CPU warp, OptFlowGpu.cu:1920).

Integer stages are exact on any backend.  The double-precision solve uses
float64 when ``jax_enable_x64`` is on (tests do this); otherwise float32 —
production work should use models/lucas_kanade.py, not this module.

All functions here take interleaved (H, W, 3) uint8 images, like the
reference's buffers.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from cuda_optical_flow_2_tpu.constants import (
    DT_3X3,
    DX_3X3,
    DY_3X3,
    GAUS_KERNEL_3X3,
)
from cuda_optical_flow_2_tpu.ops.window import window_sum

__all__ = [
    "conv_3ch_to_1ch_u8",
    "conv_3ch_1ch_f32",
    "sub_arr_u8",
    "downscale_gaussian_u8",
    "build_pyramid_u8",
    "srm_1ch_i32",
    "shift_back_exact",
    "lk_level_exact",
    "pyramidal_lk_exact",
]


def _solve_dtype() -> jnp.dtype:
    return jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32


def conv_3ch_to_1ch_u8(src: jax.Array, mask: np.ndarray) -> jax.Array:
    """Per-tap-truncating uchar convolution of channel 0.

    Exact twin of cpu::conv_3ch_to_1ch (OptFlowCPU.cpp:75-109): the int
    accumulator truncates toward zero after every in-bounds tap; the final
    ``(unsigned char)`` cast wraps modulo 256.  Accumulator magnitudes stay
    below 2^12, so float32 ``trunc`` is exact.
    """
    mh, mw = mask.shape
    h, w = src.shape[:2]
    plane = src[..., 0].astype(jnp.float32)
    padded = jnp.zeros((h + mh - 1, w + mw - 1), dtype=jnp.float32)
    padded = jax.lax.dynamic_update_slice(padded, plane, (mh // 2, mw // 2))
    acc = jnp.zeros((h, w), dtype=jnp.float32)
    for i in range(mh):
        for j in range(mw):
            tap = jax.lax.dynamic_slice(padded, (i, j), (h, w)) * float(mask[i, j])
            acc = jnp.trunc(acc + tap)
    return jnp.mod(acc.astype(jnp.int32), 256).astype(jnp.uint8)


def conv_3ch_1ch_f32(src: jax.Array, mask: np.ndarray) -> jax.Array:
    """Float gradient convolution of channel 0, zero-padded.

    Twin of g_conv_3ch_1ch_constant_uchar_float (OptFlowGpu.cu:1041-1089).
    """
    mh, mw = mask.shape
    h, w = src.shape[:2]
    plane = src[..., 0].astype(jnp.float32)
    padded = jnp.zeros((h + mh - 1, w + mw - 1), dtype=jnp.float32)
    padded = jax.lax.dynamic_update_slice(padded, plane, (mh // 2, mw // 2))
    acc = jnp.zeros((h, w), dtype=jnp.float32)
    for i in range(mh):
        for j in range(mw):
            if float(mask[i, j]) == 0.0:
                continue
            acc = acc + jax.lax.dynamic_slice(padded, (i, j), (h, w)) * float(
                mask[i, j]
            )
    return acc


def sub_arr_u8(a: jax.Array, b: jax.Array) -> jax.Array:
    """uint8 wraparound subtraction (cpu::sub_arr, OptFlowCPU.cpp:11-17)."""
    return (a.astype(jnp.int32) - b.astype(jnp.int32)).astype(jnp.uint8)


def downscale_gaussian_u8(src: jax.Array, mask: np.ndarray = GAUS_KERNEL_3X3) -> jax.Array:
    """Fused blur + 2x subsample with trunc-to-uchar output.

    Exact twin of cpu::downscale_gaussian / g_gauss_pyramid
    (OptFlowCPU.cpp:112-148, OptFlowGpu.cu:1198-1232): float32 accumulation in
    tap order, zero padding, truncating uchar cast.
    """
    sh, sw = src.shape[:2]
    h, w = sh >> 1, sw >> 1
    mh, mw = mask.shape
    hmh, hmw = mh >> 1, mw >> 1
    src_f = src[: 2 * h, : 2 * w].astype(jnp.float32)
    padded = jnp.zeros((2 * h + mh - 1, 2 * w + mw - 1, 3), dtype=jnp.float32)
    padded = jax.lax.dynamic_update_slice(padded, src_f, (hmh, hmw, 0))
    acc = jnp.zeros((h, w, 3), dtype=jnp.float32)
    for p in range(mh):
        for q in range(mw):
            # output (y, x) taps source (2y - hmh + p, 2x - hmw + q).
            tap = jax.lax.slice(
                padded, (p, q, 0), (p + 2 * h, q + 2 * w, 3), (2, 2, 1)
            ) * float(mask[p, q])
            acc = acc + tap
    return jnp.trunc(acc).astype(jnp.int32).astype(jnp.uint8)


def build_pyramid_u8(base: jax.Array, levels: int) -> list[jax.Array]:
    """Exact uchar pyramid (gpu::gauss_pyramid, OptFlowGpu.cu:1262-1271)."""
    h, w = base.shape[:2]
    pyr = [base]
    for k in range(1, levels):
        th, tw = h >> k, w >> k
        pyr.append(downscale_gaussian_u8(pyr[-1][: 2 * th, : 2 * tw]))
    return pyr


def srm_1ch_i32(a: jax.Array, b: jax.Array, window: int) -> jax.Array:
    """Exact integer windowed product sums (cpu::srm_1ch, OptFlowCPU.cpp:162-200).

    Uses the integral-image backend, which is exact for integers.  With x64
    enabled the cumsum runs in int64 (safe at any image size); otherwise int32,
    which is exact while total image energy stays below 2^31 (uchar products
    over ~33k pixels — fine for the test sizes this profile serves).
    """
    acc_t = jnp.int64 if jax.config.read("jax_enable_x64") else jnp.int32
    prod = a.astype(acc_t) * b.astype(acc_t)
    return window_sum(prod, window, method="cumsum").astype(jnp.int32)


def shift_back_exact(
    src: jax.Array,
    level: int,
    max_level: int,
    flow_pyramid: list[jax.Array],
) -> jax.Array:
    """Bug-exact coarse-to-fine warp (cpu::shift_back_pyramid).

    Because of the reference's ``1 >> offset`` bug the cumulative flow is a
    single (u, v) from pixel (0, 0) of each coarser level
    (OptFlowCPU.cpp:260-265), so the warp is a uniform integer shift with C
    trunc-toward-zero and keep-original out-of-bounds handling.
    """
    h, w = src.shape[:2]
    dtype = _solve_dtype()
    u = jnp.zeros((), dtype=dtype)
    v = jnp.zeros((), dtype=dtype)
    for k in range(max_level - 1, level, -1):
        mult = float(1 << (k - level))
        u = u + mult * flow_pyramid[k][0, 0, 0].astype(dtype)
        v = v + mult * flow_pyramid[k][0, 0, 1].astype(dtype)
    jj = jax.lax.broadcasted_iota(dtype, (h, w), 1)
    ii = jax.lax.broadcasted_iota(dtype, (h, w), 0)
    new_x = jnp.trunc(jj + u).astype(jnp.int32)
    new_y = jnp.trunc(ii + v).astype(jnp.int32)
    valid = (new_x >= 0) & (new_x < w) & (new_y >= 0) & (new_y < h)
    idx = jnp.clip(new_y, 0, h - 1) * w + jnp.clip(new_x, 0, w - 1)
    flat = src.reshape(h * w, 3)
    gathered = jnp.take(flat, idx.reshape(-1), axis=0).reshape(h, w, 3)
    return jnp.where(valid[..., None], gathered, src)


def lk_level_exact(
    prev: jax.Array,
    nxt: jax.Array,
    flow_pyramid: list[jax.Array],
    level: int,
    max_level: int,
    window: int,
    profile: str,
) -> jax.Array:
    """One LK level with reference-exact semantics; returns the level's flow.

    ``profile``: "cpu" (OptFlowCPU.cpp:312-399) or "gpu"
    (OptFlowGpu.cu:1909-1979).
    """
    if level != max_level - 1:
        nxt = shift_back_exact(nxt, level, max_level, flow_pyramid)

    dtype = _solve_dtype()
    if profile == "cpu":
        ix = conv_3ch_to_1ch_u8(prev, DX_3X3)
        iy = conv_3ch_to_1ch_u8(prev, DY_3X3)
        it1 = conv_3ch_to_1ch_u8(prev, GAUS_KERNEL_3X3)
        it2 = conv_3ch_to_1ch_u8(nxt, GAUS_KERNEL_3X3)
        it = sub_arr_u8(it2, it1)
        sum_ix2 = srm_1ch_i32(ix, ix, window).astype(dtype)
        sum_iy2 = srm_1ch_i32(iy, iy, window).astype(dtype)
        sum_ixiy = srm_1ch_i32(ix, iy, window).astype(dtype)
        sum_ixit = srm_1ch_i32(ix, it, window).astype(dtype)
        sum_iyit = srm_1ch_i32(iy, it, window).astype(dtype)
    elif profile == "gpu":
        ix = conv_3ch_1ch_f32(prev, DX_3X3)
        iy = conv_3ch_1ch_f32(prev, DY_3X3)
        it = conv_3ch_1ch_f32(nxt, DT_3X3) - conv_3ch_1ch_f32(prev, DT_3X3)
        sum_ix2 = window_sum(ix * ix, window).astype(dtype)
        sum_iy2 = window_sum(iy * iy, window).astype(dtype)
        sum_ixiy = window_sum(ix * iy, window).astype(dtype)
        sum_ixit = window_sum(ix * it, window).astype(dtype)
        sum_iyit = window_sum(iy * it, window).astype(dtype)
    else:
        raise ValueError(f"unknown profile {profile!r}")

    a, b, c, d = sum_ix2, sum_ixiy, sum_ixiy, sum_iy2
    prefix = 1.0 / (a * d - b * c)
    if profile == "cpu":
        # Reference bug: c is never scaled by prefix (OptFlowCPU.cpp:374-376).
        u = (-(d * prefix) * sum_ixit + (b * prefix) * sum_iyit).astype(jnp.float32)
        v = (c * sum_ixit - (a * prefix) * sum_iyit).astype(jnp.float32)
    else:
        u = (-(d * prefix) * sum_ixit + (b * prefix) * sum_iyit).astype(jnp.float32)
        v = ((c * prefix) * sum_ixit - (a * prefix) * sum_iyit).astype(jnp.float32)
    return jnp.stack([u, v], axis=-1)


def pyramidal_lk_exact(
    prev: jax.Array,
    nxt: jax.Array,
    levels: int,
    window: int | None = None,
    profile: str = "cpu",
) -> list[jax.Array]:
    """Full reference-exact coarse-to-fine pass on (H, W, 3) uint8 frames.

    Builds exact uchar pyramids and runs the per-level solve coarsest-first
    (main.cu:256-262).  Default windows follow the reference: 9 for the CPU
    profile, 19 for the GPU profile.
    """
    if window is None:
        window = 9 if profile == "cpu" else 19
    prev_pyr = build_pyramid_u8(prev, levels)
    next_pyr = build_pyramid_u8(nxt, levels)
    flow_pyramid: list[jax.Array] = [
        jnp.zeros(p.shape[:2] + (2,), dtype=jnp.float32) for p in prev_pyr
    ]
    for k in range(levels - 1, -1, -1):
        flow_pyramid[k] = lk_level_exact(
            prev_pyr[k], next_pyr[k], flow_pyramid, k, levels, window, profile
        )
    return flow_pyramid
