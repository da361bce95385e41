"""Gaussian pyramid: fused binomial blur + 2x subsample.

TPU-native replacement for G9 (g_gauss_pyramid, OptFlowGpu.cu:1193-1271) and
its CPU twin cpu::downscale_gaussian (OptFlowCPU.cpp:112-148).  The reference
evaluates a dense 3x3 loop per output pixel at source coords
(2x-1..2x+1, 2y-1..2y+1) with zero padding; here the same stencil is one
strided separable convolution, device-resident, batched over leading dims.

Grid alignment: output (x, y) is centered on source (2x, 2y) — achieved with
stride-2 correlation and explicit (1, 1) padding, which reproduces the
reference's zero-padded (2x-1) window start exactly.  Odd source sizes follow
the reference's floor semantics (level k is (h >> k, w >> k); the trailing
odd row/column is never read, matching ``pw = w << 1``).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from cuda_optical_flow_2_tpu.constants import BINOMIAL_1D

__all__ = ["pyr_down", "build_pyramid"]


import functools


@functools.lru_cache(maxsize=64)
def _decimation_matrix_cached(n_out: int, n_in: int, k_bytes: bytes, k_len: int):
    k = np.frombuffer(k_bytes, dtype=np.float32, count=k_len)
    r = k_len // 2
    d = np.zeros((n_out, n_in), np.float32)
    for j, c in enumerate(k):
        col0 = -r + j
        for i in range(n_out):
            src = 2 * i + col0
            if 0 <= src < n_in:
                d[i, src] = c
    return d


def _decimation_matrix(n_out: int, n_in: int, k: np.ndarray) -> np.ndarray:
    """Banded matrix D with D[i, 2i + j - r] = k[j], zero-clipped at borders."""
    k32 = np.asarray(k, np.float32).reshape(-1)
    return _decimation_matrix_cached(n_out, n_in, k32.tobytes(), k32.size)


def pyr_down(x: jax.Array, kernel_1d=BINOMIAL_1D, use_pallas: bool = True) -> jax.Array:
    """Blur + 2x downsample: (..., H, W) -> (..., H//2, W//2).

    ``kernel_1d`` is the separable factor of the smoothing mask (default: the
    binomial {1,2,1}/4, whose outer product is the reference's
    GAUS_KERNEL_3x3, kernels.cpp:61-64).  On TPU with the default kernel the
    fused Pallas tile kernel handles it; elsewhere a strided separable XLA
    convolution.
    """
    if use_pallas and kernel_1d is BINOMIAL_1D:
        from cuda_optical_flow_2_tpu.kernels import pyr_down as pd

        if pd.supported(x):
            return pd.pyr_down_pallas(x)
    k = np.asarray(kernel_1d).reshape(-1)
    if k.size % 2 != 1:
        raise ValueError("pyramid kernel must have odd length")
    h, w = x.shape[-2:]
    oh, ow = h // 2, w // 2
    dtype = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    xb = x[..., : 2 * oh, : 2 * ow].astype(dtype)

    # Fused blur + subsample as two banded matmuls on the MXU:
    # out = D_h @ x @ D_w^T with D[i, 2i + j - r] = k[j] (rows clipped at the
    # border = zero padding).  Deliberately NOT lax.conv or strided slices:
    # a TPU conv whose output layout is pinned by a downstream custom call
    # falls back to a slow emitter (11.6 ms vs 0.9 ms at 1080p), and
    # lane-axis stride-2 slices lower to slow relayouts.  The matmuls are
    # ~4 GFLOP at 1080p — noise on the MXU — and layout-friendly.
    dh = jnp.asarray(_decimation_matrix(oh, 2 * oh, k), dtype)
    dw = jnp.asarray(_decimation_matrix(ow, 2 * ow, k), dtype)
    tmp = jnp.einsum("hi,...iw->...hw", dh, xb, precision=lax.Precision.HIGHEST)
    return jnp.einsum(
        "...hw,jw->...hj", tmp, dw, precision=lax.Precision.HIGHEST
    )


def build_pyramid(x: jax.Array, levels: int, kernel_1d=BINOMIAL_1D) -> list[jax.Array]:
    """Level-0..levels-1 pyramid; level k shaped (..., h >> k, w >> k).

    Twin of gpu::gauss_pyramid / cpu::gauss_pyramid loops
    (OptFlowGpu.cu:1262-1271, OptFlowCPU.cpp:151-160).
    """
    h, w = x.shape[-2:]
    pyr = [x]
    for k in range(1, levels):
        th, tw = h >> k, w >> k
        pyr.append(pyr_down(pyr[-1][..., : 2 * th, : 2 * tw], kernel_1d))
    return pyr
