"""In-kernel 2x interleave/expansion primitives (Mosaic-friendly forms).

The coarse-to-fine flow upsample (ops/resize.upsample_flow) is a 2x bilinear
expansion.  Fusing it INTO the fused level kernel (kernels/lk_step_fused)
removes the separate XLA upsample pass and shrinks the kernel's flow-input
HBM traffic 4x — but a naive `(T, W/2, 2) -> (T, W)` interleave reshape on
the lane axis is rejected by Mosaic (docs/PERF.md "Remaining levers").  The
two primitives here avoid it:

* rows (sublane axis): ``stack + reshape`` keeps the lane dimension intact,
  which Mosaic lowers fine — identical to ops/resize._up2x_axis's form.
* lanes: a log-depth block-merge network of static ``pltpu.roll`` +
  ``where`` stages.  ``[A | B] -> zip(A, B)`` by, for chunk sizes
  s = W, W/2, ..., 4, swapping each aligned s-chunk's second quarter with
  its third quarter.  Requires the lane extent to be a power of two
  (callers gate on it); log2(W)-1 stages of 2 rolls + 2 selects.

Both are pure jax-on-Refs code usable inside any Pallas TPU kernel (and
under interpret mode).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["interleave_rows", "interleave_lanes"]


def _roll(x: jax.Array, s: int, axis: int, in_kernel: bool) -> jax.Array:
    """Rotate along axis.  ``in_kernel=True`` (the caller is tracing inside a
    Pallas TPU kernel body) selects the Mosaic rotate primitive; outside a
    kernel ``pltpu.roll`` cannot lower, so use ``jnp.roll``.  The flag is
    explicit rather than try/except so an unrelated trace-time error from
    ``pltpu.roll`` is never silently swallowed (ADVICE r3)."""
    if s % x.shape[axis] == 0:
        return x
    if in_kernel:
        from jax.experimental.pallas import tpu as pltpu

        return pltpu.roll(x, s % x.shape[axis], axis)
    return jnp.roll(x, s, axis=axis)


def interleave_rows(a: jax.Array, b: jax.Array) -> jax.Array:
    """(T, W), (T, W) -> (2T, W) with out[2k] = a[k], out[2k+1] = b[k]."""
    t, w = a.shape
    return jnp.stack([a, b], axis=1).reshape(2 * t, w)


def interleave_lanes(
    a: jax.Array, b: jax.Array, *, in_kernel: bool = False
) -> jax.Array:
    """(T, W2), (T, W2) -> (T, 2*W2) with out[:, 2j] = a[:, j],
    out[:, 2j+1] = b[:, j].  ``2*W2`` must be a power of two.

    Pass ``in_kernel=True`` when calling from inside a Pallas TPU kernel
    body (uses ``pltpu.roll``); the default uses ``jnp.roll`` for plain
    traced/eager use."""
    t, w2 = a.shape
    w = 2 * w2
    if w & (w - 1):
        raise ValueError(f"interleave_lanes needs a power-of-two width, got {w}")
    x = jnp.concatenate([a, b], axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (t, w), 1)
    s = w
    while s >= 4:
        q = s // 4
        pos = lane % s
        second = (pos >= q) & (pos < 2 * q)
        third = (pos >= 2 * q) & (pos < 3 * q)
        xl = _roll(x, -q, 1, in_kernel)
        xr = _roll(x, q, 1, in_kernel)
        x = jnp.where(second, xl, jnp.where(third, xr, x))
        s //= 2
    return x
