"""Timing and profiling helpers.

The reference has no timing instrumentation at all (SURVEY.md section 5 —
no cudaEvent/chrono anywhere); this module provides the measurement layer the
framework standardizes on:

* :func:`device_time` — honest per-iteration device time for a jittable
  function, measured by chaining iterations on-device inside one jitted
  ``fori_loop`` (each iteration depends on the previous result) and fetching
  a single scalar.  This is robust against async dispatch, unreliable
  ``block_until_ready`` on tunneled runtimes, and slow device->host links:
  the fixed dispatch+fetch overhead cancels in the (1+N)-vs-1 subtraction.
* :func:`trace` — context manager around ``jax.profiler`` for Perfetto traces
  of the Pallas kernels.
"""

from __future__ import annotations

import contextlib
import functools
import time
from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["device_time", "trace"]


def device_time(
    fn: Callable[..., jax.Array],
    *args: jax.Array,
    iters: int = 20,
    perturb_arg: int = 0,
) -> float:
    """Seconds per evaluation of ``fn(*args)`` on the current device.

    ``fn`` must return an array; argument ``perturb_arg`` (a float array) is
    nudged by ``prev_result * 1e-20`` each iteration to serialize the chain.
    Compiles two programs (1 and 1+iters iterations); the difference of their
    wall times divided by ``iters`` is the per-iteration device time.
    """

    def chain(k: int, *a):
        def body(_, s):
            nudged = list(a)
            nudged[perturb_arg] = a[perturb_arg] + s * jnp.float32(1e-20)
            out = fn(*nudged)
            return jnp.float32(jnp.mean(out))

        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    c1 = jax.jit(functools.partial(chain, 1))
    cn = jax.jit(functools.partial(chain, 1 + iters))
    float(c1(*args))  # compile + warm
    float(cn(*args))
    t0 = time.perf_counter()
    float(c1(*args))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(cn(*args))
    tn = time.perf_counter() - t0
    return max((tn - t1) / iters, 1e-9)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with Perfetto / TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
