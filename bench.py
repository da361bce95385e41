#!/usr/bin/env python
"""Headline benchmark: pyramidal LK throughput on 1080p frame pairs, one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Configuration is BASELINE.json config 4 (the paper operating point scaled to
1080p): 5 pyramid levels, 15x15 integration window, grayscale 1920x1080 pair.
``vs_baseline`` is fps / 60 — the >60 fps north-star target from BASELINE.md
(the reference itself only claims "real-time" at 640x480, README.md:22-24).

Timing methodology: on remote-tunneled TPU runtimes ``block_until_ready`` can
return before execution finishes and device->host transfers are slow, so the
benchmark chains ITERS pipeline evaluations on-device inside one jitted
``fori_loop`` — each iteration's input is perturbed by the previous result, so
nothing can be elided or overlapped dishonestly — and fetches a single scalar.
Per-frame time is (t(1 + N) - t(1)) / N, which cancels the fixed dispatch +
fetch overhead.
"""

from __future__ import annotations

import json
import os
import time

# Persistent compilation cache: first-ever compile of the pipeline goes
# through the remote compile service (minutes); every later bench run reloads
# the serialized executable in <1s.  Set before the first jax compile.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import numpy as np

import jax
import jax.numpy as jnp

import cuda_optical_flow_2_tpu as of

H, W = 1080, 1920
BASELINE_FPS = 60.0
ITERS = 50


def _chained(p: jax.Array, n: jax.Array, iters: int, cfg: of.LKConfig) -> jax.Array:
    def body(_, s):
        flow = of.pyramidal_lk(p + s * jnp.float32(1e-20), n, cfg)
        return jnp.mean(flow)

    return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))


def main() -> None:
    cfg = of.PAPER_1080P
    rng = np.random.default_rng(0)
    prev = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.float32))
    nxt = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.float32))

    f1 = jax.jit(lambda p, n: _chained(p, n, 1, cfg))
    fn = jax.jit(lambda p, n: _chained(p, n, 1 + ITERS, cfg))
    # warm both programs (compile + first execute)
    s1 = float(f1(prev, nxt))
    sn = float(fn(prev, nxt))
    assert np.isfinite(s1) and np.isfinite(sn), (s1, sn)

    # Tunnel round-trip jitter is additive noise on each sample; min() over
    # independent samples of t1 and tn filters it, whereas min over the
    # PAIRED differences can overestimate fps when only t1 catches a spike.
    t1s, tns = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        float(f1(prev, nxt))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(fn(prev, nxt))
        tns.append(time.perf_counter() - t0)
    per_frame = (min(tns) - min(t1s)) / ITERS
    fps = 1.0 / per_frame

    print(
        json.dumps(
            {
                "metric": "pyramidal_lk_1080p_fps",
                "value": round(fps, 2),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
