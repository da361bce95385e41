#!/usr/bin/env python
"""Headline benchmark: pyramidal LK throughput on 1080p frame pairs, one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Configuration is BASELINE.json config 4 (the paper operating point scaled to
1080p): 5 pyramid levels, 15x15 integration window, grayscale 1920x1080 pair.
``vs_baseline`` is fps / 60 — the >60 fps north-star target from BASELINE.md
(the reference itself only claims "real-time" at 640x480, README.md:22-24).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

import cuda_optical_flow_2_tpu as of

H, W = 1080, 1920
BASELINE_FPS = 60.0
WARMUP = 3
ITERS = 20


def main() -> None:
    cfg = of.PAPER_1080P
    rng = np.random.default_rng(0)
    prev = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.float32))
    nxt = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.float32))

    fn = jax.jit(lambda p, n: of.pyramidal_lk(p, n, cfg))
    flow = fn(prev, nxt)
    flow.block_until_ready()
    for _ in range(WARMUP):
        fn(prev, nxt).block_until_ready()

    start = time.perf_counter()
    for _ in range(ITERS):
        flow = fn(prev, nxt)
    flow.block_until_ready()
    elapsed = time.perf_counter() - start

    fps = ITERS / elapsed
    assert np.isfinite(np.asarray(flow)).all(), "non-finite flow in bench output"
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
