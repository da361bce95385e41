"""TPU cost of the weighted LK integration windows (round 4).

The box->tri/gauss weighting fixes the iterative-divergence mechanism
(docs/studies/lk_window_study.py) — this study measures what the weighting
costs at the 1080p headline operating point (PAPER_1080P, one chip), with
the interleaved A/B methodology (alternating configs within one session,
min-of-samples) that bench.py and the fused-upsample study use.

Expected mechanics: "tri" replaces each O(log r) box pass with two
(radii r//2, r-r//2) plus a scalar scale — roughly +60% window-sum rolls;
"gauss" replaces it with r symmetric-pair FMAs — ~2.4x the window-sum
rolls.  Window sums are one of four kernel stages (warp select dominates,
docs/PERF.md stage budget), so the end-to-end cost should be well under
those ratios.

Run (TPU): python docs/studies/window_weights_tpu_study.py
"""

from __future__ import annotations

import dataclasses
import os
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import numpy as np

import jax
import jax.numpy as jnp

import cuda_optical_flow_2_tpu as of

H, W = 1080, 1920
ITERS = 50
REPS = 4


def chained(cfg: of.LKConfig, iters: int):
    def run(p, n):
        def body(_, s):
            flow = of.pyramidal_lk(p + s * jnp.float32(1e-20), n, cfg)
            return jnp.mean(flow)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    return jax.jit(run)


def main() -> None:
    rng = np.random.default_rng(0)
    prev = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.float32))
    nxt = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.float32))

    weightings = ("box", "tri", "gauss")
    progs = {}
    for ww in weightings:
        cfg = dataclasses.replace(of.PAPER_1080P, window_weights=ww)
        progs[ww] = (chained(cfg, 1), chained(cfg, 1 + ITERS))

    # warm every program before any timing (compile + first execute)
    for ww, (f1, fn) in progs.items():
        t0 = time.perf_counter()
        s1, sn = float(f1(prev, nxt)), float(fn(prev, nxt))
        assert np.isfinite(s1) and np.isfinite(sn)
        print(f"warm {ww}: {time.perf_counter() - t0:.1f}s")

    t1s = {ww: [] for ww in weightings}
    tns = {ww: [] for ww in weightings}
    for rep in range(REPS):
        for ww, (f1, fn) in progs.items():  # interleaved A/B
            t0 = time.perf_counter()
            float(f1(prev, nxt))
            t1s[ww].append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(fn(prev, nxt))
            tns[ww].append(time.perf_counter() - t0)

    print(f"\nPAPER_1080P ({of.PAPER_1080P.levels} levels, window "
          f"{of.PAPER_1080P.window}), {ITERS}-chained, min over {REPS} reps:")
    base_fps = None
    for ww in weightings:
        per = (min(tns[ww]) - min(t1s[ww])) / ITERS
        fps = 1.0 / per
        if base_fps is None:
            base_fps = fps
        print(
            f"  {ww:<6} {per * 1e3:7.3f} ms/frame  {fps:7.1f} fps  "
            f"({fps / base_fps * 100:.1f}% of box)"
        )


if __name__ == "__main__":
    main()
