"""Warm-start streaming WITH the bilateral prefilter: serving numbers.

Streaming pays ONE bilateral per frame (vs two per cold pair), so the
REFERENCE_GPU-style configuration (prefilter on) should land near
cold-per-pair + 1x kernel cost.  Measures sustained 1080p streaming
(32-frame lax.scan, one pyramid per frame) with prefilter off/on and the
levels=1 warm serving mode, with the single-pair dispatch cost cancelled
(same methodology as streaming_throughput.py).

Run: python docs/studies/prefilter_serving_study.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from cuda_optical_flow_2_tpu import LKConfig
from cuda_optical_flow_2_tpu.config import BilateralConfig
from cuda_optical_flow_2_tpu.models.lucas_kanade import coarse_to_fine, preprocess
from cuda_optical_flow_2_tpu.ops.resize import downsample_flow
from cuda_optical_flow_2_tpu.utils import io

H, W, N = 1080, 1920, 32


def measure(cfg: LKConfig, warm: bool) -> float:
    frames = io.synthetic_sequence(N, H, W, velocity=(2.0, 1.0))
    stack = jnp.asarray(np.stack(frames), jnp.float32)

    @jax.jit
    def run_stream(frames):
        pyr0 = preprocess(frames[0], cfg)
        flow0 = jnp.zeros(frames[0].shape + (2,), jnp.float32)

        def body(carry, frame):
            pyr_prev, prev_flow = carry
            pyr = preprocess(frame, cfg)
            init = (
                downsample_flow(prev_flow, pyr[-1].shape[-2:]) if warm else None
            )
            flow = coarse_to_fine(list(pyr_prev), pyr, cfg, init)[0]
            return (tuple(pyr), flow), jnp.mean(flow)

        _, means = lax.scan(body, (tuple(pyr0), flow0), frames[1:])
        return jnp.sum(means)

    @jax.jit
    def run_one(frames):
        pyr0 = preprocess(frames[0], cfg)
        pyr1 = preprocess(frames[1], cfg)
        return jnp.mean(coarse_to_fine(list(pyr0), pyr1, cfg)[0])

    float(run_stream(stack))
    float(run_one(stack))
    t1s, tns = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run_one(stack))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(run_stream(stack))
        tns.append(time.perf_counter() - t0)
    return max((min(tns) - min(t1s)) / (N - 2), 1e-9)


def main() -> None:
    print(f"backend: {jax.default_backend()}", flush=True)
    pf = BilateralConfig()
    for name, cfg, warm in (
        ("levels=5 prefilter off", LKConfig(levels=5, window=15), False),
        ("levels=5 prefilter ON ", LKConfig(levels=5, window=15, prefilter=pf), False),
        ("warm L1  prefilter ON ", LKConfig(levels=1, window=15, prefilter=pf), True),
        ("warm L1  prefilter off", LKConfig(levels=1, window=15), True),
    ):
        t = measure(cfg, warm)
        print(f"{name}: {t*1e3:.3f} ms/frame = {1/t:.1f} fps", flush=True)


if __name__ == "__main__":
    main()
