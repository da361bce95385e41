"""Farnebäck serving study: sustained streaming fps at 1080p, warm vs cold.

Usage: python docs/studies/fb_streaming_study.py  (on a TPU host)
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import dataclasses
import time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from cuda_optical_flow_2_tpu.models import farneback as fb
from cuda_optical_flow_2_tpu.ops.resize import downsample_flow

H, W, N = 1080, 1920, 32
rng = np.random.default_rng(0)
frames = jnp.asarray(rng.integers(0, 256, (N, H, W)).astype(np.float32))


def measure(cfg, warm: bool) -> float:
    @jax.jit
    def run_stream(frames):
        pyr0 = fb.fb_preprocess(frames[0], cfg)

        def step(carry, frame):
            pyr_prev, flow_prev = carry
            pyr = fb.fb_preprocess(frame, cfg)
            init = (
                downsample_flow(flow_prev, pyr[-1].shape[-2:]) if warm else None
            )
            flow = fb.fb_coarse_to_fine(list(pyr_prev), pyr, cfg, init)
            return (tuple(pyr), flow if warm else flow_prev), jnp.mean(flow)

        init_flow = jnp.zeros(frames[0].shape + (2,), jnp.float32)
        _, means = lax.scan(step, (tuple(pyr0), init_flow), frames[1:])
        return jnp.sum(means)

    @jax.jit
    def run_one(frames):
        pyr0 = fb.fb_preprocess(frames[0], cfg)
        pyr1 = fb.fb_preprocess(frames[1], cfg)
        return jnp.mean(fb.fb_coarse_to_fine(list(pyr0), pyr1, cfg))

    float(run_stream(frames)); float(run_one(frames))
    t1s, tns = [], []
    for _ in range(3):
        t0 = time.perf_counter(); float(run_one(frames)); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(run_stream(frames)); tns.append(time.perf_counter() - t0)
    return (min(tns) - min(t1s)) / (N - 2)


base = fb.FBConfig(levels=3, iterations=3, winsize=15)
for label, cfg, warm in (
    ("cold levels=3 iters=3", base, False),
    ("warm levels=1 iters=2", dataclasses.replace(base, levels=1, iterations=2), True),
    ("warm levels=1 iters=1", dataclasses.replace(base, levels=1, iterations=1), True),
):
    t = measure(cfg, warm)
    print(f"{label:24s}: {t*1e3:7.3f} ms/frame  {1/t:7.1f} fps", flush=True)
