"""Sustained streaming throughput: N-frame scan, one pyramid per frame."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
import cuda_optical_flow_2_tpu as of
from cuda_optical_flow_2_tpu.models.lucas_kanade import coarse_to_fine, preprocess

H, W, N = 1080, 1920, 32
cfg = of.PAPER_1080P
rng = np.random.default_rng(0)
frames = jnp.asarray(rng.integers(0, 256, (N, H, W)).astype(np.float32))


@jax.jit
def run_stream(frames):
    pyr0 = preprocess(frames[0], cfg)

    def step(carry, frame):
        pyr = preprocess(frame, cfg)
        flow = coarse_to_fine(list(carry), pyr, cfg)[0]
        return tuple(pyr), jnp.mean(flow)

    _, means = lax.scan(step, tuple(pyr0), frames[1:])
    return jnp.sum(means)


@jax.jit
def run_one(frames):
    pyr0 = preprocess(frames[0], cfg)
    pyr1 = preprocess(frames[1], cfg)
    return jnp.mean(coarse_to_fine(list(pyr0), pyr1, cfg)[0])

float(run_stream(frames)); float(run_one(frames))  # warm
t1s, tns = [], []
for _ in range(3):
    t0 = time.perf_counter(); float(run_one(frames)); t1s.append(time.perf_counter() - t0)
    t0 = time.perf_counter(); float(run_stream(frames)); tns.append(time.perf_counter() - t0)
per_frame = (min(tns) - min(t1s)) / (N - 2)
print(f"sustained streaming: {per_frame*1e3:.3f} ms/frame  {1/per_frame:.1f} fps")
