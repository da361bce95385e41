"""Single-chip batched throughput: does B>1 beat B=1 latency-pipelining?"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import numpy as np
import jax, jax.numpy as jnp
import cuda_optical_flow_2_tpu as of
from cuda_optical_flow_2_tpu.utils.profiling import device_time

H, W = 1080, 1920
cfg = of.PAPER_1080P
rng = np.random.default_rng(0)
for b in (1, 2, 4):
    prev = jnp.asarray(rng.integers(0, 256, (b, H, W)).astype(np.float32))
    nxt = jnp.asarray(rng.integers(0, 256, (b, H, W)).astype(np.float32))
    secs = device_time(lambda p, n: of.pyramidal_lk(p, n, cfg), prev, nxt, iters=max(30 // b, 8))
    print(f"batch {b}: {secs*1e3:.2f} ms/step  {b/secs:.1f} pairs/sec/chip")
