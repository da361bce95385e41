import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
import dataclasses
import numpy as np
import jax, jax.numpy as jnp
from cuda_optical_flow_2_tpu.models.dis import DISConfig, pyramidal_dis
from cuda_optical_flow_2_tpu.utils.profiling import device_time

H, W = 1080, 1920
rng = np.random.default_rng(0)
prev = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.float32))
nxt = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.float32))

for label, cfg in (
    ("DIS default (quadratic ref5)", DISConfig()),
    ("DIS charbonnier a=40 ed=10 ref5", DISConfig(refine_penalty="charbonnier", refine_alpha=40.0, refine_eps_data=10.0)),
    ("DIS quadratic ref20", DISConfig(refine_iterations=20)),
    ("DIS charbonnier a=40 ed=10 ref20", DISConfig(refine_penalty="charbonnier", refine_alpha=40.0, refine_eps_data=10.0, refine_iterations=20)),
):
    secs = device_time(lambda a, b: pyramidal_dis(a, b, cfg), prev, nxt, iters=20)
    print(f"{label}: {secs*1e3:.3f} ms = {1/secs:.1f} fps", flush=True)
