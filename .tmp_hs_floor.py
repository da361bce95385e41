import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
import numpy as np, jax.numpy as jnp
from cuda_optical_flow_2_tpu.utils import io
from cuda_optical_flow_2_tpu.models import pyramidal_flow
from cuda_optical_flow_2_tpu.models.horn_schunck import HSConfig
from cuda_optical_flow_2_tpu.utils.profiling import device_time

seq = io.synthetic_sequence(2, 256, 512, velocity=(2.0, 1.0), noise=0.0)
p, n = jnp.asarray(seq[0], jnp.float32), jnp.asarray(seq[1], jnp.float32)
cfg = HSConfig(levels=2, iterations=20)
for iters in (20, 100, 400):
    for rep in range(2):
        s = device_time(lambda a, b: pyramidal_flow(a, b, cfg), p, n, iters=iters)
        print(f"iters={iters} rep={rep}: {s*1e3:.4f} ms = {1/s:.0f} fps", flush=True)
