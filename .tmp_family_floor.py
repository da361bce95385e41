import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
import numpy as np
import jax, jax.numpy as jnp
from cuda_optical_flow_2_tpu.utils import io
from cuda_optical_flow_2_tpu.utils.profiling import device_time
from cuda_optical_flow_2_tpu.models import pyramidal_flow

h, w = 256, 512
seq = io.synthetic_sequence(2, h, w, velocity=(2.0, 1.0), noise=0.0)
prev, nxt = jnp.asarray(seq[0], jnp.float32), jnp.asarray(seq[1], jnp.float32)

def cfg(model):
    if model == "lk":
        import cuda_optical_flow_2_tpu as of
        return of.LKConfig(levels=2, window=9, iterations=2)
    if model == "hs":
        from cuda_optical_flow_2_tpu.models.horn_schunck import HSConfig
        return HSConfig(levels=2, iterations=20)
    if model == "fb":
        from cuda_optical_flow_2_tpu.models.farneback import FBConfig
        return FBConfig(levels=2, iterations=2, winsize=9)
    if model == "tvl1":
        from cuda_optical_flow_2_tpu.models.tvl1 import TVL1Config
        return TVL1Config(levels=2, iterations=15)
    from cuda_optical_flow_2_tpu.models.dis import DISConfig
    return DISConfig(levels=2, window=9, iterations=2)

for m in ("lk", "hs", "fb", "tvl1", "dis"):
    c = cfg(m)
    secs = device_time(lambda a, b: pyramidal_flow(a, b, c), prev, nxt, iters=20)
    print(f"{m}: {secs*1e3:.3f} ms = {1/secs:.1f} fps at {h}x{w}")
