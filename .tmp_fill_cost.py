import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
import numpy as np, jax.numpy as jnp
from cuda_optical_flow_2_tpu.models import consistency
from cuda_optical_flow_2_tpu.utils.profiling import device_time

H, W = 1080, 1920
rng = np.random.default_rng(0)
flow = jnp.asarray(rng.normal(0, 3, (H, W, 2)).astype(np.float32))
occ = jnp.asarray(rng.random((H, W)) < 0.03)
for iters in (32, 96):
    secs = device_time(
        lambda f: consistency.fill_occluded_flow(f, occ, iterations=iters),
        flow, iters=10)
    print(f"fill iterations={iters}: {secs*1e3:.2f} ms at 1080p", flush=True)
