import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
import numpy as np
import jax, jax.numpy as jnp
from cuda_optical_flow_2_tpu.models.horn_schunck import HSConfig, pyramidal_hs
from cuda_optical_flow_2_tpu.utils.profiling import device_time

H, W = 1080, 1920
rng = np.random.default_rng(0)
prev = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.float32))
nxt = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.float32))

for label, cfg in (
    ("HS quad (3L x 50 sweeps, scoreboard)", HSConfig(levels=3, iterations=50)),
    ("HS charb a=40 (3L x 50)", HSConfig(levels=3, iterations=50, penalty="charbonnier", alpha=40.0)),
):
    secs = device_time(lambda a, b: pyramidal_hs(a, b, cfg), prev, nxt, iters=20)
    print(f"{label}: {secs*1e3:.3f} ms = {1/secs:.1f} fps", flush=True)
