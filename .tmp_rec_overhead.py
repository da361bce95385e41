import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
import dataclasses
import numpy as np
import jax, jax.numpy as jnp
import cuda_optical_flow_2_tpu as of
from cuda_optical_flow_2_tpu.models import streaming
from cuda_optical_flow_2_tpu.utils.profiling import device_time

H, W = 1080, 1920
rng = np.random.default_rng(0)
frame0 = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.float32))
frame1 = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.float32))
flow0 = jnp.zeros((H, W, 2), jnp.float32)
cfg = dataclasses.replace(of.PAPER_1080P, levels=1)
rec = streaming.RecoveryConfig(levels=3)
raw_step = streaming.step.__wrapped__

for label, r in (("plain-warm", None), ("recovery", rec)):
    state0 = streaming.init_state(frame0, cfg, r)

    def fn(frame, flow_prev):
        st = streaming.FlowState(state0.pyramid, flow_prev)
        _, fl = raw_step(st, frame, cfg, True, r)
        return fl

    secs = device_time(fn, frame1, flow0, iters=30)
    print(f"{label}: {secs*1e3:.3f} ms/frame = {1/secs:.1f} fps")
