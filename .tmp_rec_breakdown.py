import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
import dataclasses
import numpy as np
import jax, jax.numpy as jnp
import cuda_optical_flow_2_tpu as of
from cuda_optical_flow_2_tpu.models import streaming
from cuda_optical_flow_2_tpu.ops.warp import warp_bilinear
from cuda_optical_flow_2_tpu.ops.resize import downsample_flow
from cuda_optical_flow_2_tpu.utils.profiling import device_time

H, W = 1080, 1920
rng = np.random.default_rng(0)
frame0 = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.float32))
frame1 = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.float32))
flow0 = jnp.zeros((H, W, 2), jnp.float32)
hc, wc = 270, 480
img_c = jnp.asarray(rng.integers(0, 256, (hc, wc)).astype(np.float32))
flow_c = jnp.zeros((hc, wc, 2), jnp.float32)

t = device_time(lambda f: downsample_flow(f, (hc, wc)), flow0, iters=30)
print(f"downsample_flow 1080p->270p: {t*1e3:.3f} ms")
t = device_time(lambda img, f: warp_bilinear(img, f), img_c, flow_c, perturb_arg=0, iters=30)
print(f"warp_bilinear 270x480 gather: {t*1e3:.3f} ms")

cfg = dataclasses.replace(of.PAPER_1080P, levels=1)
rec = streaming.RecoveryConfig(levels=3)
raw_step = streaming.step.__wrapped__
state0 = streaming.init_state(frame0, cfg, rec)

# valid-seed stream vs invalid-seed: if the cond is lazy, timings differ
for label, flow_seed in (("always-valid(zero-seed smallflow)", jnp.full((H, W, 2), 0.01, jnp.float32)),
                         ("always-invalid(large wrong seed)", jnp.full((H, W, 2), 30.0, jnp.float32))):
    def fn(frame, flow_prev):
        st = streaming.FlowState(state0.pyramid, flow_prev)
        _, fl = raw_step(st, frame, cfg, True, rec)
        return fl
    secs = device_time(fn, frame1, flow_seed, iters=30)
    print(f"{label}: {secs*1e3:.3f} ms")
