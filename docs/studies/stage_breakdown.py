"""Per-stage timing at the PAPER_1080P operating point (one v5e chip)."""
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
from cuda_optical_flow_2_tpu.models.lucas_kanade import lk_level, preprocess
from cuda_optical_flow_2_tpu.ops.pyramid import build_pyramid, pyr_down
from cuda_optical_flow_2_tpu.ops.resize import upsample_flow
from cuda_optical_flow_2_tpu.utils.profiling import device_time
import functools

cfg = of.PAPER_1080P
H, W = 1080, 1920
rng = np.random.default_rng(0)
prev = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.float32))
nxt = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.float32))
pyr_p = [np.asarray(x) for x in build_pyramid(prev, cfg.levels)]
pyr_n = [np.asarray(x) for x in build_pyramid(nxt, cfg.levels)]

total = 0.0
ms = device_time(lambda a, b: build_pyramid(a, cfg.levels)[-1] + 0*b[:1,:1], prev, nxt, iters=40)*1e3
print(f"pyramid build (x1): {ms:.3f} ms"); total += 2*ms

for k in range(cfg.levels-1, -1, -1):
    p = jnp.asarray(pyr_p[k]); n = jnp.asarray(pyr_n[k])
    if k == cfg.levels-1:
        f = lambda a, b: lk_level(a, b, None, cfg)
        ms = device_time(f, p, n, iters=40)*1e3
    else:
        flow = jnp.zeros(p.shape + (2,), jnp.float32) + 0.5
        f = lambda a, b, fl=flow: lk_level(a, b, fl + 0*a[:1,:1,None], cfg)
        ms = device_time(f, p, n, iters=40)*1e3
    print(f"level {k} step {p.shape}: {ms:.3f} ms"); total += ms

for k in range(cfg.levels-2, -1, -1):
    src = jnp.zeros(pyr_p[k+1].shape + (2,), jnp.float32)
    tgt = pyr_p[k].shape
    ms = device_time(lambda a, b: upsample_flow(a + 0*b[:1,:1,None], tgt), src, jnp.zeros_like(src), iters=40)*1e3
    print(f"upsample to {tgt}: {ms:.3f} ms"); total += ms
print(f"sum of stages: {total:.3f} ms  ({1e3/total:.0f} fps-equivalent)")
