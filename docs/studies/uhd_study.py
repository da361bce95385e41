"""4K UHD (2160x3840) serving validation on one v5e chip.

The 1080p headline is the paper's operating point; production video is
increasingly UHD.  This study checks the kernels' VMEM tiling + the
pipeline glue hold at 4x the pixel count, and records cold pairwise and
warm streaming numbers for PERF.md.
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import functools

import numpy as np
import jax, jax.numpy as jnp

import cuda_optical_flow_2_tpu as of
from cuda_optical_flow_2_tpu.models import streaming
from cuda_optical_flow_2_tpu.utils import io
from cuda_optical_flow_2_tpu.utils.metrics import mean_epe
from cuda_optical_flow_2_tpu.utils.profiling import device_time

H, W = 2160, 3840
V = (6.0, 3.0)
# period scales with the pyramid depth: the default period-16 sinusoid
# aliases to near-DC at /16-/32 decimation and the coarse levels estimate
# budget-scale garbage the fine levels cannot recover from (same texture
# artifact class as PERF.md's checkerboard caveat; period=24 at 1080p).
frames = io.synthetic_sequence(2, H, W, velocity=V, period=48)
prev, nxt = (jnp.asarray(f, jnp.float32) for f in frames)

for levels in (5, 6):
    cfg = of.LKConfig(levels=levels, window=15, temporal_kernel="gauss3",
                      iterations=1)
    fn = functools.partial(of.pyramidal_lk, config=cfg)
    flow = jax.jit(lambda a, b: of.pyramidal_lk(a, b, cfg))(prev, nxt)
    e = mean_epe(np.asarray(flow),
                 np.broadcast_to(np.asarray(V, np.float32), (H, W, 2)),
                 margin=min(H, W) // 8)
    s = device_time(lambda a, b: of.pyramidal_lk(a, b, cfg), prev, nxt, iters=20)
    print(f"cold pairwise levels={levels}: {s*1e3:.3f} ms/frame "
          f"({1.0/s:.1f} fps)  EPE {e:.4f}", flush=True)

# warm serving mode (levels=1 + warm start), the PERF.md serving config
from jax import lax
from cuda_optical_flow_2_tpu.models.lucas_kanade import coarse_to_fine, preprocess
from cuda_optical_flow_2_tpu.ops.resize import downsample_flow

N = 9
seq = io.synthetic_sequence(N, H, W, velocity=V, period=48)
cfg1 = of.LKConfig(levels=1, window=15, temporal_kernel="gauss3", iterations=1)
stack = jnp.asarray(np.stack(seq).astype(np.float32))

def scan_pairs(frames0):
    pyr0 = preprocess(frames0[0], cfg1)

    def step(carry, frame):
        pyr_prev, flow_prev = carry
        pyr = preprocess(frame, cfg1)
        init = downsample_flow(flow_prev, pyr[-1].shape[-2:])
        flow = coarse_to_fine(list(pyr_prev), pyr, cfg1, init)[0]
        return (tuple(pyr), flow), jnp.float32(jnp.mean(flow))

    init_flow = jnp.zeros((H, W, 2), jnp.float32)
    (_, flow), means = lax.scan(step, (tuple(pyr0), init_flow), frames0[1:])
    return flow + 0 * jnp.mean(means)

s = device_time(scan_pairs, stack, iters=4) / (N - 1)
print(f"warm streaming levels=1: {s*1e3:.3f} ms/frame ({1.0/s:.1f} fps)",
      flush=True)
