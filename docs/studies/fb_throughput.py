"""Farnebäck throughput/accuracy at 1080p on one chip, vs LK and HS.

Usage: python docs/studies/fb_throughput.py  (on a TPU host)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import numpy as np

import jax.numpy as jnp

import cuda_optical_flow_2_tpu as of
from cuda_optical_flow_2_tpu.models import farneback as fb
from cuda_optical_flow_2_tpu.models import horn_schunck as hs
from cuda_optical_flow_2_tpu.utils import io
from cuda_optical_flow_2_tpu.utils.profiling import device_time

H, W = 1080, 1920


def main() -> None:
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.float32))
    n = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.float32))

    for use_pallas in (False, True):
        cfg = fb.FBConfig(levels=3, iterations=3, winsize=15, use_pallas=use_pallas)
        t = device_time(
            lambda a, b: fb.pyramidal_farneback(a, b, cfg), p, n, iters=10
        )
        print(f"farneback 3x3 iters use_pallas={use_pallas}: "
              f"{t * 1e3:8.2f} ms/frame  ({1.0 / t:6.1f} fps)")

    # accuracy: all three models on the same translating pair
    fr = io.synthetic_sequence(2, 512, 640, velocity=(2.0, 1.0), period=24)
    sp = jnp.asarray(fr[0].astype(np.float32))
    sn = jnp.asarray(fr[1].astype(np.float32))

    def epe(flow):
        f = np.asarray(flow)[32:-32, 32:-32]
        return np.hypot(f[..., 0] - 2.0, f[..., 1] - 1.0).mean()

    from cuda_optical_flow_2_tpu.models import tvl1

    print("EPE (2,1)px translation:")
    print(f"  lk  : {epe(of.pyramidal_lk(sp, sn, of.LKConfig(levels=3, window=15, iterations=2))):.4f}")
    print(f"  hs  : {epe(hs.pyramidal_hs(sp, sn, hs.HSConfig(alpha=8.0, iterations=100, levels=3))):.4f}")
    print(f"  fb  : {epe(fb.pyramidal_farneback(sp, sn, fb.FBConfig(levels=3, iterations=3))):.4f}")
    print(f"  tvl1: {epe(tvl1.pyramidal_tvl1(sp, sn, tvl1.TVL1Config(levels=3))):.4f}")


if __name__ == "__main__":
    main()
