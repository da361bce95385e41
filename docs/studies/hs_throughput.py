"""Horn-Schunck throughput: XLA scan path vs time-tiled Pallas relaxation.

Usage: python docs/studies/hs_throughput.py  (on a TPU host)

Measures pyramidal_hs at 1080p (alpha=10, 3 levels x 50 sweeps = 150 total)
with use_pallas False/True, plus the single-scale relaxation alone, using the
chained on-device timing from utils/profiling.device_time.
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

from cuda_optical_flow_2_tpu.models import horn_schunck as hs
from cuda_optical_flow_2_tpu.utils.profiling import device_time

H, W = 1080, 1920


def main() -> None:
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.float32))
    n = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.float32))

    for use_pallas in (False, True):
        cfg = hs.HSConfig(alpha=10.0, iterations=50, levels=3, use_pallas=use_pallas)
        t = device_time(
            lambda a, b: hs.pyramidal_hs(a, b, cfg), p, n, iters=10
        )
        print(f"pyramidal (3x50 sweeps) use_pallas={use_pallas}: "
              f"{t * 1e3:8.2f} ms/frame  ({1.0 / t:6.1f} fps)")

    for use_pallas in (False, True):
        cfg = hs.HSConfig(alpha=10.0, iterations=150, levels=1, use_pallas=use_pallas)
        t = device_time(
            lambda a, b: hs.horn_schunck(a, b, cfg), p, n, iters=10
        )
        print(f"single-scale 150 sweeps use_pallas={use_pallas}: "
              f"{t * 1e3:8.2f} ms/frame  ({1.0 / t:6.1f} fps)")

    # accuracy sanity: both paths on a translating pair
    from cuda_optical_flow_2_tpu.utils import io

    fr = io.synthetic_sequence(2, 512, 640, velocity=(2.0, 1.0), period=24)
    sp = jnp.asarray(fr[0].astype(np.float32))
    sn = jnp.asarray(fr[1].astype(np.float32))
    for use_pallas in (False, True):
        cfg = hs.HSConfig(alpha=8.0, iterations=100, levels=3, use_pallas=use_pallas)
        flow = np.asarray(hs.pyramidal_hs(sp, sn, cfg))[32:-32, 32:-32]
        epe = np.hypot(flow[..., 0] - 2.0, flow[..., 1] - 1.0).mean()
        print(f"EPE (2,1)px translation use_pallas={use_pallas}: {epe:.4f}")


if __name__ == "__main__":
    main()
