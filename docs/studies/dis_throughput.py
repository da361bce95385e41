"""DIS-family throughput at 1080p: default vs realtime preset, both backends.

Usage: python docs/studies/dis_throughput.py  (on a TPU host)

Measures pyramidal_dis end-to-end (inverse search + variational refinement)
with use_pallas False/True at the default operating point (levels=5, 9x9
window, 2 GN steps + 5 refinement sweeps per level) and the DIS_REALTIME
preset (finest_level=1 — the OpenCV-style finest-scale speed knob), plus a
refinement-off run to split the two phases, using the chained on-device
timing from utils/profiling.device_time.
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

from cuda_optical_flow_2_tpu.models import dis
from cuda_optical_flow_2_tpu.utils.profiling import device_time

H, W = 1080, 1920


def _time(tag: str, cfg: dis.DISConfig, p, n) -> None:
    t = device_time(lambda a, b: dis.pyramidal_dis(a, b, cfg), p, n, iters=10)
    print(f"{tag:44s} {t * 1e3:8.2f} ms/frame  ({1.0 / t:6.1f} fps)")


def main() -> None:
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.float32))
    n = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.float32))

    for use_pallas in (False, True):
        _time(
            f"default (L5 w9 gn2 ref5) use_pallas={use_pallas}",
            dis.DISConfig(use_pallas=use_pallas),
            p, n,
        )
    _time(
        "search only (refine_iterations=0) pallas",
        dis.DISConfig(refine_iterations=0),
        p, n,
    )
    _time(
        "DIS_REALTIME (finest_level=1) pallas",
        dis.DIS_REALTIME,
        p, n,
    )
    _time(
        "no mean-normalization (plain iterated LK)",
        dis.DISConfig(mean_normalize=False),
        p, n,
    )

    # accuracy sanity on a translating pair (both backends; the Pallas and
    # XLA paths must agree at float noise)
    from cuda_optical_flow_2_tpu.utils import io

    fr = io.synthetic_sequence(2, 512, 640, velocity=(2.0, 1.0), period=24)
    sp = jnp.asarray(fr[0].astype(np.float32))
    sn = jnp.asarray(fr[1].astype(np.float32))
    for use_pallas in (False, True):
        cfg = dis.DISConfig(levels=3, use_pallas=use_pallas)
        flow = dis.pyramidal_dis(sp, sn, cfg)
        err = jnp.sqrt(
            (flow[..., 0] - 2.0) ** 2 + (flow[..., 1] - 1.0) ** 2
        )
        c = 32
        print(f"EPE (interior) use_pallas={use_pallas}: "
              f"{float(err[c:-c, c:-c].mean()):.4f}")


if __name__ == "__main__":
    main()
