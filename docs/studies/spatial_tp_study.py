"""Spatial-TP hot path timing: fused Pallas band kernel under shard_map.

VERDICT r1 item 2 done-criterion: with the shard-local level step running
kernels/lk_step_fused.lk_band_step, a single-chip shard_map(n=1) run should
land within ~1.3x of the unsharded Pallas number (the only differences are
shard_map plumbing and the per-iteration halo concatenations).  Also times
the XLA-local twin (use_pallas=False) for the before/after gap.

Run: python docs/studies/spatial_tp_study.py
"""

import numpy as np

import jax
import jax.numpy as jnp

from cuda_optical_flow_2_tpu import LKConfig, pyramidal_lk
from cuda_optical_flow_2_tpu.models.farneback import FBConfig, pyramidal_farneback
from cuda_optical_flow_2_tpu.models.horn_schunck import HSConfig, pyramidal_hs
from cuda_optical_flow_2_tpu.models.tvl1 import TVL1Config, pyramidal_tvl1
from cuda_optical_flow_2_tpu.parallel import (
    make_mesh,
    spatial_pyramidal_fb,
    spatial_pyramidal_hs,
    spatial_pyramidal_lk,
    spatial_pyramidal_tvl1,
)
from cuda_optical_flow_2_tpu.utils import io
from cuda_optical_flow_2_tpu.utils.profiling import device_time

H, W = 1080, 1920


def main() -> None:
    print(f"backend: {jax.default_backend()}", flush=True)
    frames = io.synthetic_sequence(2, H, W, velocity=(2.0, 1.0))
    prev = jnp.asarray(frames[0], jnp.float32)
    nxt = jnp.asarray(frames[1], jnp.float32)
    mesh = make_mesh(1, axis_name="space")

    for name, use_pallas in (("Pallas", True), ("XLA", False)):
        cfg = LKConfig(levels=2, window=15, max_displacement=16.0,
                       use_pallas=use_pallas)
        t_un = device_time(
            lambda p, n, c=cfg: pyramidal_lk(p, n, c), prev, nxt, iters=10
        )
        t_tp = device_time(
            lambda p, n, c=cfg: spatial_pyramidal_lk(p, n, c, mesh),
            prev, nxt, iters=10,
        )
        print(
            f"LK/{name}: unsharded {t_un*1e3:7.2f} ms | TP(n=1) "
            f"{t_tp*1e3:7.2f} ms | ratio {t_tp/t_un:.2f}x",
            flush=True,
        )

    # Round-2 follow-up: the other families' TP hot paths (fused FB band
    # step; select-loop band warps + time-tiled band sweeps for HS/TV-L1).
    fams = (
        (
            "HS",
            HSConfig(levels=3, iterations=60, alpha=8.0,
                     max_displacement=16.0),
            pyramidal_hs,
            lambda p, n, c: spatial_pyramidal_hs(p, n, c, mesh),
        ),
        (
            "FB",
            FBConfig(levels=3, iterations=3, winsize=15,
                     max_displacement=16.0),
            pyramidal_farneback,
            lambda p, n, c: spatial_pyramidal_fb(p, n, c, mesh),
        ),
        (
            "TVL1",
            TVL1Config(levels=3, warps=3, iterations=28,
                       max_displacement=16.0),
            pyramidal_tvl1,
            lambda p, n, c: spatial_pyramidal_tvl1(p, n, c, mesh),
        ),
    )
    for name, cfg, un_fn, tp_fn in fams:
        t_un = device_time(
            lambda p, n, f=un_fn, c=cfg: f(p, n, c), prev, nxt, iters=10
        )
        t_tp = device_time(
            lambda p, n, f=tp_fn, c=cfg: f(p, n, c), prev, nxt, iters=10
        )
        print(
            f"{name}/Pallas: unsharded {t_un*1e3:7.2f} ms | TP(n=1) "
            f"{t_tp*1e3:7.2f} ms | ratio {t_tp/t_un:.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
