"""Per-stage device time of the Farnebäck 1080p pipeline on one chip.

Stages measured standalone at level-0 resolution (the dominant level):
poly expansion (per frame), the 5-plane coefficient warp, the elementwise
normal-equation products, the fused window+solve kernel, and one whole
fb_level iteration; plus the full pyramidal pipeline for reference.

Usage: python docs/studies/fb_stage_breakdown.py  (on a TPU host)
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

from cuda_optical_flow_2_tpu.kernels import win_solve
from cuda_optical_flow_2_tpu.models import farneback as fb
from cuda_optical_flow_2_tpu.ops.poly_exp import poly_expansion
from cuda_optical_flow_2_tpu.utils.profiling import device_time

H, W = 1080, 1920


def main() -> None:
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.float32))
    n = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.float32))
    cfg = fb.FBConfig(levels=3, iterations=3, winsize=15, use_pallas=True)

    t = device_time(lambda x: jnp.stack(poly_expansion(x, cfg.poly_n, cfg.poly_sigma)), p, iters=10)
    print(f"poly_expansion (1 frame, level 0): {t * 1e3:7.2f} ms")

    exp1 = poly_expansion(p, cfg.poly_n, cfg.poly_sigma)
    exp2 = poly_expansion(n, cfg.poly_n, cfg.poly_sigma)
    planes2 = jnp.stack(exp2)
    flow0 = jnp.zeros((H, W, 2), jnp.float32)

    from cuda_optical_flow_2_tpu.models.lucas_kanade import _pick_warp

    lk_like = fb._lk_like(cfg)
    warp, _ = _pick_warp(planes2, lk_like)

    def warp5(pl2, f):
        return jnp.stack(warp(pl2, jnp.broadcast_to(f, pl2.shape + (2,))))

    t = device_time(warp5, planes2, flow0, iters=10)
    print(f"5-plane select-warp:               {t * 1e3:7.2f} ms")

    bx1, by1, axx1, ayy1, axy1 = exp1

    def products(pl2, f):
        w_bx, w_by, w_axx, w_ayy, w_axy = pl2
        u, v = f[..., 0], f[..., 1]
        axx = 0.5 * (axx1 + w_axx)
        ayy = 0.5 * (ayy1 + w_ayy)
        axy = 0.5 * (axy1 + w_axy)
        db_x = 0.5 * (bx1 - w_bx) + axx * u + axy * v
        db_y = 0.5 * (by1 - w_by) + axy * u + ayy * v
        return jnp.stack([
            axx * axx + axy * axy,
            axy * (axx + ayy),
            axy * axy + ayy * ayy,
            axx * db_x + axy * db_y,
            axy * db_x + ayy * db_y,
        ])

    t = device_time(products, planes2, flow0, iters=10)
    print(f"normal-eq products (XLA):          {t * 1e3:7.2f} ms")

    prods = products(planes2, flow0)

    def solve(pr):
        return win_solve.window_solve(
            pr[0], pr[1], pr[2], pr[3], pr[4], window=cfg.winsize, det_eps=cfg.det_eps
        )

    t = device_time(solve, prods, iters=10)
    print(f"win_solve kernel:                  {t * 1e3:7.2f} ms")

    t = device_time(lambda a, b: fb.fb_level(
        tuple(jnp.unstack(a)), tuple(jnp.unstack(b)), None, cfg), jnp.stack(exp1), planes2, iters=5)
    print(f"fb_level x{cfg.iterations} iters (level 0):      {t * 1e3:7.2f} ms")

    t = device_time(lambda a, b: fb.pyramidal_farneback(a, b, cfg), p, n, iters=5)
    print(f"full pyramidal_farneback:          {t * 1e3:7.2f} ms")


if __name__ == "__main__":
    main()
