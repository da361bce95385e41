"""Where does the DIS default's 17.3 ms go?  Per-phase / per-level split.

Usage: python docs/studies/dis_breakdown.py  (on a TPU host)

docs/PERF.md round-2 DIS table: default = 17.3 ms, search-only = 4.08 ms,
_refine in isolation = 2.08 ms at 1080p — so the composed default carries
~11 ms not attributable to either phase alone.  This study splits the
default per level and per phase (GN steps vs refinement, and inside
refinement: warp / gradient+offset planes / relax kernel) with the chained
on-device timing, to locate the composition overhead before optimizing it.
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


def main() -> None:
    rng = np.random.default_rng(0)
    cfg = dis.DISConfig()

    # Per-level dis_level cost (flow init present, as in the composed run).
    print("== dis_level per pyramid level (GN2 + refine5) ==")
    total = 0.0
    for k in range(cfg.levels):
        h, w = H >> k, W >> k
        p = jnp.asarray(rng.integers(0, 256, (h, w)).astype(np.float32))
        n = jnp.asarray(rng.integers(0, 256, (h, w)).astype(np.float32))
        f0 = jnp.asarray(rng.normal(0, 1, (h, w, 2)).astype(np.float32))

        t = device_time(
            lambda a, b, f: dis.dis_level(a, b, f, cfg), p, n, f0, iters=10
        )
        total += t
        print(f"  level {k} ({h}x{w}): {t * 1e3:7.3f} ms")
    print(f"  sum of isolated levels: {total * 1e3:7.3f} ms")

    # Level-0 phase split.
    p = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.float32))
    n = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.float32))
    f0 = jnp.asarray(rng.normal(0, 1, (H, W, 2)).astype(np.float32))

    print("== level-0 phase split (1080p) ==")
    gn_only = dis.DISConfig(refine_iterations=0)
    t_gn = device_time(
        lambda a, b, f: dis.dis_level(a, b, f, gn_only), p, n, f0, iters=10
    )
    print(f"  GN steps only (x{cfg.iterations}):   {t_gn * 1e3:7.3f} ms")
    t_ref = device_time(
        lambda a, b, f: dis._refine(a, b, f, cfg), p, n, f0, iters=10
    )
    print(f"  _refine alone (5 sweeps):            {t_ref * 1e3:7.3f} ms")
    t_lvl = device_time(
        lambda a, b, f: dis.dis_level(a, b, f, cfg), p, n, f0, iters=10
    )
    print(
        f"  composed level (GN+refine):          {t_lvl * 1e3:7.3f} ms"
        f"  (phases sum {1e3 * (t_gn + t_ref):7.3f})"
    )

    # End-to-end for cross-checking against the per-level sum (includes the
    # two pyramid builds + per-level upsamples the splits above exclude).
    t_e2e = device_time(
        lambda a, b: dis.pyramidal_dis(a, b, cfg), p, n, iters=10
    )
    print(f"== end-to-end default: {t_e2e * 1e3:7.3f} ms ({1.0 / t_e2e:5.1f} fps)")


if __name__ == "__main__":
    main()
