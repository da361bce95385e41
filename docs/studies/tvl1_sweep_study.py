"""TV-L1 operating-point sweep: find the EPE knee that clears 60 fps.

VERDICT r1 item 7: the default (5 levels x 5 warps x 30 iterations) runs
32 fps at 1080p — the only family below the 60 fps bar.  Sweeps
(levels, warps, iterations) at 1080p on one chip, reporting ms/frame and
EPE on the standard rotation+translation fields, to pick either a new
default or a documented fast preset.

Run: python docs/studies/tvl1_sweep_study.py
"""

import numpy as np

import jax
import jax.numpy as jnp

from cuda_optical_flow_2_tpu.models.tvl1 import TVL1Config, pyramidal_tvl1
from cuda_optical_flow_2_tpu.utils import io
from cuda_optical_flow_2_tpu.utils.profiling import device_time

H, W = 1080, 1920


def _smooth(img: np.ndarray, reps: int = 2) -> np.ndarray:
    out = img.astype(np.float64)
    for _ in range(reps):
        out = (
            out
            + np.roll(out, 1, 0) + np.roll(out, -1, 0)
            + np.roll(out, 1, 1) + np.roll(out, -1, 1)
        ) / 5.0
    return out


def _pairs():
    """(name, prev, nxt, true_flow) cases: translation + rotation fields.

    Both cases use the Gaussian-smoothed APERIODIC random texture: the
    periodic synthetic_sequence texture aliases to near-DC at deep pyramid
    levels and TV-L1's coarse-to-fine locks onto a harmonic (measured
    EPE ~34 at levels=5 — texture artifact, not a solver property)."""
    rng = np.random.default_rng(7)
    base = _smooth(rng.uniform(0, 255, (H, W)))
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float64)
    cases = []

    def sample(img, sy, sx):
        y0 = np.clip(np.floor(sy).astype(int), 0, H - 2)
        x0 = np.clip(np.floor(sx).astype(int), 0, W - 2)
        fy, fx = sy - y0, sx - x0
        return (
            img[y0, x0] * (1 - fy) * (1 - fx)
            + img[y0, x0 + 1] * (1 - fy) * fx
            + img[y0 + 1, x0] * fy * (1 - fx)
            + img[y0 + 1, x0 + 1] * fy * fx
        )

    tx, ty = 2.0, 1.0
    nxt_t = sample(base, ys - ty, xs - tx)
    tf = np.stack([np.full((H, W), tx), np.full((H, W), ty)], -1)
    cases.append(("trans(2,1)", base.astype(np.float32),
                  nxt_t.astype(np.float32), tf))

    ang = 0.002
    cy, cx = H / 2, W / 2
    dx = -(ys - cy) * ang
    dy = (xs - cx) * ang
    nxt = sample(base, ys - dy, xs - dx)
    cases.append(("rot 0.002rad", base.astype(np.float32),
                  nxt.astype(np.float32), np.stack([dx, dy], -1)))
    return cases


def _epe(flow, true_flow, m=32):
    f = np.asarray(flow)[m:-m, m:-m]
    t = true_flow[m:-m, m:-m]
    return float(np.hypot(f[..., 0] - t[..., 0], f[..., 1] - t[..., 1]).mean())


def main() -> None:
    print(f"backend: {jax.default_backend()}", flush=True)
    cases = [(n, jnp.asarray(p), jnp.asarray(x), t) for n, p, x, t in _pairs()]

    grid = [
        (5, 5, 30),   # round-1 default
        (4, 3, 30),
        (4, 3, 20),
        (3, 3, 20),
        (3, 2, 30),
        (3, 2, 20),
        (3, 2, 14),
        (2, 2, 14),
        (4, 2, 14),
    ]
    for levels, warps, iters in grid:
        cfg = TVL1Config(levels=levels, warps=warps, iterations=iters)
        fn = jax.jit(lambda p, n, c=cfg: pyramidal_tvl1(p, n, c))
        p0, n0 = cases[0][1], cases[0][2]
        t = device_time(fn, p0, n0, iters=8)
        epes = [f"{name}={_epe(fn(p, n), tf):.4f}" for name, p, n, tf in cases]
        print(
            f"L{levels} w{warps} i{iters}: {t*1e3:.2f} ms = {1/t:6.1f} fps  "
            + "  ".join(epes),
            flush=True,
        )


if __name__ == "__main__":
    main()
