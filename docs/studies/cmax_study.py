"""c_max study: the select-warp's row-choice correction range vs speed/EPE.

The horizontal select pass rolls (2*c_max + 2) candidate arrays per corner
chunk, so c_max=0 halves its work.  Exactness requires floor(v) to vary by
at most c_max between a pixel and the pixel floor(u) columns away — this
study measures where that bites, on translation and rotation fields at
1080p (PAPER_1080P), one chip.

Usage: python docs/studies/cmax_study.py  (on a TPU host)
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import dataclasses
import numpy as np
import jax.numpy as jnp
import cuda_optical_flow_2_tpu as of
from cuda_optical_flow_2_tpu.ops.warp import warp_bilinear
from cuda_optical_flow_2_tpu.utils.profiling import device_time

H, W = 1080, 1920
rng = np.random.default_rng(0)


def smooth_texture():
    base = rng.standard_normal((H, W)).astype(np.float32)
    t = jnp.asarray(base)
    from cuda_optical_flow_2_tpu.ops.conv import sep_conv2d
    g = np.exp(-0.5 * (np.arange(-6, 7) / 2.5) ** 2); g /= g.sum()
    t = sep_conv2d(t, g, g)
    t = (t - t.min()) / (float(t.max() - t.min()) + 1e-6) * 255.0
    return t


def fields():
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    cy, cx = H / 2, W / 2
    yield "translation (6,3) px", np.broadcast_to(
        np.asarray([6.0, 3.0], np.float32), (H, W, 2)
    ).copy()
    for theta in (0.002, 0.006):
        u = -(ys - cy) * theta
        v = (xs - cx) * theta
        yield f"rotation {theta} rad ({np.hypot(u, v).max():.1f} px max)", \
            np.stack([u, v], -1)


def main() -> None:
    nxt = smooth_texture()
    for label, gt in fields():
        gtj = jnp.asarray(gt)
        prev = warp_bilinear(nxt, gtj)
        for cm in (1, 0):
            cfg = dataclasses.replace(of.PAPER_1080P, c_max=cm)
            t = device_time(
                lambda a, b: of.pyramidal_lk(a, b, cfg), prev, nxt, iters=10
            )
            flow = np.asarray(of.pyramidal_lk_jit(prev, nxt, cfg))
            c = (slice(48, -48), slice(48, -48))
            epe = float(np.hypot(*(flow[..., i][c] - gt[..., i][c] for i in (0, 1))).mean())
            print(f"{label:36s} c_max={cm}: EPE {epe:.4f}  {t*1e3:6.3f} ms ({1/t:5.1f} fps)",
                  flush=True)


if __name__ == "__main__":
    main()
