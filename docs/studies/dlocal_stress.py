"""Stress d_local: strong rotation (within-tile v variation ~ +-9.6 px) + shear."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import numpy as np
import jax, jax.numpy as jnp
import dataclasses
import cuda_optical_flow_2_tpu as of
from cuda_optical_flow_2_tpu.utils.profiling import device_time

H, W = 1080, 1920
rng = np.random.default_rng(0)
base = rng.normal(0, 1, (H + 120, W + 120)).astype(np.float32)
k = np.exp(-np.linspace(-3,3,13)**2/2); k/=k.sum()
tex = np.apply_along_axis(lambda r: np.convolve(r, k, 'same'), 0, base)
tex = np.apply_along_axis(lambda r: np.convolve(r, k, 'same'), 1, tex)
tex = (tex - tex.min()) / (tex.max() - tex.min()) * 255.0
ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
cy, cx = H/2, W/2

def study(theta, s, label):
    u_true = -(ys - cy) * theta + (xs - cx) * s
    v_true = (xs - cx) * theta + (ys - cy) * s
    def sample(img, y, x):
        y0 = np.clip(np.floor(y).astype(int), 0, img.shape[0]-2)
        x0 = np.clip(np.floor(x).astype(int), 0, img.shape[1]-2)
        ty, tx = y - y0, x - x0
        return ((img[y0,x0]*(1-tx)+img[y0,x0+1]*tx)*(1-ty)+(img[y0+1,x0]*(1-tx)+img[y0+1,x0+1]*tx)*ty)
    prev = tex[60:60+H, 60:60+W]
    nxt = sample(tex, ys + 60 + v_true, xs + 60 + u_true)
    p, n = jnp.asarray(prev), jnp.asarray(nxt)
    print(f"--- {label}: max|flow| {np.abs(np.stack([u_true,v_true])).max():.1f}, "
          f"within-64row-tile v-range {np.ptp(v_true[:1,:]):.1f}px")
    for dl in (15, 11, 7):
        cfg = dataclasses.replace(of.PAPER_1080P, d_local=dl)
        f = jax.jit(of.pyramidal_lk, static_argnames=("config",))
        flow = np.asarray(f(p, n, config=cfg))
        inner = slice(60, -60)
        epe = np.hypot(flow[inner,inner,0] + u_true[inner,inner],
                       flow[inner,inner,1] + v_true[inner,inner])
        ms = device_time(lambda a,b: of.pyramidal_lk(a,b,cfg), p, n, iters=30)*1e3
        print(f"  d_local={dl}: mean EPE {epe.mean():.4f} p95 {np.percentile(epe,95):.3f}  {ms:.2f} ms ({1e3/ms:.0f} fps)")

study(0.004, 0.002, "moderate rotation 0.004 rad (7.7px within-tile range)")
study(0.010, 0.002, "strong rotation 0.010 rad")
study(0.018, 0.000, "extreme rotation 0.018 rad (17px within-tile range)")
