"""d_local perf/accuracy study on TPU: rotation+zoom 1080p field."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import time
import numpy as np
import jax, jax.numpy as jnp
import cuda_optical_flow_2_tpu as of
from cuda_optical_flow_2_tpu.utils.profiling import device_time
import dataclasses

H, W = 1080, 1920
rng = np.random.default_rng(0)
# smooth random texture
base = rng.normal(0, 1, (H + 80, W + 80)).astype(np.float32)
try:
    from scipy import ndimage  # may not exist; fall back

    tex = ndimage.gaussian_filter(base, 3.0)
except ImportError:
    k = np.exp(-np.linspace(-3,3,13)**2/2); k/=k.sum()
    tex = np.apply_along_axis(lambda r: np.convolve(r, k, 'same'), 0, base)
    tex = np.apply_along_axis(lambda r: np.convolve(r, k, 'same'), 1, tex)
tex = (tex - tex.min()) / (tex.max() - tex.min()) * 255.0

ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
cy, cx = H / 2, W / 2
# rotation (0.004 rad) + zoom (0.4%): |flow| up to ~5 px at corners,
# within-tile (64-row stripe) variation of v ~ 0.004*1920 ≈ 7.7 px
theta, s = 0.004, 0.004
u_true = -(ys - cy) * theta + (xs - cx) * s
v_true = (xs - cx) * theta + (ys - cy) * s
print("max|u|", np.abs(u_true).max(), "max|v|", np.abs(v_true).max())

def sample(img, y, x):
    y0 = np.clip(np.floor(y).astype(int), 0, img.shape[0]-2)
    x0 = np.clip(np.floor(x).astype(int), 0, img.shape[1]-2)
    ty, tx = y - y0, x - x0
    return ((img[y0, x0]*(1-tx) + img[y0, x0+1]*tx)*(1-ty) +
            (img[y0+1, x0]*(1-tx) + img[y0+1, x0+1]*tx)*ty)

prev = tex[40:40+H, 40:40+W]
nxt = sample(tex, ys + 40 + v_true, xs + 40 + u_true)  # nxt(x) = prev(x+flow) -> backward LK recovers +flow? of.pyramidal_lk warps nxt by +flow to match prev
p = jnp.asarray(prev); n = jnp.asarray(nxt)

for dl in (15, 11, 7, 5):
    cfg = dataclasses.replace(of.PAPER_1080P, d_local=dl)
    f = jax.jit(of.pyramidal_lk, static_argnames=("config",))
    flow = np.asarray(f(p, n, config=cfg))
    inner = slice(40, -40)
    epe = np.hypot(flow[inner, inner, 0] - (-u_true[inner, inner]),
                   flow[inner, inner, 1] - (-v_true[inner, inner]))
    epe2 = np.hypot(flow[inner, inner, 0] - u_true[inner, inner],
                    flow[inner, inner, 1] - v_true[inner, inner])
    ms = device_time(lambda a, b: of.pyramidal_lk(a, b, cfg), p, n, iters=30) * 1e3
    print(f"d_local={dl}: mean EPE(-truth) {epe.mean():.4f}  EPE(+truth) {epe2.mean():.4f}  {ms:.2f} ms/frame  {1e3/ms:.1f} fps")
