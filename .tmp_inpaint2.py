import numpy as np, jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from cuda_optical_flow_2_tpu.models import tvl1, consistency
from cuda_optical_flow_2_tpu.models.horn_schunck import _avg3x3
from cuda_optical_flow_2_tpu.ops.conv import stencil2d
from cuda_optical_flow_2_tpu.utils.layered import Layer, layered_scene

h, w = 192, 256
cases = [
 ('disk', layered_scene(h, w, bg_flow=(-2.0, 1.0), layers=[Layer('disk', (96.0,128.0), 45.0, (3.0,1.0))], seed=3)),
 ('bar',  layered_scene(h, w, bg_flow=(-3.0, 0.0), layers=[Layer('rect', (96.0,128.0),(120.0,22.0),(4.0,0.0))], seed=7)),
 ('two',  layered_scene(h, w, bg_flow=(0.5, 0.5), layers=[Layer('disk', (70.0,80.0), 34.0, (2.5,-1.5)), Layer('disk', (120.0,180.0), 30.0, (-1.5,2.5))], seed=5)),
]
interior = np.zeros((h, w), bool); interior[16:-16, 16:-16] = True
cfg = tvl1.TVL1Config(levels=4, use_pallas=False, max_displacement=8)
run = lambda p, n: tvl1.pyramidal_tvl1(jnp.asarray(p, jnp.float32), jnp.asarray(n, jnp.float32), cfg)

DXC = np.array([[0.5, 0.0, -0.5]], np.float32); DYC = DXC.T

def occ_fill(flow, occ, iters=300, beta=2.0):
    """Side-aware diffusion: sources whose flow points INTO the occluded
    region (the occluder) are down-weighted."""
    u = jnp.asarray(flow)
    occf = jnp.asarray(occ, jnp.float32)
    # inward normal of occluded region at nearby pixels: gradient of blurred mask
    m = occf
    for _ in range(4):
        m = _avg3x3(m) + m * 0.0 + m * 0  # pure neighbor avg spreads; add center
        m = 0.5 * m + 0.5 * occf
    gx = -stencil2d(m, DXC); gy = -stencil2d(m, DYC)  # points toward increasing occ
    norm = jnp.sqrt(gx*gx + gy*gy) + 1e-6
    nx, ny = gx / norm, gy / norm
    fmag = jnp.sqrt(u[...,0]**2 + u[...,1]**2) + 1e-6
    proj = u[...,0] * nx + u[...,1] * ny  # px/frame INTO the occluded region
    src_w = jnp.exp(-beta * jnp.maximum(proj, 0.0))
    trusted = (1.0 - occf) * src_w
    known = u * trusted[..., None]
    wgt = trusted[..., None]
    for _ in range(iters):
        num = jnp.stack([_avg3x3(known[...,0]), _avg3x3(known[...,1])], -1)
        den = _avg3x3(wgt[...,0])[..., None]
        newu = num / jnp.maximum(den, 1e-9)
        filled = den[...,0] > 1e-9
        keep = (1.0 - occf)[..., None] > 0
        known = jnp.where(keep, known, jnp.where(filled[...,None], newu * jnp.maximum(wgt, filled[...,None]*1.0), known))
        # carry filled values with weight 1 in occluded region
        known = jnp.where(keep, known, jnp.where(filled[...,None], newu, known))
        wgt = jnp.where(keep, wgt, jnp.maximum(wgt, filled[...,None].astype(jnp.float32)))
    return np.where(occ[...,None], np.asarray(known), flow)

for name, sc in cases:
    fw = np.asarray(run(sc.prev, sc.nxt))
    bwf = np.asarray(run(sc.nxt, sc.prev))
    occ_det = np.asarray(consistency.occlusion_score(jnp.asarray(fw), jnp.asarray(bwf), alpha=0.01)) > 0.5
    def epe(f, mask):
        return float(np.hypot(*(f - sc.flow).transpose(2,0,1))[mask & interior].mean())
    print(f'{name}: raw unmatched {epe(fw, sc.occ):.3f}', flush=True)
    print(f'  side-aware fill (true mask) {epe(occ_fill(fw, sc.occ), sc.occ):.3f}', flush=True)
    print(f'  side-aware fill (detected)  {epe(occ_fill(fw, occ_det), sc.occ):.3f}', flush=True)
    # overall interior EPE before/after (should not hurt matched)
    allm = np.ones((h,w), bool)
    print(f'  overall: raw {epe(fw, allm):.3f} -> filled(det) {epe(occ_fill(fw, occ_det), allm):.3f}', flush=True)
