import numpy as np, jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from cuda_optical_flow_2_tpu.models import tvl1
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
DXC = np.array([[0.5, 0.0, -0.5]], np.float32); DYC = DXC.T

def occ_fill(flow, occ, iters=300, beta=2.0, blur=4):
    u = jnp.asarray(flow)
    occf = jnp.asarray(occ, jnp.float32)
    m = occf
    for _ in range(blur):
        m = 0.5 * _avg3x3(m) + 0.5 * occf
    gx = -stencil2d(m, DXC); gy = -stencil2d(m, DYC)
    norm = jnp.sqrt(gx*gx + gy*gy) + 1e-6
    nx, ny = gx / norm, gy / norm
    proj = u[...,0] * nx + u[...,1] * ny
    src_w = jnp.exp(-beta * jnp.maximum(proj, 0.0))
    trusted = (1.0 - occf) * src_w
    known = u * trusted[..., None]
    wgt = trusted[..., None]
    keep = (1.0 - occf)[..., None] > 0
    for _ in range(iters):
        num = jnp.stack([_avg3x3(known[...,0]), _avg3x3(known[...,1])], -1)
        den = _avg3x3(wgt[...,0])[..., None]
        newu = num / jnp.maximum(den, 1e-9)
        filled = den[...,0] > 1e-9
        known = jnp.where(keep, known, jnp.where(filled[...,None], newu, known))
        wgt = jnp.where(keep, wgt, jnp.maximum(wgt, filled[...,None].astype(jnp.float32)))
    return np.where(occ[...,None], np.asarray(known), flow)

flows = {}
for name, sc in cases:
    flows[name] = np.asarray(tvl1.pyramidal_tvl1(jnp.asarray(sc.prev, jnp.float32), jnp.asarray(sc.nxt, jnp.float32), cfg))

for beta in (1.0, 2.0, 4.0, 8.0):
    for blur in (4, 8):
        out = []
        for name, sc in cases:
            f2 = occ_fill(flows[name], sc.occ, beta=beta, blur=blur)
            e = float(np.hypot(*(f2 - sc.flow).transpose(2,0,1))[sc.occ & interior].mean())
            out.append(f'{name} {e:.3f}')
        print(f'beta={beta} blur={blur}: ' + '  '.join(out), flush=True)
