"""Microbenchmark the warp core's internal passes at production shape.

Builds standalone Pallas kernels replicating each phase of
kernels/select_core.warp_core at the level-0 tile shape, to locate the time.
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import functools
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from cuda_optical_flow_2_tpu.utils.profiling import device_time

# production level-0 geometry (lk_step_fused at 1080p, d_local=7, c_max=1)
TO, WP = 136, 2048       # band rows (tile_h + 2rw), padded width
GI = 136 + 2 * 64        # nxt tile rows
D_LOCAL, C_MAX, CHUNK = 7, 1, 8
NCANDS = 2 * C_MAX + 2
N_TILES = 9              # 1080 / 120


def mk(kernel_body, n_in=2):
    def kernel(*refs):
        kernel_body(*refs)
    ins = [pl.BlockSpec((pl.Element(GI), pl.Element(WP)), lambda i: (0, 0), memory_space=pltpu.VMEM)] + \
          [pl.BlockSpec((pl.Element(TO), pl.Element(WP)), lambda i: (0, 0), memory_space=pltpu.VMEM)] * (n_in - 1)
    return pl.pallas_call(
        kernel,
        grid=(N_TILES,),
        in_specs=ins,
        out_specs=pl.BlockSpec((TO, WP), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((TO, WP), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )


def _roll(x, d, axis):
    s = (-d) % x.shape[axis]
    return pltpu.roll(x, s, axis) if s else x


def _roll_dyn(x, d, axis):
    return pltpu.roll(x, jnp.mod(-d, x.shape[axis]), axis)


def vertical_pass(img_ref, vi_ref, out_ref):
    img = img_ref[...]
    vi = vi_ref[...].astype(jnp.int32)
    def scoped(acc_ref):
        zero = jnp.zeros((TO, WP), jnp.float32)
        for ci in range(NCANDS):
            acc_ref[ci] = zero
        n_chunks = -(-(2 * D_LOCAL + 1) // CHUNK)
        def body(q, _):
            d_base = q * CHUNK - D_LOCAL
            cands = [_roll_dyn(img, d_base, 0)]
            for _ in range(NCANDS - 1):
                cands.append(_roll(cands[-1], 1, 0))
            for j in range(CHUNK):
                sel = vi == (d_base + j)
                for ci in range(NCANDS):
                    acc_ref[ci] = acc_ref[ci] + jnp.where(sel, cands[ci][:TO, :], 0.0)
                if j + 1 < CHUNK:
                    cands = cands[1:] + [_roll(cands[-1], 1, 0)]
            return 0
        jax.lax.fori_loop(0, n_chunks, body, 0)
        out_ref[:, :] = acc_ref[0]
    pl.run_scoped(scoped, acc_ref=pltpu.VMEM((NCANDS, TO, WP), jnp.float32))


def horizontal_pass(img_ref, ui_ref, out_ref):
    # acc arrays stand in for A_c; gather both corners + vig like pass 2
    ui = ui_ref[...].astype(jnp.int32)
    accs = [img_ref[...][:TO, :] for _ in range(NCANDS)]
    def scoped(g0_ref, g1_ref, vig_ref):
        zero = jnp.zeros((TO, WP), jnp.float32)
        for ci in range(NCANDS):
            g0_ref[ci] = zero
            g1_ref[ci] = zero
        vig_ref[0] = jnp.zeros((TO, WP), jnp.int32)
        vig_ref[1] = jnp.zeros((TO, WP), jnp.int32)
        n_chunks = -(-(2 * D_LOCAL + 2) // CHUNK)
        def body(q, _):
            d_base = q * CHUNK - D_LOCAL
            rolled = [_roll_dyn(a, d_base, 1) for a in accs]
            vi_rolled = _roll_dyn(ui, d_base, 1)
            for j in range(CHUNK):
                d = d_base + j
                sel0 = ui == d
                sel1 = ui == (d - 1)
                for ci in range(NCANDS):
                    g0_ref[ci] = g0_ref[ci] + jnp.where(sel0, rolled[ci], 0.0)
                    g1_ref[ci] = g1_ref[ci] + jnp.where(sel1, rolled[ci], 0.0)
                vig_ref[0] = vig_ref[0] + jnp.where(sel0, vi_rolled, 0)
                vig_ref[1] = vig_ref[1] + jnp.where(sel1, vi_rolled, 0)
                if j + 1 < CHUNK:
                    rolled = [_roll(a, 1, 1) for a in rolled]
                    vi_rolled = _roll(vi_rolled, 1, 1)
            return 0
        jax.lax.fori_loop(0, n_chunks, body, 0)
        out_ref[:, :] = g0_ref[0] + g1_ref[1]
    pl.run_scoped(
        scoped,
        g0_ref=pltpu.VMEM((NCANDS, TO, WP), jnp.float32),
        g1_ref=pltpu.VMEM((NCANDS, TO, WP), jnp.float32),
        vig_ref=pltpu.VMEM((2, TO, WP), jnp.int32),
    )


def window_sums(img_ref, x_ref, out_ref):
    from cuda_optical_flow_2_tpu.kernels.lk_fused import _box_sum
    ix = x_ref[...]
    iy = _roll(ix, 1, 0)
    it = _roll(ix, 1, 1)
    r = 7
    acc = jnp.zeros((TO, WP), jnp.float32)
    for prod in (ix * ix, iy * iy, ix * iy, ix * it, iy * it):
        acc = acc + _box_sum(_box_sum(prod, r, 0), r, 1)
    out_ref[:, :] = acc + 0 * img_ref[0, 0]


rng = np.random.default_rng(0)
img = jnp.asarray(rng.normal(0, 1, (GI, WP)).astype(np.float32))
sel = jnp.asarray(rng.integers(-D_LOCAL, D_LOCAL + 1, (TO, WP)).astype(np.float32))

for name, body in [("vertical", vertical_pass), ("horizontal", horizontal_pass), ("window_sums", window_sums)]:
    f = mk(body)
    ms = device_time(lambda a, b: f(a, b), img, sel, iters=40) * 1e3
    print(f"{name}: {ms:.3f} ms for {N_TILES} tiles ({ms/N_TILES*1e3:.1f} us/tile)")
