"""Time-tiled Pallas kernel for the TV-L1 primal-dual inner loop.

The XLA formulation (models/tvl1.tvl1_level under ``lax.scan``) makes one
full HBM round trip per iteration over ~10 image-sized arrays (u, v, four
dual planes, gradients, residual constants) for ~40 vector ops of work —
pure bandwidth, 394 ms at the 1080p default (5 levels x 5 warps x 30
iterations).  This kernel runs K iterations per VMEM-resident row band, the
same time-tiling as kernels/hs_sweep.py.

Trapezoid correctness: one primal-dual iteration moves information at most
one row in each direction (the primal step reads div(p) — the row above;
the dual step reads forward differences — the row below), so band-edge
staleness advances <= 1 row per iteration from each edge and a row halo of
``halo_y >= K + 1`` keeps the output band exact after K iterations.

Boundary exactness (the part that differs from HS): the XLA twin uses
Neumann forward differences (zero at the far edge) and the matching
backward-difference divergence with its first-row-keep / last-row-drop
special cases.  In-kernel:

* forward differences are ``roll - x`` MASKED to zero at the last image
  row/column (and outside the image);
* therefore the dual planes are identically zero at the last image
  row/column (their update is a pure decay there, from a zero start) and
  outside the image — which makes the unmasked ``x - roll(x, -1)``
  divergence reproduce BOTH special cases for free (first row: x - 0;
  one-past-last row: 0 - x, which lands outside the image and is masked).

All six state planes (u, v, p1x, p1y, p2x, p2y) are carried between chunk
invocations; gradients and residual constants are recomputed per chunk from
the resident frame bands (noise next to K iterations of work).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuda_optical_flow_2_tpu.kernels.lk_fused import (
    _roll,
    _round_up,
    _stencil3,
    interpret_forced,
    mosaic_ok,
)
from cuda_optical_flow_2_tpu.constants import MASKS
from cuda_optical_flow_2_tpu.ops.gradients import SOBEL_GAIN

__all__ = ["supported", "tvl1_relax", "tvl1_relax_band", "MAX_ITERS"]

_LANE = 128
_SUBLANE = 8
_MAX_ITERS = 14  # per chunk; halo_y = round_up(14 + 2, 8) = 16 rows
MAX_ITERS = _MAX_ITERS


def supported(prev: jax.Array) -> bool:
    h, w = prev.shape[-2:]
    if h < _SUBLANE or w < _SUBLANE:
        return False
    return mosaic_ok()


def _kernel(
    row0_ref,
    p_ref,
    w_ref,
    u0u_ref,
    u0v_ref,
    u_ref,
    v_ref,
    p1x_ref,
    p1y_ref,
    p2x_ref,
    p2y_ref,
    uo_ref,
    vo_ref,
    q1x_ref,
    q1y_ref,
    q2x_ref,
    q2y_ref,
    *,
    tile_h: int,
    halo_y: int,
    halo_x: int,
    img_h: int,
    img_w: int,
    k: int,
    lt: float,
    theta: float,
    tt: float,
    eps: float,
):
    prev = p_ref[0]
    warped = w_ref[0]
    g, wp = prev.shape

    i = pl.program_id(1)
    row_ids = lax.broadcasted_iota(jnp.int32, (g, wp), 0)
    col_ids = lax.broadcasted_iota(jnp.int32, (g, wp), 1)
    # GLOBAL image row of each band cell: row0_ref holds the global row of
    # input row 0 (zero for the whole-image entry; the spatial-TP band entry
    # passes the shard offset so the Neumann boundary masking acts on the
    # global image, not the band).
    img_row = row_ids + i * tile_h - halo_y + row0_ref[0]
    inside = (
        (img_row >= 0)
        & (img_row < img_h)
        & (col_ids >= halo_x)
        & (col_ids < halo_x + img_w)
    )
    # Forward differences must be zero AT the last image row/column too.
    fd_ok_x = inside & (col_ids < halo_x + img_w - 1)
    fd_ok_y = inside & (img_row < img_h - 1)
    zero = jnp.zeros((g, wp), jnp.float32)

    gx = _stencil3(warped, MASKS["sobel_x"] * (1.0 / SOBEL_GAIN))
    gy = _stencil3(warped, MASKS["sobel_y"] * (1.0 / SOBEL_GAIN))
    gx = jnp.where(inside, gx, zero)
    gy = jnp.where(inside, gy, zero)
    g2 = gx * gx + gy * gy
    inv_g2s = 1.0 / jnp.maximum(g2, jnp.float32(eps))
    th = jnp.float32(lt) * g2
    # rho = it + (u - u0).g  ==  itp + u.g  with the u0 term folded once.
    itp = (
        warped
        - prev
        - u0u_ref[0] * gx
        - u0v_ref[0] * gy
    )

    u = u_ref[0]
    v = v_ref[0]
    p1x = p1x_ref[0]
    p1y = p1y_ref[0]
    p2x = p2x_ref[0]
    p2y = p2y_ref[0]

    def fd_x(x):
        return jnp.where(fd_ok_x, _roll(x, 1, 1) - x, zero)

    def fd_y(x):
        return jnp.where(fd_ok_y, _roll(x, 1, 0) - x, zero)

    def div(px, py):
        return (px - _roll(px, -1, 1)) + (py - _roll(py, -1, 0))

    ttf = jnp.float32(tt)
    thetaf = jnp.float32(theta)
    ltf = jnp.float32(lt)

    for _ in range(k):
        rho = itp + u * gx + v * gy
        du = jnp.where(
            rho < -th, ltf * gx,
            jnp.where(rho > th, -ltf * gx, -rho * gx * inv_g2s),
        )
        dv = jnp.where(
            rho < -th, ltf * gy,
            jnp.where(rho > th, -ltf * gy, -rho * gy * inv_g2s),
        )
        u = jnp.where(inside, u + du + thetaf * div(p1x, p1y), zero)
        v = jnp.where(inside, v + dv + thetaf * div(p2x, p2y), zero)
        ux, uy = fd_x(u), fd_y(u)
        vx, vy = fd_x(v), fd_y(v)
        nu = 1.0 + ttf * jnp.sqrt(ux * ux + uy * uy)
        nv = 1.0 + ttf * jnp.sqrt(vx * vx + vy * vy)
        p1x = (p1x + ttf * ux) / nu
        p1y = (p1y + ttf * uy) / nu
        p2x = (p2x + ttf * vx) / nv
        p2y = (p2y + ttf * vy) / nv

    sl = slice(halo_y, halo_y + tile_h)
    uo_ref[:] = u[sl]
    vo_ref[:] = v[sl]
    q1x_ref[:] = p1x[sl]
    q1y_ref[:] = p1y[sl]
    q2x_ref[:] = p2x[sl]
    q2y_ref[:] = p2y[sl]


def _pick_tile_h(wp: int, halo_y: int, h: int) -> int:
    """Largest band whose ~26 live (G, WP) f32 tiles fit in ~22 MB VMEM."""
    budget = 22 * 1024 * 1024
    cap = max(8, ((h + 7) // 8) * 8)  # never exceed the image height
    for th in (256, 128, 64, 32, 16, 8):
        g = th + 2 * halo_y
        if 26 * g * wp * 4 <= budget:
            return min(th, cap)
    return 8


@functools.partial(
    jax.jit,
    static_argnames=("iterations", "lambda_", "theta", "tau", "eps", "interpret"),
)
def tvl1_relax(
    prev: jax.Array,
    warped: jax.Array,
    u0: jax.Array,
    flow: jax.Array,
    *,
    iterations: int,
    lambda_: float,
    theta: float,
    tau: float,
    eps: float,
    interpret: bool = False,
) -> jax.Array:
    """``iterations`` TV-L1 primal-dual steps on one linearization.

    Drop-in replacement for the scan in models/tvl1.tvl1_level (same
    threshold step, Neumann differences and dual projection); duals start at
    zero like the XLA twin.  Returns (..., H, W, 2) float32.
    """
    lead = prev.shape[:-2]
    h, w = prev.shape[-2:]
    f = flow.reshape((-1, h, w, 2)).astype(jnp.float32)
    state = (f[..., 0], f[..., 1]) + (jnp.zeros_like(f[..., 0]),) * 4
    state = _relax_impl(
        prev, warped, u0, state, jnp.zeros((1,), jnp.int32), h,
        iterations=iterations, lambda_=lambda_, theta=theta, tau=tau,
        eps=eps, interpret=interpret,
    )
    return jnp.stack(state[:2], axis=-1).reshape(lead + (h, w, 2))


def tvl1_relax_band(
    prev: jax.Array,
    warped: jax.Array,
    u0: jax.Array,
    state: tuple[jax.Array, ...],
    row0,
    h_global: int,
    *,
    iterations: int,
    lambda_: float,
    theta: float,
    tau: float,
    eps: float,
    interpret: bool = False,
    vma: tuple[str, ...] = (),
) -> tuple[jax.Array, ...]:
    """ONE chunk of ``iterations`` primal-dual steps on a row BAND of an
    ``h_global``-row image, carrying the six-plane state.

    The spatial-TP entry (parallel/spatial_models._local_tvl1_level):
    inputs are one shard's halo-extended band (``prev``/``warped``/``u0``
    frames plus ``state`` = (u, v, p1x, p1y, p2x, p2y), all (..., Hband, W));
    ``row0`` is the (traced) global row of band row 0, so the Neumann
    boundary special cases act on the GLOBAL image.  With a caller halo of
    ``iterations + 2`` real rows (Sobel/constants ring 2 + one row of
    band-edge staleness per iteration) the kept interior matches the
    unsharded kernel exactly; band-edge rows are garbage and must be
    cropped.  ``iterations`` must fit one kernel invocation
    (<= ``MAX_ITERS``) — chunking across exchanges is the caller's job.
    ``vma`` names the shard_map mesh axes the band varies over.
    """
    if iterations > _MAX_ITERS:
        raise ValueError(
            f"tvl1_relax_band runs one chunk: {iterations} > {_MAX_ITERS}"
        )
    row0_arr = jnp.reshape(jnp.asarray(row0, jnp.int32), (1,))
    h, w = prev.shape[-2:]
    lead = prev.shape[:-2]
    state = tuple(
        s.reshape((-1, h, w)).astype(jnp.float32) for s in state
    )
    out = _relax_impl(
        prev, warped, u0, state, row0_arr, h_global,
        iterations=iterations, lambda_=lambda_, theta=theta, tau=tau,
        eps=eps, interpret=interpret, vma=vma,
    )
    return tuple(s.reshape(lead + (h, w)) for s in out)


@functools.partial(
    jax.jit,
    static_argnames=(
        "h_global", "iterations", "lambda_", "theta", "tau", "eps",
        "interpret", "vma",
    ),
)
def _relax_impl(
    prev: jax.Array,
    warped: jax.Array,
    u0: jax.Array,
    state: tuple[jax.Array, ...],
    row0_arr: jax.Array,
    h_global: int,
    *,
    iterations: int,
    lambda_: float,
    theta: float,
    tau: float,
    eps: float,
    interpret: bool,
    vma: tuple[str, ...] = (),
) -> tuple[jax.Array, ...]:
    """Shared impl: returns the six state planes as (B*, H, W) float32."""
    h, w = prev.shape[-2:]
    if iterations <= 0:
        # zero iterations: identity on the carried state (divmod(0, k)
        # below would divide by k = 0)
        return tuple(
            jnp.asarray(s, jnp.float32).reshape((-1, h, w)) for s in state
        )
    x = prev.reshape((-1, h, w)).astype(jnp.float32)
    y = warped.reshape((-1, h, w)).astype(jnp.float32)
    f0 = u0.reshape((-1, h, w, 2)).astype(jnp.float32)
    b = x.shape[0]

    k = min(_MAX_ITERS, iterations)
    halo_y = _round_up(k + 2, _SUBLANE)
    halo_x = 1
    wp = _round_up(w + 2 * halo_x, _LANE)
    tile_h = _pick_tile_h(wp, halo_y, h)
    ht = pl.cdiv(h, tile_h)
    hp = ht * tile_h + 2 * halo_y

    pad = ((0, 0), (halo_y, hp - h - halo_y), (halo_x, wp - w - halo_x))
    xp = jnp.pad(x, pad)
    yp = jnp.pad(y, pad)
    u0u = jnp.pad(f0[..., 0], pad)
    u0v = jnp.pad(f0[..., 1], pad)
    state = tuple(jnp.pad(s.reshape((-1, h, w)), pad) for s in state)

    g = tile_h + 2 * halo_y
    in_spec = pl.BlockSpec(
        (pl.Element(1), pl.Element(g), pl.Element(wp)),
        lambda bb, i: (bb, i * tile_h, 0),
        memory_space=pltpu.VMEM,
    )
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_spec = pl.BlockSpec(
        (None, tile_h, wp), lambda bb, i: (bb, i, 0), memory_space=pltpu.VMEM
    )
    row_repad = ((0, 0), (halo_y, halo_y), (0, 0))
    lt = lambda_ * theta
    tt = tau / theta

    def block(state, iters: int):
        kernel = functools.partial(
            _kernel,
            tile_h=tile_h,
            halo_y=halo_y,
            halo_x=halo_x,
            img_h=h_global,
            img_w=w,
            k=iters,
            lt=lt,
            theta=theta,
            tt=tt,
            eps=eps,
        )
        shape = jax.ShapeDtypeStruct(
            (b, ht * tile_h, wp), jnp.float32, vma=frozenset(vma)
        )
        outs = pl.pallas_call(
            kernel,
            grid=(b, ht),
            in_specs=[smem_spec] + [in_spec] * 10,
            out_specs=(out_spec,) * 6,
            out_shape=(shape,) * 6,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interpret,
        )(row0_arr, xp, yp, u0u, u0v, *state)
        return tuple(jnp.pad(o, row_repad) for o in outs)

    n_full, rem = divmod(iterations, k)
    if n_full:
        def body(carry, _):
            return block(carry, k), None

        state, _ = lax.scan(body, state, None, length=n_full)
    if rem:
        state = block(state, rem)

    return tuple(
        s[:, halo_y : halo_y + h, halo_x : halo_x + w] for s in state
    )
