"""Pallas TPU backward-warp kernel (select-loop, no gather).

TPU VPUs have no per-element gather; XLA lowers the warp's 2-D gather to a
serialized per-element loop (~68 ms at 1080p — the dominant cost of the whole
pipeline).  This kernel replaces it with vectorized select-loops over a
bounded displacement range, computed entirely in VMEM.

An exact 2-D gather does not decompose into two 1-D select passes (a
horizontally-shifted column's row choice was made at the wrong pixel), so the
kernel uses a *corrected* two-pass scheme:

1.  Vertical select-loop over dy: for every correction ``c`` in
    [-C, C+1], build ``A_c(y, x) = img(y + vi(y, x) + c, x)``.
2.  Horizontal select-loop over dx: gather every ``A_c`` — and ``vi``
    itself — at column ``x + ui``, for both x-corners (dx and dx+1).
3.  ``c* = clamp(vi(y, x) - vi(y, x + ui), -C, C)`` picks the candidate that
    actually contains ``img(y + vi(y, x), x + ui)``; the +1 candidate gives
    the second y-corner for the bilinear blend.

The result equals the exact gather wherever the integer row offset varies by
at most C between a pixel and the pixel ``floor(u)`` columns away — always
true for the smooth window-averaged fields coarse-to-fine LK produces;
not guaranteed for adversarial per-pixel random flow.  Displacements are
clamped to ``max_displacement`` (the trackable-motion budget); cost is
linear in it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["warp_bilinear_select", "supported"]

_LANE = 128
_SUBLANE = 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def supported(img: jax.Array, max_displacement: int) -> bool:
    if img.dtype != jnp.float32:
        return False
    h, w = img.shape[-2:]
    if h < 8 or w < 8:
        return False
    return max_displacement <= 96 and jax.default_backend() == "tpu"


def _roll(x: jax.Array, d: int, axis: int) -> jax.Array:
    """out[i] = x[i + d] with wraparound (margins keep wrap out of reads)."""
    size = x.shape[axis]
    s = (-d) % size
    return pltpu.roll(x, s, axis) if s else x


def _roll_dyn(x: jax.Array, d: jax.Array, axis: int) -> jax.Array:
    """Dynamic-shift variant of :func:`_roll` (d is a traced int32 scalar)."""
    size = x.shape[axis]
    return pltpu.roll(x, jnp.mod(-d, size), axis)


def _warp_kernel(
    img_ref,
    u_ref,
    v_ref,
    out_ref,
    *,
    tile_h: int,
    halo_y: int,
    d_max: int,
    c_max: int,
):
    img = img_ref[0]
    u = u_ref[0]
    v = v_ref[0]
    th = tile_h

    vi_f = jnp.floor(v)
    ui_f = jnp.floor(u)
    ty = v - vi_f
    tx = u - ui_f
    vi = vi_f.astype(jnp.int32)
    ui = ui_f.astype(jnp.int32)

    ncands = 2 * c_max + 2  # corrections c in [-c_max, c_max + 1]
    zero = jnp.zeros((th, v.shape[1]), jnp.float32)

    # Both select-loops run as fori_loops with dynamic-shift rolls: unrolling
    # 2*d_max iterations of multi-array roll+select blows the Mosaic VMEM
    # stack allocator (observed 24 MB > 16 MB at d_max=32); the rolled loop
    # keeps only the carries live.

    # --- Pass 1 (vertical): A_c(t, x) = img(t + halo_y + vi(t, x) + c, x).
    def body_v(i, accs):
        d = i - d_max
        sel = vi == d
        base = _roll_dyn(img, d - c_max + halo_y, 0)
        out = []
        for ci in range(ncands):
            out.append(accs[ci] + jnp.where(sel, base[:th, :], 0.0))
            if ci + 1 < ncands:
                base = _roll(base, 1, 0)
        return tuple(out)

    acc = jax.lax.fori_loop(
        0, 2 * d_max + 1, body_v, tuple(zero for _ in range(ncands))
    )

    # --- Pass 2 (horizontal): gather A_c and vi at x + ui, both x-corners.
    def body_h(i, carry):
        g0, g1, vig0, vig1 = carry
        d = i - d_max
        rolled = tuple(_roll_dyn(a, d, 1) for a in acc)
        vi_rolled = _roll_dyn(vi, d, 1)
        sel0 = ui == d
        sel1 = ui == (d - 1)
        g0 = tuple(
            g0[ci] + jnp.where(sel0, rolled[ci], 0.0) for ci in range(ncands)
        )
        g1 = tuple(
            g1[ci] + jnp.where(sel1, rolled[ci], 0.0) for ci in range(ncands)
        )
        vig0 = vig0 + jnp.where(sel0, vi_rolled, 0)
        vig1 = vig1 + jnp.where(sel1, vi_rolled, 0)
        return g0, g1, vig0, vig1

    zi = jnp.zeros(zero.shape, jnp.int32)
    g0, g1, vig0, vig1 = jax.lax.fori_loop(
        0,
        2 * d_max + 2,
        body_h,
        (
            tuple(zero for _ in range(ncands)),
            tuple(zero for _ in range(ncands)),
            zi,
            zi,
        ),
    )

    # --- Correction select: each x-corner's sampled column made its own row
    # choice; match it to THIS pixel's row choice.
    corners = []
    for gathered, vig in ((g0, vig0), (g1, vig1)):
        cstar = jnp.clip(vi - vig, -c_max, c_max)
        v0 = jnp.zeros_like(acc[0])
        v1 = jnp.zeros_like(acc[0])
        for ci, c in enumerate(range(-c_max, c_max + 1)):
            sel = cstar == c
            v0 = v0 + jnp.where(sel, gathered[ci], 0.0)
            v1 = v1 + jnp.where(sel, gathered[ci + 1], 0.0)
        corners.append((v0, v1))
    (v00, v10), (v01, v11) = corners
    top = v00 + tx * (v01 - v00)
    bot = v10 + tx * (v11 - v10)
    out_ref[:, :] = top + ty * (bot - top)


@functools.partial(
    jax.jit, static_argnames=("max_displacement", "c_max", "interpret")
)
def warp_bilinear_select(
    img: jax.Array,
    flow: jax.Array,
    max_displacement: int = 32,
    c_max: int = 2,
    interpret: bool = False,
) -> jax.Array:
    """Bilinear backward warp via the corrected select-loop kernel.

    Semantics match ops/warp.py warp_bilinear — out(x) = img(x + flow(x)),
    sample coordinates clamped to the image, out-of-bounds keeps the
    unwarped pixel — except flow components are clamped to
    +-max_displacement, and exactness requires the smooth-row-offset
    condition described in the module docstring.
    """
    lead = img.shape[:-2]
    h, w = img.shape[-2:]
    x = img.reshape((-1, h, w)).astype(jnp.float32)
    f = flow.reshape((-1, h, w, 2)).astype(jnp.float32)
    b = x.shape[0]
    d = int(max_displacement)

    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    u_raw = f[..., 0]
    v_raw = f[..., 1]
    u = jnp.clip(u_raw, -d, d)
    v = jnp.clip(v_raw, -d, d)
    # absolute clamp to the image (matches ops/warp.py warp_bilinear)
    u = jnp.clip(xs + u, 0.0, w - 1) - xs
    v = jnp.clip(ys + v, 0.0, h - 1) - ys
    valid = (
        (xs + u_raw >= 0)
        & (xs + u_raw <= w - 1)
        & (ys + v_raw >= 0)
        & (ys + v_raw <= h - 1)
    )

    halo_y = _round_up(d + c_max + 2, _SUBLANE)
    halo_x = d + 2
    wp = _round_up(w + 2 * halo_x, _LANE)
    # ~28 (tile_h, wp) arrays live at the pass-2 peak (acc + g0 + g1 + rolled
    # temporaries + index maps) plus the (tile_h + 2*halo_y, wp) image tile;
    # size the tile to a 11 MB budget (16 MB VMEM minus pipeline slack).
    budget = 11 * 1024 * 1024 // 4
    th_max = (budget // wp - 2 * halo_y) // 29
    tile_h = max(_SUBLANE, min(_round_up(h, _SUBLANE), (th_max // _SUBLANE) * _SUBLANE))
    ht = pl.cdiv(h, tile_h)
    hp = ht * tile_h + 2 * halo_y

    xp = jnp.pad(x, ((0, 0), (halo_y, hp - h - halo_y), (halo_x, wp - w - halo_x)))
    pad_uv = ((0, 0), (0, ht * tile_h - h), (halo_x, wp - w - halo_x))
    up = jnp.pad(u, pad_uv)
    vp = jnp.pad(v, pad_uv)

    kernel = functools.partial(
        _warp_kernel,
        tile_h=tile_h,
        halo_y=halo_y,
        d_max=d,
        c_max=c_max,
    )
    img_spec = pl.BlockSpec(
        (pl.Element(1), pl.Element(tile_h + 2 * halo_y), pl.Element(wp)),
        lambda bb, i: (bb, i * tile_h, 0),
        memory_space=pltpu.VMEM,
    )
    uv_spec = pl.BlockSpec(
        (pl.Element(1), pl.Element(tile_h), pl.Element(wp)),
        lambda bb, i: (bb, i * tile_h, 0),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, ht),
        in_specs=[img_spec, uv_spec, uv_spec],
        out_specs=pl.BlockSpec(
            (None, tile_h, wp), lambda bb, i: (bb, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, ht * tile_h, wp), jnp.float32),
        interpret=interpret,
    )(xp, up, vp)
    out = out[:, :h, halo_x : halo_x + w]
    out = jnp.where(valid, out, x)
    return out.reshape(lead + (h, w))
