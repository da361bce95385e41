"""Pallas TPU backward-warp kernel (select-loop, no gather).

TPU VPUs have no per-element gather; XLA lowers the warp's 2-D gather to a
serialized per-element loop (~68 ms at 1080p — the dominant cost of the whole
pipeline).  This kernel replaces it with vectorized select-loops over a
bounded displacement range, computed entirely in VMEM.

An exact 2-D gather does not decompose into two 1-D select passes (a
horizontally-shifted column's row choice was made at the wrong pixel), so the
scheme corrects the row choice per x-corner:

1.  Vertical select-loop over dy: for every correction ``c`` in
    [-C, C+1], build ``A_c(y, x) = img(y + vi(y, x) + c, x)``.
2.  Horizontal select-loop over dx: gather every ``A_c`` — and ``vi``
    itself — at column ``x + ui``, for both x-corners (dx and dx+1).
3.  Per corner, ``c* = clamp(vi(y, x) - vi_at_that_corner, -C, C)`` picks the
    candidate that actually contains ``img(y + vi(y, x), x + ui)``.

The result equals the exact gather wherever the integer row offset varies by
at most C between a pixel and the pixel ``floor(u)`` columns away — always
true for the smooth window-averaged fields coarse-to-fine LK produces; not
guaranteed for adversarial per-pixel random flow.  Displacements are clamped
to ``max_displacement`` (the trackable-motion budget) globally, and to the
recentered ``d_local`` range within a tile (select_core.py).

The heavy lifting lives in select_core.warp_core, shared with the fused
warp+LK level kernel (lk_step_fused.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuda_optical_flow_2_tpu.kernels import select_core
from cuda_optical_flow_2_tpu.kernels.lk_fused import _round_up

__all__ = ["warp_bilinear_select", "warp_bilinear_select_band", "supported"]

_LANE = 128
_SUBLANE = 8



def supported(img: jax.Array, max_displacement: int) -> bool:
    if img.dtype != jnp.float32:
        return False
    h, w = img.shape[-2:]
    if h < 8 or w < 8:
        return False
    return max_displacement <= 96 and jax.default_backend() == "tpu" and not jax.config.jax_enable_x64


def _warp_kernel(
    row0_ref,
    img_ref,
    u_ref,
    v_ref,
    out_ref,
    *,
    halo_y: int,
    d_local: int,
    c_max: int,
    tile_h: int,
    halo_x: int,
    h: int,
    w: int,
    h_global: int,
):
    u = u_ref[0]
    v = v_ref[0]
    to, wp = u.shape
    # Real flow entries of this tile: the recentering mean must not average
    # the zero-flow lane padding / partial-last-tile rows (select_core
    # docstring) — at wp ~2x w the bias would halve large uniform flows.
    # For a shard BAND, "real" additionally means inside the GLOBAL image:
    # the caller's halo_exchange zero-fills boundary shards' out-of-image
    # rows (row0_ref[0] is the global row of band row 0, negative on the top
    # shard), and averaging those rows would bias the recentering just like
    # the padding did.
    i = pl.program_id(1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (to, wp), 0) + i * tile_h
    cols = jax.lax.broadcasted_iota(jnp.int32, (to, wp), 1)
    g_rows = rows + row0_ref[0]
    mask = (
        (rows < h)
        & (g_rows >= 0)
        & (g_rows < h_global)
        & (cols >= halo_x)
        & (cols < halo_x + w)
    )
    warped, _, _ = select_core.warp_core(
        img_ref[0],
        u,
        v,
        row0=halo_y,
        d_local=d_local,
        c_max=c_max,
        mask=mask,
    )
    out_ref[:, :] = warped


def warp_bilinear_select(
    img: jax.Array,
    flow: jax.Array,
    max_displacement: int = 32,
    d_local: int = select_core.DEFAULT_D_LOCAL,
    c_max: int = 2,
    interpret: bool = False,
) -> jax.Array:
    """Bilinear backward warp via the corrected select-loop kernel.

    Semantics match ops/warp.py warp_bilinear — out(x) = img(x + flow(x)),
    sample coordinates clamped to the image, out-of-bounds keeps the
    unwarped pixel — except flow components are clamped to
    +-max_displacement, the within-tile flow range is clamped to +-d_local
    around the tile mean, and exactness requires the smooth-row-offset
    condition described in the module docstring.
    """
    h = img.shape[-2]
    return _select_impl(
        img, flow, jnp.zeros((), jnp.int32), h, int(max_displacement),
        d_local, c_max, interpret,
    )


def warp_bilinear_select_band(
    img_band: jax.Array,
    flow_band: jax.Array,
    row0,
    h_global: int,
    max_displacement: int = 32,
    d_local: int = select_core.DEFAULT_D_LOCAL,
    c_max: int = 2,
    interpret: bool = False,
    vma: tuple[str, ...] = (),
) -> jax.Array:
    """Select-loop warp of a row BAND of an ``h_global``-row image.

    The spatial-TP entry: ``row0`` is the (traced) global row of band row 0;
    the vertical border clamp and the out-of-bounds valid mask act on the
    GLOBAL image, so kept rows (>= ceil(max_displacement)+2 from the band
    edges, where the caller's halo supplies real rows) match the whole-image
    kernel; band-edge rows are garbage and must be cropped.  ``vma`` names
    the shard_map mesh axes the band varies over.
    """
    return _select_impl(
        img_band, flow_band, jnp.asarray(row0, jnp.int32), h_global,
        int(max_displacement), d_local, c_max, interpret, vma,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "h_global", "max_displacement", "d_local", "c_max", "interpret", "vma"
    ),
)
def _select_impl(
    img: jax.Array,
    flow: jax.Array,
    row0: jax.Array,
    h_global: int,
    max_displacement: int,
    d_local: int,
    c_max: int,
    interpret: bool,
    vma: tuple[str, ...] = (),
) -> jax.Array:
    lead = img.shape[:-2]
    h, w = img.shape[-2:]
    x = img.reshape((-1, h, w)).astype(jnp.float32)
    f = flow.reshape((-1, h, w, 2)).astype(jnp.float32)
    b = x.shape[0]
    d = int(max_displacement)

    # GLOBAL row coordinates (row0 = 0 and h_global = h for the whole image)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + row0.astype(
        jnp.float32
    )
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    u_b = jnp.clip(f[..., 0], -d, d)
    v_b = jnp.clip(f[..., 1], -d, d)
    # valid from the BUDGET-clamped components: the declared twin is
    # warp_bilinear(img, clip(flow, +-d)), whose out-of-bounds test sees the
    # clamped flow (same semantics select_core.global_clamp codifies for
    # the fused kernels; raw-flow valid diverged when an unclamped
    # component crossed the border only after clamping).
    valid = (
        (xs + u_b >= 0)
        & (xs + u_b <= w - 1)
        & (ys + v_b >= 0)
        & (ys + v_b <= h_global - 1)
    )
    # absolute clamp to the image (matches ops/warp.py warp_bilinear)
    u = jnp.clip(xs + u_b, 0.0, w - 1) - xs
    v = jnp.clip(ys + v_b, 0.0, h_global - 1) - ys
    # Band rows OUTSIDE the global image (zero-filled boundary halos) would
    # otherwise acquire pseudo-flow from the clamp (ys < 0 -> v = -ys); zero
    # them — they are band-edge garbage by contract, and the in-kernel mask
    # excludes them from the recentering mean.
    inside_rows = (ys >= 0) & (ys <= h_global - 1)
    u = jnp.where(inside_rows, u, 0.0)
    v = jnp.where(inside_rows, v, 0.0)

    halo_y = _round_up(select_core.halo_y(d, d_local, c_max), _SUBLANE)
    halo_x = select_core.halo_x(d, d_local)
    wp = _round_up(w + 2 * halo_x, _LANE)
    # VMEM: 3*ncands select accumulators + 2 vig maps + ~8 temporaries live
    # at the pass-2 peak, plus the (tile_h + 2*halo_y, wp) image tile —
    # sized from ncands so larger c_max shrinks the tile instead of blowing
    # the budget.
    ncands = 2 * c_max + 2
    arrays = 5 + 3 * ncands  # == the measured 23 at the default c_max=2
    budget = 11 * 1024 * 1024 // 4
    th_max = (budget // wp - 2 * halo_y) // arrays
    tile_h = max(_SUBLANE, min(_round_up(h, _SUBLANE), (th_max // _SUBLANE) * _SUBLANE))
    ht = pl.cdiv(h, tile_h)
    hp = ht * tile_h + 2 * halo_y

    xp = jnp.pad(x, ((0, 0), (halo_y, hp - h - halo_y), (halo_x, wp - w - halo_x)))
    pad_uv = ((0, 0), (0, ht * tile_h - h), (halo_x, wp - w - halo_x))
    up = jnp.pad(u, pad_uv)
    vp = jnp.pad(v, pad_uv)

    kernel = functools.partial(
        _warp_kernel, halo_y=halo_y, d_local=d_local, c_max=c_max,
        tile_h=tile_h, halo_x=halo_x, h=h, w=w, h_global=h_global,
    )
    row0_arr = jnp.reshape(row0, (1,))
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
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        kernel,
        grid=(b, ht),
        in_specs=[smem_spec, img_spec, uv_spec, uv_spec],
        out_specs=pl.BlockSpec(
            (None, tile_h, wp), lambda bb, i: (bb, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, ht * tile_h, wp), jnp.float32, vma=frozenset(vma)
        ),
        compiler_params=pltpu.CompilerParams(
            # Mosaic's default 16 MB scoped-VMEM cap is both tight and
            # compile-dependent (docs/PERF.md finding 5); the ~11 MB budget
            # above under-counts at some shapes (observed 17.6 MB at 540x960).
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(row0_arr, xp, up, vp)
    out = out[:, :h, halo_x : halo_x + w]
    out = jnp.where(valid, out, x)
    return out.reshape(lead + (h, w))
