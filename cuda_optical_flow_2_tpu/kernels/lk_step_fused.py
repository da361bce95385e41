"""Fully-fused LK level step: warp + gradients + window sums + solve + update.

One Pallas kernel per pyramid level computes, for each VMEM-resident row
band:

    warped   = backward-warp(next, flow)          (select_core.warp_core)
    Ix, Iy   = Sobel(prev),  It = K_t (x) (warped - prev)
    sums     = 5 windowed box sums (shift-doubling)
    residual = guarded 2x2 solve
    flow_out = applied_flow + residual

This is the end state of SURVEY.md section 7 step 4: the reference's entire
per-level stack — cpu::shift_back_pyramid + 4 convolution launches + 5 srm
launches + the solve launch, with ~24 PCIe transfers (OptFlowGpu.cu:
1909-1979) — as ONE kernel whose intermediates never leave VMEM.  Compared
to running warp_select + lk_fused as separate kernels it also eliminates the
intermediate warped image's HBM round trip and all the XLA padding/masking
glue between them.

Boundary semantics match the XLA ops path: zero padding outside the image
for gradients and window sums, out-of-bounds warp samples keep the unwarped
pixel, and the output flow accumulates on the flow the warp actually applied
(budget-clamped + border-clamped + tile-recentered, see select_core).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuda_optical_flow_2_tpu.config import LKConfig
from cuda_optical_flow_2_tpu.constants import MASKS
from cuda_optical_flow_2_tpu.kernels import select_core
from cuda_optical_flow_2_tpu.kernels.lk_fused import (
    _win_sum,
    _center_sums,
    _round_up,
    _solve2x2,
    _stencil3,
    supported as _lk_supported,
)
from cuda_optical_flow_2_tpu.ops.gradients import SOBEL_GAIN

__all__ = [
    "supported", "supported_half", "lk_level_step", "lk_band_step"
]

_LANE = 128
_SUBLANE = 8



def supported(prev: jax.Array, config: LKConfig) -> bool:
    return (
        _lk_supported(prev, config)
        and config.max_displacement <= 96
        and config.warp_mode == "bilinear"
    )


def supported_half(prev: jax.Array, config: LKConfig) -> bool:
    """Whether the fused in-kernel 2x flow upsample may be used at this level.

    Requires even target dims (the coarse flow is exactly (h/2, w/2)) and a
    power-of-two padded lane extent (the log-depth lane interleave network,
    kernels/updown.interleave_lanes).  1080p and its even levels qualify
    (wp = 2048/1024/512); widths whose padded extent is not a power of two
    fall back to the XLA upsample pass.
    """
    if not supported(prev, config):
        return False
    h, w = prev.shape[-2:]
    return half_geometry_ok(h, w, config)


def half_geometry_ok(h: int, w: int, config: LKConfig) -> bool:
    """Shape-only half of supported_half (no backend/dtype clauses).

    Exposed separately so cost accounting (bench.py's roofline model) can
    predict engagement from the config alone."""
    if h % 2 or w % 2:
        return False
    r = config.window // 2
    rw = _round_up(r + 1, 4)
    d = int(config.max_displacement)
    halo_x = max(select_core.halo_x(d, config.d_local), rw + 1)
    halo_x += halo_x % 2
    wp = _round_up(w + 2 * halo_x, _LANE)
    return wp & (wp - 1) == 0


def _expand_flow2x(
    uh, i, tile_h, rw, rw2, halo_x2, h2, w2
):
    """Expand a half-res flow block to the (tile_h + 2*rw)-row band.

    Bit-exact twin of ops/resize.upsample_flow's 2x path (0.75/0.25
    half-pixel bilinear, edges clamped at the COARSE plane borders, values
    scaled by 2): rows via stack+reshape (lane dim intact), lanes via the
    log-depth interleave network.
    """
    from cuda_optical_flow_2_tpu.kernels import updown

    text2, wp2 = uh.shape
    text = tile_h + 2 * rw
    # coarse-plane row of each local block row
    cr = (
        jax.lax.broadcasted_iota(jnp.int32, (text2, wp2), 0)
        + i * (tile_h // 2)
        - rw2
    )
    up = pltpu.roll(uh, 1, 0)
    dn = pltpu.roll(uh, text2 - 1, 0)
    rows_a = 0.75 * uh + 0.25 * jnp.where(cr <= 0, uh, up)
    rows_b = 0.75 * uh + 0.25 * jnp.where(cr >= h2 - 1, uh, dn)
    inter = updown.interleave_rows(rows_a, rows_b)
    off = 2 * (rw2 - rw // 2)
    band = inter[off : off + text, :]

    cc = (
        jax.lax.broadcasted_iota(jnp.int32, (text, wp2), 1) - halo_x2
    )
    left = pltpu.roll(band, 1, 1)
    right = pltpu.roll(band, wp2 - 1, 1)
    lanes_a = 0.75 * band + 0.25 * jnp.where(cc <= 0, band, left)
    lanes_b = 0.75 * band + 0.25 * jnp.where(cc >= w2 - 1, band, right)
    return updown.interleave_lanes(lanes_a, lanes_b, in_kernel=True) * 2.0


def _kernel(
    row0_ref,
    prev_ref,
    nxt_ref,
    u_ref,
    v_ref,
    uo_ref,
    vo_ref,
    *,
    tile_h: int,
    rw: int,
    halo_p: int,
    halo_n: int,
    halo_x: int,
    img_h: int,
    img_w: int,
    band_h: int,
    r: int,
    d_max: int,
    d_local: int,
    c_max: int,
    sobel_scale: float,
    temporal_mask: np.ndarray,
    det_eps: float,
    centered: bool,
    window_weights: str = "box",
    half: bool = False,
    rw2: int = 0,
    halo_x2: int = 0,
    h2: int = 0,
    w2: int = 0,
):
    # prev tile: (tile_h + 2*halo_p, wp); next tile: (tile_h + 2*halo_n, wp);
    # flow tiles: (tile_h + 2*rw, wp) — the warped band needs rw extra rows
    # for the gradient + window stencils.  With ``half`` the flow tiles are
    # the COARSER level's flow at half resolution and the 2x bilinear
    # upsample (+2x scale) runs in-kernel, eliminating the separate XLA
    # upsample pass and 3/4 of the flow-input HBM traffic.
    prev = prev_ref[0]
    nxt = nxt_ref[0]
    i = pl.program_id(1)
    if half:
        u_in = _expand_flow2x(
            u_ref[0], i, tile_h, rw, rw2, halo_x2, h2, w2
        )
        v_in = _expand_flow2x(
            v_ref[0], i, tile_h, rw, rw2, halo_x2, h2, w2
        )
    else:
        u_in = u_ref[0]
        v_in = v_ref[0]
    text, wp = u_in.shape  # text = tile_h + 2*rw
    # Absolute GLOBAL image coordinates of the extended band's rows/cols.
    # row0_ref holds the global row index of input row 0 (zero for the
    # whole-image entry; the band entry passes the shard's offset so border
    # clamping and outside-image masking act on the global image).
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (text, wp), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (text, wp), 1)
    lrow = row_ids + i * tile_h - rw  # band-LOCAL row; pad rows fall outside
    img_row = lrow + row0_ref[0]
    img_col = col_ids - halo_x

    # --- Budget + border clamping, recentering mask, valid mask (the
    # shared pre-warp invariant — select_core.global_clamp).
    u_b, v_b, u_c, v_c, inside, valid = select_core.global_clamp(
        u_in, v_in, img_row, img_col, img_h, img_w, d_max
    )
    # On a BAND a tile can straddle kept rows and the band's own zero-flow
    # jnp.pad rows whose GLOBAL rows are inside the image (interior shards)
    # — `inside` alone keeps those in the recentering mean and the bias
    # truncates large flows through the d_local clamp (measured 0.8 px
    # kept-row divergence at |v| = 32).  For the whole-image entry
    # band_h == img_h and `real` reduces to `inside`.
    real = inside & (lrow >= 0) & (lrow < band_h)

    # --- Warp: next sampled at x + flow over the extended band.  The
    # recentering mean runs over real band pixels only (`real`) — zeroed
    # pad/outside-image flow would bias it toward zero and the d_local
    # clamp would truncate large uniform flows.
    warped, au, av = select_core.warp_core(
        nxt,
        u_c,
        v_c,
        row0=halo_n - rw,
        d_local=d_local,
        c_max=c_max,
        mask=real,
    )
    # Out-of-bounds samples keep the unwarped pixel; outside the image the
    # warped band must read as ZERO so the temporal stencil keeps the XLA
    # path's zero-padding semantics (the gather leaves arbitrary content in
    # the padding rows otherwise).
    nxt_center = nxt[halo_n - rw : halo_n - rw + text, :]
    zero = jnp.zeros((text, wp), jnp.float32)
    warped = jnp.where(valid, warped, nxt_center)
    warped = jnp.where(inside, warped, zero)

    # --- Gradients on the extended band, masked to the image (zero-pad
    # window semantics, see lk_fused.py).
    prev_band = prev[halo_p - rw : halo_p - rw + text, :]
    sx = MASKS["sobel_x"] * sobel_scale
    sy = MASKS["sobel_y"] * sobel_scale
    ix = jnp.where(inside, _stencil3(prev_band, sx), zero)
    iy = jnp.where(inside, _stencil3(prev_band, sy), zero)
    it = jnp.where(inside, _stencil3(warped - prev_band, temporal_mask), zero)

    def win(prod):
        rows = _win_sum(prod, r, 0, window_weights)[rw : rw + tile_h, :]
        return _win_sum(rows, r, 1, window_weights)

    sum_ix2 = win(ix * ix)
    sum_iy2 = win(iy * iy)
    sum_ixiy = win(ix * iy)
    sum_ixit = win(ix * it)
    sum_iyit = win(iy * it)

    if centered:
        # DIS-style mean normalization (see lk_fused._center_sums): the
        # window count uses `inside` (in-GLOBAL-image pixels) — matching the
        # XLA twin, whose gradients are zero only outside the image.
        sum_ix2, sum_iy2, sum_ixiy, sum_ixit, sum_iyit = _center_sums(
            win, inside, ix, iy, it,
            sum_ix2, sum_iy2, sum_ixiy, sum_ixit, sum_iyit,
        )

    res_u, res_v = _solve2x2(
        sum_ix2, sum_iy2, sum_ixiy, sum_ixit, sum_iyit, det_eps
    )

    # Accumulate on the budget-clamped flow (matching the XLA path, which
    # clips to max_displacement before warping): the border clamp and the
    # rare local-range clamp inside the warp are sampling details, not flow
    # truncations — feeding them back would zero out estimates at the image
    # border where out-of-bounds motion is simply unobservable.
    del au, av
    uo_ref[:, :] = u_b[rw : rw + tile_h, :] + res_u
    vo_ref[:, :] = v_b[rw : rw + tile_h, :] + res_v


@functools.partial(
    jax.jit, static_argnames=("config", "interpret", "centered", "flow_half")
)
def lk_level_step(
    prev: jax.Array,
    nxt: jax.Array,
    flow: jax.Array,
    config: LKConfig,
    interpret: bool = False,
    centered: bool = False,
    flow_half: bool = False,
) -> jax.Array:
    """One warp + solve + update iteration of an LK level, fully fused.

    Args: prev/nxt (..., H, W) float32, flow (..., H, W, 2).
    ``centered=True`` mean-normalizes the window sums in-kernel (the
    DIS-style data term, models/dis.py).
    With ``flow_half`` the flow argument is the COARSER level's flow at
    (H/2, W/2) and the 2x bilinear upsample (ops/resize.upsample_flow's
    exact semantics, including the 2x value scaling) runs inside the
    kernel — callers must gate on :func:`supported_half`.
    Returns the updated flow (..., H, W, 2).
    """
    h = prev.shape[-2]
    return _step_impl(
        prev, nxt, flow, jnp.zeros((1,), jnp.int32), h, config, interpret,
        centered=centered, flow_half=flow_half,
    )


@functools.partial(
    jax.jit,
    static_argnames=("config", "h_global", "interpret", "vma", "centered"),
)
def lk_band_step(
    prev: jax.Array,
    nxt: jax.Array,
    flow: jax.Array,
    row0,
    config: LKConfig,
    h_global: int,
    interpret: bool = False,
    vma: tuple[str, ...] = (),
    centered: bool = False,
) -> jax.Array:
    """Fused LK iteration on a row BAND of a larger (h_global-row) image.

    The spatial-TP entry (parallel/spatial.py): ``prev``/``nxt``/``flow``
    are one shard's halo-extended band, ``row0`` the (traced) global row
    index of band row 0.  Gradient masking, warp border clamping and the
    outside-image zeroing all act on the GLOBAL image coordinates, so kept
    rows (those at least ``r_img`` rows from the band edge, where the
    caller's halo supplies real neighbor data) match the unsharded kernel
    float-for-float; band-edge rows are garbage and must be cropped by the
    caller.

    Args: prev/nxt (HB, W) float32, flow (HB, W, 2), row0 int32 scalar.
    ``vma`` names the shard_map mesh axes the band varies over (required by
    shard_map's varying-mesh-axes check for the kernel's output avals).
    Returns the updated flow (HB, W, 2).
    """
    row0_arr = jnp.reshape(jnp.asarray(row0, jnp.int32), (1,))
    return _step_impl(
        prev, nxt, flow, row0_arr, h_global, config, interpret, vma,
        centered=centered,
    )


def _step_impl(
    prev: jax.Array,
    nxt: jax.Array,
    flow: jax.Array,
    row0_arr: jax.Array,
    h_global: int,
    config: LKConfig,
    interpret: bool,
    vma: tuple[str, ...] = (),
    centered: bool = False,
    flow_half: bool = False,
) -> jax.Array:
    lead = prev.shape[:-2]
    h, w = prev.shape[-2:]
    p = prev.reshape((-1, h, w)).astype(jnp.float32)
    n = nxt.reshape((-1, h, w)).astype(jnp.float32)
    fh, fw = (h // 2, w // 2) if flow_half else (h, w)
    f = flow.reshape((-1, fh, fw, 2)).astype(jnp.float32)
    b = p.shape[0]

    r = config.window // 2
    # Band margin: needs r+1 rows for the gradient+window stencils, rounded
    # so the Element block height (tile_h + 2*rw) stays divisible by 8
    # (Mosaic requires sublane-divisible block shapes).
    rw = _round_up(r + 1, 4)
    d = int(config.max_displacement)
    d_local = config.d_local
    # c_max=1 (default) keeps the VMEM working set down; the row-choice
    # correction condition (|d(vi)| <= c_max across floor(u) columns) holds
    # for the smooth upsampled fields the pyramid feeds this kernel.
    c_max = config.c_max

    # prev reads span exactly [halo_p - rw, halo_p + rw + tile_h) (the
    # prev_band slice); rw rows of halo suffice — the gradient/window margins
    # are already inside rw = r + 1 rounded up.
    halo_p = _round_up(rw, _SUBLANE)
    halo_n = _round_up(select_core.halo_y(d, d_local, c_max) + rw, _SUBLANE)
    halo_x = max(select_core.halo_x(d, d_local), rw + 1)
    if flow_half:
        # expanded lane 2j must map to img col 2(j - halo_x/2) = L - halo_x
        halo_x += halo_x % 2
    wp = _round_up(w + 2 * halo_x, _LANE)
    if flow_half and (h % 2 or w % 2 or wp & (wp - 1)):
        raise ValueError(
            f"flow_half needs even dims and a power-of-two padded width "
            f"(h={h}, w={w}, wp={wp}) — gate on supported_half()"
        )

    # VMEM: with the scratch-based core the peak live set is ~3*ncands
    # accumulators plus ~12 temporaries/index maps on the extended band,
    # plus the prev/next tiles and the sums (headroom in the budget).
    ncands = 2 * c_max + 2
    arrays = 20 + 5 * ncands  # measured ~37 live band arrays at ncands=4
    # v5e has far more physical VMEM than Mosaic's 16 MB default scoped
    # limit; raise the kernel's cap and budget accordingly (bigger bands =
    # less halo DMA amplification; 40 MB measured best: 22->479 fps vs 448,
    # 60 MB over-sizes bands and drops to 421).  Mosaic stack allocation varies
    # slightly between compiles of the same kernel, so leave ~30% headroom.
    budget = 40 * 1024 * 1024 // 4
    th_max = (budget // wp - 2 * (halo_n + rw)) // arrays
    # half mode tiles in 16-row units so the half-res flow block height
    # (tile_h/2 + 2*rw2) stays sublane-divisible
    th_align = 2 * _SUBLANE if flow_half else _SUBLANE
    tile_h = max(
        th_align,
        min(_round_up(h, th_align), (th_max // th_align) * th_align),
    )
    ht = pl.cdiv(h, tile_h)

    hp_p = ht * tile_h + 2 * halo_p
    hp_n = ht * tile_h + 2 * halo_n
    hp_f = ht * tile_h + 2 * rw

    pp = jnp.pad(p, ((0, 0), (halo_p, hp_p - h - halo_p), (halo_x, wp - w - halo_x)))
    np_ = jnp.pad(n, ((0, 0), (halo_n, hp_n - h - halo_n), (halo_x, wp - w - halo_x)))
    if flow_half:
        rw2 = _round_up(rw // 2 + 1, 4)
        halo_x2, wp2 = halo_x // 2, wp // 2
        hp_f2 = ht * (tile_h // 2) + 2 * rw2
        pad_f = ((0, 0), (rw2, hp_f2 - fh - rw2), (halo_x2, wp2 - fw - halo_x2))
    else:
        rw2 = halo_x2 = 0
        pad_f = ((0, 0), (rw, hp_f - h - rw), (halo_x, wp - w - halo_x))
    uf = jnp.pad(f[..., 0], pad_f)
    vf = jnp.pad(f[..., 1], pad_f)

    tmask = MASKS[config.temporal_kernel]
    if config.normalize_gradients:
        tmask = tmask / tmask.sum()
        sobel_scale = 1.0 / SOBEL_GAIN
    else:
        sobel_scale = 1.0

    kernel = functools.partial(
        _kernel,
        tile_h=tile_h,
        rw=rw,
        halo_p=halo_p,
        halo_n=halo_n,
        halo_x=halo_x,
        img_h=h_global,
        img_w=w,
        band_h=h,
        r=r,
        d_max=d,
        d_local=d_local,
        c_max=c_max,
        sobel_scale=sobel_scale,
        temporal_mask=tmask,
        det_eps=config.det_eps,
        centered=centered,
        window_weights=getattr(config, "window_weights", "box"),
        half=flow_half,
        rw2=rw2,
        halo_x2=halo_x2,
        h2=fh,
        w2=fw,
    )

    def espec(gy):
        return pl.BlockSpec(
            (pl.Element(1), pl.Element(tile_h + 2 * gy), pl.Element(wp)),
            lambda bb, i: (bb, i * tile_h, 0),
            memory_space=pltpu.VMEM,
        )

    if flow_half:
        fspec = pl.BlockSpec(
            (
                pl.Element(1),
                pl.Element(tile_h // 2 + 2 * rw2),
                pl.Element(wp // 2),
            ),
            lambda bb, i: (bb, i * (tile_h // 2), 0),
            memory_space=pltpu.VMEM,
        )
    else:
        fspec = espec(rw)

    out_spec = pl.BlockSpec(
        (None, tile_h, wp), lambda bb, i: (bb, i, 0), memory_space=pltpu.VMEM
    )
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    uo, vo = pl.pallas_call(
        kernel,
        grid=(b, ht),
        in_specs=[smem_spec, espec(halo_p), espec(halo_n), fspec, fspec],
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct(
                (b, ht * tile_h, wp), jnp.float32, vma=frozenset(vma)
            ),
            jax.ShapeDtypeStruct(
                (b, ht * tile_h, wp), jnp.float32, vma=frozenset(vma)
            ),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(row0_arr, pp, np_, uf, vf)
    out = jnp.stack(
        [uo[:, :h, halo_x : halo_x + w], vo[:, :h, halo_x : halo_x + w]], axis=-1
    )
    return out.reshape(lead + (h, w, 2))
