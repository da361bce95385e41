"""Time-tiled Pallas kernel for the Horn-Schunck Jacobi relaxation.

The XLA formulation (models/horn_schunck._avg3x3 under ``lax.scan``) makes one
full HBM round trip per sweep: every iteration reads u, v, Ix, Iy, It and the
denominator and writes u, v — ~8 image-sized arrays of traffic for ~30 vector
ops of work.  At 150 sweeps x 1080p that is pure bandwidth.

This kernel time-tiles the relaxation: each grid step loads one row band (plus
a K-row halo) into VMEM and runs K Jacobi sweeps in place before writing back,
amortizing the HBM traffic K-fold.  Correctness follows the standard trapezoid
argument for time-tiled stencils:

* A Jacobi sweep propagates information exactly one row/column per iteration
  (3x3 neighbor average).
* Rows near the band edge go stale by one row per sweep — after sweep j, the
  outermost j rows of the band are wrong (they miss their out-of-band
  neighbors; roll wraparound contaminates the same ring).  With a row halo of
  ``halo_y >= K`` the output band (rows [halo_y, halo_y + tile_h)) is
  untouched after K sweeps.
* Columns need no halo beyond the zero pad: the full image width is resident,
  and the in-kernel ``inside`` mask re-zeroes the pad ring after every sweep,
  which simultaneously (a) enforces the zero-padded boundary condition of the
  XLA twin's ``_avg3x3`` and (b) stops lane-roll wraparound from ever
  propagating inward.

Gradients (Ix, Iy, It — same Sobel/temporal stencils as ops/gradients, which
replace the reference's separate conv launches, OptFlowGpu.cu:1929-1940) and
the reciprocal denominator are computed once per kernel invocation from the
resident frames; recomputing them per band is noise next to K sweeps.

The neighbor average uses the separable decomposition
``avg = ([1,2,1] (x) [1,2,1] - 4*center) / 12`` — 2 lane + 2 sublane rolls and
7 adds/muls per component instead of 8 independent 2-D shifts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuda_optical_flow_2_tpu.constants import MASKS
from cuda_optical_flow_2_tpu.kernels.lk_fused import (
    _roll,
    _round_up,
    _stencil3,
    interpret_forced,
    mosaic_ok,
)
from cuda_optical_flow_2_tpu.ops.gradients import SOBEL_GAIN

__all__ = ["supported", "hs_relax", "hs_relax_band", "MAX_SWEEPS"]

_LANE = 128
_SUBLANE = 8
# Sweeps fused per kernel invocation (= row halo). 16 amortizes HBM traffic
# ~13x at a 25% redundant-compute cost with tile_h=128; the sweep loop is
# VPU-bound, so larger K buys little.
_MAX_SWEEPS = 16
MAX_SWEEPS = _MAX_SWEEPS


def supported(prev: jax.Array) -> bool:
    """Whether the time-tiled Pallas relaxation handles this shape/backend."""
    h, w = prev.shape[-2:]
    if h < _SUBLANE or w < _SUBLANE:
        return False
    return mosaic_ok()


def _sep121(x: jax.Array) -> jax.Array:
    """[1,2,1] (x) [1,2,1] correlation via separable static rolls."""
    r = _roll(x, -1, 1) + 2.0 * x + _roll(x, 1, 1)
    return _roll(r, -1, 0) + 2.0 * r + _roll(r, 1, 0)


def _hs_kernel(
    row0_ref,
    p_ref,
    n_ref,
    *refs,
    tile_h: int,
    halo_y: int,
    halo_x: int,
    img_h: int,
    img_w: int,
    k: int,
    alpha2: float,
    temporal_mask,
    with_offset: bool = False,
    robust: tuple[float, float] | None = None,
):
    if with_offset:
        off_ref, u_ref, v_ref, uo_ref, vo_ref = refs
    else:
        u_ref, v_ref, uo_ref, vo_ref = refs
    p = p_ref[0]
    n = n_ref[0]
    u = u_ref[0]
    v = v_ref[0]
    g, wp = p.shape

    ix = _stencil3(p, MASKS["sobel_x"] * (1.0 / SOBEL_GAIN))
    iy = _stencil3(p, MASKS["sobel_y"] * (1.0 / SOBEL_GAIN))
    it = _stencil3(n - p, temporal_mask)
    if with_offset:
        # Linearization offset (models/dis._refine): relaxing the TOTAL flow
        # w around a warp at w0 needs the data residual
        # ix*u + iy*v + (it_warped - ix*u0 - iy*v0); the caller passes the
        # -(ix*u0 + iy*v0) plane here.
        it = it + off_ref[0]

    i = pl.program_id(1)
    row_ids = lax.broadcasted_iota(jnp.int32, (g, wp), 0)
    col_ids = lax.broadcasted_iota(jnp.int32, (g, wp), 1)
    # GLOBAL image row of each band cell: row0_ref holds the global row of
    # input row 0 (zero for the whole-image entry; the spatial-TP band entry
    # passes the shard offset so the zero-pad boundary acts on the global
    # image, not the band).
    img_row = row_ids + i * tile_h - halo_y + row0_ref[0]
    inside = (
        (img_row >= 0)
        & (img_row < img_h)
        & (col_ids >= halo_x)
        & (col_ids < halo_x + img_w)
    )
    zero = jnp.zeros((g, wp), jnp.float32)
    twelfth = jnp.float32(1.0 / 12.0)
    third = jnp.float32(1.0 / 3.0)

    def avg(x):
        # HS neighbor average (cross 1/6, diagonals 1/12, center 0) ==
        # (sep121 - 4*center)/12; identical weights to the XLA twin.
        return _sep121(x) * twelfth - x * third

    if robust is None:
        inv_denom = 1.0 / (jnp.float32(alpha2) + ix * ix + iy * iy)
        for _ in range(k):
            u_bar = avg(u)
            v_bar = avg(v)
            rate = (ix * u_bar + iy * v_bar + it) * inv_denom
            # Re-zeroing outside the image enforces the zero-pad boundary
            # and kills wraparound contamination in the pad ring (module
            # docstring).
            u = jnp.where(inside, u_bar - ix * rate, zero)
            v = jnp.where(inside, v_bar - iy * rate, zero)
    else:
        # Lagged-diffusivity Charbonnier (models/dis robust refinement):
        # per-pixel data weight wd = ed/sqrt(r^2+ed^2) and smoothness
        # weight ws = es/sqrt(|grad u|^2+|grad v|^2+es^2), both normalized
        # to (0, 1] so es,ed -> inf recovers the quadratic path in the
        # interior.  (At the image border the S normalization with ws=0
        # outside is a Neumann-style boundary — missing neighbors drop out
        # of the average — instead of the quadratic path's zero-pad
        # Dirichlet drag; a deliberate, documented deviation.)
        # The weights are FROZEN for this chunk's k sweeps (recomputed from
        # the incoming flow at every chunk = the classic lagged/IRLS outer
        # iteration); the inner Jacobi update solves the per-pixel 2x2
        # system  alpha^2 (S w - [U;V]) + wd g (g.w + it) = 0  in closed
        # form (Sherman-Morrison), with edge weights ws_ij=(ws_i+ws_j)/2:
        #   U = (ws*avg(u) + avg(ws*u))/2,  S = (ws + avg(ws))/2.
        ed, es = robust
        r = ix * u + iy * v + it
        wd = jnp.float32(ed) * lax.rsqrt(r * r + jnp.float32(ed * ed))
        half = jnp.float32(0.5)
        du = (_roll(u, -1, 1) - _roll(u, 1, 1)) * half
        dv = (_roll(v, -1, 1) - _roll(v, 1, 1)) * half
        su = (_roll(u, -1, 0) - _roll(u, 1, 0)) * half
        sv = (_roll(v, -1, 0) - _roll(v, 1, 0)) * half
        g2 = du * du + dv * dv + su * su + sv * sv
        ws = jnp.float32(es) * lax.rsqrt(g2 + jnp.float32(es * es))
        # Outside the image ws must read as 0 (the XLA twin's zero-shift
        # boundary); u,v pad zeros already make U's outside terms vanish,
        # but S sees neighbor ws directly.
        ws = jnp.where(inside, ws, zero)
        s_plane = (ws + avg(ws)) * half
        inv_s = 1.0 / jnp.maximum(s_plane, jnp.float32(1e-12))
        inv_denom = 1.0 / (
            jnp.float32(alpha2) * jnp.maximum(s_plane, jnp.float32(1e-12))
            + wd * (ix * ix + iy * iy)
        )
        for _ in range(k):
            u_bar = (ws * avg(u) + avg(ws * u)) * half * inv_s
            v_bar = (ws * avg(v) + avg(ws * v)) * half * inv_s
            rate = wd * (ix * u_bar + iy * v_bar + it) * inv_denom
            u = jnp.where(inside, u_bar - ix * rate, zero)
            v = jnp.where(inside, v_bar - iy * rate, zero)

    uo_ref[:] = u[halo_y : halo_y + tile_h]
    vo_ref[:] = v[halo_y : halo_y + tile_h]


def _pick_tile_h(wp: int, halo_y: int, h: int) -> int:
    """Largest row band whose ~12 live (G, WP) f32 tiles fit in ~20 MB VMEM."""
    budget = 20 * 1024 * 1024
    cap = max(8, ((h + 7) // 8) * 8)  # never exceed the image height
    for th in (256, 128, 64, 32, 16, 8):
        g = th + 2 * halo_y
        if 12 * g * wp * 4 <= budget:
            return min(th, cap)
    return 8


@functools.partial(
    jax.jit,
    static_argnames=(
        "iterations", "alpha", "temporal_kernel", "interpret", "robust"
    ),
)
def hs_relax(
    prev: jax.Array,
    nxt: jax.Array,
    flow_init: jax.Array | None,
    *,
    iterations: int,
    alpha: float,
    temporal_kernel: str,
    interpret: bool = False,
    it_offset: jax.Array | None = None,
    robust: tuple[float, float] | None = None,
) -> jax.Array:
    """``iterations`` Jacobi sweeps of Horn-Schunck on (..., H, W) frames.

    Drop-in replacement for the scan in models/horn_schunck.hs_level (same
    gradients, same neighbor average, same zero-pad boundary); returns
    (..., H, W, 2) float32.

    ``it_offset`` (optional, (..., H, W)) is added to the temporal gradient
    before relaxing — the linearization term for refining a TOTAL flow
    around a warp point (models/dis._refine passes -(ix*u0 + iy*v0), with
    ``flow_init`` the total flow and ``nxt`` the warped frame).

    ``robust`` (optional ``(eps_data, eps_smooth)``) switches the quadratic
    penalties to normalized Charbonnier with lagged diffusivity: per-pixel
    data/smoothness weights are recomputed from the current flow once per
    ``MAX_SWEEPS``-sweep chunk and frozen within it (the IRLS outer loop
    rides the existing time-tiling for free).  ``eps -> inf`` recovers the
    quadratic path.  See models/dis.DISConfig.refine_penalty.
    """
    h = prev.shape[-2]
    return _relax_impl(
        prev, nxt, flow_init, jnp.zeros((1,), jnp.int32), h,
        iterations=iterations, alpha=alpha, temporal_kernel=temporal_kernel,
        interpret=interpret, it_offset=it_offset, robust=robust,
    )


def hs_relax_band(
    prev: jax.Array,
    nxt: jax.Array,
    flow_init: jax.Array | None,
    row0,
    h_global: int,
    *,
    sweeps: int,
    alpha: float,
    temporal_kernel: str,
    interpret: bool = False,
    vma: tuple[str, ...] = (),
    it_offset: jax.Array | None = None,
    robust: tuple[float, float] | None = None,
) -> jax.Array:
    """ONE chunk of ``sweeps`` Jacobi sweeps on a row BAND of an
    ``h_global``-row image.

    The spatial-TP entry (parallel/spatial_models._local_hs_relax): inputs
    are one shard's halo-extended band, ``row0`` the (traced) global row of
    band row 0.  The zero-pad boundary acts on GLOBAL coordinates, so with
    a caller halo of ``sweeps + 2`` real rows (gradient ring 2 + one row of
    band-edge staleness per sweep) the kept interior matches the unsharded
    relaxation exactly; band-edge rows are garbage and must be cropped.
    ``sweeps`` must fit one kernel invocation (<= ``MAX_SWEEPS``) — chunking
    across exchanges is the caller's job, since each chunk needs fresh
    neighbor rows.  ``vma`` names the shard_map mesh axes the band varies
    over.  ``robust`` as in :func:`hs_relax`; the per-chunk weights are
    computed in-kernel from the incoming band, so the caller's
    ``sweeps + 2`` halo contract is unchanged (the weights' one-row
    gradient ring lands inside the same 2-row frame-gradient ring).
    """
    if sweeps > _MAX_SWEEPS:
        raise ValueError(
            f"hs_relax_band runs one chunk: sweeps={sweeps} > {_MAX_SWEEPS}"
        )
    row0_arr = jnp.reshape(jnp.asarray(row0, jnp.int32), (1,))
    return _relax_impl(
        prev, nxt, flow_init, row0_arr, h_global,
        iterations=sweeps, alpha=alpha, temporal_kernel=temporal_kernel,
        interpret=interpret, vma=vma, it_offset=it_offset, robust=robust,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "h_global", "iterations", "alpha", "temporal_kernel", "interpret",
        "vma", "robust",
    ),
)
def _relax_impl(
    prev: jax.Array,
    nxt: jax.Array,
    flow_init: jax.Array | None,
    row0_arr: jax.Array,
    h_global: int,
    *,
    iterations: int,
    alpha: float,
    temporal_kernel: str,
    interpret: bool,
    vma: tuple[str, ...] = (),
    it_offset: jax.Array | None = None,
    robust: tuple[float, float] | None = None,
) -> jax.Array:
    lead = prev.shape[:-2]
    h, w = prev.shape[-2:]
    if iterations <= 0:
        # zero sweeps: the relaxation is the identity on the initial flow
        # (divmod(0, k) below would divide by k = 0)
        if flow_init is not None:
            return jnp.asarray(flow_init, jnp.float32)
        return jnp.zeros(lead + (h, w, 2), jnp.float32)
    x = prev.reshape((-1, h, w)).astype(jnp.float32)
    y = nxt.reshape((-1, h, w)).astype(jnp.float32)
    b = x.shape[0]

    k = min(_MAX_SWEEPS, iterations)
    # Robust mode: the lagged weights at trapezoid distance k read chunk-
    # start flow one row further (their central-difference ring), so the
    # band halo is k+1 — at k=8/16 exactly, rounding k alone would let the
    # outermost row's wraparound-contaminated weight leak into the output.
    halo_y = _round_up(k + (1 if robust is not None else 0), _SUBLANE)
    halo_x = 1
    wp = _round_up(w + 2 * halo_x, _LANE)
    tile_h = _pick_tile_h(wp, halo_y, h)
    ht = pl.cdiv(h, tile_h)
    hp = ht * tile_h + 2 * halo_y

    pad = ((0, 0), (halo_y, hp - h - halo_y), (halo_x, wp - w - halo_x))
    xp = jnp.pad(x, pad)
    yp = jnp.pad(y, pad)
    offp = None
    if it_offset is not None:
        offp = jnp.pad(
            it_offset.reshape((-1, h, w)).astype(jnp.float32), pad
        )
    if flow_init is None:
        u = jnp.zeros((b, hp, wp), jnp.float32)
        v = u
    else:
        f = flow_init.reshape((-1, h, w, 2)).astype(jnp.float32)
        u = jnp.pad(f[..., 0], pad)
        v = jnp.pad(f[..., 1], pad)

    tmask = MASKS[temporal_kernel]
    tmask = tmask / tmask.sum()
    g = tile_h + 2 * halo_y
    in_spec = pl.BlockSpec(
        (pl.Element(1), pl.Element(g), pl.Element(wp)),
        lambda bb, i: (bb, i * tile_h, 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (None, tile_h, wp), lambda bb, i: (bb, i, 0), memory_space=pltpu.VMEM
    )
    row_repad = ((0, 0), (halo_y, halo_y), (0, 0))

    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    def sweep_block(u, v, sweeps: int):
        kernel = functools.partial(
            _hs_kernel,
            tile_h=tile_h,
            halo_y=halo_y,
            halo_x=halo_x,
            img_h=h_global,
            img_w=w,
            k=sweeps,
            alpha2=alpha * alpha,
            temporal_mask=tmask,
            with_offset=offp is not None,
            robust=robust,
        )
        shape = jax.ShapeDtypeStruct(
            (b, ht * tile_h, wp), jnp.float32, vma=frozenset(vma)
        )
        extra = [] if offp is None else [offp]
        uo, vo = pl.pallas_call(
            kernel,
            grid=(b, ht),
            in_specs=[smem_spec] + [in_spec] * (4 + len(extra)),
            out_specs=(out_spec, out_spec),
            out_shape=(shape, shape),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interpret,
        )(row0_arr, xp, yp, *extra, u, v)
        # The kernel zeroes everything outside the image, so re-padding the
        # halo rows with zeros reproduces the carried boundary exactly.
        return jnp.pad(uo, row_repad), jnp.pad(vo, row_repad)

    n_full, rem = divmod(iterations, k)
    if n_full:
        def body(carry, _):
            cu, cv = carry
            return sweep_block(cu, cv, k), None

        (u, v), _ = lax.scan(body, (u, v), None, length=n_full)
    if rem:
        u, v = sweep_block(u, v, rem)

    flow = jnp.stack(
        [u[:, halo_y : halo_y + h, halo_x : halo_x + w],
         v[:, halo_y : halo_y + h, halo_x : halo_x + w]],
        axis=-1,
    )
    return flow.reshape(lead + (h, w, 2))
