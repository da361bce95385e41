"""Shared in-kernel select-gather warp core.

Used by warp_select.py (standalone warp) and lk_step_fused.py (fused
warp + LK level).  See warp_select.py's module docstring for the corrected
two-pass select-gather scheme; this core adds two throughput refinements
measured on v5e (tests/microbench in round logs):

* **Per-tile recentering**: dynamic rolls absorb a per-tile integer offset
  (u0, v0) = round(mean flow), so the select-loops only cover the *local*
  displacement range ``d_local`` (default 15) instead of the global budget —
  iteration count, the dominant cost, drops proportionally.  Correctness
  requires the within-tile flow range to fit in +-d_local after recentering;
  beyond that the local residual clamps (the caller receives the APPLIED
  flow, so accumulation stays consistent).
* **Chunked dynamic rolls**: dynamic-shift lane rolls cost ~6x a static
  roll, so the horizontal pass rolls each array dynamically once per
  8-iteration chunk and steps with static 1-rolls in between.

All rolls wrap; callers must provide margins (see the halo helpers) so no
window read ever touches a wrapped row/column.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from cuda_optical_flow_2_tpu.kernels.lk_fused import _roll

__all__ = ["warp_core", "halo_y", "halo_x", "DEFAULT_D_LOCAL"]

DEFAULT_D_LOCAL = 15
_CHUNK = 8


def halo_y(d_max: int, d_local: int, c_max: int) -> int:
    """Rows of margin the img tile needs above/below the warped band.

    Includes the chunk-rounding overshoot of the vertical pass.
    """
    return d_max + d_local + c_max + 2 + _CHUNK


def halo_x(d_max: int, d_local: int) -> int:
    """Columns of margin the img tile needs left/right of the image.

    Includes the chunk-rounding overshoot of the horizontal pass.
    """
    return d_max + d_local + _CHUNK



def _roll_dyn(x: jax.Array, d: jax.Array, axis: int) -> jax.Array:
    # int32 cast: Mosaic's tpu.dynamic_rotate requires an i32 shift, and
    # under jax_enable_x64 the mod can promote to i64.
    return pltpu.roll(x, jnp.mod(-d, x.shape[axis]).astype(jnp.int32), axis)


def global_clamp(
    u_in: jax.Array,
    v_in: jax.Array,
    img_row: jax.Array,
    img_col: jax.Array,
    img_h: int,
    img_w: int,
    d_max: float,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Budget + border clamping of band flow in GLOBAL image coordinates.

    The shared pre-warp invariant of every fused band kernel — centralized
    because each hand-rolled copy has independently reintroduced the same
    recentering-bias bug class (padding rows, fused-FB warp, out-of-global
    band rows):

    * ``inside`` marks cells whose global (row, col) lies in the image; it
      is the ``mask`` warp_core's recentering mean must be given.
    * Outside the image the border-clamp formula produces huge pseudo-flow
      (it pulls padding cells to the image edge), so the clamped flow is
      ZEROED there.
    * ``valid`` is the out-of-bounds test on the BUDGET-clamped components,
      matching the XLA twin, which clips to ``max_displacement`` before its
      warp.

    Args: ``u_in, v_in`` raw flow; ``img_row, img_col`` int32 global
    coordinates of each cell; ``img_h, img_w`` global image shape; ``d_max``
    the displacement budget.  Returns
    ``(u_b, v_b, u_c, v_c, inside, valid)``: budget-clamped flow, fully
    clamped+zeroed flow for warp_core, the real-pixel mask, and the
    keep-unwarped-pixel mask.
    """
    inside = (
        (img_row >= 0)
        & (img_row < img_h)
        & (img_col >= 0)
        & (img_col < img_w)
    )
    xf = img_col.astype(jnp.float32)
    yf = img_row.astype(jnp.float32)
    u_b = jnp.clip(u_in, -d_max, d_max)
    v_b = jnp.clip(v_in, -d_max, d_max)
    zero = jnp.zeros(u_in.shape, jnp.float32)
    u_c = jnp.where(inside, jnp.clip(xf + u_b, 0.0, img_w - 1) - xf, zero)
    v_c = jnp.where(inside, jnp.clip(yf + v_b, 0.0, img_h - 1) - yf, zero)
    valid = (
        (xf + u_b >= 0)
        & (xf + u_b <= img_w - 1)
        & (yf + v_b >= 0)
        & (yf + v_b <= img_h - 1)
    )
    return u_b, v_b, u_c, v_c, inside, valid


def warp_core(
    img: jax.Array,
    u: jax.Array,
    v: jax.Array,
    *,
    row0: int,
    d_local: int = DEFAULT_D_LOCAL,
    c_max: int = 2,
    compute_dtype=jnp.float32,
    mask: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Bilinear warp of ``img`` by (u, v) with per-tile recentering.

    Args:
      img: (Gi, WP) source tile; output row t samples around img row
        t + row0 (+ v).
      u, v: (To, WP) flow, already budget- and border-clamped by the caller.
      row0: img-row offset of output row 0.
      d_local: local displacement range after recentering.
      c_max: row-choice correction range (see warp_select.py).
      compute_dtype: dtype of the select-pass accumulators.  The passes only
        MOVE image values (each pixel is selected, never summed), so bfloat16
        would be bit-lossless for integer-valued (uint8-derived) frames and
        halve the pass footprint — but the current Mosaic rejects rotates on
        non-32-bit data ("Rotate with non-32-bit data", tpu.dynamic_rotate),
        so only float32 compiles on TPU today; the parameter is kept for when
        that lands.  The bilinear blend always runs float32.
      mask: (To, WP) bool marking REAL flow entries.  The recentering mean
        must ignore the zero-flow lane/halo padding and partial-tile rows —
        averaging them in biases (u0, v0) toward zero, and the +-d_local
        clamp then silently truncates large uniform flows that are squarely
        inside the documented exactness condition (e.g. a uniform 28 px flow
        on a tile whose real columns are half of WP applies as ~21 px).

    Returns (warped, applied_u, applied_v), each (To, WP): the warped tile
    and the flow actually applied (recentered + locally clamped) — callers
    accumulating flow must use the applied values.
    """
    to, wp = u.shape
    ncands = 2 * c_max + 2
    img = img.astype(compute_dtype)

    # Per-tile integer recentering (mean over REAL, FINITE pixels only).
    # A single NaN flow value (legal under the det_eps=0.0 reference-parity
    # configs, where a flat region's 0/0 solve passes NaN through) would
    # otherwise make the mean NaN and int32(round(NaN)) corrupt the ENTIRE
    # tile's warp — the XLA gather twin localizes it to the offending pixel
    # (its valid test fails, keeping the unwarped value), so must we: the
    # non-finite entries are zeroed for the select passes and their outputs
    # are already overridden by the caller's valid mask.
    finite = jnp.isfinite(u) & jnp.isfinite(v)
    fz = jnp.zeros((), jnp.float32)
    u = jnp.where(finite, u, fz)
    v = jnp.where(finite, v, fz)
    m = finite if mask is None else (mask & finite)
    cnt = jnp.maximum(jnp.sum(m.astype(jnp.float32)), 1.0)
    u_mean = jnp.sum(jnp.where(m, u, fz)) / cnt
    v_mean = jnp.sum(jnp.where(m, v, fz)) / cnt
    u0 = jnp.round(u_mean).astype(jnp.int32)
    v0 = jnp.round(v_mean).astype(jnp.int32)
    ul = jnp.clip(u - u0.astype(jnp.float32), -d_local, d_local)
    vl = jnp.clip(v - v0.astype(jnp.float32), -d_local, d_local)
    applied_u = u0.astype(jnp.float32) + ul
    applied_v = v0.astype(jnp.float32) + vl

    vi_f = jnp.floor(vl)
    ui_f = jnp.floor(ul)
    ty = vl - vi_f
    tx = ul - ui_f
    vi = vi_f.astype(jnp.int32)
    ui = ui_f.astype(jnp.int32)

    # Accumulators live in explicit VMEM scratch and are mutated in place:
    # fori_loop carries are double-buffered by the Mosaic stack allocator,
    # which blows the VMEM budget at ~20 band-sized arrays (observed
    # compile-time OOMs); scratch refs are single-buffered.
    def scoped(acc_ref, g0_ref, g1_ref, vig_ref):
        zero = jnp.zeros((to, wp), compute_dtype)

        # --- Pass 1 (vertical): A_c(t, x) = img(t + row0 + v0 + vi + c, x).
        # Chunked like pass 2: one dynamic sublane roll per 8 iterations and
        # static 1-rolls in between (a dynamic sublane roll costs ~60x a
        # static one, docs/PERF.md).  Iterations j and j+1 share all but one
        # candidate roll, so a sliding window of ncands rolled copies needs
        # exactly one new static roll per iteration.  Chunk-tail iterations
        # with d > d_local select nothing (vi is clipped) and only cost the
        # wasted adds; their rolls are covered by halo_y's _CHUNK overshoot.
        for ci in range(ncands):
            acc_ref[ci] = zero

        n_iter_v = 2 * d_local + 1
        n_chunks_v = -(-n_iter_v // _CHUNK)

        def body_v(q, _):
            d_base = q * _CHUNK - d_local
            cands = [_roll_dyn(img, v0 + d_base - c_max + row0, 0)]
            for _ in range(ncands - 1):
                cands.append(_roll(cands[-1], 1, 0))
            for j in range(_CHUNK):
                sel = vi == (d_base + j)
                for ci in range(ncands):
                    acc_ref[ci] = acc_ref[ci] + jnp.where(
                        sel, cands[ci][:to, :], jnp.zeros((), compute_dtype)
                    )
                if j + 1 < _CHUNK:
                    cands = cands[1:] + [_roll(cands[-1], 1, 0)]
            return 0

        jax.lax.fori_loop(0, n_chunks_v, body_v, 0)

        # --- Pass 2 (horizontal): gather A_c and vi at x + u0 + ui, for
        # both x-corners, chunked so each array takes one dynamic roll per
        # chunk and static 1-rolls in between.
        for ci in range(ncands):
            g0_ref[ci] = zero
            g1_ref[ci] = zero
        vig_ref[0] = jnp.zeros((to, wp), jnp.int32)
        vig_ref[1] = jnp.zeros((to, wp), jnp.int32)

        n_iter = 2 * d_local + 2
        n_chunks = -(-n_iter // _CHUNK)

        def body_h(q, _):
            d_base = q * _CHUNK - d_local
            rolled = [_roll_dyn(acc_ref[ci], u0 + d_base, 1) for ci in range(ncands)]
            vi_rolled = _roll_dyn(vi, u0 + d_base, 1)
            for j in range(_CHUNK):
                d = d_base + j
                sel0 = ui == d
                sel1 = ui == (d - 1)
                zc = jnp.zeros((), compute_dtype)
                for ci in range(ncands):
                    g0_ref[ci] = g0_ref[ci] + jnp.where(sel0, rolled[ci], zc)
                    g1_ref[ci] = g1_ref[ci] + jnp.where(sel1, rolled[ci], zc)
                vig_ref[0] = vig_ref[0] + jnp.where(sel0, vi_rolled, 0)
                vig_ref[1] = vig_ref[1] + jnp.where(sel1, vi_rolled, 0)
                if j + 1 < _CHUNK:
                    rolled = [_roll(a, 1, 1) for a in rolled]
                    vi_rolled = _roll(vi_rolled, 1, 1)
            return 0

        jax.lax.fori_loop(0, n_chunks, body_h, 0)

        # --- Correction select per x-corner, then the bilinear blend (f32).
        corners = []
        zc = jnp.zeros((), compute_dtype)
        for gref, vigi in ((g0_ref, 0), (g1_ref, 1)):
            cstar = jnp.clip(vi - vig_ref[vigi], -c_max, c_max)
            v0c = zero
            v1c = zero
            for ci, c in enumerate(range(-c_max, c_max + 1)):
                sel = cstar == c
                v0c = v0c + jnp.where(sel, gref[ci], zc)
                v1c = v1c + jnp.where(sel, gref[ci + 1], zc)
            corners.append((v0c.astype(jnp.float32), v1c.astype(jnp.float32)))
        (v00, v10), (v01, v11) = corners
        top = v00 + tx * (v01 - v00)
        bot = v10 + tx * (v11 - v10)
        return top + ty * (bot - top)

    import jax.experimental.pallas as pl  # local: core is kernel-side only

    warped = pl.run_scoped(
        scoped,
        acc_ref=pltpu.VMEM((ncands, to, wp), compute_dtype),
        g0_ref=pltpu.VMEM((ncands, to, wp), compute_dtype),
        g1_ref=pltpu.VMEM((ncands, to, wp), compute_dtype),
        vig_ref=pltpu.VMEM((2, to, wp), jnp.int32),
    )
    return warped, applied_u, applied_v
