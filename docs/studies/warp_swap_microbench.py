"""Measure the select-pass SWAP and the primitive roll costs (round 4).

VERDICT r3 item 2: the round-3 perf plateau was declared on paper — the
pass-swap ("horizontal select first, so the expensive multi-candidate pass
rides sublane rolls instead of lane rolls") was dismissed as a wash without
measurement, and no roll-cost data existed to check the dismissal.

This study measures, at the production level-0 geometry:

1. PRIMITIVE COSTS: static sublane (axis-0) rolls, static lane (axis-1)
   rolls, dynamic rolls on both axes, and the where+add select — each
   isolated in its own kernel with a data dependency so nothing elides.
   These numbers decide whether ANY axis-swap scheme can win: the swap
   moves the multi-candidate gather from lane rolls to sublane rolls.

2. THE SWAPPED SCHEME, mirrored exactly: horizontal-first builds the
   column-gathered candidates B_c (+ the column-offset plane for the
   correction) on the row-extended band; vertical-second gathers the two
   row corners with the ui-correction select.  Same op count as the
   current scheme by construction — the measured difference isolates the
   axis costs + the extended-row factor.

Run (TPU): python docs/studies/warp_swap_microbench.py
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from cuda_optical_flow_2_tpu.utils.profiling import device_time

# production level-0 geometry (lk_step_fused at 1080p, d_local=7, c_max=1)
TO, WP = 136, 2048
D_LOCAL, C_MAX, CHUNK = 7, 1, 8
NCANDS = 2 * C_MAX + 2
# rows the vertical-second pass reaches, sublane-aligned (Mosaic rejects
# dynamic sublane rotates on non-multiple-of-8 row extents)
RV = -(-(D_LOCAL + C_MAX + 2 + CHUNK) // 8) * 8
GI = TO + 2 * 64                      # current img tile rows
GIH = TO + 2 * RV                     # swapped pass-1 row extent
N_TILES = 9


def _roll(x, d, axis):
    s = (-d) % x.shape[axis]
    return pltpu.roll(x, s, axis) if s else x


def _roll_dyn(x, d, axis):
    return pltpu.roll(x, jnp.mod(-d, x.shape[axis]).astype(jnp.int32), axis)


def mk(kernel_body, in_rows=(None, TO), out_rows=TO):
    rows0 = in_rows[0] or GI
    ins = [
        pl.BlockSpec((pl.Element(rows0), pl.Element(WP)), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((pl.Element(in_rows[1]), pl.Element(WP)), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        kernel_body,
        grid=(N_TILES,),
        in_specs=ins,
        out_specs=pl.BlockSpec((out_rows, WP), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((out_rows, WP), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )


# ---------------------------------------------------------------- primitives
N_PRIM = 64


def prim_static_roll(axis):
    def body(img_ref, x_ref, out_ref):
        x = x_ref[...]
        acc = jnp.zeros((TO, WP), jnp.float32)
        for i in range(N_PRIM):
            x = _roll(x, 1, axis)
            acc = acc + x          # data dependency; 1 add per roll
        out_ref[:, :] = acc + 0.0 * img_ref[0, 0]
    return body


def prim_add_only():
    def body(img_ref, x_ref, out_ref):
        x = x_ref[...]
        acc = jnp.zeros((TO, WP), jnp.float32)
        for i in range(N_PRIM):
            x = x * 1.0000001      # dependency chain without rolls
            acc = acc + x
        out_ref[:, :] = acc + 0.0 * img_ref[0, 0]
    return body


def prim_dyn_roll(axis):
    n = 16

    def body(img_ref, x_ref, out_ref):
        x = x_ref[...]
        s = x_ref[0, 0].astype(jnp.int32) % 5 + 1
        acc = jnp.zeros((TO, WP), jnp.float32)
        for i in range(n):
            x = _roll_dyn(x, s + i, axis)
            acc = acc + x
        out_ref[:, :] = acc + 0.0 * img_ref[0, 0]
    return body


def prim_select():
    def body(img_ref, x_ref, out_ref):
        x = x_ref[...]
        sel = x > 0.0
        acc = jnp.zeros((TO, WP), jnp.float32)
        for i in range(N_PRIM):
            acc = acc + jnp.where(sel, x, 0.0)
            x = x * 1.0000001
        out_ref[:, :] = acc + 0.0 * img_ref[0, 0]
    return body


# ------------------------------------------------- current scheme (mirrored
# from warp_pass_microbench so both schemes sit in one session)
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
                    acc_ref[ci] = acc_ref[ci] + jnp.where(
                        sel, cands[ci][:TO, :], 0.0
                    )
                if j + 1 < CHUNK:
                    cands = cands[1:] + [_roll(cands[-1], 1, 0)]
            return 0

        jax.lax.fori_loop(0, n_chunks, body, 0)
        out_ref[:, :] = acc_ref[0]

    pl.run_scoped(scoped, acc_ref=pltpu.VMEM((NCANDS, TO, WP), jnp.float32))


def horizontal_pass(img_ref, ui_ref, out_ref):
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


# --------------------------------------------------- swapped scheme (mirror)
def h_first_pass(img_ref, ui_ref, out_ref):
    """Pass 1 of the SWAP: column select on the row-EXTENDED band (GIH rows).

    Builds B_c(t', x) = img(t', x + ui(t', x) + c) for c in [0, NCANDS) and
    the gathered column offset (the vig-equivalent for the second pass's
    correction).  Single-candidate-per-column structure: per iteration ONE
    new static lane roll, NCANDS+1 select/adds — the mirror of the current
    vertical pass, on GIH/TO more rows.
    """
    img = img_ref[...]  # (GIH, WP)
    ui = ui_ref[...].astype(jnp.int32)  # (GIH, WP) — extended-row flow

    def scoped(acc_ref, uig_ref):
        zero = jnp.zeros((GIH, WP), jnp.float32)
        for ci in range(NCANDS):
            acc_ref[ci] = zero
        uig_ref[0] = jnp.zeros((GIH, WP), jnp.int32)
        n_chunks = -(-(2 * D_LOCAL + 1) // CHUNK)

        def body(q, _):
            d_base = q * CHUNK - D_LOCAL
            cands = [_roll_dyn(img, d_base, 1)]
            for _ in range(NCANDS - 1):
                cands.append(_roll(cands[-1], 1, 1))
            for j in range(CHUNK):
                sel = ui == (d_base + j)
                for ci in range(NCANDS):
                    acc_ref[ci] = acc_ref[ci] + jnp.where(sel, cands[ci], 0.0)
                uig_ref[0] = uig_ref[0] + jnp.where(sel, ui, 0)
                if j + 1 < CHUNK:
                    cands = cands[1:] + [_roll(cands[-1], 1, 1)]
            return 0

        jax.lax.fori_loop(0, n_chunks, body, 0)
        out_ref[:, :] = acc_ref[0][:TO, :]

    pl.run_scoped(
        scoped,
        acc_ref=pltpu.VMEM((NCANDS, GIH, WP), jnp.float32),
        uig_ref=pltpu.VMEM((1, GIH, WP), jnp.int32),
    )


def v_second_pass(b_ref, vi_ref, out_ref):
    """Pass 2 of the SWAP: row gather of the candidates + correction.

    Gathers B_c and the column-offset plane at rows t + vi and t + vi + 1
    (both bilinear row corners) — the mirror of the current horizontal
    pass, riding sublane rolls.
    """
    vi = vi_ref[...].astype(jnp.int32)  # (TO, WP)
    # stand-ins for the NCANDS candidate arrays + the uig plane (GIH rows)
    accs = [b_ref[...] for _ in range(NCANDS)]
    uig = b_ref[...].astype(jnp.int32)

    def scoped(g0_ref, g1_ref, cg_ref):
        zero = jnp.zeros((TO, WP), jnp.float32)
        for ci in range(NCANDS):
            g0_ref[ci] = zero
            g1_ref[ci] = zero
        cg_ref[0] = jnp.zeros((TO, WP), jnp.int32)
        cg_ref[1] = jnp.zeros((TO, WP), jnp.int32)
        n_chunks = -(-(2 * D_LOCAL + 2) // CHUNK)

        def body(q, _):
            d_base = q * CHUNK - D_LOCAL
            rolled = [_roll_dyn(a, d_base, 0) for a in accs]
            uig_rolled = _roll_dyn(uig, d_base, 0)
            for j in range(CHUNK):
                d = d_base + j
                sel0 = vi == d
                sel1 = vi == (d - 1)
                for ci in range(NCANDS):
                    g0_ref[ci] = g0_ref[ci] + jnp.where(
                        sel0, rolled[ci][:TO, :], 0.0
                    )
                    g1_ref[ci] = g1_ref[ci] + jnp.where(
                        sel1, rolled[ci][:TO, :], 0.0
                    )
                cg_ref[0] = cg_ref[0] + jnp.where(sel0, uig_rolled[:TO, :], 0)
                cg_ref[1] = cg_ref[1] + jnp.where(sel1, uig_rolled[:TO, :], 0)
                if j + 1 < CHUNK:
                    rolled = [_roll(a, 1, 0) for a in rolled]
                    uig_rolled = _roll(uig_rolled, 1, 0)
            return 0

        jax.lax.fori_loop(0, n_chunks, body, 0)
        out_ref[:, :] = g0_ref[0] + g1_ref[1]

    pl.run_scoped(
        scoped,
        g0_ref=pltpu.VMEM((NCANDS, TO, WP), jnp.float32),
        g1_ref=pltpu.VMEM((NCANDS, TO, WP), jnp.float32),
        cg_ref=pltpu.VMEM((2, TO, WP), jnp.int32),
    )


def main() -> None:
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(0, 1, (GI, WP)).astype(np.float32))
    img_h = jnp.asarray(rng.normal(0, 1, (GIH, WP)).astype(np.float32))
    sel = jnp.asarray(
        rng.integers(-D_LOCAL, D_LOCAL + 1, (TO, WP)).astype(np.float32)
    )
    sel_h = jnp.asarray(
        rng.integers(-D_LOCAL, D_LOCAL + 1, (GIH, WP)).astype(np.float32)
    )

    print(f"geometry: TO={TO} GIH={GIH} (x{GIH / TO:.2f} rows) WP={WP}, "
          f"{N_TILES} tiles, d_local={D_LOCAL}, ncands={NCANDS}")
    print(f"\nprimitives ({N_PRIM} dependent ops, us/tile):")
    for name, body, rows in [
        ("add-only chain", prim_add_only(), TO),
        ("static sublane roll+add", prim_static_roll(0), TO),
        ("static lane roll+add", prim_static_roll(1), TO),
        ("select(where)+add", prim_select(), TO),
    ]:
        f = mk(body)
        ms = device_time(lambda a, b: f(a, b), img, sel, iters=40) * 1e3
        print(f"  {name:<26} {ms / N_TILES * 1e3 / N_PRIM:7.3f} us/tile/op")
    for name, axis in [("dynamic sublane roll+add", 0), ("dynamic lane roll+add", 1)]:
        f = mk(prim_dyn_roll(axis))
        ms = device_time(lambda a, b: f(a, b), img, sel, iters=40) * 1e3
        print(f"  {name:<26} {ms / N_TILES * 1e3 / 16:7.3f} us/tile/op")

    print("\npass pairs (us/tile):")
    t = {}
    for name, body, a, b, rows in [
        ("vertical (current p1)", vertical_pass, img, sel, (GI, TO)),
        ("horizontal (current p2)", horizontal_pass, img, sel, (GI, TO)),
        ("h-first (swap p1)", h_first_pass, img_h, sel_h, (GIH, GIH)),
        ("v-second (swap p2)", v_second_pass, img_h, sel, (GIH, TO)),
    ]:
        f = mk(body, in_rows=rows)
        ms = device_time(lambda x, y: f(x, y), a, b, iters=40) * 1e3
        t[name] = ms / N_TILES * 1e3
        print(f"  {name:<26} {t[name]:7.1f} us/tile")
    cur = t["vertical (current p1)"] + t["horizontal (current p2)"]
    swp = t["h-first (swap p1)"] + t["v-second (swap p2)"]
    print(f"\n  current scheme total  {cur:7.1f} us/tile")
    print(f"  swapped scheme total  {swp:7.1f} us/tile ({swp / cur * 100:.1f}%)")


if __name__ == "__main__":
    main()
