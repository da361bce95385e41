#!/usr/bin/env python
"""Headline benchmark: pyramidal LK throughput on 1080p frame pairs, one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Configuration is BASELINE.json config 4 (the paper operating point scaled to
1080p): 5 pyramid levels, 15x15 integration window, grayscale 1920x1080 pair.
``vs_baseline`` is fps / 60 — the >60 fps north-star target from BASELINE.md
(the reference itself only claims "real-time" at 640x480, README.md:22-24).

Timing methodology: on remote-tunneled TPU runtimes ``block_until_ready`` can
return before execution finishes and device->host transfers are slow, so the
benchmark chains ITERS pipeline evaluations on-device inside one jitted
``fori_loop`` — each iteration's input is perturbed by the previous result, so
nothing can be elided or overlapped dishonestly — and fetches a single scalar.
Per-frame time is (t(1 + N) - t(1)) / N, which cancels the fixed dispatch +
fetch overhead.
"""

from __future__ import annotations

import json
import os
import time

# Persistent compilation cache: first-ever compile of the pipeline goes
# through the remote compile service (minutes); every later bench run reloads
# the serialized executable in <1s.  Set before the first jax compile.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import numpy as np

import jax
import jax.numpy as jnp

import cuda_optical_flow_2_tpu as of

H, W = 1080, 1920
BASELINE_FPS = 60.0
ITERS = 50

# --- v5e peaks for utilization accounting (public numbers) -----------------
# HBM bandwidth ~819 GB/s; bf16 MXU ~197 TFLOP/s (fp32 matmuls run at ~1/4).
# VPU: (8, 128) vector unit x ~4 ALUs at ~1.5 GHz ~ 6.1e12 fp32 ALU ops/s.
HBM_PEAK = 819e9
MXU_PEAK_F32 = 49e12
VPU_PEAK = 6.1e12

# Trace-calibrated issued-work factor: a parsed jax.profiler XSpace trace of
# this exact headline program measured the fused level steps issuing ~6.2x
# the algorithmic VPU floor (rolls, masks, select lowering, int32 planes —
# docs/studies/roofline_trace_study.py; docs/PERF.md "End-to-end roofline").
# vpu_util_issued_est = floor util x this factor approximates the real
# VPU-issue busy fraction (~0.75-0.8 at the round-4 headline), so the floor
# field cannot be misread as "87% headroom" (VERDICT r4 item 5).
VPU_ISSUED_FACTOR = 6.2


def _cost_model(cfg: of.LKConfig, h: int, w: int) -> dict:
    """Analytic per-pair HBM bytes, VPU op floor and MXU FLOPs.

    Byte counts are exact plane traffic of the fused pipeline (each level
    step reads prev/nxt/flow and writes flow once — device-resident, no
    intermediate HBM round trips; halo re-reads ignored, <2%).  The VPU
    count is the ALGORITHMIC FLOOR of the select-gather warp + residual
    (docs/PERF.md "Level-0 kernel pass budget"): issued ops also include
    rolls/masks the floor excludes, so vpu_util_floor is a lower bound on
    busy-ness (vpu_util_issued_est applies the trace-calibrated factor).
    MXU counts the two banded decimation matmuls per pyramid level
    (ops/pyramid.py).
    """
    from cuda_optical_flow_2_tpu.kernels.lk_step_fused import half_geometry_ok

    lv, it = cfg.levels, cfg.iterations
    d, c = cfg.d_local, cfg.c_max
    areas = [(h >> k) * (w >> k) for k in range(lv)]
    f32 = 4

    level_px = sum(a * it for a in areas)
    # The in-kernel 2x flow upsample (kernels/updown.py) engages where the
    # level geometry allows: that level's first iteration reads the coarser
    # flow at quarter area, and the separate XLA upsample pass for the
    # transition into that level never touches HBM.
    fused_half = [
        cfg.fused_half_upsample
        and k < lv - 1
        and half_geometry_ok(h >> k, w >> k, cfg)
        for k in range(lv)
    ]
    # planes per level step: read prev, warped-source nxt, flow(2); write flow(2)
    bytes_steps = 6 * f32 * level_px
    bytes_steps -= 2 * f32 * sum(
        areas[k] - areas[k] // 4 for k in range(lv) if fused_half[k]
    )
    # pyramid build x2 frames: read parent, write child per transition
    bytes_pyr = 2 * f32 * sum(areas[k - 1] + areas[k] for k in range(1, lv))
    # flow upsample between levels: read 2 planes at k, write 2 at k-1
    bytes_up = 2 * f32 * sum(
        areas[k] + areas[k - 1] for k in range(1, lv) if not fused_half[k - 1]
    )
    hbm_bytes = bytes_steps + bytes_pyr + bytes_up

    # Select-gather warp floor per pixel: vertical pass examines 2*d_local+1
    # offsets x (1 cmp + 2 ops per candidate, ncands = 2*c_max + 2);
    # horizontal pass runs the same structure for 2 corners + the vig row.
    ncands = 2 * c + 2
    vert = (2 * d + 1) * (1 + 2 * ncands)
    warp_ops = vert + 3 * vert + 8  # + bilinear blend
    # residual: Sobel x/y + temporal stencils (shift form), 5 products,
    # separable window sums (per axis: log-depth shift-adds for "box", two
    # iterated box passes + a scale for "tri", window-tap symmetric-pair
    # FMAs for "gauss" — kernels/lk_fused._win_sum), guarded 2x2 solve
    import math

    log_w = max(1, math.ceil(math.log2(cfg.window)))
    ww = getattr(cfg, "window_weights", "box")
    if ww == "tri":
        win_axis_ops = 2 * log_w + 1
    elif ww == "gauss":
        # Per symmetric tap pair the kernel issues ~2 rolls + 2 adds + 1 FMA
        # (kernels/lk_fused._win_sum), i.e. ~5 ops x window//2 pairs + the
        # center tap — not 1 op per tap (ADVICE r4).
        win_axis_ops = 5 * (cfg.window // 2) + 1
    else:
        win_axis_ops = log_w
    resid_ops = 24 + 5 + 5 * 2 * win_axis_ops + 18
    vpu_ops = (warp_ops + resid_ops) * level_px

    # D_h @ x @ D_w^T per pyramid transition, x2 frames
    mxu_flops = 0
    for k in range(1, lv):
        hi, wi = h >> (k - 1), w >> (k - 1)
        ho, wo = h >> k, w >> k
        mxu_flops += 2 * (2 * ho * hi * wi + 2 * ho * wi * wo)

    return {"hbm_bytes": hbm_bytes, "vpu_ops": vpu_ops, "mxu_flops": mxu_flops}


def _chained(p: jax.Array, n: jax.Array, iters: int, cfg: of.LKConfig) -> jax.Array:
    # The s*1e-20 perturbation is the serialization mechanism: each
    # iteration's input depends on the previous result, so XLA cannot elide
    # or overlap iterations.  Measured alternatives (round 4): an
    # `optimization_barrier((p, s))` chain IS elided (XLA hoists the
    # loop-invariant body; reports ~150k fps), and the perturbation's own
    # cost is <2 % (412 vs 416 fps same-session) — so the mul chain stays.
    def body(_, s):
        flow = of.pyramidal_lk(p + s * jnp.float32(1e-20), n, cfg)
        return jnp.mean(flow)

    return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))


def main() -> None:
    cfg = of.PAPER_1080P
    rng = np.random.default_rng(0)
    prev = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.float32))
    nxt = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.float32))

    f1 = jax.jit(lambda p, n: _chained(p, n, 1, cfg))
    fn = jax.jit(lambda p, n: _chained(p, n, 1 + ITERS, cfg))
    # warm both programs (compile + first execute)
    s1 = float(f1(prev, nxt))
    sn = float(fn(prev, nxt))
    assert np.isfinite(s1) and np.isfinite(sn), (s1, sn)

    # Tunnel round-trip jitter is additive noise on each sample; min() over
    # independent samples of t1 and tn filters it, whereas min over the
    # PAIRED differences can overestimate fps when only t1 catches a spike.
    t1s, tns = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        float(f1(prev, nxt))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(fn(prev, nxt))
        tns.append(time.perf_counter() - t0)
    per_frame = (min(tns) - min(t1s)) / ITERS
    fps = 1.0 / per_frame

    cost = _cost_model(cfg, H, W)
    print(
        json.dumps(
            {
                "metric": "pyramidal_lk_1080p_fps",
                "value": round(fps, 2),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
                # Roofline accounting (docs/PERF.md "End-to-end roofline"):
                # achieved HBM/VPU/MXU throughput from the analytic per-pair
                # cost model vs v5e peaks.  vpu_util_floor uses the
                # ALGORITHMIC op floor (a lower bound on busy-ness);
                # vpu_util_issued_est applies the trace-calibrated 6.2x
                # issued-work factor (see VPU_ISSUED_FACTOR) and is the
                # honest utilization estimate.
                "hbm_gbps": round(cost["hbm_bytes"] * fps / 1e9, 1),
                "hbm_util": round(cost["hbm_bytes"] * fps / HBM_PEAK, 4),
                "vpu_gops": round(cost["vpu_ops"] * fps / 1e9, 1),
                "vpu_util_floor": round(cost["vpu_ops"] * fps / VPU_PEAK, 4),
                "vpu_util_issued_est": round(
                    min(1.0, cost["vpu_ops"] * fps / VPU_PEAK * VPU_ISSUED_FACTOR),
                    4,
                ),
                "vpu_issued_factor": VPU_ISSUED_FACTOR,
                "mxu_gflops": round(cost["mxu_flops"] * fps / 1e9, 1),
                "mxu_util": round(cost["mxu_flops"] * fps / MXU_PEAK_F32, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
