"""Corroborate bench.py's analytic roofline with a measured device trace.

VERDICT r3 item 4: the bench.py utilization fields come from a hand-derived
cost model; nothing measured cross-checked it.  This study captures a
``jax.profiler`` trace of the headline config (PAPER_1080P, 50-chained
frames), extracts per-kernel device durations from the XSpace proto
(parsed via tensorboard_plugin_profile), and compares:

* total device time per frame vs the chained wall-clock estimate
  (bench.py's methodology) — validates the timing harness;
* the fused level-step kernels' share vs the cost model's VPU-floor
  prediction, and the pyramid matmuls vs the MXU prediction.

Run (TPU): python docs/studies/roofline_trace_study.py
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import numpy as np

import jax
import jax.numpy as jnp

import cuda_optical_flow_2_tpu as of

H, W = 1080, 1920
ITERS = 50
TRACE_DIR = "/tmp/of2_roofline_trace"


def chained(cfg, iters):
    def run(p, n):
        def body(_, s):
            flow = of.pyramidal_lk(p + s * jnp.float32(1e-20), n, cfg)
            return jnp.mean(flow)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    return jax.jit(run)


def parse_xspace(path: str) -> dict[str, float]:
    """Sum device-track trace-event durations by event name (us).

    Uses xprof's trace_viewer conversion (the xplane proto module is not
    shipped standalone in this environment)."""
    from xprof.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data([path], "trace_viewer", {})
    trace = json.loads(data)
    events = trace.get("traceEvents", [])
    # device tracks: pid names that are NOT the host CPU process
    pid_names = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dev_pids = {
        pid for pid, name in pid_names.items()
        if "TPU" in name or "Device" in name or "/device" in name.lower()
    }
    totals: dict[str, float] = {}
    for e in events:
        if e.get("ph") == "X" and "dur" in e:
            if dev_pids and e.get("pid") not in dev_pids:
                continue
            name = e.get("name", "?")
            totals[name] = totals.get(name, 0.0) + float(e["dur"])
    if not totals:
        print("trace pids:", pid_names)
    return totals  # us


def main() -> None:
    cfg = of.PAPER_1080P
    rng = np.random.default_rng(0)
    prev = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.float32))
    nxt = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.float32))

    fn = chained(cfg, ITERS)
    f1 = chained(cfg, 1)
    s = float(fn(prev, nxt)); assert np.isfinite(s)
    float(f1(prev, nxt))

    # wall-clock per frame (bench.py methodology)
    t1s, tns = [], []
    for _ in range(3):
        t0 = time.perf_counter(); float(f1(prev, nxt)); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(fn(prev, nxt)); tns.append(time.perf_counter() - t0)
    per_frame_wall = (min(tns) - min(t1s)) / ITERS
    print(f"wall-clock per frame (chained): {per_frame_wall * 1e3:.3f} ms "
          f"({1 / per_frame_wall:.1f} fps)")

    # traced run
    os.makedirs(TRACE_DIR, exist_ok=True)
    with jax.profiler.trace(TRACE_DIR):
        float(fn(prev, nxt))

    files = sorted(
        glob.glob(os.path.join(TRACE_DIR, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not files:
        print("NO XPLANE CAPTURED — profiler produced:",
              glob.glob(os.path.join(TRACE_DIR, "**", "*"), recursive=True))
        print("=> document as tunnel blocker if empty on repeat runs")
        return
    totals = parse_xspace(files[-1])
    if not totals:
        return

    def us_pf(name: str) -> float:
        return totals.get(name, 0.0) / ITERS

    run_pf = max(
        (us for n, us in totals.items() if n.startswith("jit_run")), default=0.0
    ) / ITERS
    step_pf = us_pf("jit(lk_level_step)")
    dot_pf = us_pf("dot_general")
    print(f"\nmeasured (device trace, per frame):")
    print(f"  whole pipeline        {run_pf:8.1f} us  "
          f"(wall-clock chained said {per_frame_wall * 1e6:.1f} us — "
          f"{run_pf / (per_frame_wall * 1e6) * 100:.1f}%)")
    print(f"  fused level steps     {step_pf:8.1f} us  ({step_pf / run_pf * 100:.1f}%)")
    print(f"  pyramid dot_general   {dot_pf:8.1f} us  ({dot_pf / run_pf * 100:.1f}%)")
    other = run_pf - step_pf - dot_pf
    print(f"  everything else       {other:8.1f} us  ({other / run_pf * 100:.1f}%)"
          f"  [upsample/pad/mul fusions]")

    # analytic cost model comparison (bench.py)
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
    import bench

    cost = bench._cost_model(cfg, H, W)
    vpu_floor_us = cost["vpu_ops"] / bench.VPU_PEAK * 1e6
    mxu_floor_us = cost["mxu_flops"] / bench.MXU_PEAK_F32 * 1e6
    hbm_floor_us = cost["hbm_bytes"] / bench.HBM_PEAK * 1e6
    print(f"\nanalytic floors (bench.py _cost_model, per frame):")
    print(f"  VPU op floor          {vpu_floor_us:8.1f} us  -> measured fused-step "
          f"time = {step_pf / vpu_floor_us:.1f}x the floor")
    print(f"  MXU flop floor        {mxu_floor_us:8.1f} us  -> measured dot time = "
          f"{dot_pf / mxu_floor_us:.1f}x the floor")
    print(f"  HBM byte floor        {hbm_floor_us:8.1f} us  (whole-pipeline "
          f"measured time = {run_pf / hbm_floor_us:.1f}x -> not HBM-bound)")

    print("\ntop events (us/frame):")
    for name, us in sorted(totals.items(), key=lambda kv: -kv[1])[:16]:
        print(f"  {us / ITERS:9.2f}  {name[:90]}")


if __name__ == "__main__":
    main()
