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
import gzip
import json
import os
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
    """Sum device-plane event durations by event name (us)."""
    from tensorboard_plugin_profile.protobuf import xplane_pb2

    xspace = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xspace.ParseFromString(f.read())
    totals: dict[str, float] = {}
    planes = []
    for plane in xspace.planes:
        if "TPU" in plane.name or "/device:" in plane.name:
            planes.append(plane)
    if not planes:  # fall back to every non-host plane
        planes = [p for p in xspace.planes if "Host" not in p.name]
    for plane in planes:
        meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                totals[name] = totals.get(name, 0.0) + ev.duration_ps / 1e6
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
        print("xplane parsed but no device events — plane names:")
        from tensorboard_plugin_profile.protobuf import xplane_pb2

        xspace = xplane_pb2.XSpace()
        with open(files[-1], "rb") as f:
            xspace.ParseFromString(f.read())
        for p in xspace.planes:
            print("  plane:", p.name, "lines:", len(p.lines))
        return

    dev_total_us = sum(totals.values())
    per_frame_dev = dev_total_us / (ITERS + 1) / 1e3  # ms, fn ran 1+ITERS frames? fn=ITERS
    print(f"\ndevice events total: {dev_total_us / 1e3:.2f} ms over {ITERS} frames "
          f"=> {dev_total_us / ITERS / 1e3:.3f} ms/frame")
    print("\ntop kernels (us total over the traced run):")
    for name, us in sorted(totals.items(), key=lambda kv: -kv[1])[:20]:
        print(f"  {us:10.1f} us  {us / ITERS:8.2f} us/frame  {name[:90]}")


if __name__ == "__main__":
    main()
