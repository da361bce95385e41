"""Dataset evaluation harness: discovery, scoring, CLI end-to-end on CPU."""

import json

import numpy as np

from cuda_optical_flow_2_tpu.utils import io as uio
from cuda_optical_flow_2_tpu.utils import metrics


def _write_dataset_flat(root, n_frames=3, h=96, w=128, velocity=(2.0, 1.0)):
    """Flat layout: frame_000N.png + frame_000N.flo for each leading frame."""
    from cuda_optical_flow_2_tpu.utils import viz

    frames = uio.synthetic_sequence(n_frames, h, w, velocity=velocity, period=24)
    truth = np.full((h, w, 2), velocity, np.float32)
    for t in range(n_frames):
        viz.write_png(str(root / f"frame_{t:04d}.png"), frames[t])
        if t < n_frames - 1:
            uio.write_flo(str(root / f"frame_{t:04d}.flo"), truth)
    return frames


def test_metrics_outlier_rate_and_report():
    truth = np.zeros((16, 16, 2), np.float64)
    flow = np.zeros_like(truth)
    flow[:8, :, 0] = 4.0  # 4 px wrong on the top half
    assert abs(metrics.outlier_rate(flow, truth) - 0.5) < 1e-12
    rep = metrics.evaluate_flow(flow, truth)
    assert abs(rep["epe_mean"] - 2.0) < 1e-12
    assert abs(rep["fl_all"] - 0.5) < 1e-12
    assert rep["valid_fraction"] == 1.0
    # Middlebury unknown sentinel pixels are excluded from every score.
    truth[:8] = 1e10
    rep = metrics.evaluate_flow(flow, truth)
    assert rep["epe_mean"] == 0.0
    assert abs(rep["valid_fraction"] - 0.5) < 1e-12


def test_discover_pairs_flat_and_subdir(tmp_path):
    from cuda_optical_flow_2_tpu.cli import evaluate

    flat = tmp_path / "flat"
    flat.mkdir()
    _write_dataset_flat(flat, n_frames=3)
    pairs = evaluate.discover_pairs(str(flat))
    assert len(pairs) == 2
    assert all(p["truth"] for p in pairs)

    # Middlebury-style: one subdirectory per pair, one .flo inside.
    sub = tmp_path / "mb" / "seq_a"
    sub.mkdir(parents=True)
    _write_dataset_flat(sub, n_frames=2)
    pairs = evaluate.discover_pairs(str(tmp_path / "mb"))
    assert len(pairs) == 1 and pairs[0]["name"] == "seq_a"
    assert pairs[0]["truth"].endswith(".flo")


def test_eval_cli_end_to_end(tmp_path, capsys):
    from cuda_optical_flow_2_tpu.cli import evaluate

    data = tmp_path / "data"
    data.mkdir()
    _write_dataset_flat(data, n_frames=3, velocity=(2.0, 1.0))
    out = tmp_path / "artifacts"
    evaluate.main([
        "--dataset", str(data), "--levels", "2", "--window", "9",
        "--no-pallas", "--margin", "12", "--out", str(out),
    ])
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    agg = lines[-1]
    assert agg["aggregate"] and agg["pairs"] == 2 == agg["pairs_with_truth"]
    assert agg["epe_mean"] < 0.5
    assert agg["fl_all"] < 0.05
    # per-pair records carry the full report
    assert all("epe_median" in r for r in lines[:-1])
    # artifacts: flow-color PNG + .flo round trip per pair
    flo = uio.read_flo(str(out / "frame_0000.flo"))
    assert flo.shape == (96, 128, 2)
    assert abs(np.median(flo[..., 0]) - 2.0) < 0.5


def test_eval_cli_without_truth(tmp_path, capsys):
    from cuda_optical_flow_2_tpu.cli import evaluate

    data = tmp_path / "data"
    data.mkdir()
    frames = uio.synthetic_sequence(2, 64, 80, velocity=(1.0, 0.0), period=24)
    from cuda_optical_flow_2_tpu.utils import viz

    for t, f in enumerate(frames):
        viz.write_png(str(data / f"f{t}.png"), f)
    evaluate.main([
        "--dataset", str(data), "--levels", "1", "--window", "9", "--no-pallas",
    ])
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    assert lines[-1]["pairs"] == 1 and lines[-1]["pairs_with_truth"] == 0
    assert "flow_mean_magnitude" in lines[0]
