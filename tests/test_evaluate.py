"""Dataset evaluation harness: discovery, scoring, CLI end-to-end on CPU."""

import json

import numpy as np
import pytest

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

    # Pair dir with flow-PNG truth; "flower"-like frame names are NOT truth.
    sub2 = tmp_path / "mb2" / "seq_png"
    sub2.mkdir(parents=True)
    from cuda_optical_flow_2_tpu.utils import viz

    frames = uio.synthetic_sequence(2, 32, 48, velocity=(1.0, 0.0))
    viz.write_png(str(sub2 / "flower_10.png"), frames[0])
    viz.write_png(str(sub2 / "flower_11.png"), frames[1])
    uio.write_flow_png(
        str(sub2 / "gt_flow.png"), np.full((32, 48, 2), (1.0, 0.0), np.float32)
    )
    (pair,) = evaluate.discover_pairs(str(tmp_path / "mb2"))
    assert pair["first"].endswith("flower_10.png")
    assert pair["second"].endswith("flower_11.png")
    assert pair["truth"].endswith("gt_flow.png")

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
    # artifacts: flow-color PNG + .flo + KITTI flow-PNG round trip per pair
    flo = uio.read_flo(str(out / "frame_0000.flo"))
    assert flo.shape == (96, 128, 2)
    assert abs(np.median(flo[..., 0]) - 2.0) < 0.5
    kitti = uio.read_flow_png(str(out / "frame_0000_flow.png"))
    finite = np.isfinite(kitti).all(axis=-1)
    np.testing.assert_allclose(
        kitti[finite], flo[finite], atol=1.0 / 128 + 1e-6
    )
    assert (out / "frame_0000_color.png").exists()


def test_chain_pairs_grouping(tmp_path):
    """Consecutive pairs sharing a frame file chain; isolated pairs are
    length-1 chains."""
    from cuda_optical_flow_2_tpu.cli import evaluate

    flat = tmp_path / "flat"
    flat.mkdir()
    _write_dataset_flat(flat, n_frames=4)
    pairs = evaluate.discover_pairs(str(flat))
    chains = evaluate._chain_pairs(pairs)
    assert [len(c) for c in chains] == [3]

    # two independent pair directories -> two length-1 chains
    for name in ("a", "b"):
        sub = tmp_path / "mb" / name
        sub.mkdir(parents=True)
        _write_dataset_flat(sub, n_frames=2)
    pairs = evaluate.discover_pairs(str(tmp_path / "mb"))
    chains = evaluate._chain_pairs(pairs)
    assert [len(c) for c in chains] == [1, 1]


def test_eval_cli_streaming_warm_start(tmp_path, capsys):
    """--streaming --warm-start scores the carried-state serving
    configuration (VERDICT r3 item 3): per-record seq/t fields, a
    streaming-warm summary with chain count and drift thirds, and with
    --compare-cold the stateless EPE next to each record.  On a constant-
    velocity sequence the warm path must track at least as well as cold."""
    from cuda_optical_flow_2_tpu.cli import evaluate

    data = tmp_path / "data"
    data.mkdir()
    _write_dataset_flat(data, n_frames=5, velocity=(2.0, 1.0))
    evaluate.main([
        "--dataset", str(data), "--streaming", "--warm-start",
        "--compare-cold", "--levels", "1", "--window", "15", "--no-pallas",
        "--margin", "12",
    ])
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    recs, agg = lines[:-1], lines[-1]
    assert agg["mode"] == "streaming-warm"
    assert agg["pairs"] == 4 == agg["pairs_with_truth"]
    assert agg["chains"] == 1
    assert {"epe_early_third", "epe_late_third", "cold_epe_mean"} <= set(agg)
    assert agg["epe_mean"] < 0.5
    # no lock loss on constant velocity
    assert agg["epe_late_third"] < agg["epe_early_third"] * 2 + 0.05
    assert [r["t"] for r in recs] == [0, 1, 2, 3]
    assert all(r["seq"] == 0 and "cold_epe_mean" in r for r in recs)
    # warm steps (t >= 1) must beat or match their cold counterpart here
    warm_after = np.mean([r["epe_mean"] for r in recs[1:]])
    cold_after = np.mean([r["cold_epe_mean"] for r in recs[1:]])
    assert warm_after <= cold_after + 0.02


def test_eval_cli_streaming_model_generic(tmp_path, capsys):
    """--streaming rides the model-generic streaming.step: a non-LK family
    (DIS) scores chains with carried state too."""
    from cuda_optical_flow_2_tpu.cli import evaluate

    data = tmp_path / "data"
    data.mkdir()
    _write_dataset_flat(data, n_frames=4, velocity=(1.0, 0.0))
    evaluate.main([
        "--dataset", str(data), "--streaming", "--model", "dis",
        "--levels", "3", "--no-pallas", "--margin", "12",
    ])
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    agg = lines[-1]
    assert agg["mode"] == "streaming" and agg["model"] == "dis"
    assert agg["pairs"] == 3 == agg["pairs_with_truth"]
    assert agg["epe_mean"] < 0.5


def test_eval_cli_streaming_with_bucket(tmp_path, capsys):
    """--streaming composes with --bucket: frames pad to the bucket shape
    before the carried-state step and the scored flow is cropped back."""
    from cuda_optical_flow_2_tpu.cli import evaluate

    data = tmp_path / "data"
    data.mkdir()
    _write_dataset_flat(data, n_frames=3, h=90, w=120, velocity=(1.0, 0.0))
    evaluate.main([
        "--dataset", str(data), "--streaming", "--bucket", "32",
        "--levels", "2", "--window", "9", "--no-pallas", "--margin", "12",
    ])
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    recs, agg = lines[:-1], lines[-1]
    assert all(r["shape"] == [90, 120] for r in recs)
    assert all(r["padded_shape"] == [96, 128] for r in recs)
    assert agg["epe_mean"] < 0.5


def test_eval_cli_streaming_detects_lock_loss(tmp_path, capsys):
    """The harness-level lock-loss view (VERDICT r3 item 3): on an
    accelerating ramp (1..6 px/frame) with a single-level pyramid, the
    cold stateless path loses lock while warm streaming tracks — visible
    directly in the records as cold_epe_mean >> epe_mean on late pairs."""
    from cuda_optical_flow_2_tpu.cli import evaluate
    from cuda_optical_flow_2_tpu.utils import viz

    rng = np.random.default_rng(0)
    h, w = 96, 128
    base = rng.random((h, w)).astype(np.float32)
    tex = np.pad(base, 1, mode="wrap")
    tex = sum(tex[i:i + h, j:j + w] for i in range(3) for j in range(3)) / 9
    tex = (tex - tex.min()) / (np.ptp(tex) + 1e-6) * 255
    shifts = np.cumsum([0, 1, 2, 3, 4, 5, 6])
    data = tmp_path / "ramp"
    data.mkdir()
    for t, s in enumerate(shifts):
        frame = np.roll(tex, -int(s), axis=1)
        viz.write_png(
            str(data / f"frame_{t:04d}.png"),
            np.repeat(frame[..., None].astype(np.uint8), 3, -1),
        )
        if t < len(shifts) - 1:
            vel = float(shifts[t + 1] - s)
            uio.write_flo(
                str(data / f"frame_{t:04d}.flo"),
                np.full((h, w, 2), (-vel, 0.0), np.float32),
            )
    evaluate.main([
        "--dataset", str(data), "--streaming", "--warm-start",
        "--compare-cold", "--levels", "1", "--window", "11",
        "--iterations", "2", "--no-pallas", "--margin", "20",
    ])
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    recs = lines[:-1]
    late = [r for r in recs if r["t"] >= 4]   # 5-6 px/frame
    assert late
    for r in late:
        assert r["epe_mean"] < 1.0, r            # warm: still locked
        assert r["cold_epe_mean"] > 2.0, r       # cold: lost lock
    agg = lines[-1]
    assert agg["cold_epe_mean"] > 2 * agg["epe_mean"]


def test_eval_cli_streaming_scene_cut_recovery(tmp_path, capsys):
    """VERDICT r4 item 3 proof at the harness level: inject a content cut
    into a warm-streamed sequence.  Without recovery the stale seed loses
    lock permanently (late pairs EPE > 2 px); with --recover-levels the
    on-device acquisition check drops the seed, the pair re-solves deep,
    and the late-third EPE returns to the early-third level."""
    from cuda_optical_flow_2_tpu.cli import evaluate
    from cuda_optical_flow_2_tpu.utils import viz

    rng = np.random.default_rng(0)
    h, w = 96, 128

    def banded(seed):
        base = rng.random((h, w)).astype(np.float32)
        t = np.pad(base, 1, mode="wrap")
        t = sum(t[i:i + h, j:j + w] for i in range(3) for j in range(3)) / 9
        return (t - t.min()) / (np.ptp(t) + 1e-6) * 255

    tex_a, tex_b = banded(0), banded(1)
    # Scene A ramps 1..5 px/frame leftward (warm tracking acquires the
    # ramp), then a hard cut to scene B moving 5 px/frame the OTHER way —
    # the stale seed is 10 px wrong, far beyond the single level's
    # re-acquisition range (the lock-loss test's regime).
    pos_a = np.cumsum([0, 1, 2, 3, 4, 5])
    pos_b = -np.arange(5) * 5
    frames = [np.roll(tex_a, -int(s), axis=1) for s in pos_a]
    frames += [np.roll(tex_b, -int(s), axis=1) for s in pos_b]
    positions = list(pos_a) + list(pos_b)
    data = tmp_path / "cutseq"
    data.mkdir()
    cut_t = len(pos_a) - 1  # pair (A_last -> B_first): no correspondence
    for t, frame in enumerate(frames):
        viz.write_png(
            str(data / f"frame_{t:04d}.png"),
            np.repeat(frame[..., None].astype(np.uint8), 3, -1),
        )
        if t < len(frames) - 1 and t != cut_t:
            vel = float(positions[t + 1] - positions[t])
            uio.write_flo(
                str(data / f"frame_{t:04d}.flo"),
                np.full((h, w, 2), (-vel, 0.0), np.float32),
            )

    def run(extra):
        evaluate.main([
            "--dataset", str(data), "--streaming", "--warm-start",
            "--levels", "1", "--window", "11", "--iterations", "2",
            "--no-pallas", "--margin", "20", *extra,
        ])
        lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
        return lines[:-1], lines[-1]

    recs, agg = run(["--recover-levels", "3"])
    post_cut = [r for r in recs if r["t"] > cut_t and "epe_mean" in r]
    assert post_cut
    for r in post_cut:
        assert r["epe_mean"] < 0.5, r          # re-acquired after the cut
    assert agg["recover_levels"] == 3
    assert agg["epe_late_third"] < 1.0
    assert agg["epe_late_third"] < 2 * max(agg["epe_early_third"], 0.1)

    recs, agg = run([])
    post_cut = [r for r in recs if r["t"] > cut_t and "epe_mean" in r]
    for r in post_cut:
        assert r["epe_mean"] > 2.0, r          # stale seed: lock never returns
    assert "recover_levels" not in agg
    assert agg["epe_late_third"] > 2.0


def test_eval_cli_streaming_flag_validation(tmp_path, capsys):
    from cuda_optical_flow_2_tpu.cli import evaluate
    import pytest

    with pytest.raises(SystemExit):
        evaluate.main(["--dataset", str(tmp_path), "--warm-start"])
    capsys.readouterr()


def test_flow_png_round_trip(tmp_path):
    """KITTI flow-PNG codec: 1/64-px quantization, invalid pixels -> NaN."""
    rng = np.random.default_rng(3)
    flow = rng.uniform(-60.0, 60.0, (17, 23, 2)).astype(np.float32)
    valid = rng.random((17, 23)) > 0.25
    path = str(tmp_path / "gt_flow.png")
    uio.write_flow_png(path, flow, valid)
    back = uio.read_flow_png(path)
    assert back.shape == flow.shape and back.dtype == np.float32
    assert np.isnan(back[~valid]).all()
    np.testing.assert_allclose(back[valid], flow[valid], atol=1.0 / 128 + 1e-6)
    # the generic dispatcher picks the right decoder per extension
    np.testing.assert_array_equal(
        uio.read_flow(path)[valid], back[valid]
    )
    # non-finite flow defaults the valid mask
    flow[0, 0] = np.nan
    uio.write_flow_png(path, flow)
    assert np.isnan(uio.read_flow_png(path)[0, 0]).all()


def test_png16_sub_filter_bpp_offset(tmp_path):
    """16-bit PNG sub/up filters use the 6-byte (not 3) pixel offset."""
    import struct
    import zlib

    h, w = 4, 5
    img = (np.arange(h * w * 3) * 977 % 65536).astype(np.uint16).reshape(h, w, 3)
    be = img.astype(">u2").view(np.uint8).reshape(h, w * 6)
    rows = []
    for i in range(h):
        if i % 2 == 0:  # filter 1 (sub): delta vs the previous PIXEL's bytes
            line = be[i].astype(np.int32)
            enc = line.copy()
            enc[6:] = (line[6:] - line[:-6]) % 256
            rows.append(b"\x01" + enc.astype(np.uint8).tobytes())
        else:  # filter 2 (up)
            enc = (be[i].astype(np.int32) - be[i - 1].astype(np.int32)) % 256
            rows.append(b"\x02" + enc.astype(np.uint8).tobytes())
    raw = b"".join(rows)

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    path = tmp_path / "f.png"
    path.write_bytes(
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 16, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    back = uio._read_png(str(path))
    assert back.dtype == np.uint16
    np.testing.assert_array_equal(back, img)


def test_discover_and_eval_kitti_layout(tmp_path, capsys):
    """KITTI directory layout: image_2 pairs + flow_occ 16-bit PNG truth."""
    from cuda_optical_flow_2_tpu.cli import evaluate
    from cuda_optical_flow_2_tpu.utils import viz

    h, w, velocity = 96, 128, (2.0, 1.0)
    img_dir = tmp_path / "image_2"
    flow_dir = tmp_path / "flow_occ"
    img_dir.mkdir()
    flow_dir.mkdir()
    frames = uio.synthetic_sequence(3, h, w, velocity=velocity, period=24)
    truth = np.full((h, w, 2), velocity, np.float32)
    valid = np.ones((h, w), bool)
    valid[: h // 4] = False  # a known-invalid band must not be scored
    for k in range(2):
        viz.write_png(str(img_dir / f"{k:06d}_10.png"), frames[k])
        viz.write_png(str(img_dir / f"{k:06d}_11.png"), frames[k + 1])
        uio.write_flow_png(str(flow_dir / f"{k:06d}_10.png"), truth, valid)

    pairs = evaluate.discover_pairs(str(tmp_path))
    assert [p["name"] for p in pairs] == ["000000", "000001"]
    assert all(p["truth"] and "flow_occ" in p["truth"] for p in pairs)

    evaluate.main([
        "--dataset", str(tmp_path), "--levels", "2", "--window", "9",
        "--no-pallas", "--margin", "12",
    ])
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    agg = lines[-1]
    assert agg["pairs"] == 2 == agg["pairs_with_truth"]
    assert agg["epe_mean"] < 0.5
    assert all(0.0 < r["valid_fraction"] < 1.0 for r in lines[:-1])


def test_discover_and_eval_sintel_layout(tmp_path, capsys):
    """Sintel layout: final/<seq> frames + flow/<seq> .flo, all consecutive
    pairs of every sequence; --sintel-pass picks the render pass."""
    from cuda_optical_flow_2_tpu.cli import evaluate
    from cuda_optical_flow_2_tpu.utils import viz

    h, w, velocity = 96, 128, (2.0, 1.0)
    frames = uio.synthetic_sequence(3, h, w, velocity=velocity, period=24)
    truth = np.full((h, w, 2), velocity, np.float32)
    for seq in ("alley_1", "bandage_2"):
        fdir = tmp_path / "final" / seq
        gdir = tmp_path / "flow" / seq
        fdir.mkdir(parents=True)
        gdir.mkdir(parents=True)
        for t in range(3):
            viz.write_png(str(fdir / f"frame_{t + 1:04d}.png"), frames[t])
            if t < 2:
                uio.write_flo(str(gdir / f"frame_{t + 1:04d}.flo"), truth)

    pairs = evaluate.discover_pairs(str(tmp_path))
    assert len(pairs) == 4  # 2 sequences x 2 consecutive pairs
    assert pairs[0]["name"] == "alley_1_frame_0001"
    assert all(p["truth"] and p["truth"].endswith(".flo") for p in pairs)

    # a clean-pass copy is preferred when requested
    (tmp_path / "clean").mkdir()
    (tmp_path / "clean" / "alley_1").mkdir()
    viz.write_png(str(tmp_path / "clean" / "alley_1" / "frame_0001.png"), frames[0])
    viz.write_png(str(tmp_path / "clean" / "alley_1" / "frame_0002.png"), frames[1])
    clean = evaluate.discover_pairs(str(tmp_path), sintel_pass="clean")
    assert len(clean) == 1 and "/clean/" in clean[0]["first"]

    evaluate.main([
        "--dataset", str(tmp_path), "--levels", "2", "--window", "9",
        "--no-pallas", "--margin", "12",
    ])
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    agg = lines[-1]
    assert agg["pairs"] == 4 == agg["pairs_with_truth"]
    assert agg["epe_mean"] < 0.5


def test_eval_cli_streaming_sintel_chains(tmp_path, capsys):
    """Sintel layout under --streaming: each sequence forms its own chain
    (pairs share frame files within a sequence but not across), so the
    carried state resets per sequence."""
    from cuda_optical_flow_2_tpu.cli import evaluate
    from cuda_optical_flow_2_tpu.utils import viz

    h, w, velocity = 96, 128, (2.0, 1.0)
    frames = uio.synthetic_sequence(4, h, w, velocity=velocity, period=24)
    truth = np.full((h, w, 2), velocity, np.float32)
    for seq in ("alley_1", "bandage_2"):
        fdir = tmp_path / "final" / seq
        gdir = tmp_path / "flow" / seq
        fdir.mkdir(parents=True)
        gdir.mkdir(parents=True)
        for t in range(4):
            viz.write_png(str(fdir / f"frame_{t + 1:04d}.png"), frames[t])
            if t < 3:
                uio.write_flo(str(gdir / f"frame_{t + 1:04d}.flo"), truth)

    evaluate.main([
        "--dataset", str(tmp_path), "--streaming", "--warm-start",
        "--levels", "1", "--window", "15", "--no-pallas", "--margin", "12",
    ])
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    recs, agg = lines[:-1], lines[-1]
    assert agg["chains"] == 2 and agg["pairs"] == 6
    assert agg["mode"] == "streaming-warm"
    assert [r["seq"] for r in recs] == [0, 0, 0, 1, 1, 1]
    assert [r["t"] for r in recs] == [0, 1, 2, 0, 1, 2]
    assert agg["epe_mean"] < 0.5


def test_eval_cli_preset(tmp_path, capsys):
    """--preset runs a named operating point; family implied by config type."""
    from cuda_optical_flow_2_tpu.cli import evaluate

    data = tmp_path / "data"
    data.mkdir()
    _write_dataset_flat(data, n_frames=2)
    evaluate.main([
        "--dataset", str(data), "--preset", "tvl1_realtime",
        "--no-pallas", "--margin", "16",
    ])
    agg = json.loads(capsys.readouterr().out.splitlines()[-1])
    assert agg["model"] == "TVL1Config" and agg["preset"] == "tvl1_realtime"
    assert agg["epe_mean"] < 0.3


@pytest.mark.parametrize(
    "flag", [("--levels", "2"), ("--window", "9"), ("--iterations", "3"),
             ("--window-weights", "tri")],
    ids=lambda f: f[0],
)
def test_eval_cli_preset_conflicting_flag_errors(tmp_path, capsys, flag):
    """--preset + an explicitly-passed overridden knob errors instead of
    silently dropping the flag (VERDICT r4 item 7)."""
    from cuda_optical_flow_2_tpu.cli import evaluate

    with pytest.raises(SystemExit) as exc:
        evaluate.main([
            "--dataset", str(tmp_path), "--preset", "tvl1_realtime", *flag,
        ])
    assert exc.value.code == 2
    assert flag[0] in capsys.readouterr().err


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

def test_eval_cli_bucket_compiles_once_per_bucket(tmp_path, capsys):
    """--bucket pads varying-shape pairs to shared shapes: 3 distinct frame
    shapes land in 2 buckets -> exactly 2 XLA traces (the KITTI readiness
    requirement, VERDICT r2 #4a), and accuracy survives the padding."""
    from cuda_optical_flow_2_tpu.cli import evaluate
    from cuda_optical_flow_2_tpu.utils import viz

    velocity = (2.0, 1.0)
    shapes = [(96, 120), (88, 126), (60, 62)]  # buckets 128x128, 128x128, 64x64
    for i, (h, w) in enumerate(shapes):
        sub = tmp_path / f"seq{i}"
        sub.mkdir()
        frames = uio.synthetic_sequence(2, h, w, velocity=velocity, period=24)
        viz.write_png(str(sub / "frame_0.png"), frames[0])
        viz.write_png(str(sub / "frame_1.png"), frames[1])
        uio.write_flo(
            str(sub / "frame_0.flo"), np.full((h, w, 2), velocity, np.float32)
        )

    evaluate.main([
        "--dataset", str(tmp_path), "--levels", "2", "--window", "9",
        "--no-pallas", "--margin", "12", "--bucket", "64",
    ])
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    agg = lines[-1]
    assert agg["compiles"] == 2
    assert agg["pairs"] == 3 == agg["pairs_with_truth"]
    assert agg["epe_mean"] < 0.5
    padded = {tuple(r.get("padded_shape", r["shape"])) for r in lines[:-1]}
    assert padded == {(128, 128), (64, 64)}

    # Without bucketing the same tree compiles once per distinct shape.
    evaluate.main([
        "--dataset", str(tmp_path), "--levels", "2", "--window", "9",
        "--no-pallas", "--margin", "12",
    ])
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    assert lines[-1]["compiles"] == 3
    assert "padded_shape" not in lines[0]


def test_eval_sintel_occlusion_split(tmp_path, capsys):
    """Sintel occ/ masks produce the EPE matched/unmatched split."""
    from cuda_optical_flow_2_tpu.cli import evaluate
    from cuda_optical_flow_2_tpu.utils import viz

    h, w, velocity = 96, 128, (2.0, 1.0)
    frames = uio.synthetic_sequence(3, h, w, velocity=velocity, period=24)
    truth = np.full((h, w, 2), velocity, np.float32)
    # Occluded band carries deliberately wrong truth so the split is visible.
    occ_mask = np.zeros((h, w), np.uint8)
    occ_mask[:, : w // 4] = 255
    truth_occ = truth.copy()
    truth_occ[:, : w // 4] = (30.0, -30.0)
    fdir = tmp_path / "final" / "alley_1"
    gdir = tmp_path / "flow" / "alley_1"
    odir = tmp_path / "occ" / "alley_1"
    for d in (fdir, gdir, odir):
        d.mkdir(parents=True)
    for t in range(3):
        viz.write_png(str(fdir / f"frame_{t + 1:04d}.png"), frames[t])
        if t < 2:
            uio.write_flo(str(gdir / f"frame_{t + 1:04d}.flo"), truth_occ)
            viz.write_png(str(odir / f"frame_{t + 1:04d}.png"), occ_mask)

    pairs = evaluate.discover_pairs(str(tmp_path))
    assert all(p["occ"] and "/occ/" in p["occ"] for p in pairs)

    evaluate.main([
        "--dataset", str(tmp_path), "--levels", "2", "--window", "9",
        "--no-pallas", "--margin", "12",
    ])
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    agg = lines[-1]
    assert agg["layout"] == "Sintel"
    assert agg["epe_matched"] < 0.5          # truth is correct off-occlusion
    assert agg["epe_unmatched"] > 10.0       # and deliberately wrong on it
    assert all(0.0 < r["occluded_fraction"] < 1.0 for r in lines[:-1])


def test_metrics_occlusion_split_margins():
    truth = np.zeros((16, 16, 2), np.float64)
    flow = np.zeros_like(truth)
    flow[:, :8, 0] = 2.0
    occ = np.zeros((16, 16), bool)
    occ[:, :8] = True
    rep = metrics.evaluate_flow(flow, truth, margin=2, occ=occ)
    assert rep["epe_matched"] == 0.0
    assert abs(rep["epe_unmatched"] - 2.0) < 1e-12
    assert abs(rep["occluded_fraction"] - 0.5) < 1e-12


def test_eval_sintel_empty_occ_side_stays_strict_json(tmp_path, capsys):
    """A pair with an all-black occ mask (no occluded pixels) reports null
    for epe_unmatched — not the non-standard NaN token — and does not
    poison the run aggregate (which averages over pairs that HAVE the
    split)."""
    from cuda_optical_flow_2_tpu.cli import evaluate
    from cuda_optical_flow_2_tpu.utils import viz

    h, w, velocity = 96, 128, (2.0, 1.0)
    frames = uio.synthetic_sequence(3, h, w, velocity=velocity, period=24)
    truth = np.full((h, w, 2), velocity, np.float32)
    fdir = tmp_path / "final" / "alley_1"
    gdir = tmp_path / "flow" / "alley_1"
    odir = tmp_path / "occ" / "alley_1"
    for d in (fdir, gdir, odir):
        d.mkdir(parents=True)
    # pair 1: no occluded pixels at all; pair 2: a quarter-width band
    masks = [np.zeros((h, w), np.uint8), np.zeros((h, w), np.uint8)]
    masks[1][:, : w // 4] = 255
    for t in range(3):
        viz.write_png(str(fdir / f"frame_{t + 1:04d}.png"), frames[t])
        if t < 2:
            uio.write_flo(str(gdir / f"frame_{t + 1:04d}.flo"), truth)
            viz.write_png(str(odir / f"frame_{t + 1:04d}.png"), masks[t])

    evaluate.main([
        "--dataset", str(tmp_path), "--levels", "2", "--window", "9",
        "--no-pallas", "--margin", "12",
    ])
    out = capsys.readouterr().out
    assert "NaN" not in out  # strict JSON everywhere
    lines = [json.loads(l) for l in out.splitlines()]
    agg = lines[-1]
    # pair 1's empty occluded side is null per-pair, filtered from the agg
    assert lines[0]["epe_unmatched"] is None
    assert isinstance(agg["epe_unmatched"], float)
    assert np.isfinite(agg["epe_unmatched"])


def test_eval_cli_refine_penalty_flags(tmp_path, capsys):
    """--refine-penalty/--refine-alpha reach the DIS config; non-dis
    families and presets reject them rather than silently dropping."""
    from cuda_optical_flow_2_tpu.cli import evaluate

    data = tmp_path / "data"
    data.mkdir()
    _write_dataset_flat(data, n_frames=2, h=64, w=96, velocity=(1.0, 0.0))
    evaluate.main([
        "--dataset", str(data), "--model", "dis", "--levels", "2",
        "--window", "9", "--no-pallas", "--margin", "12",
        "--refine-penalty", "charbonnier", "--refine-alpha", "40.0",
    ])
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    assert lines[-1]["epe_mean"] < 0.5
    with pytest.raises(SystemExit):
        evaluate.main([
            "--dataset", str(data), "--model", "lk",
            "--refine-penalty", "charbonnier",
        ])
    capsys.readouterr()
    with pytest.raises(SystemExit):
        evaluate.main([
            "--dataset", str(data), "--preset", "dis_realtime",
            "--refine-alpha", "40.0",
        ])
    capsys.readouterr()


def test_eval_cli_family_mismatched_knob_errors(tmp_path):
    """An explicitly-passed knob the selected family lacks errors instead
    of silently vanishing (--window-weights with hs used to be dropped)."""
    from cuda_optical_flow_2_tpu.cli import evaluate

    with pytest.raises(SystemExit) as exc:
        evaluate.main([
            "--dataset", str(tmp_path), "--model", "hs",
            "--window-weights", "tri",
        ])
    assert exc.value.code == 2


def test_eval_cli_fill_occlusions_improves_unmatched(tmp_path, capsys):
    """--fill-occlusions (round 5): bidirectional flow + cycle-check mask +
    side-aware fill before scoring.  On a Sintel-layout layered scene with
    TRUE flow/occ truth, the filled run's epe_unmatched improves over the
    plain run while epe_matched stays put (the fill cannot touch matched
    pixels where the detector agrees)."""
    from cuda_optical_flow_2_tpu.cli import evaluate
    from cuda_optical_flow_2_tpu.utils import viz
    from cuda_optical_flow_2_tpu.utils.layered import Layer, layered_scene

    h, w = 192, 256
    sc = layered_scene(
        h, w, bg_flow=(0.5, 0.5),
        layers=[
            Layer("disk", (70.0, 80.0), 34.0, (2.5, -1.5)),
            Layer("disk", (120.0, 180.0), 30.0, (-1.5, 2.5)),
        ],
        seed=5,
    )
    fdir = tmp_path / "final" / "seq"
    gdir = tmp_path / "flow" / "seq"
    odir = tmp_path / "occ" / "seq"
    for d in (fdir, gdir, odir):
        d.mkdir(parents=True)
    for t, frame in enumerate((sc.prev, sc.nxt), start=1):
        viz.write_png(
            str(fdir / f"frame_{t:04d}.png"),
            np.repeat(
                np.clip(frame, 0, 255)[..., None].astype(np.uint8), 3, -1
            ),
        )
    uio.write_flo(str(gdir / "frame_0001.flo"), sc.flow)
    viz.write_png(
        str(odir / "frame_0001.png"), (sc.occ * 255).astype(np.uint8)
    )

    def run(extra):
        evaluate.main([
            "--dataset", str(tmp_path), "--model", "tvl1", "--levels", "4",
            "--no-pallas", "--margin", "16", *extra,
        ])
        return json.loads(capsys.readouterr().out.splitlines()[-1])

    plain = run([])
    filled = run(["--fill-occlusions"])
    assert filled["fill_occlusions"] is True
    assert filled["epe_unmatched"] < plain["epe_unmatched"] - 0.05, (
        filled["epe_unmatched"], plain["epe_unmatched"]
    )
    assert abs(filled["epe_matched"] - plain["epe_matched"]) < 0.05


def test_eval_cli_fill_occlusions_rejects_streaming(tmp_path, capsys):
    from cuda_optical_flow_2_tpu.cli import evaluate

    with pytest.raises(SystemExit):
        evaluate.main([
            "--dataset", str(tmp_path), "--streaming", "--fill-occlusions",
        ])
    capsys.readouterr()
