"""Streaming API: carried pyramid state across a synthetic video sequence."""

import numpy as np

import jax.numpy as jnp

import cuda_optical_flow_2_tpu as of
from cuda_optical_flow_2_tpu.models import streaming
from cuda_optical_flow_2_tpu.utils import io


def test_streaming_matches_pairwise():
    frames = io.synthetic_sequence(4, 96, 128, velocity=(1.0, 0.5))
    cfg = of.LKConfig(levels=2, window=9, temporal_kernel="gauss3", use_pallas=False)
    flows = {i: np.asarray(f) for i, f in streaming.process_sequence(frames, cfg)}
    assert sorted(flows) == [1, 2, 3]
    for i in (1, 2, 3):
        pair = np.asarray(
            of.pyramidal_lk(
                jnp.asarray(frames[i - 1].astype(np.float32)),
                jnp.asarray(frames[i].astype(np.float32)),
                cfg,
            )
        )
        np.testing.assert_allclose(flows[i], pair, atol=1e-5)


def test_streaming_recovers_velocity():
    frames = io.synthetic_sequence(3, 96, 128, velocity=(2.0, 1.0))
    cfg = of.LKConfig(
        levels=3, window=11, temporal_kernel="gauss3", iterations=2, use_pallas=False
    )
    for _, flow in streaming.process_sequence(frames, cfg):
        inner = np.asarray(flow)[24:-24, 24:-24]
        assert abs(np.median(inner[..., 0]) - 2.0) < 0.2
        assert abs(np.median(inner[..., 1]) - 1.0) < 0.2


def test_flow_state_checkpoints_with_orbax(tmp_path):
    """The carried FlowState is a pytree, so checkpoint/resume is plain orbax
    (the reference has no checkpointing at all — SURVEY.md section 5)."""
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    import cuda_optical_flow_2_tpu as of
    from cuda_optical_flow_2_tpu.models import streaming

    cfg = of.LKConfig(levels=2, window=9, use_pallas=False)
    frame0 = jnp.asarray(np.arange(32 * 40, dtype=np.float32).reshape(32, 40))
    state = streaming.init_state(frame0, cfg)

    path = tmp_path / "ckpt"
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tuple(state.pyramid))
        restored = ckptr.restore(path, tuple(state.pyramid))
    restored_state = streaming.FlowState(tuple(restored))
    for a, b in zip(state.pyramid, restored_state.pyramid):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # resuming from the restored state produces the same flow
    frame1 = frame0 + 1.0
    _, flow_a = streaming.step(streaming.init_state(frame0, cfg), frame1, cfg)
    _, flow_b = streaming.step(restored_state, frame1, cfg)
    np.testing.assert_allclose(np.asarray(flow_a), np.asarray(flow_b), atol=1e-6)


def test_streaming_hs_matches_pairwise():
    """The streaming layer is model-generic: HSConfig dispatches to HS."""
    from cuda_optical_flow_2_tpu.models import horn_schunck as hs

    frames = io.synthetic_sequence(3, 96, 128, velocity=(1.0, 0.5))
    cfg = hs.HSConfig(alpha=8.0, iterations=40, levels=2, use_pallas=False)
    flows = {i: np.asarray(f) for i, f in streaming.process_sequence(frames, cfg)}
    assert sorted(flows) == [1, 2]
    for i in (1, 2):
        pair = np.asarray(
            hs.pyramidal_hs(
                jnp.asarray(frames[i - 1].astype(np.float32)),
                jnp.asarray(frames[i].astype(np.float32)),
                cfg,
            )
        )
        np.testing.assert_allclose(flows[i], pair, atol=1e-5)


def test_streaming_fb_matches_pairwise():
    from cuda_optical_flow_2_tpu.models import farneback as fb

    frames = io.synthetic_sequence(3, 96, 128, velocity=(1.0, 0.5))
    cfg = fb.FBConfig(levels=2, iterations=2, use_pallas=False)
    flows = {i: np.asarray(f) for i, f in streaming.process_sequence(frames, cfg)}
    assert sorted(flows) == [1, 2]
    for i in (1, 2):
        pair = np.asarray(
            fb.pyramidal_farneback(
                jnp.asarray(frames[i - 1].astype(np.float32)),
                jnp.asarray(frames[i].astype(np.float32)),
                cfg,
            )
        )
        np.testing.assert_allclose(flows[i], pair, atol=1e-5)
