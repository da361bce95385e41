"""Sharded batching tests on the virtual 8-device CPU mesh (BASELINE config 5)."""

import numpy as np

import jax
import jax.numpy as jnp

import cuda_optical_flow_2_tpu as of
from cuda_optical_flow_2_tpu import parallel
from conftest import make_translating_pair


def test_mesh_has_8_virtual_devices():
    assert len(jax.devices()) == 8


def test_sharded_matches_unsharded():
    prev, nxt = make_translating_pair(64, 64, dx=1, dy=0)
    p = jnp.asarray(prev[..., 0].astype(np.float32))
    n = jnp.asarray(nxt[..., 0].astype(np.float32))
    pb = jnp.stack([p] * 8)
    nb = jnp.stack([n] * 8)
    cfg = of.LKConfig(levels=2, window=9, use_pallas=False)
    mesh = parallel.make_mesh()
    flow = parallel.sharded_pyramidal_lk(pb, nb, cfg, mesh)
    assert flow.shape == (8, 64, 64, 2)
    # output really is sharded over the batch axis
    assert len(flow.sharding.device_set) == 8
    single = of.pyramidal_lk(p, n, cfg)
    for i in range(8):
        np.testing.assert_allclose(
            np.asarray(flow[i]), np.asarray(single), atol=1e-5
        )


def test_batch_not_divisible_raises():
    mesh = parallel.make_mesh()
    x = jnp.zeros((3, 16, 16))
    try:
        parallel.sharded_pyramidal_lk(x, x, of.LKConfig(levels=1, use_pallas=False), mesh)
        raised = False
    except ValueError:
        raised = True
    assert raised
