"""Worker process for the 2-process multi-host smoke test (test_multihost.py).

Run as: python tests/multihost_worker.py <process_id> <num_processes> <port>

Each process brings 2 virtual CPU devices, joins the jax.distributed
coordinator, builds the global mesh, feeds its OWN frame pairs into the DP
helper, and checks its addressable output shards against the locally
computed unsharded flow.  Prints MULTIHOST_OK on success.
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])

flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = (
    flags + " --xla_force_host_platform_device_count=2"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

import cuda_optical_flow_2_tpu as of  # noqa: E402
from cuda_optical_flow_2_tpu.parallel import multihost  # noqa: E402
from cuda_optical_flow_2_tpu.utils import io  # noqa: E402


def main() -> None:
    multihost.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    multihost.initialize()  # idempotent second call must be a no-op
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.local_device_count() == 2
    assert jax.device_count() == 2 * nproc

    mesh = multihost.make_global_mesh()
    assert mesh.shape["batch"] == 2 * nproc
    mesh2 = multihost.make_global_mesh(space_axis="space")
    assert mesh2.shape == {"batch": nproc, "space": 2}

    global_batch = 2 * nproc
    per, off = multihost.host_local_batch(global_batch, mesh)
    assert per == 2 and off == 2 * pid

    # Each host feeds frame pairs with a velocity derived from the GLOBAL
    # pair index, so shard placement mistakes change the answer.
    frames = [
        io.synthetic_sequence(2, 32, 48, velocity=(1.0 + (off + j), 0.0),
                              noise=0.0)
        for j in range(per)
    ]
    local_prev = np.stack([f[0] for f in frames]).astype(np.float32)
    local_nxt = np.stack([f[1] for f in frames]).astype(np.float32)

    cfg = of.LKConfig(levels=1, window=9, iterations=2, use_pallas=False)
    flow = multihost.sharded_flow_from_local(local_prev, local_nxt, cfg, mesh)
    assert flow.shape == (global_batch, 32, 48, 2)

    want = np.asarray(
        of.pyramidal_lk_jit(local_prev, local_nxt, cfg)
    )
    shards = sorted(flow.addressable_shards, key=lambda s: s.index[0].start)
    got = np.concatenate([np.asarray(s.data) for s in shards])
    np.testing.assert_allclose(got, want, atol=1e-5)

    print("MULTIHOST_OK", flush=True)


if __name__ == "__main__":
    main()
