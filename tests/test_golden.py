"""Golden-field regression tests (BASELINE config 1).

The golden files pin the oracle's exact output on the 64x64 translating pair
at the time they were generated; any semantic drift in the oracle or the
JAX compat pipelines fails here.  Regenerate deliberately (script in the
repo history) only when a semantics change is intended and documented.
"""

import os

import numpy as np

import jax.numpy as jnp

from cuda_optical_flow_2_tpu.models import compat
from cuda_optical_flow_2_tpu.oracle import cpu_reference as cpu
from cuda_optical_flow_2_tpu.oracle import gpu_reference as gpu

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _load(name):
    return np.load(os.path.join(GOLDEN, name))


def test_oracle_cpu_matches_golden():
    prev, nxt = _load("pair_prev.npy"), _load("pair_next.npy")
    flows = cpu.calc_optical_flow_pyramid(
        cpu.gauss_pyramid(prev, 4), cpu.gauss_pyramid(nxt, 4), window=9
    )
    for k, f in enumerate(flows):
        want = _load(f"cpu_flow_L{k}.npy")
        np.testing.assert_array_equal(f, want, err_msg=f"level {k}")


def test_oracle_gpu_matches_golden():
    prev, nxt = _load("pair_prev.npy"), _load("pair_next.npy")
    flows = gpu.calc_opt_flow_pyramid(
        gpu.gauss_pyramid(prev, 4), gpu.gauss_pyramid(nxt, 4), window=19
    )
    for k, f in enumerate(flows):
        want = _load(f"gpu_flow_L{k}.npy")
        np.testing.assert_array_equal(f, want, err_msg=f"level {k}")


def test_compat_cpu_matches_golden():
    prev, nxt = _load("pair_prev.npy"), _load("pair_next.npy")
    flows = compat.pyramidal_lk_exact(
        jnp.asarray(prev), jnp.asarray(nxt), levels=4, profile="cpu"
    )
    for k, f in enumerate(flows):
        want = _load(f"cpu_flow_L{k}.npy")
        got = np.asarray(f)
        finite = np.isfinite(want).all(axis=-1)
        assert np.array_equal(finite, np.isfinite(got).all(axis=-1))
        np.testing.assert_allclose(
            got[finite], want[finite], rtol=1e-6, atol=1e-6, err_msg=f"level {k}"
        )
