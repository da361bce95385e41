"""Test configuration.

Tests run on CPU with a virtual 8-device mesh so the shard_map batching path
(BASELINE config 5) is testable without TPU hardware, per SURVEY.md section 4.
Must run before jax is imported anywhere.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# OF2_TEST_TPU=1 opts into the on-device test module (test_tpu_device.py):
# the platform is left as the session provides it (a real TPU) and x64 stays
# OFF (compiled Mosaic kernels require 32-bit staging — kernels.lk_fused.
# mosaic_ok).  Since the platform and x64 settings are PROCESS-GLOBAL, the
# rest of the suite cannot run CPU-pinned in the same session — the
# collection hook below skips every other module under this flag, so
# `OF2_TEST_TPU=1 pytest tests/` runs exactly the on-device tests rather
# than silently running CPU-designed tests (x64 compat, in-process CLI) on
# the chip.
_TPU_MODE = os.environ.get("OF2_TEST_TPU") == "1"

# Pin the env var too: CLI mains re-assert JAX_PLATFORMS via the config API
# (cli.apply_platform_env), so a session-level JAX_PLATFORMS=<tpu-plugin>
# would flip in-process CLI tests onto the real chip mid-suite.
if not _TPU_MODE:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

if not _TPU_MODE:
    # The environment may force-register a TPU plugin platform at interpreter
    # start (overriding JAX_PLATFORMS), so select CPU via the config API.
    jax.config.update("jax_platforms", "cpu")
    # float64 for the reference-exact compat solve (the reference solves in
    # double, OptFlowGpu.cu:1831).  Production code pins float32 explicitly.
    jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    if not _TPU_MODE:
        return
    skip = pytest.mark.skip(
        reason="OF2_TEST_TPU=1 runs only tests/test_tpu_device.py "
        "(platform/x64 pinning is process-global)"
    )
    for item in items:
        if item.fspath.basename != "test_tpu_device.py":
            item.add_marker(skip)


@pytest.fixture
def rng() -> np.random.Generator:
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _release_jit_executables():
    """Drop compiled-executable references after each test module.

    A full single-process suite run compiles many hundreds of XLA:CPU
    programs; keeping every LoadedExecutable alive for the whole run grows
    the LLVM JIT's code memory until a late large compile (the spatial-TP
    interpret-mode programs) segfaults inside backend_compile — reproducible
    at the same test in consecutive full runs, while the same test passes in
    isolation.  Cross-module cache reuse is negligible (each module compiles
    its own shapes/configs), so clearing per module costs little and bounds
    the per-process JIT footprint.
    """
    yield
    jax.clear_caches()


def make_translating_pair(
    h: int = 64, w: int = 64, dx: int = 1, dy: int = 0, seed: int = 0, period: int = 8
) -> tuple[np.ndarray, np.ndarray]:
    """Synthetic translating-checkerboard frame pair, (h, w, 3) uint8 each.

    BASELINE config 1's input: a checkerboard (smoothed so LK has usable
    gradients) shifted by an integer (dx, dy) between frames.
    """
    rng_ = np.random.default_rng(seed)
    big = np.zeros((h * 2, w * 2), dtype=np.float64)
    ys, xs = np.mgrid[0 : h * 2, 0 : w * 2]
    big = (
        127.0
        + 60.0 * np.sin(2 * np.pi * xs / period) * np.sin(2 * np.pi * ys / period)
        + 30.0 * np.sin(2 * np.pi * (xs + ys) / (period * 2.3))
        + rng_.normal(0, 2.0, big.shape)
    )
    big = np.clip(big, 0, 255)
    y0, x0 = h // 2, w // 2
    prev = big[y0 : y0 + h, x0 : x0 + w]
    nxt = big[y0 - dy : y0 - dy + h, x0 - dx : x0 - dx + w]
    prev3 = np.repeat(prev[..., None].astype(np.uint8), 3, axis=-1)
    next3 = np.repeat(nxt[..., None].astype(np.uint8), 3, axis=-1)
    return prev3, next3
