"""BASELINE config 5 regression hunt: why does the 64-pair 1080p batch run
363 fps/chip when single-pair runs 462 fps?

VERDICT r1 item 3.  Hypothesis: resident-pyramid HBM pressure — a batch-64
program keeps 64 full 1080p pyramids plus every level's intermediates live,
and XLA's buffer assignment starts spilling/serializing.  Measures per-pair
device time at batch 1/4/16/32/64 (whole-batch jit) and a CHUNKED mode
(lax.map over sub-batches, which serializes chunks and caps peak memory at
chunk size) at 64 with chunk 4/8/16.

Run: python docs/studies/batch64_study.py
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp

from cuda_optical_flow_2_tpu import LKConfig, pyramidal_lk
from cuda_optical_flow_2_tpu.utils import io
from cuda_optical_flow_2_tpu.utils.profiling import device_time

H, W = 1080, 1920


def chunked_flow(prev_b, next_b, config, chunk: int):
    """Batch flow with peak memory capped at ``chunk`` pairs (lax.map)."""
    b = prev_b.shape[0]
    assert b % chunk == 0
    pc = prev_b.reshape(b // chunk, chunk, H, W)
    nc = next_b.reshape(b // chunk, chunk, H, W)
    f = lambda pn: pyramidal_lk(pn[0], pn[1], config)  # noqa: E731
    out = jax.lax.map(f, (pc, nc))
    return out.reshape(b, H, W, 2)


def main() -> None:
    print(f"backend: {jax.default_backend()}", flush=True)
    cfg = LKConfig(levels=5, window=15)  # PAPER_1080P
    frames = io.synthetic_sequence(2, H, W, velocity=(2.0, 1.0))
    p1 = jnp.asarray(frames[0], jnp.float32)
    n1 = jnp.asarray(frames[1], jnp.float32)

    for b in (1, 4, 16, 32, 64):
        pb = jnp.broadcast_to(p1, (b, H, W)) + jnp.arange(b, dtype=jnp.float32)[:, None, None] * 1e-3
        nb = jnp.broadcast_to(n1, (b, H, W)) + jnp.arange(b, dtype=jnp.float32)[:, None, None] * 1e-3
        t = device_time(
            lambda x, y: pyramidal_lk(x, y, cfg), pb, nb, iters=6
        )
        print(
            f"whole-batch b={b:3d}: {t*1e3:8.2f} ms/step = "
            f"{b/t:7.1f} pairs/s/chip ({t*1e3/b:.3f} ms/pair)",
            flush=True,
        )

    b = 64
    pb = jnp.broadcast_to(p1, (b, H, W)) + jnp.arange(b, dtype=jnp.float32)[:, None, None] * 1e-3
    nb = jnp.broadcast_to(n1, (b, H, W)) + jnp.arange(b, dtype=jnp.float32)[:, None, None] * 1e-3
    for chunk in (4, 8, 16):
        t = device_time(
            functools.partial(chunked_flow, config=cfg, chunk=chunk),
            pb,
            nb,
            iters=6,
        )
        print(
            f"chunked b=64 chunk={chunk:2d}: {t*1e3:8.2f} ms/step = "
            f"{b/t:7.1f} pairs/s/chip ({t*1e3/b:.3f} ms/pair)",
            flush=True,
        )


if __name__ == "__main__":
    main()
