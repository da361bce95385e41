"""Bilateral prefilter (G18) cost at the REFERENCE_GPU operating point.

VERDICT r1 item 4: the prefilter is live in the reference's hot loop
(main.cu:240: ww=wh=9, sigmaS=2, sigmaB=10) yet had no TPU performance row.
Measures, at 1080p on one chip:

  1. the standalone XLA bilateral (81-tap unrolled shift/exp loop);
  2. the standalone Pallas bilateral kernel (kernels/bilateral_tap.py),
     when present;
  3. end-to-end PAPER_1080P LK with prefilter off / XLA / Pallas.

Run: python docs/studies/bilateral_study.py
"""

import numpy as np

import jax
import jax.numpy as jnp

from cuda_optical_flow_2_tpu import LKConfig, pyramidal_lk
from cuda_optical_flow_2_tpu.config import BilateralConfig
from cuda_optical_flow_2_tpu.ops.bilateral import bilateral_filter
from cuda_optical_flow_2_tpu.utils import io
from cuda_optical_flow_2_tpu.utils.profiling import device_time

H, W = 1080, 1920


def main() -> None:
    print(f"backend: {jax.default_backend()}", flush=True)
    frames = io.synthetic_sequence(2, H, W, velocity=(2.0, 1.0))
    prev = jnp.asarray(frames[0], jnp.float32)
    nxt = jnp.asarray(frames[1], jnp.float32)
    pf = BilateralConfig()  # 9x9, sigmaS=2, sigmaB=10 (main.cu:236-240)

    t = device_time(
        lambda x: bilateral_filter(
            x, None, pf.window, pf.sigma_spatial, pf.sigma_range
        ),
        prev,
        iters=10,
    )
    print(f"standalone bilateral XLA 9x9 @1080p: {t*1e3:.3f} ms", flush=True)

    try:
        from cuda_optical_flow_2_tpu.kernels import bilateral_tap

        tk = device_time(
            lambda x: bilateral_tap.bilateral_kernel(
                x, pf.window, pf.sigma_spatial, pf.sigma_range
            ),
            prev,
            iters=10,
        )
        print(f"standalone bilateral Pallas 9x9 @1080p: {tk*1e3:.3f} ms",
              flush=True)
    except ImportError:
        print("no Pallas bilateral kernel yet", flush=True)

    for name, cfg in (
        ("prefilter OFF ", LKConfig(levels=5, window=15)),
        ("prefilter ON  ", LKConfig(levels=5, window=15, prefilter=pf)),
    ):
        te = device_time(
            lambda p, n, c=cfg: pyramidal_lk(p, n, c), prev, nxt, iters=10
        )
        print(
            f"PAPER_1080P {name}: {te*1e3:.3f} ms/frame = {1/te:.1f} fps",
            flush=True,
        )


if __name__ == "__main__":
    main()
