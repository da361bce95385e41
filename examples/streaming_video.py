"""Streaming example: carried device state + native prefetching frame source.

Run: python examples/streaming_video.py
"""
import numpy as np

import cuda_optical_flow_2_tpu as of
from cuda_optical_flow_2_tpu.models import streaming
from cuda_optical_flow_2_tpu.utils.native import FrameStream


def main():
    config = of.LKConfig(levels=3, window=11, temporal_kernel="gauss3")
    with FrameStream.synthetic(10, 240, 320, vx=2.0, vy=1.0) as src:
        for i, flow in streaming.process_sequence((f for _, f in src), config):
            f = np.asarray(flow)
            print(f"frame {i}: median |flow| = "
                  f"{np.median(np.hypot(f[..., 0], f[..., 1])):.3f}")


if __name__ == "__main__":
    main()
