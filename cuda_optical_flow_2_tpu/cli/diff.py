"""Per-stage A/B diff CLI — the reference's comment-swap debug workflow
(main.cu:199-261) as a command.

Runs every stage of the chosen model family through the requested backends
from identical canonical inputs and prints per-stage max/mean absolute
differences (see utils/debug.py).

    python -m cuda_optical_flow_2_tpu.cli.diff --model fb --size 256x64
    python -m cuda_optical_flow_2_tpu.cli.diff --model lk \
        --backends pallas banded oracle --frames 'seq/*.ppm'
"""

from __future__ import annotations

import argparse
import glob

import numpy as np


def main(argv=None) -> None:
    from cuda_optical_flow_2_tpu.cli import apply_platform_env

    apply_platform_env()
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument(
        "--model", choices=("lk", "hs", "fb", "tvl1", "dis"), default="lk"
    )
    ap.add_argument("--size", default="256x64", help="HxW for synthetic input")
    ap.add_argument("--velocity", type=float, nargs=2, default=(2.0, 1.0))
    ap.add_argument(
        "--frames", default=None,
        help="glob of two frames to diff on instead of synthetic input",
    )
    ap.add_argument("--levels", type=int, default=2)
    ap.add_argument("--iterations", type=int, default=None)
    ap.add_argument("--window", type=int, default=9)
    ap.add_argument(
        "--backends", nargs="+", default=("pallas", "banded"),
        help="backends to diff against the baseline (pallas banded oracle; "
        "the end-to-end flow stage also accepts 'sharded' for a real-mesh "
        "shard_map comparison)",
    )
    ap.add_argument("--baseline", default="xla")
    ap.add_argument("--n-bands", type=int, default=4)
    ap.add_argument(
        "--stages", nargs="+", default=None, help="restrict to these stages"
    )
    ap.add_argument("--cpu", action="store_true", help="force the CPU platform")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from cuda_optical_flow_2_tpu.utils import io
    from cuda_optical_flow_2_tpu.utils.debug import format_report, stage_report

    if args.frames:
        paths = sorted(glob.glob(args.frames))
        if len(paths) < 2:
            raise SystemExit(f"need >= 2 frames, matched {len(paths)}")
        imgs = [io.read_image(p) for p in paths[:2]]
        imgs = [
            i.astype(np.float32).mean(-1) if i.ndim == 3 else i.astype(np.float32)
            for i in imgs
        ]
        prev, nxt = imgs
    else:
        h, w = (int(t) for t in args.size.split("x"))
        seq = io.synthetic_sequence(
            2, h, w, velocity=tuple(args.velocity), noise=0.0
        )
        prev, nxt = seq[0].astype(np.float32), seq[1].astype(np.float32)

    if args.model == "fb":
        from cuda_optical_flow_2_tpu.models.farneback import FBConfig

        if args.window % 2 == 0:
            # Same contract as the LK path (LKConfig raises): silently
            # bumping to window+1 would report diffs for a configuration
            # the user didn't ask for.
            ap.error(f"--window must be odd, got {args.window}")
        cfg = FBConfig(
            levels=args.levels,
            iterations=args.iterations if args.iterations is not None else 2,
            winsize=args.window,
        )
    elif args.model == "hs":
        from cuda_optical_flow_2_tpu.models.horn_schunck import HSConfig

        it = args.iterations if args.iterations is not None else 20
        cfg = HSConfig(levels=args.levels, iterations=it)
    elif args.model == "tvl1":
        from cuda_optical_flow_2_tpu.models.tvl1 import TVL1Config

        it = args.iterations if args.iterations is not None else 15
        cfg = TVL1Config(levels=args.levels, iterations=it)
    elif args.model == "dis":
        from cuda_optical_flow_2_tpu.models.dis import DISConfig

        if args.window % 2 == 0:
            ap.error(f"--window must be odd, got {args.window}")
        cfg = DISConfig(
            levels=args.levels,
            window=args.window,
            iterations=args.iterations if args.iterations is not None else 2,
        )
    else:
        import cuda_optical_flow_2_tpu as of

        cfg = of.LKConfig(
            levels=args.levels,
            window=args.window,
            iterations=args.iterations if args.iterations is not None else 2,
        )

    report = stage_report(
        prev, nxt, cfg,
        backends=tuple(args.backends),
        baseline=args.baseline,
        n_bands=args.n_bands,
        stages=tuple(args.stages) if args.stages else None,
    )
    print(format_report(report))


if __name__ == "__main__":
    main()
