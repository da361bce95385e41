"""Every example must run end-to-end on the CPU test mesh."""

import runpy
import sys
import os

EXAMPLES = [
    "basic",
    "streaming_video",
    "sharded_batch",
    "spatial_tp",
    "flow_quality",
    "gradient_alignment",
    "frame_interpolation",
    "learned_refinement",
]


def test_examples_run():
    root = os.path.join(os.path.dirname(__file__), "..", "examples")
    for name in EXAMPLES:
        runpy.run_path(os.path.join(root, f"{name}.py"), run_name="__main__")
