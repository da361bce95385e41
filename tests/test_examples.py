"""Every example must run end-to-end on the CPU test mesh.

One test per example so a failure in one does not mask the rest
(VERDICT r3 item 8).
"""

import runpy
import os

import pytest

EXAMPLES = [
    "basic",
    "streaming_video",
    "sharded_batch",
    "spatial_tp",
    "flow_quality",
    "gradient_alignment",
    "frame_interpolation",
    "learned_refinement",
    "live_stream",
    "scene_cut_recovery",
]


@pytest.mark.parametrize("name", EXAMPLES)
def test_example_runs(name):
    root = os.path.join(os.path.dirname(__file__), "..", "examples")
    runpy.run_path(os.path.join(root, f"{name}.py"), run_name="__main__")
