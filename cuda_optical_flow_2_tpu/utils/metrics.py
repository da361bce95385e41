"""Flow-quality metrics.

The reference has no quantitative evaluation at all (its test strategy is
visual inspection, SURVEY.md section 4); these metrics back the framework's
accuracy gates: endpoint error against ground truth or against the oracle,
and angular error for direction-sensitive comparisons.
"""

from __future__ import annotations

import numpy as np

__all__ = ["epe", "mean_epe", "angular_error", "flow_stats"]


def epe(flow: np.ndarray, truth: np.ndarray) -> np.ndarray:
    """Per-pixel endpoint error |flow - truth| (..., H, W)."""
    d = np.asarray(flow, np.float64) - np.asarray(truth, np.float64)
    return np.hypot(d[..., 0], d[..., 1])


def mean_epe(
    flow: np.ndarray, truth: np.ndarray, margin: int = 0
) -> float:
    """Mean EPE over the interior (``margin`` pixels cropped per side)."""
    e = epe(flow, truth)
    if margin:
        e = e[..., margin:-margin, margin:-margin]
    return float(np.mean(e))


def angular_error(flow: np.ndarray, truth: np.ndarray) -> np.ndarray:
    """Barron angular error (radians) between flow and truth, per pixel."""
    f = np.asarray(flow, np.float64)
    t = np.asarray(truth, np.float64)
    num = f[..., 0] * t[..., 0] + f[..., 1] * t[..., 1] + 1.0
    den = np.sqrt(f[..., 0] ** 2 + f[..., 1] ** 2 + 1.0) * np.sqrt(
        t[..., 0] ** 2 + t[..., 1] ** 2 + 1.0
    )
    return np.arccos(np.clip(num / den, -1.0, 1.0))


def flow_stats(flow: np.ndarray) -> dict:
    """Summary statistics of a flow field (finite fraction, magnitudes)."""
    f = np.asarray(flow, np.float64)
    mag = np.hypot(f[..., 0], f[..., 1])
    finite = np.isfinite(mag)
    return {
        "finite_fraction": float(finite.mean()),
        "mean_magnitude": float(mag[finite].mean()) if finite.any() else float("nan"),
        "p99_magnitude": float(np.percentile(mag[finite], 99)) if finite.any() else float("nan"),
    }
