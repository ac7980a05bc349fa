"""Robust slope-method timing estimator shared by every benchmark script.

Methodology (CLAUDE.md / bench.py docstring): on this environment the chip sits
behind a high-latency tunnel where ``block_until_ready`` does not block and a
host fetch costs seconds of constant overhead, so per-step time is measured as
the slope between two scan-chain lengths: (t_long - t_short) / (k_long - k_short).

Estimator: earlier rounds took ``min`` over 2-3 slopes, which lets a single
anomalous repeat (e.g. a tunnel hiccup inflating one t_short, shrinking the
difference) set the recorded number — BENCH_r03 recorded 62.8 clips/s that way
against a true ~44. This module replaces it with the **median**, computed from
the medians of the raw short/long timings over >=5 repeats (robust to a hiccup
on either side of the subtraction), reports the per-repeat slope spread, and
flags repeats whose raw timings are inconsistent with the rest.
"""

from __future__ import annotations

import statistics
from dataclasses import dataclass, field
from typing import Callable, List


@dataclass
class SlopeEstimate:
    """Per-step time estimate plus the evidence behind it."""

    per_step: float  # robust estimate: slope of median timings (seconds/step)
    slopes: List[float]  # per-repeat slopes, for spread inspection
    t_shorts: List[float]
    t_longs: List[float]
    outliers: List[int] = field(default_factory=list)  # repeat indices flagged

    @property
    def spread(self) -> float:
        """Max - min of the per-repeat slopes (seconds/step)."""
        return max(self.slopes) - min(self.slopes) if self.slopes else 0.0

    def summary(self) -> str:
        parts = [
            f"per-step {self.per_step * 1e3:.2f} ms (median of {len(self.slopes)} repeats)",
            f"slopes {[round(s * 1e3, 2) for s in self.slopes]} ms",
            f"spread {self.spread * 1e3:.2f} ms",
        ]
        if self.outliers:
            parts.append(f"inconsistent repeats discarded: {self.outliers}")
        return ", ".join(parts)


def _median(xs: List[float]) -> float:
    return statistics.median(xs)


def robust_slope(
    time_short: Callable[[], float],
    time_long: Callable[[], float],
    k_short: int,
    k_long: int,
    repeats: int = 5,
) -> SlopeEstimate:
    """Run >=5 (t_short, t_long) repeats and return the median-based slope.

    ``time_short`` / ``time_long`` execute one timed chain of the respective
    length and return wall seconds. Repeats whose raw timing deviates from the
    across-repeat median by more than max(20%, 3x the median absolute
    deviation) on either chain length are excluded from the estimate (but kept
    in the record for the printed evidence).
    """
    if repeats < 5:
        repeats = 5
    t_shorts = []
    t_longs = []
    for _ in range(repeats):
        t_shorts.append(time_short())
        t_longs.append(time_long())

    def flag(xs: List[float]) -> set:
        med = _median(xs)
        mad = _median([abs(x - med) for x in xs])
        tol = max(0.2 * med, 3.0 * mad)
        return {i for i, x in enumerate(xs) if abs(x - med) > tol}

    bad = sorted(flag(t_shorts) | flag(t_longs))
    keep = [i for i in range(repeats) if i not in bad]
    if len(keep) < 3:  # too aggressive — fall back to using everything
        keep, bad = list(range(repeats)), []

    denom = k_long - k_short
    slopes = [(t_longs[i] - t_shorts[i]) / denom for i in range(repeats)]
    per_step = (
        _median([t_longs[i] for i in keep]) - _median([t_shorts[i] for i in keep])
    ) / denom
    return SlopeEstimate(
        per_step=per_step,
        slopes=slopes,
        t_shorts=t_shorts,
        t_longs=t_longs,
        outliers=bad,
    )
