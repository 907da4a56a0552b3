"""Observability shim (C8/R44): per-stage latency + throughput metrics.

Reference ground truth: both demos print per-stage milliseconds and FPS
every frame — `V=%.2f T=%.2f D=%.2f A=%.2f F=%.2f`
(/root/reference/src/SinglePsramBuffer480x480.cpp:171-175) and
`U C D V A F` (/root/reference/src/DoublePsramBuffer480x480.cpp:209-214)
— timed by the lap timer Elapsed (/root/reference/src/Elapsed.h:3-26).

Spark-native translation:
- `Observation` (df.observe) attaches aggregate metrics to a plan and
  collects them with the action that runs it — zero extra jobs.
- `StageTimer` is the Elapsed analog: named laps, ms per lap, and a
  reference-style one-line summary with rows/s as the FPS.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed(df: DataFrame, name: str = "metrics") -> tuple[DataFrame, Observation]:
    """Attach row-count/observation metrics to a DataFrame. After any
    action on the returned frame, `obs.get` yields the metrics without
    a second pass (the R44 printf, minus the second scan)."""
    obs = Observation(name)
    return df.observe(obs, F.count(F.lit(1)).alias("rows")), obs


@dataclass
class StageTimer:
    """Named lap timer; `lap()` resets on read like Elapsed::elapsedMs
    (/root/reference/src/Elapsed.h:11-22)."""

    laps: dict[str, float] = field(default_factory=dict)
    _t0: float = field(default_factory=time.perf_counter)

    def lap(self, name: str) -> float:
        now = time.perf_counter()
        ms = (now - self._t0) * 1000.0
        self.laps[name] = self.laps.get(name, 0.0) + ms
        self._t0 = now
        return ms

    def summary(self, rows: int | None = None) -> str:
        """Reference-style single line: per-stage ms + total + rows/s."""
        parts = [f"{k}={v:.2f}" for k, v in self.laps.items()]
        total_ms = sum(self.laps.values())
        parts.append(f"A={total_ms:.2f}")
        if rows is not None and total_ms > 0:
            parts.append(f"F={rows / (total_ms / 1000.0):.2f}")  # rows/s ≙ FPS
        return " ".join(parts)
