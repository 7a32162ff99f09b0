"""Accumulator-backed parse/route metrics (SURVEY.md A7 / R6).

The reference tallies pages/tables/logcodes across workers and prints
progress summaries (``src/parallel_pdf_parser.py:221-242``). The Spark
analog is ``Observation`` metrics: aggregate expressions attached to
the plan with ``df.observe(...)`` that are computed *during* the write
action — no extra pass over the data — and surfaced to the driver,
which dumps them to a metrics JSON next to the sink manifests.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed(df: DataFrame) -> tuple[DataFrame, Observation]:
    """Attach parse/route counters to the plan."""
    obs = Observation("parse_route_metrics")
    df = df.observe(
        obs,
        F.count(F.lit(1)).alias("rows_total"),
        F.sum(F.when(F.col("matched"), 1).otherwise(0)).alias("rows_matched"),
        F.sum(F.when(F.col("route") == "sink_unmatched", 1).otherwise(0)).alias("rows_unmatched"),
        F.approx_count_distinct("conv_id").alias("convs_approx"),
    )
    return df, obs


def get_safe(obs: Observation) -> dict:
    """Observation.get raises when the observe node was optimized away
    (e.g. AQE empty-relation propagation on zero-row input) — treat
    that as all-zero metrics."""
    try:
        return dict(obs.get)
    except Exception:
        return {"rows_total": 0, "rows_matched": 0, "rows_unmatched": 0, "convs_approx": 0}


def dump(obs: Observation, path: str, extra: dict | None = None) -> dict:
    metrics = get_safe(obs)
    metrics.update(extra or {})
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(metrics, f, indent=2, default=str)
    return metrics
