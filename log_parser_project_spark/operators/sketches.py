"""Mergeable distinct-count sketches (Datasketches HLL builtins).

The pattern that makes distinct-user metrics tractable at 100 TB:
materialize one small SKETCH per partition-of-time (day, hour) once,
then answer any coarser rollup — weekly, monthly, all-time, any
combination of days — by UNIONING the stored sketches instead of
re-scanning the fact table. ``hll_sketch_agg`` is an ordinary
partial-aggregating Catalyst aggregate (map-side combine, bytes-sized
state), unions are associative and loss-free (estimate over a union of
daily sketches ≡ estimate over one sketch of the whole range — pinned
exactly in tests), and the sketch table is millions of times smaller
than the fact it summarizes.

No DuckDB oracle can check the estimates (different sketch
implementation), so the contract query registers rows-only; pytest
pins (a) union-associativity exactly and (b) relative error vs the
exact distinct count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

LGK = 12  # 2^12 registers ≈ 1.6% relative standard error, 4 KB/sketch


def daily_sketches(
    df: DataFrame, key: str = "user_id", ts_col: str = "ts", lgk: int = LGK
) -> DataFrame:
    """One HLL sketch of ``key`` per day — the incremental build step
    (append today's row on each run; never rescan history)."""
    return df.groupBy(F.to_date(ts_col).alias("day")).agg(
        F.hll_sketch_agg(F.col(key).cast("string"), F.lit(lgk)).alias("sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def rollup_estimate(sketches: DataFrame, *group_cols: str) -> DataFrame:
    """Merge stored sketches to any coarser grain: distinct-key
    estimate per ``group_cols`` (or one global row). Touches only the
    sketch table — the fact table is never rescanned."""
    agg = [
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("distinct_est"),
        F.sum("n_rows").cast("long").alias("n_rows"),
    ]
    return sketches.groupBy(*group_cols).agg(*agg) if group_cols else sketches.agg(*agg)
