"""Per-sink aggregates, with a salted two-phase variant for skew.

The reference's only real aggregates are counters and the BLER ratio
(SURVEY.md §2.4); the new engine's per-sink aggregates are the
north-star set: counts by ``conv_id``, ``role``, ``tool``, and hourly
time bucket. All are stock hash aggregates — Catalyst already does
partial (map-side) + final aggregation, so a count by a low-cardinality
key like ``role`` shuffles only one row per partition per key.

Skew: for **algebraic** aggregates (count/sum/min/max), Spark's
map-side partial aggregation already neutralizes a hot key — each task
ships at most one partial row per key, so a conversation with 10^8
turns reaches its reducer as ~n_tasks rows, not 10^8. Salting every
row would *destroy* that combine (keys × salt_buckets partials), so
``per_sink_aggregates`` uses plain groupBy. ``salted_count`` exists
for the cases partial aggregation can't save: holistic aggregates
(collect_list/percentile), or keyed joins where AQE's skew splitting
(enabled in the session) doesn't apply. The skew tests prove it exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def counts_by(df: DataFrame, *keys: str) -> DataFrame:
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))


def counts_by_hour(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Hourly time-bucket counts (F9 → real timestamp semantics)."""
    return (
        df.groupBy(F.date_trunc("hour", F.col(ts_col)).alias("hour"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def salted_count(df: DataFrame, key: str, salt_buckets: int = 32) -> DataFrame:
    """Two-phase skew-safe count by ``key``.

    Phase 1 groups by ``(key, salt)`` where salt spreads each key's
    rows over ``salt_buckets`` reducers; phase 2 sums the partials.
    Exact for algebraic aggregates (count/sum/min/max).
    """
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets))
    )
    partial = salted.groupBy(key, "_salt").agg(F.count(F.lit(1)).alias("_pn"))
    return partial.groupBy(key).agg(F.sum("_pn").alias("n"))


def per_sink_aggregates(routed: DataFrame) -> dict[str, DataFrame]:
    """The north-star aggregate set over the routed fact."""
    return {
        "by_conv": counts_by(routed, "conv_id"),
        "by_role": counts_by(routed, "route", "role"),
        "by_tool": counts_by(routed.filter(F.col("tool").isNotNull()), "route", "tool"),
        "by_hour": routed.groupBy(
            "route", F.date_trunc("hour", "ts").alias("hour")
        ).agg(F.count(F.lit(1)).alias("n")),
    }
