"""Time-series densification: fill the empty buckets a raw event
stream never emits.

Telemetry consumers (rate alerting, charting, window features) need
one row per (key, bucket) even when nothing happened — a gap IS the
signal. The reference aggregates only buckets that occur
(``src/datastore.py`` summary queries group what exists); this
operator materializes the gaps and carries the last observation
forward, the standard densify/LOCF pair (Spark has no native
equivalent; DuckDB spells it ``generate_series`` + ``last_value
IGNORE NULLS``, which is exactly the parity oracle).

Scale shape:

* the input is reduced FIRST — one groupBy (key, bucket) over the raw
  stream is the only corpus-sized shuffle; everything after operates
  on the aggregate (keys × active buckets);
* the spine (every bucket in each key's [min, max] span) is a
  ``sequence()`` explode off the per-key extent row — generated, not
  shuffled, and its size is the OUTPUT size (intrinsic to
  densification; callers bound it with the bucket width);
* gap filling is one window per key ordered by bucket
  (``last(ignorenulls)``) — partitioned by the same high-cardinality
  key as everything else, so parallelism holds at 1000 executors.

Buckets are exported as BIGINT epoch seconds (engine-portable: no
timestamp/timezone comparator hazards), and value sums as BIGINT
cents (the engine-wide exact-money convention, see
``queries.cents``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def bucket_epoch(ts: str | Column, seconds: int = 3600) -> Column:
    """Epoch-seconds bucket floor of a timestamp column: BIGINT,
    identical in any engine (``(epoch_us // seconds·10⁶) * seconds``).
    ``unix_micros`` needs a TIMESTAMP (not NTZ), so cast first — the
    parquet NTZ values are treated as UTC instants, matching DuckDB's
    ``epoch_us`` on the same files."""
    c = F.col(ts) if isinstance(ts, str) else ts
    us = F.unix_micros(c.cast("timestamp"))
    return (F.floor(us / (seconds * 1_000_000)) * seconds).cast("long")


def densify(
    df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    value_cents: Column | None = None,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """One row per (key, bucket) across each key's observed time span.

    Returns ``(key, bucket, n, sum_v_c, locf_v_c)``:

    * ``n`` — events in the bucket (0 for generated gap rows),
    * ``sum_v_c`` — exact BIGINT sum of ``value_cents`` in the bucket
      (NULL for gaps: "no data" and "sums to zero" stay distinct),
    * ``locf_v_c`` — ``sum_v_c`` with gaps filled by the last
      observation carried forward (NULL until the key's first
      observed bucket — there is nothing to carry).

    ``value_cents`` defaults to counting semantics only (both value
    columns omitted from the output when None).
    """
    key = F.col(key_col)
    b = bucket_epoch(ts_col, bucket_seconds).alias("bucket")
    aggs = [F.count(F.lit(1)).alias("n")]
    if value_cents is not None:
        aggs.append(F.sum(value_cents).alias("sum_v_c"))
    agg = df.groupBy(key.alias("key"), b).agg(*aggs)

    spine = (
        agg.groupBy("key")
        .agg(F.min("bucket").alias("b0"), F.max("bucket").alias("b1"))
        .select(
            "key",
            F.explode(
                F.sequence(F.col("b0"), F.col("b1"), F.lit(int(bucket_seconds)))
            ).alias("bucket"),
        )
    )
    out = (
        spine.join(agg, ["key", "bucket"], "left")
        .withColumn("n", F.coalesce(F.col("n"), F.lit(0)).cast("long"))
    )
    if value_cents is not None:
        w = (
            Window.partitionBy("key")
            .orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out = out.withColumn(
            "locf_v_c", F.last("sum_v_c", ignorenulls=True).over(w)
        )
    return out


def gap_islands(
    df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    bucket_seconds: int = 3600,
    min_buckets: int = 2,
) -> DataFrame:
    """Silence detection: maximal runs of ≥ ``min_buckets`` consecutive
    EMPTY buckets inside each key's observed span — the gaps-and-islands
    shape over the densified series. A stream that goes quiet for hours
    is an outage signal no per-bucket aggregate surfaces (the buckets
    simply don't exist until :func:`densify` materializes them).

    Returns ``(key, gap_start, gap_end, n_buckets)`` — bucket epochs of
    the run's first and last empty bucket, integer-exact end to end.
    The run grouping is the classic ``bucket/width − row_number``
    difference trick: consecutive empty buckets share one group
    anchor, computed under the same per-key window the LOCF fill
    already uses (no extra shuffle shape beyond densify's)."""
    dense = densify(df, key_col, ts_col=ts_col, bucket_seconds=bucket_seconds)
    empty = dense.filter(F.col("n") == 0)
    w = Window.partitionBy("key").orderBy("bucket")
    anchored = empty.withColumn(
        "anchor",
        (F.col("bucket") / bucket_seconds).cast("long") - F.row_number().over(w),
    )
    return (
        anchored.groupBy("key", "anchor")
        .agg(
            F.min("bucket").alias("gap_start"),
            F.max("bucket").alias("gap_end"),
            F.count(F.lit(1)).alias("n_buckets"),
        )
        .filter(F.col("n_buckets") >= min_buckets)
        .drop("anchor")
        .select("key", "gap_start", "gap_end", "n_buckets")
    )
