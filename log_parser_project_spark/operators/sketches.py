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


# ===========================================================================
# Mergeable quantile sketches: fixed-boundary histograms
# ===========================================================================
#
# The quantile sibling of the HLL pattern above. Boundaries are FIXED
# at build time, so per-day bucket counts are exactly mergeable (counts
# add; no re-scan, no approximation drift on merge): a rollup over any
# set of days gives bit-identical counts — and therefore bit-identical
# quantile estimates — to one histogram built over the whole range.
# Estimation error is bounded by bucket width, chosen once; contrast
# percentile_approx, whose state is neither materializable nor
# oracle-checkable. Bucket counts have an EXACT DuckDB oracle.


def equiwidth_boundaries(df: DataFrame, col: str, n_buckets: int = 128) -> list[float]:
    """``n_buckets - 1`` interior cut points spanning [min, max] — one
    tiny agg over the build input. Callers with skewed domains pass
    their own (e.g. log-spaced or rank-based) boundaries instead; only
    FIXEDNESS matters for mergeability, not uniformity."""
    lo, hi = df.agg(
        F.min(F.col(col).cast("double")), F.max(F.col(col).cast("double"))
    ).collect()[0]
    if lo is None or hi is None or hi <= lo:
        raise ValueError(f"column {col!r} has no finite range to bucket")
    step = (hi - lo) / n_buckets
    return [lo + step * i for i in range(1, n_buckets)]


def _bucket_expr(col: str, boundaries: list[float]):
    # bucket i = number of boundaries <= x: 0..len(boundaries), a pure
    # JVM higher-order function (no UDF, no per-row python)
    bnds = F.array(*[F.lit(float(b)) for b in boundaries])
    return F.size(F.filter(bnds, lambda b: b <= F.col(col).cast("double")))


def daily_histograms(
    df: DataFrame,
    col: str,
    boundaries: list[float],
    ts_col: str = "ts",
) -> DataFrame:
    """One (day, bucket) count table — the materialized sketch. Nulls
    set no state (same contract as the HLL build). Partial aggregation
    applies map-side, state is O(days x buckets) regardless of input
    rows."""
    return (
        df.filter(F.col(col).isNotNull())
        .groupBy(
            F.to_date(ts_col).alias("day"),
            _bucket_expr(col, boundaries).alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def quantile_rollup(
    hists: DataFrame,
    boundaries: list[float],
    qs: list[float],
    *group_cols: str,
) -> DataFrame:
    """Merge stored histograms to any coarser grain and estimate the
    ``qs`` quantiles per group by linear interpolation inside the
    containing bucket. Touches only the sketch table. Open-ended edge
    buckets clamp to their finite boundary (estimates are exact-bounded
    only inside [min, max] seen at build time)."""
    if not qs:
        raise ValueError("qs must name at least one quantile")
    from pyspark.sql import Window

    n = len(boundaries)
    lo_arr = F.array(F.lit(float(boundaries[0])), *[F.lit(float(b)) for b in boundaries])
    hi_arr = F.array(*[F.lit(float(b)) for b in boundaries], F.lit(float(boundaries[-1])))
    merged = hists.groupBy(*group_cols, "bucket").agg(F.sum("cnt").alias("cnt"))
    w = Window.partitionBy(*group_cols) if group_cols else Window.partitionBy(F.lit(1))
    cum = merged.select(
        *group_cols,
        "bucket",
        "cnt",
        F.sum("cnt").over(w.orderBy("bucket")).alias("cum"),
        F.sum("cnt").over(w).alias("total"),
    )
    out = []
    for q in qs:
        target = F.lit(float(q)) * F.col("total")
        # first bucket whose cumulative count reaches the target
        hit = (
            cum.filter(F.col("cum") >= target)
            .withColumn(
                "_rn",
                F.row_number().over(w.orderBy("bucket")),
            )
            .filter(F.col("_rn") == 1)
        )
        blo = F.element_at(lo_arr, F.col("bucket") + 1)
        bhi = F.element_at(hi_arr, F.col("bucket") + 1)
        frac = (target - (F.col("cum") - F.col("cnt"))) / F.col("cnt")
        est = blo + F.least(F.greatest(frac, F.lit(0.0)), F.lit(1.0)) * (bhi - blo)
        out.append(
            hit.select(
                *group_cols, F.lit(float(q)).alias("q"), est.alias("estimate"),
                F.col("total").cast("long").alias("n_rows"),
            )
        )
    res = out[0]
    for d in out[1:]:
        res = res.unionByName(d)
    return res.orderBy(*group_cols, "q") if group_cols else res.orderBy("q")


# ===========================================================================
# Mergeable heavy-hitter summaries: per-day top-k with residual bounds
# ===========================================================================
#
# The frequent-items sibling of the two patterns above (SpaceSaving /
# Misra-Gries turned inside-out for a columnar engine): materialize per
# day the EXACT counts of that day's top-``capacity`` keys plus one
# residual bound (the largest dropped count — everything the summary
# forgot about that day is <= it), then answer any coarser top-N by
# merging summaries instead of re-scanning the fact table. Counts are
# integers and the truncation rule is deterministic (count desc, key
# asc), so unlike a classic decrement-based MG sketch the WHOLE lossy
# computation replays bit-for-bit in any engine — the contract query
# has an exact DuckDB oracle even though the summary is lossy.
#
# Merged bounds: a key's true total lies in [lower, upper] where
# lower = sum of its stored counts and upper adds each absent day's
# residual. Any key whose true total exceeds the sum of all residual
# bounds is guaranteed present in the merged summary (it must have
# made the cut somewhere).


def daily_topk_summaries(
    df: DataFrame,
    key: str,
    ts_col: str = "ts",
    capacity: int = 32,
    day=None,
) -> tuple[DataFrame, DataFrame]:
    """(summaries, residuals): per day, the exact counts of the top
    ``capacity`` keys (count desc, key asc — deterministic), and per
    day the residual bound = the largest dropped count (0 when nothing
    was dropped). One count shuffle + one rank-limited window that
    plans a map-side WindowGroupLimit; summary size is
    O(days x capacity) regardless of input rows. ``day`` overrides the
    default calendar-date bucket (engine-portable callers pass an
    integer epoch-day expression)."""
    from pyspark.sql import Window

    if day is None:
        day = F.to_date(ts_col)
    daily = df.groupBy(day.alias("day"), key).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("day").orderBy(F.col("cnt").desc(), F.col(key).asc())
    ranked = daily.withColumn("_rn", F.row_number().over(w))
    kept = ranked.filter(F.col("_rn") <= capacity).drop("_rn")
    residuals = (
        ranked.groupBy("day")
        .agg(
            F.coalesce(
                F.max(F.when(F.col("_rn") > capacity, F.col("cnt"))), F.lit(0)
            )
            .cast("long")
            .alias("residual")
        )
    )
    return kept, residuals


def heavy_hitters_rollup(
    summaries: DataFrame,
    residuals: DataFrame,
    key: str,
    n: int = 10,
) -> DataFrame:
    """Merge stored daily summaries to a global top-``n``: per key,
    ``lower`` = the sum of its stored counts (every count it actually
    logged in a summary) and ``upper`` = lower + the residual bound of
    every day the key is ABSENT from (it may have been dropped there,
    but never with more than that day's residual). Ranked by lower
    desc, key asc. Touches only the summary tables; the total-residual
    scalar joins in as a broadcast one-row aggregate (no separate
    driver job — callers often pass unmaterialized frames, and a
    collect() here would execute the whole upstream summary pipeline
    an extra time)."""
    from pyspark.sql import Window

    tot = residuals.agg(
        F.coalesce(F.sum("residual"), F.lit(0)).cast("long").alias("_tot_resid")
    )
    per_key = (
        summaries.join(residuals, "day")
        .groupBy(key)
        .agg(
            F.sum("cnt").cast("long").alias("lower_bound"),
            F.sum("residual").cast("long").alias("_present_resid"),
        )
    )
    w = Window.orderBy(F.col("lower_bound").desc(), F.col(key).asc())
    return (
        per_key.crossJoin(F.broadcast(tot))
        .withColumn(
            "upper_bound",
            F.col("lower_bound") + F.col("_tot_resid") - F.col("_present_resid"),
        )
        .drop("_present_resid", "_tot_resid")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n)
    )
