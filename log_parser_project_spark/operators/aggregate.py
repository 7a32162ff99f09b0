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


def per_sink_aggregates_onepass(
    routed: DataFrame,
) -> tuple[DataFrame, dict[str, DataFrame]]:
    """Same four aggregates as :func:`per_sink_aggregates`, computed in
    ONE grouping-sets job: one scan of the fact, one shuffle, no
    persist of the wide intermediate. At 100 TB this replaces four
    passes (or a multi-TB cache) with a single pass whose partial
    aggregation combines all four key sets map-side.

    Returns ``(shared, splits)``: the caller persists + materializes
    ``shared`` (it is aggregate-sized, not fact-sized) so the four
    split reads are cache hits, and unpersists it after writing.

    ``F.grouping(col)`` (0 = grouped in this set) splits the union back
    into the four named results; within the (route, tool) set a NULL
    ``tool`` is a data-null (grouping flag is 0), reproducing the
    ``tool IS NOT NULL`` filter of the per-aggregate formulation.
    """
    gs = routed.select(
        "conv_id", "route", "role", "tool", F.date_trunc("hour", "ts").alias("hour")
    )
    agg = (
        gs.groupingSets(
            [["route"], ["conv_id"], ["route", "role"], ["route", "tool"], ["route", "hour"]],
            "conv_id", "route", "role", "tool", "hour",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.grouping("conv_id").alias("_g_conv"),
            F.grouping("route").alias("_g_route"),
            F.grouping("role").alias("_g_role"),
            F.grouping("tool").alias("_g_tool"),
            F.grouping("hour").alias("_g_hour"),
        )
    )
    g = F.col
    splits = {
        # route-only set (per-sink totals — the pipeline's sink_counts)
        "by_route": agg.filter(
            (g("_g_route") == 0) & (g("_g_conv") == 1) & (g("_g_role") == 1)
            & (g("_g_tool") == 1) & (g("_g_hour") == 1)
        ).select("route", "n"),
        "by_conv": agg.filter(g("_g_conv") == 0).select("conv_id", "n"),
        "by_role": agg.filter(g("_g_role") == 0).select("route", "role", "n"),
        "by_tool": agg.filter((g("_g_tool") == 0) & g("tool").isNotNull()).select(
            "route", "tool", "n"
        ),
        "by_hour": agg.filter(g("_g_hour") == 0).select("route", "hour", "n"),
    }
    return agg, splits


def moment_correlation(
    df: DataFrame,
    x,
    y,
    group_by: list[str] | None = None,
) -> DataFrame:
    """Pearson correlation from EXACT integer moment sums — the
    engine-portable alternative to ``corr()``, whose streaming
    float accumulation is partial-sum-order-dependent and therefore
    never bit-stable across engines or partitionings.

    ``x`` and ``y`` are integer-valued Columns (cents / e4 — the
    caller quantizes, as everywhere else in the contract surface).
    One aggregate computes the six moment sums (n, Σx, Σy, Σx²,
    Σy², Σxy) as exact BIGINTs — map-side combinable, order-free —
    and only the FINAL scalar combination
    ``(nΣxy − ΣxΣy) / √((nΣx²−Σx²)(nΣy²−Σy²))`` runs in doubles:
    identical inputs + identical expression tree ⇒ identical rounded
    result in any engine. Zero-variance groups yield NULL. Caller
    must keep Σx² within BIGINT (|x| ≤ ~3e6 at a billion rows); at
    larger magnitudes quantize coarser. This precondition is NOT
    enforced here: outside ANSI mode (``spark.sql.ansi.enabled=false``)
    a BIGINT sum overflow wraps SILENTLY and yields a plausible-looking
    wrong coefficient — under ANSI mode the same overflow raises. If
    input magnitudes aren't known a priori, check
    ``max(abs(x)) * sqrt(n)`` fits BIGINT before trusting the result
    (``test_profile_moments`` pins this guard for the contract query).
    """
    gb = list(group_by or [])
    sums = df.groupBy(*gb).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    cov_n = d("n") * d("sxy") - d("sx") * d("sy")
    var_x = d("n") * d("sxx") - d("sx") * d("sx")
    var_y = d("n") * d("syy") - d("sy") * d("sy")
    corr = F.when(
        (var_x > 0) & (var_y > 0), F.round(cov_n / F.sqrt(var_x * var_y), 4)
    )
    return sums.select(*gb, "n", corr.alias("corr"))
