"""Hot-key skew: one conversation carrying a large share of all rows
must aggregate exactly and without a single-reducer hotspot (salted
two-phase path), and the full pipeline must stay correct under skew.
"""

import pyspark.sql.functions as F

from log_parser_project_spark.generate import make_transcripts
from log_parser_project_spark.operators.aggregate import per_sink_aggregates, salted_count
from log_parser_project_spark.plans.pipeline import build_routed


def test_salted_count_exact_under_skew(spark):
    df = make_transcripts(spark, n_convs=200, hot_conv_rows=20_000)
    naive = {r.conv_id: r.n for r in df.groupBy("conv_id").agg(F.count("*").alias("n")).collect()}
    salted = {r.conv_id: r.n for r in salted_count(df, "conv_id", salt_buckets=32).collect()}
    assert salted == naive
    assert salted["conv-hot-0000"] == 20_000


def test_pipeline_correct_under_skew(spark):
    df = make_transcripts(spark, n_convs=100, hot_conv_rows=5_000)
    routed = build_routed(spark, df)
    aggs = per_sink_aggregates(routed)
    by_conv = {r.conv_id: r.n for r in aggs["by_conv"].collect()}
    assert by_conv["conv-hot-0000"] == 5_000
    assert sum(by_conv.values()) == df.count()
    # hot conv rows all classified/routed like any other rows
    hot = routed.filter(F.col("conv_id") == "conv-hot-0000")
    assert hot.filter(F.col("route").isNull()).count() == 0


def test_salt_spreads_hot_key(spark):
    """The salted partial phase must actually split the hot key across
    buckets (that's the whole point)."""
    df = make_transcripts(spark, n_convs=50, hot_conv_rows=10_000)
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(32))
    )
    buckets = (
        salted.filter(F.col("conv_id") == "conv-hot-0000")
        .groupBy("_salt").agg(F.count("*").alias("n"))
    ).collect()
    assert len(buckets) == 32
    assert max(r.n for r in buckets) < 10_000 * 0.2  # no bucket hogs the key


def test_aqe_splits_skewed_join(spark):
    """AQE's runtime skew-join handling (the hot-conv_id shape at join
    time, complementing the salted aggregate path): one key carrying
    ~90% of the fact rows makes the sort-merge join re-plan with
    skew=true — the skewed partition is split across tasks instead of
    serializing on one reducer."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        )
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    try:
        left = spark.range(0, 400_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(7))
            .otherwise(F.col("id") % 1000).cast("long").alias("k"),
            F.concat(F.lit("payload-"), F.col("id")).alias("v"),
        )
        right = spark.range(0, 1000).select(F.col("id").alias("k"), F.col("id").alias("w"))
        j = left.join(right, "k").select(F.sum(F.length("v")).alias("s"))
        [row] = j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan
        # and the answer is still exact
        want = left.join(F.broadcast(right), "k").select(F.sum(F.length("v"))).first()[0]
        assert row.s == want
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_heavy_hitters_sketch_finds_hot_key(spark):
    from log_parser_project_spark.operators.skew import heavy_hitters

    df = spark.range(0, 20_000).select(
        F.when(F.col("id") < 10_000, "conv-hot")
        .otherwise(F.concat(F.lit("c"), F.col("id")))
        .alias("conv_id")
    )
    hot = heavy_hitters(df, "conv_id", k=10, min_share=0.05)
    assert hot == ["conv-hot"]
    assert heavy_hitters(df.limit(0), "conv_id") == []


def test_salted_join_exact_under_skew(spark):
    """Hot-key-only salted join must equal the plain join row-for-row,
    including null keys and dim misses, for inner and left joins."""
    from log_parser_project_spark.operators.skew import salted_join

    fact = spark.range(0, 5_000).select(
        F.when(F.col("id") < 4_000, "hot").otherwise(
            F.concat(F.lit("k"), F.col("id") % 7)
        ).alias("k"),
        F.col("id").alias("v"),
    ).union(spark.createDataFrame([(None, -1)], "k string, v long"))
    dim = spark.createDataFrame(
        [("hot", "H"), ("k1", "A"), ("k3", "B")], "k string, attr string"
    )
    nonesafe = lambda t: tuple((x is None, x) for x in t)  # noqa: E731
    for how in ("inner", "left"):
        got = salted_join(fact, dim, "k", salt_buckets=8, how=how)
        want = fact.join(dim, "k", how)
        assert sorted(map(tuple, got.collect()), key=nonesafe) == sorted(
            map(tuple, want.collect()), key=nonesafe
        ), how
    # explicit hot list short-circuits detection
    got2 = salted_join(fact, dim, "k", hot_keys=["hot"], how="inner")
    assert got2.count() == fact.join(dim, "k", "inner").count()


def test_salted_collect_matches_plain_ordered_collect(spark):
    from log_parser_project_spark.operators.skew import salted_collect

    df = spark.range(0, 3_000).select(
        F.when(F.col("id") < 2_000, "hot").otherwise(
            F.concat(F.lit("c"), F.col("id") % 5)
        ).alias("conv_id"),
        (F.col("id") * 7 % 3_001).alias("turn_idx"),
        F.concat(F.lit("t"), F.col("id")).alias("text"),
    )
    got = {
        r.conv_id: r.vals
        for r in salted_collect(df, "conv_id", "turn_idx", "text", salt_buckets=8).collect()
    }
    want = {
        r.conv_id: r.vals
        for r in df.groupBy("conv_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("turn_idx", "text"))),
                lambda s: s["text"],
            ).alias("vals")
        )
        .collect()
    }
    assert got == want
    assert len(got["hot"]) == 2_000


def test_salted_collect_keeps_null_key_group(spark):
    """NULL keys must survive the hot/cold split: ~isin(hot) is NULL
    (not False) for NULL inputs, so the cold filter needs an explicit
    isNull branch — same contract as the plain groupBy."""
    from log_parser_project_spark.operators.skew import salted_collect

    df = spark.createDataFrame(
        [("hot", 2, "b"), ("hot", 1, "a"), (None, 2, "y"), (None, 1, "x"),
         ("c1", 1, "z")],
        "conv_id string, turn_idx long, text string",
    )
    got = {
        r.conv_id: r.vals
        for r in salted_collect(
            df, "conv_id", "turn_idx", "text", salt_buckets=4, hot_keys=["hot"]
        ).collect()
    }
    assert got == {"hot": ["a", "b"], None: ["x", "y"], "c1": ["z"]}


def test_salted_join_rejects_non_fact_preserving_how(spark):
    """right/full joins against the salt-replicated dim would emit one
    spurious row per empty (hot key, salt) bucket — refused up front."""
    import pytest

    from log_parser_project_spark.operators.skew import salted_join

    fact = spark.createDataFrame([("hot", 1)], "k string, v int")
    dim = spark.createDataFrame([("hot", "H")], "k string, attr string")
    for how in ("full", "right", "outer"):
        with pytest.raises(ValueError):
            salted_join(fact, dim, "k", hot_keys=["hot"], how=how)
