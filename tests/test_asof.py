"""AS-OF join: the zero-shuffle expression path and the merge-based
large-dim path must select identical versions, including the inclusive
boundary (fact AT a version's effective instant sees it) and the
before-first-version NULL."""

from datetime import datetime, timedelta

import pyspark.sql.functions as F

from log_parser_project_spark.operators.asof import asof_join_backward, asof_lookup


def test_lookup_and_merge_paths_agree(spark, sf_dir):
    # the ACTUAL contract dim — importing it means this test pins the
    # same data the registered query and its DuckDB oracle use
    from log_parser_project_spark.queries_data import _EPOCH_2024, _RATE_EPOCH_DAYS

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    versions = {
        k: [((_EPOCH_2024 + d * 86400) * 1_000_000, d) for d in ds]
        for k, ds in _RATE_EPOCH_DAYS.items()
    }
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    f = ev.select("event_id", "event_type", us.alias("us"))

    via_lookup = f.withColumn(
        "rate", asof_lookup(F.col("us"), versions, F.col("event_type"))["attr"]
    ).select("event_id", "rate")

    dim = spark.createDataFrame(
        [(k, t, d) for k, vers in versions.items() for t, d in vers],
        "event_type string, eff_us long, rate int",
    )
    via_merge = asof_join_backward(
        f, dim, key="event_type", fact_ts="us", dim_ts="eff_us", dim_cols=["rate"]
    ).select("event_id", "rate")

    a = sorted(map(tuple, via_lookup.collect()))
    b = sorted(map(tuple, via_merge.collect()))
    assert a == b and len(a) == ev.count()
    assert any(r[1] is None for r in a)  # facts before the first version


def test_inclusive_boundary_and_ordering(spark):
    """A fact exactly AT an effective instant takes that version; one
    microsecond earlier takes the previous (or none)."""
    t0 = datetime(2024, 6, 1)
    t0_us = int(t0.timestamp()) * 1_000_000
    versions = {"k": [(t0_us, 1), (t0_us + 1_000_000, 2)]}
    facts = spark.createDataFrame(
        [
            (1, t0_us - 1),          # before first version -> NULL
            (2, t0_us),              # exactly at v1 -> 1
            (3, t0_us + 999_999),    # between -> 1
            (4, t0_us + 1_000_000),  # exactly at v2 -> 2
        ],
        "fid long, us long",
    )
    got = {
        r["fid"]: r["rate"]
        for r in facts.withColumn(
            "rate", asof_lookup(F.col("us"), versions, F.lit("k"))["attr"]
        ).collect()
    }
    assert got == {1: None, 2: 1, 3: 1, 4: 2}

    dim = spark.createDataFrame(
        [("k", t, a) for t, a in versions["k"]], "key string, eff_us long, rate int"
    )
    merged = {
        r["fid"]: r["rate"]
        for r in asof_join_backward(
            facts.withColumn("key", F.lit("k")),
            dim,
            key="key",
            fact_ts="us",
            dim_ts="eff_us",
            dim_cols=["rate"],
        ).collect()
    }
    assert merged == got


def test_range_lookup_boundaries(spark):
    """Interval containment is [start, end): a fact at start matches,
    at end does not; gaps between intervals return NULL."""
    from log_parser_project_spark.operators.asof import range_lookup

    iv = {"k": [(100, 200, 1), (300, 400, 2)]}
    facts = spark.createDataFrame(
        [(1, 99), (2, 100), (3, 199), (4, 200), (5, 250), (6, 300), (7, 399), (8, 400)],
        "fid long, us long",
    )
    got = {
        r["fid"]: r["c"]
        for r in facts.withColumn(
            "c", range_lookup(F.col("us"), iv, F.lit("k"))["attr"]
        ).collect()
    }
    assert got == {1: None, 2: 1, 3: 1, 4: None, 5: None, 6: 2, 7: 2, 8: None}


def test_merge_path_carries_null_attrs_atomically(spark):
    """A matched version whose attribute is genuinely NULL must yield
    NULL — not resurrect an older version's value (the whole dim row
    carries as one struct; per-column last(ignorenulls) would mix
    versions)."""
    facts = spark.createDataFrame([("k", 250)], "key string, us long")
    dim = spark.createDataFrame(
        [("k", 100, 5), ("k", 200, None)], "key string, eff_us long, rate int"
    )
    row = asof_join_backward(
        facts, dim, key="key", fact_ts="us", dim_ts="eff_us", dim_cols=["rate"]
    ).collect()[0]
    assert row["eff_us"] == 200 and row["rate"] is None


def test_merge_path_rejects_reserved_columns(spark):
    import pytest

    facts = spark.createDataFrame([("k", 1, 0)], "key string, us long, _ats long")
    dim = spark.createDataFrame([("k", 0, 1)], "key string, eff_us long, rate int")
    with pytest.raises(ValueError, match="reserved"):
        asof_join_backward(
            facts, dim, key="key", fact_ts="us", dim_ts="eff_us", dim_cols=["rate"]
        )
