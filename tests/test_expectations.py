"""Declarative data-quality expectations: one aggregate pass, audit
protocol, ratio tolerance, referential broadcast anti-join — and the
end-to-end write-audit-publish integration with run_pipeline."""

import pytest
from pyspark.sql import functions as F

from log_parser_project_spark import expectations as ex


def _df(spark):
    rows = [
        ("c1", 0, "user", "hello", None),
        ("c1", 1, "assistant", "hi", "search"),
        ("c2", 0, "user", "ERROR code=1", None),
        ("c2", 1, "assistant", None, "calc"),
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    )


def test_single_pass_report_and_pass_fail(spark):
    df = _df(spark)
    report = ex.evaluate(df, [
        {"expect": "row_count_between", "min": 1, "max": 10},
        {"expect": "not_null", "col": "conv_id"},
        {"expect": "not_null", "col": "text"},                      # 1 null
        {"expect": "not_null", "col": "tool", "max_null_ratio": 0.6},
        {"expect": "unique", "cols": ["conv_id", "turn_idx"]},
        {"expect": "accepted_values", "col": "role",
         "values": ["user", "assistant"]},
        {"expect": "between", "col": "turn_idx", "lo": 0, "hi": 1},
        {"expect": "matches_regex", "col": "conv_id", "pattern": r"^c\d$"},
    ])
    by = {(r["expect"], r["detail"]): r for r in report}
    assert by[("row_count_between", "[1, 10]")]["passed"]
    assert by[("not_null", "conv_id")]["passed"]
    assert not by[("not_null", "text")]["passed"]
    assert by[("not_null", "text")]["observed"] == 1
    assert by[("not_null", "tool")]["passed"]  # 2/4 nulls <= 0.6
    assert by[("unique", "conv_id,turn_idx")]["passed"]
    assert by[("accepted_values", "role")]["passed"]
    assert by[("between", "turn_idx")]["passed"]
    assert by[("matches_regex", r"conv_id ~ /^c\d$/")]["passed"]


def test_unique_counts_duplicates(spark):
    df = _df(spark).unionByName(_df(spark).limit(1))
    rep = ex.evaluate(df, [{"expect": "unique", "cols": ["conv_id", "turn_idx"]}])
    assert not rep[0]["passed"] and rep[0]["observed"] == 1


def test_nulls_violate_bounds_and_enums(spark):
    df = _df(spark).withColumn(
        "turn_idx", F.when(F.col("turn_idx") == 0, None).otherwise(F.col("turn_idx"))
    )
    rep = ex.evaluate(df, [
        {"expect": "between", "col": "turn_idx", "lo": 0},
        {"expect": "accepted_values", "col": "tool", "values": ["search", "calc"]},
    ])
    assert rep[0]["observed"] == 2      # two nulled turn_idx rows
    assert rep[1]["observed"] == 2      # null tools violate the enum


def test_referential_broadcast_anti_join(spark):
    df = _df(spark)
    dim = spark.createDataFrame([("search",)], "tool string")
    rep = ex.evaluate(df, [
        {"expect": "referential", "col": "tool", "dim": dim, "dim_col": "tool"},
    ])
    # 'calc' misses; nulls pass (SQL FK semantics)
    assert not rep[0]["passed"] and rep[0]["observed"] == 1


def test_ratio_tolerance_exact_boundary_passes(spark):
    """A violation ratio EXACTLY equal to the declared tolerance
    passes (bad <= tol*n fails at the boundary: 0.29*100 < 29.0)."""
    rows = [(None if i < 29 else i, "a") for i in range(100)]
    df = spark.createDataFrame(rows, "n int, s string")
    rep = ex.evaluate(df, [
        {"expect": "not_null", "col": "n", "max_null_ratio": 0.29},
    ])
    assert rep[0]["passed"] and rep[0]["observed"] == 29


def test_string_values_and_cols_rejected(spark):
    """A bare string for values/cols would silently become
    per-character semantics — rejected at validation."""
    df = _df(spark)
    with pytest.raises(ValueError, match="values as a list"):
        ex.evaluate(df, [{"expect": "accepted_values", "col": "role",
                          "values": "en"}])
    with pytest.raises(ValueError, match="cols as a list"):
        ex.evaluate(df, [{"expect": "unique", "cols": "conv_id"}])


def test_job_suite_gate_resolves_table_dims(spark, transcripts_small, tmp_path):
    """jobs/run_pipeline.py --audit-suite: a referential spec naming a
    warehouse TABLE as its dim resolves at audit time."""
    import json as _json
    import sys as _sys

    _sys.path.insert(0, str(__import__("pathlib").Path(__file__).parents[1] / "jobs"))
    from run_pipeline import _suite_audit

    from log_parser_project_spark.catalog import SnapshotCatalog
    from log_parser_project_spark.plans.pipeline import run_pipeline

    cat = SnapshotCatalog(spark, str(tmp_path / "wh"))
    cat.write_table(
        spark.createDataFrame(
            [("human",), ("model",), ("infra",)], "role string"
        ),
        "dim_role_names",
    )
    sp = tmp_path / "suite.json"
    sp.write_text(_json.dumps([
        {"expect": "not_null", "col": "route"},
        {"expect": "referential", "col": "role_class", "dim": "dim_role_names",
         "dim_col": "role"},
    ]))
    gate = _suite_audit(str(sp), cat)
    res = run_pipeline(spark, transcripts_small, cat, audit=gate)
    assert res.sink_counts  # published: every role_class is in the dim


def test_violations_strings_and_validation(spark):
    df = _df(spark)
    v = ex.violations(df, [{"expect": "not_null", "col": "text"}])
    assert v == ["not_null(text): observed 1"]
    for bad in (
        [{"expect": "nope"}],
        [{"expect": "row_count_between"}],
        [{"expect": "unique"}],
        [{"expect": "between", "col": "turn_idx"}],
        [{"expect": "accepted_values", "col": "role"}],
        [{"expect": "matches_regex", "col": "role"}],
        [{"expect": "referential", "col": "tool"}],
        [{"expect": "not_null"}],
    ):
        with pytest.raises(ValueError):
            ex.evaluate(df, bad)


def test_property_observed_counts_match_python(spark):
    """Property: evaluate()'s observed counts equal a pure-Python
    recount for every row-shaped check, on arbitrary small frames."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    row = st.tuples(
        st.one_of(st.none(), st.integers(-5, 5)),
        st.sampled_from(["a", "b", "c", None]),
    )

    @settings(max_examples=12, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(st.lists(row, min_size=1, max_size=30))
    def run(rows):
        df = spark.createDataFrame(rows, "n int, s string")
        rep = ex.evaluate(df, [
            {"expect": "not_null", "col": "n"},
            {"expect": "between", "col": "n", "lo": -2, "hi": 3},
            {"expect": "accepted_values", "col": "s", "values": ["a", "b"]},
            {"expect": "unique", "cols": ["n", "s"]},
            {"expect": "row_count_between", "min": 1},
        ])
        by = {r["expect"]: r["observed"] for r in rep}
        assert by["not_null"] == sum(1 for n, _ in rows if n is None)
        assert by["between"] == sum(
            1 for n, _ in rows if n is None or not (-2 <= n <= 3)
        )
        assert by["accepted_values"] == sum(
            1 for _, s in rows if s not in ("a", "b")
        )
        assert by["unique"] == len(rows) - len(set(rows))
        assert by["row_count_between"] == len(rows)

    run()


def test_wap_gate_blocks_and_publishes(spark, transcripts_small, tmp_path):
    """End to end: a declared suite gates the staged fan-out commit —
    a satisfiable suite publishes, an impossible one abandons."""
    from log_parser_project_spark.catalog import SnapshotCatalog
    from log_parser_project_spark.plans.pipeline import AuditError, run_pipeline

    cat = SnapshotCatalog(spark, str(tmp_path / "wh"))
    good = ex.audit([
        {"expect": "row_count_between", "min": 1},
        {"expect": "not_null", "col": "route"},
        {"expect": "unique", "cols": ["conv_id", "turn_idx"]},
    ])
    res = run_pipeline(spark, transcripts_small, cat, audit=good)
    assert res.sink_counts and cat.snapshot("sink_staging") is not None
    # the published line records which gate it passed (WAP forensics)
    assert cat.snapshot("sink_staging").lineage["audit"] == {
        "gate": "_audit", "violations": 0,
    }

    cat2 = SnapshotCatalog(spark, str(tmp_path / "wh2"))
    bad = ex.audit([{"expect": "row_count_between", "max": 0}])
    with pytest.raises(AuditError, match="row_count_between"):
        run_pipeline(spark, transcripts_small, cat2, audit=bad)
    assert cat2.snapshot("sink_staging") is None  # stage abandoned
