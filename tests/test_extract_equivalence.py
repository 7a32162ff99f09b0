"""The pandas-UDF extraction and the pure-JVM extraction must be
row-for-row identical — matched flags, every extracted group, and the
repeat arrays — on the full synthetic corpus."""

import pyspark.sql.functions as F

from log_parser_project_spark.operators.parse import parse, parse_builtin
from log_parser_project_spark.registry import ALL_GROUPS


def _rows(df):
    return {
        (r.conv_id, r.turn_idx): (
            r.matched,
            tuple(r.extracted[g] for g in ALL_GROUPS),
            tuple(tuple(rec) for rec in r.repeats) if r.repeats is not None else None,
        )
        for r in df.select("conv_id", "turn_idx", "matched", "extracted", "repeats").collect()
    }


def test_udf_and_builtin_extraction_identical(spark, transcripts_small):
    a = _rows(parse(transcripts_small))
    b = _rows(parse_builtin(transcripts_small))
    assert a.keys() == b.keys()
    diffs = {k: (a[k], b[k]) for k in a if a[k] != b[k]}
    assert not diffs, f"{len(diffs)} mismatches, e.g. {next(iter(diffs.items()))}"


def test_arrow_re2_extraction_identical(spark, transcripts_small):
    a = _rows(parse(transcripts_small))
    c = _rows(parse(transcripts_small, impl="arrow"))
    assert a.keys() == c.keys()
    diffs = {k: (a[k], c[k]) for k in a if a[k] != c[k]}
    assert not diffs, f"{len(diffs)} mismatches, e.g. {next(iter(diffs.items()))}"


def test_arrow_re2_trailing_newline_parity(spark):
    """Python's ``$`` matches before one trailing newline; the RE2
    translation (``(?:\\n)?\\z``) must reproduce that, including NOT
    matching two newlines or an interior one."""
    rows = [
        ("c", 1, "user", "latency_ms=5 tokens=10", None),
        ("c", 2, "user", "latency_ms=5 tokens=10\n", None),
        ("c", 3, "user", "latency_ms=5 tokens=10\n\n", None),
        ("c", 4, "user", "latency_ms=5 tokens=10\nx", None),
        ("c", 5, "user", "HANDOFF to=a reason=b\n", None),
    ]
    df = spark.createDataFrame(
        [(c, t, r, x, tl) for c, t, r, x, tl in rows],
        "conv_id string, turn_idx int, role string, text string, tool string",
    ).withColumn("ts", F.current_timestamp())
    a = _rows(parse(df))
    c = _rows(parse(df, impl="arrow"))
    assert a == c
    assert [a[("c", i)][0] for i in range(1, 6)] == [True, True, False, False, True]


def test_builtin_plan_is_pure_jvm(spark, transcripts_small):
    plan = parse_builtin(transcripts_small)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
