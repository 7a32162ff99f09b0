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


def test_builtin_plan_is_pure_jvm(spark, transcripts_small):
    plan = parse_builtin(transcripts_small)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
