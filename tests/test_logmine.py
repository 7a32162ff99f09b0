"""Log-mining operators: template masking and multiline assembly."""

import pyspark.sql.functions as F

from log_parser_project_spark.operators.logmine import (
    assemble_records,
    mask_template,
    mine_templates,
)


def test_mask_template_hex_before_digits(spark):
    df = spark.createDataFrame(
        [("ERROR code=476 at 0xDEADbeef offset 12",),
         ("ERROR code=9 at 0x1 offset 40000",)],
        "text string",
    )
    got = {r[0] for r in df.select(mask_template("text")).collect()}
    # hex masked FIRST — otherwise 0xDEADbeef would decay to 0x<N>DEADbeef
    assert got == {"ERROR code=<N> at <HEX> offset <N>"}


def test_mine_templates_counts_and_example(spark):
    df = spark.createDataFrame(
        [("c1", "login uid=1"), ("c1", "login uid=2"), ("c2", "login uid=9"),
         ("c2", "logout uid=9")],
        "conv_id string, text string",
    )
    got = {r.template: r for r in mine_templates(df).collect()}
    assert got["login uid=<N>"].n_lines == 3
    assert got["login uid=<N>"].n_convs == 2
    assert got["login uid=<N>"].example == "login uid=1"  # lexicographic min
    assert got["logout uid=<N>"].n_lines == 1


def test_assemble_records_folds_continuations(spark):
    rows = [
        ("c1", 1, "Exception A"),
        ("c1", 2, "  at frame1"),
        ("c1", 3, "  at frame2"),
        ("c1", 4, "Exception B"),
        ("c1", 5, "  at frame3"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    got = {
        r.rec_id: r
        for r in assemble_records(df, is_start=~F.col("text").startswith("  ")).collect()
    }
    assert got[1].record == "Exception A\n  at frame1\n  at frame2"
    assert got[1].n_lines == 3 and got[1].start_turn == 1
    assert got[2].record == "Exception B\n  at frame3"


def test_assemble_records_keeps_preanchor_lines_as_record_zero(spark):
    # a stream resumed mid-record: continuation lines BEFORE any anchor
    rows = [("c1", 1, "  orphan frame"), ("c1", 2, "Exception A"), ("c1", 3, "  at f")]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    got = {
        r.rec_id: r.record
        for r in assemble_records(df, is_start=~F.col("text").startswith("  ")).collect()
    }
    assert got[0] == "  orphan frame"  # kept, not dropped
    assert got[1] == "Exception A\n  at f"


def test_mine_templates_approx_distinct_close_to_exact(spark):
    rows = [(f"c{i % 7}", f"login uid={i}") for i in range(200)]
    df = spark.createDataFrame(rows, "conv_id string, text string")
    exact = mine_templates(df).collect()[0]
    approx = mine_templates(df, approx_distinct=True).collect()[0]
    assert exact.n_convs == 7
    assert abs(approx.n_convs - 7) <= 1  # HLL at tiny cardinality is ~exact
    assert approx.n_lines == exact.n_lines == 200


def test_template_drift_statuses(spark):
    from log_parser_project_spark.operators.logmine import template_drift

    rows = [
        (0, "login uid=1"), (0, "login uid=2"),     # side A only? no — also in B
        (1, "login uid=3"),
        (0, "legacy op=7"),                          # vanished (A only)
        (1, "newthing id=9"), (1, "newthing id=10"), # appeared (B only)
    ]
    df = spark.createDataFrame(rows, "b int, text string")
    got = {r.template: r for r in template_drift(df, side=F.col("b") == 1).collect()}
    assert got["login uid=<N>"].status == "both"
    assert (got["login uid=<N>"].n_a, got["login uid=<N>"].n_b) == (2, 1)
    assert got["legacy op=<N>"].status == "vanished"
    assert got["newthing id=<N>"].status == "appeared"
    assert got["newthing id=<N>"].n_b == 2 and got["newthing id=<N>"].n_a == 0
