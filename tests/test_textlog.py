"""Raw text-log ingestion: exact per-file line order, multiline
assembly composition, and grok parsing over the assembled records."""

import pyspark.sql.functions as F

from log_parser_project_spark.operators.logmine import assemble_records
from log_parser_project_spark.sources.textlog import read_text_log, textlog_transcripts

LOG_A = """2026-08-17 INFO start id=1
2026-08-17 ERROR boom id=2
  at frame.one(File.java:10)
  at frame.two(File.java:20)
2026-08-17 INFO done id=3
"""

LOG_B = """2026-08-17 WARN slow id=9

2026-08-17 INFO ok id=10
"""


def _write(tmp_path):
    d = tmp_path / "logs"
    d.mkdir()
    (d / "a.log").write_text(LOG_A)
    (d / "b.log").write_text(LOG_B)
    return str(d)


def test_line_numbers_exact_and_ordered(spark, tmp_path):
    lines = read_text_log(spark, _write(tmp_path)).collect()
    by_file = {}
    for r in lines:
        by_file.setdefault(r.file.rsplit("/", 1)[-1], []).append((r.line_no, r.text))
    a = sorted(by_file["a.log"])
    assert [t for _, t in a] == LOG_A.rstrip("\n").split("\n")
    assert [n for n, _ in a] == [1, 2, 3, 4, 5]
    b = sorted(by_file["b.log"])
    # interior empty line preserved, trailing newline adds no phantom
    assert [t for _, t in b] == ["2026-08-17 WARN slow id=9", "", "2026-08-17 INFO ok id=10"]


def test_multiline_assembly_over_textlog(spark, tmp_path):
    t = textlog_transcripts(read_text_log(spark, _write(tmp_path)))
    recs = assemble_records(
        t, is_start=~F.col("text").startswith("  "), sep="\n"
    ).collect()
    a = {
        r.rec_id: r.record
        for r in recs
        if r.conv_id.endswith("a.log")
    }
    assert a[2] == (
        "2026-08-17 ERROR boom id=2\n"
        "  at frame.one(File.java:10)\n"
        "  at frame.two(File.java:20)"
    )
    assert a[1] == "2026-08-17 INFO start id=1" and a[3] == "2026-08-17 INFO done id=3"


def test_grok_parse_over_assembled_records(spark, tmp_path):
    from log_parser_project_spark.grok import grok_pattern
    from log_parser_project_spark.operators.parse import parse_builtin

    t = textlog_transcripts(read_text_log(spark, _write(tmp_path)))
    recs = assemble_records(t, is_start=~F.col("text").startswith("  "))
    from log_parser_project_spark.sources.textlog import records_transcripts

    df = records_transcripts(recs)
    pat = grok_pattern(
        "applog", 1,
        r"(?s)^%{NOTSPACE:day} %{LOGLEVEL:level} %{WORD:msg} id=%{INT:id}.*$",
        "sink_app",
        prefix="2026-",
    )
    got = {
        (r.conv_id.rsplit("/", 1)[-1], r.turn_idx): r
        for r in parse_builtin(df, patterns=(pat,)).collect()
    }
    err = got[("a.log", 2)]
    assert err.matched and err.extracted["level"] == "ERROR" and err.extracted["id"] == "2"
    # b.log: the interior empty line is its own record (2) — an
    # unclassified non-match, not silently dropped; INFO is record 3
    assert not got[("b.log", 2)].matched and got[("b.log", 2)].pattern_class is None
    assert got[("b.log", 3)].matched and got[("b.log", 3)].extracted["level"] == "INFO"


def test_trailing_empty_lines_and_crlf_and_empty_file(spark, tmp_path):
    d = tmp_path / "logs2"
    d.mkdir()
    (d / "t.log").write_text("a\n\n\n")          # two REAL trailing empty lines
    (d / "w.log").write_bytes(b"x=1\r\ny=2\r\n")  # CRLF
    (d / "e.log").write_text("")                  # zero lines
    got = {}
    for r in read_text_log(spark, str(d)).collect():
        got.setdefault(r.file.rsplit("/", 1)[-1], []).append((r.line_no, r.text))
    assert sorted(got["t.log"]) == [(1, "a"), (2, ""), (3, "")]
    assert sorted(got["w.log"]) == [(1, "x=1"), (2, "y=2")]  # no \r residue
    assert "e.log" not in got  # empty file -> no phantom line


def test_read_text_lines_parallel_variant(spark, tmp_path):
    from log_parser_project_spark.sources.textlog import read_text_lines

    d = tmp_path / "logs3"
    d.mkdir()
    (d / "a.log").write_bytes(b"p=1\r\np=2\n")
    rows = read_text_lines(spark, str(d)).collect()
    assert sorted(r.text for r in rows) == ["p=1", "p=2"]


def test_template_drift_null_side_excluded(spark):
    from log_parser_project_spark.operators.logmine import template_drift

    rows = [(True, "login uid=1"), (None, "login uid=2"), (None, "ghost id=3")]
    df = spark.createDataFrame(rows, "b boolean, text string")
    got = {r.template: r for r in template_drift(df, side=F.col("b")).collect()}
    # NULL-side rows belong to neither slice
    assert got["login uid=<N>"].n_a == 0 and got["login uid=<N>"].n_b == 1
    assert "ghost id=<N>" not in got
