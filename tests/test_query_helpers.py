"""CLI-parity helper behavior (list/versions/query/search analogs)."""

from log_parser_project_spark import query_helpers as qh
from log_parser_project_spark.registry import PATTERNS


def test_list_patterns(spark):
    rows = qh.list_patterns(spark).collect()
    classes = {r.pattern_class for r in rows}
    assert classes == {p.pattern_class for p in PATTERNS}
    handoff = next(r for r in rows if r.pattern_class == "handoff")
    assert handoff.n_versions == 2 and handoff.versions == [1, 2]


def test_versions_and_describe(spark):
    v = qh.versions_of(spark, " HANDOFF ").collect()
    assert [r.version for r in v] == [1, 2]
    fields = qh.describe_pattern(spark, "handoff", 2).collect()
    assert [r.field_name for r in fields] == ["to_role", "reason", "priority"]


def test_search(spark):
    hits = qh.search_patterns(spark, "sever").collect()
    assert {r.pattern_class for r in hits} == {"error"}
    hits2 = qh.search_patterns(spark, "sink_h").collect()
    assert {r.pattern_class for r in hits2} == {"handoff"}


def test_sink_summary(spark, transcripts_small, tmp_path):
    from log_parser_project_spark.catalog import Catalog
    from log_parser_project_spark.plans.pipeline import run_pipeline

    cat = Catalog(spark, str(tmp_path / "wh"))
    res = run_pipeline(spark, transcripts_small, cat, write_repeats=False)
    summary = {r.route: r.n_rows for r in qh.sink_summary(cat).collect()}
    assert summary == {k: v for k, v in res.sink_counts.items() if v > 0}
