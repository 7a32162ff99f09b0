"""Incremental BM25 search index (plans/searchindex.py) and the
transformed-matview machinery beneath it (plans/matview.py TRANSFORMS):
index-vs-one-shot equivalence under append/update/delete, dl-keyed
netting, de-indexing, compaction invariance, and the consistency /
registry guards. The oracle-value pin runs in test_duckdb_parity.py
(q_search_incremental)."""

import pytest
from pyspark.sql import functions as F

from log_parser_project_spark.catalog import SnapshotCatalog
from log_parser_project_spark.operators.search import bm25_topk
from log_parser_project_spark.plans.matview import (
    compact_matview,
    create_matview,
    read_matview,
    refresh_matview,
)
from log_parser_project_spark.plans.searchindex import (
    create_search_index,
    refresh_search_index,
    search_index_status,
    search_index_topk,
)

DOCS_V1 = [
    (1, "spark join window"),
    (2, "the quick brown fox"),
    (3, "unique_zebra token here"),
    (4, "join the stream batch"),
]
APPENDED = [(5, "spark spark streaming"), (6, "window frames")]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def cat(spark, tmp_path):
    return SnapshotCatalog(spark, str(tmp_path / "wh"))


def _seed(spark, cat):
    df = spark.createDataFrame(DOCS_V1, "doc_id long, text string")
    cat.write_table(df, "docs")
    create_search_index(cat, "idx", "docs")
    return df


def test_index_matches_one_shot_after_mutations(spark, cat):
    _seed(spark, cat)
    cat.write_table(
        spark.createDataFrame(APPENDED, "doc_id long, text string"),
        "docs", mode="append",
    )
    refresh_search_index(cat, "idx")
    cat.update_where(
        "docs", {"text": F.concat(F.col("text"), F.lit(" extra spark"))},
        where=F.col("doc_id") == 2,
    )
    refresh_search_index(cat, "idx")
    cat.delete_where("docs", where=F.col("doc_id") == 4)
    refresh_search_index(cat, "idx")

    queries = [(0, "spark join"), (1, "window stream")]
    via_index = search_index_topk(cat, "idx", queries, k=10)
    via_scan = bm25_topk(cat.read_table("docs"), queries, k=10)
    assert _rows(via_index) == _rows(via_scan)
    st = search_index_status(cat, "idx")
    assert st["consistent"] and st["postings"]["fresh"] and st["docs"]["fresh"]


def test_delete_deindexes_terms(spark, cat):
    _seed(spark, cat)
    hit = search_index_topk(cat, "idx", [(0, "unique_zebra")], k=5).collect()
    assert [r["doc_id"] for r in hit] == [3]
    cat.delete_where("docs", where=F.col("doc_id") == 3)
    refresh_search_index(cat, "idx")
    assert search_index_topk(cat, "idx", [(0, "unique_zebra")], k=5).count() == 0
    # the netted postings physically drop the doc's groups on read
    assert read_matview(cat, "idx_postings").filter(F.col("doc_id") == 3).count() == 0


def test_update_renets_dl_groups(spark, cat):
    _seed(spark, cat)
    cat.update_where(
        "docs", {"text": F.lit("spark spark spark spark spark")},
        where=F.col("doc_id") == 1,
    )
    refresh_search_index(cat, "idx")
    rows = read_matview(cat, "idx_postings").filter(F.col("doc_id") == 1).collect()
    # old (term, 1, dl=3) groups all netted away; only dl=5 remains
    assert {(r["term"], r["dl"], r["n_rows"]) for r in rows} == {("spark", 5, 5)}
    docs = read_matview(cat, "idx_docs").filter(F.col("doc_id") == 1).collect()
    assert [(r["n_rows"], r["dl_sum"]) for r in docs] == [(1, 5)]


def test_compaction_preserves_results(spark, cat):
    _seed(spark, cat)
    cat.delete_where("docs", where=F.col("doc_id") == 2)
    refresh_search_index(cat, "idx")
    before = _rows(search_index_topk(cat, "idx", [(0, "spark join")], k=10))
    compact_matview(cat, "idx_postings")
    compact_matview(cat, "idx_docs")
    assert _rows(search_index_topk(cat, "idx", [(0, "spark join")], k=10)) == before
    # compaction folded the delta rows into one physical row per group
    p = cat.read_table("idx_postings")
    assert p.groupBy("term", "doc_id", "dl").count().filter("count > 1").count() == 0


def test_inconsistent_pins_refuse_to_serve(spark, cat):
    _seed(spark, cat)
    cat.write_table(
        spark.createDataFrame([(9, "late doc")], "doc_id long, text string"),
        "docs", mode="append",
    )
    refresh_matview(cat, "idx_postings")  # docs view left one commit behind
    assert not search_index_status(cat, "idx")["consistent"]
    with pytest.raises(ValueError, match="different base snapshots"):
        search_index_topk(cat, "idx", [(0, "spark")], k=3)
    refresh_search_index(cat, "idx")  # idempotent convergence
    assert search_index_status(cat, "idx")["consistent"]


def test_unknown_transform_fails_at_create(spark, cat):
    cat.write_table(
        spark.createDataFrame([(1, "x")], "doc_id long, text string"), "docs"
    )
    with pytest.raises(LookupError, match="not registered"):
        create_matview(cat, "v", "docs", ["doc_id"], transform="no_such_transform")
    # a failed create must not have committed anything
    assert not cat.exists("v")


def test_transform_lineage_round_trips(spark, cat):
    _seed(spark, cat)
    mv = (cat.history("idx_postings")[-1].lineage or {})["mv"]
    assert mv["transform"] == {
        "name": "postings_rows",
        "args": {"id_col": "doc_id", "text_col": "text"},
    }
    # untransformed views keep their lineage transform-free
    create_matview(cat, "plain", "docs", ["doc_id"])
    assert "transform" not in (cat.history("plain")[-1].lineage or {})["mv"]


def test_read_matview_as_of_pins_definition_and_data(spark, cat):
    _seed(spark, cat)
    old_head = cat.snapshot("idx_docs").snapshot_id
    cat.write_table(
        spark.createDataFrame([(9, "nine new words appear here")],
                              "doc_id long, text string"),
        "docs", mode="append",
    )
    refresh_search_index(cat, "idx")
    # live read sees 5 docs; the pinned read still sees the 4 it had
    assert read_matview(cat, "idx_docs").count() == 5
    assert read_matview(cat, "idx_docs", as_of=old_head).count() == 4
    with pytest.raises(LookupError, match="not in"):
        read_matview(cat, "idx_docs", as_of="0" * 16)


def test_create_matview_base_as_of_pins_old_cut(spark, cat):
    df = spark.createDataFrame([(1, "a", 10)], "k long, g string, v long")
    s1 = cat.write_table(df, "base")
    cat.write_table(
        spark.createDataFrame([(2, "a", 99)], "k long, g string, v long"),
        "base", mode="append",
    )
    create_matview(cat, "mv_old", "base", ["g"], {"sv": "v"},
                   base_as_of=s1.snapshot_id)
    rows = read_matview(cat, "mv_old").collect()
    # born on the OLD cut: the concurrent append is invisible until refresh
    assert [(r["g"], r["n_rows"], r["sv"]) for r in rows] == [("a", 1, 10)]
    refresh_matview(cat, "mv_old")
    rows = read_matview(cat, "mv_old").collect()
    assert [(r["g"], r["n_rows"], r["sv"]) for r in rows] == [("a", 2, 109)]
    with pytest.raises(LookupError, match="committed history"):
        create_matview(cat, "mv_bad", "base", ["g"], base_as_of="f" * 16)


def test_create_index_failure_releases_pins(spark, cat):
    cat.write_table(
        spark.createDataFrame([(1, "some text")], "doc_id long, text string"),
        "docs",
    )
    # occupy the SECOND view's name so create fails halfway through
    cat.write_table(
        spark.createDataFrame([(0,)], "x long"), "idx2_docs"
    )
    with pytest.raises(ValueError, match="already exists"):
        create_search_index(cat, "idx2", "docs")
    # the half-created postings view must not anchor the base against
    # retention: every idx2_postings pin tag was swept on the way out
    assert not any(t.startswith("mv_pin_idx2_postings")
                   for t in cat.tags("docs"))
