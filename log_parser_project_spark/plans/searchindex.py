"""Incrementally-maintained BM25 search index: the inverted index as
a pair of TRANSFORMED materialized views.

A one-shot index (``operators/search.build_postings``) re-scans the
corpus on every rebuild; at 100 TB the index must instead FOLLOW the
document table — new docs indexed, deleted docs de-indexed, edited
docs re-indexed — reading only what changed. That is exactly the
transformed-matview machinery (``plans/matview.py``): the postings
relation IS

    SELECT term, doc_id, dl, COUNT(*) AS tf
    FROM explode_tokens(docs) GROUP BY term, doc_id, dl

i.e. a COUNT-only materialized view over a row-local flatMap of the
base table, and the doc-length/corpus-stats relation is a second view
over a row-local projection. Every matview guarantee transfers for
free: O(changed docs) refresh off the base changelog, serializable
delta commits (``expected_parent``), pin tags protecting the
changelog window from retention, compaction that nets delta rows.

Why ``dl`` is part of the postings GROUP KEY: scoring needs each
candidate's doc length without rejoining a corpus-wide doc table
(see ``operators/search.py``). A doc edit changes dl for ALL its
postings — but the changelog surfaces the edit as delete(old row) +
insert(new row), so the old ``(term, doc, dl_old)`` groups net to
zero and vanish at read time while ``(term, doc, dl_new)`` groups
appear: the denormalization maintains itself.

The two views advance in separate commits (each individually atomic
and serializable). A crash between them leaves corpus stats one
refresh behind the postings — scores normalized against slightly
stale N/avgdl, self-healed by the next refresh; reads detect the
skew via the views' pinned base snapshots and refuse rather than
serve mixed-generation results.

The reference's only search is a LIKE scan per request
(``src/app.py`` search command); this is its 100 TB replacement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog import Snapshot, SnapshotCatalog
from ..operators.search import query_terms_df, topk_from_postings
from ..operators.text import tokens
from .matview import (
    create_matview,
    matview_status,
    read_matview,
    refresh_matview,
    register_transform,
)


@register_transform("postings_rows")
def _postings_rows(id_col: str = "doc_id", text_col: str = "text"):
    """One output row per token occurrence: (doc_id, dl, term)."""

    def fn(df: DataFrame) -> DataFrame:
        toks = df.select(F.col(id_col).alias("doc_id"), tokens(text_col).alias("toks"))
        return toks.select(
            "doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("term")
        )

    return fn


@register_transform("doc_length_rows")
def _doc_length_rows(id_col: str = "doc_id", text_col: str = "text"):
    """One output row per doc: (doc_id, dl) — dl=0 docs included, so
    the view's COUNT is the corpus size N and its SUM(dl) the total
    token count (exact BIGINTs, the BM25 normalizers)."""

    def fn(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col).alias("doc_id"), F.size(tokens(text_col)).alias("dl")
        )

    return fn


def _postings_view(index: str) -> str:
    return f"{index}_postings"


def _docs_view(index: str) -> str:
    return f"{index}_docs"


def create_search_index(
    catalog: SnapshotCatalog,
    index: str,
    base_table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    replace: bool = False,
) -> dict[str, Snapshot]:
    """Build the index over the base table's current snapshot — the
    only full corpus scan this index will ever take. Returns the two
    view commits keyed by table name."""
    args = {"id_col": id_col, "text_col": text_col}
    snaps = {
        _postings_view(index): create_matview(
            catalog,
            _postings_view(index),
            base_table,
            group_by=["term", "doc_id", "dl"],
            transform=("postings_rows", args),
            replace=replace,
        ),
        _docs_view(index): create_matview(
            catalog,
            _docs_view(index),
            base_table,
            group_by=["doc_id"],
            sums={"dl_sum": "dl"},
            transform=("doc_length_rows", args),
            replace=replace,
        ),
    }
    return snaps


def refresh_search_index(
    catalog: SnapshotCatalog, index: str
) -> dict[str, Snapshot | None]:
    """Advance both index views to the base table's current snapshot,
    each an O(changed docs + touched terms) delta append. Idempotent
    and crash-safe per view; rerun after any failure to converge."""
    return {
        v: refresh_matview(catalog, v)
        for v in (_postings_view(index), _docs_view(index))
    }


def search_index_status(catalog: SnapshotCatalog, index: str) -> dict:
    """Freshness of both views (see ``matview_status``) plus whether
    they are mutually consistent (pinned to the same base snapshot)."""
    p = matview_status(catalog, _postings_view(index))
    d = matview_status(catalog, _docs_view(index))
    return {
        "postings": p,
        "docs": d,
        "consistent": p["pinned_base_snapshot"] == d["pinned_base_snapshot"],
    }


def search_index_topk(
    catalog: SnapshotCatalog,
    index: str,
    queries: list[tuple[int, str]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 top-``k`` per query against the PERSISTED index — no read
    of the corpus text at all. Postings and stats come off the two
    views (delta rows netted on read); the scoring core and its
    broadcast shape are shared with the one-shot path
    (``operators/search.topk_from_postings``). Raises if the views
    are pinned to different base snapshots (a crashed refresh) —
    rerun :func:`refresh_search_index` to converge first."""
    st = search_index_status(catalog, index)
    if not st["consistent"]:
        raise ValueError(
            f"search index {index!r} views pin different base snapshots "
            f"({st['postings']['pinned_base_snapshot']} vs "
            f"{st['docs']['pinned_base_snapshot']}): a refresh was "
            "interrupted; run refresh_search_index to converge"
        )
    postings = read_matview(catalog, _postings_view(index)).select(
        "term", "doc_id", "dl", F.col("n_rows").alias("tf")
    )
    docs = read_matview(catalog, _docs_view(index))
    stats = docs.agg(
        F.sum("n_rows").alias("n_docs"),
        F.sum("dl_sum").alias("total_dl"),
    )
    qdf = query_terms_df(catalog.spark, queries)
    return topk_from_postings(postings, stats, qdf, k=k, k1=k1, b=b)
