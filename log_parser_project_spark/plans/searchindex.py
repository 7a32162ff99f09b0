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
from ..operators.search import (
    doc_length_rows,
    postings_rows,
    query_terms_df,
    topk_from_postings,
)
from .matview import (
    _definition,
    _netted_read,
    _sweep_pin_tags,
    create_matview,
    matview_status,
    refresh_matview,
    register_transform,
)

# The row-level builders live in operators/search.py — ONE source of
# truth for index tokenization, shared by the one-shot build_postings
# and these registered transform names (a drift between the two paths
# would silently break index-vs-one-shot equivalence).
register_transform("postings_rows")(postings_rows)
register_transform("doc_length_rows")(doc_length_rows)


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
    """Build the index over ONE base snapshot — the only full corpus
    scan this index will ever take. Both views pin the SAME base cut
    (resolved once, passed as ``base_as_of``), so a base writer
    landing between the two creates cannot produce a born-inconsistent
    index. ``id_col`` values must be unique per document. If the
    second create fails (name taken, crash), the first view's pin
    tags are released before re-raising so the half-created index
    never anchors the base against retention; retry with
    ``replace=True`` to rebuild over the leftover table. Returns the
    two view commits keyed by table name."""
    base_snap = catalog.snapshot(base_table)
    if base_snap is None:
        raise LookupError(f"no committed base table {base_table!r}")
    args = {"id_col": id_col, "text_col": text_col}
    snaps = {
        _postings_view(index): create_matview(
            catalog,
            _postings_view(index),
            base_table,
            group_by=["term", "doc_id", "dl"],
            transform=("postings_rows", args),
            replace=replace,
            base_as_of=base_snap.snapshot_id,
        )
    }
    try:
        snaps[_docs_view(index)] = create_matview(
            catalog,
            _docs_view(index),
            base_table,
            group_by=["doc_id"],
            sums={"dl_sum": "dl"},
            transform=("doc_length_rows", args),
            replace=replace,
            base_as_of=base_snap.snapshot_id,
        )
    except BaseException:
        _sweep_pin_tags(catalog, _postings_view(index), base_table, "")
        raise
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
    (``operators/search.topk_from_postings``).

    The read is a CONSISTENT CUT: both view heads are captured once,
    their pinned base snapshots compared from those exact commits, and
    the data read ``as_of`` the same heads — so a refresh landing
    between the check and the read cannot shear the result into
    postings of one index generation scored against the stats of
    another (the check-then-read race a live-head read would have).
    Raises if the captured heads pin different base snapshots (a
    crashed or in-flight refresh) — rerun
    :func:`refresh_search_index` to converge first."""
    p_head = catalog.snapshot(_postings_view(index))
    d_head = catalog.snapshot(_docs_view(index))
    if p_head is None or d_head is None:
        raise LookupError(f"no search index {index!r} in this warehouse")
    mv_p, p_snap = _definition(catalog, _postings_view(index), as_of=p_head.snapshot_id)
    mv_d, d_snap = _definition(catalog, _docs_view(index), as_of=d_head.snapshot_id)
    if mv_p["base_snapshot"] != mv_d["base_snapshot"]:
        raise ValueError(
            f"search index {index!r} views pin different base snapshots "
            f"({mv_p['base_snapshot']} vs {mv_d['base_snapshot']}): a "
            "refresh was interrupted or is in flight; run "
            "refresh_search_index to converge"
        )
    postings = _netted_read(
        catalog, _postings_view(index), mv_p, p_snap, as_of=p_head.snapshot_id
    ).select("term", "doc_id", "dl", F.col("n_rows").alias("tf"))
    docs = _netted_read(
        catalog, _docs_view(index), mv_d, d_snap, as_of=d_head.snapshot_id
    )
    stats = docs.agg(
        F.sum("n_rows").alias("n_docs"),
        F.sum("dl_sum").alias("total_dl"),
    )
    qdf = query_terms_df(catalog.spark, queries)
    return topk_from_postings(postings, stats, qdf, k=k, k1=k1, b=b)
