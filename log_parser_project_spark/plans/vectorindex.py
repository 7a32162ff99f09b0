"""Incrementally-maintained IVF vector index: ANN postings as ONE
TRANSFORMED materialized view.

A one-shot IVF build (``operators/similarity.ivf_topk``) re-scans and
re-assigns the whole corpus on every call; at 100 TB the index must
instead FOLLOW the embedding table — new vectors indexed, deleted
vectors de-indexed, re-embedded vectors moved to their new cell —
reading only what changed. That is the transformed-matview machinery
(``plans/matview.py``) again: the cell-postings relation IS

    SELECT cell, vec_id, emb, COUNT(*) AS n_rows
    FROM ivf_assign(vecs) GROUP BY cell, vec_id, emb

a COUNT-only materialized view over a row-local flatMap of the base
table. Centroids are trained ONCE at create (deterministic spherical
k-means, ``operators/similarity.kmeans_centroids``) and frozen as
literals inside the view's transform lineage — the Faiss/IVF
contract: assignments stay immutable so the index is append-cheap;
re-train = recreate. Every matview guarantee transfers: O(changed
vectors) refresh off the base changelog, serializable delta commits
(``expected_parent``), pin tags protecting the changelog window from
retention, compaction that nets delta rows.

Storing ``emb`` in the GROUP KEY denormalizes the vector into its
posting (the standard IVF layout) so queries never rejoin the corpus:
an UPDATE surfaces in the changelog as delete(old)+insert(new), the
old ``(cell, vec_id, emb_old)`` group nets to zero and vanishes while
``(cell, vec_id, emb_new)`` appears — the denormalization maintains
itself, exactly like the BM25 index's ``dl`` key
(``plans/searchindex.py``).

Query modes share one plan (explode query → probed cells, candidate
equi-join on the cell key, exact cosine re-rank of candidates — no
Cartesian node anywhere):

* ``n_probe=None`` probes EVERY cell → bit-equal to brute force
  regardless of centroid quality or low-order float drift in
  training — the *exact* mode the DuckDB oracle pins
  (``q_vec_incremental_knn``).
* ``n_probe=p`` probes each query's p nearest cells → the ANN scale
  path: candidates ∝ corpus/p per query, recall-tested in pytest like
  the one-shot IVF.

The reference has no vector surface at all; this is the
embedding-side twin of the text search index.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..catalog import Snapshot, SnapshotCatalog
from ..operators.similarity import dot, ivf_cell_rows, kmeans_centroids, norm
from .matview import (
    _definition,
    _netted_read,
    create_matview,
    matview_status,
    refresh_matview,
    register_transform,
)

register_transform("ivf_cell_rows")(ivf_cell_rows)


def _cells_view(index: str) -> str:
    return f"{index}_cells"


def create_vector_index(
    catalog: SnapshotCatalog,
    index: str,
    base_table: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    kmeans_iters: int = 3,
    replace: bool = False,
) -> Snapshot:
    """Train centroids and build the postings view over ONE base
    snapshot — the only full corpus scan this index will ever take
    (training and assignment read the SAME pinned cut, so a writer
    landing mid-create cannot split them). ``id_col`` values must be
    unique per vector. Centroids ride the view's lineage as transform
    args, so a refresh in a fresh session needs no side-channel
    state."""
    base_snap = catalog.snapshot(base_table)
    if base_snap is None:
        raise LookupError(f"no committed base table {base_table!r}")
    cents = kmeans_centroids(
        catalog.read_table(base_table, as_of=base_snap.snapshot_id),
        n_cells,
        iters=kmeans_iters,
        id_col=id_col,
        vec_col=vec_col,
    )
    if not cents:
        raise ValueError(
            f"cannot train centroids: {base_table!r} has no usable "
            f"{vec_col!r} vectors"
        )
    return create_matview(
        catalog,
        _cells_view(index),
        base_table,
        group_by=["cell", "vec_id", "emb"],
        transform=(
            "ivf_cell_rows",
            {"centroids": cents, "id_col": id_col, "vec_col": vec_col},
        ),
        replace=replace,
        base_as_of=base_snap.snapshot_id,
    )


def refresh_vector_index(catalog: SnapshotCatalog, index: str) -> Snapshot | None:
    """Advance the index to the base table's current snapshot — an
    O(changed vectors + touched cells) delta append; None when the
    base has not moved (a refresh cron is free on idle tables)."""
    return refresh_matview(catalog, _cells_view(index))


def vector_index_status(catalog: SnapshotCatalog, index: str) -> dict:
    """Freshness probe (see ``matview_status``) plus the frozen
    quantizer's shape."""
    st = matview_status(catalog, _cells_view(index))
    mv, _ = _definition(catalog, _cells_view(index))
    cents = mv["transform"]["args"]["centroids"]
    st["n_cells"] = len(cents)
    st["dim"] = len(cents[0]) if cents else 0
    return st


def compact_vector_index(catalog: SnapshotCatalog, index: str) -> Snapshot:
    """Fold accumulated delta rows to one row per live posting."""
    from .matview import compact_matview

    return compact_matview(catalog, _cells_view(index))


def _probe_cells(qvec: Column, cents: list[list[float]], n_probe: int) -> Column:
    """The query's ``n_probe`` nearest cells by centroid dot score
    (unit-norm centroids ⇒ cosine order), ties to the lower cell id —
    same ranking as the one-shot ``ivf_topk``."""
    sims = F.array(
        *[dot(F.array(*[F.lit(float(x)) for x in c]), qvec) for c in cents]
    )
    ranked = F.array_sort(
        F.zip_with(
            sims,
            F.sequence(F.lit(0), F.lit(len(cents) - 1)),
            lambda s, i: F.struct((-s).alias("neg"), i.cast("int").alias("cell")),
        )
    )
    return F.slice(F.transform(ranked, lambda x: x["cell"]), 1, n_probe)


def vector_index_topk(
    catalog: SnapshotCatalog,
    index: str,
    queries: DataFrame,
    k: int = 3,
    n_probe: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cosine top-``k`` neighbors per query vector against the
    PERSISTED index — no read of the base table at all. ``queries`` is
    a (usually small) frame of ``(id_col, vec_col)``; each query is
    exploded to its probed cells (every cell when ``n_probe`` is None
    — the exact mode), candidates come from a broadcast equi-join on
    the cell key, and the exact re-rank scores only candidates:
    ``round(dot/(‖q‖‖c‖), 4)`` desc, neighbor id asc, self-pairs
    excluded — the same output contract as
    ``operators/similarity.brute_force_topk``.

    The read is a consistent single-commit cut: the view head is
    captured once and both the definition (centroids) and the data are
    resolved ``as_of`` that commit, so a refresh landing mid-query
    cannot score generation-A postings against generation-B
    centroids."""
    view = _cells_view(index)
    head = catalog.snapshot(view)
    if head is None:
        raise LookupError(f"no vector index {index!r} in this warehouse")
    mv, view_snap = _definition(catalog, view, as_of=head.snapshot_id)
    cents = mv["transform"]["args"]["centroids"]
    # norms are per-vector, not per-pair: compute them once on each
    # side of the join (|postings| + |queries| aggregates) instead of
    # inside the pair expression — same discipline as brute_force_topk
    postings = _netted_read(
        catalog, view, mv, view_snap, as_of=head.snapshot_id
    ).select(
        "cell",
        F.col("vec_id").alias("neighbor_id"),
        F.col("emb").alias("cvec"),
        norm(F.col("emb")).alias("cn"),
    )
    p = len(cents) if n_probe is None else min(n_probe, len(cents))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        norm(F.col(vec_col)).alias("qn"),
        F.explode(_probe_cells(F.col(vec_col), cents, p)).alias("cell"),
    )
    from pyspark.sql import Window

    scored = (
        postings.join(F.broadcast(q), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "sim",
            F.round(
                dot(F.col("qvec"), F.col("cvec")) / (F.col("qn") * F.col("cn")),
                4,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )
