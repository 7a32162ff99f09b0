"""Incremental IVF vector index (plans/vectorindex.py): index-vs-
brute-force equivalence under append/update/delete in exact mode,
delta-sized refreshes, cell re-assignment on update, de-indexing on
delete, compaction invariance, probe-subset recall on planted
clusters, and the lineage/status surface. The oracle-value pin runs in
test_duckdb_parity.py (q_vec_incremental_knn)."""

import pytest
from pyspark.sql import functions as F

from log_parser_project_spark.catalog import SnapshotCatalog
from log_parser_project_spark.operators.similarity import brute_force_topk
from log_parser_project_spark.plans.vectorindex import (
    compact_vector_index,
    create_vector_index,
    refresh_vector_index,
    vector_index_status,
    vector_index_topk,
)

# two planted clusters on distinct axes plus an outlier, 4-dim.
# ids 1 and 2 sit in DIFFERENT clusters on purpose: kmeans_centroids
# seeds from the first k vectors by id, so the two cells start (and
# stay) separated on the two axes — the planted-cluster tests below
# rely on that.
VECS_V1 = [
    (1, [1.0, 0.1, 0.0, 0.0]),
    (2, [0.0, 0.0, 1.0, 0.1]),
    (3, [0.9, 0.2, 0.0, 0.0]),
    (4, [0.0, 0.1, 0.9, 0.0]),
    (5, [0.3, 0.3, 0.3, 0.3]),
]
APPENDED = [(6, [1.0, 0.0, 0.1, 0.0]), (7, [0.0, 0.0, 1.0, 0.3])]
SCHEMA = "vec_id long, embedding array<float>"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def cat(spark, tmp_path):
    return SnapshotCatalog(spark, str(tmp_path / "wh"))


def _seed(spark, cat, n_cells=2):
    df = spark.createDataFrame(VECS_V1, SCHEMA)
    cat.write_table(df, "vecs")
    create_vector_index(cat, "vidx", "vecs", n_cells=n_cells, kmeans_iters=2)
    return df


def _mutate(spark, cat):
    """Append two vectors, flip vector 1 to the OTHER cluster's axis,
    delete vector 3 — each followed by an O(delta) refresh."""
    cat.write_table(
        spark.createDataFrame(APPENDED, SCHEMA), "vecs", mode="append"
    )
    refresh_vector_index(cat, "vidx")
    cat.update_where(
        "vecs",
        {"embedding": F.reverse(F.col("embedding"))},
        where=F.col("vec_id") == 1,
    )
    refresh_vector_index(cat, "vidx")
    cat.delete_where("vecs", where=F.col("vec_id") == 3)
    refresh_vector_index(cat, "vidx")


def test_exact_mode_matches_brute_force_after_mutations(spark, cat):
    _seed(spark, cat)
    _mutate(spark, cat)
    final = cat.read_table("vecs")
    got = vector_index_topk(cat, "vidx", final, k=3, n_probe=None)
    want = brute_force_topk(final, final, k=3)
    assert _rows(got) == _rows(want)


def test_refresh_is_delta_sized(spark, cat):
    _seed(spark, cat)
    raw_before = cat.read_table("vidx_cells").count()
    cat.write_table(
        spark.createDataFrame(APPENDED, SCHEMA), "vecs", mode="append"
    )
    refresh_vector_index(cat, "vidx")
    # the refresh appended exactly one delta row per NEW vector —
    # nothing about the five existing postings was rewritten
    assert cat.read_table("vidx_cells").count() == raw_before + len(APPENDED)


def test_delete_deindexes_vector(spark, cat):
    _seed(spark, cat)
    cat.delete_where("vecs", where=F.col("vec_id") == 3)
    refresh_vector_index(cat, "vidx")
    from log_parser_project_spark.plans.matview import read_matview

    live = read_matview(cat, "vidx_cells")
    assert live.filter(F.col("vec_id") == 3).count() == 0
    assert live.count() == len(VECS_V1) - 1


def test_update_moves_vector_to_new_cell(spark, cat):
    _seed(spark, cat)
    from log_parser_project_spark.plans.matview import read_matview

    def cell_of(vid):
        rows = read_matview(cat, "vidx_cells").filter(
            F.col("vec_id") == vid
        ).collect()
        assert len(rows) == 1  # exactly one live posting per vector
        return rows[0]["cell"], list(rows[0]["emb"])

    old_cell, old_emb = cell_of(1)
    # reversing [1, .1, 0, 0] → [0, 0, .1, 1] flips it to the other
    # planted cluster's axis, so its nearest centroid must change
    cat.update_where(
        "vecs",
        {"embedding": F.reverse(F.col("embedding"))},
        where=F.col("vec_id") == 1,
    )
    refresh_vector_index(cat, "vidx")
    new_cell, new_emb = cell_of(1)
    assert new_cell != old_cell
    assert new_emb == list(reversed(old_emb))


def test_compaction_preserves_results(spark, cat):
    _seed(spark, cat)
    _mutate(spark, cat)
    final = cat.read_table("vecs")
    before = _rows(vector_index_topk(cat, "vidx", final, k=3))
    n_raw = cat.read_table("vidx_cells").count()
    compact_vector_index(cat, "vidx")
    assert _rows(vector_index_topk(cat, "vidx", final, k=3)) == before
    assert cat.read_table("vidx_cells").count() < n_raw


def test_probe_one_cell_finds_cluster_neighbors(spark, cat):
    _seed(spark, cat)
    # query on the first cluster's axis, probing ONE cell: the same-
    # cluster neighbors must come back, ranked exactly as brute force
    # ranks them (the global top-2 lives inside that cluster)
    q = spark.createDataFrame([(100, [1.0, 0.0, 0.0, 0.0])], SCHEMA)
    got = vector_index_topk(cat, "vidx", q, k=2, n_probe=1)
    ids = [r["neighbor_id"] for r in got.orderBy("rank").collect()]
    exact = brute_force_topk(cat.read_table("vecs"), q, k=2)
    assert ids == [r["neighbor_id"] for r in exact.orderBy("rank").collect()]


def test_status_and_lineage(spark, cat):
    _seed(spark, cat, n_cells=2)
    st = vector_index_status(cat, "vidx")
    assert st["fresh"] and st["n_cells"] == 2 and st["dim"] == 4
    cat.write_table(
        spark.createDataFrame(APPENDED, SCHEMA), "vecs", mode="append"
    )
    st = vector_index_status(cat, "vidx")
    assert not st["fresh"] and st["lag_commits"] == 1
    mv = (cat.history("vidx_cells")[-1].lineage or {})["mv"]
    assert mv["transform"]["name"] == "ivf_cell_rows"
    assert len(mv["transform"]["args"]["centroids"]) == 2


def test_create_on_empty_base_fails(spark, cat):
    cat.write_table(
        spark.createDataFrame([], SCHEMA), "vecs"
    )
    with pytest.raises(ValueError, match="no usable"):
        create_vector_index(cat, "vidx", "vecs")


def test_malformed_vectors_are_ignored(spark, cat):
    rows = VECS_V1 + [(8, None), (9, [1.0, 2.0])]  # null + wrong width
    cat.write_table(spark.createDataFrame(rows, SCHEMA), "vecs")
    create_vector_index(cat, "vidx", "vecs", n_cells=2, kmeans_iters=1)
    from log_parser_project_spark.plans.matview import read_matview

    assert read_matview(cat, "vidx_cells").count() == len(VECS_V1)
    good = cat.read_table("vecs").filter(F.col("vec_id") <= 5)
    got = vector_index_topk(cat, "vidx", good, k=2)
    want = brute_force_topk(good, good, k=2)
    assert _rows(got) == _rows(want)
