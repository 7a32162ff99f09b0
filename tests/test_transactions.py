"""Multi-table atomic transactions: one staged write per table, one
commit record, all pointers flip together — the catalog-level
transaction Iceberg defers to its catalog. Crash windows are replayed
by recover_transactions(); concurrent single-table commits abort the
whole transaction (CommitConflict) instead of losing either side.

The north rule's exactly-once commit requirement applied across
tables: corpus + dedup-index tables must never be observable half
advanced (plans/corpus.py commit_increment rides this).
"""

import dataclasses
import json
import os
import time

import pytest

from log_parser_project_spark.catalog import (
    CatalogTransaction,
    CommitConflict,
    SnapshotCatalog,
)


@pytest.fixture()
def cat(spark, tmp_path):
    return SnapshotCatalog(spark, str(tmp_path / "wh"))


def _df(spark, rows, schema="k int, v string"):
    return spark.createDataFrame(rows, schema)


def test_transaction_commits_all_tables_atomically(spark, cat):
    with cat.transaction() as txn:
        txn.write_table(_df(spark, [(1, "d")]), "docs")
        txn.write_table(_df(spark, [(1, "b")]), "bands")
        txn.write_table(_df(spark, [(1, "f")]), "fps")
        # inside the block nothing is visible yet
        assert cat.snapshot("docs") is None
        assert cat.snapshot("fps") is None
    for t in ("docs", "bands", "fps"):
        assert cat.read_table(t).count() == 1
        assert cat.snapshot(t).staged is False
    assert not os.listdir(cat._txn_dir)  # record consumed


def test_transaction_exception_leaves_nothing_visible(spark, cat):
    cat.write_table(_df(spark, [(0, "seed")]), "docs")
    with pytest.raises(RuntimeError, match="boom"):
        with cat.transaction() as txn:
            txn.write_table(_df(spark, [(1, "x")]), "docs", mode="append")
            txn.write_table(_df(spark, [(1, "y")]), "bands")
            raise RuntimeError("boom")
    assert cat.read_table("docs").count() == 1
    assert cat.snapshot("bands") is None
    # the stages were swept, not left pending
    assert cat._pending_stages("docs") == []
    assert cat._pending_stages("bands") == []


def test_transaction_conflict_aborts_whole_transaction(spark, cat):
    cat.write_table(_df(spark, [(0, "seed")]), "docs")
    cat.write_table(_df(spark, [(0, "seed")]), "bands")
    txn = CatalogTransaction(cat)
    txn.write_table(_df(spark, [(1, "x")]), "docs", mode="append")
    txn.write_table(_df(spark, [(1, "y")]), "bands", mode="append")
    winner = cat.write_table(_df(spark, [(9, "w")]), "docs", mode="append")
    with pytest.raises(CommitConflict, match="whole transaction aborts"):
        txn.commit()
    txn.abandon()
    # neither table advanced past the winner
    assert cat.snapshot("docs").snapshot_id == winner.snapshot_id
    assert cat.read_table("bands").count() == 1


def test_transaction_guards(spark, cat):
    with pytest.raises(ValueError, match="already staged"):
        with cat.transaction() as txn:
            txn.write_table(_df(spark, [(1, "a")]), "t")
            txn.write_table(_df(spark, [(2, "b")]), "t", mode="append")
    with pytest.raises(ValueError, match="branch"):
        with cat.transaction() as txn:
            txn.write_table(_df(spark, [(1, "a")]), "t2", branch="b")
    # failed transactions left nothing
    assert cat.snapshot("t") is None and cat.snapshot("t2") is None


def test_crash_between_flips_is_recovered(spark, cat):
    """Simulate the worst window: commit record written, ONE of two
    pointers flipped, crash. recover_transactions() must finish the
    other flip idempotently."""
    cat.write_table(_df(spark, [(0, "seed")]), "docs")
    cat.write_table(_df(spark, [(0, "seed")]), "bands")
    txn = CatalogTransaction(cat)
    txn.write_table(_df(spark, [(1, "d")]), "docs", mode="append")
    txn.write_table(_df(spark, [(1, "b")]), "bands", mode="append")
    staged = dict(txn._staged)
    rec = {
        "txn_id": "cafe0000cafe0000",
        "tables": {t: s.snapshot_id for t, s in staged.items()},
        "created_at_unix": time.time(),
    }
    with open(os.path.join(cat._txn_dir, f"{rec['txn_id']}.json"), "w") as f:
        json.dump(rec, f)
    s = staged["bands"]
    s.staged = False
    s.committed_at_unix = time.time()
    with open(cat._log_path("bands"), "a") as f:
        f.write(json.dumps(dataclasses.asdict(s)) + "\n")
    cat._flip_pointer("bands", s)
    # crash here: bands=2 rows, docs still 1
    assert cat.read_table("bands").count() == 2
    assert cat.read_table("docs").count() == 1
    assert cat.recover_transactions() == [rec["txn_id"]]
    assert cat.read_table("docs").count() == 2
    assert cat.read_table("bands").count() == 2
    assert not os.listdir(cat._txn_dir)
    # idempotent: a second recovery is a no-op
    assert cat.recover_transactions() == []


def test_recovery_refuses_diverged_table(spark, cat):
    """A table that advanced DIVERGENTLY past an incomplete
    transaction is a manual-resolution case, never a silent discard."""
    cat.write_table(_df(spark, [(0, "seed")]), "docs")
    txn = CatalogTransaction(cat)
    txn.write_table(_df(spark, [(1, "d")]), "docs", mode="append")
    sid = txn._staged["docs"].snapshot_id
    rec = {"txn_id": "beef0000beef0000", "tables": {"docs": sid},
           "created_at_unix": time.time()}
    with open(os.path.join(cat._txn_dir, f"{rec['txn_id']}.json"), "w") as f:
        json.dump(rec, f)
    # a foreign commit lands before recovery runs
    cat.write_table(_df(spark, [(9, "w")]), "docs", mode="append")
    with pytest.raises(CommitConflict, match="diverged past incomplete"):
        cat.recover_transactions()
    # the record survives for the operator
    assert len(os.listdir(cat._txn_dir)) == 1


def test_commit_increment_is_atomic_across_tables(spark, cat):
    """commit_increment on a SnapshotCatalog rides the transaction:
    all three tables advance with equal doc counts, and the report is
    unchanged vs the ordered-write path."""
    from log_parser_project_spark.plans.corpus import commit_increment

    docs = spark.createDataFrame(
        [("d1", "alpha beta gamma delta"), ("d2", "alpha beta gamma delta"),
         ("d3", "完全 different text here")],
        "doc_id string, text string",
    )
    rep = commit_increment(cat, docs, table="corpus")
    kept = {r.doc_id for r in rep.filter("status = 'kept'").collect()}
    assert len(kept) == 2  # d1/d2 are exact dups, one survives
    n = cat.read_table("corpus").count()
    assert n == 2
    assert cat.read_table("corpus_index_docs").count() == n
    # second increment dedups against committed history atomically too
    rep2 = commit_increment(
        cat, spark.createDataFrame(
            [("d9", "alpha beta gamma delta")], "doc_id string, text string"
        ), table="corpus",
    )
    assert rep2.filter("status = 'kept'").count() == 0
    assert cat.read_table("corpus").count() == 2
    assert not os.listdir(cat._txn_dir)
