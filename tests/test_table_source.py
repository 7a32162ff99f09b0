"""Snapshot tables as a streaming source: cursor-checkpointed,
per-commit delivery of `SnapshotCatalog` history — the Iceberg
structured-streaming read re-expressed as availableNow drains."""

import pytest

from log_parser_project_spark.catalog import SnapshotCatalog
from log_parser_project_spark.streaming.table_source import TableCommitStream


def _df(spark, rows, schema="k int, route string, v string"):
    return spark.createDataFrame(rows, schema)


@pytest.fixture()
def cat(spark, tmp_path):
    return SnapshotCatalog(spark, str(tmp_path / "wh"))


def _collect(batch):
    return sorted((r.k, r.route, r.v) for r in batch.df.collect())


def test_drain_delivers_each_commit_once_in_order(spark, cat, tmp_path):
    s1 = cat.write_table(_df(spark, [(1, "a", "x")]), "t")
    s2 = cat.write_table(_df(spark, [(2, "b", "y")]), "t", mode="append")
    src = TableCommitStream(cat, "t", str(tmp_path / "ckpt"))
    seen = []
    done = src.drain(lambda b: seen.append((b.snapshot_id, b.op, _collect(b))))
    assert done == [s1.snapshot_id, s2.snapshot_id]
    assert seen == [
        (s1.snapshot_id, "overwrite", [(1, "a", "x")]),
        (s2.snapshot_id, "append", [(2, "b", "y")]),
    ]
    # nothing pending until a new commit lands
    assert src.drain(lambda b: seen.append("UNEXPECTED")) == []
    s3 = cat.write_table(_df(spark, [(3, "c", "z")]), "t", mode="append")
    assert src.drain(lambda b: seen.append(_collect(b))) == [s3.snapshot_id]
    assert seen[-1] == [(3, "c", "z")]


def test_failed_commit_is_redelivered(spark, cat, tmp_path):
    cat.write_table(_df(spark, [(1, "a", "x")]), "t")
    s2 = cat.write_table(_df(spark, [(2, "b", "y")]), "t", mode="append")
    src = TableCommitStream(cat, "t", str(tmp_path / "ckpt"))
    calls = []

    def boom(batch):
        calls.append(batch.snapshot_id)
        if batch.snapshot_id == s2.snapshot_id:
            raise RuntimeError("sink down")

    with pytest.raises(RuntimeError):
        src.drain(boom)
    # cursor stayed on the last SUCCESS: the failed commit re-delivers
    assert src.drain(lambda b: calls.append(b.snapshot_id)) == [s2.snapshot_id]
    assert calls.count(s2.snapshot_id) == 2


def test_initial_latest_skips_history(spark, cat, tmp_path):
    cat.write_table(_df(spark, [(1, "a", "x")]), "t")
    src = TableCommitStream(cat, "t", str(tmp_path / "ckpt"), initial="latest")
    assert src.drain(lambda b: pytest.fail("history must be skipped")) == []
    s2 = cat.write_table(_df(spark, [(2, "b", "y")]), "t", mode="append")
    assert src.drain(lambda b: None) == [s2.snapshot_id]


def test_appends_mode_delivers_only_added_rows_on_overwrite(spark, cat, tmp_path):
    cat.write_table(_df(spark, [(1, "a", "x"), (2, "b", "y")]), "t")
    src = TableCommitStream(cat, "t", str(tmp_path / "ckpt"))
    src.drain(lambda b: None)
    cat.write_table(_df(spark, [(9, "z", "new")]), "t")  # overwrite
    got = []
    src.drain(lambda b: got.extend(_collect(b)))
    assert got == [(9, "z", "new")]  # added rows only; removals invisible


def test_changelog_mode_is_row_accurate_across_merge(spark, cat, tmp_path):
    cat.write_table(
        _df(spark, [(1, "a", "x"), (2, "a", "y"), (3, "b", "z")]),
        "t", partition_by=["route"],
    )
    src = TableCommitStream(cat, "t", str(tmp_path / "ckpt"), mode="changelog")
    src.drain(lambda b: None)
    cat.merge(_df(spark, [(2, "a", "Y2")]), "t", on=["route", "k"],
              partition_by=["route"])
    rows = []
    src.drain(lambda b: rows.extend(
        sorted((r.k, r.v, r._change_type) for r in b.df.collect())
    ))
    assert rows == [(2, "Y2", "insert"), (2, "y", "delete")]


def test_expired_cursor_raises_instead_of_skipping(spark, cat, tmp_path):
    s1 = cat.write_table(_df(spark, [(1, "a", "x")]), "t")
    src = TableCommitStream(cat, "t", str(tmp_path / "ckpt"))
    src.drain(lambda b: None)
    cat.write_table(_df(spark, [(2, "b", "y")]), "t", mode="append")
    cat.expire_snapshots("t", keep_last=1)  # s1 (the cursor) expires
    assert src.cursor() == s1.snapshot_id
    with pytest.raises(LookupError, match="no longer in table"):
        src.pending()


def test_batches_without_ack_leaves_cursor(spark, cat, tmp_path):
    s1 = cat.write_table(_df(spark, [(1, "a", "x")]), "t")
    src = TableCommitStream(cat, "t", str(tmp_path / "ckpt"))
    batches = list(src.batches())
    assert [b.snapshot_id for b in batches] == [s1.snapshot_id]
    assert src.cursor() is None  # peeking does not consume
    src.ack(batches[0])
    assert src.cursor() == s1.snapshot_id
    assert list(src.batches()) == []


def test_max_commits_bounds_a_drain(spark, cat, tmp_path):
    ids = [
        cat.write_table(_df(spark, [(i, "a", "x")]), "t",
                        mode="overwrite" if i == 0 else "append").snapshot_id
        for i in range(3)
    ]
    src = TableCommitStream(cat, "t", str(tmp_path / "ckpt"))
    assert src.drain(lambda b: None, max_commits=2) == ids[:2]
    assert src.drain(lambda b: None) == ids[2:]
