"""Metadata-only schema evolution v2: rename / drop / widen as
commits that never rewrite data files (Iceberg ALTER TABLE semantics,
resolved like Delta column mapping).

The reference regenerates its SQLite store when layouts change
(``src/datastore.py``); at 100 TB a rename must not rewrite the table,
so the snapshot catalog maps each entry's written (physical) layout
back to the snapshot's logical schema at read time. These tests pin:
name mapping, type promotion, tombstoned drops (no resurrection),
time travel under historical schemas, stats/bloom skipping through the
mapping, DML and changelog over mapped entries, and the guards.
"""

import pytest
from pyspark.sql import functions as F

from log_parser_project_spark.catalog import SnapshotCatalog


@pytest.fixture()
def cat(spark, tmp_path):
    return SnapshotCatalog(spark, str(tmp_path / "wh"))


def _df(spark, rows, schema="k int, route string, v int"):
    return spark.createDataFrame(rows, schema)


def _base(spark, cat, **kw):
    return cat.write_table(
        _df(spark, [(1, "a", 10), (2, "b", 20), (3, "a", 30)]), "t", **kw
    )


# ------------------------------------------------------------------ rename
def test_rename_is_metadata_only_and_reads_back(spark, cat, tmp_path):
    import os

    s1 = _base(spark, cat)
    files_before = sorted(
        os.path.join(r, f)
        for r, _d, fs in os.walk(tmp_path / "wh") for f in fs
        if f.endswith(".parquet")
    )
    mtimes = {f: os.path.getmtime(f) for f in files_before}
    s2 = cat.rename_column("t", "v", "val")
    files_after = sorted(
        os.path.join(r, _f)
        for r, _d, fs in os.walk(tmp_path / "wh") for _f in fs
        if _f.endswith(".parquet")
    )
    # not a byte moved: same files, same mtimes
    assert files_after == files_before
    assert {f: os.path.getmtime(f) for f in files_after} == mtimes
    assert s2.op == "rename-column" and s2.row_count == 0
    out = cat.read_table("t")
    assert out.columns == ["k", "route", "val"]
    assert sorted((r.k, r.val) for r in out.collect()) == [(1, 10), (2, 20), (3, 30)]
    # time travel: the pre-rename snapshot keeps its own schema
    assert cat.read_table("t", as_of=s1.snapshot_id).columns == ["k", "route", "v"]


def test_rename_then_append_then_rename_back(spark, cat):
    _base(spark, cat)
    cat.rename_column("t", "v", "val")
    cat.write_table(_df(spark, [(4, "c", 40)], "k int, route string, val int"),
                    "t", mode="append")
    cat.rename_column("t", "val", "v")
    out = cat.read_table("t")
    assert out.columns == ["k", "route", "v"]
    assert sorted((r.k, r.v) for r in out.collect()) == [
        (1, 10), (2, 20), (3, 30), (4, 40)
    ]
    # a→b→a round trip must leave the ORIGINAL entries mapping-free
    # (physical name == logical name again) and only the mid-rename
    # append entry mapped
    maps = [e.get("colmap") for e in cat.snapshot("t").state]
    assert maps[0] is None or "v" not in maps[0] or maps[0]["v"] == "v"
    assert maps[1] == {"v": "val"}


def test_rename_guards(spark, cat):
    _base(spark, cat, partition_by=["route"])
    with pytest.raises(ValueError, match="partition spec"):
        cat.rename_column("t", "route", "lane")
    with pytest.raises(ValueError, match="already exists"):
        cat.rename_column("t", "v", "k")
    with pytest.raises(ValueError, match="no column"):
        cat.rename_column("t", "nope", "x")
    with pytest.raises(ValueError, match="invalid column name"):
        cat.rename_column("t", "v", "9bad")


def test_rename_hidden_spec_source_rejected(spark, cat):
    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", "x")], "k int, ts string, v string"
    ).withColumn("ts", F.to_timestamp("ts"))
    cat.write_table(df, "t", partition_by=["day(ts)"])
    with pytest.raises(ValueError, match="partition spec"):
        cat.rename_column("t", "ts", "event_ts")


def test_rename_identity_partitioned_value_column_ok(spark, cat):
    # renaming a NON-spec column of a partitioned table is fine
    _base(spark, cat, partition_by=["route"])
    cat.rename_column("t", "v", "val")
    out = cat.read_table("t")
    assert sorted((r.route, r.val) for r in out.collect()) == [
        ("a", 10), ("a", 30), ("b", 20)
    ]


# -------------------------------------------------------------------- drop
def test_drop_column_and_no_resurrection_on_readd(spark, cat):
    _base(spark, cat)
    cat.drop_column("t", "route")
    assert cat.read_table("t").columns == ["k", "v"]
    # re-add the same name: pre-drop files must read NULL, not the
    # dropped values (Iceberg's field-id discipline)
    cat.write_table(_df(spark, [(4, 40, "fresh")], "k int, v int, route string"),
                    "t", mode="append")
    rows = sorted((r.k, r.route) for r in cat.read_table("t").collect())
    assert rows == [(1, None), (2, None), (3, None), (4, "fresh")]


def test_drop_guards(spark, cat):
    cat.write_table(_df(spark, [(1, "x")], "k int, v string"), "t")
    cat.drop_column("t", "v")
    with pytest.raises(ValueError, match="only column"):
        cat.drop_column("t", "k")
    _base(spark, cat, partition_by=["route"])
    with pytest.raises(ValueError, match="partition spec"):
        cat.drop_column("t", "route")


def test_drop_on_mor_delete_key_rejected(spark, cat):
    _base(spark, cat)
    cat.merge(_df(spark, [(2, "b", 20)]), "t", on=["k"],
              when_matched="delete", when_not_matched=None, strategy="mor")
    with pytest.raises(ValueError, match="compact"):
        cat.drop_column("t", "k")
    # non-key columns evolve fine even with pending deletes
    cat.rename_column("t", "v", "val")
    assert sorted(r.k for r in cat.read_table("t").collect()) == [1, 3]


# ------------------------------------------------------------------- widen
def test_widen_int_to_bigint_and_sum(spark, cat):
    _base(spark, cat, stats_cols=["v"])
    cat.widen_column("t", "v", "bigint")
    out = cat.read_table("t")
    assert dict(out.dtypes)["v"] == "bigint"
    cat.write_table(
        _df(spark, [(4, "c", 2**40)], "k int, route string, v bigint"),
        "t", mode="append",
    )
    assert cat.read_table("t").agg(F.sum("v")).collect()[0][0] == 60 + 2**40


def test_widen_rejections(spark, cat):
    _base(spark, cat)
    for bad in ("int", "smallint", "string", "double"):
        # int→int (same), narrowing, non-numeric, and int→double
        # (not lossless for all ints under IEEE-754 semantics we allow
        # only the Iceberg list) all reject
        if bad == "double":
            with pytest.raises(ValueError, match="widen"):
                cat.widen_column("t", "v", bad)
        elif bad == "int":
            with pytest.raises(ValueError, match="widen"):
                cat.widen_column("t", "v", bad)
        else:
            with pytest.raises(ValueError, match="widen"):
                cat.widen_column("t", "v", bad)


def test_widen_twice_keeps_original_written_type(spark, cat):
    df = spark.createDataFrame([(1, 5)], "k int, v smallint")
    cat.write_table(df, "t")
    cat.widen_column("t", "v", "int")
    cat.widen_column("t", "v", "bigint")
    # the entry still records the ORIGINAL written type
    assert cat.snapshot("t").state[0]["casts"] == {"v": "short"}
    out = cat.read_table("t")
    assert dict(out.dtypes)["v"] == "bigint"
    assert out.collect()[0].v == 5


def test_widen_decimal_precision_up(spark, cat):
    df = spark.createDataFrame([(1,)], "k int").select(
        "k", F.lit("12.34").cast("decimal(6,2)").alias("d")
    )
    cat.write_table(df, "t")
    cat.widen_column("t", "d", "decimal(12,2)")
    assert dict(cat.read_table("t").dtypes)["d"] == "decimal(12,2)"
    with pytest.raises(ValueError, match="widen"):
        cat.widen_column("t", "d", "decimal(14,4)")  # scale change


# ------------------------------------------------- skipping through mapping
def test_stats_pruning_survives_rename(spark, cat):
    big = spark.range(0, 1000).select(
        F.col("id").cast("int").alias("k"),
        F.lit("r").alias("route"),
        F.col("id").cast("int").alias("v"),
    ).repartitionByRange(8, "k")
    cat.write_table(big, "t", stats_cols=["k"])
    cat.rename_column("t", "k", "key")
    snap = cat.snapshot("t")
    entry = snap.state[0]
    all_files = cat._pruned_files(entry)
    hit = cat._pruned_files(entry, predicate=("key", 10, 20))
    assert 0 < len(hit) < len(all_files)  # pruning fires on the NEW name
    got = cat.read_table("t", predicate=("key", 10, 20)).where(
        "key between 10 and 20"
    )
    assert got.count() == 11


def test_bloom_pruning_survives_rename_but_not_float_widen(spark, cat):
    big = spark.range(0, 400).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") % 40).cast("float").alias("f"),
    ).repartition(8)
    cat.write_table(big, "t", bloom_cols=["k", "f"])
    cat.rename_column("t", "k", "key")
    entry = cat.snapshot("t").state[0]
    # rename: probes keep pruning (same string image, mapped name)
    assert len(cat._pruned_files(entry, eq=("key", 7))) < len(
        cat._pruned_files(entry)
    )
    cat.widen_column("t", "f", "double")
    entry = cat.snapshot("t").state[0]
    # float→double: bloom is conservatively ignored (string images may
    # differ) — every file stays; correctness over pruning
    assert len(cat._pruned_files(entry, eq=("f", 7.0))) == len(
        cat._pruned_files(entry)
    )
    # and the read is still CORRECT
    assert cat.read_table("t", eq=("key", 7)).where("key = 7").count() == 1


# ------------------------------------------------------- DML and changelog
def test_dml_after_rename_and_widen(spark, cat):
    _base(spark, cat, stats_cols=["k"])
    cat.rename_column("t", "v", "val")
    cat.widen_column("t", "val", "bigint")
    cat.update_where("t", {"val": "val * 100"}, where="k = 2")
    # the update rewrite re-harvested stats under the CURRENT logical
    # names (its survivor file is non-empty, unlike a full-file delete)
    upd_entry = cat.snapshot("t").state[-1]
    assert upd_entry.get("files")
    assert all("k" in st for st in upd_entry["files"].values())
    cat.delete_where("t", where="k = 3")
    rows = sorted((r.k, r.val) for r in cat.read_table("t").collect())
    assert rows == [(1, 10), (2, 2000)]


def test_changelog_reads_premapped_files_under_new_schema(spark, cat):
    _base(spark, cat)
    s_ren = cat.rename_column("t", "v", "val")
    cat.update_where("t", {"val": "val + 1"}, where="k = 1")
    ch = cat.changes("t", from_snapshot=s_ren.snapshot_id)
    got = sorted(
        (r._change_type, r.k, r.val) for r in ch.collect()
    )
    # the delete side reads a PRE-rename file, projected to val
    assert got == [("delete", 1, 10), ("insert", 1, 11)]


def test_compact_materializes_mapping_away(spark, cat):
    _base(spark, cat)
    cat.rename_column("t", "v", "val")
    cat.widen_column("t", "val", "bigint")
    cat.compact("t")
    snap = cat.snapshot("t")
    assert all(
        not e.get("colmap") and not e.get("casts") for e in snap.state
    )
    assert sorted((r.k, r.val) for r in cat.read_table("t").collect()) == [
        (1, 10), (2, 20), (3, 30)
    ]


def test_evolution_commits_are_cas_protected(spark, cat):
    from dataclasses import replace
    import uuid

    from log_parser_project_spark.catalog import CommitConflict

    _base(spark, cat)
    ren = cat.rename_column("t", "v", "val")
    stale = replace(ren, snapshot_id=uuid.uuid4().hex[:16])
    # same parent as the applied rename → pointer moved → conflict
    with pytest.raises(CommitConflict):
        cat._commit("t", stale)


# --------------------------------------------------------------- add_column
def test_add_column_metadata_only(spark, cat):
    _base(spark, cat)
    s = cat.add_column("t", "score", "double")
    assert s.op == "add-column" and s.row_count == 0
    out = cat.read_table("t")
    assert out.columns == ["k", "route", "v", "score"]
    assert all(r.score is None for r in out.collect())
    cat.write_table(
        _df(spark, [(4, "d", 40, 0.5)], "k int, route string, v int, score double"),
        "t", mode="append",
    )
    assert sorted((r.k, r.score) for r in cat.read_table("t").collect()) == [
        (1, None), (2, None), (3, None), (4, 0.5)
    ]


def test_add_column_never_resurrects_old_bytes(spark, cat):
    # a physical column that once existed, was dropped, and is added
    # again must NOT leak old values through the new logical column
    _base(spark, cat)
    cat.drop_column("t", "v")
    cat.add_column("t", "v", "int")
    assert all(r.v is None for r in cat.read_table("t").collect())


def test_add_column_guards(spark, cat):
    _base(spark, cat)
    with pytest.raises(ValueError, match="already exists"):
        cat.add_column("t", "v", "int")
    with pytest.raises(ValueError, match="invalid column name"):
        cat.add_column("t", "2bad", "int")


# -------------------------------------------------- partition spec evolution
def test_update_partition_spec_hidden_transforms(spark, cat):
    df = spark.createDataFrame(
        [(1, "2024-01-05 03:00:00", "a"), (2, "2024-02-10 04:00:00", "b")],
        "k int, ts string, v string",
    ).withColumn("ts", F.to_timestamp("ts"))
    cat.write_table(df, "t", partition_by=["day(ts)"])
    s = cat.update_partition_spec("t", ["month(ts)"])
    assert s.op == "update-spec" and s.row_count == 0
    # appends now INHERIT the new spec without restating it
    app = spark.createDataFrame(
        [(3, "2024-03-15 05:00:00", "c")], "k int, ts string, v string"
    ).withColumn("ts", F.to_timestamp("ts"))
    s2 = cat.write_table(app, "t", mode="append")
    assert [x["transform"] for x in s2.partition_spec] == ["month"]
    out = cat.read_table("t")
    assert out.columns == ["k", "ts", "v"]  # hidden stays hidden
    assert sorted(r.k for r in out.collect()) == [1, 2, 3]
    # source-range read across BOTH layouts stays correct
    got = cat.read_table(
        "t", predicate=("ts", "2024-02-01", "2024-03-31")
    ).where("ts >= '2024-02-01' and ts < '2024-04-01'")
    assert sorted(r.k for r in got.collect()) == [2, 3]


def test_update_partition_spec_guards(spark, cat):
    _base(spark, cat, partition_by=["route"])
    with pytest.raises(ValueError, match="already has"):
        cat.update_partition_spec("t", ["route"])
    with pytest.raises(ValueError, match="missing from table schema"):
        cat.update_partition_spec("t", ["day(nope)"])
    # append with a DIFFERENT hidden spec still rejected: evolution
    # goes through update_partition_spec, not a write
    cat.update_partition_spec("t", ["bucket(4, k)"])
    with pytest.raises(ValueError, match="hidden-partitioned"):
        cat.write_table(
            _df(spark, [(9, "z", 90)]), "t", mode="append",
            partition_by=["bucket(8, k)"],
        )


def test_update_partition_spec_unpartition(spark, cat):
    _base(spark, cat, partition_by=["route"])
    cat.update_partition_spec("t", None)
    cat.write_table(_df(spark, [(4, "d", 40)]), "t", mode="append")
    assert sorted(r.k for r in cat.read_table("t").collect()) == [1, 2, 3, 4]
