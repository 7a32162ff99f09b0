"""Model-based check of SnapshotCatalog: random op sequences
(overwrite / append / replace_partitions / expire) must agree with a
pure-Python model of Iceberg table semantics — current state, every
live snapshot's time-travel state, and history length."""

import pyspark.sql.functions as F
import pytest

from log_parser_project_spark.catalog import SnapshotCatalog

SCHEMA = "k int, route string, v string"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _vals(df):
    return sorted((r.k, r.route, r.v) for r in df.collect())


def _rows_for(seed: int, i: int):
    """Deterministic small row set; route drawn from {a, b, c}."""
    base = (seed * 31 + i * 7) % 97
    return [
        (base + j, "abc"[(base + j) % 3], f"v{seed}.{i}.{j}") for j in range(3)
    ]


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
def test_random_op_sequence_matches_model(spark, tmp_path, seed):
    cat = SnapshotCatalog(spark, str(tmp_path / f"wh{seed}"))
    model_states: list[list[tuple]] = []  # committed state per snapshot
    ops = ["overwrite", "append", "replace_partitions", "merge",
           "overwrite", "append", "replace_partitions", "merge"]
    # rotate the op order per seed for sequence diversity
    ops = ops[seed % len(ops):] + ops[:seed % len(ops)]

    snap_ids = []
    for i, op in enumerate(ops):
        if op == "merge" and not model_states:
            op = "overwrite"  # merge needs a committed target
        rows = _rows_for(seed, i)
        df = _df(spark, rows)
        if op == "overwrite":
            new_state = sorted(rows)
        elif op == "append":
            new_state = sorted((model_states[-1] if model_states else []) + rows)
        elif op == "merge":  # upsert keyed on (route, k) — partition-pruned CoW
            keys = {(r[0], r[1]) for r in rows}
            new_state = sorted(
                [r for r in model_states[-1] if (r[0], r[1]) not in keys] + rows
            )
        else:  # replace_partitions on `route`
            routes = {r[1] for r in rows}
            prev = model_states[-1] if model_states else []
            new_state = sorted([r for r in prev if r[1] not in routes] + rows)
        if op == "merge":
            snap = cat.merge(df, "t", on=["route", "k"], partition_by=["route"])
        else:
            snap = cat.write_table(df, "t", mode=op, partition_by=["route"])
        snap_ids.append(snap.snapshot_id)
        model_states.append(new_state)
        assert _vals(cat.read_table("t")) == new_state, (seed, i, op)

    # time travel to every snapshot agrees with the model at that point
    for sid, want in zip(snap_ids, model_states):
        assert _vals(cat.read_table("t", as_of=sid)) == want

    # expire all but the last two; current unchanged, survivors travel
    cat.expire_snapshots("t", keep_last=2)
    assert _vals(cat.read_table("t")) == model_states[-1]
    assert _vals(cat.read_table("t", as_of=snap_ids[-2])) == model_states[-2]
    assert len(cat.history("t")) == 2
    with pytest.raises(LookupError):
        cat.read_table("t", as_of=snap_ids[0])


def test_incremental_scan_matches_model_appends(spark, tmp_path):
    cat = SnapshotCatalog(spark, str(tmp_path / "whinc"))
    batches = [_rows_for(9, i) for i in range(4)]
    sids = []
    for i, rows in enumerate(batches):
        mode = "overwrite" if i == 0 else "append"
        sids.append(cat.write_table(_df(spark, rows), "t", mode=mode).snapshot_id)
    for i in range(4):
        want = sorted(r for b in batches[i + 1:] for r in b)
        assert _vals(cat.read_table("t", schema=SCHEMA, since=sids[i])) == want
