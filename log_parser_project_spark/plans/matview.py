"""Incremental materialized-view maintenance over snapshot tables.

A materialized aggregate (GROUP BY keys → COUNT + SUMs) over a base
``SnapshotCatalog`` table, kept fresh by O(delta) refreshes: each
refresh reads the base table's row-level changelog since the view's
pinned base snapshot (``SnapshotCatalog.changes`` — metadata-planned,
only files that entered or left the table are scanned), folds it into
SIGNED per-group deltas (insert → +1, delete → −1), and appends those
delta rows to the view in ONE atomic commit. Neither the base table
nor the view is ever rescanned by a refresh — at 100 TB a daily
refresh over a 0.1% churn reads 0.1% of the data and writes rows
proportional to the touched GROUPS, which is exactly the incremental
view-maintenance shape (classic delta/DRed maintenance of
distributive aggregates; Iceberg users build the same loop from
``create_changelog_view`` + MERGE).

Storage model — append-only signed deltas, netted on read:

* ``create`` commits the full aggregate once (the only base scan).
* ``refresh`` appends one delta row per touched group; the commit's
  lineage advances the pinned base snapshot, so the pin and the data
  are a single atomic unit — a crash leaves the old pin and no delta
  (retry recomputes the identical delta: changelog reads are
  deterministic between two pinned snapshots).
* ``read`` nets the deltas: one groupBy-sum over the view (view size
  ≈ groups + recent deltas, not the base table), dropping groups whose
  net row count reaches zero.
* ``compact`` folds the deltas back to one row per group (an
  overwrite commit that does NOT advance the pin) — run it on the
  maintenance cadence, like any small-file compaction.

Updates need no special case: a copy-on-write or MoR update surfaces
in the changelog as delete(old)+insert(new), which the signed fold
turns into the exact measure adjustment; a base-table compaction nets
to an EMPTY changelog (carryover elimination) and refresh appends
nothing. Measures are restricted to what signed deltas can maintain —
COUNT and SUM (AVG = sum/count at read time); MIN/MAX are not
delta-maintainable under deletes without a recompute, so they are
deliberately not offered.

The reference has no analog: it recomputes its summary tables from
SQLite on every request (``src/datastore.py:214-268``); this module is
the 100 TB replacement where recomputing the base is not an option.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog import Snapshot, SnapshotCatalog

_COUNT = "n_rows"


def _definition(catalog: SnapshotCatalog, view: str) -> dict:
    snap = catalog.snapshot(view)
    if snap is None:
        raise LookupError(f"no materialized view {view!r}")
    mv = (snap.lineage or {}).get("mv")
    if not mv:
        raise LookupError(
            f"table {view!r} is not a materialized view (no mv lineage); "
            "create it with create_matview"
        )
    return mv


def _require_snapshot_catalog(catalog) -> None:
    if not isinstance(catalog, SnapshotCatalog):
        raise ValueError(
            "materialized views need a SnapshotCatalog (the refresh "
            "reads the base table's changelog between snapshots)"
        )


def _delta(changes: DataFrame, group_by: list[str], sums: dict[str, str]) -> DataFrame:
    """Fold a changelog into signed per-group delta rows."""
    sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(F.lit(-1))
    aggs = [F.sum(sign).cast("long").alias(_COUNT)]
    for out, src in sums.items():
        aggs.append(F.sum(sign * F.col(src)).alias(out))
    folded = changes.groupBy(*group_by).agg(*aggs)
    # drop no-op groups (equal inserts and deletes of identical values)
    touched = F.col(_COUNT) != 0
    for out in sums:
        touched = touched | (F.coalesce(F.col(out), F.lit(0)) != 0)
    return folded.filter(touched)


def create_matview(
    catalog: SnapshotCatalog,
    view: str,
    base_table: str,
    group_by: list[str],
    sums: dict[str, str] | None = None,
) -> Snapshot:
    """Create ``view`` = SELECT group_by, COUNT(*) AS n_rows,
    SUM(src) AS out... FROM base_table GROUP BY group_by — the one and
    only full scan of the base this view will ever take. ``sums`` maps
    output column name → base column name (integer/long measures
    recommended: signed folding is then exact and order-independent).
    """
    _require_snapshot_catalog(catalog)
    sums = dict(sums or {})
    if _COUNT in sums:
        raise ValueError(f"{_COUNT!r} is the reserved count measure")
    base_snap = catalog.snapshot(base_table)
    if base_snap is None:
        raise LookupError(f"no committed base table {base_table!r}")
    df = catalog.read_table(base_table, as_of=base_snap.snapshot_id)
    aggs = [F.count(F.lit(1)).cast("long").alias(_COUNT)]
    for out, src in sums.items():
        aggs.append(F.sum(src).alias(out))
    full = df.groupBy(*group_by).agg(*aggs)
    return catalog.write_table(
        full,
        view,
        mode="overwrite",
        lineage={
            "mv": {
                "base_table": base_table,
                "base_snapshot": base_snap.snapshot_id,
                "group_by": list(group_by),
                "sums": sums,
                "stage": "create",
            }
        },
    )


def refresh_matview(catalog: SnapshotCatalog, view: str) -> Snapshot | None:
    """Advance ``view`` to the base table's current snapshot by
    appending signed delta rows — O(changed files + touched groups),
    zero reads of the view or the unchanged base. Returns the delta
    commit, or None when the base has not advanced (no commit at all,
    so a refresh cron is free on idle tables). Atomic: the delta rows
    and the new base pin land in one snapshot commit; concurrent
    refreshes are serialized by the catalog's optimistic-concurrency
    parent check (one wins, the loser's retry sees the advanced pin).
    """
    _require_snapshot_catalog(catalog)
    mv = _definition(catalog, view)
    base_table = mv["base_table"]
    base_snap = catalog.snapshot(base_table)
    if base_snap is None:
        raise LookupError(f"base table {base_table!r} of view {view!r} vanished")
    if base_snap.snapshot_id == mv["base_snapshot"]:
        return None
    changes = catalog.changes(
        base_table,
        from_snapshot=mv["base_snapshot"],
        to_snapshot=base_snap.snapshot_id,
    )
    delta = _delta(changes, mv["group_by"], mv["sums"])
    return catalog.write_table(
        delta,
        view,
        mode="append",
        lineage={
            "mv": {**mv, "base_snapshot": base_snap.snapshot_id, "stage": "refresh"}
        },
    )


def read_matview(catalog: SnapshotCatalog, view: str) -> DataFrame:
    """The view's current contents: deltas netted by one groupBy-sum
    over the view table (≈ groups + recent delta rows — never the
    base), groups netted to zero rows dropped."""
    _require_snapshot_catalog(catalog)
    mv = _definition(catalog, view)
    df = catalog.read_table(view)
    aggs = [F.sum(_COUNT).cast("long").alias(_COUNT)]
    for out in mv["sums"]:
        aggs.append(F.sum(out).alias(out))
    return (
        df.groupBy(*mv["group_by"])
        .agg(*aggs)
        .filter(F.col(_COUNT) > 0)
    )


def matview_status(catalog: SnapshotCatalog, view: str) -> dict:
    """Freshness probe: the pinned vs current base snapshot and how
    many base commits the view is behind — metadata-only (history
    walk, no data read). A monitoring loop alerts on ``lag_commits``.
    """
    _require_snapshot_catalog(catalog)
    mv = _definition(catalog, view)
    hist = catalog.history(mv["base_table"])
    pos = {s.snapshot_id: i for i, s in enumerate(hist)}
    pinned = pos.get(mv["base_snapshot"])
    current = len(hist) - 1
    return {
        "base_table": mv["base_table"],
        "pinned_base_snapshot": mv["base_snapshot"],
        "current_base_snapshot": hist[-1].snapshot_id if hist else None,
        "lag_commits": (current - pinned) if pinned is not None else None,
        "fresh": pinned == current,
    }


def compact_matview(catalog: SnapshotCatalog, view: str) -> Snapshot:
    """Fold the accumulated delta rows back to one row per live group
    (an overwrite commit; the base pin is carried over UNCHANGED, so
    compaction commutes with refresh). Read results are identical
    before and after — only the netting work at read time shrinks."""
    _require_snapshot_catalog(catalog)
    mv = _definition(catalog, view)
    netted = read_matview(catalog, view)
    return catalog.write_table(
        netted,
        view,
        mode="overwrite",
        lineage={"mv": {**mv, "stage": "compact"}},
    )
