"""Snapshot tables as a streaming SOURCE: incremental, checkpointed
consumption of `SnapshotCatalog` commits — Iceberg's Spark Structured
Streaming read (``spark.readStream.format("iceberg")``), re-expressed
as the cron-style ``trigger(availableNow)`` drain the rest of this
repo's streaming uses (the reference has no streaming analog; its
parser re-reads SQLite whole, ``src/datastore.py``).

A consumer holds a CURSOR — the last snapshot id it fully processed —
in a checkpoint file (tmp + atomic rename). Each drain walks the
committed history AFTER the cursor, yields one batch per commit in
commit order, and advances the cursor only after the caller's
processing function returns. Crash between processing and the cursor
write → that commit is re-delivered (at-least-once); pair the handler
with an idempotent sink (e.g. ``replace_partitions`` keyed by the
commit's snapshot id, or :func:`stream_upsert`-style MERGE) for
end-to-end exactly-once — the same contract as ``foreachBatch``.

Two delivery modes:

* ``mode="appends"`` (default, Iceberg's streaming-read semantics):
  each batch is the commit's APPENDED data directories
  (``read_table(since=parent)``), planned metadata-only. Overwrite /
  replace_partitions / merge commits deliver only the rows they
  added; merge-on-read equality deletes are invisible here.
* ``mode="changelog"``: each batch is the commit's row-level change
  set from :meth:`SnapshotCatalog.changes` — data columns plus
  ``_change_type`` — exact across CoW rewrites and MoR deletes, at
  the cost of the changelog's heavier planning.

At 100 TB this is the table-to-table pipeline primitive: downstream
jobs chase upstream commits without rescanning the table, and the
cursor file is the only state.
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Callable, Iterator
from dataclasses import dataclass

from pyspark.sql import DataFrame

from ..catalog import Snapshot, SnapshotCatalog


@dataclass
class CommitBatch:
    """One upstream commit, ready to process."""

    snapshot_id: str
    sequence: int
    op: str
    committed_at_unix: float
    df: DataFrame


class TableCommitStream:
    """Cursor-checkpointed reader of a snapshot table's commit log."""

    def __init__(
        self,
        catalog: SnapshotCatalog,
        table: str,
        checkpoint_dir: str,
        mode: str = "appends",
        initial: str = "earliest",
        drop_carryovers: bool = True,
    ):
        """``drop_carryovers`` passes through to :meth:`changes` in
        changelog mode: the netted default is what per-commit delivery
        usually wants, but netting groups by every data column, so a
        copy-on-write table with a non-groupable column type (maps)
        needs ``drop_carryovers=False`` raw delivery instead (merge-
        on-read commits reject raw delivery either way — see
        ``changes``)."""
        if mode not in ("appends", "changelog"):
            raise ValueError(f"mode must be appends or changelog, got {mode!r}")
        if initial not in ("earliest", "latest"):
            raise ValueError(f"initial must be earliest or latest, got {initial!r}")
        self.catalog = catalog
        self.table = table
        self.mode = mode
        self.initial = initial
        self.drop_carryovers = drop_carryovers
        os.makedirs(checkpoint_dir, exist_ok=True)
        self._cursor_path = os.path.join(
            checkpoint_dir, f"{table.replace('/', '__')}.cursor.json"
        )

    # ------------------------------------------------------------- cursor
    def cursor(self) -> str | None:
        """Last fully-processed snapshot id, or None before first drain."""
        if not os.path.exists(self._cursor_path):
            return None
        with open(self._cursor_path) as f:
            return json.load(f)["last_snapshot_id"]

    def _advance(self, snapshot_id: str, sequence: int) -> None:
        tmp = f"{self._cursor_path}.tmp.{uuid.uuid4().hex[:6]}"
        with open(tmp, "w") as f:
            json.dump(
                {"table": self.table, "last_snapshot_id": snapshot_id,
                 "last_sequence": sequence},
                f,
            )
        os.replace(tmp, self._cursor_path)

    # -------------------------------------------------------------- drain
    def pending(self) -> list[Snapshot]:
        """Commits after the cursor, oldest first. A cursor that is no
        longer in the committed history (expired, or orphaned by a
        rollback) raises — continuity can't be proven, and silently
        restarting from anywhere would re-deliver or skip commits."""
        hist = self.catalog.history(self.table)
        cur = self.cursor()
        if cur is None:
            if self.initial == "latest" and hist:
                # start AFTER the current snapshot: mark it consumed so
                # the first drain only sees commits made from now on
                self._advance(hist[-1].snapshot_id, hist[-1].sequence)
                return []
            return hist
        pos = {s.snapshot_id: i for i, s in enumerate(hist)}
        if cur not in pos:
            raise LookupError(
                f"checkpointed snapshot {cur!r} is no longer in table "
                f"{self.table!r}'s history (expired or rolled back); "
                "delete the cursor file to restart explicitly"
            )
        return hist[pos[cur] + 1:]

    def batches(self, max_commits: int | None = None) -> Iterator[CommitBatch]:
        """Yield unconsumed commits in order WITHOUT advancing the
        cursor — callers that manage their own transactionality pair
        this with :meth:`ack`."""
        todo = self.pending()
        if max_commits is not None:
            todo = todo[:max_commits]
        for i, snap in enumerate(todo):
            if self.mode == "changelog":
                df = self.catalog.changes(
                    self.table,
                    from_snapshot=snap.parent_id,
                    to_snapshot=snap.snapshot_id,
                    drop_carryovers=self.drop_carryovers,
                ).drop("_commit_snapshot_id", "_change_ordinal")
            else:
                # one commit's delta: dirs in this snapshot but not in
                # its parent (as_of pins the commit so a multi-commit
                # backlog still delivers per-commit batches)
                if snap.parent_id is not None:
                    df = self.catalog.read_table(
                        self.table, as_of=snap.snapshot_id, since=snap.parent_id
                    )
                else:
                    df = self.catalog.read_table(
                        self.table, as_of=snap.snapshot_id
                    )
            yield CommitBatch(
                snapshot_id=snap.snapshot_id,
                sequence=snap.sequence,
                op=snap.op,
                committed_at_unix=snap.committed_at_unix,
                df=df,
            )

    def ack(self, batch: CommitBatch) -> None:
        """Mark a batch fully processed; the cursor moves to its
        commit. Acks must arrive in delivery order (the cursor is a
        single high-water mark, like a stream offset). Advances from
        the batch's own id+sequence — no log re-read, and an ack never
        fails just because maintenance expired the commit while the
        handler was running."""
        self._advance(batch.snapshot_id, batch.sequence)

    def drain(
        self,
        process: Callable[[CommitBatch], None],
        max_commits: int | None = None,
    ) -> list[str]:
        """availableNow-style drain: deliver every pending commit to
        ``process`` in order, advancing the cursor after each one
        returns. Returns the snapshot ids processed this drain. If
        ``process`` raises, the cursor stays on the last success and
        the failed commit is re-delivered next drain."""
        done: list[str] = []
        for batch in self.batches(max_commits=max_commits):
            process(batch)
            self.ack(batch)
            done.append(batch.snapshot_id)
        return done
