"""Table-to-table CDC pipeline example — downstream chases upstream
commits without ever rescanning the table.

Run:  python examples/table_to_table.py

An upstream `events` snapshot table receives commits over time
(appends, then a merge-on-read correction). Two downstream consumers
follow it through `TableCommitStream` cursors:

1. an **appends-mode** consumer maintaining a running per-route count
   table — each drain reads ONLY the directories the new commits
   added (metadata-planned), merges the per-commit counts into its
   own snapshot table, and survives a simulated crash by re-delivery;
2. a **changelog-mode** consumer maintaining an exact mirror — the
   merge-on-read correction arrives as delete+insert rows, so the
   mirror applies them as a MERGE and stays row-identical to the
   upstream even though the upstream never rewrote a file.

This is the 100 TB shape: the upstream table is the queue, its commit
log is the offset stream, and each consumer's only state is a cursor
file.
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, ".")  # run from the repo root

from pyspark.sql import functions as F  # noqa: E402

from log_parser_project_spark.catalog import SnapshotCatalog  # noqa: E402
from log_parser_project_spark.session import get_spark  # noqa: E402
from log_parser_project_spark.streaming.table_source import (  # noqa: E402
    TableCommitStream,
)


def _events(spark, lo: int, hi: int):
    return spark.range(lo, hi).selectExpr(
        "id AS event_id",
        "CAST(id % 5 AS STRING) AS route",
        "CONCAT('payload-', id) AS payload",
    )


def main() -> None:
    spark = get_spark(parallelism=8)
    root = Path(tempfile.mkdtemp(prefix="t2t_demo_"))
    cat = SnapshotCatalog(spark, str(root / "wh"))

    # ---- upstream: two append commits ------------------------------
    cat.write_table(_events(spark, 0, 5000), "events", partition_by=["route"])
    cat.write_table(_events(spark, 5000, 8000), "events", mode="append",
                    partition_by=["route"])

    # ---- consumer 1: appends mode, running per-route counts --------
    counts_src = TableCommitStream(cat, "events", str(root / "ckpt_counts"))

    def update_counts(batch) -> None:
        delta = batch.df.groupBy("route").agg(F.count(F.lit(1)).alias("n"))
        if cat.exists("route_counts"):
            merged = (
                cat.read_table("route_counts")
                .unionByName(delta)
                .groupBy("route").agg(F.sum("n").alias("n"))
            )
            cat.write_table(merged, "route_counts",
                            lineage={"from_commit": batch.snapshot_id})
        else:
            cat.write_table(delta, "route_counts",
                            lineage={"from_commit": batch.snapshot_id})

    done = counts_src.drain(update_counts)
    print(f"counts consumer: processed {len(done)} commits")
    total = cat.read_table("route_counts").agg(F.sum("n")).first()[0]
    assert total == 8000, total
    print(f"  running total = {total}")

    # ---- consumer 2: changelog mode, exact mirror -------------------
    mirror_src = TableCommitStream(
        cat, "events", str(root / "ckpt_mirror"), mode="changelog"
    )

    def apply_to_mirror(batch) -> None:
        inserts = batch.df.filter("_change_type = 'insert'").drop("_change_type")
        deletes = batch.df.filter("_change_type = 'delete'").drop("_change_type")
        if not cat.exists("events_mirror"):
            cat.write_table(inserts, "events_mirror")
            return
        if deletes.head(1):
            cat.merge(deletes.select("event_id", "route", "payload"),
                      "events_mirror", on=["event_id"],
                      when_matched="delete", when_not_matched=None)
        if inserts.head(1):
            cat.write_table(inserts, "events_mirror", mode="append")

    mirror_src.drain(apply_to_mirror)
    print(f"mirror consumer: {cat.read_table('events_mirror').count()} rows mirrored")

    # ---- upstream correction: merge-on-read, no files rewritten -----
    fix = _events(spark, 0, 8000).filter("event_id % 1000 = 0") \
        .withColumn("payload", F.lit("CORRECTED"))
    cat.merge(fix, "events", on=["event_id"], strategy="mor")
    print("\nupstream MoR correction committed (8 rows, zero rewrites)")

    # counts consumer: a crash mid-drain re-delivers the commit -------
    class Boom(Exception):
        pass

    try:
        counts_src.drain(lambda b: (_ for _ in ()).throw(Boom()))
    except Boom:
        pass
    done = counts_src.drain(update_counts)  # re-delivered after the "crash"
    print(f"counts consumer: re-delivered {len(done)} commit after crash")
    total = cat.read_table("route_counts").agg(F.sum("n")).first()[0]
    # appends-mode sees the MoR commit's INSERT side only (8 new images)
    assert total == 8008, total

    # mirror consumer: delete+insert keeps it row-identical -----------
    mirror_src.drain(apply_to_mirror)
    up = cat.read_table("events")
    mir = cat.read_table("events_mirror")
    assert up.exceptAll(mir).count() == 0 and mir.exceptAll(up).count() == 0
    n_fixed = mir.filter("payload = 'CORRECTED'").count()
    print(f"mirror consumer: still row-identical after the correction "
          f"({n_fixed} corrected rows)")


if __name__ == "__main__":
    main()
