"""Nightly maintenance runbook example — the ops loop a 100 TB
transcript store actually runs, end to end on a toy warehouse.

Run:  python examples/nightly_maintenance.py

A day of pipeline runs accretes small files in the day partitions it
wrote and nowhere else. The nightly job then:

1. **audits** the live fact against a declared expectations suite
   (one aggregate pass — suite size doesn't change scan count);
2. **compacts yesterday's partitions only** (`compact_partitions`) —
   the other partitions carry by reference, zero read or write
   amplification on the archive;
3. **expires snapshots by age** (`expire_snapshots(older_than=…)`),
   keeping recent history time-travelable regardless of commit count;
4. **sweeps orphans** left by crashes or expiry races.

Every step is also reachable from the CLI (`maintain`, `audit`), so
the same runbook drops into cron/Airflow as four commands.
"""

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, ".")  # run from the repo root

from pyspark.sql import functions as F  # noqa: E402

from log_parser_project_spark import expectations as ex  # noqa: E402
from log_parser_project_spark.catalog import SnapshotCatalog  # noqa: E402
from log_parser_project_spark.generate import make_transcripts  # noqa: E402
from log_parser_project_spark.plans.pipeline import run_pipeline  # noqa: E402
from log_parser_project_spark.session import get_spark  # noqa: E402


def main() -> int:
    spark = get_spark(parallelism=8)
    wh = Path(tempfile.mkdtemp(prefix="nightly_wh_"))
    cat = SnapshotCatalog(spark, str(wh))

    # -- the day's traffic: several pipeline runs under the WAP gate
    gate = ex.audit([
        {"expect": "row_count_between", "min": 1},
        {"expect": "not_null", "col": "route"},
        {"expect": "not_null", "col": "conv_id"},
        {"expect": "unique", "cols": ["conv_id", "turn_idx"]},
    ])
    run_pipeline(spark, make_transcripts(spark, n_convs=200), cat, audit=gate)
    fact = "sink_staging"
    print("published under gate:",
          cat.snapshot(fact).lineage.get("audit"))

    # -- 1. audit the live fact (the standalone suite, not the gate)
    report = ex.evaluate(cat.read_table(fact), [
        {"expect": "row_count_between", "min": 100},
        {"expect": "accepted_values", "col": "matched",
         "values": [True, False]},
    ])
    assert all(r["passed"] for r in report), report
    print("nightly audit:", [(r["expect"], r["observed"]) for r in report])

    # -- 2. compact ONLY the busiest day's partitions
    busiest = (
        cat.read_table(fact).groupBy("day").count()
        .orderBy(F.desc("count")).first()
    )
    day_seg = f"day={busiest['day']}"
    fm = cat.files_metadata(fact)
    scoped = fm.filter(F.col("partition").contains(day_seg))
    before, rest_before = scoped.count(), fm.count() - scoped.count()
    snap = cat.compact_partitions(
        fact, {"day": str(busiest["day"])}, target_file_bytes=8 * 2**20,
    )
    fm = cat.files_metadata(fact)
    scoped = fm.filter(F.col("partition").contains(day_seg))
    after, rest_after = scoped.count(), fm.count() - scoped.count()
    print(f"compacted {day_seg}: {before} -> {after} scoped files; "
          f"untouched elsewhere: {rest_before} -> {rest_after} "
          f"(rows rewritten: {snap.row_count})")
    assert rest_before == rest_after  # the archive was never touched

    # -- 3. expire by age: keep everything younger than the cut
    removed = cat.expire_snapshots(fact, keep_last=1, older_than=time.time())
    print("expired dirs:", len(removed))

    # -- 4. orphan sweep (age-guarded; nothing young is touched)
    orphans = cat.remove_orphan_files(fact, older_than_s=3600)
    print("orphans removed:", len(orphans))

    n = cat.read_table(fact).count()
    print("fact rows after maintenance:", n)
    assert n > 0
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
