"""Search + telemetry-monitoring runbook example — the two late-r04
analytics families end to end on a toy warehouse.

Run:  python examples/search_and_monitor.py

1. **Index once, query many**: build the BM25 inverted index over a
   document table (`plans/searchindex.py` — postings and corpus stats
   as TRANSFORMED materialized views), then run ranked queries that
   never touch the corpus text.
2. **The index follows the table**: append new docs, edit one, delete
   one — each `refresh_search_index` is an O(changed docs) changelog
   fold, and the next query reflects the mutation (the edited doc's
   lengths renet, the deleted doc is de-indexed).
3. **Densify + outage detection**: hourly gap fill with
   last-observation-carried-forward over a sparse metric stream, then
   `gap_islands` surfaces the silent runs a raw per-bucket aggregate
   can never show.

Every search step is also reachable from the CLI (`searchindex
--create-over/--refresh/--status/--query`), so the same loop drops
into cron/Airflow as three commands.
"""

import sys
import tempfile

sys.path.insert(0, ".")  # run from the repo root

from pyspark.sql import functions as F  # noqa: E402

from log_parser_project_spark.catalog import SnapshotCatalog  # noqa: E402
from log_parser_project_spark.operators.timeseries import (  # noqa: E402
    densify,
    gap_islands,
)
from log_parser_project_spark.plans.searchindex import (  # noqa: E402
    create_search_index,
    refresh_search_index,
    search_index_status,
    search_index_topk,
)
from log_parser_project_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark(app_name="search-and-monitor", parallelism=8)
    cat = SnapshotCatalog(spark, tempfile.mkdtemp(prefix="search_wh_"))

    # ------------------------------------------------ 1. index once
    docs = spark.createDataFrame(
        [
            (1, "spark shuffle tuning for wide aggregations"),
            (2, "broadcast joins beat sort merge on small dims"),
            (3, "watermarks bound state in streaming joins"),
            (4, "the quick brown fox jumps over the lazy dog"),
        ],
        "doc_id long, text string",
    )
    cat.write_table(docs, "docs")
    create_search_index(cat, "idx", "docs")
    hits = search_index_topk(cat, "idx", [(0, "streaming joins")], k=3)
    print("initial top-3 for 'streaming joins':")
    hits.show(truncate=False)

    # ------------------------------------- 2. the index follows DML
    cat.write_table(
        spark.createDataFrame(
            [(5, "skew joins need salting or AQE splitting")],
            "doc_id long, text string",
        ),
        "docs",
        mode="append",
    )
    cat.update_where(
        "docs",
        {"text": F.concat(F.col("text"), F.lit(" and streaming backpressure"))},
        where=F.col("doc_id") == 2,
    )
    cat.delete_where("docs", where=F.col("doc_id") == 4)
    refresh_search_index(cat, "idx")  # one O(delta) fold per view
    print("status:", search_index_status(cat, "idx"))
    print("after append+edit+delete, top-3 for 'streaming joins':")
    search_index_topk(cat, "idx", [(0, "streaming joins")], k=3).show(truncate=False)

    # --------------------------------- 3. densify + outage detection
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    events = spark.createDataFrame(
        [
            ("svc-a", t0 + dt.timedelta(hours=h, minutes=7), 100 + h)
            for h in [0, 1, 2, 7, 8, 9, 10, 23]  # silent 3–6 and 11–22
        ],
        "service string, ts timestamp, latency_ms long",
    )
    dense = densify(events, key_col="service", ts_col="ts",
                    value_cents=F.col("latency_ms"))
    print("densified (gaps at n=0, LOCF carries the last sum):")
    dense.orderBy("bucket").show(30)
    print("outages (runs of >= 2 silent hours):")
    gap_islands(events, key_col="service", ts_col="ts", min_buckets=2).show()


if __name__ == "__main__":
    main()
