"""Embedding-side pipeline runbook — the late-r04 vector/export
families end to end on a toy warehouse.

Run:  python examples/vector_pipeline.py

1. **Index once, probe many**: train the IVF quantizer and build the
   cell-postings view over an embedding table
   (`plans/vectorindex.py` — one TRANSFORMED materialized view), then
   answer cosine top-k without rescanning the corpus. Probing all
   cells is exact; `n_probe` trades recall for candidate volume.
2. **The index follows the table**: append re-embedded rows, UPDATE
   one vector (it moves cells on its own — the changelog's
   delete+insert pair re-nets the posting), DELETE another — each
   `refresh_vector_index` is an O(changed vectors) changelog fold.
3. **Rollup lattice**: a per-(day, model) quality matview and a
   per-model view CASCADED OVER IT (`count_from="n_rows"`) — the
   coarse view refreshes from the fine view's delta appends, never
   from the base.
4. **Ship it**: `write_training_shards` lays the surviving corpus out
   as ~size-targeted shard files with a verifiable manifest — the
   hand-off artifact a training job mounts.

Every index step is also reachable from the CLI (`vectorindex
--create-over/--refresh/--status/--query-id`), so the same loop drops
into cron/Airflow as two commands.
"""

import json
import sys
import tempfile

sys.path.insert(0, ".")  # run from the repo root

from pyspark.sql import functions as F  # noqa: E402

from log_parser_project_spark.catalog import SnapshotCatalog  # noqa: E402
from log_parser_project_spark.operators.sampling import (  # noqa: E402
    write_training_shards,
)
from log_parser_project_spark.plans.matview import (  # noqa: E402
    create_matview,
    read_matview,
    refresh_matview,
)
from log_parser_project_spark.plans.vectorindex import (  # noqa: E402
    create_vector_index,
    refresh_vector_index,
    vector_index_status,
    vector_index_topk,
)
from log_parser_project_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark(app_name="vector_pipeline_example", parallelism=8)
    wh = tempfile.mkdtemp(prefix="vecpipe_wh_")
    cat = SnapshotCatalog(spark, wh)
    print(f"warehouse: {wh}\n")

    # --- 1. corpus of embedded documents (two planted topics) --------
    rows = []
    for i in range(40):
        topic = i % 2
        vec = [0.0] * 8
        vec[topic * 4] = 1.0
        vec[topic * 4 + 1] = 0.1 * (i % 5)
        rows.append((i, f"model-{i % 3}", 20260800 + i % 4, vec,
                     "doc text %d " % i * (i % 7 + 1)))
    docs = spark.createDataFrame(
        rows, "doc_id long, model string, day int, embedding array<float>, text string"
    )
    cat.write_table(docs, "docs")

    create_vector_index(cat, "vidx", "docs", id_col="doc_id",
                        n_cells=2, kmeans_iters=2)
    print("index:", json.dumps(vector_index_status(cat, "vidx"), default=str))

    q = cat.read_table("docs").filter(F.col("doc_id") < 2)
    print("\nexact top-3 per query (probe all cells):")
    vector_index_topk(cat, "vidx", q, k=3, id_col="doc_id").show()

    # --- 2. the index follows the table ------------------------------
    flipped = [0.0, 0.0, 0.0, 0.0, 1.0, 0.2, 0.0, 0.0]  # topic-1 axis
    cat.update_where(
        "docs",
        {"embedding": F.array(*[F.lit(x) for x in flipped]).cast("array<float>")},
        where=F.col("doc_id") == 0,
    )
    cat.delete_where("docs", where=F.col("doc_id") == 39)
    print("refresh:", refresh_vector_index(cat, "vidx").row_count,
          "delta rows (only the touched vectors)")
    print("\ndoc 0 now neighbors the OTHER topic:")
    q0 = cat.read_table("docs").filter(F.col("doc_id") == 0)
    vector_index_topk(cat, "vidx", q0, k=3, id_col="doc_id").show()

    # --- 3. rollup lattice over the same table -----------------------
    docs2 = cat.read_table("docs").withColumn("n_toks", F.size(F.split("text", " ")))
    # matviews aggregate the committed table; stage the token count as
    # a real column once (a transform would work too)
    cat.write_table(docs2, "docs_tok")
    create_matview(cat, "mv_day", "docs_tok", ["model", "day"], {"toks": "n_toks"})
    create_matview(cat, "mv_model", "mv_day", ["model"], {"toks": "toks"},
                   count_from="n_rows")
    cat.delete_where("docs_tok", where=F.col("model") == "model-2")
    refresh_matview(cat, "mv_day")
    refresh_matview(cat, "mv_model")
    print("per-model rollup (cascaded; model-2 netted out end to end):")
    read_matview(cat, "mv_model").orderBy("model").show()

    # --- 4. shard export ----------------------------------------------
    out = tempfile.mkdtemp(prefix="vecpipe_shards_") + "/shards"
    summary = write_training_shards(
        cat.read_table("docs_tok").select("doc_id", "text"),
        out, key="doc_id",
        size_col=F.coalesce(F.octet_length("text"), F.lit(0)),
        target_bytes=400,
    )
    print("shards:", json.dumps(summary))
    print(f"  layout + _manifest + _summary.json under {out}")


if __name__ == "__main__":
    main()
