"""Structured Streaming variant of the pipeline.

``readStream`` over a parquet directory of transcripts → the same
narrow parse→enrich→route plan (the pandas-UDF extract works
unchanged under micro-batching) → ``foreachBatch`` fan-out append with
Spark's own checkpoint log providing exactly-once per micro-batch.
``trigger(availableNow=True)`` drains whatever has landed and stops —
the incremental-batch shape the reference approximates with its resume
loop (``ultra_light_parser.py:144-179``).

Event-time machinery the reference lacks but a streaming deployment
needs: ``with_watermarked_counts`` adds a 10-minute watermark on ``ts``
and windowed per-route counts, tolerating late turns without unbounded
state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import Catalog
from ..plans.pipeline import build_routed

TRANSCRIPT_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("turn_idx", T.IntegerType()),
    T.StructField("role", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("tool", T.StringType()),
    T.StructField("ts", T.TimestampType()),
])


def batch_sink(spark: SparkSession, catalog: Catalog, table: str):
    """foreachBatch sink, idempotent under micro-batch re-delivery.

    ``foreachBatch`` + plain append is only at-least-once: a crash
    after the write but before the checkpoint commit re-delivers the
    same ``batch_id``, double-appending. Writing each batch into its
    own ``batch=<id>/`` subtree with *overwrite* makes re-delivery a
    no-op rewrite of the same directory — exactly-once end to end with
    no transaction log (the per-batch analog of the checkpointed
    pipeline's per-group overwrite).
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        routed = build_routed(spark, batch_df).withColumn("day", F.to_date("ts"))
        (
            routed.repartition("route")
            .write.mode("overwrite")
            .partitionBy("route", "day")
            .parquet(f"{catalog.path(table)}/batch={batch_id}")
        )

    return sink


def stream_pipeline(
    spark: SparkSession,
    input_dir: str,
    catalog: Catalog,
    checkpoint_dir: str,
    table: str = "stream_staging",
):
    """Drain ``input_dir`` once (availableNow) into the routed table.

    Returns the terminated StreamingQuery. Re-invoking after new files
    land processes only the new files (source offsets live in the
    checkpoint), append-only with exactly-once per batch.
    """
    src = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )

    q = (
        src.writeStream.foreachBatch(batch_sink(spark, catalog, table))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def with_watermarked_counts(stream_df: DataFrame) -> DataFrame:
    """Windowed per-route counts under a 10-minute watermark (late data
    beyond the watermark is dropped; state is bounded)."""
    routed = stream_df  # expects a routed stream (route column present)
    return (
        routed.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "route")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "route", "n")
    )
