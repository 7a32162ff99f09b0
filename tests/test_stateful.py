"""applyInPandasWithState sessionization: per-conversation state must
accumulate across micro-batches (not reset per batch), and the final
update per conversation must equal the batch-mode oracle."""

import pyspark.sql.functions as F

from log_parser_project_spark.generate import make_transcripts
from log_parser_project_spark.operators.parse import classify
from log_parser_project_spark.streaming.stateful import sessionize
from log_parser_project_spark.streaming.stream import TRANSCRIPT_SCHEMA


def test_sessionize_idle_timeout_closes_sessions(spark, tmp_path):
    """With a continuous trigger and idle_timeout_ms, every conversation
    eventually emits a closed=True row and drops its state."""
    import time

    tdf = make_transcripts(spark, n_convs=12)
    src = str(tmp_path / "src_t")
    tdf.write.parquet(src)

    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(src)
    q = (
        sessionize(classify(stream), idle_timeout_ms=2000)
        .writeStream.format("memory")
        .queryName("sess_timeout")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_t"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 90
        closed = set()
        while time.time() < deadline:
            closed = {
                r.conv_id
                for r in spark.sql(
                    "SELECT conv_id FROM sess_timeout WHERE closed"
                ).collect()
            }
            if len(closed) >= 12:
                break
            time.sleep(2)
    finally:
        q.stop()
    want = {r.conv_id for r in tdf.select("conv_id").distinct().collect()}
    assert closed == want, f"expected all {len(want)} conversations closed, got {len(closed)}"


def test_sessionize_accumulates_across_microbatches(spark, tmp_path):
    tdf = make_transcripts(spark, n_convs=40)
    src = str(tmp_path / "src")
    # several files + maxFilesPerTrigger=2 → multiple micro-batches in
    # one availableNow run; conversations straddle batch boundaries
    tdf.repartition(6).write.parquet(src)

    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    q = (
        sessionize(classify(stream))
        .writeStream.format("memory")
        .queryName("sess_test")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    updates = spark.sql("SELECT * FROM sess_test").collect()
    assert updates, "no session updates emitted"
    # more batches than convs touched once → some conv got >1 update
    n_updates_per_conv = {}
    final = {}
    for r in updates:
        n_updates_per_conv[r.conv_id] = n_updates_per_conv.get(r.conv_id, 0) + 1
        prev = final.get(r.conv_id)
        if prev is None or r.n_turns > prev.n_turns:
            final[r.conv_id] = r
    assert max(n_updates_per_conv.values()) > 1, (
        "expected at least one conversation updated across multiple micro-batches"
    )

    oracle = {
        r.conv_id: r
        for r in classify(tdf)
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.count("pattern_class").alias("n_matched"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .collect()
    }
    assert set(final) == set(oracle)
    for cid, want in oracle.items():
        got = final[cid]
        assert got.n_turns == want.n_turns, cid
        assert got.n_matched == want.n_matched, cid
        assert got.first_ts == want.first_ts, cid
        assert got.last_ts == want.last_ts, cid
        assert got.closed is False
