"""Raw text-log ingestion: files of log lines → the transcript schema.

The missing first mile for the classic "log file in, sinks out" flow
(the reference ingests raw hex dumps one file at a time,
``app.py``/``hex_decoder_module/cli`` — this is the text analog):

    read_text_log → (optional) logmine.assemble_records → pipeline

Line ORDER is load-bearing for multiline assembly, and Spark's default
line-split text read gives no intra-file order guarantee once a file
spans splits. So files are read WHOLE (``wholetext=True`` — one task
per file, exact line numbers from ``posexplode``) and parallelism
comes from the file count, which is how rotated log directories look
in practice (many bounded files). For a single giant unrotated file
this serializes — split it, or use a line-split read when per-line
records make order irrelevant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["read_text_log", "textlog_transcripts"]


def read_text_log(spark: SparkSession, path: str) -> DataFrame:
    """(file, line_no, text): every line of every file under ``path``,
    with its exact 1-based line number. Trailing newlines don't create
    phantom empty lines; interior empty lines are preserved (they are
    real log content — often record separators)."""
    raw = spark.read.text(path, wholetext=True).select(
        F.input_file_name().alias("file"), F.col("value")
    )
    lines = F.split(F.regexp_replace("value", "\n+$", ""), "\n")
    return raw.select(
        "file", F.posexplode(lines).alias("idx", "text")
    ).select("file", (F.col("idx") + 1).cast("int").alias("line_no"), "text")


def textlog_transcripts(lines: DataFrame) -> DataFrame:
    """Adapt (file, line_no, text) rows to the pipeline's transcript
    schema: one conversation per file, line number as turn order. The
    registry's classify/extract/route then run unchanged — pair with
    ``logmine.assemble_records`` first when records span lines."""
    return lines.select(
        F.col("file").alias("conv_id"),
        F.col("line_no").alias("turn_idx"),
        F.lit("log").alias("role"),
        F.col("text"),
        F.lit(None).cast("string").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
    )
