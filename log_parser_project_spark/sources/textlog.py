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

__all__ = [
    "read_text_log",
    "read_text_lines",
    "textlog_transcripts",
    "records_transcripts",
]


def read_text_log(spark: SparkSession, path: str) -> DataFrame:
    """(file, line_no, text): every line of every file under ``path``,
    with its exact 1-based line number. POSIX line semantics: only the
    single file-terminating newline is a terminator (a file ending
    ``a\\n\\n\\n`` really contains two trailing EMPTY lines — often
    record separators — and keeps them; an empty file has no lines).
    CRLF files lose their ``\\r`` so templates/fields match LF logs."""
    raw = spark.read.text(path, wholetext=True).select(
        F.input_file_name().alias("file"), F.col("value")
    )
    # \z (absolute end), NOT $: Java's $ also matches BEFORE a final
    # line terminator, so a '$'-anchored replace eats one real trailing
    # empty line; split limit -1 keeps trailing empty fields
    lines = F.when(F.col("value") == "", F.array().cast("array<string>")).otherwise(
        F.split(F.regexp_replace("value", "\r?\n\\z", ""), "\r?\n", -1)
    )
    return raw.select(
        "file", F.posexplode(lines).alias("idx", "text")
    ).select("file", (F.col("idx") + 1).cast("int").alias("line_no"), "text")


def read_text_lines(spark: SparkSession, path: str) -> DataFrame:
    """(file, text) via the PARALLEL line-split read — no line numbers,
    no intra-file order. The right source for order-independent
    consumers (template mining, counting): a single multi-GB unrotated
    file parallelizes by split instead of loading as one row."""
    return spark.read.text(path).select(
        F.input_file_name().alias("file"),
        F.regexp_replace("value", "\r$", "").alias("text"),
    )


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


def records_transcripts(recs: DataFrame) -> DataFrame:
    """Adapt ``logmine.assemble_records`` output back to the transcript
    schema (record id as turn order, assembled record as text) — the
    single owner of this shape for the ``--multiline-indent`` path and
    anyone composing assembly with the parser."""
    return recs.select(
        "conv_id",
        F.col("rec_id").cast("int").alias("turn_idx"),
        F.lit("log").alias("role"),
        F.col("record").alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
    )
