"""Revision-history SCD dimension — the registry's change log.

The reference tracks schema revisions extracted from the spec document
(``src/pdf_extractor.py:268-363`` ``RevisionEntry{revision, date,
updated_logcodes, new_logcodes}``), stores them in two SQLite tables
(``src/datastore.py:107-127`` ``revisions`` + ``revision_logcodes``
with status ∈ {updated, new}) and serves two CLI queries over them:
by month/year (``src/app.py:212-251`` → ``datastore.py:296-341``
``get_revisions_by_date``) and by logcode (``app.py`` →
``datastore.py:389-406`` ``search_revisions_by_logcode``).

Here the same slowly-changing dimension describes the *pattern
registry*: which revision introduced or updated each pattern class.
Two small dimension DataFrames (broadcast-sized, like every other dim)
plus the two query helpers, with CLI parity via
``python -m log_parser_project_spark revisions``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class RevisionEntry:
    """One registry revision (``pdf_extractor.py:35-41`` analog)."""

    revision: str
    rev_date: str  # "Month Year", the reference's date format
    new_classes: tuple[str, ...] = ()
    updated_classes: tuple[str, ...] = ()


# The shipped registry's change history (the SCD dim for PATTERNS —
# synthetic but shaped exactly like the reference's extracted history).
REVISIONS: tuple[RevisionEntry, ...] = (
    RevisionEntry("rev-A", "November 2025", new_classes=("tool_call", "error")),
    RevisionEntry("rev-B", "December 2025", new_classes=("citation",),
                  updated_classes=("error",)),
    RevisionEntry("rev-C", "December 2025", new_classes=("metric",),
                  updated_classes=("tool_call",)),
    RevisionEntry("rev-D", "January 2026", new_classes=("handoff",)),
    RevisionEntry("rev-E", "February 2026",
                  updated_classes=("handoff", "metric")),
)


def dim_revisions_df(
    spark: SparkSession, revisions: tuple[RevisionEntry, ...] = REVISIONS
) -> DataFrame:
    """``revisions`` table analog: (rev_seq, revision, rev_date).
    ``rev_seq`` plays the AUTOINCREMENT id's ordering role."""
    rows = [(i + 1, r.revision, r.rev_date) for i, r in enumerate(revisions)]
    return spark.createDataFrame(rows, "rev_seq int, revision string, rev_date string")


def dim_revision_classes_df(
    spark: SparkSession, revisions: tuple[RevisionEntry, ...] = REVISIONS
) -> DataFrame:
    """``revision_logcodes`` analog: (revision, pattern_class, status)
    with status ∈ {updated, new} (``datastore.py:118-127`` CHECK)."""
    rows = [
        (r.revision, c, status)
        for r in revisions
        for status, classes in (("new", r.new_classes), ("updated", r.updated_classes))
        for c in classes
    ]
    return spark.createDataFrame(rows, "revision string, pattern_class string, status string")


def revisions_by_date(
    spark: SparkSession,
    month: str,
    year: str | int,
    revisions: tuple[RevisionEntry, ...] = REVISIONS,
) -> DataFrame:
    """``get_revisions_by_date`` parity (``datastore.py:296-341``): the
    revisions whose date equals "<Month> <Year>", each with its sorted
    updated / new class lists; ordered by revision sequence."""
    dim = dim_revisions_df(spark, revisions)
    classes = dim_revision_classes_df(spark, revisions)
    # case-fold like revisions_by_class does — "february" must not
    # silently read as "no revisions that month"
    picked = dim.filter(F.lower("rev_date") == f"{month} {year}".strip().lower())
    lists = (
        classes.groupBy("revision")
        .agg(
            F.array_sort(
                F.collect_list(F.when(F.col("status") == "updated", F.col("pattern_class")))
            ).alias("updated_classes"),
            F.array_sort(
                F.collect_list(F.when(F.col("status") == "new", F.col("pattern_class")))
            ).alias("new_classes"),
        )
    )
    return (
        picked.join(F.broadcast(lists), "revision", "left")
        .select("rev_seq", "revision", "rev_date", "updated_classes", "new_classes")
        .orderBy("rev_seq")
    )


def revisions_by_class(
    spark: SparkSession,
    pattern_class: str,
    revisions: tuple[RevisionEntry, ...] = REVISIONS,
) -> DataFrame:
    """``search_revisions_by_logcode`` parity (``datastore.py:389-406``):
    every revision that added or updated the class, in revision order
    (the reference's ``ORDER BY r.id``)."""
    dim = dim_revisions_df(spark, revisions)
    classes = dim_revision_classes_df(spark, revisions).filter(
        F.lower("pattern_class") == pattern_class.strip().lower()
    )
    return (
        dim.join(F.broadcast(classes), "revision")
        .select("revision", "rev_date", "status", "rev_seq")
        .orderBy("rev_seq")
        .drop("rev_seq")
    )


def latest_revision_per_class(
    spark: SparkSession, revisions: tuple[RevisionEntry, ...] = REVISIONS
) -> DataFrame:
    """SCD "current" resolution: for each pattern class, the most recent
    revision that touched it (highest rev_seq) and whether that touch
    was the introduction or an update."""
    from pyspark.sql import Window

    dim = dim_revisions_df(spark, revisions)
    classes = dim_revision_classes_df(spark, revisions)
    joined = classes.join(F.broadcast(dim), "revision")
    w = Window.partitionBy("pattern_class").orderBy(
        F.col("rev_seq").desc(), F.col("status").asc()
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("pattern_class", "revision", "rev_date", "status")
    )


def scd2_intervals(
    df: DataFrame,
    key: str,
    ts_col: str,
    attr_cols: list[str],
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Type-2 dimension construction from a change-event log: per
    ``key``, collapse consecutive events whose ``attr_cols`` are
    unchanged into one validity interval and emit
    ``(key, attrs..., valid_from_us, valid_to_us, is_current)`` —
    half-open ``[from, to)`` intervals chained so each version's end is
    the next version's start (the standard Kimball SCD2 load, and the
    batch twin of what a MERGE-based dimension pipeline maintains
    incrementally).

    Two windows over one (key)-partitioned sort: a lag comparison
    marks rows where any tracked attribute changed (null-safe; the
    first row per key always starts an interval), a lead over the
    surviving rows chains the intervals. Timestamps are exported as
    BIGINT epoch-microseconds (engine-portable, integer-exact);
    ``is_current`` = open-ended interval, as INT for hash-stable
    contract output. ``tiebreak`` columns order same-instant events
    deterministically (default: none beyond the timestamp — pass the
    event id when instants can tie). At scale both windows ride ONE
    shuffle by ``key``; state per group is one row.
    """
    if not attr_cols:
        raise ValueError("scd2_intervals needs at least one tracked attribute")
    from pyspark.sql import Window

    tb = list(tiebreak or [])
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    cur = F.struct(*[F.col(c) for c in attr_cols])
    w = Window.partitionBy(key).orderBy("__us", *tb)
    marked = (
        df.withColumn("__us", us)
        .withColumn("__first", F.lag(F.lit(1)).over(w).isNull())
        .withColumn("__prev", F.lag(cur).over(w))
    )
    starts = marked.filter(
        F.col("__first") | ~F.col("__prev").eqNullSafe(cur)
    )
    w2 = Window.partitionBy(key).orderBy("__us", *tb)
    return (
        starts.withColumn("valid_to_us", F.lead("__us").over(w2))
        .select(
            F.col(key),
            *[F.col(c) for c in attr_cols],
            F.col("__us").cast("long").alias("valid_from_us"),
            F.col("valid_to_us").cast("long"),
            F.when(F.col("valid_to_us").isNull(), 1)
            .otherwise(0)
            .cast("int")
            .alias("is_current"),
        )
    )
