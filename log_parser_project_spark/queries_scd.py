"""Revision-history (SCD dimension) queries with DuckDB oracles.

The revision dim lives in :mod:`.revisions` as driver-side literals
(it is broadcast-sized registry metadata, like every other dim); the
oracle SQL reconstructs the identical rows with a VALUES CTE, so both
engines query the same synthetic revision data. Month names are built
from explicit month-number → name maps in BOTH engines — no reliance
on JVM / ICU locale agreement.

Reference surface covered: ``datastore.py:296-341`` (revisions by
date, with updated/new class lists), ``datastore.py:389-406`` (J7
``revisions ⋈ revision_logcodes``), and the SCD "current" resolution
the reference approximates by taking the last matching row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _register, _spread, _t
from .revisions import (
    REVISIONS,
    dim_revision_classes_df,
    dim_revisions_df,
    latest_revision_per_class,
)

_MONTHS = (
    "January", "February", "March", "April", "May", "June", "July",
    "August", "September", "October", "November", "December",
)

_REV_VALUES = ", ".join(
    f"({i + 1}, '{r.revision}', '{r.rev_date}')" for i, r in enumerate(REVISIONS)
)
_REVCLASS_VALUES = ", ".join(
    f"('{r.revision}', '{c}', '{status}')"
    for r in REVISIONS
    for status, classes in (("new", r.new_classes), ("updated", r.updated_classes))
    for c in classes
)
_MONTH_SQL_ARRAY = "[" + ", ".join(f"'{m}'" for m in _MONTHS) + "]"


@_register(
    "q_scd_revision_activity",
    f"""
    WITH rev(rev_seq, revision, rev_date) AS (VALUES {_REV_VALUES}),
    rc(revision, pattern_class, status) AS (VALUES {_REVCLASS_VALUES}),
    counts AS (
      SELECT revision,
             COUNT(*) FILTER (status = 'new') AS n_new,
             COUNT(*) FILTER (status = 'updated') AS n_updated
      FROM rc GROUP BY revision
    ),
    ev AS (
      SELECT {_MONTH_SQL_ARRAY}[month(ts)] || ' ' || CAST(year(ts) AS VARCHAR) AS month_year
      FROM events
    )
    SELECT r.rev_seq, r.revision, r.rev_date,
           CAST(coalesce(c.n_new, 0) AS BIGINT) AS n_new,
           CAST(coalesce(c.n_updated, 0) AS BIGINT) AS n_updated,
           CAST(count(ev.month_year) AS BIGINT) AS n_events_in_month
    FROM rev r
    LEFT JOIN counts c ON r.revision = c.revision
    LEFT JOIN ev ON ev.month_year = r.rev_date
    GROUP BY 1, 2, 3, 4, 5
    """,
)
def q_scd_revision_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revision dim ⋈ revision-classes (J7, ``datastore.py:389-406``)
    ⋈ the events fact by month-year — the date-filtered revision view
    (``get_revisions_by_date``) as one broadcast-joined aggregate."""
    rev = dim_revisions_df(spark)
    rc = dim_revision_classes_df(spark)
    counts = rc.groupBy("revision").agg(
        F.sum(F.when(F.col("status") == "new", 1).otherwise(0)).cast("long").alias("n_new"),
        F.sum(F.when(F.col("status") == "updated", 1).otherwise(0)).cast("long").alias("n_updated"),
    )
    month_name = F.element_at(
        F.array(*[F.lit(m) for m in _MONTHS]), F.month(F.col("ts").cast("timestamp"))
    )
    ev = _t(spark, sf_dir, "events").select(
        F.concat(month_name, F.lit(" "), F.year(F.col("ts").cast("timestamp")).cast("string"))
        .alias("month_year")
    )
    return (
        rev.join(F.broadcast(counts), "revision", "left")
        .join(ev, ev.month_year == rev.rev_date, "left")
        .groupBy("rev_seq", "revision", "rev_date",
                 F.coalesce("n_new", F.lit(0)).alias("n_new"),
                 F.coalesce("n_updated", F.lit(0)).alias("n_updated"))
        .agg(F.count("month_year").alias("n_events_in_month"))
    )


@_register(
    "q_scd_latest_per_class",
    f"""
    WITH rev(rev_seq, revision, rev_date) AS (VALUES {_REV_VALUES}),
    rc(revision, pattern_class, status) AS (VALUES {_REVCLASS_VALUES}),
    j AS (
      SELECT rc.pattern_class, rc.revision, rev.rev_date, rc.status, rev.rev_seq,
             row_number() OVER (PARTITION BY rc.pattern_class
                                ORDER BY rev.rev_seq DESC, rc.status ASC) AS rn
      FROM rc JOIN rev ON rc.revision = rev.revision
    )
    SELECT pattern_class, revision, rev_date, status FROM j WHERE rn = 1
    """,
)
def q_scd_latest_per_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD current-row resolution: the most recent revision touching
    each pattern class (highest rev_seq wins)."""
    return latest_revision_per_class(spark)


@_register(
    "q_scd2_intervals",
    """
    WITH ev AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events
    ),
    marked AS (
      SELECT *,
             CASE WHEN lag(1) OVER w IS NULL
                    OR lag(event_type) OVER w IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS chg
      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ),
    starts AS (SELECT * FROM marked WHERE chg = 1)
    SELECT user_id, event_type,
           CAST(us AS BIGINT) AS valid_from_us,
           CAST(lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
                AS BIGINT) AS valid_to_us,
           CAST(CASE WHEN lead(us) OVER (
                  PARTITION BY user_id ORDER BY us, event_id) IS NULL
                THEN 1 ELSE 0 END AS INTEGER) AS is_current
    FROM starts
    """,
)
def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 dimension built from the events change log
    (revisions.scd2_intervals): per user, runs of identical event_type
    collapse into one half-open validity interval, chained so each
    version ends where the next begins; the open interval is flagged
    current. Timestamps are BIGINT epoch-micros and the run/chain
    logic is two windows over one sort, replayed identically by the
    oracle (event_id breaks same-instant ties deterministically)."""
    from .revisions import scd2_intervals

    e = _spread(spark, _t(spark, sf_dir, "events"))
    return scd2_intervals(
        e, key="user_id", ts_col="ts", attr_cols=["event_type"],
        tiebreak=["event_id"],
    )
