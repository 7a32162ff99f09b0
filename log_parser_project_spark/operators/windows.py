"""Conversation-ordered window operations (SURVEY.md §2.5).

The reference's central ordered-data contract is W1: per-table rows
keep a persisted ``row_index`` and are always read back in that order
(``src/datastore.py:184-202, 258-267``). The transcripts analog is the
per-conversation turn order — every ordered feature is computed over
``Window.partitionBy(conv_id).orderBy(turn_idx)``, which is also the
ordering the per-turn text-equality invariant is pinned to.

At scale these windows shuffle once on ``conv_id``; all of the
features below reuse that single shuffle (same window spec → same
exchange), and none of them buffers unbounded state per key (lag/lead/
row_number/running-count are streaming-friendly frame specs — no
``collect_list`` per conversation, per SURVEY.md §7.4 risk 6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

CONV_WINDOW = Window.partitionBy("conv_id").orderBy("turn_idx")


def with_turn_features(df: DataFrame) -> DataFrame:
    """Add prev-role lag, next-role lead, running turn count, and the
    running last-seen tool (W5's last-non-null-over-ordered-rows)."""
    w = CONV_WINDOW
    running = w.rowsBetween(Window.unboundedPreceding, 0)
    return (
        df.withColumn("prev_role", F.lag("role").over(w))
        .withColumn("next_role", F.lead("role").over(w))
        .withColumn("turn_number", F.row_number().over(w))
        .withColumn("last_tool", F.last("tool", ignorenulls=True).over(running))
        .withColumn(
            "seconds_since_prev",
            (F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)),
        )
    )


def stable_order(df: DataFrame) -> DataFrame:
    """The canonical ordering for per-turn equality checks."""
    return df.orderBy("conv_id", "turn_idx")


def sessionize(
    df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
):
    """Gap-based sessionization via Spark's built-in ``session_window``
    — the canonical log-analytics rollup (and the exact operator the
    streaming path would use with a watermark, so batch and streaming
    sessions agree by construction).

    One shuffle on ``key``; the session assignment itself is a sort
    within each hash partition, never a per-key global structure, and
    no per-session state beyond the aggregate accumulators is held.
    Session boundary semantics are INCLUSIVE (empirically verified,
    pinned by tests): an event exactly ``gap`` after the previous one
    MERGES into the session; only a strictly larger gap starts a new
    one (window = [start, last_ts + gap]).
    """
    return df.groupBy(key, F.session_window(ts_col, gap))
