"""Log-mining operators: template extraction and multiline record
assembly.

Template mining is the inverse of the reference's registry-driven
decode (``decoder/field_decoder.py:14-114`` applies KNOWN patterns;
``mine_templates`` DISCOVERS the pattern inventory from raw lines by
masking variable tokens — the standard Drain/logmine first step used
to bootstrap such a registry). Multiline assembly is the classic
pre-parse stage for stack-trace-style records (the reference's
repeat-group payloads, ``decoder/payload_decoder.py:133-209``, play
the same role inside one packet; here continuation LINES are folded
into their anchor record before parsing).

Both are pure DataFrame expressions — no UDFs, one shuffle each:

* ``mine_templates``: mask → groupBy(template). The count/example
  aggregates partial-aggregate map-side to ~|templates| rows per
  task; the ``countDistinct(conv)`` column plans as a two-stage
  distinct aggregate whose FIRST shuffle keys on (template, conv) —
  volume ∝ distinct template-per-conversation pairs, bounded by the
  line count but not by the inventory. At 100 TB swap it for
  ``approx_count_distinct`` to collapse that stage to sketch rows.
* ``assemble_records``: running SUM(is_start) window inside each
  partition key (one conversation/file — bounded), then one groupBy
  of (key, record id). Records never span partition keys, so the
  window state is bounded regardless of total corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["mask_template", "mine_templates", "assemble_records", "template_drift"]


def mask_template(text: Column | str) -> Column:
    """Mask the variable tokens of a log line, keeping its constant
    skeleton: hex literals → ``<HEX>`` first (so their digits don't
    decay into ``<N>`` fragments), then decimal runs → ``<N>``.
    Spark's regexp_replace is replace-ALL, matching DuckDB's 'g'."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(
        F.regexp_replace(c, "0x[0-9a-fA-F]+", "<HEX>"), "[0-9]+", "<N>"
    )


def mine_templates(
    lines: DataFrame,
    text_col: str = "text",
    conv_col: str = "conv_id",
    approx_distinct: bool = False,
) -> DataFrame:
    """Discover the template inventory of a log stream: one row per
    masked skeleton with its line count, distinct-source spread, and
    the lexicographically-least concrete example (deterministic).

    ``approx_distinct=True`` swaps the exact ``countDistinct`` for the
    HLL ``approx_count_distinct`` — at 100 TB that collapses the
    distinct-aggregate's (template, conv)-keyed first shuffle into
    map-side-merged sketches, making the whole op inventory-sized."""
    n_convs = (
        F.approx_count_distinct("_conv") if approx_distinct else F.countDistinct("_conv")
    )
    return (
        lines.select(
            mask_template(text_col).alias("template"),
            F.col(conv_col).alias("_conv"),
            F.col(text_col).alias("_text"),
        )
        .groupBy("template")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            n_convs.alias("n_convs"),
            F.min("_text").alias("example"),
        )
    )


def assemble_records(
    lines: DataFrame,
    is_start: Column,
    part_col: str = "conv_id",
    order_col: str = "turn_idx",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """Fold continuation lines into their anchor line: record id =
    running count of starts within the partition key, then one
    ordered concat per record. Lines before the first anchor (a
    stream resumed mid-record) assemble as record 0 — kept, so no
    data is dropped at a resume boundary."""
    w = (
        Window.partitionBy(part_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    numbered = lines.withColumn(
        "rec_id", F.sum(is_start.cast("long")).over(w)
    )
    # array_sort on struct(order, text) orders by the leading field;
    # the concat is deterministic whatever order collect_list saw
    return numbered.groupBy(part_col, "rec_id").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.min(order_col).alias("start_turn"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct(order_col, text_col))),
                lambda s: s[text_col],
            ),
            sep,
        ).alias("record"),
    )


def template_drift(
    lines: DataFrame,
    side: Column,
    text_col: str = "text",
) -> DataFrame:
    """Template-inventory drift between two slices of one log stream
    (deploy A vs deploy B, last week vs this week): per template, the
    line count on each side and a status — ``appeared`` (only side B),
    ``vanished`` (only side A), ``both``. New/vanished templates are
    the release-regression signal template mining exists to surface.

    ``side`` must evaluate to FALSE for slice A and TRUE for slice B;
    rows where it is NULL belong to NEITHER slice and are excluded
    explicitly (an unfiltered NULL would silently poison the counts —
    an all-NULL template would read n_a=NULL/n_b=NULL status 'both').
    One conditional aggregate over one groupBy — no join of two
    separately-mined inventories, so one corpus pass total, and the
    same map-side-combine shape as :func:`mine_templates`."""
    b = side.cast("boolean")
    return (
        lines.filter(b.isNotNull())
        .select(mask_template(text_col).alias("template"), b.alias("_b"))
        .groupBy("template")
        .agg(
            F.sum((~F.col("_b")).cast("long")).alias("n_a"),
            F.sum(F.col("_b").cast("long")).alias("n_b"),
        )
        .withColumn(
            "status",
            F.when(F.col("n_a") == 0, "appeared")
            .when(F.col("n_b") == 0, "vanished")
            .otherwise("both"),
        )
    )
