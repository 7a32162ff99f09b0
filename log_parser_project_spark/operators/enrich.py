"""Enrich stage: broadcast hash joins + derived columns.

The reference's lookups are all hash-equi probes into small in-memory
dimensions (logcode metadata ``J1``, version map ``J2``, enum map
``J10`` — SURVEY.md §2.3), so the universal Spark mapping is the
**broadcast hash join**: the fact side streams, the dims ship to every
executor, no shuffle. ``F.broadcast`` is explicit even though AQE
would usually pick it — at 100 TB we do not want a planner misestimate
to sort-merge-join a 4-row dim.

Derived metrics mirror the reference's field post-processor
(``decoder/field_post_processor.py:19-148`` — the BLER percentage):
plain ``when/otherwise`` column arithmetic, fully codegen'd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import PATTERNS, Pattern, dim_roles_df, dim_tools_df


def enrich(df: DataFrame, spark: SparkSession) -> DataFrame:
    """Broadcast-join role/tool dims onto the parsed fact."""
    roles = dim_roles_df(spark)
    tools = dim_tools_df(spark)
    return (
        df.join(F.broadcast(roles), "role", "left")
        .join(F.broadcast(tools), "tool", "left")
    )


def apply_enums(df: DataFrame, patterns: tuple[Pattern, ...] = PATTERNS) -> DataFrame:
    """Map raw enum values to friendly labels (J10).

    The registry's enum maps are tiny and known at plan time, so they
    become literal ``map`` expressions (``element_at``) rather than
    joins — Catalyst constant-folds them into codegen. Unknown raw
    values get ``UNKNOWN(v)``, matching the reference's default
    (``utils/enum_mapper.py:8-24``).
    """
    # group by enum_field: two patterns (e.g. two versions of a class)
    # may declare the same field with DIFFERENT maps — one output column
    # per field, with the map selected per (pattern_class, version)
    # row-wise (last-writer-wins withColumn would both duplicate the
    # column and mis-map the earlier versions)
    by_field: dict[str, list] = {}
    for p in patterns:
        if p.enum_map and p.enum_field:
            by_field.setdefault(p.enum_field, []).append(p)
    out = df
    for fld, pats in by_field.items():
        raw = F.col(f"extracted.{fld}")
        expr = F.lit(None).cast("string")
        for p in pats:
            m = F.create_map(*[F.lit(x) for kv in p.enum_map.items() for x in kv])
            mapped = F.coalesce(m[raw], F.concat(F.lit("UNKNOWN("), raw, F.lit(")")))
            expr = F.when(
                (F.col("pattern_class") == p.pattern_class)
                & (F.col("version") == p.version),
                mapped,
            ).otherwise(expr)
        out = out.withColumn(
            f"{fld}_friendly", F.when(raw.isNull(), None).otherwise(expr)
        )
    return out


def derive_metrics(df: DataFrame) -> DataFrame:
    """Post-processing derived columns (the BLER analog, A9).

    ``tokens_per_sec = tokens / (latency_ms/1000)``, guarded like the
    reference guards divide-by-zero (``field_post_processor.py:58-66``).
    """
    lat = F.col("extracted.latency_ms").cast("double")
    tok = F.col("extracted.tokens").cast("long")
    return df.withColumn(
        "tokens_per_sec",
        F.when(
            (F.col("pattern_class") == "metric") & lat.isNotNull() & (lat > 0),
            F.round(tok / (lat / 1000.0), 2),
        ).otherwise(F.lit(None).cast("double")),
    )
