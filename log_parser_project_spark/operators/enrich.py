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
    out = df
    for p in patterns:
        if not p.enum_map or not p.enum_field:
            continue
        m = F.create_map(*[F.lit(x) for kv in p.enum_map.items() for x in kv])
        raw = F.col(f"extracted.{p.enum_field}")
        out = out.withColumn(
            f"{p.enum_field}_friendly",
            F.when(raw.isNull(), None).otherwise(
                F.coalesce(m[raw], F.concat(F.lit("UNKNOWN("), raw, F.lit(")")))
            ),
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
