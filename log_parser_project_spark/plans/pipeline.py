"""The flagship job: parse → enrich → route → aggregate, fanned out.

This is the Spark analog of the reference's packet-decode lifecycle
(SURVEY.md §3.3): scan → routing-key projection → broadcast registry
lookup → vectorized field extraction → derived metrics → sink.

Plan shape (deliberate): the parse/enrich/route stages are all
*narrow* — one whole-stage-codegen'd pipeline from the scan, with the
single pandas-UDF exchange for extraction. Shuffles happen only at the
per-sink aggregates. At 100 TB that means the expensive text pass
happens exactly once (persisted before fan-out), and each aggregate
shuffles only its grouping columns.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..metrics import dump, observed
from ..operators.aggregate import per_sink_aggregates
from ..operators.enrich import apply_enums, derive_metrics, enrich
from ..operators.parse import explode_repeats, parse
from ..operators.route import fan_out, route

SINK_COLUMNS = [
    "conv_id", "turn_idx", "role", "text", "tool", "ts",
    "pattern_class", "version", "matched", "extracted", "repeats",
    "role_class", "weight", "tool_family", "risk_level",
    "severity_friendly", "tokens_per_sec", "route",
]


@dataclass
class PipelineResult:
    sink_counts: dict[str, int] = field(default_factory=dict)
    metrics: dict = field(default_factory=dict)
    aggregates: dict[str, str] = field(default_factory=dict)


def build_routed(spark: SparkSession, transcripts: DataFrame) -> DataFrame:
    """The narrow portion of the plan: everything before any shuffle."""
    df = parse(transcripts)
    df = enrich(df, spark)
    df = apply_enums(df)
    df = derive_metrics(df)
    df = route(df)
    return df.select(*SINK_COLUMNS)


def run_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    catalog: Catalog,
    metrics_path: str | None = None,
    write_repeats: bool = True,
) -> PipelineResult:
    routed, obs = observed(build_routed(spark, transcripts))

    def writer(sink: str, sink_df: DataFrame) -> int:
        snap = catalog.write_table(
            sink_df.withColumn("day", F.to_date("ts")),
            sink,
            partition_by=["day"],
            lineage={"stage": "fan_out", "sink": sink},
        )
        return snap.row_count

    sink_counts = fan_out(routed, writer)

    result = PipelineResult(sink_counts=sink_counts)
    if metrics_path:
        result.metrics = dump(obs, metrics_path, extra={"sink_counts": sink_counts})
    else:
        result.metrics = dict(obs.get)

    # per-sink aggregates over the routed fact (read back from the
    # committed sinks so aggregates reflect exactly what was written)
    routed_all = None
    for sink in sink_counts:
        if sink_counts[sink] == 0:
            continue
        t = catalog.read_table(sink)
        routed_all = t if routed_all is None else routed_all.unionByName(t)
    if routed_all is not None:
        for name, agg_df in per_sink_aggregates(routed_all).items():
            snap = catalog.write_table(agg_df, f"agg_{name}", lineage={"stage": "aggregate"})
            result.aggregates[name] = snap.snapshot_id

    if write_repeats:
        rep = explode_repeats(catalog.read_table("sink_tool_calls").unionByName(
            catalog.read_table("sink_citations")
        )) if sink_counts.get("sink_tool_calls") or sink_counts.get("sink_citations") else None
        if rep is not None:
            catalog.write_table(rep, "sink_repeat_records", lineage={"stage": "explode_repeats"})

    return result
