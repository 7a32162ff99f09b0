"""Deterministic synthetic transcripts generator (FIXTURES.md §1-3).

Produces exactly the ``input_hint`` schema::

    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp

**Spark-first**: the whole table is generated JVM-side from
``spark.range`` + hash expressions (``xxhash64``), never from
driver-side Python loops, so the same call scales from 1.5k rows in
tests to billions on a cluster, and the content of every row is a pure
deterministic function of ``(conv_id, turn_idx)`` — independent of
partitioning and parallelism level, which the two-parallelism scaling
benchmark depends on.

This is the analog of the reference's fixture corpus (hex packets +
metadata JSONs, e.g. ``hex_decoder_module/test_packet.hex`` +
``metadata_0xB888.json``) — but generated, not committed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ROLES = ["user", "assistant", "system", "tool"]
TOOLS = ["search", "bash", "editor", "browser", "sql"]
WORDS = [
    "timeout", "retry", "overload", "parse", "network", "disk", "auth",
    "quota", "schema", "upstream", "cache", "panic",
]
EPOCH = "2026-01-01 00:00:00"


def _h(*cols) -> F.Column:
    """Deterministic non-negative 64-bit hash of the given columns."""
    return F.abs(F.xxhash64(*cols))


def make_transcripts(
    spark: SparkSession,
    n_convs: int = 100,
    hot_conv_rows: int = 0,
    parts: int | None = None,
) -> DataFrame:
    """Build the transcripts DataFrame.

    ``hot_conv_rows`` > 0 appends a single skewed conversation
    (``conv-hot-0000``) with that many turns — the skew fixture for the
    salted-aggregate path (FIXTURES.md §1 skew mode).
    """
    convs = spark.range(0, n_convs, 1, parts or spark.sparkContext.defaultParallelism)
    # turns per conv: seeded geometric-ish, clamped to [1, 64]
    u = (_h(F.col("id"), F.lit("nturns")) % 1_000_000) / 1_000_000.0
    convs = convs.withColumn(
        "n_turns",
        F.least(F.lit(64), F.greatest(F.lit(1), F.ceil(F.log(1.0 - u) / F.log(F.lit(0.85))))).cast("int"),
    )
    base = convs.select(
        F.format_string("conv-%08d", F.col("id")).alias("conv_id"),
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )
    if hot_conv_rows > 0:
        hot = spark.range(0, hot_conv_rows, 1, parts or 8).select(
            F.lit("conv-hot-0000").alias("conv_id"),
            F.col("id").cast("int").alias("turn_idx"),
        )
        base = base.unionByName(hot)
    return _fill_columns(base)


def _fill_columns(base: DataFrame) -> DataFrame:
    """Derive role/text/tool/ts deterministically from (conv_id, turn_idx)."""
    c, t = F.col("conv_id"), F.col("turn_idx")

    role_r = _h(c, t, F.lit("role")) % 100
    role = (
        F.when(t == 0, "user")
        .when(role_r < 10, "system")
        .when(role_r < 30, "tool")
        .when(role_r < 65, "assistant")
        .otherwise("user")
    )

    # template selection — the analog of the reference's logcode mix
    tpl_r = _h(c, t, F.lit("tpl")) % 100
    tpl = (
        F.when(tpl_r < 18, "tool_call")
        .when(tpl_r < 36, "error")
        .when(tpl_r < 52, "citation")
        .when(tpl_r < 70, "metric")
        .when(tpl_r < 80, "handoff_v1")
        .when(tpl_r < 90, "handoff_v2")
        .otherwise("prose")
    )

    tool_pick = F.element_at(F.array(*[F.lit(x) for x in TOOLS]), (_h(c, t, F.lit("tool")) % 5 + 1).cast("int"))
    word = lambda salt: F.element_at(  # noqa: E731
        F.array(*[F.lit(w) for w in WORDS]), (_h(c, t, F.lit(salt)) % len(WORDS) + 1).cast("int")
    )
    num = lambda salt, m: (_h(c, t, F.lit(salt)) % m).cast("int")  # noqa: E731

    # tool_call: 1-4 repeated k=v pairs (repeating-record analog, §2.8)
    n_pairs = (num("npairs", 4) + 1)
    pairs = F.concat_ws(
        ",",
        F.transform(
            F.sequence(F.lit(1), n_pairs),
            lambda i: F.concat(F.lit("k"), i.cast("string"), F.lit("="), (F.abs(F.xxhash64(c, t, i)) % 1000).cast("string")),
        ),
    )
    tool_call_text = F.concat(F.lit("CALL "), tool_pick, F.lit(" args={"), pairs, F.lit("}"))

    error_text = F.concat(
        F.lit("ERROR code="), num("ecode", 600).cast("string"),
        F.lit(" severity="), (num("esev", 5) + 1).cast("string"),
        F.lit(" msg='"), word("emsg"), F.lit(" "), word("emsg2"), F.lit("'"),
    )

    n_cites = num("ncites", 3) + 1
    cites = F.concat_ws(
        " and ",
        F.transform(
            F.sequence(F.lit(1), n_cites),
            lambda i: F.concat(
                F.lit("[doc-"), (F.abs(F.xxhash64(c, t, i, F.lit("doc"))) % 10000).cast("string"),
                F.lit("#"), (F.abs(F.xxhash64(c, t, i, F.lit("pg"))) % 500).cast("string"), F.lit("]"),
            ),
        ),
    )
    citation_text = F.concat(F.lit("see "), cites)

    metric_text = F.concat(
        F.lit("latency_ms="), F.format_number(num("lat", 100000) / 100.0, 2),
        F.lit(" tokens="), (num("tok", 4000) + 1).cast("string"),
    )
    # format_number inserts thousands separators — strip to keep it regex-friendly
    metric_text = F.regexp_replace(metric_text, ",", "")

    handoff_role = F.element_at(F.array(*[F.lit(r) for r in ROLES]), (num("hrole", 4) + 1))
    handoff_v1_text = F.concat(F.lit("HANDOFF to="), handoff_role, F.lit(" reason="), word("hwhy"))
    handoff_v2_text = F.concat(
        F.lit("HANDOFF v=2 to="), handoff_role, F.lit(" reason="), word("hwhy"),
        F.lit(" priority="), (num("hpri", 9) + 1).cast("string"),
    )

    prose_text = F.concat_ws(" ", word("p1"), word("p2"), word("p3"), word("p4"), word("p5"))

    text = (
        F.when(tpl == "tool_call", tool_call_text)
        .when(tpl == "error", error_text)
        .when(tpl == "citation", citation_text)
        .when(tpl == "metric", metric_text)
        .when(tpl == "handoff_v1", handoff_v1_text)
        .when(tpl == "handoff_v2", handoff_v2_text)
        .otherwise(prose_text)
    )

    tool = F.when((role == "tool") | (tpl == "tool_call"), tool_pick).otherwise(F.lit(None).cast("string"))

    conv_offset = _h(c, F.lit("off")) % (86400 * 30)
    ts = F.to_timestamp(F.lit(EPOCH)) + F.make_interval(secs=(conv_offset + t * 7).cast("double"))

    return base.select(
        c,
        t.cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )
