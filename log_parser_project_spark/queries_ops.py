"""Third query batch: the remaining SURVEY.md §2 operator families —
ordered merges, mixed-type sorts, dependency-closure joins, dynamic
repeat expansion, normalization/conversion scalars, JSON sink
projection — each with a DuckDB oracle. Registered into the shared
``QUERIES`` dict.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import QUERIES, _register, _t

_K = 'CAST(regexp_extract(props, \'"k": (\\d+)\', 1) AS BIGINT)'


def _k(ev):
    return F.regexp_extract("props", r'"k": (\d+)', 1).cast("long")


# ---------------------------------------------------------------------------
# A1: group + ordered merge (continuation-merge analog)
# ---------------------------------------------------------------------------

@_register(
    "q_a1_ordered_merge",
    """
    SELECT o_custkey,
           COUNT(*) AS n_orders,
           string_agg(o_orderpriority, '|' ORDER BY o_orderdate, o_orderkey) AS merged
    FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 3
    """,
)
def q_a1_ordered_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-ordered table merge (A1, reference pdf_extractor.py:180-224):
    collect rows per key, sort by a stable order key, concatenate."""
    o = _t(spark, sf_dir, "orders")
    merged = F.concat_ws(
        "|",
        F.transform(
            F.array_sort(F.collect_list(F.struct("o_orderdate", "o_orderkey", "o_orderpriority"))),
            lambda s: s["o_orderpriority"],
        ),
    )
    return (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"), merged.alias("merged"))
        .filter(F.col("n_orders") >= 3)
    )


# ---------------------------------------------------------------------------
# W2/W3: mixed-type + two-level numeric sort keys
# ---------------------------------------------------------------------------

@_register(
    "q_w3_table_number_sort",
    f"""
    WITH t AS (
      SELECT DISTINCT ({_K} % 5)::BIGINT || '-' || ({_K} % 13)::BIGINT AS table_no
      FROM events
    )
    SELECT table_no,
           row_number() OVER (
             ORDER BY CAST(string_split(table_no, '-')[1] AS BIGINT),
                      CAST(string_split(table_no, '-')[2] AS BIGINT)
           ) AS rnk
    FROM t
    """,
)
def q_w3_table_number_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric (major, minor) sort of "X-Y" strings (W3, reference
    query_engine.py:69-73)."""
    ev = _t(spark, sf_dir, "events")
    k = _k(ev)
    t = ev.select(
        F.concat((k % 5).cast("string"), F.lit("-"), (k % 13).cast("string")).alias("table_no")
    ).distinct()
    w = Window.orderBy(
        F.split("table_no", "-")[0].cast("long"), F.split("table_no", "-")[1].cast("long")
    )
    return t.withColumn("rnk", F.row_number().over(w))


@_register(
    "q_w2_mixed_sort",
    """
    WITH v AS (
      SELECT DISTINCT CASE WHEN p_size < 10 THEN CAST(p_size AS VARCHAR)
                           WHEN p_size < 30 THEN '0x' || to_hex(p_size)
                           ELSE p_type END AS version
      FROM part
    )
    SELECT version,
           row_number() OVER (ORDER BY
             CASE WHEN regexp_matches(version, '^\\d+$') THEN 0
                  WHEN regexp_matches(version, '^0x') THEN 1 ELSE 2 END,
             CASE WHEN regexp_matches(version, '^\\d+$') THEN CAST(version AS BIGINT)
                  WHEN regexp_matches(version, '^0x') THEN CAST(('0x' || substr(version, 3))::UBIGINT AS BIGINT)
                  ELSE 0 END,
             version) AS rnk
    FROM v
    """,
)
def q_w2_mixed_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-type version sort — decimals first, then hex, then strings
    (W2, reference parser.py:400-415 sort key (0,int) < (1,hex) < (2,str))."""
    p = _t(spark, sf_dir, "part")
    version = (
        F.when(F.col("p_size") < 10, F.col("p_size").cast("string"))
        .when(F.col("p_size") < 30, F.concat(F.lit("0x"), F.hex("p_size")))
        .otherwise(F.col("p_type"))
    )
    v = p.select(version.alias("version")).distinct()
    cls = (
        F.when(F.col("version").rlike(r"^\d+$"), 0)
        .when(F.col("version").rlike("^0x"), 1)
        .otherwise(2)
    )
    num = (
        F.when(F.col("version").rlike(r"^\d+$"), F.col("version").cast("long"))
        .when(F.col("version").rlike("^0x"), F.conv(F.substring("version", 3, 16), 16, 10).cast("long"))
        .otherwise(F.lit(0))
    )
    return v.withColumn("rnk", F.row_number().over(Window.orderBy(cls, num, "version")))


# ---------------------------------------------------------------------------
# J3: dependency-closure (BFS / recursive join)
# ---------------------------------------------------------------------------

@_register(
    "q_j3_dep_closure",
    f"""
    WITH RECURSIVE nodes AS (SELECT DISTINCT {_K} % 100 AS node FROM events),
    closure(root, node) AS (
      SELECT node AS root, node FROM nodes WHERE node >= 90
      UNION
      SELECT c.root, c.node // 2 FROM closure c WHERE c.node > 0
    )
    SELECT root, COUNT(*) AS n_reachable, CAST(MIN(node) AS BIGINT) AS min_node
    FROM closure GROUP BY root
    """,
)
def q_j3_dep_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive dependency closure via iterative self-join with a
    visited set (J3, reference query_engine.py:84-102 BFS). Spark has
    no recursive CTE — the driver loop IS the idiomatic translation
    (depth is bounded; each iteration is one distributed join/union)."""
    ev = _t(spark, sf_dir, "events")
    nodes = ev.select((_k(ev) % 100).alias("node")).distinct()
    frontier = nodes.filter(F.col("node") >= 90).select(
        F.col("node").alias("root"), F.col("node")
    )
    closure = frontier
    # halving chain: ≤7 hops from 99 to 0; loop until fixpoint
    for _ in range(8):
        nxt = (
            closure.filter(F.col("node") > 0)
            .select("root", (F.col("node") / 2).cast("long").alias("node"))
        )
        new_closure = closure.unionByName(nxt).distinct()
        closure = new_closure
    return closure.groupBy("root").agg(
        F.count(F.lit(1)).alias("n_reachable"), F.min("node").alias("min_node")
    )


# ---------------------------------------------------------------------------
# J6 + §2.8: dynamic repeat-count resolution + expansion
# ---------------------------------------------------------------------------

@_register(
    "q_j6_dynamic_repeat",
    f"""
    WITH src AS (
      SELECT event_type,
             COALESCE(NULLIF({_K} % 5, 0), NULLIF(bit_count({_K}) % 3, 0), 1) AS cnt
      FROM events
    )
    SELECT event_type, COUNT(*) AS n_records, CAST(SUM(rec) AS BIGINT) AS sum_rec
    FROM (SELECT event_type, unnest(generate_series(1, cnt)) AS rec FROM src)
    GROUP BY event_type
    """,
)
def q_j6_dynamic_repeat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat count resolved from earlier fields via coalesce chain
    (J6: Num CA → Num Records → popcount → 1, reference
    payload_decoder.py:211-241), then record expansion (§2.8)."""
    ev = _t(spark, sf_dir, "events")
    k = _k(ev)
    cnt = F.coalesce(
        F.nullif(k % 5, F.lit(0)), F.nullif(F.bit_count(k) % 3, F.lit(0)), F.lit(1)
    )
    return (
        ev.select("event_type", F.explode(F.sequence(F.lit(1), cnt)).alias("rec"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_records"), F.sum("rec").alias("sum_rec"))
    )


# ---------------------------------------------------------------------------
# F5/F7/P6: scalar conversions & normalization
# ---------------------------------------------------------------------------

@_register(
    "q_f5_twos_complement",
    f"""
    SELECT CASE WHEN ({_K} % 256) >= 128 THEN ({_K} % 256) - 256 ELSE {_K} % 256 END AS signed8,
           COUNT(*) AS n
    FROM events GROUP BY 1
    """,
)
def q_f5_twos_complement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two's-complement reinterpret (F5, reference
    type_converters.py:88-111: sign-bit test + subtract)."""
    ev = _t(spark, sf_dir, "events")
    raw = _k(ev) % 256
    signed = F.when(raw >= 128, raw - 256).otherwise(raw)
    return ev.groupBy(signed.alias("signed8")).agg(F.count(F.lit(1)).alias("n"))


@_register(
    "q_f7_ceil_div",
    f"""
    SELECT CAST(({_K} + 7) // 8 AS BIGINT) AS n_bytes, COUNT(*) AS n
    FROM events GROUP BY 1
    """,
)
def q_f7_ceil_div(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bits→bytes ceil-div (F7, pervasive ``(bits + 7) // 8``)."""
    ev = _t(spark, sf_dir, "events")
    k = _k(ev)
    return ev.groupBy(F.floor((k + 7) / 8).cast("long").alias("n_bytes")).agg(
        F.count(F.lit(1)).alias("n")
    )


@_register(
    "q_p6_normalize_code",
    f"""
    SELECT printf('0x%04X', {_K}) AS code, COUNT(*) AS n
    FROM events GROUP BY 1
    """,
)
def q_p6_normalize_code(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logcode normalization (P6: uppercase + 0x prefix + pad,
    reference query_engine.py:44-47)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(F.format_string("0x%04X", _k(ev)).alias("code")).agg(
        F.count(F.lit(1)).alias("n")
    )


# ---------------------------------------------------------------------------
# P10: split + findall + explode (revision-history analog)
# ---------------------------------------------------------------------------

@_register(
    "q_p10_findall_tokens",
    """
    SELECT lang,
           CAST(SUM(len(regexp_extract_all(text, '\\b(join|scan|merge)\\b'))) AS BIGINT) AS n_opwords
    FROM documents GROUP BY lang
    """,
)
def q_p10_findall_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """findall-style multi-match extraction rolled up (P10, reference
    pdf_extractor.py:337-356 ``findall(0x…)`` over descriptions)."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.sum(F.size(F.regexp_extract_all("text", F.lit(r"\b(join|scan|merge)\b"), 0)))
        .cast("long")
        .alias("n_opwords")
    )


# ---------------------------------------------------------------------------
# A6 + K2/F10: display-width scan and JSON sink projection
# ---------------------------------------------------------------------------

@_register(
    "q_a6_column_widths",
    """
    SELECT CAST(MAX(length(p_name)) AS BIGINT) AS w_name,
           CAST(MAX(length(p_brand)) AS BIGINT) AS w_brand,
           CAST(MAX(length(p_type)) AS BIGINT) AS w_type,
           COUNT(*) AS n
    FROM part
    """,
)
def q_a6_column_widths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-width max scan (A6, reference query_engine.py:187-215)."""
    p = _t(spark, sf_dir, "part")
    return p.agg(
        F.max(F.length("p_name")).cast("long").alias("w_name"),
        F.max(F.length("p_brand")).cast("long").alias("w_brand"),
        F.max(F.length("p_type")).cast("long").alias("w_type"),
        F.count(F.lit(1)).alias("n"),
    )


@_register(
    "q_k2_json_sink",
    """
    SELECT doc_id, to_json(struct_pack(lang := lang, n_chars := n_chars)) AS payload
    FROM documents WHERE doc_id < 20
    """,
)
def q_k2_json_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON sink projection (K2/K3/F10, reference json_builder.py +
    datastore.export_to_json): build the serialized payload column."""
    d = _t(spark, sf_dir, "documents")
    return d.filter(F.col("doc_id") < 20).select(
        "doc_id", F.to_json(F.struct("lang", "n_chars")).alias("payload")
    )


# ---------------------------------------------------------------------------
# SO5: used-set exclusion
# ---------------------------------------------------------------------------

@_register(
    "q_so5_unused_parts",
    """
    SELECT p_brand, COUNT(*) AS n_unused
    FROM part WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem)
    GROUP BY p_brand
    """,
)
def q_so5_unused_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Claimed-keys exclusion set (SO5, reference
    parallel_pdf_parser.py:334-347 used_tables)."""
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    return (
        p.join(li.select(F.col("l_partkey").alias("p_partkey")), "p_partkey", "left_anti")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_unused"))
    )


# The former rows-only `q_pipeline_routed` / `q_w1_turn_features`
# registrations are retired: the strong-gate `q_pl_routed_events` /
# `q_pl_repeat_records` (queries_ops3) value-hash the same pipeline
# end-to-end over DuckDB-reconstructible input, and
# `q_w1_event_features` oracle-checks the same window features.
