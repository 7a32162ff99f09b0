"""Driver-contract query set: Spark implementations + DuckDB oracles.

One entry per operator family from SURVEY.md §2, expressed over the
driver's testdata tables (TPC-H-ish star schema + events + documents +
embeddings). Each Spark callable and its oracle SQL alias every
computed column to the SAME name; doubles are rounded to fixed
decimals; timestamps are reduced to TZ-free epoch integers so the
comparison is independent of session timezone.

Naming convention: ``q_<operator-id>_<what>`` where the operator id
points into SURVEY.md §2 (J1 = broadcast lookup join, W4 = lead
window, A9 = derived-ratio aggregate, …).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

QuerySpec = tuple[Callable[[SparkSession, str], DataFrame], str | None]
QUERIES: dict[str, QuerySpec] = {}


def _register(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = (fn, sql)
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def cents(col: str | object) -> "F.Column":
    """Exact BIGINT fixed-point for 2-decimal money/quantity doubles:
    ``floor(x*100 + 0.5)``. The SAME expression must appear in every
    oracle (``CAST(floor(x * 100 + 0.5) AS BIGINT)``) — decimal types
    are banned from contract outputs (the driver's comparator hash-fails
    them even when values are byte-identical; see
    tests/test_oracle_type_alignment.py). Note floor(x+0.5) rounds
    half-AWAY-from-zero only for positives; for negatives it rounds
    half-up (toward +inf) — fine because both engines compute the
    identical double expression, but change it in ONE place only."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * 100 + F.lit(0.5)).cast("long")


def _est_partitions(sizes: list[int], open_cost: int, max_pb: int, parallelism: int) -> int:
    """Spark's FilePartition planning estimate (maxSplitBytes formula):
    file count alone is neither an upper nor a lower bound on scan
    partitions — one big file SPLITS into many, many tiny files PACK
    into few. Pure function so the heuristic is unit-testable."""
    import math

    total = sum(s + open_cost for s in sizes)
    if total <= 0:
        return 0
    max_split = min(max_pb, max(open_cost, total // max(parallelism, 1)))
    return max(1, math.ceil(total / max(max_split, 1)))


def _bytes_conf(spark: SparkSession, key: str, default: int) -> int:
    raw = str(spark.conf.get(key, str(default))).strip().lower()
    mult = 1
    # two-letter forms first: "64kb" must not parse as "64k" + stray 'b'
    for suf, m in (("kb", 2**10), ("mb", 2**20), ("gb", 2**30), ("tb", 2**40),
                   ("k", 2**10), ("m", 2**20), ("g", 2**30), ("t", 2**40), ("b", 1)):
        if raw.endswith(suf):
            raw = raw[: -len(suf)]
            mult = m
            break
    try:
        return int(raw) * mult
    except ValueError:
        return default


def _spread(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Round-robin repartition iff the scan will plan fewer partitions
    than cores — a small table otherwise runs CPU-heavy derived work
    (shingling, cosine) under-parallel. Partition count is estimated
    with Spark's own split/packing formula over the actual file sizes
    (local files only; non-local schemes assume a well-partitioned
    scan). At real scale the estimate is ≥ cores and this is a no-op
    (no shuffle inserted)."""
    from urllib.parse import urlparse

    cores = spark.sparkContext.defaultParallelism
    sizes = []
    for f in df.inputFiles():
        u = urlparse(f)
        if u.scheme not in ("", "file"):
            return df  # remote storage: planned at scale, leave it alone
        try:
            sizes.append(os.path.getsize(u.path or f))
        except OSError:
            return df
    est = _est_partitions(
        sizes,
        _bytes_conf(spark, "spark.sql.files.openCostInBytes", 4 * 2**20),
        _bytes_conf(spark, "spark.sql.files.maxPartitionBytes", 128 * 2**20),
        cores,
    )
    if est < cores:
        return df.repartition(cores)
    return df


# ===========================================================================
# Aggregations (SURVEY §2.4) — the per-sink hash-aggregate family
# ===========================================================================

@_register(
    "q_a9_pricing_summary",
    """
    WITH c AS (
      SELECT l_returnflag, l_linestatus,
             CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)      AS qty_c,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_c,
             CAST(floor(l_discount * 100 + 0.5) AS BIGINT)      AS disc_e2
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    )
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(qty_c) AS BIGINT)                    AS sum_qty_c,
           CAST(SUM(price_c) AS BIGINT)                  AS sum_base_price_c,
           CAST(SUM(price_c * (100 - disc_e2)) AS BIGINT) AS sum_disc_price_e4,
           CAST(CAST(SUM(qty_c) AS BIGINT) * 100 // COUNT(*) AS BIGINT)   AS avg_qty_e4,
           CAST(CAST(SUM(disc_e2) AS BIGINT) * 100 // COUNT(*) AS BIGINT) AS avg_disc_e4,
           COUNT(*)                                      AS count_order
    FROM c GROUP BY l_returnflag, l_linestatus
    """,
)
def q_a9_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: partial+final hash aggregate with
    derived measures (the BLER-style post-processed aggregate, A9/A4).

    Money/quantity sums are BIGINT fixed-point (cents / e4): the 2-decimal
    inputs become exact integers per row, so sums and integer-div averages
    are bit-deterministic in BOTH engines regardless of aggregation order —
    and no decimal type ever reaches the contract output (decimal outputs
    hash-fail in the driver's comparator even when values are identical)."""
    li = _t(spark, sf_dir, "lineitem")
    cutoff = F.lit("1998-09-02 00:00:00").cast("timestamp_ntz")
    return (
        li.filter(F.col("l_shipdate") <= cutoff)
        .select(
            "l_returnflag", "l_linestatus",
            cents("l_quantity").alias("qty_c"),
            cents("l_extendedprice").alias("price_c"),
            cents("l_discount").alias("disc_e2"),
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("qty_c").alias("sum_qty_c"),
            F.sum("price_c").alias("sum_base_price_c"),
            F.sum(F.col("price_c") * (F.lit(100) - F.col("disc_e2"))).alias("sum_disc_price_e4"),
            F.sum("disc_e2").alias("_sum_disc_e2"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .select(
            "l_returnflag", "l_linestatus", "sum_qty_c", "sum_base_price_c",
            "sum_disc_price_e4",
            F.expr("sum_qty_c * 100 div count_order").cast("long").alias("avg_qty_e4"),
            F.expr("_sum_disc_e2 * 100 div count_order").cast("long").alias("avg_disc_e4"),
            "count_order",
        )
    )


@_register(
    "q_a7_route_counts",
    """
    SELECT CASE WHEN event_type = 'error' THEN 'sink_errors'
                WHEN event_type IN ('purchase', 'signup') THEN 'sink_conversions'
                ELSE 'sink_activity' END AS route,
           COUNT(*) AS n,
           CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_c
    FROM events GROUP BY 1
    """,
)
def q_a7_route_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Routing-key fan-out tally (A7 accumulator analog + route CASE).
    Value sum in BIGINT cents — exact and decimal-free (see
    q_a9_pricing_summary)."""
    ev = _t(spark, sf_dir, "events")
    route = (
        F.when(F.col("event_type") == "error", "sink_errors")
        .when(F.col("event_type").isin("purchase", "signup"), "sink_conversions")
        .otherwise("sink_activity")
    )
    return ev.groupBy(route.alias("route")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents("value")).alias("sum_value_c"),
    )


@_register(
    "q_f9_time_bucket",
    """
    SELECT (epoch_us(ts) // 3600000000) * 3600 AS hour_epoch,
           event_type,
           COUNT(*) AS n
    FROM events GROUP BY 1, 2
    """,
)
def q_f9_time_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly time-bucket aggregate (F9) — TZ-free epoch bucketing."""
    ev = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    return ev.groupBy(
        (F.floor(us / 3_600_000_000) * 3600).cast("long").alias("hour_epoch"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("n"))


@_register(
    "q_a9_error_ratio",
    """
    SELECT user_id,
           COUNT(*) AS n_events,
           ROUND(100.0 * SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) / COUNT(*), 2) AS error_pct
    FROM events GROUP BY user_id HAVING COUNT(*) >= 2
    """,
)
def q_a9_error_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key failure-ratio metric — the direct BLER analog
    (reference field_post_processor.py:19-148: fail/(pass+fail)*100)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                100.0 * F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)) / F.count(F.lit(1)), 2
            ).alias("error_pct"),
        )
        .filter(F.col("n_events") >= 2)
    )


# ===========================================================================
# Joins / lookups (SURVEY §2.3)
# ===========================================================================

@_register(
    "q_j1_broadcast_enrich",
    """
    SELECT r_name, n_name,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_c
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def q_j1_broadcast_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact→dim broadcast hash-join chain (J1/J2): orders enriched
    through customer→nation→region, then aggregated. Revenue in BIGINT
    cents — exact and decimal-free (see q_a9_pricing_summary)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(cents("o_totalprice")).alias("revenue_c"),
        )
    )


@_register(
    "q_j5_anti_missing",
    """
    SELECT n_name, COUNT(*) AS n_customers_without_orders
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    GROUP BY n_name
    """,
)
def q_j5_anti_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join missing-set (J5/SO1: ``missing = referenced − extracted``,
    reference icd_query.py:268-274)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers_without_orders"))
    )


@_register(
    "q_so4_semi_present",
    """
    SELECT n_name, COUNT(*) AS n_suppliers
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE s_nationkey IN (SELECT c_nationkey FROM customer)
    GROUP BY n_name
    """,
)
def q_so4_semi_present(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join membership probe (SO4 visited-set analog)."""
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        s.join(c.select(F.col("c_nationkey").alias("s_nationkey")).distinct(), "s_nationkey", "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )


@_register(
    "q_j10_enum_map",
    """
    SELECT CASE event_type WHEN 'error' THEN 'FATAL-CHANNEL'
                           WHEN 'purchase' THEN 'REVENUE'
                           WHEN 'signup' THEN 'GROWTH'
                           ELSE 'UNKNOWN(' || event_type || ')' END AS friendly,
           COUNT(*) AS n
    FROM events GROUP BY 1
    """,
)
def q_j10_enum_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enum raw→friendly mapping with UNKNOWN(v) default (J10,
    reference utils/enum_mapper.py:8-24)."""
    ev = _t(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("error"), F.lit("FATAL-CHANNEL"),
        F.lit("purchase"), F.lit("REVENUE"),
        F.lit("signup"), F.lit("GROWTH"),
    )
    friendly = F.coalesce(m[F.col("event_type")], F.concat(F.lit("UNKNOWN("), F.col("event_type"), F.lit(")")))
    return ev.groupBy(friendly.alias("friendly")).agg(F.count(F.lit(1)).alias("n"))


# ===========================================================================
# Projections / filters / scalar functions (SURVEY §2.2, §2.7)
# ===========================================================================

@_register(
    "q_f1_regex_extract",
    """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(MAX(CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT)) AS BIGINT) AS max_k
    FROM events GROUP BY event_type
    """,
)
def q_f1_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex field extraction from a text payload (F1/P1 — the parse
    stage expressed with built-in regexp_extract)."""
    ev = _t(spark, sf_dir, "events")
    k = F.regexp_extract("props", r'"k": (\d+)', 1).cast("long")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
    )


@_register(
    "q_p7_like_search",
    """
    SELECT p_brand, COUNT(*) AS n
    FROM part
    WHERE lower(p_type) LIKE '%brass%' OR lower(p_name) LIKE '%green%'
    GROUP BY p_brand
    """,
)
def q_p7_like_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE-search predicate (P7, reference query_engine.py:228-246)."""
    p = _t(spark, sf_dir, "part")
    return (
        p.filter(F.lower("p_type").like("%brass%") | F.lower("p_name").like("%green%"))
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@_register(
    "q_f3_hex_roundtrip",
    """
    SELECT upper(substr(to_hex(CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT)), 1, 1)) AS hex_lead,
           COUNT(*) AS n
    FROM events GROUP BY 1
    """,
)
def q_f3_hex_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hex↔int conversion (F3, reference utils/byte_ops.py:69-128)."""
    ev = _t(spark, sf_dir, "events")
    k = F.regexp_extract("props", r'"k": (\d+)', 1).cast("long")
    # Spark hex() zero-pads differently from duckdb to_hex for 0 — both
    # produce "0"; leading char comparison is stable.
    return ev.groupBy(F.upper(F.substring(F.hex(k), 1, 1)).alias("hex_lead")).agg(
        F.count(F.lit(1)).alias("n")
    )


@_register(
    "q_a5_bit_count",
    """
    SELECT CAST(bit_count(CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT)) AS INTEGER) AS popcount,
           COUNT(*) AS n
    FROM events GROUP BY 1
    """,
)
def q_a5_bit_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Popcount repeat-count derivation (A5, reference
    payload_decoder.py:234-238: bin(mask).count('1'))."""
    ev = _t(spark, sf_dir, "events")
    k = F.regexp_extract("props", r'"k": (\d+)', 1).cast("long")
    return ev.groupBy(F.bit_count(k).alias("popcount")).agg(F.count(F.lit(1)).alias("n"))


@_register(
    "q_p8_quarantine",
    """
    SELECT CASE WHEN value IS NULL OR value < 0 OR props NOT SIMILAR TO '\\{"k": \\d+\\}'
                THEN 'quarantine' ELSE 'valid' END AS channel,
           event_type, COUNT(*) AS n
    FROM events GROUP BY 1, 2
    """,
)
def q_p8_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Validator + quarantine channel (P8/R3 error isolation)."""
    ev = _t(spark, sf_dir, "events")
    bad = (
        F.col("value").isNull()
        | (F.col("value") < 0)
        | ~F.col("props").rlike(r'^\{"k": \d+\}$')
    )
    return ev.groupBy(
        F.when(bad, "quarantine").otherwise("valid").alias("channel"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))


# ===========================================================================
# Window / ordered operations (SURVEY §2.5)
# ===========================================================================

@_register(
    "q_w1_first_event",
    """
    SELECT user_id, event_type AS first_type, epoch_us(ts) AS first_ts_us
    FROM events
    QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) = 1
    """,
)
def q_w1_first_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable intra-group ordering + row_number (W1 — the reference's
    ORDER BY row_index contract, datastore.py:258-267)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("first_type"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("first_ts_us"),
        )
    )


@_register(
    "q_w4_lead_gap",
    """
    WITH gaps AS (
      SELECT event_type,
             epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
               - epoch_us(ts) AS gap_us
      FROM events
    )
    SELECT event_type, COUNT(gap_us) AS n_gaps,
           CAST(SUM(gap_us) AS BIGINT) AS sum_gap_us
    FROM gaps WHERE gap_us IS NOT NULL GROUP BY event_type
    """,
)
def q_w4_lead_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead() range assignment (W4, reference parser.py:330-354)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = F.lead(us).over(w) - us
    return (
        ev.withColumn("gap_us", gap)
        .filter(F.col("gap_us").isNotNull())
        .groupBy("event_type")
        .agg(F.count("gap_us").alias("n_gaps"), F.sum("gap_us").alias("sum_gap_us"))
    )


@_register(
    "q_w5_last_purchase",
    """
    SELECT user_id, ROUND(value, 2) AS last_purchase_value
    FROM events WHERE event_type = 'purchase'
    QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    """,
)
def q_w5_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running last-non-null / latest-value-per-key (W5, reference
    ultra_light_parser.py:197-219 running-logcode context)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.round("value", 2).alias("last_purchase_value"))
    )


# ===========================================================================
# Set operations & explode (SURVEY §2.6, §2.8)
# ===========================================================================

@_register(
    "q_x28_explode_tokens",
    """
    SELECT token, COUNT(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    WHERE token <> ''
    GROUP BY token
    ORDER BY n DESC, token ASC
    LIMIT 20
    """,
)
def q_x28_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-group explode (§2.8 repeating records → posexplode):
    token frequency top-20 with deterministic tiebreak."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(20)
    )


@_register(
    "q_so2_union_keys",
    """
    SELECT COUNT(*) AS n_keys FROM (
      SELECT DISTINCT c_custkey AS k FROM customer
      UNION
      SELECT DISTINCT o_custkey AS k FROM orders
    )
    """,
)
def q_so2_union_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union + distinct (SO2 worker-result flatten)."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    return c.unionByName(o).distinct().agg(F.count(F.lit(1)).alias("n_keys"))


@_register(
    "q_so3_intersect_tokens",
    """
    SELECT COUNT(*) AS n_shared FROM (
      SELECT DISTINCT unnest(string_split(text, ' ')) AS token FROM documents WHERE lang = 'en'
      INTERSECT
      SELECT DISTINCT unnest(string_split(text, ' ')) AS token FROM documents WHERE lang = 'fr'
    )
    """,
)
def q_so3_intersect_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intersection of token vocabularies (SO3 fuzzy word-set overlap,
    reference parallel_pdf_parser.py:368-389)."""
    d = _t(spark, sf_dir, "documents")
    tok = lambda lang: (  # noqa: E731
        d.filter(F.col("lang") == lang)
        .select(F.explode(F.split("text", " ")).alias("token"))
        .distinct()
    )
    return tok("en").intersect(tok("fr")).agg(F.count(F.lit(1)).alias("n_shared"))
