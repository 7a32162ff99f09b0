"""Fourth query batch: the last uncovered SURVEY.md §2 rows — header
dedup (A2), section grouping (A3), record-stride max (A4), dep-set
dedup+sort (A8), version→table lookup with fallback (J2), wrapper
struct flatten (J4), plain fact join (J7), positional zip join (J8),
bit slicing (F4), IEEE-754 reinterpret (F6), description cleanup (P9)
— plus the rolling-hash document fingerprint and the IVF ANN variant
for the training-data family. Registered into the shared ``QUERIES``
dict; everything except IVF (approx by construction) carries a DuckDB
oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators import similarity
from .operators.convert import f32_from_bits, slice_bits
from .operators.text import ROLLING_MOD, rolling_fingerprint, tokens
from .queries import QUERIES, _register, _spread, _t, cents

_K = 'CAST(regexp_extract(props, \'"k": (\\d+)\', 1) AS BIGINT)'


def _k(ev):
    return F.regexp_extract("props", r'"k": (\d+)', 1).cast("long")


# ---------------------------------------------------------------------------
# A2: repeated-header-row dedup (case-insensitive vs group header)
# ---------------------------------------------------------------------------

@_register(
    "q_a2_header_dedup",
    """
    WITH t AS (
      SELECT p_brand, p_type, p_partkey,
             row_number() OVER (PARTITION BY p_brand ORDER BY p_partkey) AS rn,
             first_value(p_type) OVER (PARTITION BY p_brand ORDER BY p_partkey) AS header
      FROM part
    )
    SELECT p_brand,
           COUNT(*) FILTER (WHERE rn = 1 OR lower(p_type) <> lower(header)) AS n_kept,
           COUNT(*) FILTER (WHERE rn > 1 AND lower(p_type) = lower(header)) AS n_dropped
    FROM t GROUP BY p_brand
    """,
)
def q_a2_header_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-row dedup (A2, reference pdf_extractor.py:216-235): keep
    each group's first row, drop later rows case-insensitively equal to
    the group header."""
    p = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy("p_partkey")
    t = p.withColumn("rn", F.row_number().over(w)).withColumn(
        "header", F.first("p_type").over(w)
    )
    keep = (F.col("rn") == 1) | (F.lower("p_type") != F.lower("header"))
    return t.groupBy("p_brand").agg(
        F.count(F.when(keep, 1)).alias("n_kept"),
        F.count(F.when(~keep, 1)).alias("n_dropped"),
    )


# ---------------------------------------------------------------------------
# A3: group "X-Y" table numbers by section major
# ---------------------------------------------------------------------------

@_register(
    "q_a3_section_group",
    f"""
    WITH t AS (
      SELECT DISTINCT ({_K} % 5)::BIGINT AS major, ({_K} % 13)::BIGINT AS minor
      FROM events
    )
    SELECT major, COUNT(*) AS n_tables,
           CAST(MIN(minor) AS BIGINT) AS min_minor, CAST(MAX(minor) AS BIGINT) AS max_minor
    FROM t GROUP BY major
    """,
)
def q_a3_section_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Section-major grouping (A3, reference parser.py:223-240:
    '4-4' → section 4)."""
    ev = _t(spark, sf_dir, "events")
    k = _k(ev)
    t = ev.select((k % 5).alias("major"), (k % 13).alias("minor")).distinct()
    return t.groupBy("major").agg(
        F.count(F.lit(1)).alias("n_tables"),
        F.min("minor").alias("min_minor"),
        F.max("minor").alias("max_minor"),
    )


# ---------------------------------------------------------------------------
# A4: record stride = ceil(max(offset+len)/8)
# ---------------------------------------------------------------------------

@_register(
    "q_a4_record_stride",
    f"""
    WITH fields AS (
      SELECT {_K} % 20 AS tbl, {_K} % 64 AS off_bits, ({_K} % 13) + 1 AS len_bits
      FROM events
    )
    SELECT CAST(tbl AS BIGINT) AS tbl,
           CAST((MAX(off_bits + len_bits) + 7) // 8 AS BIGINT) AS stride_bytes,
           COUNT(*) AS n_fields
    FROM fields GROUP BY tbl
    """,
)
def q_a4_record_stride(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record-size max → byte stride (A4, reference
    payload_decoder.py:166-170: ceil(max(offset_bits+length_bits)/8))."""
    ev = _t(spark, sf_dir, "events")
    k = _k(ev)
    fields = ev.select(
        (k % 20).alias("tbl"), (k % 64).alias("off_bits"), ((k % 13) + 1).alias("len_bits")
    )
    return fields.groupBy("tbl").agg(
        F.floor((F.max(F.col("off_bits") + F.col("len_bits")) + 7) / 8)
        .cast("long")
        .alias("stride_bytes"),
        F.count(F.lit(1)).alias("n_fields"),
    )


# ---------------------------------------------------------------------------
# A8: dep-set dedup + sort
# ---------------------------------------------------------------------------

@_register(
    "q_a8_depset_sorted",
    """
    SELECT o_orderpriority,
           string_agg(DISTINCT o_orderstatus, '|' ORDER BY o_orderstatus) AS deps
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_a8_depset_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dependency-set dedup + sort (A8, reference parser.py:188-221:
    set() then sorted(list()))."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.concat_ws("|", F.array_sort(F.collect_set("o_orderstatus"))).alias("deps")
    )


# ---------------------------------------------------------------------------
# J2: version→table lookup with coalesce fallback
# ---------------------------------------------------------------------------

@_register(
    "q_j2_version_lookup",
    f"""
    SELECT COALESCE(v.table_name, 'table_a') AS table_name,
           COUNT(*) AS n, CAST(SUM({_K}) AS BIGINT) AS sum_k
    FROM events e
    LEFT JOIN (VALUES (1, 'table_a'), (2, 'table_b'), (3, 'table_c'), (4, 'table_d'))
           AS v(version, table_name)
      ON ({_K} % 6) = v.version
    GROUP BY 1
    """,
)
def q_j2_version_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Version→table broadcast lookup with first-table fallback (J2,
    reference version_resolver.py:40-56; fallback = coalesce)."""
    ev = _t(spark, sf_dir, "events")
    dim = spark.createDataFrame(
        [(1, "table_a"), (2, "table_b"), (3, "table_c"), (4, "table_d")],
        "version int, table_name string",
    )
    k = _k(ev)
    return (
        ev.withColumn("version", (k % 6).cast("int"))
        .join(F.broadcast(dim), "version", "left")
        .groupBy(F.coalesce("table_name", F.lit("table_a")).alias("table_name"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum(k).alias("sum_k"))
    )


# ---------------------------------------------------------------------------
# J4: wrapper-field expansion — nested struct flatten with offset rebase
# ---------------------------------------------------------------------------

@_register(
    "q_j4_struct_flatten",
    f"""
    SELECT CAST(({_K} % 4) * 32 + ({_K} % 8) AS BIGINT) AS abs_off,
           CAST(({_K} % 5) + 1 AS BIGINT) AS len_bits,
           COUNT(*) AS n
    FROM events GROUP BY 1, 2
    """,
)
def q_j4_struct_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wrapper-field expansion (J4, reference icd_query.py:173-228):
    a referenced table rides as a nested struct; flattening inlines its
    fields with offsets rebased onto the wrapper's base."""
    ev = _t(spark, sf_dir, "events")
    k = _k(ev)
    nested = ev.select(
        F.struct(
            ((k % 4) * 32).alias("base"),
            F.struct((k % 8).alias("off"), ((k % 5) + 1).alias("len_bits")).alias("fld"),
        ).alias("wrapper")
    )
    flat = nested.select(
        (F.col("wrapper.base") + F.col("wrapper.fld.off")).alias("abs_off"),
        F.col("wrapper.fld.len_bits").alias("len_bits"),
    )
    return flat.groupBy("abs_off", "len_bits").agg(F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------------------
# J7: plain fact join (Catalyst picks the strategy)
# ---------------------------------------------------------------------------

@_register(
    "q_j7_fact_join",
    """
    SELECT c_mktsegment, COUNT(*) AS n_orders,
           CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_price_c
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def q_j7_fact_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain two-table equi-join (J7, reference datastore.py:389-406
    revisions ⋈ revision_logcodes) — no hints; Catalyst/AQE choose
    broadcast vs sort-merge by size. Price sum in BIGINT cents —
    decimal-free contract output (see q_a9_pricing_summary)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(cents("o_totalprice")).alias("sum_price_c"),
        )
    )


# ---------------------------------------------------------------------------
# J8: positional (zip-by-index) join
# ---------------------------------------------------------------------------

@_register(
    "q_j8_positional_zip",
    """
    WITH cap AS (
      SELECT p_brand AS caption, row_number() OVER (ORDER BY p_brand) AS idx
      FROM (SELECT DISTINCT p_brand FROM part)
    ),
    tbl AS (
      SELECT p_type AS tbl, row_number() OVER (ORDER BY p_type) AS idx
      FROM (SELECT DISTINCT p_type FROM part)
    )
    SELECT cap.idx AS idx, caption, tbl FROM cap JOIN tbl USING (idx)
    """,
)
def q_j8_positional_zip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional caption↔table pairing (J8, reference
    pdf_extractor.py:145-161: i-th caption zipped with i-th table).
    Made deterministic by ranking each side on a total order — the
    reference's implicit page-order zip is the fragility SURVEY §7.4
    warns about."""
    p = _t(spark, sf_dir, "part")
    cap = (
        p.select(F.col("p_brand").alias("caption")).distinct()
        .withColumn("idx", F.row_number().over(Window.orderBy("caption")))
    )
    tbl = (
        p.select(F.col("p_type").alias("tbl")).distinct()
        .withColumn("idx", F.row_number().over(Window.orderBy("tbl")))
    )
    return cap.join(tbl, "idx").select("idx", "caption", "tbl")


# ---------------------------------------------------------------------------
# F4: bit-field slicing
# ---------------------------------------------------------------------------

@_register(
    "q_f4_bit_slice",
    f"""
    SELECT CAST(({_K} >> 4) & 63 AS BIGINT) AS f_mid,
           COUNT(*) AS n,
           CAST(SUM({_K} & 15) AS BIGINT) AS sum_lo,
           CAST(MAX(({_K} >> 10) & 7) AS BIGINT) AS max_hi
    FROM events GROUP BY 1
    """,
)
def q_f4_bit_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bit-granular field extraction (F4, reference byte_ops.py:31-66
    slice_bits: shift + mask) — three fields sliced from one word."""
    ev = _t(spark, sf_dir, "events")
    k = _k(ev)
    return ev.groupBy(slice_bits(k, 4, 6).alias("f_mid")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(slice_bits(k, 0, 4)).alias("sum_lo"),
        F.max(slice_bits(k, 10, 3)).alias("max_hi"),
    )


# ---------------------------------------------------------------------------
# F6: IEEE-754 bit reinterpret (pandas UDF) — oracle decodes
# sign/exponent/mantissa arithmetically; exact for normal floats
# ---------------------------------------------------------------------------

@_register(
    "q_f6_float_reinterpret",
    f"""
    WITH b AS (
      SELECT DISTINCT ({_K} * 2654435761) % 4294967296 AS bits FROM events
    ),
    d AS (
      SELECT bits,
             bits // 2147483648 AS sign,
             (bits // 8388608) % 256 AS expo,
             bits % 8388608 AS mant
      FROM b
    )
    SELECT CAST(bits AS BIGINT) AS bits,
           (CASE WHEN sign = 1 THEN -1.0 ELSE 1.0 END)
             * (1.0 + mant / 8388608.0) * power(2.0, expo - 127) AS value
    FROM d WHERE expo BETWEEN 1 AND 254
    """,
)
def q_f6_float_reinterpret(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IEEE-754 float32 reinterpret (F6, reference
    type_converters.py:144-183): numpy view inside a pandas UDF; the
    oracle reconstructs sign·(1+m/2²³)·2^(e−127) arithmetically, which
    is bit-exact in double for normal floats (the filter excludes
    zero/subnormal/inf/NaN exponents)."""
    ev = _t(spark, sf_dir, "events")
    k = _k(ev)
    bits = ((k * F.lit(2654435761)) % F.lit(4294967296)).alias("bits")
    b = ev.select(bits).distinct()
    expo = (F.col("bits") / 8388608).cast("long") % 256
    return (
        b.filter(expo.between(1, 254))
        .select("bits", f32_from_bits(F.col("bits")).alias("value"))
    )


# ---------------------------------------------------------------------------
# P9: description cleanup (flatten / collapse / truncate)
# ---------------------------------------------------------------------------

@_register(
    "q_p9_description_cleanup",
    """
    SELECT doc_id, substr(trim(regexp_replace(text, '\\s+', ' ', 'g')), 1, 50) AS cleaned
    FROM documents WHERE doc_id < 200
    """,
)
def q_p9_description_cleanup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Description cleanup (P9, reference query_engine.py:156-166):
    newline flattening, whitespace collapse, 50-char truncate."""
    d = _t(spark, sf_dir, "documents")
    return d.filter(F.col("doc_id") < 200).select(
        "doc_id",
        F.substring(F.trim(F.regexp_replace("text", r"\s+", " ")), 1, 50).alias("cleaned"),
    )


# ---------------------------------------------------------------------------
# rolling-hash document fingerprint (order-sensitive, cross-engine)
# ---------------------------------------------------------------------------

@_register(
    "q_tx_fingerprint_rolling",
    f"""
    WITH d AS (
      SELECT doc_id, source,
             list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS toks
      FROM documents
    ),
    fp AS (
      SELECT source,
             CASE WHEN len(toks) > 0 THEN
               list_sum(list_transform(range(1, len(toks) + 1),
                        i -> ('0x' || substr(md5(toks[i]), 1, 8))::BIGINT * i)) % {ROLLING_MOD}
             ELSE 0 END AS fp
      FROM d
    )
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(fp) % {ROLLING_MOD} AS BIGINT) AS fp_rollup
    FROM fp GROUP BY source
    """,
)
def q_tx_fingerprint_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive rolling-hash fingerprint per doc (position-
    weighted md5 polynomial), rolled up per source — the document-
    fingerprinting member of the text-analysis family."""
    d = _spread(spark, _t(spark, sf_dir, "documents"))
    fp = rolling_fingerprint(F.col("__toks"))
    return (
        d.select("source", tokens("text").alias("__toks"))
        .select("source", fp.alias("fp"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.sum("fp") % ROLLING_MOD).cast("long").alias("fp_rollup"),
        )
    )


# ---------------------------------------------------------------------------
# IVF ANN (approx by construction — rows-only; pytest checks recall)
# ---------------------------------------------------------------------------

@_register("q_sim_ivf_topk", None)  # approx — rows-only driver check
def q_sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed ANN top-3 (coarse quantizer cells + probed exact
    re-rank); pytest measures recall against q_sim_topk."""
    e = _spread(spark, _t(spark, sf_dir, "embeddings"))
    return similarity.ivf_topk(
        e, e.filter(F.col("vec_id") < 5), k=3, n_cells=16, n_probe=4
    )
