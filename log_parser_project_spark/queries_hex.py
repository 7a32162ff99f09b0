"""Hex ingest/decode queries (S5/F3/F4/P8) with DuckDB oracles.

The oracle-checked query synthesizes the same little-endian hex
encoding in BOTH engines (printf) and decodes it back (substring
byte-swap + base-16 conversion), proving the encode/decode pair is
faithful; the rows-only query runs the full synthetic packet corpus
through the validator + header decoder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _register, _t
from .sources import hex_ingest

_K = 'CAST(regexp_extract(props, \'"k": (\\d+)\', 1) AS BIGINT)'


@_register(
    "q_s5_hex_le_roundtrip",
    f"""
    WITH pkt AS (
      SELECT printf('%02x%02x%02x%02x',
                    {_K} % 256, ({_K} // 256) % 256,
                    ({_K} * 31) % 256, (({_K} * 31) // 256) % 256) AS h,
             event_type
      FROM events
    ),
    dec AS (
      SELECT event_type,
             ('0x' || substr(h, 3, 2) || substr(h, 1, 2))::BIGINT AS length_le,
             ('0x' || substr(h, 7, 2) || substr(h, 5, 2))::BIGINT AS logcode_le
      FROM pkt
    )
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(length_le) AS BIGINT) AS sum_length,
           CAST(SUM(logcode_le % 4096) AS BIGINT) AS sum_code
    FROM dec GROUP BY event_type
    """,
)
def q_s5_hex_le_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Little-endian hex encode→decode roundtrip (S5 ingest + F3 hex↔int
    + F4 byte slicing, reference ingest/hex_parser.py + byte_ops.py)."""
    ev = _t(spark, sf_dir, "events")
    k = F.regexp_extract("props", r'"k": (\d+)', 1).cast("long")
    h = F.format_string(
        "%02x%02x%02x%02x",
        k % 256, (k / 256).cast("long") % 256,
        (k * 31) % 256, ((k * 31) / 256).cast("long") % 256,
    )
    length_le = F.conv(F.concat(F.substring(h, 3, 2), F.substring(h, 1, 2)), 16, 10).cast("long")
    logcode_le = F.conv(F.concat(F.substring(h, 7, 2), F.substring(h, 5, 2)), 16, 10).cast("long")
    return (
        ev.select("event_type", length_le.alias("length_le"), logcode_le.alias("logcode_le"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("length_le").alias("sum_length"),
            F.sum(F.col("logcode_le") % 4096).alias("sum_code"),
        )
    )


@_register(
    "q_s5_field_decode",
    f"""
    WITH pkt AS (
      SELECT printf('%02x%02x%02x%02x',
                    {_K} % 256, ({_K} * 7) % 256, ({_K} * 13) % 256, ({_K} * 31) % 256) AS ph
      FROM events
    ),
    b AS (
      SELECT ('0x' || substr(ph, 1, 2))::BIGINT AS b0,
             ('0x' || substr(ph, 3, 2))::BIGINT AS b1,
             ('0x' || substr(ph, 5, 2))::BIGINT AS b2,
             ('0x' || substr(ph, 7, 2))::BIGINT AS b3
      FROM pkt
    ),
    d AS (
      SELECT b0 AS f_count,
             ((b1 >> 0) & 1) = 1 AS f_flag,
             (b1 >> 1) & 7 AS lvl,
             CASE WHEN (((b1 + b2 * 256) >> 4) & 255) >= 128
                  THEN (((b1 + b2 * 256) >> 4) & 255) - 256
                  ELSE ((b1 + b2 * 256) >> 4) & 255 END AS f_delta,
             ((b2 + b3 * 256) >> 4) & 4095 AS f_word
      FROM b
    )
    SELECT CASE WHEN lvl = 0 THEN 'off' WHEN lvl = 1 THEN 'low' WHEN lvl = 2 THEN 'mid'
                WHEN lvl = 3 THEN 'high' ELSE 'UNKNOWN(' || lvl || ')' END AS f_level_friendly,
           COUNT(*) AS n,
           CAST(SUM(f_count) AS BIGINT) AS sum_count,
           CAST(SUM(CASE WHEN f_flag THEN 1 ELSE 0 END) AS BIGINT) AS n_flag,
           CAST(SUM(f_delta) AS BIGINT) AS sum_delta,
           CAST(SUM(f_word) AS BIGINT) AS sum_word
    FROM d GROUP BY 1
    """,
)
def q_s5_field_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-table-driven typed payload decode (the reference's core:
    ``payload_decoder.py`` field loop → one expression per FieldDef):
    uint / bool-bit / enum+friendly / two's-complement int / 12-bit
    word sliced from a little-endian payload, rolled up per enum label.
    The DuckDB oracle reconstructs every field arithmetically."""
    ev = _t(spark, sf_dir, "events")
    k = F.regexp_extract("props", r'"k": (\d+)', 1).cast("long")
    ph = F.format_string(
        "%02x%02x%02x%02x", k % 256, (k * 7) % 256, (k * 13) % 256, (k * 31) % 256
    )
    layout = [
        hex_ingest.FieldDef("f_count", 0, 8, "uint"),
        hex_ingest.FieldDef("f_flag", 8, 1, "bool"),
        hex_ingest.FieldDef(
            "f_level", 9, 3, "enum", {0: "off", 1: "low", 2: "mid", 3: "high"}
        ),
        hex_ingest.FieldDef("f_delta", 12, 8, "int"),
        hex_ingest.FieldDef("f_word", 20, 12, "uint"),
    ]
    dec = hex_ingest.decode_fields(ev.select(ph.alias("payload_hex")), layout)
    return dec.groupBy("f_level_friendly").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("f_count").alias("sum_count"),
        F.sum(F.when(F.col("f_flag"), 1).otherwise(0)).alias("n_flag"),
        F.sum("f_delta").alias("sum_delta"),
        F.sum("f_word").alias("sum_word"),
    )


@_register(
    "q_x28_repeat_decode",
    f"""
    WITH pkt AS (
      SELECT {_K} % 5 AS cnt,
             [{_K} % 256, ({_K} * 3) % 256, ({_K} * 7) % 256,
              ({_K} * 11) % 256, ({_K} * 13) % 256, ({_K} * 17) % 256] AS b
      FROM events
    ),
    r AS (
      SELECT cnt, b, unnest(range(least(cnt, 3))) AS idx
      FROM pkt WHERE least(cnt, 3) > 0
    )
    SELECT CAST(idx AS BIGINT) AS record_idx,
           COUNT(*) AS n,
           CAST(SUM(b[idx * 2 + 1]) AS BIGINT) AS sum_lo,
           CAST(SUM(b[idx * 2 + 2] & 127) AS BIGINT) AS sum_hi,
           CAST(SUM(b[idx * 2 + 2] >> 7) AS BIGINT) AS n_flag
    FROM r GROUP BY 1
    """,
)
def q_x28_repeat_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeating-record decode from a binary payload (§2.8): count field
    in byte 0 (J6), 2-byte records from byte 1, clamped to what fits
    (3 here), posexploded with a real record_idx; the oracle rebuilds
    every record arithmetically from the same synthesized bytes."""
    ev = _t(spark, sf_dir, "events")
    k = F.regexp_extract("props", r'"k": (\d+)', 1).cast("long")
    ph = F.format_string(
        "%02x%02x%02x%02x%02x%02x%02x",
        k % 5, k % 256, (k * 3) % 256, (k * 7) % 256,
        (k * 11) % 256, (k * 13) % 256, (k * 17) % 256,
    )
    pkts = hex_ingest.decode_fields(
        ev.select(ph.alias("payload_hex")),
        [hex_ingest.FieldDef("num_rec", 0, 8, "uint")],
    )
    rec_layout = [
        hex_ingest.FieldDef("r_lo", 0, 8, "uint"),
        hex_ingest.FieldDef("r_hi", 8, 7, "uint"),
        hex_ingest.FieldDef("r_flag", 15, 1, "bool"),
    ]
    out = hex_ingest.decode_repeating(
        pkts, rec_layout, count_col=F.col("num_rec"), base_offset_bytes=1
    )
    return out.groupBy("record_idx").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("r_lo").alias("sum_lo"),
        F.sum("r_hi").alias("sum_hi"),
        F.sum(F.when(F.col("r_flag"), 1).otherwise(0)).alias("n_flag"),
    )


@_register(
    "q_j2_versioned_payload",
    f"""
    WITH pkt AS (
      SELECT {_K} % 3 + 1 AS ver, ({_K} * 5) % 256 AS b1, ({_K} * 9) % 256 AS b2
      FROM events
    ),
    d AS (
      SELECT CASE WHEN ver IN (1, 2) THEN ver ELSE 1 END AS layout_version, b1, b2
      FROM pkt
    )
    SELECT layout_version,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN layout_version = 1 THEN b1 ELSE b2 END) AS BIGINT) AS sum_x,
           CAST(SUM(CASE WHEN layout_version = 2 THEN
                  CASE WHEN b1 >= 128 THEN b1 - 256 ELSE b1 END END) AS BIGINT) AS sum_y
    FROM d GROUP BY 1
    """,
)
def q_j2_versioned_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row version-resolved payload decode (J2 on the payload path,
    version_resolver.py:13-56): the version byte inside the payload
    selects which field layout applies, unknown versions fall back to
    the first layout; rolled up per resolved version."""
    ev = _t(spark, sf_dir, "events")
    k = F.regexp_extract("props", r'"k": (\d+)', 1).cast("long")
    ph = F.format_string("%02x%02x%02x", k % 3 + 1, (k * 5) % 256, (k * 9) % 256)
    v1 = [hex_ingest.FieldDef("x", 8, 8, "uint")]
    v2 = [hex_ingest.FieldDef("x", 16, 8, "uint"), hex_ingest.FieldDef("y", 8, 8, "int")]
    dec = hex_ingest.decode_versioned(
        ev.select(ph.alias("payload_hex")),
        F.conv(F.substring("payload_hex", 1, 2), 16, 10).cast("long"),
        {1: v1, 2: v2},
    )
    return dec.groupBy("layout_version").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sum_x"),
        F.sum("y").alias("sum_y"),
    )


@_register(
    "q_s5_float_decode",
    f"""
    WITH src AS (SELECT {_K} AS k FROM events),
    p AS (
      SELECT k % 2 AS s,
             118 + (k % 16) AS e32,
             (k * 2654435761) % 8388608 AS m32,
             1015 + (k % 16) AS e64,
             ((k * 2654435761) % 67108864) * 67108864 + ((k * 40503) % 67108864) AS m64
      FROM src
    ),
    v AS (
      SELECT CAST(e32 - 127 AS BIGINT) AS exp32,
             (1 - 2 * s) * pow(2.0, e32 - 127) * (1 + m32 / 8388608.0) AS v32,
             pow(2.0, e64 - 1023) * (1 + m64 / 4503599627370496.0) AS v64
      FROM p
    )
    SELECT exp32, COUNT(*) AS n,
           MIN(v32) AS min_f32, MAX(v32) AS max_f32,
           MIN(v64) AS min_f64, MAX(v64) AS max_f64
    FROM v GROUP BY exp32
    """,
)
def q_s5_float_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Float32/Float64 typed field decode on the layout-driven payload
    path (reference ``utils/type_converters.py:144-183`` decode_float +
    ``metadata_payload_parser.py:390-403`` raw-bits variant): both
    engines synthesize the same IEEE-754 bit patterns from k; Spark
    round-trips them through little-endian payload hex and the
    expression-side ``decode_fields`` float dispatch, while the oracle
    computes the values arithmetically — every step exact in binary64,
    so MIN/MAX compare bit-identically."""
    ev = _t(spark, sf_dir, "events")
    k = F.regexp_extract("props", r'"k": (\d+)', 1).cast("long")
    s = k % 2
    e32 = k % 16 + 118
    m32 = (k * 2654435761) % 8388608
    e64 = k % 16 + 1015
    m64 = ((k * 2654435761) % 67108864) * 67108864 + (k * 40503) % 67108864
    w32 = s * (1 << 31) + e32 * (1 << 23) + m32
    hi = e64 * (1 << 20) + F.floor(m64 / F.lit(1 << 32)).cast("long")
    lo = m64 % (1 << 32)

    def b(col, i):
        return F.shiftright(col, 8 * i).bitwiseAND(F.lit(255))

    ph = F.format_string(
        "%02x" * 12,
        b(w32, 0), b(w32, 1), b(w32, 2), b(w32, 3),
        b(lo, 0), b(lo, 1), b(lo, 2), b(lo, 3),
        b(hi, 0), b(hi, 1), b(hi, 2), b(hi, 3),
    )
    layout = [
        hex_ingest.FieldDef("v32", 0, 32, "float32"),
        hex_ingest.FieldDef("v64", 32, 64, "float64"),
    ]
    dec = hex_ingest.decode_fields(
        ev.select(ph.alias("payload_hex"), (e32 - 127).alias("exp32")), layout
    )
    return dec.groupBy("exp32").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("v32").alias("min_f32"), F.max("v32").alias("max_f32"),
        F.min("v64").alias("min_f64"), F.max("v64").alias("max_f64"),
    )


@_register(
    "q_s5_string_decode",
    f"""
    WITH src AS (SELECT {_K} AS k FROM events),
    b AS (
      SELECT CAST(65 + (k % 26) AS INTEGER) AS b0, CAST(97 + (k % 13) AS INTEGER) AS b1,
             CAST(CASE WHEN k % 4 = 0 THEN 0 ELSE 97 + (k % 7) END AS INTEGER) AS b2,
             CAST(48 + (k % 5) AS INTEGER) AS b3
      FROM src
    ),
    s AS (
      SELECT CASE WHEN b2 = 0 THEN chr(b0) || chr(b1)
                  ELSE chr(b0) || chr(b1) || chr(b2) || chr(b3) END AS tag
      FROM b
    )
    SELECT tag, COUNT(*) AS n FROM s GROUP BY tag
    """,
)
def q_s5_string_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-length null-terminated string field decode (reference
    ``type_converters.py:114-141`` decode_string): both engines build a
    4-byte ASCII field from k — NUL-terminated at byte 2 for k%4==0 —
    and the layout decoder must recover exactly the logical string."""
    ev = _t(spark, sf_dir, "events")
    k = F.regexp_extract("props", r'"k": (\d+)', 1).cast("long")
    b2 = F.when(k % 4 == 0, F.lit(0)).otherwise(97 + k % 7)
    ph = F.format_string("%02x%02x%02x%02x", 65 + k % 26, 97 + k % 13, b2, 48 + k % 5)
    dec = hex_ingest.decode_fields(
        ev.select(ph.alias("payload_hex")),
        [hex_ingest.FieldDef("tag", 0, 32, "string")],
    )
    return dec.groupBy("tag").agg(F.count(F.lit(1)).alias("n"))


@_register(
    "q_s5_packet_decode",
    """
    WITH src AS (SELECT event_id AS e FROM events),
    gen AS (
      SELECT e, e % 20 AS kind,
             e % 8 + 4 AS n_payload,
             7168 + e % 4 AS logcode,
             (e * 7) % 100000 AS seq
      FROM src
    )
    SELECT CASE WHEN kind = 0 THEN 'bad_charset'
                WHEN kind = 1 THEN 'odd_length'
                WHEN kind = 2 THEN 'length_mismatch'
                ELSE printf('0x%04X', logcode) END AS key,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN kind >= 3 THEN n_payload END) AS BIGINT) AS sum_payload_bytes,
           CAST(SUM(CASE WHEN kind >= 3 THEN seq END) AS BIGINT) AS sum_seq
    FROM gen GROUP BY 1
    """,
)
def q_s5_packet_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full packet path under the STRONG gate: the corpus is synthesized
    from the events table with engine-portable arithmetic (little-endian
    header + modular payload bytes + three corruption kinds), then run
    through the REAL validate → header-decode plan (the reference's CLI
    decode flow §3.3); the oracle computes the expected tallies directly
    from the generator arithmetic — so every validator reason and every
    decoded header field is value-checked, not just row-counted."""
    ev = _t(spark, sf_dir, "events")
    e = F.col("event_id")
    n_payload = e % 8 + 4
    logcode = F.lit(0x1C00) + e % 4
    seq = (e * 7) % 100000
    tsr = (e * 13) % (2 ** 31)

    def le_hex(col, n_bytes):
        be = F.lpad(F.lower(F.hex(col)), n_bytes * 2, "0")
        pairs = [F.substring(be, i * 2 + 1, 2) for i in range(n_bytes)]
        return F.concat(*reversed(pairs))

    payload = F.concat_ws(
        "",
        F.transform(
            F.sequence(F.lit(0), n_payload - 1),
            lambda j: F.lpad(F.lower(F.hex((e * (j + 17)) % 256)), 2, "0"),
        ),
    )
    good = F.concat(le_hex(n_payload, 2), le_hex(logcode, 2),
                    le_hex(seq, 4), le_hex(tsr, 4), payload)
    kind = e % 20
    pkt = (
        F.when(kind == 0, F.concat(F.lit("zz"), good))    # bad charset
        .when(kind == 1, F.substring(good, 1, 11))        # truncated, odd
        .when(kind == 2, F.concat(good, F.lit("ff")))     # length mismatch
        .otherwise(good)
    )
    v = hex_ingest.validate_packets(ev.select(pkt.alias("packet_hex")))
    dec = hex_ingest.decode_header(v.filter(F.col("valid")))
    goodg = dec.groupBy(F.col("logcode_hex").alias("key")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("pkt_length").alias("sum_payload_bytes"),
        F.sum("sequence").alias("sum_seq"),
    )
    badg = v.filter(~F.col("valid")).groupBy(F.col("reject_reason").alias("key")).agg(
        F.count(F.lit(1)).alias("n"),
        F.lit(None).cast("long").alias("sum_payload_bytes"),
        F.lit(None).cast("long").alias("sum_seq"),
    )
    return goodg.unionByName(badg)
