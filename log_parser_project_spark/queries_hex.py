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


@_register("q_s5_packet_decode", None)  # synthetic corpus — rows-only
def q_s5_packet_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full packet path: synth corpus → validate (quarantine reasons) →
    header decode → per-logcode tally (the reference's CLI decode flow
    §3.3 as one DataFrame plan)."""
    pkts = hex_ingest.synth_packets(spark, n=2000)
    v = hex_ingest.validate_packets(pkts)
    dec = hex_ingest.decode_header(v.filter(F.col("valid")))
    good = dec.groupBy("logcode_hex").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("pkt_length").alias("sum_payload_bytes"),
    ).withColumnRenamed("logcode_hex", "key")
    bad = v.filter(~F.col("valid")).groupBy("reject_reason").agg(
        F.count(F.lit(1)).alias("n"),
        F.lit(None).cast("long").alias("sum_payload_bytes"),
    ).withColumnRenamed("reject_reason", "key")
    return good.unionByName(bad)
