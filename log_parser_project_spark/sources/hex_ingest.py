"""Hex-packet ingest: the reference's byte-level decode as expressions.

The reference parses ``Length:/Header:/Payload:`` hex text into bytes
(``hex_decoder_module/ingest/hex_parser.py:16-133``), validates it
(``ingest/validators.py:9-66``), and decodes a fixed 12-byte
little-endian header — length(2B) logcode(2B) sequence(4B)
timestamp(4B) (``decoder/header_decoder.py:13-60``).

Here the same wire format is handled entirely with built-in column
expressions over the hex string: substring slicing for field offsets,
byte-pair reversal for little-endian, ``conv(…, 16, 10)`` for the
integer value — whole-stage-codegen'd, no Python. This is the S5/F3/F4
operator family, kept as a first-class source so a user of the
reference could point raw packet dumps at this engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

HEADER_HEX_LEN = 24  # 12 bytes


def _le_bytes_to_long(hexcol: Column, byte_off: int, n_bytes: int) -> Column:
    """Little-endian unsigned int from hex-string byte positions:
    reverse the byte pairs, then base-16 → base-10."""
    pairs = [
        F.substring(hexcol, byte_off * 2 + 1 + i * 2, 2) for i in range(n_bytes)
    ]
    big_endian = F.concat(*reversed(pairs))
    return F.conv(big_endian, 16, 10).cast("long")


def decode_header(df: DataFrame, hex_col: str = "packet_hex") -> DataFrame:
    """Add the four header fields decoded from the leading 12 bytes."""
    h = F.col(hex_col)
    return (
        df.withColumn("pkt_length", _le_bytes_to_long(h, 0, 2))
        .withColumn("logcode", _le_bytes_to_long(h, 2, 2))
        .withColumn("sequence", _le_bytes_to_long(h, 4, 4))
        .withColumn("timestamp_raw", _le_bytes_to_long(h, 8, 4))
        .withColumn("logcode_hex", F.format_string("0x%04X", F.col("logcode")))
    )


def validate_packets(df: DataFrame, hex_col: str = "packet_hex") -> DataFrame:
    """The P8 validator set: hex charset, even length, declared-vs-
    actual length agreement. Adds a ``valid`` flag + ``reject_reason``
    (quarantine channel) instead of raising, mirroring the engine's
    warn-and-continue error path."""
    h = F.col(hex_col)
    payload_bytes = (F.length(h) - HEADER_HEX_LEN) / 2
    charset_ok = h.rlike("^[0-9a-fA-F]+$")
    even_ok = F.length(h) % 2 == 0
    min_len_ok = F.length(h) >= HEADER_HEX_LEN
    declared = _le_bytes_to_long(h, 0, 2)
    length_ok = declared == payload_bytes
    reason = (
        F.when(~charset_ok, "bad_charset")
        .when(~even_ok, "odd_length")
        .when(~min_len_ok, "truncated_header")
        .when(~length_ok, "length_mismatch")
    )
    return df.withColumn("reject_reason", reason).withColumn(
        "valid", reason.isNull()
    )


def payload_hex(df: DataFrame, hex_col: str = "packet_hex") -> DataFrame:
    return df.withColumn("payload_hex", F.expr(f"substring({hex_col}, {HEADER_HEX_LEN + 1})"))


def synth_packets(spark: SparkSession, n: int = 1000, parts: int = 8) -> DataFrame:
    """Deterministic synthetic packet corpus (little-endian hex), with
    ~5% corrupt rows exercising every reject reason."""
    df = spark.range(0, n, 1, parts)
    i = F.col("id")
    logcode = (F.abs(F.xxhash64(i, F.lit("lc"))) % 4 + 0x1C00).cast("long")
    seq = (F.abs(F.xxhash64(i, F.lit("sq"))) % 100000).cast("long")
    tsr = (F.abs(F.xxhash64(i, F.lit("tr"))) % 2**31).cast("long")
    n_payload = (F.abs(F.xxhash64(i, F.lit("np"))) % 8 + 4).cast("long")

    def le_hex(col: Column, n_bytes: int) -> Column:
        be = F.lpad(F.lower(F.hex(col)), n_bytes * 2, "0")
        pairs = [F.substring(be, k * 2 + 1, 2) for k in range(n_bytes)]
        return F.concat(*reversed(pairs))

    payload = F.concat_ws(
        "",
        F.transform(
            F.sequence(F.lit(1), n_payload),
            lambda j: F.lpad(F.lower(F.hex(F.abs(F.xxhash64(i, j)) % 256)), 2, "0"),
        ),
    )
    good = F.concat(le_hex(n_payload, 2), le_hex(logcode, 2), le_hex(seq, 4), le_hex(tsr, 4), payload)
    corrupt_kind = F.abs(F.xxhash64(i, F.lit("bad"))) % 20  # 0..19; 0-2 → corrupt
    packet = (
        F.when(corrupt_kind == 0, F.concat(F.lit("zz"), good))   # bad charset
        .when(corrupt_kind == 1, F.substring(good, 1, 11))       # truncated, odd length
        .when(corrupt_kind == 2, F.concat(good, F.lit("ff")))    # length mismatch
        .otherwise(good)
    )
    return df.select(i.alias("packet_id"), packet.alias("packet_hex"))
