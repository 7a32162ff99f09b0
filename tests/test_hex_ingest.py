"""Hex-packet ingest: encode/decode roundtrip, validator channels,
little-endian semantics vs a pure-Python reference (struct.unpack —
the same primitive the reference engine uses)."""

import struct

import pyspark.sql.functions as F

from log_parser_project_spark.sources import hex_ingest


def test_roundtrip_against_struct_unpack(spark):
    pkts = hex_ingest.synth_packets(spark, n=500)
    v = hex_ingest.validate_packets(pkts)
    dec = hex_ingest.decode_header(v.filter(F.col("valid"))).collect()
    raw = {r.packet_id: r.packet_hex for r in pkts.collect()}
    assert dec
    for r in dec:
        b = bytes.fromhex(raw[r.packet_id])
        length, logcode, seq, tsr = struct.unpack("<HHII", b[:12])
        assert (r.pkt_length, r.logcode, r.sequence, r.timestamp_raw) == (
            length, logcode, seq, tsr
        ), r.packet_id
        assert r.logcode_hex == f"0x{logcode:04X}"
        # declared length matches actual payload (validator contract)
        assert length == len(b) - 12


def test_validator_channels(spark):
    pkts = hex_ingest.synth_packets(spark, n=2000)
    v = hex_ingest.validate_packets(pkts)
    reasons = {r.reject_reason for r in v.filter(~F.col("valid")).select("reject_reason").distinct().collect()}
    assert reasons == {"bad_charset", "odd_length", "length_mismatch"}
    valid_rate = v.filter("valid").count() / 2000
    assert 0.8 < valid_rate < 0.9  # ~15% corrupt by construction


def test_payload_extraction(spark):
    pkts = hex_ingest.synth_packets(spark, n=100)
    v = hex_ingest.validate_packets(pkts).filter(F.col("valid"))
    p = hex_ingest.payload_hex(hex_ingest.decode_header(v))
    for r in p.select("pkt_length", "payload_hex").collect():
        assert len(r.payload_hex) == r.pkt_length * 2
