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


def test_field_decode_against_int_from_bytes(spark):
    """decode_fields vs a pure-Python int.from_bytes oracle over the
    synthetic corpus — bit-level parity for every type dispatch,
    including non-byte-aligned windows on variable-length payloads."""
    from log_parser_project_spark.sources.hex_ingest import (
        FieldDef, decode_fields, payload_hex, synth_packets, validate_packets,
    )

    pkts = payload_hex(validate_packets(synth_packets(spark, n=600)).filter("valid"))
    layout = [
        FieldDef("u8", 0, 8, "uint"),
        FieldDef("flag", 8, 1, "bool"),
        FieldDef("lvl", 9, 3, "enum", {0: "off", 1: "low", 2: "mid", 3: "high"}),
        FieldDef("s8", 12, 8, "int"),
        FieldDef("w12", 20, 12, "uint"),
        FieldDef("mid5", 17, 5, "uint"),  # deliberately straddles a byte
    ]
    rows = decode_fields(pkts, layout).select(
        "packet_id", "payload_hex", "u8", "flag", "lvl", "lvl_friendly", "s8", "w12", "mid5"
    ).collect()
    assert rows
    for r in rows:
        data = bytes.fromhex(r.payload_hex)
        whole = int.from_bytes(data, "little")

        def bits(off, ln):
            return (whole >> off) & ((1 << ln) - 1)

        assert r.u8 == bits(0, 8)
        assert r.flag == (bits(8, 1) == 1)
        assert r.lvl == bits(9, 3)
        want_f = {0: "off", 1: "low", 2: "mid", 3: "high"}.get(
            bits(9, 3), f"UNKNOWN({bits(9, 3)})"
        )
        assert r.lvl_friendly == want_f
        raw = bits(12, 8)
        assert r.s8 == (raw - 256 if raw >= 128 else raw)
        assert r.w12 == bits(20, 12)
        assert r.mid5 == bits(17, 5)


def test_repeating_record_decode_clamped(spark):
    """decode_repeating vs pure-Python oracle: dynamic count from a
    decoded field, byte stride from the layout, clamped to what
    physically fits (payload_decoder.py:174-185 semantics)."""
    from log_parser_project_spark.sources.hex_ingest import (
        FieldDef, decode_fields, decode_repeating, payload_hex,
        synth_packets, validate_packets,
    )
    import pyspark.sql.functions as F

    pkts = payload_hex(validate_packets(synth_packets(spark, n=400)).filter("valid"))
    # count rides in payload byte 0 (J6-style count field), records of
    # 2 bytes start at byte 1
    pkts = decode_fields(pkts, [FieldDef("num_rec", 0, 8, "uint")])
    rec_layout = [
        FieldDef("r_lo", 0, 8, "uint"),
        FieldDef("r_hi", 8, 7, "uint"),
        FieldDef("r_flag", 15, 1, "bool"),
    ]
    out = decode_repeating(
        pkts, rec_layout, count_col=F.col("num_rec") % 4, base_offset_bytes=1
    )
    got = {}
    for r in out.select("packet_id", "payload_hex", "num_rec", "record_idx",
                        "r_lo", "r_hi", "r_flag").collect():
        got.setdefault((r.packet_id, r.payload_hex), []).append(
            (r.record_idx, r.r_lo, r.r_hi, r.r_flag)
        )

    n_checked = 0
    for (pid, ph), recs in got.items():
        data = bytes.fromhex(ph)
        logical = data[0] % 4
        fits = (len(data) - 1) // 2
        actual = max(min(logical, fits), 0)
        assert len(recs) == actual, (pid, logical, fits)
        for idx, lo, hi, flag in sorted(recs):
            word = int.from_bytes(data[1 + idx * 2 : 3 + idx * 2], "little")
            assert lo == word & 0xFF
            assert hi == (word >> 8) & 0x7F
            assert flag == bool(word >> 15)
            n_checked += 1
    assert n_checked > 50  # enough records actually exercised

    # rows with actual == 0 are absent from the exploded output (posexplode)
    all_ids = {r.packet_id for r in pkts.select("packet_id").collect()}
    zero_ids = all_ids - {pid for (pid, _ph) in got}
    assert zero_ids  # corpus contains zero-count packets too


def test_flatten_layout_rebases_offsets():
    from log_parser_project_spark.sources.hex_ingest import FieldDef, flatten_layout

    tables = {
        "inner": [FieldDef("a", 0, 4), FieldDef("b", 4, 4)],
        "outer": [FieldDef("head", 0, 8), ("inner", 8), ("inner", 16)],
    }
    flat = flatten_layout(tables["outer"], tables)
    got = [(f.name, f.offset_bits, f.length_bits) for f in flat]
    assert got == [
        ("head", 0, 8),
        ("inner_a", 8, 4), ("inner_b", 12, 4),
        ("inner_a", 16, 4), ("inner_b", 20, 4),
    ]
    import pytest
    with pytest.raises(KeyError):
        flatten_layout([("missing", 0)], tables)


def test_versioned_decode_dispatch(spark):
    """decode_versioned: the version read from the payload picks the
    layout per row; unknown versions fall back to the first layout
    (icd_query.py:144-153 semantics)."""
    from log_parser_project_spark.sources.hex_ingest import FieldDef, decode_versioned
    import pyspark.sql.functions as F

    # payload: byte0 = version, bytes 1-2 = data
    rows = [(1, "01" + "ab" + "cd"), (2, "02" + "ab" + "cd"), (3, "09" + "ab" + "cd")]
    df = spark.createDataFrame(rows, "pid int, payload_hex string")
    v1 = [FieldDef("x", 8, 8, "uint")]                 # x = byte1
    v2 = [FieldDef("x", 16, 8, "uint"), FieldDef("y", 8, 8, "int")]
    out = decode_versioned(
        df, F.conv(F.substring("payload_hex", 1, 2), 16, 10).cast("long"),
        {1: v1, 2: v2},
    ).collect()
    by_pid = {r.pid: r for r in out}
    assert by_pid[1].layout_version == 1 and by_pid[1].x == 0xAB and by_pid[1].y is None
    assert by_pid[2].layout_version == 2 and by_pid[2].x == 0xCD
    assert by_pid[2].y == 0xAB - 256  # int8 two's complement of 0xab
    # version 9 unknown -> fallback to first (v1)
    assert by_pid[3].layout_version == 1 and by_pid[3].x == 0xAB


def test_decode_packet_json_cli_parity(spark):
    """One-shot packet -> JSON decode (cli.py:19-53 lifecycle): header,
    version-resolved fields, decode timing metadata; bad packets land
    in the reject channel instead of raising."""
    from log_parser_project_spark.sources.hex_ingest import FieldDef, decode_packet_json

    def le(v, nb):
        return v.to_bytes(nb, "little").hex()

    # header: length=3 (payload bytes), logcode=0x1C07, seq=42, ts=7
    # payload: version=2, then bytes 0x0f 0x83
    pkt = le(3, 2) + le(0x1C07, 2) + le(42, 4) + le(7, 4) + "02" + "0f" + "83"
    layouts = {
        1: [FieldDef("speed", 8, 8, "uint")],
        2: [FieldDef("speed", 8, 8, "uint"), FieldDef("temp", 16, 8, "int")],
    }
    out = decode_packet_json(spark, pkt, layouts)
    assert out["valid"] is True
    assert out["header"]["logcode_hex"] == "0x1C07"
    assert out["header"]["sequence"] == 42
    assert out["layout_version"] == 2
    assert out["fields"]["speed"] == 0x0F
    assert out["fields"]["temp"] == 0x83 - 256
    assert out["metadata"]["decode_time_ms"] > 0

    bad = decode_packet_json(spark, "zz" + pkt, layouts)
    assert bad == {"valid": False, "reject_reason": "bad_charset"}


# ---------------------------------------------------------------------------
# IEEE-754 float decode (reference type_converters.decode_float parity)
# ---------------------------------------------------------------------------

def _assert_float_cols_equal(got, want):
    import math

    assert len(got) == len(want)
    for g, w in zip(got, want):
        if math.isnan(w):
            assert math.isnan(g)
        else:
            assert g == w, f"{g!r} != {w!r}"


def test_f32_expression_matches_hardware_reinterpret(spark):
    """Expression-side float32 decode is bit-identical to numpy's view
    reinterpret over edge cases + seeded random patterns."""
    import numpy as np

    rng = np.random.RandomState(7)
    edge = [0x00000000, 0x80000000, 0x3F800000, 0xC0490FDB,
            0x7F800000, 0xFF800000, 0x7FC00000,  # ±inf, nan
            0x00000001, 0x007FFFFF,              # subnormals
            0x7F7FFFFF, 0x00800000]              # max/min normal
    pats = edge + [int(x) for x in rng.randint(0, 2**32, size=300, dtype=np.uint64)]
    want = np.array(pats, dtype=np.uint32).view(np.float32).astype(np.float64)

    from log_parser_project_spark.operators import convert

    df = spark.createDataFrame([(i, p) for i, p in enumerate(pats)], "i long, bits long")
    rows = df.select("i", convert.f32_from_bits_expr(F.col("bits")).alias("v"),
                     convert.f32_from_bits(F.col("bits")).alias("v_udf")).orderBy("i").collect()
    _assert_float_cols_equal([r.v for r in rows], list(want))
    # the UDF path surfaces NaN as NULL (pandas NaN == Arrow null); it
    # must agree everywhere else
    import math
    _assert_float_cols_equal(
        [r.v_udf for r, w in zip(rows, want) if not math.isnan(w)],
        [w for w in want if not math.isnan(w)])


def test_f64_expression_matches_hardware_reinterpret(spark):
    import numpy as np

    rng = np.random.RandomState(11)
    edge = [0x0000000000000000, 0x8000000000000000, 0x3FF0000000000000,
            0x7FF0000000000000, 0xFFF0000000000000, 0x7FF8000000000000,
            0x0000000000000001, 0x000FFFFFFFFFFFFF,
            0x7FEFFFFFFFFFFFFF, 0x0010000000000000]
    pats = edge + [int(x) for x in rng.randint(0, 2**64, size=300, dtype=np.uint64)]
    want = np.array(pats, dtype=np.uint64).view(np.float64)
    signed = [p - 2**64 if p >= 2**63 else p for p in pats]

    from log_parser_project_spark.operators import convert

    df = spark.createDataFrame([(i, p) for i, p in enumerate(signed)], "i long, bits long")
    hi = F.shiftrightunsigned(F.col("bits"), 32)
    lo = F.col("bits").bitwiseAND(F.lit((1 << 32) - 1))
    rows = df.select("i", convert.f64_from_parts(hi, lo).alias("v"),
                     convert.f64_from_bits(F.col("bits")).alias("v_udf")).orderBy("i").collect()
    _assert_float_cols_equal([r.v for r in rows], list(want))
    import math
    _assert_float_cols_equal(
        [r.v_udf for r, w in zip(rows, want) if not math.isnan(w)],
        [w for w in want if not math.isnan(w)])


def test_decode_fields_float_roundtrip_and_validation(spark):
    """Layout-driven float32+float64 decode over little-endian payload
    hex matches struct.pack ground truth; reference constraints (byte
    alignment, 32/64 bits only) are enforced."""
    import struct

    import pytest as _pytest

    from log_parser_project_spark.sources import hex_ingest

    vals = [(0, 1.5, -2.25), (1, 3.140625, 1e300), (2, -0.0, 5e-324)]
    rows = [(i, (struct.pack("<f", a) + struct.pack("<d", b)).hex()) for i, a, b in vals]
    df = spark.createDataFrame(rows, "i long, payload_hex string")
    layout = [hex_ingest.FieldDef("fa", 0, 32, "float32"),
              hex_ingest.FieldDef("fb", 32, 64, "float64")]
    got = {r.i: (r.fa, r.fb) for r in hex_ingest.decode_fields(df, layout).collect()}
    for i, a, b in vals:
        assert got[i][0] == struct.unpack("<f", struct.pack("<f", a))[0]
        assert got[i][1] == b

    with _pytest.raises(ValueError, match="bit-level"):
        hex_ingest.decode_fields(df, [hex_ingest.FieldDef("x", 4, 32, "float32")])
    with _pytest.raises(ValueError, match="32 or 64"):
        hex_ingest.decode_fields(df, [hex_ingest.FieldDef("x", 0, 16, "float32")])
    with _pytest.raises(ValueError, match="requires"):
        hex_ingest.decode_fields(df, [hex_ingest.FieldDef("x", 0, 64, "float32")])


def test_decode_versioned_float_field(spark):
    """Version-dispatched layouts may mix float and integer fields; the
    union column is typed double and integer variants widen."""
    import struct

    from log_parser_project_spark.sources import hex_ingest

    rows = [(1, ("01" + struct.pack("<f", 2.5).hex())),
            (2, ("02" + "07" + "0" * 8))]
    df = spark.createDataFrame(rows, "ver long, payload_hex string")
    v1 = [hex_ingest.FieldDef("m", 8, 32, "float32")]
    v2 = [hex_ingest.FieldDef("m", 8, 8, "uint")]
    dec = hex_ingest.decode_versioned(
        df, F.col("ver"), {1: v1, 2: v2}
    )
    got = {r.layout_version: r.m for r in dec.collect()}
    assert got[1] == 2.5 and got[2] == 7.0
    assert dict(dec.dtypes)["m"] == "double"


def test_decode_string_field_reference_parity(spark):
    """decode_string parity (type_converters.py:114-141): NUL
    termination, fixed length, UTF-8 with raw-hex fallback, clamping
    when the field runs past the payload."""
    from log_parser_project_spark.sources import hex_ingest

    cases = [
        (0, b"AB\x00Z".hex(), "AB"),            # NUL-terminated
        (1, b"ABCD".hex(), "ABCD"),             # full fixed length
        (2, (b"A\xffZ\x00").hex(), "41ff5a"),    # invalid UTF-8 → hex
        (3, b"\x00ABC".hex(), ""),              # leading NUL → empty
        (4, b"AB".hex(), "AB"),                 # payload shorter than field
        (5, "e282ac41".lower(), "€A"),          # multibyte UTF-8 survives
    ]
    df = spark.createDataFrame([(i, h) for i, h, _ in cases], "i long, payload_hex string")
    dec = hex_ingest.decode_fields(df, [hex_ingest.FieldDef("s", 0, 32, "string")])
    got = {r.i: r.s for r in dec.collect()}
    for i, _, want in cases:
        assert got[i] == want, (i, got[i], want)

    import pytest as _pytest
    with _pytest.raises(ValueError, match="byte-aligned"):
        hex_ingest.decode_fields(df, [hex_ingest.FieldDef("s", 4, 32, "string")])


def test_decode_versioned_rejects_wide_int_float_mix(spark):
    """A >53-bit integer variant cannot share a version-dispatched
    column with float variants — the double union would silently round."""
    import pytest as _pytest

    from log_parser_project_spark.sources import hex_ingest

    df = spark.createDataFrame([(1, "00" * 9)], "ver long, payload_hex string")
    v1 = [hex_ingest.FieldDef("m", 8, 64, "uint")]
    v2 = [hex_ingest.FieldDef("m", 8, 32, "float32")]
    with _pytest.raises(ValueError, match="53"):
        hex_ingest.decode_versioned(df, F.col("ver"), {1: v1, 2: v2})


# ---------------------------------------------------------------------------
# property fuzz: random layouts + payloads vs a pure-Python struct oracle
# ---------------------------------------------------------------------------

def _py_decode(payload: bytes, fld):
    """Independent row-at-a-time reference decoder (the reference
    engine's own strategy: int.from_bytes + struct.unpack)."""
    import struct as _struct

    if fld.type_name in ("float32", "float64"):
        nb = fld.length_bits // 8
        off = fld.offset_bits // 8
        raw = payload[off:off + nb]
        return _struct.unpack("<f" if nb == 4 else "<d", raw)[0]
    if fld.type_name == "string":
        off, nb = fld.offset_bits // 8, fld.length_bits // 8
        raw = payload[off:off + nb]
        nul = raw.find(b"\x00")
        if nul != -1:
            raw = raw[:nul]
        try:
            return raw.decode("utf-8")
        except UnicodeDecodeError:
            return raw.hex()
    whole = int.from_bytes(payload, "little")
    raw = (whole >> fld.offset_bits) & ((1 << fld.length_bits) - 1)
    if fld.type_name == "bool":
        return raw == 1
    if fld.type_name == "int" and raw >= 1 << (fld.length_bits - 1):
        return raw - (1 << fld.length_bits)
    return raw


def test_fuzz_layout_decode_vs_python_oracle(spark):
    """Random layouts (every field type, random bit offsets for integer
    types, byte-aligned for float/string) over random payloads: the
    expression decoder agrees with the pure-Python reference decoder
    on every field of every row."""
    import math
    import random

    from log_parser_project_spark.sources import hex_ingest

    rnd = random.Random(42)

    def gen_layout(r):
        fields, cursor = [], 0
        for i in range(r.randint(1, 6)):
            t = r.choice(["uint", "int", "bool", "float32", "float64", "string"])
            if t in ("float32", "float64", "string"):
                cursor = (cursor + 7) // 8 * 8  # byte-align
                bits = {"float32": 32, "float64": 64, "string": r.choice([16, 32])}[t]
            elif t == "bool":
                bits = 1
            else:
                bits = r.randint(2, 48)
            fields.append(hex_ingest.FieldDef(f"f{i}", cursor, bits, t))
            cursor += bits
        return fields, (cursor + 7) // 8

    for trial in range(25):
        layout, n_bytes = gen_layout(rnd)
        payloads = [bytes(rnd.getrandbits(8) for _ in range(n_bytes)) for _ in range(8)]
        df = spark.createDataFrame(
            [(i, p.hex()) for i, p in enumerate(payloads)], "i long, payload_hex string"
        )
        got = {r.i: r for r in hex_ingest.decode_fields(df, layout).collect()}
        for i, p in enumerate(payloads):
            for fld in layout:
                want = _py_decode(p, fld)
                have = got[i][fld.name]
                if isinstance(want, float):
                    if math.isnan(want):
                        assert math.isnan(have), (trial, fld, p.hex())
                    else:
                        assert have == want, (trial, fld, p.hex(), have, want)
                else:
                    assert have == want, (trial, fld, p.hex(), have, want)


def test_decode_versioned_string_variants(spark):
    """All-string variants dispatch through the string decoder; mixed
    string/numeric unions are refused."""
    import pytest as _pytest

    from log_parser_project_spark.sources import hex_ingest

    rows = [(1, "01" + b"AB\x00Z".hex()), (2, "02" + b"WXYZ".hex())]
    df = spark.createDataFrame(rows, "ver long, payload_hex string")
    v1 = [hex_ingest.FieldDef("s", 8, 32, "string")]
    v2 = [hex_ingest.FieldDef("s", 8, 16, "string")]
    dec = hex_ingest.decode_versioned(df, F.col("ver"), {1: v1, 2: v2})
    got = {r.layout_version: r.s for r in dec.collect()}
    assert got[1] == "AB" and got[2] == "WX"
    with _pytest.raises(ValueError, match="string variants"):
        hex_ingest.decode_versioned(
            df, F.col("ver"),
            {1: v1, 2: [hex_ingest.FieldDef("s", 8, 8, "uint")]},
        )
