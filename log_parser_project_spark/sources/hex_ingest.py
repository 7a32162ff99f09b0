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


from dataclasses import dataclass, field as _dc_field


@dataclass(frozen=True)
class FieldDef:
    """One row of a field-layout table — the schema-as-data analog of
    ``hex_decoder_module/models/icd.py:27-37`` ``FieldDefinition``."""

    name: str
    offset_bits: int
    length_bits: int
    type_name: str = "uint"  # uint | int | bool | enum | float32 | float64 | string
    enum_map: dict[int, str] = _dc_field(default_factory=dict)


def _slice_payload_bits(payload_hex: Column, offset_bits: int, length_bits: int) -> Column:
    """``slice_bits`` over a little-endian hex payload, expression-only
    (``utils/byte_ops.py:31-66``): the payload as a little-endian
    integer, shifted right by ``offset_bits``, masked to ``length_bits``.
    Implemented windowed — only the containing bytes are converted, so
    payloads of any length work as long as one field spans ≤ 7 bytes
    (the reference's practical limit for non-byte-aligned fields)."""
    start_byte = offset_bits // 8
    bit_in_window = offset_bits % 8
    window_bytes = (bit_in_window + length_bits + 7) // 8
    if window_bytes > 7:
        raise ValueError("field window exceeds 7 bytes (56 bits)")
    window = _le_bytes_to_long(payload_hex, start_byte, window_bytes)
    mask = (1 << length_bits) - 1
    return F.shiftright(window, bit_in_window).bitwiseAND(F.lit(mask))


def _decode_float(payload_hex: Column, fld: FieldDef) -> Column:
    """IEEE-754 field decode with the reference's constraints
    (``type_converters.py:decode_float``): byte-aligned offset, length
    exactly 32 or 64 bits, little-endian. float64 is read as two 32-bit
    halves so no intermediate overflows a signed long."""
    from ..operators import convert

    if fld.offset_bits % 8 != 0:
        raise ValueError(
            f"float field {fld.name}: bit-level offsets are not supported "
            f"(offset_bits={fld.offset_bits})"
        )
    if fld.length_bits not in (32, 64):
        raise ValueError(
            f"float field {fld.name} must be 32 or 64 bits, got {fld.length_bits}"
        )
    if (fld.type_name == "float32") != (fld.length_bits == 32):
        raise ValueError(
            f"float field {fld.name}: type {fld.type_name} requires "
            f"length_bits={32 if fld.type_name == 'float32' else 64}"
        )
    off = fld.offset_bits // 8
    if fld.length_bits == 32:
        return convert.f32_from_bits_expr(_le_bytes_to_long(payload_hex, off, 4))
    return convert.f64_from_parts(
        _le_bytes_to_long(payload_hex, off + 4, 4),
        _le_bytes_to_long(payload_hex, off, 4),
    )


def _decode_string(payload_hex: Column, fld: FieldDef) -> Column:
    """Fixed-length / null-terminated string field (reference
    ``type_converters.py:114-141`` decode_string — an operator the
    reference defines but never wires; first-class here): byte-aligned,
    reads up to ``length_bits/8`` bytes (clamped to the payload, like
    the reference), truncates at the first NUL byte, decodes UTF-8 and
    falls back to the raw hex on invalid sequences. Expression-only."""
    if fld.offset_bits % 8 != 0 or fld.length_bits % 8 != 0:
        raise ValueError(
            f"string field {fld.name} must be byte-aligned with a whole-byte length"
        )
    off, ln = fld.offset_bits // 8, fld.length_bits // 8
    window = F.substring(payload_hex, off * 2 + 1, ln * 2)  # clamps at payload end
    # keep byte pairs up to (not including) the first 00 pair
    trimmed = F.regexp_extract(window, "^((?:(?!00)[0-9a-fA-F]{2})*)", 1)
    b = F.unhex(trimmed)
    s = b.cast("string")
    return F.when(F.is_valid_utf8(s), s).otherwise(F.lower(F.hex(b)))


def decode_fields(
    df: DataFrame, layout: list[FieldDef], payload_col: str = "payload_hex"
) -> DataFrame:
    """Schema-table-driven payload decode — the vectorized analog of the
    reference's per-field loop (``decoder/payload_decoder.py:80-114`` +
    ``decoder/field_decoder.py:14-114``): every ``FieldDef`` in the
    layout becomes one typed column, all whole-stage-codegen'd
    expressions (shift/mask/two's-complement/enum map), no Python.

    Type dispatch mirrors ``field_decoder``: ``uint`` (default, and the
    unknown-type fallback), ``int`` (two's complement,
    ``type_converters.py:88-111``), ``bool`` (single-bit test,
    ``type_converters.py:40-58``), ``enum`` (raw + ``<name>_friendly``
    with ``UNKNOWN(v)`` default, ``type_converters.py:61-85``),
    ``float32``/``float64`` (IEEE-754 reinterpret of the little-endian
    bytes, ``type_converters.py:144-183`` decode_float — byte-aligned
    only, like the reference, but expression-side instead of
    ``struct.unpack``).
    """
    p = F.col(payload_col)
    out = df
    for fld in layout:
        if fld.type_name in ("float32", "float64"):
            out = out.withColumn(fld.name, _decode_float(p, fld))
            continue
        if fld.type_name == "string":
            out = out.withColumn(fld.name, _decode_string(p, fld))
            continue
        raw = _slice_payload_bits(p, fld.offset_bits, fld.length_bits)
        if fld.type_name == "bool":
            if fld.length_bits != 1:
                raise ValueError(f"bool field {fld.name} must be 1 bit")
            out = out.withColumn(fld.name, raw == 1)
        elif fld.type_name == "int":
            sign_bit = 1 << (fld.length_bits - 1)
            out = out.withColumn(
                fld.name,
                F.when(raw >= sign_bit, raw - (1 << fld.length_bits)).otherwise(raw),
            )
        elif fld.type_name == "enum":
            m = F.create_map(
                *[F.lit(x) for k, v in fld.enum_map.items() for x in (k, v)]
            )
            out = out.withColumn(fld.name, raw).withColumn(
                f"{fld.name}_friendly",
                F.coalesce(
                    m[raw], F.concat(F.lit("UNKNOWN("), raw.cast("string"), F.lit(")"))
                ),
            )
        else:  # uint + unknown-type fallback (field_decoder.py:95-103)
            out = out.withColumn(fld.name, raw)
    return out


def flatten_layout(
    layout: list[FieldDef | tuple[str, int]],
    tables: dict[str, list[FieldDef]] | None = None,
    prefix: str = "",
    base_bits: int = 0,
) -> list[FieldDef]:
    """Wrapper-table expansion at registry-build time (J3/J4 on the
    payload path — ``icd_parser/icd_query.py:173-228`` inlines a
    referenced table's fields with offset rebasing; the reference
    resolves the dependency graph once at parse time,
    ``DESIGN_SUMMARY.md:67-75``, and so do we: driver-side, before any
    executor sees the layout).

    ``layout`` entries are either ``FieldDef``s or ``(table_name,
    offset_bits)`` references into ``tables``; references expand
    recursively with offsets rebased onto the wrapper's base and names
    dotted (``wrapper.field`` instead of the reference's name-mangling).
    """
    tables = tables or {}
    out: list[FieldDef] = []
    for entry in layout:
        if isinstance(entry, FieldDef):
            out.append(
                FieldDef(
                    f"{prefix}{entry.name}",
                    base_bits + entry.offset_bits,
                    entry.length_bits,
                    entry.type_name,
                    entry.enum_map,
                )
            )
        else:
            ref, off = entry
            if ref not in tables:
                raise KeyError(f"unknown table reference {ref!r}")
            out.extend(
                flatten_layout(
                    tables[ref], tables, f"{prefix}{ref}_", base_bits + off
                )
            )
    return out


def decode_versioned(
    df: DataFrame,
    version_col: Column,
    version_layouts: dict[int, list[FieldDef]],
    payload_col: str = "payload_hex",
) -> DataFrame:
    """Per-row version-resolved payload decode (J2 on the payload path —
    ``decoder/version_resolver.py:13-56``: the version value read from
    the payload selects which field-layout table applies). Every field
    of every version becomes a column, dispatched by a ``when`` chain
    on the version (fields absent from a row's version are NULL), plus
    ``layout_version`` with the fallback-to-first semantics of
    ``icd_query.py:144-153``.

    The union-of-columns shape mirrors the engine's text registry
    (``extracted`` struct holds every group of every pattern).
    """
    p = F.col(payload_col)
    versions = sorted(version_layouts)
    fallback = versions[0]
    resolved = F.coalesce(
        *[F.when(version_col == v, F.lit(v)) for v in versions], F.lit(fallback)
    )
    out = df.withColumn("layout_version", resolved)
    all_fields: dict[str, list[tuple[int, FieldDef]]] = {}
    for v, layout in version_layouts.items():
        for fld in layout:
            all_fields.setdefault(fld.name, []).append((v, fld))
    for name, variants in all_fields.items():
        any_float = any(f.type_name in ("float32", "float64") for _, f in variants)
        any_string = any(f.type_name == "string" for _, f in variants)
        if any_string and len(variants) != sum(
            1 for _, f in variants if f.type_name == "string"
        ):
            # a text/numeric union would silently reinterpret one or
            # the other — refuse instead
            raise ValueError(
                f"field {name}: string variants cannot share a "
                "version-dispatched column with numeric variants"
            )
        if any_float:
            for _, f in variants:
                if f.type_name not in ("float32", "float64") and f.length_bits > 53:
                    # the union column is double; a >53-bit integer
                    # would silently round — refuse instead
                    raise ValueError(
                        f"field {name}: {f.length_bits}-bit integer variant "
                        "cannot share a version-dispatched column with float "
                        "variants (doubles hold 53 integer bits exactly)"
                    )
        union_type = "string" if any_string else ("double" if any_float else "long")
        expr = F.lit(None).cast(union_type)
        for v, fld in variants:
            if fld.type_name == "string":
                raw = _decode_string(p, fld)
            elif fld.type_name in ("float32", "float64"):
                raw = _decode_float(p, fld)
            else:
                raw = _slice_payload_bits(p, fld.offset_bits, fld.length_bits)
                if fld.type_name == "int":
                    sign = 1 << (fld.length_bits - 1)
                    raw = F.when(raw >= sign, raw - (1 << fld.length_bits)).otherwise(raw)
                if any_float:
                    raw = raw.cast("double")
            expr = F.when(F.col("layout_version") == v, raw).otherwise(expr)
        out = out.withColumn(name, expr)
    return out


def _le_bytes_to_long_at(hexcol: Column, byte_off: Column, n_bytes: int) -> Column:
    """Like ``_le_bytes_to_long`` but with a *dynamic* (per-row) byte
    offset — used for repeating-record strides."""
    pairs = [
        F.substring(hexcol, byte_off * 2 + 1 + i * 2, F.lit(2)) for i in range(n_bytes)
    ]
    return F.conv(F.concat(*reversed(pairs)), 16, 10).cast("long")


def decode_repeating(
    df: DataFrame,
    record_layout: list[FieldDef],
    count_col: Column,
    base_offset_bytes: int = 0,
    payload_col: str = "payload_hex",
) -> DataFrame:
    """Repeating-record expansion over a binary payload (§2.8, the
    reference's most intricate operator — ``payload_decoder.py:133-209``
    + ``metadata_payload_parser.py:144-286``), fully expression-side:

    * stride = ``ceil(max(offset+len)/8)`` bytes over the record layout
      (``payload_decoder.py:166-170``);
    * actual count = ``least(logical_count, (payload_len − base) //
      stride)`` — clamped to what physically fits
      (``payload_decoder.py:174-185``); the logical count is a column,
      so the J6 coalesce chain (count field → popcount → 1) plugs in;
    * each record decodes at ``base + i*stride`` via ``transform`` over
      a ``sequence``, then ``posexplode`` yields one row per record
      with a real ``record_idx`` instead of the reference's
      ``"{name} (Record {i})"`` name-mangling.

    Records are byte-aligned (as in the reference, where stride is
    whole bytes); fields inside a record may still be bit-granular.
    """
    stride_bits = max(f.offset_bits + f.length_bits for f in record_layout)
    stride_bytes = (stride_bits + 7) // 8
    p = F.col(payload_col)
    fits = F.floor((F.length(p) / 2 - base_offset_bytes) / stride_bytes).cast("long")
    actual = F.greatest(F.least(count_col.cast("long"), fits), F.lit(0))

    def record_struct(i: Column) -> Column:
        rec_base = F.lit(base_offset_bytes) + i * stride_bytes
        fields = []
        for fld in record_layout:
            start = rec_base + fld.offset_bits // 8
            bit = fld.offset_bits % 8
            wb = (bit + fld.length_bits + 7) // 8
            window = _le_bytes_to_long_at(p, start, wb)
            raw = F.shiftright(window, bit).bitwiseAND(F.lit((1 << fld.length_bits) - 1))
            if fld.type_name == "int":
                sign = 1 << (fld.length_bits - 1)
                raw = F.when(raw >= sign, raw - (1 << fld.length_bits)).otherwise(raw)
            elif fld.type_name == "bool":
                raw = raw == 1
            fields.append(raw.alias(fld.name))
        return F.struct(*fields)

    recs = F.when(
        actual > 0,
        F.transform(F.sequence(F.lit(0), actual - 1), record_struct),
    ).otherwise(F.array().cast(
        "array<struct<" + ",".join(
            f"{f.name}:{'boolean' if f.type_name == 'bool' else 'bigint'}"
            for f in record_layout
        ) + ">>"
    ))
    return (
        df.withColumn("_recs", recs)
        .select("*", F.posexplode("_recs").alias("record_idx", "record"))
        .select(*df.columns, "record_idx", "record.*")
    )


def decode_packet_json(
    spark: SparkSession,
    hex_input: str,
    version_layouts: dict[int, list[FieldDef]],
    version_offset_bits: int = 0,
    version_length_bits: int = 8,
) -> dict:
    """One-shot CLI-parity decode (the reference's §3.3 lifecycle:
    ``hex_decoder_module/cli.py:19-53`` — parse → validate → header →
    version-resolve → field decode → JSON dict), as a single 1-row run
    of the same DataFrame plan the batch pipeline uses. Returns the
    ``{valid, reject_reason?, header{...}, layout_version, fields{...},
    metadata{decode_time_ms}}`` dict (K3 + R6 analog)."""
    import json
    import time

    t0 = time.perf_counter()
    df = spark.createDataFrame([(hex_input.strip().lower(),)], "packet_hex string")
    v = validate_packets(df)
    row = v.first()
    if not row.valid:
        return {"valid": False, "reject_reason": row.reject_reason}
    dec = payload_hex(decode_header(v))
    version = _slice_payload_bits(
        F.col("payload_hex"), version_offset_bits, version_length_bits
    )
    out = decode_versioned(dec, version, version_layouts)
    r = out.first()
    field_names = {f.name for layout in version_layouts.values() for f in layout}
    result = {
        "valid": True,
        "header": {
            "pkt_length": r.pkt_length,
            "logcode": r.logcode,
            "logcode_hex": r.logcode_hex,
            "sequence": r.sequence,
            "timestamp_raw": r.timestamp_raw,
        },
        "layout_version": r.layout_version,
        "fields": {n: getattr(r, n) for n in sorted(field_names)},
        "metadata": {"decode_time_ms": round((time.perf_counter() - t0) * 1000, 2)},
    }
    json.dumps(result)  # guarantee serializable (FileWriter contract)
    return result


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


def load_layouts_json(source) -> tuple[dict[int, list[FieldDef]], int, int]:
    """Load a schema-registry JSON — the pre-generated-metadata decode
    path of the reference ("1000× faster", ``metadata_payload_parser.
    py:19-32``). Accepts a path or an already-parsed dict shaped::

        {"version_offset_bits": 0, "version_length_bits": 8,
         "layouts": {"1": [{"name": "u8", "offset_bits": 0,
                            "length_bits": 8, "type": "uint",
                            "enum": {"0": "off"}}, ...]}}

    Returns (version→FieldDef list, version_offset_bits,
    version_length_bits) ready for :func:`decode_versioned` /
    :func:`decode_packet_json`.
    """
    import json as _json

    meta = source
    if isinstance(source, str):
        with open(source) as f:
            meta = _json.load(f)
    layouts = {
        int(ver): [
            FieldDef(
                name=fd["name"],
                offset_bits=int(fd["offset_bits"]),
                length_bits=int(fd["length_bits"]),
                type_name=fd.get("type", "uint"),
                enum_map={int(k): v for k, v in (fd.get("enum") or {}).items()},
            )
            for fd in fields
        ]
        for ver, fields in meta["layouts"].items()
    }
    return (
        layouts,
        int(meta.get("version_offset_bits", 0)),
        int(meta.get("version_length_bits", 8)),
    )
