"""Pure-Python/pandas reference oracle for the transcripts pipeline.

The reference validates decodes against committed golden JSONs
(``hex_decoder_module/sample_output.json`` vs ``test_packet.hex``,
checked by scripts like ``test_corrected_parser.py``). The new engine
replaces frozen goldens with a *second, independent implementation*:
this module re-implements classify → extract → enrich → route →
aggregate with plain ``re`` + dict loops (deliberately row-at-a-time,
like the reference engine itself), and pytest asserts the Spark
pipeline agrees exactly — routed-row set equality, per-sink counts,
per-turn text equality under stable (conv_id, turn_idx) ordering.
"""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd

from .registry import ALL_GROUPS, PATTERNS, DIM_ROLES, DIM_TOOLS

_CLASS_PREFIXES = [
    ("CALL ", "tool_call"),
    ("ERROR ", "error"),
    ("see [", "citation"),
    ("latency_ms=", "metric"),
    ("HANDOFF ", "handoff"),
]
# ASCII-explicit boundaries — must mirror operators/parse.py classify()
_VERSION_RX = re.compile(r"(?<![A-Za-z0-9_])v=([0-9]+)(?![A-Za-z0-9_])")
_REG = {(p.pattern_class, p.version): p for p in PATTERNS}
_ROLE_CLASS = {r: (c, w) for r, c, w in DIM_ROLES}
_TOOL_FAM = {t: (f, rl) for t, f, rl in DIM_TOOLS}


def classify_one(text: str) -> tuple[str | None, int | None]:
    for prefix, cls in _CLASS_PREFIXES:
        if text.startswith(prefix):
            m = _VERSION_RX.search(text)
            return cls, int(m.group(1)) if m else 1
    return None, None


def parse_row(text: str) -> dict:
    """Decode one turn — the analog of PayloadDecoder.decode."""
    cls, ver = classify_one(text)
    out: dict = {
        "pattern_class": cls,
        "version": ver,
        "matched": False,
        "repeats": None,
        **{g: None for g in ALL_GROUPS},
    }
    p = _REG.get((cls, ver)) if cls else None
    if p is None:
        out["route"] = "sink_unmatched"
        return out
    m = p.compiled().match(text)
    if not m:
        out["route"] = "sink_unmatched"
        return out
    out["matched"] = True
    out["route"] = p.route
    for g in p.groups:
        out[g] = m.group(g)
    if p.repeat_group:
        found = re.findall(p.repeat_group, text)
        out["repeats"] = [list(t) if isinstance(t, tuple) else [t] for t in found]
    if p.enum_field and p.enum_map:
        raw = out.get(p.enum_field)
        if raw is not None:
            out[f"{p.enum_field}_friendly"] = p.enum_map.get(raw, f"UNKNOWN({raw})")
    if cls == "metric" and out.get("latency_ms"):
        lat = float(out["latency_ms"])
        if lat > 0:
            out["tokens_per_sec"] = round(int(out["tokens"]) / (lat / 1000.0), 2)
    return out


def run_oracle(transcripts: pd.DataFrame) -> dict:
    """Full pipeline oracle. Returns routed rows + aggregate counters."""
    rows = []
    for rec in transcripts.to_dict("records"):
        parsed = parse_row(rec["text"])
        role_class, weight = _ROLE_CLASS.get(rec["role"], (None, None))
        tool = rec.get("tool")
        fam, risk = _TOOL_FAM.get(tool, (None, None)) if tool else (None, None)
        rows.append({**rec, **parsed, "role_class": role_class, "weight": weight,
                     "tool_family": fam, "risk_level": risk})
    routed = pd.DataFrame(rows)

    sink_counts = Counter(routed["route"])
    by_conv = Counter(routed["conv_id"])
    by_role = Counter(zip(routed["route"], routed["role"]))
    by_tool = Counter(
        (r, t) for r, t in zip(routed["route"], routed["tool"]) if t is not None and pd.notna(t)
    )
    by_hour = Counter(
        (r, ts.floor("h")) for r, ts in zip(routed["route"], pd.to_datetime(routed["ts"]))
    )
    repeat_records = []
    for rec in rows:
        if rec.get("repeats"):
            for i, tup in enumerate(rec["repeats"]):
                repeat_records.append(
                    (rec["conv_id"], rec["turn_idx"], rec["pattern_class"], i, tuple(tup))
                )
    return {
        "routed": routed,
        "sink_counts": dict(sink_counts),
        "by_conv": dict(by_conv),
        "by_role": dict(by_role),
        "by_tool": dict(by_tool),
        "by_hour": dict(by_hour),
        "repeat_records": set(repeat_records),
    }
