"""Vectorized parse stage: classify (JVM) + extract (Arrow-batched).

Two sub-stages, mirroring the reference's decode pipeline
(``hex_decoder_module/decoder/payload_decoder.py:32-131``):

1. **classify** — the header-decode analog
   (``decoder/header_decoder.py:21-60``): derive ``pattern_class`` and
   ``version`` with cheap built-in column expressions (prefix tests,
   ``rlike``). Kept JVM-side deliberately: Catalyst folds these into
   the scan stage (whole-stage codegen) and the routing key is then
   available for pruning and routing *without* touching Python. The
   prefix dispatch is registry DATA (``Pattern.prefix``), not code.

2. **extract** — the field-decoder analog
   (``decoder/field_decoder.py:14-114``): ONE Arrow-batched pandas UDF
   applies the compiled registry. Per (class, version) it runs a
   single vectorized pass over the masked slice of the batch — pandas
   ``str.extract`` (``impl="pandas"``) or RE2 over Arrow string arrays
   via ``pyarrow.compute.extract_regex`` (``impl="arrow"``) — no
   per-row Python dispatch (north-star requirement). Patterns compile
   once per executor process via a spec-keyed module cache, the analog
   of the reference's LRU metadata cache (``icd_parser/cache.py``) —
   except immutable, so no eviction.

**The registry is injectable**: every stage (classify, both UDF
extractors, the compiled-JVM extractor, repeat explode, enums, route)
takes a ``patterns`` tuple defaulting to the module registry — a new
or extended registry needs no code or plan changes
(tests/test_custom_registry.py runs a disjoint registry end to end).

Output layout: instead of the reference's name-mangled flat fields
(``"{name} (Record {i})"``), extraction lands in a typed struct column
``extracted`` (one field per registry group, null when not applicable)
plus ``repeats: array<array<string>>`` for repeat-group matches, which
``explode_repeats`` turns into real rows with a ``record_idx`` column.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..registry import PATTERNS, Pattern, all_groups, class_prefixes

# ---------------------------------------------------------------------------
# 1. classify — routing-key + version derivation, all built-in expressions
# ---------------------------------------------------------------------------

def classify(
    df: DataFrame, text_col: str = "text", patterns: tuple[Pattern, ...] = PATTERNS
) -> DataFrame:
    """Add ``pattern_class`` and ``version`` columns (JVM-side only).
    The dispatch chain is built from the registry's ``prefix`` data."""
    dispatched = {cls for _pre, cls in class_prefixes(patterns)}
    orphans = sorted({p.pattern_class for p in patterns} - dispatched)
    if orphans:
        # a class no prefix dispatches to would silently quarantine
        # 100% of its rows — fail loudly (same discipline as the
        # empty-groups check in _make_extract_udf)
        raise ValueError(
            f"registry classes {orphans} have no pattern with a `prefix` — "
            "classify could never assign them"
        )
    t = F.col(text_col)
    pattern_class = None
    for prefix, cls in class_prefixes(patterns):
        cond = t.startswith(prefix)
        pattern_class = (
            F.when(cond, cls) if pattern_class is None else pattern_class.when(cond, cls)
        )
    pattern_class = (
        pattern_class.otherwise(F.lit(None).cast("string"))
        if pattern_class is not None
        else F.lit(None).cast("string")
    )
    # version resolution: the payload is self-describing — a "v=N"
    # marker selects the layout (analog of version_resolver.py:13-56);
    # absent marker → version 1 (the coalesce fallback of J2).
    # ASCII-explicit boundaries (no \b/\d): Java and Python disagree on
    # Unicode word/digit tables (different Unicode versions), so the
    # registry spec pins the marker charset — identical in any engine.
    version = F.coalesce(
        F.nullif(
            F.regexp_extract(t, r"(?<![A-Za-z0-9_])v=([0-9]+)(?![A-Za-z0-9_])", 1), F.lit("")
        ).cast("int"),
        F.lit(1),
    )
    return df.withColumn("pattern_class", pattern_class).withColumn(
        "version", F.when(pattern_class.isNull(), F.lit(None).cast("int")).otherwise(version)
    )


# ---------------------------------------------------------------------------
# 2. extract — one Arrow-batched pandas UDF over (text, class, version)
# ---------------------------------------------------------------------------

# repeats travel Python→JVM as ONE delimited string (US/RS separators)
# instead of array<array<string>>: nested-array Arrow→UnsafeRow conversion
# dominated the UDF cost; the JVM rebuilds the nested array with split().
_REC_SEP = "\x1e"  # between records
_FLD_SEP = "\x1f"  # between fields of a record


def _registry_spec(patterns: tuple[Pattern, ...]):
    """Immutable, picklable registry spec shipped inside the UDF
    closure (what the executor compiles from)."""
    return tuple(
        (p.pattern_class, p.version, p.regex, p.repeat_group, tuple(p.groups))
        for p in patterns
    )


def _re2_rx(regex: str) -> str:
    """Python-re pattern → RE2 with identical semantics for the registry
    grammar (ASCII classes, named groups, ``^...$`` anchors). The one
    divergence: Python's ``$`` also matches just before a single
    trailing newline, RE2's does not — translate a trailing *anchor*
    ``$`` to ``(?:\\n)?\\z`` (the optional newline sits outside every
    capture group, so extracted fields are unchanged). A trailing
    ``\\$`` (escaped literal dollar, even number of preceding
    backslashes means the ``$`` IS the anchor) is left untouched.
    Interior ``$`` (e.g. per-alternative ``^a$|^b$``) is not
    translated — those alternatives keep strict RE2 end-of-text
    semantics; registry patterns use a single trailing anchor.
    Equivalence on all three engines is fuzz-asserted
    (tests/test_property_parse.py)."""
    if not regex.endswith("$"):
        return regex
    n_backslashes = len(regex[:-1]) - len(regex[:-1].rstrip("\\"))
    if n_backslashes % 2 == 1:  # '\$' — literal dollar, not an anchor
        return regex
    return regex[:-1] + r"(?:\n)?\z"


# per-executor compiled-pattern cache, keyed by registry spec
_COMPILED: dict[tuple, dict] = {}


def _compiled_for(spec) -> dict:
    reg = _COMPILED.get(spec)
    if reg is None:
        import re

        reg = {
            (cls, ver): (re.compile(rx), re.compile(rep) if rep else None, groups)
            for (cls, ver, rx, rep, groups) in spec
        }
        _COMPILED[spec] = reg
    return reg


# driver-side UDF cache so repeated parse() calls reuse one UDF object
_UDF_CACHE: dict[tuple, tuple] = {}


def _make_extract_udf(patterns: tuple[Pattern, ...], impl: str):
    """Build (udf, groups) for a registry — the registry-as-data path:
    the spec travels in the closure, compilation happens lazily on each
    executor, and a different registry is just a different spec."""
    for p in patterns:
        if not p.groups:
            # the match test is "first group is non-null" — a pattern
            # without captures would silently never match; fail loudly
            # (the LogcodeNotFoundError discipline, payload_decoder.py:49-57)
            raise ValueError(
                f"registry pattern {p.pattern_class} v{p.version} has no "
                "capture groups — every pattern needs at least one"
            )
    spec = _registry_spec(patterns)
    key = (spec, impl)
    if key in _UDF_CACHE:
        return _UDF_CACHE[key]
    groups_all = all_groups(patterns)
    schema = T.StructType(
        [T.StructField("matched", T.BooleanType())]
        + [T.StructField(g, T.StringType()) for g in groups_all]
        + [T.StructField("repeats_enc", T.StringType())]
    )

    # both engines share ONE loop body; they differ only in the matcher:
    #   matcher(sub, rx, groups) -> (ok_mask: np.bool_[], {group: values[ok]})
    # "pandas" = Series.str.extract (Python re); "arrow" = RE2 via
    # pyarrow.compute.extract_regex — a single C++ pass over the Arrow
    # string array per pattern per batch (≈1.5–2× the pandas kernel,
    # bench.py match_kernel; the north star's "batched re2-style
    # matching over Arrow string arrays", literally). Only the
    # repeat-group findall (matched
    # tool_call/citation rows) stays in Python re on either engine.
    def _match_pandas(sub: pd.Series, rx, groups):
        hit = sub.str.extract(rx)
        # whole-regex validity, NOT first-group-non-null: an injectable
        # registry may make its first capture optional ('(?P<a>x)? y'),
        # and arrow (res.is_valid) / jvm (rlike) would count that row
        # matched. str.contains shares str.extract's re.search anchor
        # semantics, so the mask is exact.
        import warnings

        with warnings.catch_warnings():
            # pandas warns that a grouped pattern "should use str.extract";
            # here contains-for-the-mask + extract-for-values is deliberate
            warnings.simplefilter("ignore", UserWarning)
            ok = sub.str.contains(rx).fillna(False).to_numpy(dtype=bool)
        return ok, {g: hit[g].to_numpy(dtype=object)[ok] for g in groups}

    def _match_arrow(sub: pd.Series, rx, groups):
        import pyarrow as pa
        import pyarrow.compute as pc

        res = pc.extract_regex(pa.array(sub, type=pa.string()), pattern=_re2_rx(rx.pattern))
        ok = res.is_valid().to_numpy(zero_copy_only=False)
        return ok, {g: res.field(g).to_numpy(zero_copy_only=False)[ok] for g in groups}

    matcher = {"pandas": _match_pandas, "arrow": _match_arrow}[impl]

    def _run(text: pd.Series, cls: pd.Series, ver: pd.Series) -> pd.DataFrame:
        import numpy as np

        reg = _compiled_for(spec)
        n = len(text)
        positions = np.arange(n)
        matched_out = np.zeros(n, dtype=bool)
        group_out = {g: np.full(n, None, dtype=object) for g in groups_all}
        repeats_out = np.full(n, None, dtype=object)

        cls_vals = cls.to_numpy(dtype=object)
        ver_vals = ver.to_numpy()
        text_reset = text.reset_index(drop=True)
        for (pclass, pver), (rx, repeat_rx, groups) in reg.items():
            mask = (cls_vals == pclass) & (ver_vals == pver)
            if not mask.any():
                continue
            pos = positions[mask]
            sub = text_reset.iloc[pos]
            # one vectorized pass per pattern per Arrow batch
            ok, hit_groups = matcher(sub, rx, groups)
            hit_pos = pos[ok]
            matched_out[hit_pos] = True
            for g in groups:
                group_out[g][hit_pos] = hit_groups[g]
            if repeat_rx is not None and len(hit_pos):
                findall = repeat_rx.findall
                found = np.empty(len(hit_pos), dtype=object)
                found[:] = [
                    _REC_SEP.join(
                        _FLD_SEP.join(t) if isinstance(t, tuple) else t for t in findall(s)
                    )
                    for s in text_reset.iloc[hit_pos]
                ]
                repeats_out[hit_pos] = found

        out = {"matched": matched_out}
        out.update(group_out)
        out["repeats_enc"] = repeats_out
        return pd.DataFrame(out)

    udf = pandas_udf(schema)(_run)
    _UDF_CACHE[key] = (udf, groups_all)
    return udf, groups_all


# regex constructs whose semantics diverge between Python re, RE2 and
# java.util.regex (shorthand classes track different Unicode tables;
# inline flags and group backrefs behave differently) — a registry
# using any of these stays on the pandas (Python-re) engine, whose
# semantics the oracle mirrors.
_ENGINE_DIVERGENT = (
    r"\w", r"\W", r"\d", r"\D", r"\s", r"\S", r"\b", r"\B",
    "(?i", "(?u", "(?a", "(?L", "(?m", "(?s", "(?x", "(?P=", "(?<=", "(?<!",
)


def _has_optional_capture(regex: str) -> bool:
    """True when some CAPTURE group can match without participating —
    quantified with min=0, or inside one alternation branch. For such a
    group pandas yields NULL while RE2/Arrow and ``regexp_extract``
    both yield "" (indistinguishable from a legitimately-empty match),
    so the registry must stay on the pandas engine. Detected from the
    ``re`` parse tree — a textual ")?"-scan would misflag the safe
    non-capture ``(?:...)*``."""
    try:
        import re as _re

        parser = getattr(_re, "_parser", None)
        if parser is None:  # pragma: no cover — pre-3.11 fallback
            import sre_parse as parser
        tree = parser.parse(regex)
    except Exception:
        return True  # unanalyzable → be conservative

    # ops with no nested subpattern — safe to skip
    _terminal = {
        "LITERAL", "NOT_LITERAL", "IN", "ANY", "AT", "CATEGORY",
        "RANGE", "NEGATE", "GROUPREF", "GROUPREF_EXISTS",
    }

    def walk(items, optional: bool) -> bool:
        for op, av in items:
            name = str(op)
            if name in ("MAX_REPEAT", "MIN_REPEAT", "POSSESSIVE_REPEAT"):
                lo, _hi, sub = av
                if walk(sub, optional or lo == 0):
                    return True
            elif name == "SUBPATTERN":
                group, _af, _df, sub = av
                if group is not None and optional:
                    return True
                if walk(sub, optional):
                    return True
            elif name == "BRANCH":
                _unused, branches = av
                for b in branches:
                    if walk(b, True):  # each branch may lose the vote
                        return True
            elif name in ("ASSERT", "ASSERT_NOT"):
                _direction, sub = av
                if walk(sub, True):  # lookaround captures are murky
                    return True
            elif name == "ATOMIC_GROUP":
                if walk(av, optional):
                    return True
            elif name not in _terminal:
                return True  # unknown composite — be conservative
        return False

    return walk(tree, False)


def _portable(regex: str) -> bool:
    return (
        regex.isascii()
        and not any(tok in regex for tok in _ENGINE_DIVERGENT)
        and not _has_optional_capture(regex)
    )


def choose_extractor(spark, patterns: tuple[Pattern, ...] = PATTERNS) -> str:
    """Resolve ``extractor="auto"``: the fastest engine whose semantics
    are provably identical for THIS registry. Cost model (bench.py's
    ``match_kernel`` micro-bench — kernel-only, cached batch, no
    exchange): jvm skips the Python exchange entirely (zero
    ArrowEvalPython nodes, the whole plan stays codegen'd); arrow
    (RE2) runs the match kernel ≈ 1.5–2× faster than pandas
    ``str.extract``. Full-pass timings CANNOT rank arrow vs pandas —
    the kernel is ~20 ms of a ~1.5 s distributed pass, inside box
    noise, which is why r02/r03 full-pass orderings flip-flopped.

    * ``jvm`` — registry compiled to built-in expressions — when every
      regex is engine-portable (ASCII, explicit classes, no divergent
      constructs) and compiles under ``java.util.regex``;
    * else ``arrow`` — RE2 over Arrow string arrays — when RE2 accepts
      every pattern (checked by compiling against an empty array);
    * else ``pandas`` — Python ``re`` semantics, the universal
      fallback (and what the pure-Python oracle implements).
    """
    # the repeat-group regex is part of the engine contract too: the
    # jvm path runs it through Java regexp_extract_all, so it needs
    # the same portability screen as the main pattern
    all_rx = [p.regex for p in patterns] + [
        p.repeat_group for p in patterns if p.repeat_group
    ]
    if all(_portable(rx) for rx in all_rx):
        try:
            for rx in all_rx:
                spark._jvm.java.util.regex.Pattern.compile(_java_rx(rx))
            return "jvm"
        except Exception:
            pass
        try:
            import pyarrow as pa
            import pyarrow.compute as pc

            for p in patterns:
                pc.extract_regex(pa.array([], type=pa.string()), pattern=_re2_rx(p.regex))
            return "arrow"
        except Exception:
            pass
    return "pandas"


def extract(
    df: DataFrame,
    text_col: str = "text",
    impl: str = "pandas",
    patterns: tuple[Pattern, ...] = PATTERNS,
) -> DataFrame:
    """Apply the registry; adds ``matched``, group columns (under
    ``extracted.*``), and ``repeats``. ``impl="arrow"`` switches the
    per-pattern matcher from pandas ``str.extract`` to RE2 over Arrow
    arrays; outputs are identical (fuzz-asserted)."""
    udf, groups_all = _make_extract_udf(patterns, impl)
    parsed = df.withColumn(
        "_p", udf(F.col(text_col), F.col("pattern_class"), F.col("version"))
    )
    repeats = F.when(
        F.col("_p.repeats_enc").isNotNull(),
        F.transform(
            F.split(F.col("_p.repeats_enc"), _REC_SEP),
            lambda rec: F.split(rec, _FLD_SEP),
        ),
    )
    return (
        parsed.withColumn("matched", F.col("_p.matched"))
        .withColumn("extracted", F.struct(*[F.col(f"_p.{g}").alias(g) for g in groups_all]))
        .withColumn("repeats", repeats)
        .drop("_p")
    )


def parse(
    df: DataFrame,
    text_col: str = "text",
    impl: str = "pandas",
    patterns: tuple[Pattern, ...] = PATTERNS,
) -> DataFrame:
    """classify + extract in one call."""
    return extract(classify(df, text_col, patterns), text_col, impl=impl, patterns=patterns)


# ---------------------------------------------------------------------------
# 3. repeating-record expansion (reference §2.8) — posexplode
# ---------------------------------------------------------------------------

def explode_repeats(df: DataFrame, patterns: tuple[Pattern, ...] = PATTERNS) -> DataFrame:
    """Explode repeat-group matches into one row per record.

    The reference decodes N fixed-stride records and name-mangles
    fields as ``"{name} (Record {i})"`` (``payload_decoder.py:188-209``);
    here each record becomes a real row with ``record_idx`` plus
    per-class field names resolved from the registry
    (``repeat_fields``), e.g. ``arg_key/arg_val`` for tool_call and
    ``doc/page`` for citation.
    """
    field_map = {
        (p.pattern_class, p.version): p.repeat_fields for p in patterns if p.repeat_group
    }
    # registry is tiny → express field naming as a literal map lookup.
    # No pre-filter: posexplode already drops null/empty arrays, and a
    # filter on the UDF-derived column would make Catalyst extract the
    # parse UDF TWICE (once for the filter stage, once for the project —
    # measured as 2 ArrowEvalPython nodes, i.e. 2× the parse cost).
    exploded = df.select(
        "conv_id", "turn_idx", "pattern_class", "version",
        F.posexplode("repeats").alias("record_idx", "record"),
    )
    name1 = F.create_map(
        *[x for (c, v), flds in field_map.items() for x in (F.lit(f"{c}:{v}"), F.lit(flds[0]))]
    )
    name2 = F.create_map(
        *[x for (c, v), flds in field_map.items() for x in (F.lit(f"{c}:{v}"), F.lit(flds[1]))]
    )
    key = F.concat_ws(":", "pattern_class", "version")
    return exploded.select(
        "conv_id", "turn_idx", "pattern_class", "version", "record_idx",
        name1[key].alias("field1_name"),
        F.col("record")[0].alias("field1_value"),
        name2[key].alias("field2_name"),
        F.col("record")[1].alias("field2_value"),
    )


# ---------------------------------------------------------------------------
# 4. extract_builtin — pure-JVM alternative path (no Python at all)
# ---------------------------------------------------------------------------

def _group_index(regex: str, group: str) -> int:
    """1-based capture-group index of a named group (regexp_extract
    addresses groups by index)."""
    import re

    return re.compile(regex).groupindex[group]


def _java_rx(regex: str) -> str:
    """Python regex → Java regex: named groups → anonymous (Java
    rejects ``(?P<``; its named groups forbid underscores). Registry
    regexes use explicit ASCII classes instead of ``\\w``/``\\d`` —
    hypothesis found both a flag divergence (``CALL µ args={}``: Java
    ASCII vs Python Unicode classes) and, with ``(?U)``, a Unicode
    *version* divergence (``CALL 𝼀 args={}``: U+1DF00 is a word char in
    Python 3.11's Unicode 14 tables but not Java 17's Unicode 13) —
    explicit classes are engine- and version-independent."""
    import re

    return re.sub(r"\(\?P<\w+>", "(", regex)


def extract_builtin(
    df: DataFrame, text_col: str = "text", patterns: tuple[Pattern, ...] = PATTERNS
) -> DataFrame:
    """Registry extraction with built-in expressions only — one
    ``regexp_extract`` per (pattern, group), dispatched by the classify
    columns. Same output contract as :func:`extract`; equivalence is
    asserted by ``tests/test_extract_equivalence.py``.

    ~10× the pandas-UDF path on this box (whole-stage codegen, no Arrow
    round-trip). The UDF path stays the default because the registry
    is *data* there (new patterns without plan changes, arbitrary
    Python-regex features); this path compiles the registry into the
    plan — right when the registry is static and throughput is king.
    """
    t = F.col(text_col)
    cls, ver = F.col("pattern_class"), F.col("version")

    matched = F.lit(False)
    for p in patterns:
        matched = F.when((cls == p.pattern_class) & (ver == p.version), t.rlike(_java_rx(p.regex))).otherwise(matched)

    group_cols = []
    for g in all_groups(patterns):
        expr = F.lit(None).cast("string")
        for p in patterns:
            if g in p.groups:
                idx = _group_index(p.regex, g)
                expr = F.when(
                    (cls == p.pattern_class) & (ver == p.version) & t.rlike(_java_rx(p.regex)),
                    F.regexp_extract(t, _java_rx(p.regex), idx),
                ).otherwise(expr)
        group_cols.append(expr.alias(g))

    repeats = F.lit(None).cast("array<array<string>>")
    for p in patterns:
        if not p.repeat_group:
            continue
        n_fields = len(p.repeat_fields)
        parts = [
            F.regexp_extract_all(t, F.lit(p.repeat_group), i + 1) for i in range(n_fields)
        ]
        zipped = F.zip_with(parts[0], parts[1], lambda a, b: F.array(a, b)) if n_fields == 2 else F.transform(parts[0], lambda a: F.array(a))
        repeats = F.when(
            (cls == p.pattern_class) & (ver == p.version) & t.rlike(_java_rx(p.regex)), zipped
        ).otherwise(repeats)

    return (
        df.withColumn("matched", matched)
        .withColumn("extracted", F.struct(*group_cols))
        .withColumn("repeats", repeats)
    )


def parse_builtin(
    df: DataFrame, text_col: str = "text", patterns: tuple[Pattern, ...] = PATTERNS
) -> DataFrame:
    """classify + extract_builtin (the all-JVM pipeline variant)."""
    return extract_builtin(classify(df, text_col, patterns), text_col, patterns)
