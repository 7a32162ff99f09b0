"""Declarative data-quality expectations, compiled to ONE aggregate pass.

The write-audit-publish gate (``plans/pipeline.py::default_audit``,
reference analog: the ad-hoc row checks sprinkled through
``src/app.py``'s parse loop) takes a callable ``df -> violations``.
This module lets a pipeline declare its contract as DATA instead of
code — the dbt-tests / Great-Expectations shape — and compiles the
whole suite into a single Spark aggregate job, so auditing a staged
100 TB snapshot costs one scan regardless of how many checks it
carries. Referential checks (the one shape an aggregate can't express)
run as one broadcast anti-join each, against dimension-sized frames.

Spec grammar (plain dicts, JSON-serializable except ``dim``)::

    {"expect": "row_count_between", "min": 1}                  # and/or "max"
    {"expect": "not_null", "col": "conv_id"}                   # ratio=0.0
    {"expect": "not_null", "col": "tool", "max_null_ratio": 0.9}
    {"expect": "unique", "cols": ["conv_id", "turn_idx"]}
    {"expect": "accepted_values", "col": "role",
     "values": ["user", "assistant", "tool"]}                  # nulls violate
    {"expect": "between", "col": "turn_idx", "lo": 0}          # and/or "hi"
    {"expect": "matches_regex", "col": "conv_id", "pattern": r"^conv-"}
    {"expect": "referential", "col": "route", "dim": routes_df,
     "dim_col": "route"}                                       # nulls pass

Ratio-tolerant checks accept ``max_violation_ratio`` (``max_null_ratio``
for not_null); the default is zero tolerance. ``evaluate`` returns a
full per-check report (observed counts included — the audit artifact
worth recording in snapshot lineage); ``violations`` / ``audit`` adapt
it to the write-audit-publish protocol.

Scale notes: every aggregate expression rides the same single pass
(map-side combined, no shuffle beyond the final reduce); ``unique``
uses exact count_distinct over a struct of the key columns — swap for
``approx_count_distinct`` at 100 TB if an exact duplicate count is not
worth its shuffle, the report's ``observed`` semantics are unchanged.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_KINDS = (
    "row_count_between", "not_null", "unique", "accepted_values",
    "between", "matches_regex", "referential",
)


def _check(spec: dict, i: int) -> None:
    kind = spec.get("expect")
    if kind not in _KINDS:
        raise ValueError(f"spec {i}: unknown expect {kind!r}; one of {_KINDS}")
    if kind == "row_count_between":
        if spec.get("min") is None and spec.get("max") is None:
            raise ValueError(f"spec {i}: row_count_between needs min and/or max")
    elif kind == "unique":
        if not spec.get("cols") or not isinstance(spec["cols"], (list, tuple)):
            raise ValueError(f"spec {i}: unique needs cols as a list")
    elif kind == "referential":
        if not all(k in spec for k in ("col", "dim", "dim_col")):
            raise ValueError(f"spec {i}: referential needs col, dim, dim_col")
        if isinstance(spec["dim"], str):
            raise ValueError(
                f"spec {i}: referential dim is the string {spec['dim']!r} — "
                "resolve table names to DataFrames first via "
                "resolve_dims(specs, catalog.read_table)"
            )
    elif "col" not in spec:
        raise ValueError(f"spec {i}: {kind} needs col")
    if kind == "between" and spec.get("lo") is None and spec.get("hi") is None:
        raise ValueError(f"spec {i}: between needs lo and/or hi")
    if kind == "accepted_values" and (
        not spec.get("values") or not isinstance(spec["values"], (list, tuple))
    ):
        # a bare string would silently become per-character membership
        raise ValueError(f"spec {i}: accepted_values needs values as a list")
    if kind == "matches_regex" and not spec.get("pattern"):
        raise ValueError(f"spec {i}: matches_regex needs pattern")


def _violation_flag(spec: dict):
    """Per-row violation flag (NULL-safe: the flag itself is never
    null) for the row-shaped checks."""
    kind, col = spec["expect"], F.col(spec.get("col", ""))
    if kind == "not_null":
        return col.isNull()
    if kind == "accepted_values":
        return ~F.coalesce(col.isin(list(spec["values"])), F.lit(False))
    if kind == "between":
        ok = F.lit(True)
        if spec.get("lo") is not None:
            ok = ok & (col >= F.lit(spec["lo"]))
        if spec.get("hi") is not None:
            ok = ok & (col <= F.lit(spec["hi"]))
        return ~F.coalesce(ok, F.lit(False))  # null value violates a bound
    if kind == "matches_regex":
        return ~F.coalesce(col.rlike(spec["pattern"]), F.lit(False))
    raise AssertionError(kind)


def evaluate(df: DataFrame, specs: list[dict]) -> list[dict]:
    """Run every expectation; return one report row per spec:
    ``{"expect", "detail", "passed", "observed"}``. All aggregate-
    expressible checks share ONE job; each referential check adds one
    broadcast anti-join job."""
    specs = list(specs)
    for i, s in enumerate(specs):
        _check(s, i)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, s in enumerate(specs):
        kind = s["expect"]
        if kind in ("not_null", "accepted_values", "between", "matches_regex"):
            aggs.append(
                F.sum(_violation_flag(s).cast("long")).alias(f"__v{i}")
            )
        elif kind == "unique":
            aggs.append(
                F.count_distinct(F.struct(*s["cols"])).alias(f"__v{i}")
            )
    row = df.agg(*aggs).collect()[0]
    n = row["__n"]

    report = []
    for i, s in enumerate(specs):
        kind = s["expect"]
        if kind == "row_count_between":
            lo, hi = s.get("min"), s.get("max")
            passed = (lo is None or n >= lo) and (hi is None or n <= hi)
            report.append({
                "expect": kind, "detail": f"[{lo}, {hi}]",
                "passed": passed, "observed": n,
            })
        elif kind == "unique":
            dupes = n - row[f"__v{i}"]
            report.append({
                "expect": kind, "detail": ",".join(s["cols"]),
                "passed": dupes == 0, "observed": dupes,
            })
        elif kind == "referential":
            missing = (
                df.select(F.col(s["col"]).alias("__k"))
                .where(F.col("__k").isNotNull())
                .join(
                    F.broadcast(
                        s["dim"].select(F.col(s["dim_col"]).alias("__k")).distinct()
                    ),
                    "__k", "left_anti",
                )
                .count()
            )
            report.append({
                "expect": kind, "detail": f"{s['col']} in dim.{s['dim_col']}",
                "passed": missing == 0, "observed": missing,
            })
        else:
            bad = row[f"__v{i}"] or 0
            tol_key = "max_null_ratio" if kind == "not_null" else "max_violation_ratio"
            tol = float(s.get(tol_key, 0.0))
            # compare as a ratio so bad/n == tol passes exactly
            # (bad <= tol*n fails at the boundary: 0.29*100 < 29.0)
            passed = bad == 0 or (n > 0 and bad / n <= tol)
            report.append({
                "expect": kind,
                "detail": s.get("col", "") + (
                    f" ~ /{s['pattern']}/" if kind == "matches_regex" else ""
                ),
                "passed": passed, "observed": bad,
            })
    return report


def resolve_dims(specs: list[dict], lookup) -> list[dict]:
    """Resolve referential specs whose ``dim`` is a TABLE NAME (the
    only JSON-expressible form) into DataFrames via ``lookup`` (e.g.
    ``catalog.read_table``). The one place every entry point — CLI
    ``audit``, the spark-submit ``--audit-suite`` gate, notebooks —
    shares, so dim-resolution semantics can't silently diverge."""
    return [
        {**sp, "dim": lookup(sp["dim"])}
        if sp.get("expect") == "referential" and isinstance(sp.get("dim"), str)
        else sp
        for sp in specs
    ]


def violations(df: DataFrame, specs: list[dict]) -> list[str]:
    """Failed checks as human strings — the write-audit-publish
    protocol (empty list ⇒ publish)."""
    return [
        f"{r['expect']}({r['detail']}): observed {r['observed']}"
        for r in evaluate(df, specs) if not r["passed"]
    ]


def audit(specs: list[dict]) -> Callable[[DataFrame], list[str]]:
    """An audit callable for ``run_pipeline(audit=...)`` /
    ``write_table(staged=True)`` gates: the declared suite, evaluated
    against the STAGED snapshot before the pointer flips."""
    specs = list(specs)
    for i, s in enumerate(specs):
        _check(s, i)

    def _audit(df: DataFrame) -> list[str]:
        return violations(df, specs)

    return _audit
