"""Point-in-time (AS-OF) joins: match each fact row to the single
dimension version active at the fact's event time (greatest
``dim_ts <= fact_ts`` per key) — how a versioned registry / rate table
/ SCD dimension is consulted from the fact side. The reference has no
temporal join (all its lookups are hash-equi, SURVEY §2.3); this is
the temporal generalization a revisioned-registry pipeline needs.

Two implementations with different scale envelopes:

* :func:`asof_lookup` — dim is broadcast-sized (every dim in this
  engine is): the whole join compiles to a PURE EXPRESSION over a
  literal ``map(key -> sorted array<struct>)``: filter the key's
  version array to ``dim_ts <= ts``, take ``array_max``. Zero
  shuffle, zero join, whole-stage-codegen'd — strictly cheaper than a
  broadcast join + per-fact version fan-out + rank.
* :func:`asof_join_backward` — both sides large: merge-based. Union
  facts and dim rows, one window per key ordered by (ts, dim-first),
  carry dim attributes forward with ``last(ignorenulls)``. ONE shuffle
  on the key, no fact×versions intermediate (a join on
  ``dim_ts <= ts`` + rank explodes with version count). Caveat: the
  window partitions by key — right when key cardinality is high
  (conv_id, user_id); for a handful of hot keys use
  :func:`asof_lookup` instead (low-cardinality keys imply a
  broadcastable dim anyway).

Both use backward/inclusive semantics (a fact AT a version's effective
instant sees that version), matching DuckDB's native ``ASOF JOIN`` on
``fact.ts >= dim.ts`` — which is exactly the oracle used in parity.
Facts before the first version carry NULLs (left join).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_lookup(
    ts: Column,
    versions: dict[str, list[tuple[int, int]]],
    key: Column,
) -> Column:
    """Expression-side as-of lookup against a literal version table.

    ``versions`` maps key → [(dim_ts, attr), ...]; returns a struct
    column ``(dim_ts, attr)`` of the latest version with
    ``dim_ts <= ts`` for the row's key, or NULL if none. The struct
    ``array_max`` is ordered by its first field, so ``dim_ts`` must
    lead the struct (unique per key by construction).
    """
    pairs = []
    for k, vers in versions.items():
        arr = F.array(
            *[
                F.struct(
                    F.lit(int(t)).alias("dim_ts"), F.lit(int(a)).alias("attr")
                )
                for t, a in sorted(vers)
            ]
        )
        pairs += [F.lit(k), arr]
    vmap = F.create_map(*pairs)
    cand = F.filter(vmap[key], lambda s: s["dim_ts"] <= ts)
    return F.when(F.size(cand) > 0, F.array_max(cand))


def asof_join_backward(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    fact_ts: str,
    dim_ts: str,
    dim_cols: list[str],
) -> DataFrame:
    """Merge-based as-of join (large-dim path): facts gain ``dim_ts``
    and ``dim_cols`` from the latest dim row at or before ``fact_ts``
    per ``key``. Column names in ``dim_cols`` (and ``dim_ts``) must not
    collide with fact columns."""
    clash = {"_is_dim", "_ats", "_dimrow"} & set(facts.columns) | (
        {"_is_dim", "_ats", "_dimrow"} & set(dim.columns)
    )
    if clash:
        raise ValueError(f"reserved column names in input: {sorted(clash)}")
    f = facts.withColumn("_is_dim", F.lit(0)).withColumn("_ats", F.col(fact_ts))
    d = (
        dim.select(key, dim_ts, *dim_cols)
        .withColumn("_is_dim", F.lit(1))
        .withColumn("_ats", F.col(dim_ts))
    )
    # align both sides to one column set: missing columns become typed NULLs
    for c in facts.columns:
        if c not in d.columns:
            d = d.withColumn(c, F.lit(None).cast(facts.schema[c].dataType))
    for c in (dim_ts, *dim_cols):
        if c not in f.columns:
            f = f.withColumn(c, F.lit(None).cast(dim.schema[c].dataType))
    u = f.unionByName(d.select(*f.columns))
    # dim row sorts BEFORE a fact at the same instant → inclusive match
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_ats").asc(), F.col("_is_dim").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # carry the matched version as ONE struct, not per-column: a struct
    # of a dim row is non-null even when every attribute in it is NULL,
    # so a version with a genuinely NULL attr carries that NULL instead
    # of last(ignorenulls) resurrecting an older version's value
    # (mixed-version rows)
    dim_row = F.last(
        F.when(F.col("_is_dim") == 1, F.struct(*[F.col(c) for c in (dim_ts, *dim_cols)])),
        ignorenulls=True,
    ).over(w)
    out = u.select(*facts.columns, "_is_dim", dim_row.alias("_dimrow"))
    out = out.select(
        *facts.columns,
        "_is_dim",
        *[F.col(f"_dimrow.{c}").alias(c) for c in (dim_ts, *dim_cols)],
    )
    return out.filter(F.col("_is_dim") == 0).drop("_is_dim")


def range_lookup(
    ts: Column,
    intervals: dict[str, list[tuple[int, int, int]]],
    key: Column,
) -> Column:
    """Expression-side range (interval-containment) join against a
    literal dim of NON-OVERLAPPING intervals: ``intervals`` maps key →
    [(start_us, end_us, attr), ...]; returns the struct of the single
    interval containing ``ts`` (``start <= ts < end``), else NULL.
    Zero shuffle, codegen'd — the same scale envelope as
    :func:`asof_lookup` (a broadcast-sized interval dim).

    For OVERLAPPING intervals return-all is the general range join:
    explode the filtered array instead of taking its head. For a dim
    too big to broadcast, bucket both sides by (key, coarse time
    bucket) and equi-join on the bucket before the residual range
    predicate — never a nested-loop over the fact table.
    """
    pairs = []
    for k, ivs in intervals.items():
        arr = F.array(
            *[
                F.struct(
                    F.lit(int(s)).alias("start_us"),
                    F.lit(int(e)).alias("end_us"),
                    F.lit(int(a)).alias("attr"),
                )
                for s, e, a in sorted(ivs)
            ]
        )
        pairs += [F.lit(k), arr]
    vmap = F.create_map(*pairs)
    cand = F.filter(vmap[key], lambda s: (s["start_us"] <= ts) & (ts < s["end_us"]))
    return F.when(F.size(cand) > 0, F.element_at(cand, 1))
