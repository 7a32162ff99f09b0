"""Sketch-driven skew handling: detect hot keys cheaply, salt ONLY them.

AQE's skew-join splitting (pinned in ``tests/test_skew.py``) repairs a
skewed SHUFFLE JOIN at runtime, but it can't help when the skewed key
feeds a non-combinable aggregation state (``collect_list`` of a hot
conversation's turns) or when the plan isn't a sort-merge join. The
production pattern there is hot-key-only salting:

1. one cheap pass over just the key column estimates the heavy hitters
   (``approx_top_k`` — a mergeable frequency sketch, bytes of state,
   map-side combined like any aggregate);
2. the hot-key list (tiny, driver-side) splits the fact into hot/cold;
3. cold keys take the plain plan — map-side combine stays intact for
   the long tail (salting EVERYTHING would multiply its partial-agg
   state by salt_buckets, see ``operators/aggregate.py``);
4. hot keys get salted: aggregation re-merges partials, joins
   replicate the (small) build side once per salt bucket.

Frequency estimates only steer the plan — a false positive costs a few
replicated dim rows, a false negative leaves one key on the plain
path; row-level results are exact either way, which is what lets the
contract query oracle against a plain SQL join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def heavy_hitters(
    df: DataFrame, key: str, k: int = 20, min_share: float = 0.001
) -> list:
    """Estimated hot values of ``key``: the top-``k`` sketch entries
    whose share of all rows is at least ``min_share``. One narrow pass,
    no shuffle of the data — the sketch is the only thing reduced."""
    quoted = "`%s`" % key.replace("`", "``")
    row = df.agg(
        F.expr(f"approx_top_k({quoted}, {int(k)})").alias("top"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    if not row["n"]:
        return []
    return [e["item"] for e in row["top"] if e["count"] / row["n"] >= min_share]


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 16,
    hot_keys: list | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with hot-key-only salting. ``dim`` must be the small
    side (it is replicated ``salt_buckets``-fold for hot keys). With
    ``hot_keys=None`` they are sketch-detected from ``fact``. Exact:
    every fact row joins exactly once per matching dim row, salted or
    not. Only ``inner`` and ``left`` (fact-preserving) joins are
    supported: a right/full join against the salt-replicated dim would
    emit one spurious unmatched row per empty (hot key, salt) bucket."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if hot_keys is None:
        hot_keys = heavy_hitters(fact, key)
    if not hot_keys:
        return fact.join(F.broadcast(dim), key, how)
    hot = F.col(key).isin(hot_keys)
    # cold path: plain broadcast join, untouched
    cold = fact.filter(~hot | F.col(key).isNull()).join(F.broadcast(dim), key, how)
    # hot path: spread each hot key's rows over salt buckets; replicate
    # the dim row once per bucket so every (key, salt) pair still meets
    f_hot = fact.filter(hot).withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets)),
    )
    d_hot = (
        dim.filter(F.col(key).isin(hot_keys))
        .withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])))
    )
    joined_hot = f_hot.join(F.broadcast(d_hot), [key, "_salt"], how).drop("_salt")
    return cold.unionByName(joined_hot)


def salted_collect(
    df: DataFrame,
    key: str,
    order_col: str,
    value_col: str,
    salt_buckets: int = 16,
    hot_keys: list | None = None,
) -> DataFrame:
    """Per-key ordered value list under skew — the transcript-assembly
    shape, where a plain ``collect_list`` shuffles every row of the hot
    conversation to ONE reducer. Hot keys pre-combine per (key, salt):
    the first (balanced) shuffle leaves each reducer ~1/salt_buckets of
    the hot key's rows to sort and pack, and the second shuffle moves
    ``salt_buckets`` packed slices per hot key instead of raw rows.
    The final per-key array is still one row (that's the operation's
    contract); what salting removes is the single-reducer row-sort
    bottleneck. Cold keys keep the plain single-shuffle plan. Output:
    ``key, vals`` ordered by ``order_col`` (ties broken by value for
    determinism)."""
    if hot_keys is None:
        hot_keys = heavy_hitters(df, key)
    pair = F.struct(F.col(order_col), F.col(value_col))

    def ordered_vals(c):
        return F.transform(F.array_sort(c), lambda s: s[value_col])

    # NULL keys always take the plain path: isin() is NULL (not False)
    # for NULL inputs, so a bare ~isin filter would silently drop the
    # NULL-key group the plain groupBy contract keeps
    plain = (
        df.filter(
            (~F.col(key).isin(hot_keys)) | F.col(key).isNull()
            if hot_keys
            else F.lit(True)
        )
        .groupBy(key)
        .agg(ordered_vals(F.collect_list(pair)).alias("vals"))
    )
    if not hot_keys:
        return plain
    hot = (
        df.filter(F.col(key).isin(hot_keys))
        .withColumn(
            "_salt",
            F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets)),
        )
        .groupBy(key, "_salt")
        .agg(F.array_sort(F.collect_list(pair)).alias("_slice"))
        .groupBy(key)
        .agg(ordered_vals(F.flatten(F.collect_list("_slice"))).alias("vals"))
    )
    return plain.unionByName(hot)
