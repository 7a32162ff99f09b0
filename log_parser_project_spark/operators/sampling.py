"""Deterministic sampling / splitting / packing for training-data
pipelines (beyond the reference — the dataset-prep ops a 100 TB
text-corpus pipeline needs next to dedup/quality/langid).

All three ops are *content-deterministic*: driven by md5 of a key
column, never by RNG or row position, so results are identical across
partitionings, parallelism levels, and engines (the same invariance
the generator relies on for the two-parallelism benchmark). md5 is
used instead of xxhash64 because every engine agrees on it — the
DuckDB oracles reproduce the splits bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket(col, n_buckets: int = 100):
    """Stable [0, n_buckets) bucket from md5(col) — the first 8 hex
    digits as an integer. Engine-portable (DuckDB:
    ``CAST('0x' || substr(md5(c),1,8) AS BIGINT) % n``)."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("long")
        % n_buckets
    )


def hash_split(
    df: DataFrame, key: str, splits: dict[str, int], n_buckets: int = 100
) -> DataFrame:
    """Assign every row to a named split (train/val/test...) by hash
    bucket of ``key``. ``splits`` maps name → bucket count; counts must
    sum to ``n_buckets``. Deterministic, leakage-free (all rows of one
    key land in one split), and stable under re-runs and repartitions.
    """
    if sum(splits.values()) != n_buckets:
        raise ValueError(f"split weights {splits} must sum to {n_buckets}")
    b = hash_bucket(F.col(key), n_buckets)
    expr = None
    lo = 0
    for name, width in splits.items():
        cond = (b >= lo) & (b < lo + width)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo += width
    return df.withColumn("split", expr)


def deterministic_sample(df: DataFrame, key: str, rate_pct: int) -> DataFrame:
    """Keep ~rate_pct% of rows, chosen by content hash — the reservoir-
    free, rerun-stable sample (same rows every run, any cluster size)."""
    return df.filter(hash_bucket(F.col(key), 100) < rate_pct)


def pack_sequences(
    df: DataFrame,
    group: str | list[str],
    order: str,
    size_col: str,
    max_len: int,
) -> DataFrame:
    """Contiguous-fill sequence packing: within each ``group``, walk
    rows in ``order`` and assign each document to the bin its running
    size lands in (``bin = floor((cumsum - size) / max_len)``), plus
    its offset inside the bin. The standard streaming approximation of
    bin packing — exact, order-deterministic, one window, no shuffle
    beyond the groupBy exchange (vs. greedy best-fit, which needs
    sequential state and cannot parallelize per group).
    """
    w = Window.partitionBy(*([group] if isinstance(group, str) else group)).orderBy(order)
    cum = F.sum(size_col).over(w)
    start = (cum - F.col(size_col)).cast("long")
    return (
        df.withColumn("pack_bin", F.floor(start / max_len).cast("int"))
        .withColumn("pack_offset", (start % max_len).cast("long"))
    )
