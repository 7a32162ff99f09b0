"""Z-order (Morton-curve) clustering for multi-column file skipping.

A global ``sort_by=[x]`` write makes min/max pruning sharp on ``x``
and useless on every other column — each file still spans the whole
``y`` domain. Interleaving the bits of per-column quantized buckets
into one Morton key and range-clustering on THAT gives every file a
small hyper-rectangle of the (x, y, ...) space, so range predicates on
ANY of the participating columns prune most files (≈ s^(1/d) of files
survive a selectivity-s predicate on one of d dimensions, vs 1.0 for
the non-sorted ones under a linear sort). This is Iceberg's/Delta's
``rewrite_data_files(strategy => 'sort', sort_order => zorder(...))``
re-expressed as pure Catalyst column expressions — quantize with
``width_bucket``, interleave with shift/or, no UDF anywhere.

Quantization uses the GLOBAL min/max of each column (one small agg on
the driver before the shuffle). Equi-width buckets are the standard
engine choice (Delta OSS does range_partition_id; Iceberg quantizes
similarly); heavy skew in a column degrades its pruning gracefully —
correctness never depends on the bucketing, only on the recorded
min/max stats.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F

#: bits per dimension; 2 dims x 8 bits = 16-bit Morton keys — plenty
#: of distinct cells relative to realistic file counts (a table would
#: need >65k files before key granularity caps pruning)
BITS = 8


def _bucket(col: str, lo: float, hi: float, bits: int) -> Column:
    """Equi-width bucket index in [0, 2**bits) as a long. width_bucket
    returns 0 below lo and n+1 above hi; clamping keeps NULL-free
    domains total (NULL inputs bucket to 0 — they sort first, and their
    file stats simply exclude them from min/max)."""
    n = 2**bits
    wb = F.width_bucket(
        F.col(col).cast("double"), F.lit(float(lo)), F.lit(float(hi)), F.lit(n)
    )
    return F.coalesce(
        F.least(F.greatest(wb - 1, F.lit(0)), F.lit(n - 1)), F.lit(0)
    ).cast("long")


def zvalue(df: DataFrame, cols: list[str], bits: int = BITS) -> Column:
    """The Morton key: bit ``i`` of column ``j``'s bucket lands at
    position ``i * len(cols) + j``. Pure shift/and/or expression tree —
    whole-stage-codegen friendly, no python in the hot path."""
    if len(cols) < 2:
        raise ValueError("zorder needs >= 2 columns (use sort_by for one)")
    # fail fast driver-side: the Morton bucket is an equi-width cut of
    # a NUMERIC domain; a string key would die executor-side in the
    # cast with an opaque CAST_INVALID_INPUT (numbers, timestamps, and
    # dates all cast to double meaningfully — strings do not)
    by_name = {f.name: f.dataType.typeName() for f in df.schema.fields}
    numeric_ok = {
        "byte", "short", "integer", "long", "float", "double", "decimal",
        "timestamp", "timestamp_ntz", "date", "boolean",
    }
    bad = [
        c for c in cols
        if by_name.get(c, "").split("(")[0] not in numeric_ok and c in by_name
    ]
    if bad:
        raise ValueError(
            f"zorder columns must have numeric/temporal types; "
            f"{[(c, by_name[c]) for c in bad]} do not (hash or dictionary-"
            "encode string keys into a numeric column first)"
        )
    # keep every interleaved bit inside the 63 value bits of a long:
    # position (bits-1)*d + (d-1) = bits*d - 1 must stay < 63, else the
    # top bucket bit lands in the sign bit (max-bucket rows sort FIRST)
    # and beyond that Java's shiftleft wraps the shift amount mod 64
    bits = max(1, min(bits, 62 // len(cols)))
    ranges = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"lo_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"hi_{c}") for c in cols],
    ).collect()[0]
    d = len(cols)
    parts: list[Column] = []
    for j, c in enumerate(cols):
        lo, hi = ranges[f"lo_{c}"], ranges[f"hi_{c}"]
        if lo is None or hi is None or hi <= lo:
            # degenerate/constant column contributes nothing to ordering
            continue
        b = _bucket(c, lo, hi, bits)
        for i in range(bits):
            parts.append(
                F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), i * d + j)
            )
    if not parts:
        return F.lit(0).cast("long")
    return reduce(Column.bitwiseOR, parts)


def cluster_zorder(
    df: DataFrame, cols: list[str], bits: int = BITS, n_partitions: int | None = None
) -> DataFrame:
    """Range-cluster ``df`` by its Morton key: one range exchange (same
    shuffle count as a linear sort) + within-task sort, then the key is
    dropped — downstream writes inherit the clustering.
    ``n_partitions`` pins the output file count (compaction passes a
    size-derived target); None keeps the session default."""
    z = df.withColumn("_z", zvalue(df, cols, bits))
    z = (
        z.repartitionByRange(n_partitions, "_z")
        if n_partitions is not None
        else z.repartitionByRange("_z")
    )
    return z.sortWithinPartitions("_z").drop("_z")
