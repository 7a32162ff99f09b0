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


def stratified_sample_exact(
    df: DataFrame,
    stratum: str,
    key: str,
    pct: int,
    bucket_hex_chars: int = 2,
) -> DataFrame:
    """Exact per-stratum quota sampling via distributed order statistics.

    Keeps exactly ``quota_s = ceil(n_s * pct / 100)`` rows per stratum —
    the first ``quota_s`` rows of the stratum in the deterministic total
    order ``(md5(key) asc, key asc)``. A naive ``row_number()`` over the
    whole stratum would sort every row of a hot stratum in ONE task
    (straggler/OOM for a dominant language at 100 TB); instead selection
    is split into two bounded phases:

      1. the bucket id is the first ``bucket_hex_chars`` hex chars of the
         ordering hash — a string PREFIX, so bucket-major order is
         *identical* to plain md5 order (a ``% n`` bucket would take the
         hash's low bits and scramble the order); ``groupBy(stratum,
         bucket).count()`` → strata × 16^chars rows (driver-small); a
         running prefix sum per stratum positions each bucket, and the
         stratum total yields the quota.
      2. broadcast the (prefix, quota) plan back; ``row_number()`` only
         WITHIN ``(stratum, bucket)`` — partition size ≈ n_s/16^chars —
         and keep rows where ``prefix + local_rank <= quota``.

    A single-window ``row_number() OVER (PARTITION BY stratum ORDER BY
    md5(key), key)`` oracle reproduces the selection bit-for-bit, and
    the selected set is invariant to parallelism, input partitioning,
    AND ``bucket_hex_chars`` (deeper prefixes only refine the same
    total order).
    """
    h = F.md5(F.col(key).cast("string"))
    return ordered_stratified_select(
        df.withColumn("_h", h),
        stratum=stratum,
        order_col=F.col("_h"),
        key=key,
        pct=pct,
        bucket_col=F.substring("_h", 1, bucket_hex_chars),
    ).drop("_h")


def ordered_stratified_select(
    df: DataFrame,
    stratum: str,
    order_col,
    key: str,
    pct: int,
    bucket_col,
    keep: str = "first",
) -> DataFrame:
    """Distributed order-statistics selection, generalized: per stratum,
    select (``keep='first'``) or drop (``keep='drop_first'``) exactly
    ``ceil(n_s * pct / 100)`` rows in the total order
    ``(order_col asc, key asc)`` — with no whole-stratum sort.

    ``bucket_col`` must be a coarse MONOTONE function of ``order_col``
    (a hex prefix of an ordering hash for sampling; ``floor(score*K)``
    for score gates): bucket-major order then equals the flat order, so
    per-(stratum, bucket) counts + a broadcast prefix-sum plan position
    every bucket, and the only per-row sort is the rank WITHIN a
    bucket. The stratum join is null-safe (a NULL stratum selects at
    quota like any other).
    """
    if keep not in ("first", "drop_first"):
        raise ValueError(f"keep must be 'first' or 'drop_first', got {keep!r}")
    tagged = df.withColumn("_o", order_col).withColumn("_b", bucket_col)
    w_pre = (
        Window.partitionBy(stratum).orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = Window.partitionBy(stratum)
    plan = (
        tagged.groupBy(stratum, "_b")
        .agg(F.count(F.lit(1)).alias("_c"))
        .select(
            stratum,
            "_b",
            F.coalesce(F.sum("_c").over(w_pre), F.lit(0)).alias("_prefix"),
            # integer ceil-div quota: exact, engine-portable
            F.floor((F.sum("_c").over(w_all) * pct + 99) / F.lit(100))
            .cast("long")
            .alias("_quota"),
        )
    )
    w_loc = Window.partitionBy(stratum, "_b").orderBy("_o", key)
    pl = plan.select(
        F.col(stratum).alias("_ps"), F.col("_b").alias("_pb"), "_prefix", "_quota"
    )
    sel = F.col("_prefix") + F.col("_r") <= F.col("_quota")
    return (
        tagged.join(
            F.broadcast(pl),
            F.col(stratum).eqNullSafe(F.col("_ps")) & (F.col("_b") == F.col("_pb")),
        )
        .withColumn("_r", F.row_number().over(w_loc))
        .filter(sel if keep == "first" else ~sel)
        .drop("_o", "_b", "_ps", "_pb", "_prefix", "_quota", "_r")
    )


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


def domain_mix(
    df: DataFrame,
    stratum: str,
    key: str,
    temperature: float = 0.5,
    target_frac_pct: int = 50,
) -> DataFrame:
    """Temperature-flattened domain mixture sampling — the corpus-
    rebalancing step of a multi-source training pipeline (the
    ``p_d ∝ c_d^τ`` resampling popularized by multilingual/multi-corpus
    LM training): with domain counts ``c_d``, the target share of
    domain ``d`` is ``c_d^τ / Σ c^τ`` (τ < 1 upweights small domains),
    the total kept is ``target_frac_pct`` percent of the corpus, and
    each domain is downsampled to rate
    ``min(1, frac · total · c_d^τ / (Σ c^τ · c_d))``.

    Selection is *content-deterministic*, never RNG: a row is kept iff
    ``hash32(key) · 10⁹ < rate_e9 · 2³²`` where ``hash32`` is the first
    8 md5 hex digits and ``rate_e9`` the rate rounded to integer
    nanounits — the comparison is pure BIGINT arithmetic, so the sample
    is identical across partitionings, parallelism levels, and engines
    (the only float in the pipeline is the rate itself, quantized to
    1e-9 before use). Returns the kept rows plus their ``rate_e9``.

    Plan: domain counts are ONE dim-sized aggregate shuffle; the share
    normalization runs as an unpartitioned window over that dim-sized
    frame (never corpus-sized); rates broadcast-join back onto the
    fact; the filter is a codegen'd expression. Skew-free by
    construction — no shuffle is keyed by the (zipf-ish) domain.
    """
    cnt = df.groupBy(F.col(stratum).alias("_s")).agg(F.count(F.lit(1)).alias("_c"))
    w = Window.partitionBy()
    tau = float(temperature)
    pw = F.pow(F.col("_c").cast("double"), F.lit(tau))
    rate = F.least(
        F.lit(1.0),
        F.lit(target_frac_pct / 100.0)
        * F.sum("_c").over(w).cast("double")
        * pw
        / (F.sum(pw).over(w) * F.col("_c").cast("double")),
    )
    rates = cnt.select(
        "_s",
        F.floor(rate * 1000000000.0 + F.lit(0.5)).cast("long").alias("rate_e9"),
    )
    h32 = F.conv(F.substring(F.md5(F.col(key).cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    return (
        df.join(F.broadcast(rates), F.col(stratum).eqNullSafe(F.col("_s")))
        .filter(h32 * F.lit(1000000000) < F.col("rate_e9") * F.lit(4294967296))
        .drop("_s")
    )


def chunk_documents(
    df: DataFrame,
    size: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Overlapping token-window chunking — the context-window prep op
    (RAG passages / LM training windows with cross-boundary overlap,
    stride < size). One row per chunk: (id, chunk_idx, n_tokens,
    chunk). A partial tail window is kept only when it contains tokens
    the previous window did NOT reach — a tail that is a strict suffix
    of its predecessor would seed the training set with verbatim
    duplicate passages, the artifact the dedup operators exist to
    remove. No suffix is ever dropped (the last kept window always
    ends at the final token); a doc shorter than ``size`` yields
    exactly one chunk. Pure expressions — tokenize once into a real
    column (HOF lambdas defeat CSE, the ``word_shingles`` 19× note),
    then one ``sequence(step=stride)`` explode; no shuffle at all:
    chunking is embarrassingly parallel and Catalyst keeps it in the
    scan stage."""
    if not (0 < stride <= size):
        raise ValueError(f"need 0 < stride ({stride}) <= size ({size})")
    from .text import tokens

    toks = F.col("__toks")
    n = F.size(toks)
    # window starts 1, 1+stride, …; keep s iff it starts a non-empty
    # window AND (it is the first, or the previous window ended before
    # the document end — i.e. this window adds unseen tokens:
    # (s-stride)+size-1 < n  ⟺  s <= n - size + stride)
    starts = F.filter(
        F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(stride)),
        lambda s: (s <= n) & ((s == 1) | (s <= n - size + stride)),
    )
    start = F.col("__start")
    return (
        df.select(F.col(id_col), tokens(text_col).alias("__toks"))
        .select(F.col(id_col), toks, F.explode(starts).alias("__start"))
        .select(
            F.col(id_col),
            ((start - 1) / stride).cast("int").alias("chunk_idx"),
            F.least(F.size(toks) - start + 1, F.lit(size)).cast("int").alias("n_tokens"),
            F.concat_ws(" ", F.slice(toks, start, size)).alias("chunk"),
        )
    )


def importance_resample(
    df: DataFrame,
    is_target,
    buckets: int = 512,
    keep_threshold_e4: int = 10_000,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """DSIR-style importance scoring toward a target distribution
    (Xie et al., "Data Selection for Language Models via Importance
    Resampling"), in the exact-integer formulation this engine's
    oracle discipline requires: hashed-unigram bucket frequencies
    stand in for the n-gram feature space, and a document's score is
    the mean per-token target/source frequency ratio in e4 fixed
    point — ``ratio_e4(b) = (cnt_t(b)+1)·R·10⁴ ÷ ((cnt_all(b)+1)·T)``
    (add-one smoothed, integer division, so Spark and DuckDB agree
    bit-for-bit where a float log-likelihood Σ would drift).

    Scale shape: ONE token-explode aggregate builds the bucket table
    (``buckets`` rows — aggregate-sized), which is collected and
    re-emitted as a LITERAL array, so scoring runs as a pure JVM
    higher-order aggregate over each doc's token array: zero joins,
    zero shuffles in the scoring pass. ``keep`` selects docs scoring
    at least ``keep_threshold_e4`` (10 000 ≡ ratio 1.0 — more
    target-like than source-average). Empty docs score no rows (same
    as the SQL formulation); rows where ``is_target`` is NULL count
    as source-only (CASE … ELSE 0 semantics, matching the oracle).

    Ratios are CLIPPED at 10⁹ (``RATIO_CAP_E4`` ≡ ratio 10⁵) — the
    standard importance-weight clipping of DSIR-style selection, and
    what bounds the int64 score sum: without it a tiny target slice
    against a huge corpus makes ``ratio_e4 ≈ R·10⁴/T`` and a long
    document's Σ silently wraps Spark's non-ANSI long while DuckDB
    sums in HUGEINT (parity break). Clipped, the per-doc bound is
    ``n_tokens·10⁹`` — safe below ~9·10⁹ tokens per document.
    """
    from .text import tokens

    RATIO_CAP_E4 = 1_000_000_000

    toks = F.col("__toks")
    bkt = lambda t: hash_bucket(t, buckets)  # noqa: E731
    tok = df.select(
        F.explode(tokens(text_col)).alias("t"),
        F.coalesce(is_target.cast("long"), F.lit(0)).alias("_t"),
    )
    counts = (
        tok.groupBy(bkt(F.col("t")).alias("b"))
        .agg(F.count(F.lit(1)).alias("cnt_all"), F.sum("_t").alias("cnt_t"))
        .collect()
    )
    r_tot = sum(r.cnt_all for r in counts)
    t_tot = sum(r.cnt_t for r in counts)
    if t_tot == 0:
        raise ValueError("importance_resample: target slice has no tokens")
    ratio = [0] * buckets
    for r in counts:
        ratio[r.b] = min(
            (r.cnt_t + 1) * r_tot * 10_000 // ((r.cnt_all + 1) * t_tot),
            RATIO_CAP_E4,
        )
    lit_ratio = F.array(*[F.lit(v) for v in ratio])
    score_sum = F.aggregate(
        toks, F.lit(0).cast("long"),
        lambda acc, t: acc + F.element_at(lit_ratio, (bkt(t) + 1).cast("int")),
    )
    return (
        df.select(F.col(id_col), tokens(text_col).alias("__toks"))
        .filter(F.size(toks) > 0)
        .select(F.col(id_col), F.size(toks).alias("__n"), score_sum.alias("__s"))
        .select(F.col(id_col), F.expr("__s div __n").alias("score_e4"))
        .withColumn("keep", F.col("score_e4") >= keep_threshold_e4)
    )


def plan_shards(
    df: DataFrame,
    key: str,
    size_col,
    target_bytes: int,
    bucket_hex_chars: int = 2,
) -> DataFrame:
    """Size-targeted training-shard assignment (the WebDataset /
    tar-shard layout planner): walk documents in the content-
    deterministic total order ``(md5(key) asc, key asc)`` and assign
    each to ``shard_id = exclusive-byte-prefix-sum DIV target_bytes``
    — sequential fill, every doc wholly in one shard, every shard
    within ``target_bytes + max_doc_bytes``. Content-deterministic ⇒
    the same corpus produces the SAME shards at any parallelism (the
    property that makes shard-level resume/caching sound).

    No global sort: the same two-level distributed-order-statistics
    shape as :func:`ordered_stratified_select` — a hex prefix of the
    ordering hash is a monotone coarse bucket, per-bucket byte totals
    broadcast back as an exclusive prefix plan (16^chars rows), and
    the only per-row window is the byte cumsum WITHIN a bucket.

    Returns ``df`` + ``shard_id`` (monotone from 0; dense when no doc
    exceeds ``target_bytes`` — a doc larger than the target advances
    the byte prefix past whole shard ranges, so the skipped ordinals
    stay empty, e.g. a 3×-target doc at offset 0 fills shard 0 and
    leaves 1–2 unused) + ``shard_pos`` (the doc's byte offset inside
    its shard). Sizes must be non-negative; use ``F.octet_length``
    for byte-true text sizes.
    """
    if target_bytes <= 0:
        raise ValueError(f"target_bytes must be positive, got {target_bytes}")
    h = F.md5(F.col(key).cast("string"))
    tagged = (
        df.withColumn("_h", h)
        .withColumn("_sb", F.substring(F.col("_h"), 1, bucket_hex_chars))
        .withColumn("_sz", size_col.cast("long"))
    )
    w_pre = Window.orderBy("_sb").rowsBetween(Window.unboundedPreceding, -1)
    plan = (
        tagged.groupBy("_sb")
        .agg(F.sum("_sz").alias("_c"))
        .select(
            F.col("_sb").alias("_pb"),
            F.coalesce(F.sum("_c").over(w_pre), F.lit(0)).alias("_bprefix"),
        )
    )
    # explicit ROWS frame: the default RANGE frame treats rows with
    # equal (_h, key) sort values as peers and sums BOTH into each —
    # duplicate key values would then get overlapping byte ranges
    w_loc = (
        Window.partitionBy("_sb")
        .orderBy("_h", key)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.col("_bprefix") + F.sum("_sz").over(w_loc) - F.col("_sz")
    # exact integer shard id: (start - start % t) / t divides exactly,
    # so the double division is representation-exact (quotient is the
    # shard ordinal, far below 2^53) — never floor(long/long) drift
    shard = ((start - start % target_bytes) / target_bytes).cast("long")
    return (
        tagged.join(F.broadcast(plan), F.col("_sb") == F.col("_pb"))
        .withColumn("shard_id", shard)
        .withColumn("shard_pos", (start % target_bytes).cast("long"))
        .drop("_h", "_sb", "_sz", "_pb", "_bprefix")
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    key: str,
    size_col,
    target_bytes: int,
    fmt: str = "json",
) -> dict:
    """Materialize :func:`plan_shards`'s layout: one data file per
    shard under ``path/shard_id=<n>/`` plus a ``_manifest`` dataset
    (per-shard doc count, byte total, and an order-independent 32-bit
    sum checksum over ``md5(key:shard_pos)`` — membership AND byte
    offsets pinned, both recomputable from the shard's own rows plus
    their sizes, so a consumer verifies a shard without reading its
    neighbors) and a driver-side ``_summary.json`` with the corpus
    totals.

    One file per shard by construction: ``repartition(shard_id)``
    hash-colocates every row of a shard into exactly one task before
    the partitioned write, so a task writes ONE file per shard
    directory it owns — P shard files total, never tasks × shards
    (the same write-distribution discipline as the catalog's hash
    mode). Shard count scales with corpus bytes / target, tasks stay
    at the configured shuffle parallelism.
    """
    import json as _json
    import os

    from pyspark import StorageLevel

    planned = plan_shards(df, key, size_col, target_bytes).withColumn(
        "_csum", F.conv(F.substring(F.md5(F.concat_ws(":", F.col(key), F.col("shard_pos"))), 1, 8), 16, 10).cast("long")
    )
    # one plan, three consumers (data write, manifest, totals): persist
    # so the scan + shuffle + prefix windows run once, not three times
    planned = planned.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        (
            planned.drop("_csum")
            .repartition(F.col("shard_id"))
            .sortWithinPartitions("shard_id", "shard_pos")
            .write.partitionBy("shard_id")
            .format(fmt)
            .mode("error")
            .save(path)
        )
        manifest = planned.groupBy("shard_id").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(size_col.cast("long")).alias("shard_bytes"),
            F.sum("_csum").alias("checksum"),
        )
        manifest.repartition(1).write.json(os.path.join(path, "_manifest"))
        totals = manifest.agg(
            F.count(F.lit(1)).alias("n_shards"),
            F.sum("n_docs").alias("n_docs"),
            F.sum("shard_bytes").alias("total_bytes"),
        ).collect()[0]
    finally:
        planned.unpersist()
    summary = {
        "n_shards": int(totals["n_shards"] or 0),
        "n_docs": int(totals["n_docs"] or 0),
        "total_bytes": int(totals["total_bytes"] or 0),
        "target_bytes": int(target_bytes),
        "format": fmt,
    }
    with open(os.path.join(path, "_summary.json"), "w") as f:
        _json.dump(summary, f)
    return summary
