"""Deduplication operators: exact, n-gram Jaccard, MinHash-LSH, SimHash.

The scale story per variant:

* **exact** — one hash-shuffle on the fingerprint; at 100 TB the
  groupBy key is an md5, uniformly distributed → no skew.
* **n-gram Jaccard** — exact pairwise similarity via a shingle
  self-join. Quadratic in the worst case; usable as a verifier at
  small scale and as the *within-bucket* refinement after LSH. The
  frequent-shingle cutoff (``max_doc_freq``) is the standard guard
  that keeps a stop-shingle from exploding the join.
* **MinHash-LSH** — the scale path: k independent min-hashes per doc
  (one explode + one groupBy), banded into b buckets; candidate pairs
  come from a per-band self-join on (band, bucket-signature), then
  exact Jaccard only on candidates. Linear-ish shuffle volume.
* **SimHash** — 64-bit locality-sensitive fingerprint from per-token
  hash bit votes; near-dup candidates = equal 16-bit bands (hamming
  radius trade-off), verified by hamming distance ≤ r.

Everything is expression-only DataFrame code — no Python UDFs — so
Catalyst/AQE handle partial aggregation and skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import fingerprint, tokens

# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep one representative (min id) per normalized-text fingerprint."""
    fp = df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
    reps = fp.groupBy("fp").agg(F.min(id_col).alias(id_col))
    return df.join(reps, id_col, "left_semi")


# ---------------------------------------------------------------------------
# shingling + exact Jaccard
# ---------------------------------------------------------------------------

def word_shingles(df: DataFrame, n: int = 3, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Distinct word n-gram shingles per doc: (id, shingle).

    Tokenization lands in a real column *before* the shingle transform:
    inlining ``tokens(text_col)`` into the lambda makes Catalyst
    re-evaluate the regex split once per ``element_at`` reference
    (n per shingle × shingles per doc ≈ 150 splits/row — measured 19×
    slower); common-subexpression elimination does not reach inside
    higher-order-function lambdas."""
    toks = F.col("__toks")
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    sh = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)]),
    )
    # guard short docs: sequence(1, 0) DESCENDS in Spark ([1, 0]) and
    # would feed element_at index 0
    sh = F.when(F.size(toks) >= n, sh).otherwise(F.array().cast("array<string>"))
    return (
        df.select(F.col(id_col), tokens(text_col).alias("__toks"))
        .select(F.col(id_col), F.explode(sh).alias("shingle"))
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard-similar pairs (a < b) above ``threshold``.

    ``max_doc_freq`` drops shingles present in more than that many docs
    before the self-join (stop-shingle guard for scale).
    """
    # join/group on the shingle's xxhash64, not the ~30-char string:
    # ~4× smaller shuffle keys. Distinct-shingle semantics survive any
    # 64-bit collision only probabilistically — P(collision) ≈ m²/2⁶⁵
    # (~1e-11 at a million distinct shingles), the standard trade every
    # production shingle pipeline makes.
    sh = word_shingles(df, n, id_col, text_col).select(
        F.col(id_col), F.xxhash64("shingle").alias("sh")
    )
    if max_doc_freq is not None:
        rare = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df_")).filter(
            F.col("df_") <= max_doc_freq
        )
        sh = sh.join(rare.select("sh"), "sh", "left_semi")
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col(id_col).alias("a"), "sh")
    b = sh.select(F.col(id_col).alias("b"), "sh")
    inter = (
        a.join(b, "sh")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa = sizes.select(F.col(id_col).alias("a"), F.col("sz").alias("sa"))
    sb = sizes.select(F.col(id_col).alias("b"), F.col("sz").alias("sb"))
    return (
        inter.join(sa, "a").join(sb, "b")
        .withColumn("jaccard", F.lit(1.0) * F.col("i") / (F.col("sa") + F.col("sb") - F.col("i")))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", F.round("jaccard", 4).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signatures(
    shingled: DataFrame, num_hashes: int = 32, id_col: str = "doc_id"
) -> DataFrame:
    """k min-hash values per doc from one explode + one aggregate.

    Hash family: xxhash64(shingle, i) — deterministic, independent-ish
    per seed column. Returns (id, sig: array<bigint> of length k).
    """
    mins = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    agg = shingled.groupBy(id_col).agg(*mins)
    return agg.select(
        F.col(id_col), F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def lsh_candidate_pairs(
    sigs: DataFrame, bands: int = 8, id_col: str = "doc_id"
) -> DataFrame:
    """Band the signature into ``bands`` groups; docs sharing any
    band-signature become candidates (a < b, distinct)."""
    k = None  # rows per band derived from signature length at plan time
    banded = sigs.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda bnd: F.xxhash64(
                    bnd,
                    F.concat_ws(
                        ",",
                        F.slice(
                            F.col("sig"),
                            bnd * (F.size("sig") / bands).cast("int") + 1,
                            (F.size("sig") / bands).cast("int"),
                        ),
                    ),
                ),
            )
        ).alias("band", "bucket"),
    )
    a = banded.select(F.col(id_col).alias("a"), "band", "bucket")
    b = banded.select(F.col(id_col).alias("b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Full MinHash-LSH pipeline: shingle → sign → band → candidates →
    exact-Jaccard verify. Returns (a, b, jaccard ≥ threshold)."""
    sh = word_shingles(df, n, id_col, text_col)
    cands = lsh_candidate_pairs(minhash_signatures(sh, num_hashes, id_col), bands, id_col)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a_sh = sh.select(F.col(id_col).alias("a"), "shingle")
    b_sh = sh.select(F.col(id_col).alias("b"), "shingle")
    inter = (
        cands.join(a_sh, "a")
        .join(b_sh, ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa = sizes.select(F.col(id_col).alias("a"), F.col("sz").alias("sa"))
    sb = sizes.select(F.col(id_col).alias("b"), F.col("sz").alias("sb"))
    return (
        inter.join(sa, "a").join(sb, "b")
        .withColumn("jaccard", F.lit(1.0) * F.col("i") / (F.col("sa") + F.col("sb") - F.col("i")))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", F.round("jaccard", 4).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 64) -> DataFrame:
    """64-bit SimHash per doc: per-token xxhash64 bit votes.

    Expression-only: explode tokens, one sum per bit position (wide
    aggregate — 64 partial-agg columns, still a single shuffle)."""
    tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
    h = F.xxhash64("tok")
    votes = [
        F.sum(
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    agg = tok.groupBy(id_col).agg(*votes)
    fp = None
    for i in range(bits):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = bit * F.lit(2 ** i).cast("long") if i < 63 else bit * F.lit(-(2 ** 63)).cast("long")
        fp = term if fp is None else fp + term
    return agg.select(F.col(id_col), fp.alias("simhash"))


def simhash_pairs(
    df: DataFrame, max_hamming: int = 6, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Near-dup pairs by SimHash: band on 8-bit bytes (any equal byte →
    candidate; pigeonhole guarantees full recall for hamming ≤ 7),
    then verify the true hamming distance."""
    sh = simhash(df, id_col, text_col)
    quarters = F.array(*[
        F.shiftrightunsigned(F.col("simhash"), q * 8).bitwiseAND(F.lit(0xFF)).alias(f"q{q}")
        for q in range(8)
    ])
    banded = sh.select(
        F.col(id_col), F.col("simhash"), F.posexplode(quarters).alias("band", "bucket")
    )
    a = banded.select(F.col(id_col).alias("a"), F.col("simhash").alias("sim_a"), "band", "bucket")
    b = banded.select(F.col(id_col).alias("b"), F.col("simhash").alias("sim_b"), "band", "bucket")
    cands = (
        a.join(b, ["band", "bucket"]).filter(F.col("a") < F.col("b"))
        .select("a", "b", "sim_a", "sim_b").distinct()
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        cands.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )


def contaminated_ids(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: corpus documents sharing ANY word
    n-gram with the benchmark/eval set (the standard n-gram-overlap
    contamination test run before training). Returns the contaminated
    corpus ids.

    Plan: shingle both sides, semi-join corpus shingles against the
    (broadcastable — eval sets are small) benchmark shingle set, then
    reduce to distinct ids. Shuffle ∝ corpus shingles; the benchmark
    side broadcasts, so no all-pairs comparison ever materializes.
    """
    bench_sh = (
        word_shingles(benchmark, n, id_col, text_col)
        .select(F.xxhash64("shingle").alias("sh"))
        .distinct()
    )
    corp_sh = word_shingles(corpus, n, id_col, text_col).select(
        F.col(id_col), F.xxhash64("shingle").alias("sh")
    )
    return (
        corp_sh.join(F.broadcast(bench_sh), "sh", "left_semi")
        .select(id_col)
        .distinct()
    )
