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

from pyspark.sql import Column, DataFrame, Window
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


def prefix_candidates_from_shingles(
    sh: DataFrame,
    threshold_e4: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """The AllPairs/PPJoin candidate pairs (a < b) from a distinct
    (id, shingle) frame: docs whose rarest-token PREFIXES (length
    ``|x| − ⌈t·|x|⌉ + 1`` in the global (df asc, shingle asc) order)
    share a token. Complete by PPJoin Lemma 1 — every pair at
    J ≥ t appears here. Exposed separately from
    :func:`jaccard_pairs_prefix` so the verify join's cost driver
    (candidate count × posting sizes) is measurable before running
    it; the pytest pin asserts the pruning accounting on real data.
    """
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_"))
    w = Window.partitionBy(id_col).orderBy("df_", "shingle")
    wall = Window.partitionBy(id_col)
    # integer ceil(t·n): (t_e4·n + 9999) div 10000
    plen = (
        F.col("n")
        - F.expr(f"({threshold_e4}L * n + 9999) div 10000")
        + F.lit(1)
    )
    pref = (
        sh.join(dfreq, "shingle")
        .withColumn("pos", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(wall))
        .filter(F.col("pos") <= plen)
        .select(F.col(id_col), "shingle")
    )
    return (
        pref.select(F.col(id_col).alias("a"), "shingle")
        .join(pref.select(F.col(id_col).alias("b"), "shingle"), "shingle")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def jaccard_pairs_prefix(
    df: DataFrame,
    n: int = 3,
    threshold_e4: int = 5000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact Jaccard-threshold pairs via PREFIX FILTERING (the
    AllPairs/PPJoin candidate scheme) — same answer as
    :func:`jaccard_pairs` with NO ``max_doc_freq`` guard, but the
    self-join runs only on each doc's prefix.

    Order every doc's shingles by the global (df asc, shingle asc)
    total order (rarest first) and keep the PREFIX of length
    ``|x| − ⌈t·|x|⌉ + 1``. PPJoin Lemma 1: J(x,y) ≥ t implies the two
    prefixes share a token — overlap o ≥ ⌈t·|x|⌉ on each side, the
    tokens outside a prefix number ⌈t·|x|⌉ − 1 < o so each side has a
    shared token inside its prefix, and if neither of those were in
    the OTHER's prefix their global orders would have to be
    simultaneously above and below each other's boundary token.
    So the pruning is COMPLETE: unlike the stop-shingle guard it can
    never miss a qualifying pair (a corpus of near-identical docs
    makes every shingle frequent — the guard drops them all, the
    prefix filter keeps exactly the rare-end evidence it needs).
    Candidates ∝ matching PREFIX tokens (rare by construction);
    verification is an exact integer count over candidate docs'
    postings only. ``threshold_e4`` is the Jaccard bound in e4
    fixed-point (5000 = 0.5); prefix lengths and the acceptance test
    are pure integer arithmetic, engine-portable.

    VERIFY-COST BOUNDARY: the verify step joins candidate pairs back
    through the FULL postings, so its shuffle is ∝ Σ over candidate
    pairs of the two docs' shingle counts — standard for PPJoin, and
    cheap exactly as long as the prefix filter keeps the candidate
    set small. A corpus where the candidate set itself approaches
    pair-of-corpus size (near-duplicate-heavy crawls at low
    thresholds) makes verification quadratic in practice; there
    MinHash (:func:`minhash_pairs`) remains the sub-quadratic path,
    exactly as :func:`jaccard_pairs`'s guard-vs-recall note says for
    the stop-shingle scheme. :func:`prefix_candidates_from_shingles`
    exposes the candidate pairs so callers (and the pytest pin) can
    ACCOUNT for this cost before committing to the verify join.
    """
    if not 0 < threshold_e4 <= 10_000:
        raise ValueError(f"threshold_e4 must be in (0, 10000], got {threshold_e4}")
    sh = word_shingles(df, n, id_col, text_col)
    cands = prefix_candidates_from_shingles(sh, threshold_e4, id_col)
    # exact verify on candidates only: count shared shingles through
    # the full postings (shuffle ∝ candidate pairs' tokens)
    sa = sh.select(F.col(id_col).alias("a"), "shingle")
    sb = sh.select(F.col(id_col).alias("b"), "shingle")
    inter = (
        cands.join(sa, "a")
        .join(sb, ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    return (
        inter.join(sizes.select(F.col(id_col).alias("a"), F.col("sz").alias("sa")), "a")
        .join(sizes.select(F.col(id_col).alias("b"), F.col("sz").alias("sb")), "b")
        .filter(
            F.lit(10_000) * F.col("i")
            >= F.lit(threshold_e4) * (F.col("sa") + F.col("sb") - F.col("i"))
        )
        .select(
            "a", "b",
            F.round(
                F.lit(1.0) * F.col("i") / (F.col("sa") + F.col("sb") - F.col("i")), 4
            ).alias("jaccard"),
        )
    )


def jaccard_pairs_between(
    left: DataFrame,
    right: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard pairs ACROSS two document frames — no
    within-frame pairs: (a = left id, b = right id, jaccard ≥
    ``threshold``). The two-sided variant of :func:`jaccard_pairs`,
    used to verify an increment against committed history.

    The stop-shingle guard counts a shingle's document frequency over
    BOTH frames combined (a shingle hot on either side explodes the
    same join), and — like :func:`jaccard_pairs` — doc sizes are
    counted AFTER the guard, so similarity is Jaccard over the rare-
    shingle sets on both sides.
    """
    shl = word_shingles(left, n, id_col, text_col).select(
        F.col(id_col).alias("a"), F.xxhash64("shingle").alias("sh")
    )
    shr = word_shingles(right, n, id_col, text_col).select(
        F.col(id_col).alias("b"), F.xxhash64("shingle").alias("sh")
    )
    if max_doc_freq is not None:
        rare = (
            shl.select("sh").unionAll(shr.select("sh"))
            .groupBy("sh").agg(F.count(F.lit(1)).alias("df_"))
            .filter(F.col("df_") <= max_doc_freq)
        )
        shl = shl.join(rare.select("sh"), "sh", "left_semi")
        shr = shr.join(rare.select("sh"), "sh", "left_semi")
    sa = shl.groupBy("a").agg(F.count(F.lit(1)).alias("sa"))
    sb = shr.groupBy("b").agg(F.count(F.lit(1)).alias("sb"))
    inter = shl.join(shr, "sh").groupBy("a", "b").agg(F.count(F.lit(1)).alias("i"))
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
    shingled: DataFrame,
    num_hashes: int = 32,
    id_col: str = "doc_id",
    include_size: bool = False,
) -> DataFrame:
    """k min-hash values per doc from one explode + one aggregate.

    Hash family: xxhash64(shingle, i) — deterministic, independent-ish
    per seed column. Returns (id, sig: array<bigint> of length k), plus
    ``sz`` (the doc's shingle count) when ``include_size`` — the count
    rides the SAME partial-aggregated shuffle, so callers that need
    sizes for Jaccard math don't pay a second shingle pass.
    """
    mins = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    if include_size:
        mins.append(F.count(F.lit(1)).alias("sz"))
    agg = shingled.groupBy(id_col).agg(*mins)
    cols = [
        F.col(id_col),
        F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig"),
    ]
    if include_size:
        cols.append(F.col("sz"))
    return agg.select(*cols)


def band_rows(sigs: DataFrame, bands: int = 8, id_col: str = "doc_id") -> DataFrame:
    """One LSH bucket key per (doc, band): (id, band, bucket) — rows
    per band derived from signature length at plan time. These are the
    rows a persisted band index stores (:func:`build_dedup_index`) and
    the probe keys an increment joins with (equal bucket in any band ⇒
    candidate pair)."""
    return sigs.select(
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


def lsh_candidate_pairs(
    sigs: DataFrame, bands: int = 8, id_col: str = "doc_id"
) -> DataFrame:
    """Band the signature into ``bands`` groups; docs sharing any
    band-signature become candidates (a < b, distinct)."""
    banded = band_rows(sigs, bands, id_col)
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
    exact-Jaccard verify. Returns (a, b, jaccard ≥ threshold).

    Scale shape: doc sizes ride the signature aggregate's shuffle
    (``include_size`` — no separate shingle pass), and the verify
    joins are semi-pruned to CANDIDATE docs before their shuffle, so
    the exact-verify stage moves shingles ∝ candidate docs, not ∝
    corpus — the whole point of LSH is that candidates ≪ corpus."""
    sh = word_shingles(df, n, id_col, text_col)
    sig_sz = minhash_signatures(sh, num_hashes, id_col, include_size=True)
    # checkpoint the candidate pairs: three consumers below (two
    # semi-join builds + the verify join) would otherwise re-execute
    # the band self-join's post-shuffle stages per consumer
    # (ReuseExchange shares only the shuffle files); the frame is
    # candidate-pair-sized — small by LSH design
    cands = lsh_candidate_pairs(
        sig_sz.select(id_col, "sig"), bands, id_col
    ).localCheckpoint(eager=False)
    sizes = sig_sz.select(id_col, "sz")
    # left_semi treats the right side as a set — no distinct needed
    a_sh = sh.join(
        cands.select(F.col("a").alias(id_col)), id_col, "left_semi"
    ).select(F.col(id_col).alias("a"), "shingle")
    b_sh = sh.join(
        cands.select(F.col("b").alias(id_col)), id_col, "left_semi"
    ).select(F.col(id_col).alias("b"), "shingle")
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
# incremental dedup against a committed corpus index
# ---------------------------------------------------------------------------

def build_dedup_index(
    df: DataFrame,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """The index rows a committed corpus slice contributes:
    ``docs`` = (doc_id, fp, sz) and ``band_index`` = (doc_id, band,
    bucket).

    The point of a persisted index is that tomorrow's increment dedups
    against 100 TB of history WITHOUT re-reading the history text:
    exact dups hit ``fp``, near-dup candidates hit the band index, and
    only the few candidate old docs are re-read for the exact verify.
    Docs shorter than ``n`` words have no shingles → no band rows
    (``sz`` 0): they participate in exact dedup only.
    """
    fp = df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
    sh = word_shingles(df, n, id_col, text_col)
    sig_sz = minhash_signatures(sh, num_hashes, id_col, include_size=True)
    docs = (
        fp.join(sig_sz.select(id_col, "sz"), id_col, "left")
        .select(
            F.col(id_col), "fp",
            F.coalesce("sz", F.lit(0)).cast("long").alias("sz"),
        )
    )
    return docs, band_rows(sig_sz.select(id_col, "sig"), bands, id_col)


def increment_dedup_report(
    increment: DataFrame,
    history: DataFrame | None = None,
    index_docs: DataFrame | None = None,
    index_bands: DataFrame | None = None,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    candidates: str = "lsh",
    max_doc_freq: int | None = 16,
    self_near: bool = True,
) -> DataFrame:
    """Dedup verdict for every increment doc against committed history:
    one row (doc_id, status, dup_of, sim) per increment doc, where
    ``status`` ∈ {kept, exact_self, exact_history, near_history,
    near_self} — the production dedup shape at corpus scale, where
    daily increments check against history via a persisted index
    instead of re-clustering the world.

    Drop priority (each doc gets exactly one verdict): (1) exact dup
    within the increment (min-id survivor), (2) exact dup of history,
    (3) near-dup of history, (4) near-dup within what remains
    (connected-component min-id survivor, like :func:`cluster_dedup`).

    ``candidates="lsh"`` is the scale path: band-index join for
    history candidates (increment side broadcast — the 100 TB index
    scan never shuffles) + :func:`minhash_dedup_pairs` within the
    increment, both exact-Jaccard-verified, UNGUARDED (the semantics of
    :func:`minhash_dedup_pairs`). ``candidates="exact"`` is the
    verifier/oracle path: guarded full shingle joins
    (:func:`jaccard_pairs_between` / :func:`jaccard_pairs` semantics) —
    deterministic, SQL-expressible, recall 1.

    Requirements: ``candidates="exact"`` needs ``history`` only;
    ``candidates="lsh"`` needs ``index_docs`` (for fp + sz),
    ``index_bands``, and ``history`` (candidate old docs' text is
    re-read for the verify). With no history (first commit) both modes
    run stages (1) and (4) only.
    """
    if candidates not in ("lsh", "exact"):
        raise ValueError(f"unknown candidates mode {candidates!r}")
    if candidates == "exact" and history is not None and index_docs is None:
        index_docs = history.select(F.col(id_col), fingerprint(text_col).alias("fp"))

    # (1) exact within the increment
    inc_fp = increment.select(F.col(id_col), fingerprint(text_col).alias("fp"))
    keeper = inc_fp.groupBy("fp").agg(F.min(id_col).alias("__keep"))
    a_dups = (
        inc_fp.join(keeper, "fp")
        .filter(F.col(id_col) != F.col("__keep"))
        .select(
            F.col(id_col), F.lit("exact_self").alias("status"),
            F.col("__keep").alias("dup_of"), F.lit(1.0).alias("sim"),
        )
    )
    drops = [a_dups]

    # (2) exact against history: broadcast the increment-side probe —
    # the history index streams through the join unshuffled
    if index_docs is not None:
        probe = inc_fp.join(a_dups.select(id_col), id_col, "left_anti")
        b_dups = (
            index_docs.select(F.col(id_col).alias("__old"), "fp")
            .join(F.broadcast(probe), "fp")
            .groupBy(id_col)
            .agg(F.min("__old").alias("dup_of"))
            .select(
                F.col(id_col), F.lit("exact_history").alias("status"),
                "dup_of", F.lit(1.0).alias("sim"),
            )
        )
        drops.append(b_dups)

    exact_dropped = drops[0].select(id_col)
    for d in drops[1:]:
        exact_dropped = exact_dropped.unionAll(d.select(id_col))
    survivors = increment.join(exact_dropped, id_col, "left_anti")

    # (3) near-dup against history
    if history is not None:
        if candidates == "exact":
            pairs_h = jaccard_pairs_between(
                survivors, history, n, threshold, id_col, text_col, max_doc_freq
            )
        else:
            sh_i = word_shingles(survivors, n, id_col, text_col)
            sig_sz = minhash_signatures(sh_i, num_hashes, id_col, include_size=True)
            inc_bands = band_rows(sig_sz.select(id_col, "sig"), bands, id_col)
            cand = (
                index_bands.select(F.col(id_col).alias("b"), "band", "bucket")
                .join(
                    F.broadcast(inc_bands.select(F.col(id_col).alias("a"), "band", "bucket")),
                    ["band", "bucket"],
                )
                .select("a", "b")
                .distinct()
                # three consumers (two semi builds + the verify join)
                .localCheckpoint(eager=False)
            )
            old_docs = history.join(
                cand.select(F.col("b").alias(id_col)), id_col, "left_semi"
            )
            a_sh = sh_i.join(
                cand.select(F.col("a").alias(id_col)), id_col, "left_semi"
            ).select(F.col(id_col).alias("a"), "shingle")
            b_sh = word_shingles(old_docs, n, id_col, text_col).select(
                F.col(id_col).alias("b"), "shingle"
            )
            inter = (
                cand.join(a_sh, "a")
                .join(b_sh, ["b", "shingle"])
                .groupBy("a", "b")
                .agg(F.count(F.lit(1)).alias("i"))
            )
            sa = sig_sz.select(F.col(id_col).alias("a"), F.col("sz").alias("sa"))
            sb = index_docs.select(F.col(id_col).alias("b"), F.col("sz").alias("sb"))
            pairs_h = (
                inter.join(sa, "a").join(sb, "b")
                .withColumn(
                    "jaccard",
                    F.lit(1.0) * F.col("i") / (F.col("sa") + F.col("sb") - F.col("i")),
                )
                .filter(F.col("jaccard") >= threshold)
                .select("a", "b", F.round("jaccard", 4).alias("jaccard"))
            )
        from pyspark.sql.window import Window

        w = Window.partitionBy("a").orderBy(F.desc("jaccard"), F.asc("b"))
        h_dups = (
            pairs_h.withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") == 1)
            .select(
                F.col("a").alias(id_col), F.lit("near_history").alias("status"),
                F.col("b").alias("dup_of"), F.col("jaccard").alias("sim"),
            )
        )
        drops.append(h_dups)
        survivors = survivors.join(h_dups.select(id_col), id_col, "left_anti")

    # (4) near-dup within what remains
    if self_near:
        if candidates == "lsh":
            pairs_s = minhash_dedup_pairs(
                survivors, n, num_hashes, bands, threshold, id_col, text_col
            )
        else:
            pairs_s = jaccard_pairs(
                survivors, n, threshold, id_col, text_col, max_doc_freq
            )
        cd = cluster_dedup(survivors, pairs_s, id_col)
        s_dups = cd.filter(~F.col("is_survivor")).select(
            F.col(id_col), F.lit("near_self").alias("status"),
            F.col("comp_id").alias("dup_of"), F.col("max_sim").alias("sim"),
        )
        drops.append(s_dups)

    all_drops = drops[0]
    for d in drops[1:]:
        all_drops = all_drops.unionByName(d)
    return (
        increment.select(id_col)
        .join(all_drops, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("status", F.lit("kept")).alias("status"),
            "dup_of",
            F.col("sim").cast("double").alias("sim"),
        )
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


def hash_neardup_pairs(
    hashes: DataFrame, hash_col: str, id_col: str, max_hamming: int = 6
) -> DataFrame:
    """Near-dup pairs over ANY 64-bit fingerprint column: band on 8-bit
    bytes (any equal byte → candidate; pigeonhole guarantees full
    recall for hamming ≤ 7 — 8 disjoint bands can't all differ on ≤7
    flipped bits), then verify the true hamming distance. Shared by
    text SimHash and image perceptual hashes (``multimodal.ahash64``).

    Scale shape: the band explode is ×8 on (id, hash) pairs only —
    never payloads; the candidate join keys on (band, bucket), uniform
    for hash-like fingerprints; verify is a codegen'd ``bit_count(a^b)``.
    """
    quarters = F.array(*[
        F.shiftrightunsigned(F.col(hash_col), q * 8).bitwiseAND(F.lit(0xFF)).alias(f"q{q}")
        for q in range(8)
    ])
    banded = hashes.select(
        F.col(id_col), F.col(hash_col), F.posexplode(quarters).alias("band", "bucket")
    )
    a = banded.select(F.col(id_col).alias("a"), F.col(hash_col).alias("sim_a"), "band", "bucket")
    b = banded.select(F.col(id_col).alias("b"), F.col(hash_col).alias("sim_b"), "band", "bucket")
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


def simhash_pairs(
    df: DataFrame, max_hamming: int = 6, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Near-dup pairs by SimHash — see :func:`hash_neardup_pairs` for
    the banding/verify mechanics."""
    return hash_neardup_pairs(simhash(df, id_col, text_col), "simhash", id_col, max_hamming)


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


# ---------------------------------------------------------------------------
# duplicate clusters (connected components)
# ---------------------------------------------------------------------------

def connected_components(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 30,
) -> DataFrame:
    """Connected components over an undirected edge list — the cluster
    step every production dedup pipeline runs between "near-dup PAIRS"
    and "keep ONE document per duplicate group".

    Returns ``(node, comp)`` where ``comp`` is the minimum node id in
    the node's component (the canonical survivor). Only nodes that
    appear in ``edges`` are returned; callers left-join and coalesce to
    cover singletons.

    Algorithm: distributed min-label propagation with path halving.
    Each round does
      (1) *neighbor-min*: ``comp(u) := min(comp(u), min over v∈N(u) of
          comp(v))`` — one shuffle join of the symmetric edge list
          against the label frame plus one groupBy-min, and
      (2) *path halving*: ``comp(u) := comp(comp(u))`` — a node-keyed
          self-join that shortcuts label chains, so a path graph
          converges in O(log diameter) rounds instead of O(diameter).
    Labels are node ids and only ever decrease, so the fixed point is
    exactly the per-component minimum and termination is guaranteed;
    convergence is detected by an any-label-changed probe (LIMIT 1
    under a join of two materialized node-sized frames — driver-sized
    result). Each round's label frame is ``localCheckpoint``-ed: each
    round references the previous labels three times, so without a
    lineage CUT the logical plan grows ~3^k and planning itself OOMs
    (persist alone does NOT truncate the logical plan — the same
    reason GraphFrames' connected components requires a checkpoint
    dir). On a cluster, swap ``localCheckpoint`` for a reliable
    ``checkpoint`` against a checkpoint dir to survive executor loss.

    Scale: per round, shuffle volume is O(|E| + |V|) with uniform
    id keys; duplicate clusters in real corpora are tiny and dense
    (diameter ≲ 4), so 2-3 rounds typically suffice — ``max_iter`` is
    a backstop, and hitting it raises rather than silently returning
    unconverged labels.
    """
    from pyspark.storagelevel import StorageLevel

    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    e = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    e = e.persist(StorageLevel.MEMORY_AND_DISK)

    labels = (
        e.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint(eager=True)
    )

    converged = False
    for _ in range(max_iter):
        nbr = e.join(
            labels.select(F.col("node").alias("v"), "comp"), "v"
        ).select(F.col("u").alias("node"), "comp")
        stepped = (
            nbr.unionByName(labels.select("node", "comp"))
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
        )
        # path halving: follow the label one hop (comp is itself a node
        # id, so it always resolves; least() ignores the NULL a left
        # join would produce if it ever didn't)
        hop = labels.select(F.col("node").alias("comp"), F.col("comp").alias("comp2"))
        new = (
            stepped.join(hop, "comp", "left")
            .select("node", F.least("comp", "comp2").alias("comp"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new
        if changed == 0:
            converged = True
            break
    e.unpersist()
    if not converged:
        labels.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    return labels


def cluster_dedup(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    sim_col: str = "jaccard",
) -> DataFrame:
    """Cluster-level dedup assignment: every document mapped to its
    duplicate-cluster id with survivor marking.

    ``pairs`` is any near-dup pair frame ``(a, b, <sim_col>)`` — exact
    Jaccard, MinHash-LSH-verified, or embedding near-dup. Output, one
    row per input document:

    * ``comp_id``    — min doc id of the duplicate cluster (own id for
      singletons),
    * ``cluster_size`` — number of documents in the cluster (1 for
      singletons),
    * ``is_survivor``  — true iff this doc is the cluster's canonical
      representative (the one a "drop duplicates" pass keeps),
    * ``max_sim``      — the doc's strongest duplicate similarity
      (0.0 for singletons).

    Plan: components over the pair graph (tiny relative to the corpus),
    then three uniform-key joins back to the corpus frame — no step is
    quadratic and nothing corpus-sized ever sits on the driver.
    """
    comp = connected_components(pairs, "a", "b").withColumnRenamed("node", id_col)
    sims = (
        pairs.select(F.col("a").alias(id_col), F.col(sim_col).alias("__s"))
        .unionByName(pairs.select(F.col("b").alias(id_col), F.col(sim_col).alias("__s")))
        .groupBy(id_col)
        .agg(F.round(F.max("__s"), 4).alias("__max_sim"))
    )
    sizes = comp.groupBy("comp").agg(F.count(F.lit(1)).alias("__csz"))
    return (
        df.select(id_col)
        .join(comp, id_col, "left")
        .withColumn("comp_id", F.coalesce("comp", F.col(id_col)))
        .join(sims, id_col, "left")
        .join(sizes.withColumnRenamed("comp", "comp_id"), "comp_id", "left")
        .select(
            F.col(id_col),
            "comp_id",
            F.coalesce("__csz", F.lit(1)).cast("long").alias("cluster_size"),
            (F.col("comp_id") == F.col(id_col)).alias("is_survivor"),
            F.coalesce("__max_sim", F.lit(0.0)).alias("max_sim"),
        )
    )


def dup_span_coverage(
    df: DataFrame, n: int = 5, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact duplicate-span accounting (the substring-dedup measurement
    of Lee et al., "Deduplicating Training Data Makes Language Models
    Better"): every distinct n-token span of every document, counted
    across the corpus; a span is DUPLICATED iff it occurs in ≥ 2
    documents. Emits per-document ``n_spans`` / ``n_dup`` — the
    verbatim-overlap coverage a span-removal pass would cut.

    Shape at scale: the span table is computed ONCE (a groupBy+join
    formulation would scan and re-shingle the corpus once per join
    side — Spark cannot share one exchange between two consumers
    without caching a corpus-sized intermediate); the per-span count
    is a whole-partition window after one shuffle on the uniform span
    key, then one groupBy back to documents. No pair join — the
    n_docs≥2 test happens AT the span key, so a span shared by 10⁶
    documents costs one counter, not 10¹² pairs (contrast
    ``jaccard_pairs``, which needs its ``max_doc_freq`` guard for
    exactly that reason).
    """
    from pyspark.sql import Window

    spans = word_shingles(df, n=n, id_col=id_col, text_col=text_col)
    n_docs = F.count(F.lit(1)).over(Window.partitionBy("shingle"))
    return (
        spans.withColumn("n_docs", n_docs)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum((F.col("n_docs") >= 2).cast("long")).alias("n_dup"),
        )
    )


def remove_dup_spans(
    df: DataFrame, n: int = 5, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact duplicate-span REMOVAL (the transformation behind the
    :func:`dup_span_coverage` measurement — Lee et al. strip duplicated
    substrings from all but one occurrence): a token is removed iff it
    is covered by some n-token span that occurs in ≥ 2 documents AND
    this document is not that span's canonical owner (min doc id).

    The guarantee, precisely: a NON-owner's copy of a duplicated
    context is always stripped; an owner's copy survives verbatim
    UNLESS clipped by an OVERLAPPING duplicated span owned by a
    different document — overlap resolves conservatively toward
    removal, so chained cross-owner overlaps can remove every intact
    copy of a context (the same bias Lee et al.'s span-cutting has),
    and an owner that internally repeats its own span keeps every
    repetition. Conservative-toward-removal is the right polarity for
    training data; pin the exact edge in the tests before relying on
    more.

    Emits one row per input document: ``(id, n_tokens, n_removed,
    text_clean)`` — fully-deduplicated docs survive with empty
    ``text_clean`` (the caller decides whether to drop them), docs
    shorter than ``n`` tokens pass through untouched.

    Scale shape: positioned spans (NOT distinct — positions matter)
    → one groupBy on the span key for (n_docs, owner) → join back →
    explode covered positions → anti-join against the positioned
    tokens → one ordered reassembly per doc. Shuffles ∝ corpus
    tokens, the intrinsic cost of exact substring dedup; every key is
    content-derived and uniform.
    """
    from .text import ngrams_of_tokens, tokens

    toks = F.col("__toks")
    d = df.select(F.col(id_col), tokens(text_col).alias("__toks"))
    # positioned spans via the shared n-gram builder (grams built in
    # ONE per-row transform; the explode carries only the gram strings,
    # not the token array)
    sp = d.select(
        F.col(id_col), F.posexplode(ngrams_of_tokens(toks, n)).alias("i0", "key")
    ).select(F.col(id_col), (F.col("i0") + 1).alias("i"), "key")
    dk = (
        sp.select(id_col, "key").distinct()
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("owner"))
    )
    dup_pos = (
        sp.join(dk, "key")
        .filter((F.col("n_docs") >= 2) & (F.col("owner") != F.col(id_col)))
        .select(F.col(id_col), F.explode(F.sequence(F.col("i"), F.col("i") + (n - 1))).alias("p"))
        .distinct()
    )
    tokpos = d.select(F.col(id_col), F.posexplode(toks).alias("p0", "tok")).select(
        F.col(id_col), (F.col("p0") + 1).alias("p"), "tok"
    )
    kept = (
        tokpos.join(dup_pos, [id_col, "p"], "left_anti")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("__n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("p", "tok"))),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("text_clean"),
        )
    )
    return (
        d.select(F.col(id_col), F.size(toks).cast("long").alias("n_tokens"))
        .join(kept, id_col, "left")
        .select(
            F.col(id_col),
            "n_tokens",
            (F.col("n_tokens") - F.coalesce(F.col("__n_kept"), F.lit(0))).alias("n_removed"),
            F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean"),
        )
    )
