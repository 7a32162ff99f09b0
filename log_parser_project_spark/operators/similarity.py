"""Similarity search over embedding columns (array<float>).

* ``cosine`` — expression-only dot/norm via ``zip_with`` +
  ``aggregate``: stays JVM-side, no Python, codegen-friendly.
* ``brute_force_topk`` — exact k-NN: broadcast the (small) query set
  against the corpus, window-rank per query. The right baseline, and
  at 100 TB the correct *verifier* for the bucketed path.
* ``lsh_topk`` — the scale path: random-hyperplane (SRP) signatures
  with deterministic hash-derived planes; candidates from matching
  sign-buckets, exact cosine re-rank within buckets. Probes multiple
  bands so recall degrades gracefully instead of falling off a cliff.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _rank_cut(scored: DataFrame, k: int) -> DataFrame:
    """The shared deterministic top-k cut every cosine-retrieval path
    ends with: rank by (rounded sim desc, neighbor_id asc) per query.
    One definition so the tie-break/rounding contract the DuckDB
    oracles pin is edited in exactly one place."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def _round_half_up4(x):
    """F.round / DuckDB ROUND semantics — half away from zero, NOT
    numpy's half-to-even; a midpoint like 0.15625 must round the same
    on every path (expression, GEMM, PQ). Shared by all numpy kernels
    in this module."""
    import numpy as np

    return np.trunc(np.abs(x) * 1e4 + 0.5) * np.sign(x) / 1e4


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for every query vector.

    Plan: broadcast(queries) × corpus (narrow — no shuffle for the
    join), then one shuffle for the per-query rank window. Tie-break
    on rounded similarity then neighbor id → fully deterministic.
    """
    # norms are per-vector, not per-pair: compute them once on each side
    # of the join (|C| + |Q| aggregates) instead of inside the pair
    # expression (3·|C|·|Q| array scans via cosine()).
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        norm(F.col(vec_col)).alias("qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        norm(F.col(vec_col)).alias("cn"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "sim",
            F.round(dot(F.col("qvec"), F.col("cvec")) / (F.col("qn") * F.col("cn")), 4),
        )
    )
    return _rank_cut(scored, k)


def srp_signature(vec: Column, planes: int, dim: int, band: int = 0) -> Column:
    """Signed-random-projection bucket id from ``planes`` deterministic
    hyperplanes. Plane coefficients are derived from xxhash64(plane,
    dim_index, band) → uniform in [-1, 1]; identical on every executor
    with zero shipped state."""
    bits = []
    for p in range(planes):
        coeff = F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda d: (
                F.pmod(F.xxhash64(F.lit(band), F.lit(p), d), F.lit(2_000_001)) / 1_000_000.0
            )
            - 1.0,
        )
        proj = F.aggregate(
            F.zip_with(vec, coeff, lambda x, cf: x.cast("double") * cf),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(2 ** p))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    planes: int = 8,
    bands: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: SRP-bucket candidates (multi-band OR), exact
    cosine re-rank. Shuffle volume ∝ corpus × bands, not corpus ×
    queries."""
    def with_buckets(df: DataFrame, prefix: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(f"{prefix}_id"),
            F.col(vec_col).alias(f"{prefix}vec"),
            norm(F.col(vec_col)).alias(f"{prefix}_n"),
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(bnd).alias("band"),
                        srp_signature(F.col(vec_col), planes, dim, bnd).alias("bucket"),
                    )
                    for bnd in range(bands)
                ])
            ).alias("bb"),
        ).select(f"{prefix}_id", f"{prefix}vec", f"{prefix}_n", "bb.band", "bb.bucket")

    c = with_buckets(corpus, "neighbor")
    q = with_buckets(queries, "query")
    cands = (
        c.join(F.broadcast(q), ["band", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "queryvec", "neighborvec", "query_n", "neighbor_n")
        .distinct()
    )
    scored = cands.withColumn(
        "sim",
        F.round(
            dot(F.col("queryvec"), F.col("neighborvec")) / (F.col("query_n") * F.col("neighbor_n")),
            4,
        ),
    )
    return _rank_cut(scored, k)


def axis_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    planes: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Bucketed ANN with ORACLE-REPLAYABLE hyperplanes: the same
    candidate-generation + exact-cosine-re-rank plan as
    :func:`lsh_topk`, but the ``planes`` hyperplanes are the first
    ``planes`` COORDINATE AXES (bucket bit p = sign of component
    p+1), so every step — bucketing, probing, scoring, ranking — is
    plain arithmetic an external SQL engine replays bit-for-bit.
    This is what gives the approximate-retrieval family a VALUE-level
    driver pin (``q_sim_bucketed_ann``): the hashed-SRP / IVF
    variants stay the production paths (their projections aren't
    SQL-replayable, so they are recall-tested rows-only), while this
    pins the shared bucket-join machinery end to end. Misses are
    real and identical in both engines — a true neighbor in another
    orthant is absent from both — which is exactly the approximate
    contract. Plan: corpus bucket join against broadcast queries,
    shuffle ∝ probed-bucket candidates, never corpus × queries.
    """
    def bucket(vec: Column) -> Column:
        bits = [
            F.when(F.element_at(vec, p + 1) >= 0, F.lit(2 ** p)).otherwise(F.lit(0))
            for p in range(planes)
        ]
        out = bits[0]
        for b in bits[1:]:
            out = out + b
        return out

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        norm(F.col(vec_col)).alias("qn"),
        bucket(F.col(vec_col)).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        norm(F.col(vec_col)).alias("cn"),
        bucket(F.col(vec_col)).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "sim",
            F.round(dot(F.col("qvec"), F.col("cvec")) / (F.col("qn") * F.col("cn")), 4),
        )
    )
    return _rank_cut(scored, k)


def kmeans_centroids(
    corpus: DataFrame,
    k: int,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    spherical: bool = True,
) -> list[list[float]]:
    """Distributed Lloyd's k-means on the unit sphere (spherical
    k-means) with a deterministic init: first ``k`` corpus vectors by
    id (normalized), then per iteration ONE expression-side assignment
    pass (argmax cosine against broadcast centroid literals — no UDF,
    no explode) and ONE partial-aggregated groupBy computing all
    per-dimension means as ``dim`` avg() expressions. Driver state is
    k×dim floats per iteration — aggregate-sized, never corpus-sized.
    Cells that go empty keep their previous centroid; null/short
    vectors are ignored for training. Returns the unit-normalized
    centroid list for :func:`ivf_topk` / :func:`pq_topk`.

    With ``spherical=False`` it is plain Lloyd's k-means in R^dim —
    init vectors are NOT normalized, assignment is nearest-by-L2
    (via the equivalent ``argmax(dot(v,c) − ‖c‖²/2)``, still one pure
    expression pass), and updates are raw per-dimension means. That is
    the right objective for PQ *sub*-codebooks, whose training points
    (subvectors of unit-norm embeddings) do not live on a sphere.

    Determinism caveat: for a FIXED partitioning the result is
    reproducible run to run, but ``avg()``'s partial-sum order follows
    the partitioning, so centroids can differ in low-order bits across
    different parallelism — an argmax near-tie may then flip a
    vector's cell (inherent to any floating-point distributed mean)."""
    import math

    def _norm_rows(rows_vals: list[list[float]]) -> list[list[float]]:
        out = []
        for v in rows_vals:
            nrm = math.sqrt(sum(x * x for x in v)) or 1.0
            out.append([x / nrm for x in v])
        return out

    corpus = corpus.filter(F.col(vec_col).isNotNull())
    # fix the dimensionality as the MOST COMMON vector width (one cheap
    # count-aggregate; ties break to the smaller width), then apply the
    # size filter BEFORE collecting init vectors. Probing just the first
    # row would let a single malformed min-id vector define dim and
    # filter out the entire valid corpus; letting wrong-width vectors
    # into the init would seed centroids whose dot() sims evaluate
    # null, permanently starving those cells.
    mode = (
        corpus.groupBy(F.size(F.col(vec_col)).alias("n"))
        .count()
        .orderBy(F.col("count").desc(), F.col("n").asc())
        .limit(1)
        .collect()
    )
    if not mode:
        return []
    dim = int(mode[0]["n"])
    corpus = corpus.filter(F.size(F.col(vec_col)) == dim)
    init = corpus.orderBy(id_col).limit(k).select(vec_col).collect()
    cents = [[float(x) for x in r[vec_col]] for r in init]
    if spherical:
        cents = _norm_rows(cents)
    if not cents:
        return []

    for _ in range(iters):
        if spherical:
            scores = F.array(*[
                dot(F.array(*[F.lit(x) for x in c]), F.col(vec_col)) for c in cents
            ])
        else:
            # argmin L2 ⇔ argmax(dot − ‖c‖²/2); ‖v‖² is constant per row
            scores = F.array(*[
                dot(F.array(*[F.lit(x) for x in c]), F.col(vec_col))
                - F.lit(sum(x * x for x in c) / 2.0)
                for c in cents
            ])
        cell = (F.array_position(scores, F.array_max(scores)) - 1).cast("int")
        means = (
            corpus.select(cell.alias("cell"), F.col(vec_col).alias("v"))
            .groupBy("cell")
            .agg(*[F.avg(F.element_at(F.col("v"), d + 1)).alias(f"d{d}") for d in range(dim)])
            .collect()
        )
        for r in means:
            vals = [r[f"d{d}"] for d in range(dim)]
            if r["cell"] is None or any(v is None for v in vals):
                continue  # malformed rows never update a centroid
            cents[r["cell"]] = [float(v) for v in vals]
        if spherical:
            cents = _norm_rows(cents)
    return cents


def ivf_cell_rows(
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Row-local IVF cell assignment against FIXED centroid literals —
    the registered matview transform behind the incrementally-
    maintained vector index (``plans/vectorindex.py``).

    Returns ``df → (cell:int, vec_id, emb)``: each valid vector mapped
    to its nearest centroid's cell (argmax dot against unit-norm
    centroids ≡ argmax cosine — ‖v‖ is constant per row; first-max
    tie-break, deterministic), null/wrong-width vectors dropped. A
    deterministic per-row flatMap (0 or 1 output rows from exactly one
    input row, centroids frozen as literals in the view's lineage), so
    it commutes with the signed delta fold: deleting a base row nets
    away exactly the ``(cell, vec_id, emb)`` group its insert created,
    and an UPDATE (delete old + insert new in the changelog) moves the
    vector to its new cell with no special casing."""
    if not centroids:
        raise ValueError("ivf_cell_rows needs at least one centroid")
    dim = len(centroids[0])

    def _transform(df: DataFrame) -> DataFrame:
        v = F.col(vec_col)
        sims = F.array(
            *[dot(F.array(*[F.lit(float(x)) for x in c]), v) for c in centroids]
        )
        cell = (F.array_position(sims, F.array_max(sims)) - 1).cast("int")
        return (
            df.filter(v.isNotNull() & (F.size(v) == dim))
            .select(
                cell.alias("cell"),
                F.col(id_col).alias("vec_id"),
                v.alias("emb"),
            )
        )

    return _transform


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kmeans_iters: int = 3,
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) coarse quantizer.

    Centroids come from :func:`kmeans_centroids` (deterministic
    spherical k-means; ``kmeans_iters=0`` degrades to the first-k
    init). Corpus vectors are assigned to their nearest centroid cell
    (argmax cosine against unit-norm centroid literals — all
    expression-side), queries probe their ``n_probe`` nearest cells,
    candidates come from a cell-key equi-join, and the exact cosine
    re-rank runs only within probed cells. Shuffle volume ∝ corpus
    (one cell key per vector), not corpus × queries.
    """
    cents = kmeans_centroids(corpus, n_cells, iters=kmeans_iters,
                             id_col=id_col, vec_col=vec_col)

    def cell_sims(vec: Column) -> Column:
        return F.array(*[dot(F.array(*[F.lit(x) for x in c]), vec) for c in cents])

    def corpus_cell(vec: Column) -> Column:
        s = cell_sims(vec)
        return (F.array_position(s, F.array_max(s)) - 1).cast("int")

    def probe_cells(vec: Column) -> Column:
        s = cell_sims(vec)
        ranked = F.array_sort(
            F.zip_with(
                s,
                F.sequence(F.lit(0), F.lit(len(cents) - 1)),
                lambda sim, i: F.struct((-sim).alias("neg"), i.cast("int").alias("cell")),
            )
        )
        return F.slice(F.transform(ranked, lambda x: x["cell"]), 1, n_probe)

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        norm(F.col(vec_col)).alias("cn"),
        corpus_cell(F.col(vec_col)).alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        norm(F.col(vec_col)).alias("qn"),
        F.explode(probe_cells(F.col(vec_col))).alias("cell"),
    )
    scored = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "sim", F.round(dot(F.col("qvec"), F.col("cvec")) / (F.col("qn") * F.col("cn")), 4)
        )
    )
    return _rank_cut(scored, k)


def neardup_pairs(
    corpus: DataFrame,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, sim ≥ threshold),
    EXACT, via block-partitioned all-pairs — the canonical distributed
    scheme for a computation that is intrinsically O(n²):

    * each vector gets a hash block id in [0, B); a vector is shipped to
      the B block-pair groups {(min(b,j), max(b,j)) : j} — bounded B×
      replication, NO driver collect, NO Cartesian/nested-loop join node;
    * every unordered pair of vectors meets in exactly ONE group
      (sorted pair of their block ids), where one ``numpy`` GEMM scores
      the block against the block — vectorized C, not per-pair
      expressions;
    * only surviving pairs (sim ≥ threshold) are shuffled out.

    B defaults to ~√(2·parallelism) so there are ~parallelism groups;
    at N executors the per-task matrix is (n/B)², so B also caps task
    memory. For approximate-is-fine dedup at extreme scale, prefer the
    sub-quadratic candidates of :func:`lsh_topk` / MinHash — exactness
    is what costs n² here, not the plan (brute-force crossJoin kept
    below as ``neardup_pairs_crossjoin``, the tiny-data test oracle).
    """
    import math

    spark = corpus.sparkSession
    if n_blocks is None:
        n_blocks = max(2, math.isqrt(2 * spark.sparkContext.defaultParallelism))
    B = n_blocks
    thr = float(threshold)

    blk = corpus.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(B)).cast("int").alias("blk"),
    )
    groups = F.array(*[
        F.struct(
            F.least(F.col("blk"), F.lit(j)).alias("gi"),
            F.greatest(F.col("blk"), F.lit(j)).alias("gj"),
        )
        for j in range(B)
    ])
    rep = blk.withColumn("g", F.explode(groups)).select(
        "vid", "vec", "blk", F.col("g.gi").alias("gi"), F.col("g.gj").alias("gj")
    )

    out_schema = "a long, b long, sim double"
    return rep.groupBy("gi", "gj").applyInPandas(_block_pair_scorer(thr), out_schema)


def _block_pair_scorer(thr: float):
    """applyInPandas kernel shared by :func:`neardup_pairs` (group key
    ``(gi, gj)``) and :func:`neardup_pairs_cells` (``(cell, gi, gj)``):
    the block-pair ids are the LAST TWO key elements. One GEMM per
    group; emits only pairs with raw sim ≥ ``thr``."""
    import numpy as np

    def score_group(key, pdf):
        import pandas as pd

        gi, gj = key[-2], key[-1]
        ids = pdf["vid"].to_numpy(dtype=np.int64)
        X = np.array(pdf["vec"].tolist(), dtype=np.float64)
        nrm = np.linalg.norm(X, axis=1, keepdims=True)
        nrm[nrm == 0] = 1.0
        Xn = X / nrm
        if gi == gj:
            S = Xn @ Xn.T
            ai, bj = np.triu_indices(len(ids), k=1)
            ids_a = ids_b = ids
        else:
            isa = pdf["blk"].to_numpy() == gi
            A, Bm = Xn[isa], Xn[~isa]
            ids_a, ids_b = ids[isa], ids[~isa]
            S = A @ Bm.T
            ai, bj = np.meshgrid(
                np.arange(len(ids_a)), np.arange(len(ids_b)), indexing="ij"
            )
            ai, bj = ai.ravel(), bj.ravel()
        sims = S[ai, bj]
        # threshold on the RAW sim (oracle semantics); also drop id-equal
        # pairs — two rows sharing a vec_id meet inside one block and
        # would emit an a==b self-pair the oracle's strict a<b excludes
        keep = (sims >= thr) & (ids_a[ai] != ids_b[bj])
        a_ids, b_ids, sims = ids_a[ai[keep]], ids_b[bj[keep]], sims[keep]
        lo = np.minimum(a_ids, b_ids)
        hi = np.maximum(a_ids, b_ids)
        return pd.DataFrame({"a": lo, "b": hi, "sim": _round_half_up4(sims)})

    return score_group


def neardup_pairs_lsh(
    corpus: DataFrame,
    threshold: float = 0.45,
    planes: int = 4,
    bands: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """APPROXIMATE near-dup pairs — the sub-quadratic 100 TB path
    (:func:`neardup_pairs` is exact but intrinsically O(n²) compute):
    SRP sign-bucket candidates (multi-band OR, same deterministic
    planes as :func:`lsh_topk`), then exact cosine verify ≥ threshold.
    Precision is exact (every emitted pair is verified); recall is the
    band-collision probability — high for true near-dups, measured in
    pytest against the exact operator. Shuffle ∝ corpus × bands;
    candidate volume ∝ colliding pairs, never all pairs."""
    sig = corpus.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        norm(F.col(vec_col)).alias("n_"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(bnd).alias("band"),
                    srp_signature(F.col(vec_col), planes, dim, bnd).alias("bucket"),
                )
                for bnd in range(bands)
            ])
        ).alias("bb"),
    ).select("vid", "vec", "n_", "bb.band", "bb.bucket")
    a = sig.select(F.col("vid").alias("a"), F.col("vec").alias("avec"),
                   F.col("n_").alias("an"), "band", "bucket")
    b = sig.select(F.col("vid").alias("b"), F.col("vec").alias("bvec"),
                   F.col("n_").alias("bn"), "band", "bucket")
    cands = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "avec", "bvec", "an", "bn")
        .distinct()
    )
    return (
        cands.withColumn(
            "_raw", dot(F.col("avec"), F.col("bvec")) / (F.col("an") * F.col("bn"))
        )
        .filter(F.col("_raw") >= threshold)  # RAW threshold — same as neardup_pairs/oracle
        .select("a", "b", F.round("_raw", 4).alias("sim"))
    )


def neardup_pairs_crossjoin(
    corpus: DataFrame,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All-pairs via crossJoin + per-pair expressions — O(n²) rows
    through the plan; kept ONLY as the tiny-data oracle for
    :func:`neardup_pairs` in pytest. Never use behind a contract query."""
    a = corpus.select(
        F.col(id_col).alias("a"), F.col(vec_col).alias("avec"), norm(F.col(vec_col)).alias("an")
    )
    b = corpus.select(
        F.col(id_col).alias("b"), F.col(vec_col).alias("bvec"), norm(F.col(vec_col)).alias("bn")
    )
    return (
        a.crossJoin(b)
        .filter(F.col("a") < F.col("b"))
        .withColumn(
            "_raw", dot(F.col("avec"), F.col("bvec")) / (F.col("an") * F.col("bn"))
        )
        .filter(F.col("_raw") >= threshold)  # RAW threshold — same as neardup_pairs/oracle
        .select("a", "b", F.round("_raw", 4).alias("sim"))
    )


def neardup_pairs_cells(
    corpus: DataFrame,
    threshold: float = 0.45,
    n_cells: int = 8,
    iters: int = 2,
    n_blocks: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style cell-bucketed near-dup pairs — the SUB-QUADRATIC
    semantic-dedup path (vs :func:`neardup_pairs`'s exact O(n²)):
    spherical k-means partitions the corpus into ``n_cells`` cells and
    all-pairs GEMM runs only WITHIN each cell, so compute drops from
    n² to Σ|cell|² (≈ n²/n_cells for balanced cells) and cross-cell
    pairs are never materialized. Near-duplicates, being each other's
    nearest vectors, land in the same cell with high probability —
    recall is measured in pytest against the exact operator on planted
    duplicates; precision is exact (every emitted pair is GEMM-verified
    at the raw threshold, same rounding as the oracle).

    Inside a cell the same hash-block pair decomposition as
    :func:`neardup_pairs` applies (group key ``(cell, gi, gj)``), so a
    hot cell is still bounded per-task: task memory is (|cell|/B)²,
    never |cell|². At 100 TB, ``n_cells`` scales with corpus size
    (cells ≈ n/target_cell_rows) while driver state stays
    n_cells×dim floats from :func:`kmeans_centroids`."""
    import math

    spark = corpus.sparkSession
    cents = kmeans_centroids(
        corpus, n_cells, iters=iters, id_col=id_col, vec_col=vec_col
    )
    if len(cents) <= 1:
        return neardup_pairs(corpus, threshold, id_col, vec_col, n_blocks)
    if n_blocks is None:
        # ~parallelism groups spread across cells
        n_blocks = max(
            2, math.isqrt(max(1, 2 * spark.sparkContext.defaultParallelism // len(cents)))
        )
    B = n_blocks

    # cell assignment: argmax cosine against broadcast centroid literals
    # (centroids are unit-norm, the vector's own norm is a constant per
    # row — pure expression, no UDF, identical idiom to ivf_topk)
    scores = F.array(*[
        dot(F.array(*[F.lit(x) for x in c]), F.col(vec_col)) for c in cents
    ])
    cell = (F.array_position(scores, F.array_max(scores)) - 1).cast("int")

    blk = corpus.filter(
        F.col(vec_col).isNotNull() & (F.size(F.col(vec_col)) == len(cents[0]))
    ).select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        cell.alias("cell"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(B)).cast("int").alias("blk"),
    )
    groups = F.array(*[
        F.struct(
            F.least(F.col("blk"), F.lit(j)).alias("gi"),
            F.greatest(F.col("blk"), F.lit(j)).alias("gj"),
        )
        for j in range(B)
    ])
    rep = blk.withColumn("g", F.explode(groups)).select(
        "vid", "vec", "blk", "cell", F.col("g.gi").alias("gi"), F.col("g.gj").alias("gj")
    )
    out_schema = "a long, b long, sim double"
    return rep.groupBy("cell", "gi", "gj").applyInPandas(
        _block_pair_scorer(float(threshold)), out_schema
    )


def semantic_dedup(
    corpus: DataFrame,
    threshold: float = 0.45,
    n_cells: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space duplicate-cluster assignment (SemDeDup): a
    cosine near-dup pair graph → distributed connected components →
    per-document ``(comp_id, cluster_size, is_survivor, max_sim)`` via
    :func:`~..operators.dedup.cluster_dedup` — the same contract as
    text cluster dedup, so "drop semantic duplicates" is
    ``semantic_dedup(df).filter("is_survivor")``.

    ``n_cells=None`` uses the exact pair graph (oracle-checkable);
    an int routes pair finding through :func:`neardup_pairs_cells`,
    the sub-quadratic path a 100 TB corpus needs."""
    from .dedup import cluster_dedup

    if n_cells is None:
        pairs = neardup_pairs(corpus, threshold, id_col, vec_col)
    else:
        pairs = neardup_pairs_cells(
            corpus, threshold, n_cells=n_cells, id_col=id_col, vec_col=vec_col
        )
    return cluster_dedup(corpus, pairs, id_col=id_col, sim_col="sim")


def gemm_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine via a BLAS kernel: the scale-path *exact*
    variant.

    ``brute_force_topk`` scores pairs with per-element ``zip_with``
    expressions — clean, but O(dim) interpreted work per pair. Here
    each corpus partition multiplies its (rows × dim) block against the
    broadcast unit-normalized query matrix in one ``numpy`` GEMM
    (``mapInPandas`` → Arrow batch → float64 matmul), emits only its
    per-batch top-k candidates per query, and a tiny global window
    merge ranks the ≤ partitions×k survivors — the canonical
    distributed exact-kNN: compute is vectorized C, shuffle volume is
    candidates, never pairs. Results are identical to
    ``brute_force_topk`` (same rounding and tie-break; asserted in
    tests and by sharing its DuckDB oracle).
    """
    import numpy as np

    out_schema = "query_id long, neighbor_id long, sim double"
    q_local = queries.select(id_col, vec_col).collect()
    if not q_local:
        # brute_force_topk returns empty here; match it instead of
        # letting np.linalg.norm choke on a 1-D empty array
        empty = corpus.sparkSession.createDataFrame([], out_schema)
        return empty.withColumn("rank", F.lit(1)).limit(0)
    q_ids = np.array([r[id_col] for r in q_local], dtype=np.int64)
    Q = np.array([list(r[vec_col]) for r in q_local], dtype=np.float64)
    qn = np.linalg.norm(Q, axis=1, keepdims=True)
    qn[qn == 0] = 1.0
    Qn = Q / qn

    def part(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            C = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            cn = np.linalg.norm(C, axis=1, keepdims=True)
            cn[cn == 0] = 1.0
            S = _round_half_up4((C / cn) @ Qn.T)  # rows × queries
            kk = min(k, S.shape[0])
            out_q, out_n, out_s = [], [], []
            for j, qid in enumerate(q_ids):
                col = S[:, j].copy()
                col[ids == qid] = -np.inf  # exclude self
                top = np.lexsort((ids, -col))[:kk]  # sim desc, id asc
                keep = top[np.isfinite(col[top])]
                out_q.extend([qid] * len(keep))
                out_n.extend(ids[keep])
                out_s.extend(col[keep])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "sim": out_s}
            )

    cand = corpus.mapInPandas(part, out_schema)
    return _rank_cut(cand, k)


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    n_cells: int = 64,
    rerank: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kmeans_iters: int = 3,
) -> DataFrame:
    """Approximate top-k via product quantization (PQ) with asymmetric
    distance computation and exact re-rank — the embedding-compression
    scale path: each corpus vector is stored as ``m`` one-byte codes
    (one per subspace, nearest of ``n_cells`` codebook centroids), so a
    100 TB float corpus becomes a few TB of codes; scanning is ``m``
    table lookups per vector instead of a ``dim``-wide dot product.

    Codebooks are trained PER SUBSPACE (the real PQ objective, as in
    FAISS): each of the ``m`` codebooks is an independent
    :func:`kmeans_centroids` run (``spherical=False`` — plain Lloyd's,
    L2 assignment) over that subspace's slice of the unit-normalized
    corpus vectors. Same deterministic first-k-by-id init; driver
    state is m × n_cells × (dim/m) floats. Per partition
    (``mapInPandas``):
    encode the batch, ADC-score it against every query's lookup table,
    keep the ``rerank·k`` best candidates, and re-rank those few with
    the EXACT cosine (the raw vectors are still in the batch — the
    classic PQ-then-refine). A tiny global window merge finishes.
    Recall is pytest-measured against the exact path.
    """
    import numpy as np

    out_schema = "query_id long, neighbor_id long, sim double"
    q_local = queries.select(id_col, vec_col).collect()
    if not q_local:
        empty = corpus.sparkSession.createDataFrame([], out_schema)
        return empty.withColumn("rank", F.lit(1)).limit(0)
    q_ids = np.array([r[id_col] for r in q_local], dtype=np.int64)
    Q = np.array([list(r[vec_col]) for r in q_local], dtype=np.float64)
    qn = np.linalg.norm(Q, axis=1, keepdims=True)
    qn[qn == 0] = 1.0
    Qn = Q / qn

    mode = (
        corpus.filter(F.col(vec_col).isNotNull())
        .groupBy(F.size(F.col(vec_col)).alias("n"))
        .count()
        .orderBy(F.col("count").desc(), F.col("n").asc())
        .limit(1)
        .collect()
    )  # most-common width, not first-row width (see kmeans_centroids)
    if not mode:
        empty = corpus.sparkSession.createDataFrame([], out_schema)
        return empty.withColumn("rank", F.lit(1)).limit(0)
    dim = int(mode[0]["n"])
    if dim < m:
        # one dimension per subspace is the finest meaningful split; a
        # zero-width subspace (dim // m == 0) would make every code 0
        # and silently collapse ADC recall to random
        m = dim
    sub = dim // m  # subspace width (ignore a ragged tail subspace)

    # per-subspace codebooks trained on slices of the UNIT-NORMALIZED
    # vectors (the same representation encode/ADC operate on). Staged
    # norm column so the transform lambda doesn't recompute the O(dim)
    # norm once per element.
    nv = (
        corpus.filter(F.col(vec_col).isNotNull() & (F.size(F.col(vec_col)) == dim))
        .select(
            F.col(id_col),
            F.col(vec_col),
            F.when(norm(F.col(vec_col)) == 0, F.lit(1.0))
            .otherwise(norm(F.col(vec_col)))
            .alias("_n"),
        )
        .select(
            F.col(id_col),
            F.transform(F.col(vec_col), lambda x: x / F.col("_n")).alias("_nv"),
        )
    )
    # cache the normalized corpus for the training loop: m subspace
    # k-means runs are ~m×(iters+3) Spark actions, and without the cache
    # every action re-reads the source and redoes the O(n·dim)
    # normalize+slice
    nv.persist()
    try:
        books = []
        for j in range(m):
            sub_df = nv.select(
                F.col(id_col), F.slice(F.col("_nv"), j * sub + 1, sub).alias(vec_col)
            )
            book = kmeans_centroids(
                sub_df, n_cells, iters=kmeans_iters,
                id_col=id_col, vec_col=vec_col, spherical=False,
            )
            if not book:
                empty = corpus.sparkSession.createDataFrame([], out_schema)
                return empty.withColumn("rank", F.lit(1)).limit(0)
            books.append(np.array(book, dtype=np.float64))  # m × (cells × sub)
    finally:
        nv.unpersist()

    # per-query ADC lookup tables: T[q][j][c] = dot(q_j, book_j[c])
    tables = np.stack(
        [np.stack([Qn[:, j * sub:(j + 1) * sub] @ books[j].T for j in range(m)], axis=1)]
    )[0]  # queries × m × cells

    def part(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            C = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            cn = np.linalg.norm(C, axis=1, keepdims=True)
            cn[cn == 0] = 1.0
            Cn = C / cn
            # encode: nearest centroid per subspace (L2 on unit-ish data)
            codes = np.empty((len(ids), m), dtype=np.int64)
            for j in range(m):
                d = ((Cn[:, None, j * sub:(j + 1) * sub]
                      - books[j][None, :, :]) ** 2).sum(axis=2)
                codes[:, j] = d.argmin(axis=1)
            out_q, out_n, out_s = [], [], []
            take = min(rerank * k, len(ids))
            for qi, qid in enumerate(q_ids):
                # ADC approximate score: sum of codebook dots
                approx = tables[qi][np.arange(m)[None, :], codes].sum(axis=1)
                approx[ids == qid] = -np.inf
                cand = np.argpartition(-approx, take - 1)[:take]
                cand = cand[np.isfinite(approx[cand])]
                # exact re-rank of the survivors only
                exact = _round_half_up4(Cn[cand] @ Qn[qi])
                order = np.lexsort((ids[cand], -exact))[: min(k, len(cand))]
                keep = cand[order]
                out_q.extend([qid] * len(keep))
                out_n.extend(ids[keep])
                out_s.extend(exact[order])
            yield pd.DataFrame({"query_id": out_q, "neighbor_id": out_n, "sim": out_s})

    cand = corpus.mapInPandas(part, out_schema)
    return _rank_cut(cand, k)
