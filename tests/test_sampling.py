"""Exact-quota stratified sampling: the bucketed order-statistics plan
must (a) hit each stratum's ceil-quota exactly, (b) select the same
rows as the naive whole-stratum row_number() selection over the plain
(md5, key) order, and (c) be invariant to bucket depth and input
partitioning (the bucket id is a hash PREFIX, so bucket-major order
equals md5 order at every depth)."""

import math

import pyspark.sql.functions as F
from pyspark.sql import Window

from log_parser_project_spark.operators.sampling import stratified_sample_exact


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _naive(df, stratum, key, pct):
    """Single-window reference selection: first ceil-quota rows per
    stratum ordered by (md5(key), key) — no bucketing at all."""
    h = F.md5(F.col(key).cast("string"))
    w = Window.partitionBy(stratum).orderBy(h, key)
    n = Window.partitionBy(stratum)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_q", F.floor((F.count(F.lit(1)).over(n) * pct + 99) / F.lit(100)))
        .filter(F.col("_rn") <= F.col("_q"))
        .drop("_rn", "_q")
    )


def test_quota_exact_per_stratum(spark, sf_dir):
    d = _docs(spark, sf_dir)
    got = (
        stratified_sample_exact(d, "lang", "doc_id", pct=10)
        .groupBy("lang")
        .count()
        .collect()
    )
    want = {r["lang"]: math.ceil(r["count"] * 10 / 100) for r in d.groupBy("lang").count().collect()}
    assert {r["lang"]: r["count"] for r in got} == want


def test_matches_naive_window_selection(spark, sf_dir):
    d = _docs(spark, sf_dir)
    got = sorted(
        r["doc_id"]
        for r in stratified_sample_exact(d, "lang", "doc_id", pct=25).collect()
    )
    ref = sorted(r["doc_id"] for r in _naive(d, "lang", "doc_id", 25).collect())
    assert got == ref and len(got) > 0


def test_invariant_to_bucket_depth_and_partitioning(spark, sf_dir):
    d = _docs(spark, sf_dir)
    base = sorted(
        r["doc_id"]
        for r in stratified_sample_exact(d, "lang", "doc_id", pct=10).collect()
    )
    for chars in (1, 3):
        alt = sorted(
            r["doc_id"]
            for r in stratified_sample_exact(
                d, "lang", "doc_id", pct=10, bucket_hex_chars=chars
            ).collect()
        )
        assert alt == base, f"bucket_hex_chars={chars} changed the selection"
    rep = sorted(
        r["doc_id"]
        for r in stratified_sample_exact(
            d.repartition(37), "lang", "doc_id", pct=10
        ).collect()
    )
    assert rep == base


def test_session_window_exact_gap_boundary(spark):
    """Pin session_window's INCLUSIVE boundary (and the oracle's `>`
    condition) with crafted timestamps: an event exactly gap after the
    previous MERGES; one microsecond more splits. The real-data parity
    test can never hit this boundary (timestamps carry microsecond
    jitter), so it is pinned here explicitly."""
    from datetime import datetime, timedelta

    import pyspark.sql.functions as F

    t0 = datetime(2024, 1, 1)
    rows = [
        (1, t0), (1, t0 + timedelta(minutes=30)),                 # == gap: merge
        (2, t0), (2, t0 + timedelta(minutes=29, seconds=59)),     # < gap: merge
        (3, t0), (3, t0 + timedelta(minutes=30, microseconds=1)), # > gap: split
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    spark_sessions = {
        r[0]: r[1]
        for r in (
            df.groupBy("user_id", F.session_window("ts", "30 minutes"))
            .count()
            .groupBy("user_id")
            .count()
            .collect()
        )
    }
    assert spark_sessions == {1: 1, 2: 1, 3: 2}

    # the oracle's boundary-sum formulation agrees row for row
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE ev (user_id BIGINT, ts TIMESTAMP)")
    con.executemany("INSERT INTO ev VALUES (?, ?)", rows)
    oracle = dict(
        con.execute(
            """
        WITH o AS (
          SELECT user_id, epoch_us(ts) AS us,
                 LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev
          FROM ev
        ),
        s AS (
          SELECT user_id,
                 SUM(CASE WHEN prev IS NULL OR us - prev > 1800000000
                     THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY us
                       ROWS UNBOUNDED PRECEDING) AS sid
          FROM o
        )
        SELECT user_id, COUNT(DISTINCT sid) FROM s GROUP BY user_id
        """
        ).fetchall()
    )
    assert oracle == spark_sessions


def test_null_stratum_is_sampled(spark, sf_dir):
    """A NULL stratum must be sampled at the same ceil-quota as any
    other stratum (the join back to the prefix/quota plan is null-safe;
    a plain equi-join would silently drop every NULL-stratum row)."""
    import pyspark.sql.functions as F

    d = _docs(spark, sf_dir).withColumn(
        "lang", F.when(F.col("doc_id") % 3 == 0, None).otherwise(F.col("lang"))
    )
    got = {
        r["lang"]: r["count"]
        for r in stratified_sample_exact(d, "lang", "doc_id", pct=10)
        .groupBy("lang")
        .count()
        .collect()
    }
    want = {
        r["lang"]: math.ceil(r["count"] * 10 / 100)
        for r in d.groupBy("lang").count().collect()
    }
    assert None in want and got == want


def test_sessionize_oracle_handles_tied_timestamps(spark):
    """Two events with IDENTICAL timestamps right after a session
    boundary: Spark's session_window necessarily groups them together;
    the oracle's running boundary sum must order by (us, event_id) —
    ordered by us alone the tied rows are peers in arbitrary order and
    session assignment flickers."""
    from datetime import datetime, timedelta

    import duckdb
    import pyspark.sql.functions as F

    t0 = datetime(2024, 1, 1)
    rows = [
        (7, 1, t0),
        (7, 5, t0 + timedelta(minutes=31)),
        (7, 9, t0 + timedelta(minutes=31)),  # tied with event 5
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
    spark_sessions = (
        df.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .count()
        .select("count")
        .collect()
    )
    assert sorted(r[0] for r in spark_sessions) == [1, 2]

    con = duckdb.connect()
    con.execute("CREATE TABLE ev (user_id BIGINT, event_id BIGINT, ts TIMESTAMP)")
    con.executemany("INSERT INTO ev VALUES (?, ?, ?)", rows)
    oracle = con.execute(
        """
        WITH o AS (
          SELECT user_id, event_id, epoch_us(ts) AS us,
                 LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
          FROM ev
        ),
        s AS (
          SELECT user_id,
                 SUM(CASE WHEN prev IS NULL OR us - prev > 1800000000
                     THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY us, event_id
                       ROWS UNBOUNDED PRECEDING) AS sid
          FROM o
        )
        SELECT sid, COUNT(*) FROM s GROUP BY sid
        """
    ).fetchall()
    assert sorted(n for _, n in oracle) == [1, 2]


def test_hll_rollup_is_union_associative_and_accurate(spark, sf_dir):
    """Estimate over a union of daily sketches must equal the estimate
    of one sketch built over the whole range (loss-free merge), and sit
    within HLL error of the exact distinct count."""
    import pyspark.sql.functions as F

    from log_parser_project_spark.operators.sketches import (
        daily_sketches,
        rollup_estimate,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    merged = rollup_estimate(daily_sketches(ev)).collect()[0]
    direct = ev.agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col("user_id").cast("string"), F.lit(12))
        ).alias("est")
    ).collect()[0]["est"]
    assert merged["distinct_est"] == direct  # associativity: exactly equal
    exact = ev.select("user_id").distinct().count()
    assert abs(merged["distinct_est"] - exact) / exact < 0.05
    assert merged["n_rows"] == ev.count()


def test_histogram_rollup_is_loss_free_and_bounded(spark, sf_dir):
    """Fixed-boundary histogram sketches: (a) merging daily sketches
    gives BIT-IDENTICAL bucket counts — hence identical quantile
    estimates — to one histogram over the whole range; (b) estimates
    sit within one bucket width of the exact percentile; (c) bucket
    counts match an exact DuckDB oracle."""
    import duckdb
    import pyspark.sql.functions as F

    from log_parser_project_spark.operators.sketches import (
        daily_histograms,
        equiwidth_boundaries,
        quantile_rollup,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    bnds = equiwidth_boundaries(ev, "value", n_buckets=64)
    daily = daily_histograms(ev, "value", bnds).cache()

    # (a) loss-free merge: daily-rollup == single global histogram
    global_hist = daily_histograms(
        ev.withColumn("ts", F.lit("2000-01-01").cast("timestamp")), "value", bnds
    )
    merged_counts = sorted(
        (r.bucket, r.cnt)
        for r in daily.groupBy("bucket").agg(F.sum("cnt").alias("cnt")).collect()
    )
    direct_counts = sorted((r.bucket, r.cnt) for r in global_hist.collect())
    assert merged_counts == direct_counts

    est = {
        r.q: r.estimate
        for r in quantile_rollup(daily, bnds, [0.1, 0.5, 0.9, 0.99]).collect()
    }
    exact = ev.selectExpr(
        "percentile(CAST(value AS DOUBLE), array(0.1, 0.5, 0.9, 0.99)) AS p"
    ).collect()[0]["p"]
    width = bnds[1] - bnds[0]
    for q, x in zip([0.1, 0.5, 0.9, 0.99], exact):
        assert abs(est[q] - x) <= width + 1e-9, (q, est[q], x, width)

    # (c) exact oracle for the sketch table itself
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')")
    bl = ",".join(repr(b) for b in bnds)
    oracle = sorted(
        tuple(r)
        for r in con.execute(
            f"""
            SELECT CAST(ts AS DATE) AS day,
                   (SELECT COUNT(*) FROM unnest([{bl}]) AS t(b)
                    WHERE b <= CAST(value AS DOUBLE)) AS bucket,
                   COUNT(*) AS cnt
            FROM events WHERE value IS NOT NULL GROUP BY 1, 2
            """
        ).fetchall()
    )
    got = sorted((r.day, r.bucket, r.cnt) for r in daily.collect())
    assert got == oracle


def test_remove_common_units_strips_planted_boilerplate(spark):
    """CCNet-style line removal: a header/footer line shared by 3 of 4
    docs is stripped everywhere; unique lines keep their order; short
    shared lines (< min_chars) survive; null text passes through."""
    from log_parser_project_spark.operators.text import remove_common_units

    hdr, ftr = "SITE NAVIGATION MENU", "copyright footer line"
    docs = [
        (1, f"{hdr}\nalpha body one\nok\n{ftr}"),
        (2, f"{hdr}\nbeta body two\nok\n{ftr}"),
        (3, f"{hdr}\ngamma body three\n{ftr}"),
        (4, "standalone doc\nok"),
        (5, None),
        (6, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r.doc_id: (r.clean_text, r.n_removed)
        for r in remove_common_units(
            df, delimiter="\n", min_docs=3, min_chars=5
        ).collect()
    }
    assert out[1] == ("alpha body one\nok", 2)
    assert out[2] == ("beta body two\nok", 2)
    assert out[3] == ("gamma body three", 2)
    assert out[4] == ("standalone doc\nok", 0)  # "ok" short → never common
    assert out[5] == (None, 0)
    assert out[6] == ("", 0)  # empty text splits to one empty unit, kept
    assert len(out) == 6


def test_remove_common_units_pct_threshold_integer_math(spark):
    """Percent threshold fires at exactly df*100 >= n_docs*pct: with 5
    docs and pct=40, a unit in 2 docs (200 >= 200) is removed."""
    from log_parser_project_spark.operators.text import remove_common_units

    df = spark.createDataFrame(
        [(i, "shared line here\nuniq%d" % i) for i in range(2)]
        + [(i, "uniq%d" % i) for i in range(2, 5)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.clean_text for r in remove_common_units(
        df, delimiter="\n", min_doc_pct=40, min_chars=5).collect()}
    assert out[0] == "uniq0" and out[1] == "uniq1"
    assert out[4] == "uniq4"


def test_domain_mix_matches_integer_oracle(spark, sf_dir):
    """domain_mix vs a driver-side python replay of the exact same
    integer decision rule (hashlib md5, τ=0.5, frac=50%): identical
    kept set and rates, and the flattening is real — the smallest
    domain keeps a strictly higher rate than the largest."""
    import hashlib

    from log_parser_project_spark.operators.sampling import domain_mix

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = docs.select("doc_id", "source").collect()
    counts: dict[str, int] = {}
    for r in rows:
        counts[r.source] = counts.get(r.source, 0) + 1
    total = sum(counts.values())
    s_tau = sum(c ** 0.5 for c in counts.values())
    rate_e9 = {
        s: int(min(1.0, 0.5 * total * (c ** 0.5) / (s_tau * c)) * 1e9 + 0.5)
        for s, c in counts.items()
    }
    want = set()
    for r in rows:
        h32 = int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:8], 16)
        if h32 * 1_000_000_000 < rate_e9[r.source] * 4_294_967_296:
            want.add((r.doc_id, r.source, rate_e9[r.source]))

    got = {
        (r.doc_id, r.source, r.rate_e9)
        for r in domain_mix(
            docs, "source", "doc_id", temperature=0.5, target_frac_pct=50
        ).select("doc_id", "source", "rate_e9").collect()
    }
    assert got == want and want  # non-trivial sample

    # flattening property on a deliberately skewed corpus (testdata
    # sources are near-uniform): the small domain keeps a strictly
    # higher rate, and with τ=1 the rates collapse to the flat frac.
    skewed = spark.createDataFrame(
        [(i, "big" if i < 90 else "small") for i in range(100)],
        "doc_id long, source string",
    )
    r_tau = {
        r.source: r.rate_e9
        for r in domain_mix(skewed, "source", "doc_id", temperature=0.5)
        .select("source", "rate_e9").distinct().collect()
    }
    assert r_tau["small"] > r_tau["big"]
    r_flat = {
        r.source: r.rate_e9
        for r in domain_mix(skewed, "source", "doc_id", temperature=1.0)
        .select("source", "rate_e9").distinct().collect()
    }
    assert r_flat == {"big": 500000000, "small": 500000000}


def test_quantile_rollup_and_select_validate_arguments(spark):
    """Empty quantile list and keep-mode typos fail loudly, not with an
    IndexError or a silently inverted selection."""
    import pytest

    from log_parser_project_spark.operators.sampling import ordered_stratified_select
    from log_parser_project_spark.operators.sketches import quantile_rollup

    hists = spark.createDataFrame([("a", 0, 1)], "g string, bucket int, cnt long")
    with pytest.raises(ValueError):
        quantile_rollup(hists, [0.0, 1.0], [], "g")
    df = spark.createDataFrame([("a", 1)], "s string, v int")
    with pytest.raises(ValueError):
        ordered_stratified_select(
            df, "s", F.col("v"), "v", 50, F.col("v"), keep="frist"
        )


def test_remove_common_units_roundtrip_with_special_delimiters(spark):
    """With an impossible threshold the operator must be an exact
    identity (split → anti-join nothing → ordered reassembly), even for
    regex-metacharacter delimiters ('|', '.') — the split pattern is
    re.escape'd, so these must not act as regex operators."""
    from log_parser_project_spark.operators.text import remove_common_units

    texts = [
        "a|b|c||d", "x.y..z", "no delims here", "", "trail|", "|lead",
        "mixed.|.both|x",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    for delim in ("|", "."):
        out = {
            r.doc_id: (r.clean_text, r.n_removed)
            for r in remove_common_units(
                df, delimiter=delim, min_docs=10_000, min_chars=1
            ).collect()
        }
        for i, t in enumerate(texts):
            assert out[i] == (t, 0), (delim, t, out[i])


def test_chunk_documents_overlap_and_tail(spark):
    from log_parser_project_spark.operators.sampling import chunk_documents

    toks = " ".join(f"t{i}" for i in range(1, 11))  # 10 tokens
    df = spark.createDataFrame(
        [(1, toks), (2, "a b c"), (3, "")], "doc_id long, text string"
    )
    got = {(r.doc_id, r.chunk_idx): r for r in chunk_documents(df, size=4, stride=3).collect()}
    # doc 1 (10 tokens): candidate starts 1,4,7,10 — start 10's window
    # ("t10") is a strict suffix of the previous chunk, so it is
    # SUPPRESSED (it would plant a verbatim duplicate passage)
    assert [got[(1, i)].chunk for i in range(3)] == [
        "t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10",
    ]
    assert (1, 3) not in got
    # doc shorter than size -> exactly one chunk
    assert [k for k in got if k[0] == 2] == [(2, 0)]
    assert got[(2, 0)].chunk == "a b c" and got[(2, 0)].n_tokens == 3
    # empty doc -> no chunks
    assert not [k for k in got if k[0] == 3]


def test_chunk_documents_rejects_bad_stride(spark):
    import pytest as _pytest

    from log_parser_project_spark.operators.sampling import chunk_documents

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        chunk_documents(df, size=4, stride=5)
    with _pytest.raises(ValueError):
        chunk_documents(df, size=4, stride=0)


def test_chunk_documents_tail_kept_when_it_adds_tokens(spark):
    from log_parser_project_spark.operators.sampling import chunk_documents

    toks = " ".join(f"t{i}" for i in range(1, 12))  # 11 tokens
    df = spark.createDataFrame([(1, toks)], "doc_id long, text string")
    got = {r.chunk_idx: r for r in chunk_documents(df, size=4, stride=3).collect()}
    # starts 1,4,7,10: start 10's window reaches t11, unseen by start 7
    assert got[3].chunk == "t10 t11" and got[3].n_tokens == 2
    assert len(got) == 4


def test_chunk_documents_properties_fuzz(spark):
    """Property fuzz over random docs (one Spark job per (size, stride)
    pair — the parameters are plan constants, so docs batch per pair):
    every token position is covered by >=1 chunk, the last kept chunk
    always ends at the final token, no chunk is a substring-suffix
    duplicate of its predecessor, and chunk_idx is contiguous from 0."""
    import random

    from log_parser_project_spark.operators.sampling import chunk_documents

    rng = random.Random(7)
    docs, params = [], {}
    did = 0
    for size, stride in [(4, 3), (4, 4), (8, 2), (6, 1), (5, 5)]:
        for _ in range(6):
            n = rng.randrange(0, 30)
            docs.append((did, size, stride, " ".join(f"w{i}" for i in range(1, n + 1)), n))
            params[did] = (size, stride, n)
            did += 1
    for size, stride in sorted({(s, t) for _, s, t, _, _ in docs}):
        batch = [(d, txt) for d, s, t, txt, _ in docs if (s, t) == (size, stride)]
        df = spark.createDataFrame(batch, "doc_id long, text string")
        out = {}
        for r in chunk_documents(df, size=size, stride=stride).collect():
            out.setdefault(r.doc_id, []).append(r)
        for d, _txt in batch:
            n = params[d][2]
            chunks = sorted(out.get(d, []), key=lambda r: r.chunk_idx)
            if n == 0:
                assert not chunks
                continue
            assert [c.chunk_idx for c in chunks] == list(range(len(chunks)))
            covered = set()
            prev_end = 0
            for c in chunks:
                start = c.chunk_idx * stride + 1
                end = start + c.n_tokens - 1
                assert c.chunk.split(" ") == [f"w{i}" for i in range(start, end + 1)]
                assert c.chunk_idx == 0 or end > prev_end  # adds unseen tokens
                covered.update(range(start, end + 1))
                prev_end = end
            assert prev_end == n        # last chunk reaches the final token
            assert covered == set(range(1, n + 1))  # full coverage, no gaps


def test_mask_template_is_idempotent(spark):
    """Masking a masked line is a no-op (<N>/<HEX> contain no digits),
    so template mining composes safely with pre-masked input. The REAL
    mask_template column is cross-checked against the python replica
    on every sample (one Spark job), then idempotence is fuzzed on the
    proven-equal replica."""
    import random
    import re as _re

    from log_parser_project_spark.operators.logmine import mask_template

    def mask(s):
        return _re.sub(r"[0-9]+", "<N>", _re.sub(r"0x[0-9a-fA-F]+", "<HEX>", s))

    rng = random.Random(11)
    alphabet = "ab 0x9F 17 <N> code= :"
    samples = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 40)))
        for _ in range(200)
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(samples)], "i long, s string")
    got = {r.i: r.m for r in df.select("i", mask_template("s").alias("m")).collect()}
    for i, s in enumerate(samples):
        assert got[i] == mask(s), s            # Spark column == replica
        assert mask(mask(s)) == mask(s), s     # idempotence


def test_importance_resample_prefers_target_like_docs(spark):
    import pytest as _pytest

    from log_parser_project_spark.operators.sampling import importance_resample

    # target vocabulary {alpha..delta}; source vocabulary {w1..w8}
    rows = []
    for i in range(8):
        rows.append((i, "t", "alpha beta gamma delta alpha beta"))
    for i in range(8, 24):
        rows.append((i, "s", "w1 w2 w3 w4 w5 w6 w7 w8"))
    rows.append((24, "s", "alpha beta gamma delta"))  # target-LIKE source doc
    rows.append((25, "s", ""))                        # empty: no score row
    df = spark.createDataFrame(rows, "doc_id long, grp string, text string")
    got = {r.doc_id: r for r in
           importance_resample(df, is_target=F.col("grp") == "t", buckets=64).collect()}
    assert 25 not in got
    target_scores = [got[i].score_e4 for i in range(8)]
    source_scores = [got[i].score_e4 for i in range(8, 24)]
    assert min(target_scores) > max(source_scores)
    assert got[24].score_e4 == got[0].score_e4 or got[24].keep  # target-like kept
    assert all(got[i].keep for i in range(8)) and not any(got[i].keep for i in range(8, 24))
    # parallelism-invariant (content-deterministic)
    again = {r.doc_id: r.score_e4 for r in
             importance_resample(df.repartition(13), is_target=F.col("grp") == "t",
                                 buckets=64).collect()}
    assert again == {k: v.score_e4 for k, v in got.items()}
    with _pytest.raises(ValueError, match="no tokens"):
        importance_resample(df.filter("grp = 's'"), is_target=F.col("grp") == "t")


def test_importance_resample_null_target_rows_count_as_source(spark):
    from log_parser_project_spark.operators.sampling import importance_resample

    rows = [(1, "t", "alpha beta"), (2, None, "w1 w2"), (3, "s", "w1 w2")]
    df = spark.createDataFrame(rows, "doc_id long, grp string, text string")
    # grp == 't' is NULL for row 2 — must behave as source (ELSE 0), not crash
    got = {r.doc_id: r for r in
           importance_resample(df, is_target=F.col("grp") == "t", buckets=64).collect()}
    assert got[2].score_e4 == got[3].score_e4  # identical source-side docs
    assert got[1].keep and got[1].score_e4 > got[2].score_e4


# ---------------------------------------------------------------------------
# size-targeted training shards (plan_shards / write_training_shards)
# ---------------------------------------------------------------------------

def _shard_corpus(spark, n=120, seed_width=37):
    rows = [(i, "x" * (10 + (i * seed_width) % 90)) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_plan_shards_sequential_fill_and_determinism(spark):
    from log_parser_project_spark.operators.sampling import plan_shards

    df = _shard_corpus(spark)
    sz = F.coalesce(F.octet_length("text"), F.lit(0))
    got = plan_shards(df, key="doc_id", size_col=sz, target_bytes=500)
    rows = got.select("doc_id", "shard_id", "shard_pos",
                      F.octet_length("text").alias("b")).collect()
    by_id = {r.doc_id: r for r in rows}

    # replay the fill in plain python over the same (md5, id) order
    import hashlib

    order = sorted(by_id, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    start = 0
    for i in order:
        assert by_id[i].shard_id == start // 500, f"doc {i}"
        assert by_id[i].shard_pos == start % 500, f"doc {i}"
        start += by_id[i].b

    # shard ids dense from 0; every shard ends within target + max_doc
    per = {}
    for r in rows:
        per.setdefault(r.shard_id, 0)
        per[r.shard_id] += r.b
    assert sorted(per) == list(range(len(per)))
    max_doc = max(r.b for r in rows)
    assert all(v <= 500 + max_doc for v in per.values())

    # content-deterministic: identical assignment at other parallelism
    # and bucket depth
    again = plan_shards(df.repartition(13), key="doc_id", size_col=sz,
                        target_bytes=500, bucket_hex_chars=1)
    assert sorted((r.doc_id, r.shard_id, r.shard_pos) for r in
                  again.select("doc_id", "shard_id", "shard_pos").collect()) \
        == sorted((r.doc_id, r.shard_id, r.shard_pos) for r in rows)


def test_write_training_shards_one_file_per_shard_and_manifest(spark, tmp_path):
    import json
    import os

    from log_parser_project_spark.operators.sampling import write_training_shards

    df = _shard_corpus(spark, n=80)
    out = str(tmp_path / "shards")
    sz = F.coalesce(F.octet_length("text"), F.lit(0))
    summary = write_training_shards(df, out, key="doc_id", size_col=sz,
                                    target_bytes=600)
    assert summary["n_docs"] == 80
    assert summary["n_shards"] >= 2

    # one data file per shard directory
    shard_dirs = [d for d in os.listdir(out) if d.startswith("shard_id=")]
    assert len(shard_dirs) == summary["n_shards"]
    for d in shard_dirs:
        files = [f for f in os.listdir(os.path.join(out, d))
                 if f.endswith(".json")]
        assert len(files) == 1, f"{d}: {files}"

    # read-back set equality + manifest totals agree with the data
    back = spark.read.json(out)
    assert back.count() == 80
    assert sorted(r.doc_id for r in back.select("doc_id").collect()) \
        == list(range(80))
    man = spark.read.json(os.path.join(out, "_manifest"))
    m = {r.shard_id: r for r in man.collect()}
    got = back.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.octet_length("text")).alias("b")).collect()
    for r in got:
        assert m[r.shard_id].n_docs == r.n
        assert m[r.shard_id].shard_bytes == r.b
    with open(os.path.join(out, "_summary.json")) as f:
        assert json.load(f) == summary


def test_heavy_hitter_bounds_contain_exact_counts(spark, sf_dir):
    from log_parser_project_spark.operators.sketches import (
        daily_topk_summaries,
        heavy_hitters_rollup,
    )
    from log_parser_project_spark.operators.timeseries import bucket_epoch

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    day = bucket_epoch("ts", 86400)
    kept, resid = daily_topk_summaries(e, key="user_id", capacity=4, day=day)
    got = heavy_hitters_rollup(kept, resid, key="user_id", n=20).collect()
    exact = {
        r.user_id: r.n
        for r in e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got, "rollup returned nothing"
    for r in got:
        assert r.lower_bound <= exact[r.user_id] <= r.upper_bound, (
            f"user {r.user_id}: exact {exact[r.user_id]} outside "
            f"[{r.lower_bound}, {r.upper_bound}]"
        )
    # ranked by lower bound desc, key asc — deterministic
    keys = [(r.rank, -r.lower_bound, r.user_id) for r in got]
    assert keys == sorted(keys)

    # the MG guarantee: any key whose true count exceeds the total
    # residual budget must be present in the merged summary
    total_resid = sum(r.residual for r in resid.collect())
    present = {
        r.user_id
        for r in kept.select("user_id").distinct().collect()
    }
    for uid, n in exact.items():
        if n > total_resid:
            assert uid in present, f"guaranteed hitter {uid} missing"


def test_heavy_hitter_summary_is_exact_at_full_capacity(spark, sf_dir):
    from log_parser_project_spark.operators.sketches import (
        daily_topk_summaries,
        heavy_hitters_rollup,
    )
    from log_parser_project_spark.operators.timeseries import bucket_epoch

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    day = bucket_epoch("ts", 86400)
    # capacity >= per-day distinct keys: nothing dropped, residuals 0,
    # bounds collapse to the exact counts
    cap = e.groupBy(day.alias("d"), "user_id").count() \
        .groupBy("d").count().agg(F.max("count")).collect()[0][0]
    kept, resid = daily_topk_summaries(e, key="user_id", capacity=int(cap), day=day)
    assert resid.agg(F.sum("residual")).collect()[0][0] == 0
    got = heavy_hitters_rollup(kept, resid, key="user_id", n=5).collect()
    exact = {
        r.user_id: r.n
        for r in e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for r in got:
        assert r.lower_bound == r.upper_bound == exact[r.user_id]


def test_plan_shards_guards_and_duplicate_keys(spark, tmp_path):
    import pytest as _pytest

    from log_parser_project_spark.operators.sampling import (
        plan_shards,
        write_training_shards,
    )

    sz = F.coalesce(F.octet_length("text"), F.lit(0))
    df = _shard_corpus(spark, n=10)
    with _pytest.raises(ValueError, match="target_bytes"):
        plan_shards(df, key="doc_id", size_col=sz, target_bytes=0)

    # duplicate key values (same ordering hash): the explicit ROWS
    # frame must still give every row its own exclusive byte range —
    # no overlapping offsets inside a shard
    dup = spark.createDataFrame(
        [(1, "aaaa"), (1, "bbbbbb"), (1, "cc"), (2, "ddd")],
        "doc_id long, text string",
    )
    rows = plan_shards(dup, key="doc_id", size_col=sz,
                       target_bytes=1000).collect()
    offsets = sorted(r.shard_pos for r in rows)
    assert len(set(offsets)) == len(rows)  # all distinct
    total = sum(len(r.text) for r in rows)
    assert max(r.shard_pos + len(r.text) for r in rows) == total

    # empty input: a clean zero summary, not a TypeError
    out = str(tmp_path / "empty_shards")
    summary = write_training_shards(
        df.filter(F.lit(False)), out, key="doc_id", size_col=sz,
        target_bytes=100,
    )
    assert summary["n_shards"] == 0 and summary["n_docs"] == 0
    assert summary["total_bytes"] == 0


def test_moment_correlation_matches_numpy_and_is_partition_invariant(spark):
    import numpy as np

    from log_parser_project_spark.operators.aggregate import moment_correlation

    rows = [(i, "g%d" % (i % 2), i * 3 + (i % 5), 100 - i) for i in range(60)]
    df = spark.createDataFrame(rows, "i long, g string, x long, y long")
    got = {
        r.g: (r.n, r.corr)
        for r in moment_correlation(df, F.col("x"), F.col("y"),
                                    group_by=["g"]).collect()
    }
    for g in ("g0", "g1"):
        xs = np.array([r[2] for r in rows if r[1] == g], dtype=float)
        ys = np.array([r[3] for r in rows if r[1] == g], dtype=float)
        want = np.corrcoef(xs, ys)[0, 1]
        assert got[g][0] == 30
        assert abs(got[g][1] - want) < 1e-4
    # zero variance -> NULL, never a division error
    const = spark.createDataFrame([(1, 5, 7), (2, 5, 9)], "i long, x long, y long")
    r = moment_correlation(const, F.col("x"), F.col("y")).collect()[0]
    assert r.corr is None
    # content-deterministic: identical at any partitioning
    a = sorted(map(tuple, moment_correlation(df, F.col("x"), F.col("y"),
                                             group_by=["g"]).collect()))
    b = sorted(map(tuple, moment_correlation(df.repartition(13), F.col("x"),
                                             F.col("y"), group_by=["g"]).collect()))
    assert a == b


def test_profile_moments_overflow_guard(spark, sf_dir):
    """moment_correlation documents (but cannot enforce) the BIGINT
    precondition on its moment sums — outside ANSI mode an overflow
    wraps SILENTLY into a plausible-looking coefficient. This pins the
    guard for the contract query's actual inputs: the worst-case sum
    bound n·max(x²) (and the cross term n·max|x|·max|y|) must fit
    BIGINT for q_profile_correlation's (cents, hour) columns."""
    from log_parser_project_spark.queries import cents

    e = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
        F.col("value").isNotNull()
    )
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    hour = ((us - us % 3_600_000_000) / 3_600_000_000 % 24).cast("long")
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.max(F.abs(cents("value"))).alias("mx"),
        F.max(F.abs(hour)).alias("my"),
    ).collect()[0]
    for bound in (row.n * row.mx**2, row.n * row.my**2, row.n * row.mx * row.my):
        assert bound < 2**63  # headroom at this SF is ~10 orders of magnitude
