"""The corpus-curation job: committed tables, split pruning, and
content-determinism under repartitioning."""

import pyspark.sql.functions as F

from log_parser_project_spark.catalog import SnapshotCatalog
from log_parser_project_spark.plans.corpus import SPLITS, corpus_stats, curate, run_corpus


def test_run_corpus_commits_and_prunes(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cat = SnapshotCatalog(spark, str(tmp_path / "wh"))
    counts = run_corpus(spark, docs, cat)
    assert set(counts) <= set(SPLITS) and counts["train"] > 0
    # train scan prunes to its split= subtree
    cur = curate(docs)
    train = cat.read_table("corpus_docs", schema=cur.schema).filter(
        F.col("split") == "train"
    )
    plan = train.select("doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "split" in plan.split("PartitionFilters", 1)[1][:200]
    assert train.count() == counts["train"]
    # stats table committed and consistent with a fresh computation
    stats = cat.read_table("corpus_stats")
    fresh = corpus_stats(cur)
    assert sorted(map(tuple, stats.collect())) == sorted(map(tuple, fresh.collect()))


def test_curation_is_partitioning_invariant(spark, sf_dir):
    """md5-driven stages ⇒ identical curated set at any parallelism."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = sorted(map(tuple, corpus_stats(curate(docs)).collect()))
    b = sorted(map(tuple, corpus_stats(curate(docs.repartition(37))).collect()))
    assert a == b


def test_packing_respects_bin_arithmetic(spark, sf_dir):
    """Every doc's (bin, offset) obeys start = bin*max_len + offset and
    offsets stay inside the bin."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    c = curate(docs, max_len=4000)
    bad = c.filter(
        (F.col("pack_offset") < 0) | (F.col("pack_offset") >= 4000)
    ).count()
    assert bad == 0
