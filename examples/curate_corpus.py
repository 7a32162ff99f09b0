"""End-to-end corpus curation example — the training-data path.

Run:  python examples/curate_corpus.py [sf_dir]   (default sf0.001)

Chains the engine's dataset-prep operators over the documents table:
model-based quality filter → exact dedup survivor selection →
duplicate-span accounting → leakage-free split → overlapping context
chunks. Every step is a lazy DataFrame transform; the report at the
end runs several actions, so the shared prefix (quality filter +
dedup) is persisted once instead of recomputing from parquet per
action.
"""

import sys

sys.path.insert(0, ".")  # run from the repo root

from pyspark.sql import functions as F  # noqa: E402

from log_parser_project_spark.operators.dedup import dup_span_coverage, exact_dedup  # noqa: E402
from log_parser_project_spark.operators.sampling import chunk_documents, hash_split  # noqa: E402
from log_parser_project_spark.operators.text import hashed_linear_score, tokens  # noqa: E402
from log_parser_project_spark.session import get_spark  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark(parallelism=8)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 1. model-based quality filter (hashing-trick linear scorer)
    scored = docs.withColumn("score", hashed_linear_score(tokens("text")))
    kept = scored.filter(F.col("score") >= 0)

    # 2. exact dedup (md5 fingerprint, min-id survivor) — persisted:
    # every report line below branches off this frame
    unique = exact_dedup(kept).persist()

    # 3. duplicate-span accounting (Lee et al.) — report, don't drop
    spans = dup_span_coverage(unique, n=5)

    # 4. leakage-free train/val/test split by content hash
    split = hash_split(unique, key="doc_id", splits={"train": 90, "val": 5, "test": 5})

    # 5. overlapping context windows for the trainer
    chunks = chunk_documents(split.filter(F.col("split") == "train"), size=64, stride=48)

    print("docs:", docs.count(), "| kept:", kept.count(), "| unique:", unique.count())
    split.groupBy("split").count().orderBy("split").show()
    print("train chunks:", chunks.count())
    spans.orderBy(F.desc("n_dup")).show(5, truncate=50)


if __name__ == "__main__":
    main(*sys.argv[1:])
