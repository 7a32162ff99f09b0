"""End-to-end log-analytics example — the log-mining path.

Run:  python examples/analyze_logs.py [log_dir]

With no argument it writes a small demo log directory (rotated files,
multiline stack traces) and analyzes it: exact-order ingestion →
multiline record assembly → template discovery → inventory drift
between the two halves of the fleet. This is the workflow for logs
you have NO registry for yet — `mine`'s output is what you'd turn
into grok patterns for jobs/run_pipeline.py --registry.
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, ".")  # run from the repo root

from pyspark.sql import functions as F  # noqa: E402

from log_parser_project_spark.operators.logmine import (  # noqa: E402
    assemble_records,
    mine_templates,
    template_drift,
)
from log_parser_project_spark.session import get_spark  # noqa: E402
from log_parser_project_spark.sources.textlog import read_text_log  # noqa: E402


def _demo_logs() -> str:
    d = Path(tempfile.mkdtemp(prefix="demo_logs_"))
    for host in range(4):
        lines = []
        for i in range(30):
            lines.append(f"2026-08-18 INFO request id={host * 100 + i} took {7 * i % 90}ms")
            if i % 9 == 0:
                lines.append(f"2026-08-18 ERROR upstream code={500 + i % 3}")
                lines.append("  at svc.call(Client.java:42)")
                lines.append("  at svc.retry(Client.java:77)")
            if host >= 2 and i % 11 == 0:  # only the canary half emits this
                lines.append(f"2026-08-18 WARN new_feature flag=0x{i:02X}")
        (d / f"host{host}.log").write_text("\n".join(lines) + "\n")
    return str(d)


def main(log_dir: str | None = None) -> None:
    spark = get_spark(parallelism=8)
    path = log_dir or _demo_logs()

    lines = read_text_log(spark, path)
    records = assemble_records(
        lines.withColumnRenamed("file", "conv_id").withColumnRenamed("line_no", "turn_idx"),
        is_start=~F.col("text").startswith("  "),
        text_col="text",
    )
    print("lines:", lines.count(), "| records:", records.count())

    print("\n-- template inventory (records, stack traces folded) --")
    mine_templates(records, text_col="record").orderBy(F.desc("n_lines")).show(truncate=58)

    print("-- drift: hosts 0-1 (side A) vs hosts 2-3 (side B) --")
    side_b = F.regexp_extract("conv_id", r"host([0-9]+)\.log", 1).cast("int") >= 2
    template_drift(records, side=side_b, text_col="record").orderBy(
        "status", F.desc("n_b")
    ).show(truncate=58)


if __name__ == "__main__":
    main(*sys.argv[1:])
