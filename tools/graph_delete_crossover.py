"""Measure the graph-delete maintenance crossover: per-src REPAIR
(exact top-k for every survivor whose list touched a doomed id) vs full
REBUILD (blocked-GEMM kNN graph over the survivors), at sf1.

Repair cost ~ |affected| x n; rebuild ~ n x n with better tiling
constants — so past some affected fraction the rebuild wins. This tool
measures both walls at several delete fractions and prints the
SCALE.md row evidence for GrapeVectorDB.GRAPH_REBUILD_FRACTION.

Usage: python tools/graph_delete_crossover.py [sf_dir] [k]
Defaults: .testdata/sf1, k=8.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from grape_vector_db_spark.db import GrapeVectorDB  # noqa: E402
from grape_vector_db_spark.session import get_spark  # noqa: E402


def one_point(spark, emb, docs, k: int, pct: int, force: str) -> dict:
    """Build a fresh store + graph, delete ``pct``% of ids, time the
    cascade with the maintenance decision FORCED to repair or rebuild
    (by pinning GRAPH_REBUILD_FRACTION to 1.0 / 0.0)."""
    d = tempfile.mkdtemp(prefix="gvdb_gxover_")
    try:
        db = GrapeVectorDB(spark, d)
        db.add_documents(docs, emb)
        db.build_index("graph", k=k)
        db.GRAPH_REBUILD_FRACTION = 1.0 if force == "repair" else 0.0
        t0 = time.time()
        db.delete_documents(f"doc_id % 100 < {pct}")
        wall = time.time() - t0
        gst = db._table_stats("index_graph")
        return {
            "pct_deleted": pct,
            "forced": force,
            "decision": gst["delete_maintenance"],
            "affected_srcs": gst["affected_srcs"],
            "wall_s": round(wall, 1),
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else f"{REPO}/.testdata/sf1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark(app_name="gvdb-graph-xover")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").persist()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").persist()
    n = emb.count()
    docs.count()
    print(f"corpus {n} vectors, graph k={k}", flush=True)
    print("| %deleted | affected srcs | repair (s) | rebuild (s) |")
    print("|---|---|---|---|")
    for pct in (2, 5, 10, 20, 40):
        rep = one_point(spark, emb, docs, k, pct, "repair")
        reb = one_point(spark, emb, docs, k, pct, "rebuild")
        print(
            f"| {pct}% | {rep['affected_srcs']} | {rep['wall_s']} "
            f"| {reb['wall_s']} |",
            flush=True,
        )


if __name__ == "__main__":
    main()
