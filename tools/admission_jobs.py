"""Job-count + wall evidence for the persisted per-doc shingle-size table
(VERDICT r7 #7): admit a second micro-batch against a seeded corpus twice
on identical copies of the state — once probing the maintained
``{shingles}_sizes`` artifact, once falling back to the legacy per-batch
corpus-side ``groupBy(doc_id).count()`` over the corpus shingle table —
and report Spark job counts (statusTracker per job group) and wall time
at both scale tiers.

Usage: python tools/admission_jobs.py [sf_dir ...]
Defaults: /root/testdata/sf0.1 and .testdata/sf1 (if present).
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

from grape_vector_db_spark.session import get_spark  # noqa: E402
from grape_vector_db_spark.streaming.ingest import admit_merge_batch  # noqa: E402


def measure(spark, sf_dir: str) -> dict:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    seed = docs.where(F.col("doc_id") % 2 == 0)
    batch2 = docs.where(F.col("doc_id") % 2 == 1)

    base = tempfile.mkdtemp(prefix="gvdb_admjobs_")
    out = {}
    try:
        seed_dir = f"{base}/seed"
        paths = lambda root: (  # noqa: E731
            f"{root}/docs", f"{root}/shingles", f"{root}/sigs"
        )
        t, sh, sg = paths(seed_dir)
        # seed the corpus + index (maintains the sizes artifact too)
        admit_merge_batch(spark, seed, t, sh, sg)

        sc = spark.sparkContext
        for variant in ("with_sizes", "legacy_aggregate"):
            root = f"{base}/{variant}"
            shutil.copytree(seed_dir, root)
            t, sh, sg = paths(root)
            # legacy shape: point at a path with no sizes table — the
            # fallback re-aggregates sizes from the corpus shingle table
            sizes = None if variant == "with_sizes" else f"{root}/nosizes"
            group = f"adm-{variant}-{os.path.basename(sf_dir)}"
            sc.setJobGroup(group, group)
            t0 = time.time()
            admit_merge_batch(spark, batch2, t, sh, sg, sizes_path=sizes)
            wall = round(time.time() - t0, 3)
            sc.setJobGroup(f"{group}-done", "done")
            jobs = len(sc.statusTracker().getJobIdsForGroup(group))
            out[variant] = {"jobs": jobs, "wall_s": wall}
            print(
                f"  {os.path.basename(sf_dir)} {variant}: {jobs} jobs, "
                f"{wall}s",
                file=sys.stderr,
            )
        # Probe-only isolation: the per-batch READ work (scales with the
        # corpus index) separated from the delta-bounded maintenance
        # writes. This is where the sizes artifact pays: without it, the
        # b-side size aggregate is a SECOND reference to the
        # candidate-restricted corpus-shingle subtree — one more full
        # scan of the (at 100 TB, enormous) shingle index per batch.
        from grape_vector_db_spark.operators.dedup import (
            incremental_neardup_pairs,
            shingles as _shingles,
        )
        from grape_vector_db_spark.sources.tables import read_table

        t, sh, sg = paths(seed_dir)
        corpus_sh = read_table(spark, sh)
        corpus_sig = read_table(spark, sg)
        corpus_sizes = read_table(spark, f"{sh}_sizes")
        batch_sh = _shingles(batch2, 3).persist()
        batch_sh.count()
        batch_sizes = (
            batch_sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
        ).persist()
        batch_sizes.count()
        sc = spark.sparkContext
        for variant, csz in (("probe_with_sizes", corpus_sizes),
                             ("probe_legacy", None)):
            group = f"probe-{variant}-{os.path.basename(sf_dir)}"
            sc.setJobGroup(group, group)
            t0 = time.time()
            n = incremental_neardup_pairs(
                batch2,
                corpus_shingles_df=corpus_sh,
                corpus_signatures_df=corpus_sig,
                batch_shingles_df=batch_sh,
                batch_sizes_df=batch_sizes,
                corpus_sizes_df=csz,
            ).count()
            wall = round(time.time() - t0, 3)
            sc.setJobGroup(f"{group}-done", "done")
            jobs = len(sc.statusTracker().getJobIdsForGroup(group))
            out[variant] = {"jobs": jobs, "wall_s": wall, "pairs": n}
            print(
                f"  {os.path.basename(sf_dir)} {variant}: {jobs} jobs, "
                f"{wall}s ({n} pairs)",
                file=sys.stderr,
            )
        batch_sizes.unpersist()
        batch_sh.unpersist()
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return out


def main() -> None:
    dirs = sys.argv[1:] or [
        d
        for d in ("/root/testdata/sf0.1", f"{REPO}/.testdata/sf1")
        if os.path.isdir(d)
    ]
    spark = get_spark(app_name="gvdb-admission-jobs")
    spark.sparkContext.setLogLevel("ERROR")
    for d in dirs:
        got = measure(spark, d)
        w, l = got["with_sizes"], got["legacy_aggregate"]
        pw, pl = got["probe_with_sizes"], got["probe_legacy"]
        print(
            f"{d}: full admission with_sizes {w['jobs']} jobs / "
            f"{w['wall_s']}s vs legacy {l['jobs']} jobs / {l['wall_s']}s; "
            f"probe-only with_sizes {pw['jobs']} jobs / {pw['wall_s']}s vs "
            f"legacy {pl['jobs']} jobs / {pl['wall_s']}s"
        )


if __name__ == "__main__":
    main()
