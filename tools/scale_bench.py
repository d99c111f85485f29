"""Empirical scaling evidence: time the heaviest registry queries at two
scale factors and report the per-query wall-clock ratio vs the data ratio.

A query whose plan is linear-in-data should scale by <= the data ratio
(10x rows -> <= ~10x wall on a fixed-size executor pool, usually less
because fixed per-job overhead amortizes). A super-linear ratio flags a
plan that would not survive 100 TB. Results append a markdown table for
SCALE.md and a JSON side file.

Usage:
  python tools/scale_bench.py [small_dir] [big_dir] [out_json]
Defaults: /root/testdata/sf0.1  .testdata/sf1  SCALE_BENCH.json
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as em  # noqa: E402
from grape_vector_db_spark.session import get_spark  # noqa: E402

# the heaviest queries of BENCH_DETAIL (r5) + the flagship families whose
# scale story SCALE.md argues; together they cover every pair-generating
# and iterative path
QUERIES = [
    "knn_communities",
    "bm25_feedback",
    "incremental_neardup",
    "embedding_neardup_lsh",
    "simhash_pairs",
    "decontamination",
    "dedup_savings",
    "dsir_sample",
    "knn_kcore",
    "ivf_flat_pruned",
    "mixed_language",
    "sparse_cosine",
    "doc_keywords",
    "dedup_minhash",
    "winnow_fingerprints",
    "bm25",
    "knn_cosine",
    "curation_pipeline",
    # round-6 additions: the catalog-width fingerprints (the fix the
    # 16-bit saturation finding demanded), the checkpointed beam walk,
    # and the incremental-index search path
    "image_neardup64",
    "audio_neardup64",
    "knn_graph_search_filtered",
    "ivf_incremental",
    # round-7: the reworked union-shape Jaccard verify family, the
    # incremental graph maintenance, and the serving-batch recommend.
    # The 16-bit image_neardup/audio_neardup demos left this list: their
    # sf1 explosion (true-output saturation of a 16-bit hash space) is
    # recorded once in SCALE.md §round-6 — re-measuring a documented
    # wrong-production-shape every round buys nothing; the 64-bit twins
    # above are the production rows.
    "incremental_admission",
    "containment",
    "textrank",
    "incremental_embedding_neardup",
    "knn_graph_grown",
    "recommend_batch",
    # round-8: the filtered hybrid (bench #7 at r7, no scale row yet) and
    # the post-cluster canonical selection
    "hybrid_rrf_filtered",
    "dedup_keep_best",
    # round-8b: the vote-scan discovery search (5 literal-folded cosines
    # per row, same zero-shuffle family as knn_cosine) and the Gopher
    # rule filter (per-row array folds over tokens + lines — the widest
    # pure-map scan in the registry)
    "discover",
    "gopher_rules",
    # round-8c: the partition-pruned tenant-search shape (directory skip
    # + zero-shuffle knn; the cached partitioned artifact is built once)
    "partition_pruned_knn",
    # round-8e: posting-intersection filtered knn (documents never read)
    "payload_posting_knn",
    # round-9: range leaves served from value_num postings, and the
    # facet/count endpoints (VERDICT r8 #2/#3/#4)
    "payload_range_knn",
    "payload_facet",
    "filtered_count",
    # round-10: Match leaves served from the text inverted index, batch
    # search through the filter gate (N queries x corpus in one scan —
    # the batch multiplies the broadcast side, the one new-endpoint
    # scaling axis; VERDICT r9 #8), per-element array group-by, and
    # keyset pagination on a sort field
    "payload_match_knn",
    "payload_match_not_knn",
    "search_batch_filtered",
    "knn_batch",
    "search_groups_array",
    "scroll_by_field",
    "scroll_by_field_desc",
    # round-11: recursive posting trees (nested should under a must —
    # VERDICT r10 #3) and the fuzzy Match leaf (vocabulary expansion +
    # In-probe; its scaling axis is the vocabulary, not the corpus)
    "payload_nested_tree_knn",
    "payload_match_fuzzy_knn",
    # round-11b: the big-page scroll(with_vectors) branch — past
    # SCROLL_VECTOR_PROBE_CAP the embeddings gate by a distributed
    # semi-join (no driver id list / In literal); must stay FLAT
    "scroll_with_vectors_bulk",
    # round-11b: the end-to-end FACADE hybrid with a posting-served
    # filter — one gate plan for all three legs (the operator-level
    # hybrid_rrf_filtered above composes the legs by hand)
    "hybrid_facade_rrf_filtered",
]

# facade auto-route rows (VERDICT r7 #5): one unfiltered + one filtered
# db.search(index="auto") end-to-end — route choice funded by publish-time
# stats + the sampled selectivity estimate (zero pre-search jobs), the
# search itself the planner's pick at this corpus size
FACADE_ROWS = [
    "facade_auto_search",
    "facade_auto_search_filtered",
    # round-8e: AND-of-equalities filter, general documents-scan route vs
    # the payload posting-index route (posting intersection, no docs scan)
    "facade_conj_semi_join",
    "facade_conj_payload",
    # round-9 (VERDICT r8 #4): the payload index BUILD (explodes one
    # posting row per field per doc + two bounded aggregate jobs for the
    # sidecar), the facet endpoint's two cost tiers (driver-side
    # histogram vs pruned posting aggregate), and the posting-algebra
    # count
    "facade_payload_build",
    "facade_facet_histogram",
    "facade_facet_postings",
    "facade_count_posting",
]


def facade_bench(spark, sf_dir: str, n_runs: int = 3) -> dict:
    import shutil
    import tempfile

    from pyspark.sql import functions as Fn

    from grape_vector_db_spark.db import GrapeVectorDB

    d = tempfile.mkdtemp(prefix="gvdb_scale_facade_")
    try:
        db = GrapeVectorDB(spark, d)
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        db.add_documents(docs, emb)
        qv = list(emb.where(Fn.col("vec_id") == 3).head()["embedding"])
        flt = {"must": [{"type": "equals", "field": "lang", "value": "en"}]}
        # warm: stats caches, the selectivity sample, parquet schemas
        db.search(vector=qv, limit=10).collect()
        db.search(vector=qv, limit=10, filter=flt).collect()
        src = docs.where("lang = 'en'").head()["source"]
        flt2 = {"must": [
            {"type": "equals", "field": "lang", "value": "en"},
            {"type": "equals", "field": "source", "value": src},
        ]}
        db.search(vector=qv, limit=10, filter=flt2).collect()
        out = {}

        def run_case(name, kw):
            runs = []
            for _ in range(n_runs):
                t0 = time.time()
                n = len(db.search(vector=qv, limit=10, **kw).collect())
                runs.append(round(time.time() - t0, 3))
            out[name] = {"median_s": sorted(runs)[len(runs) // 2],
                         "rows": n, "runs": runs}
            print(f"  {sf_dir.rsplit('/', 1)[-1]} {name}: "
                  f"{out[name]['median_s']}s ({n} rows)", file=sys.stderr)

        def time_case(name, fn):
            runs, n = [], 0
            for _ in range(n_runs):
                t0 = time.time()
                n = fn()
                runs.append(round(time.time() - t0, 3))
            out[name] = {"median_s": sorted(runs)[len(runs) // 2],
                         "rows": n, "runs": runs}
            print(f"  {sf_dir.rsplit('/', 1)[-1]} {name}: "
                  f"{out[name]['median_s']}s ({n} rows)", file=sys.stderr)

        run_case("facade_auto_search", {})
        run_case("facade_auto_search_filtered", {"filter": flt})
        run_case("facade_conj_semi_join", {"filter": flt2})
        # same query after the posting index exists: the route flips to
        # the posting intersection (documents never scanned). The build
        # is itself a measured row (VERDICT r8 #4): one posting row per
        # field per doc + the bounded sidecar aggregates.
        time_case(
            "facade_payload_build",
            lambda: db.build_index(
                "payload", columns=["lang", "source", "n_chars"]
            ) or db._row_count("documents"),
        )
        db.search(vector=qv, limit=10, filter=flt2).collect()  # warm
        run_case("facade_conj_payload", {"filter": flt2})
        # facet tiers: lang has an exact sidecar histogram (driver-side
        # LocalTableScan, zero corpus work); n_chars blows HIST_MAX so
        # the same endpoint aggregates one pruned posting directory
        db.facet("lang").collect()  # warm
        time_case(
            "facade_facet_histogram",
            lambda: len(db.facet("lang").collect()),
        )
        time_case(
            "facade_facet_postings",
            lambda: len(db.facet("n_chars", limit=10).collect()),
        )
        # posting-algebra count: equality AND range, documents untouched
        cnt_flt = {"must": [
            {"type": "equals", "field": "lang", "value": "en"},
            {"type": "range", "field": "n_chars", "gte": 200, "lte": 500},
        ]}
        db.count(filter=cnt_flt)  # warm
        time_case("facade_count_posting", lambda: db.count(filter=cnt_flt))
        return out
    finally:
        shutil.rmtree(d, ignore_errors=True)


def bench_dir(spark, sf_dir: str, names: list[str], n_runs: int = 3) -> dict:
    # NB em._CACHE keys include sf_dir, so both dirs coexist warm
    for t in ("lineitem", "embeddings", "documents", "events"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
    em.warm_ingest_caches(spark, sf_dir)
    qs = em.queries()
    out = {}
    for name in names:
        runs = []
        for _ in range(n_runs):
            t0 = time.time()
            n = qs[name](spark, sf_dir).count()
            runs.append(round(time.time() - t0, 3))
        out[name] = {"median_s": sorted(runs)[len(runs) // 2], "rows": n,
                     "runs": runs}
        print(f"  {sf_dir.rsplit('/',1)[-1]} {name}: {out[name]['median_s']}s "
              f"({n} rows)", file=sys.stderr)
    return out


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    big = sys.argv[2] if len(sys.argv) > 2 else f"{REPO}/.testdata/sf1"
    out_path = sys.argv[3] if len(sys.argv) > 3 else f"{REPO}/SCALE_BENCH.json"
    spark = get_spark(app_name="gvdb-scale-bench")
    spark.sparkContext.setLogLevel("ERROR")

    a = bench_dir(spark, small, QUERIES)
    b = bench_dir(spark, big, QUERIES)
    a.update(facade_bench(spark, small))
    b.update(facade_bench(spark, big))

    rows = []
    for name in QUERIES + FACADE_ROWS:
        ta, tb = a[name]["median_s"], b[name]["median_s"]
        ratio = round(tb / ta, 2) if ta > 0 else float("inf")
        rows.append((name, ta, tb, ratio, a[name]["rows"], b[name]["rows"]))
    rows.sort(key=lambda r: -r[3])

    md = [
        "| query | sf0.1 (s) | sf1 (s) | wall ratio | rows sf0.1 | rows sf1 |",
        "|---|---|---|---|---|---|",
    ]
    for name, ta, tb, ratio, ra, rb in rows:
        md.append(f"| {name} | {ta} | {tb} | {ratio}x | {ra} | {rb} |")
    table = "\n".join(md)
    print(table)

    with open(out_path, "w") as f:
        json.dump(
            {"small": {"dir": small, **a}, "big": {"dir": big, **b},
             "data_ratio": 10.0, "markdown": table},
            f, indent=1, sort_keys=True,
        )
    print(f"\nwritten: {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
