"""grape_vector_db_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of putao520/grape-vector-db.

The reference (read-only at /root/reference) is a Rust vector database:
documents + dense embeddings + sparse BM25 + payload filters, answering
vector k-NN / text / hybrid / filtered search. This package re-expresses
every one of those capabilities as declarative Spark DataFrame pipelines
(SURVEY.md maps each reference operator to its Spark design):

- ``functions.vector``   — cosine/dot/norm/euclidean/hamming expression kit
- ``functions.text``     — reference-faithful tokenizer + mock embedder
- ``functions.hashing``  — engine-portable deterministic hashes (md5-based)
- ``operators.search``   — brute-force k-NN, batch k-NN, threshold search
- ``operators.sparse``   — doc_terms/term_stats/corpus_stats + BM25 scoring
- ``operators.fusion``   — RRF / linear / normalized hybrid fusion
- ``operators.quantization`` — binary quantization + Hamming two-stage search
- ``operators.filters``  — reference Filter-AST -> Catalyst Column translator
- ``operators.dedup``    — exact / MinHash-LSH / SimHash / n-gram Jaccard /
                           embedding-cosine dedup (LLM-pipeline additions)
- ``operators.textanalysis`` — language-ID, quality scoring, token counting,
                           fingerprinting (LLM-pipeline additions)
- ``operators.geo``      — haversine Near / WithinDistance predicates
- ``operators.ann``      — IVF (k-means) + random-projection LSH index builds
- ``operators.topk``     — per-partition top-k -> global merge (scatter-gather)
- ``sources.tables``     — parquet IO, upsert/delete (batch CRUD surface)
- ``streaming.ingest``   — Structured Streaming ingestion (capability add)
- ``plans.planner``      — brute-force vs index-path choice by corpus size

Design rules (enforced across modules, reviewed per SURVEY.md §4):
- DataFrame/SQL only; no RDDs; no driver-side .collect() loops (the only
  collects are single-row query-vector lookups, which are O(dim)).
- Scalar math stays JVM-side in codegen-friendly higher-order functions
  (``aggregate``/``zip_with``/``transform``); Python UDFs are not used in
  any hot path.
- Small sides are broadcast; top-k is per-partition then global
  (TakeOrderedAndProject); every LIMIT is paired with a deterministic
  tiebreaker so results are stable under any partitioning.
"""

__version__ = "0.1.0"
