"""Table IO + batch CRUD surface (reference §2.1 S1-S12).

The reference's storage layer is a row-KV store with upsert/update/delete
by id (src/storage.rs:144-294). On Spark the table IS the store:

- scan (S1)            -> spark.read.parquet
- point lookup (S2)    -> WHERE id = x      (pushed to parquet row groups)
- paged listing (S3)   -> ORDER BY id LIMIT/OFFSET
- existence (S4)       -> semi-join / limit-1 count
- insert/batch (S5-S6) -> append write (a DataFrame write IS the batch op)
- update/upsert (S7)   -> merge_upsert below (anti-join + union rewrite —
                          the parquet-only MERGE; on Delta/Iceberg use the
                          native MERGE INTO instead)
- delete (S8-S9)       -> delete_where below (predicate anti-filter rewrite;
                          strictly more general than the reference, which
                          only supports id-equality filters)
- metadata update (S10)-> column-level merge in merge_upsert
- backup/restore (S12) -> snapshot write + read with sha2 checksum column

All writers partition by ``xxhash64(id) % n_buckets`` when asked — the
Spark analogue of the reference's consistent-hash shard ring
(src/distributed/shard.rs:166-369) — so co-located id joins don't shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql(...) works as the
    SQL frontend (the reference's WHERE-parser surface, P10, comes free)."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def bucket_by_id(df: DataFrame, n_buckets: int, id_col: str = "id") -> DataFrame:
    """F14/§2.12: hash-partition by id — the Spark analogue of the
    reference's consistent-hash shard ring (src/distributed/shard.rs:166-369,
    DefaultHasher + avalanche mix). ``xxhash64`` plays the ring hash; writing
    with ``.repartition(n, col)`` (or bucketBy for persistent tables) keeps
    id-equi-joins co-located and shuffle-free."""
    bucket = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets)).cast("int")
    return df.withColumn("bucket", bucket).repartition(n_buckets, F.col("bucket"))


def with_uuid_ids(df: DataFrame, id_col: str = "id") -> DataFrame:
    """Fill empty/null ids with uuids (reference S5, src/storage.rs:145-149)."""
    return df.withColumn(
        id_col,
        F.when(
            F.col(id_col).isNull() | (F.col(id_col) == ""), F.expr("uuid()")
        ).otherwise(F.col(id_col)),
    )


def merge_upsert(existing: DataFrame, updates: DataFrame, id_col: str = "id") -> DataFrame:
    """MERGE semantics on plain DataFrames: update wins per id, null update
    fields fall back to the existing row (reference update preserves unset
    fields, src/storage.rs:258-294). One shuffle on id; with both sides
    bucketed by id it's shuffle-free."""
    cols = existing.columns
    joined = existing.alias("old").join(
        updates.alias("new"), F.col(f"old.{id_col}") == F.col(f"new.{id_col}"), "full"
    )
    merged = joined.select(
        *[
            F.coalesce(F.col(f"new.{c}"), F.col(f"old.{c}")).alias(c)
            for c in cols
        ]
    )
    return merged


def delete_where(df: DataFrame, predicate: str) -> DataFrame:
    """DELETE FROM ... WHERE p — as the complement filter (S8/S9)."""
    return df.where(f"NOT ({predicate})")


def exists(df: DataFrame, id_value, id_col: str = "id") -> bool:
    return df.where(F.col(id_col) == id_value).limit(1).count() > 0


def compact(spark: SparkSession, path: str, target_partitions: int) -> None:
    """Small-file compaction: rewrite a parquet table at a chosen partition
    count (streaming upserts accumulate small files; at 100 TB scale run
    this per-partition or use the table format's OPTIMIZE). Snapshot-swap
    write, same safety model as merge_upsert."""
    df = spark.read.parquet(path)
    staging = f"{path}__compact"
    df.repartition(target_partitions).write.mode("overwrite").parquet(staging)
    spark.read.parquet(staging).write.mode("overwrite").parquet(path)


def backup(df: DataFrame, path: str, id_col: str = "id") -> None:
    """Snapshot with a per-row sha256 checksum column (reference S12 writes
    a SHA-256 over the backup payload, src/storage.rs:569-576)."""
    chk = df.withColumn(
        "_sha256", F.sha2(F.to_json(F.struct(*[F.col(c) for c in df.columns])), 256)
    )
    chk.write.mode("overwrite").parquet(path)


def restore(spark: SparkSession, path: str) -> DataFrame:
    """Read a snapshot back, verifying the checksum column; raises on
    corruption (reference verifies before reload, src/storage.rs:609-621)."""
    df = spark.read.parquet(path)
    data_cols = [c for c in df.columns if c != "_sha256"]
    bad = df.where(
        F.sha2(F.to_json(F.struct(*[F.col(c) for c in data_cols])), 256)
        != F.col("_sha256")
    ).limit(1)
    if bad.count() > 0:
        raise ValueError(f"backup checksum mismatch under {path}")
    return df.select(*data_cols)
