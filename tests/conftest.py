from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from grape_vector_db_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[4]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="session")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()
