"""IVF index crash consistency: the index is TWO tables (centroids +
assignments) whose publishes are only individually atomic — the
_INDEX_MANIFEST.json version-pair commit keeps readers off a half-rebuilt
mix (new centroids with old postings scored in the wrong geometry)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from grape_vector_db_spark.operators import ann
from grape_vector_db_spark.sources.tables import publish_table


@pytest.fixture()
def idx_dir():
    d = tempfile.mkdtemp(prefix="gvdb_idxman_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_crashed_rebuild_keeps_consistent_pair(spark, emb, idx_dir):
    sub = emb.select("vec_id", "embedding").limit(200)
    cents_py = ann.fixed_centroids(nlist=4, dim=64, seed=7)
    cents1, assigned1 = ann.ivf_build_fixed(sub, cents_py)
    ann.save_index(idx_dir, cents1, assigned1)

    c0, a0 = ann.load_index(spark, idx_dir)
    n_cents0, n_assigned0 = c0.count(), a0.count()
    assert n_cents0 == 4

    # simulate a rebuild that crashed between the two publishes: only the
    # centroids table gets a new version (8 clusters now)
    cents_py8 = ann.fixed_centroids(nlist=8, dim=64, seed=11)
    cents2, _assigned2 = ann.ivf_build_fixed(sub, cents_py8)
    publish_table(spark, f"{idx_dir}/centroids", cents2)

    # readers still get the OLD consistent pair, not 8 new centroids
    # against 4-cluster postings
    c1, a1 = ann.load_index(spark, idx_dir)
    assert c1.count() == n_cents0
    assert a1.count() == n_assigned0
    got = {r["cluster"] for r in c1.select("cluster").distinct().collect()}
    assert got == {0, 1, 2, 3}

    # a completed save re-points the manifest and the new pair serves
    cents3, assigned3 = ann.ivf_build_fixed(sub, cents_py8)
    ann.save_index(idx_dir, cents3, assigned3)
    c2, a2 = ann.load_index(spark, idx_dir)
    assert c2.count() == 8
    assert a2.join(c2.select("cluster"), "cluster", "left_anti").count() == 0


def test_manifest_missing_falls_back_to_newest(spark, emb, idx_dir):
    """Legacy indexes (saved before the manifest existed) keep working:
    load_index opens the newest committed version of each table."""
    import os

    sub = emb.select("vec_id", "embedding").limit(100)
    cents_py = ann.fixed_centroids(nlist=4, dim=64, seed=7)
    cents, assigned = ann.ivf_build_fixed(sub, cents_py)
    ann.save_index(idx_dir, cents, assigned)
    os.remove(f"{idx_dir}/{ann._INDEX_MANIFEST}")
    c, a = ann.load_index(spark, idx_dir)
    assert c.count() == 4 and a.count() == 100


def test_pruned_search_unchanged_through_manifest(spark, emb, idx_dir):
    """ivf_search_pruned over a manifest'd index returns the same rows
    as the join-based search — the pinned-version read keeps partition
    pruning and result parity."""
    sub = emb.select("vec_id", "embedding").limit(300)
    cents_py = ann.fixed_centroids(nlist=4, dim=64, seed=7)
    cents, assigned = ann.ivf_build_fixed(sub, cents_py)
    ann.save_index(idx_dir, cents, assigned)
    qv = list(sub.where(F.col("vec_id") == 3).head()["embedding"])
    got = ann.ivf_search_pruned(spark, idx_dir, qv, k=5, nprobe=2).collect()
    want = ann.ivf_flat_search(sub, cents_py, qv, k=5, nprobe=2).collect()
    assert [(r["vec_id"], r["score"]) for r in got] == [
        (r["vec_id"], r["score"]) for r in want
    ]
