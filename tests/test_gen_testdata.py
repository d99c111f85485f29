"""The sf-scaling generator must stay schema-identical to the driver
tables — every registry query and oracle must run unmodified against its
output (the sf1 scale-evidence runs depend on it)."""

from __future__ import annotations

import shutil
import tempfile

import pyarrow.parquet as pq
import pytest

from tools.gen_testdata import generate

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def tiny_dir():
    d = tempfile.mkdtemp(prefix="gvdb_gen_")
    generate(0.002, d)  # ~12k lineitem rows — fast
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_schemas_match_driver_tables(tiny_dir):
    for t in TABLES:
        ours = pq.read_schema(f"{tiny_dir}/{t}.parquet")
        theirs = pq.read_schema(f"/root/testdata/sf0.01/{t}.parquet")
        got = [(f.name, str(f.type)) for f in ours]
        want = [(f.name, str(f.type)) for f in theirs]
        assert got == want, f"{t}: {got} != {want}"


def test_distribution_invariants(tiny_dir):
    import duckdb

    con = duckdb.connect()
    # planted near-dups present (the dedup families need them)
    n_dup = con.execute(
        f"select count(*) from read_parquet('{tiny_dir}/documents.parquet')"
        " where text like '% dup'"
    ).fetchone()[0]
    assert n_dup > 0
    # exact duplicate groups present
    n_exact = con.execute(
        f"select count(*) from (select text, count(*) c from "
        f"read_parquet('{tiny_dir}/documents.parquet') group by 1 having c > 1)"
    ).fetchone()[0]
    assert n_exact >= 1
    # embeddings unit-normalized
    mx = con.execute(
        f"select max(abs(1.0 - sqrt(list_sum(list_transform(embedding, "
        f"x -> x*x))))) from read_parquet('{tiny_dir}/embeddings.parquet')"
    ).fetchone()[0]
    assert mx < 1e-3
    # foreign keys in range
    bad = con.execute(
        f"select count(*) from read_parquet('{tiny_dir}/lineitem.parquet') l"
        f" left join read_parquet('{tiny_dir}/orders.parquet') o"
        " on l.l_orderkey = o.o_orderkey where o.o_orderkey is null"
    ).fetchone()[0]
    assert bad == 0


def test_fingerprint_skip_and_invalidation(tmp_path):
    """generate() is a no-op when the on-disk fingerprint matches
    (generator source + sf + seed); a missing table or different seed
    invalidates. The marker is written LAST, so partial output never
    passes."""
    import os

    from tools.gen_testdata import fixtures_current, generate

    out = str(tmp_path / "sf0.001")
    assert not fixtures_current(0.001, out)
    generate(0.001, out)
    assert fixtures_current(0.001, out)
    assert not fixtures_current(0.001, out, seed=7)
    mtime = os.path.getmtime(f"{out}/documents.parquet")
    generate(0.001, out)  # must skip — no rewrite
    assert os.path.getmtime(f"{out}/documents.parquet") == mtime
    os.remove(f"{out}/documents.parquet")
    assert not fixtures_current(0.001, out)
