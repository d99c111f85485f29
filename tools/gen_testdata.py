"""Generate larger scale factors of the driver's synthetic tables.

The driver ships sf{0.001,0.01,0.1} read-only; scale-evidence runs (SCALE.md)
need sf1+. This generator reproduces the same schemas and distributions
(measured off /root/testdata/sf0.1 — see the constants below) with its own
seed, writing one parquet file per table like the originals:

- region/nation: copied verbatim (dimensions don't scale)
- customer/supplier/part/orders/lineitem: TPC-H-ish uniform distributions,
  ~4 Poisson lineitem lines per order, dates 1995..2001
- events: 30 days of micros timestamps, 5 event types, exp(50) values,
  {"k": n} JSON props
- documents: 30-word vocab, 8..105 uniform words per doc, 5% planted
  near-duplicates ("<base text> dup"), ~0.3% exact duplicates,
  lang en 40% / de fr es zh 15% each, sources src0..src19
- embeddings: unit-normalized 64-dim gaussians, labels uniform 0..9
  (measured intra-label cosine in the originals is ~0 — labels are NOT
  cluster-correlated, so neither are ours)

Usage: python tools/gen_testdata.py 1.0 [outdir]   (defaults to
.testdata/sf1 under the repo root; sf scales row counts linearly)
"""

from __future__ import annotations

import json
import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BASE = "/root/testdata/sf0.1"  # distributions measured at this sf
BASE_SF = 0.1

VOCAB = (
    "spark window merge table column vector stream value data small join "
    "filter big group hash customer sort order slow line part fast the row "
    "agg key query a scan batch"
).split()
LANGS = ["en", "de", "fr", "es", "zh"]
LANG_P = [0.4, 0.15, 0.15, 0.15, 0.15]
SEGMENTS = ["MACHINERY", "AUTOMOBILE", "BUILDING", "HOUSEHOLD", "FURNITURE"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
ETYPES = ["click", "view", "purchase", "signup", "error"]
PNAME_A = ["large", "hot", "blue", "red", "green", "small", "cold", "dark"]
PNAME_B = ["ring", "bolt", "washer", "spring", "gear", "valve", "pin", "cap"]
PTYPES = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "PROMO"]

US_PER_DAY = 86_400_000_000


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, f"{out_dir}/{name}.parquet", compression="snappy")
    print(f"  {name}: {table.num_rows} rows")


_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _fingerprint(sf: float, seed: int) -> str:
    """Content hash of (this generator's source, sf, seed) — the full
    input of a deterministic run. Matching fingerprint on disk means the
    fixtures are byte-equivalent to a regeneration; only a generator
    edit (or different sf/seed) invalidates them."""
    import hashlib

    with open(os.path.abspath(__file__), "rb") as f:
        src = f.read()
    return hashlib.sha256(src + f"|{sf!r}|{seed!r}".encode()).hexdigest()


def fixtures_current(sf: float, out_dir: str, seed: int = 420) -> bool:
    fp_path = os.path.join(out_dir, "_FINGERPRINT")
    try:
        with open(fp_path) as f:
            on_disk = f.read().strip()
    except OSError:
        return False
    return on_disk == _fingerprint(sf, seed) and all(
        os.path.exists(os.path.join(out_dir, f"{t}.parquet")) for t in _TABLES
    )


def generate(sf: float, out_dir: str, seed: int = 420, force: bool = False) -> None:
    if not force and fixtures_current(sf, out_dir, seed):
        print(f"  fixtures current at {out_dir} (fingerprint match) — skipping")
        return
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    mult = sf / BASE_SF

    for dim in ("region", "nation"):
        shutil.copyfile(f"{BASE}/{dim}.parquet", f"{out_dir}/{dim}.parquet")
        print(f"  {dim}: copied")

    n_cust = int(150_000 * sf)
    _write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_cust), 2),
        "c_mktsegment": pa.array(rng.choice(SEGMENTS, n_cust)),
    }))

    n_supp = int(10_000 * sf)
    _write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_supp), 2),
    }))

    n_part = int(200_000 * sf)
    _write(out_dir, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": [
            f"{a} {b}" for a, b in zip(
                rng.choice(PNAME_A, n_part), rng.choice(PNAME_B, n_part)
            )
        ],
        "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, n_part)],
        "p_type": pa.array(rng.choice(PTYPES, n_part)),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900.0, 2100.0, n_part), 2),
    }))

    n_ord = int(150_000 * mult * BASE_SF / 0.1 * 0.1 / sf * sf)  # 150k @ sf0.1
    n_ord = int(1_500_000 * sf)
    d0 = np.datetime64("1995-01-01")
    span_days = int((np.datetime64("2001-08-01") - d0).astype(int))
    odate_days = rng.integers(0, span_days + 1, n_ord)
    _write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(rng.choice(["O", "P", "F"], n_ord)),
        "o_totalprice": np.round(rng.uniform(1000.0, 500_000.0, n_ord), 2),
        "o_orderdate": pa.array(
            (d0 + odate_days).astype("datetime64[us]"), pa.timestamp("us")
        ),
        "o_orderpriority": pa.array(rng.choice(PRIORITIES, n_ord)),
    }))

    lines = rng.poisson(3.0, n_ord) + 1
    okeys = np.repeat(np.arange(n_ord), lines)
    odays = np.repeat(odate_days, lines)
    n_li = len(okeys)
    linenum = np.concatenate([np.arange(1, k + 1) for k in lines])
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(okeys, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(linenum, pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900.0, 105_000.0, n_li), 2),
        "l_discount": np.round(rng.uniform(0.0, 0.1, n_li), 2),
        "l_tax": np.round(rng.uniform(0.0, 0.08, n_li), 2),
        "l_returnflag": pa.array(rng.choice(["A", "N", "R"], n_li)),
        "l_linestatus": pa.array(rng.choice(["O", "F"], n_li)),
        "l_shipdate": pa.array(
            (d0 + odays + rng.integers(1, 95, n_li)).astype("datetime64[us]"),
            pa.timestamp("us"),
        ),
    }))

    n_ev = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    t0 = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    _write(out_dir, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": pa.array(
            np.sort(t0 + rng.integers(0, 30 * US_PER_DAY, n_ev)),
            pa.timestamp("us"),
        ),
        "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
        "event_type": pa.array(rng.choice(ETYPES, n_ev)),
        "value": np.round(rng.exponential(50.0, n_ev), 2),
        "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_ev)],
    }))

    n_doc = int(50_000 * sf)
    n_base = n_doc - int(0.05 * n_doc) - max(2, int(0.0032 * n_doc))
    texts: list[str] = []
    for _ in range(n_base):
        k = int(rng.integers(8, 106))
        texts.append(" ".join(rng.choice(VOCAB, k)))
    while len(texts) < n_doc - max(2, int(0.0032 * n_doc)):
        texts.append(texts[int(rng.integers(0, n_base))] + " dup")
    while len(texts) < n_doc:
        texts.append(texts[int(rng.integers(0, n_base))])
    order = rng.permutation(n_doc)
    texts = [texts[i] for i in order]
    _write(out_dir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": pa.array(rng.choice(LANGS, n_doc, p=LANG_P)),
        "source": pa.array([f"src{i % 20}" for i in rng.integers(0, 20, n_doc)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    n_emb = int(20_000 * sf)
    X = rng.standard_normal((n_emb, 64)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    _write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(list(X), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb), pa.int32()),
    }))
    # commit marker LAST: a crash mid-generation leaves no fingerprint,
    # so the next run regenerates instead of trusting partial fixtures
    with open(os.path.join(out_dir, "_FINGERPRINT"), "w") as f:
        f.write(_fingerprint(sf, seed))


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = sys.argv[2] if len(sys.argv) > 2 else f"{repo}/.testdata/sf{sf:g}"
    print(f"generating sf={sf} -> {out}")
    generate(sf, out)
