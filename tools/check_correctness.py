"""Local replica of the driver's t2 correctness gate.

Runs every __spark_entry__.queries() entry on Spark and its oracle_sql()
twin on DuckDB at sf0.01, compares row counts, column-name sets, and
(column-name-sorted, row-sorted) values. Floats must match exactly after
the 6-dp rounding both sides apply; a near-miss (<=1e-9) is reported
separately so rounding-boundary bugs are visible.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from grape_vector_db_spark.session import get_spark  # noqa: E402
from grape_vector_db_spark.sources.tables import TABLES  # noqa: E402


# Integer widths are deliberately DISTINGUISHED: the driver's value hash is
# type-sensitive, so a DuckDB HUGEINT sum() vs a Spark BIGINT diverges at the
# gate even when every value is equal (this exact gap shipped two red rows in
# CORRECTNESS_r03). An un-cast oracle sum() must FAIL here too.
_SPARK_KIND = {
    "tinyint": "int8", "smallint": "int16", "int": "int32",
    "bigint": "int64",
    "float": "float", "double": "float",
    "string": "str", "boolean": "bool", "timestamp": "ts",
    "timestamp_ntz": "ts", "date": "date", "binary": "bytes",
}
_DUCK_KIND = {
    "TINYINT": "int8", "SMALLINT": "int16", "INTEGER": "int32",
    "BIGINT": "int64", "HUGEINT": "int128",
    "UTINYINT": "uint8", "USMALLINT": "uint16",
    "UINTEGER": "uint32", "UBIGINT": "uint64",
    "FLOAT": "float", "DOUBLE": "float", "DECIMAL": "float",
    "VARCHAR": "str", "BOOLEAN": "bool",
    "TIMESTAMP": "ts", "TIMESTAMP_NS": "ts", "TIMESTAMP WITH TIME ZONE": "ts",
    "DATE": "date", "BLOB": "bytes",
}


def kind_of_spark(dtype: str) -> str:
    if dtype.startswith("array<") and dtype.endswith(">"):
        return f"list<{kind_of_spark(dtype[6:-1])}>"
    return _SPARK_KIND.get(dtype, dtype)


def kind_of_duck(dtype: str) -> str:
    if dtype.endswith("[]"):
        return f"list<{kind_of_duck(dtype[:-2])}>"
    base = dtype.split("(")[0].strip()
    return _DUCK_KIND.get(base, base)


def norm_val(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm_val(x) for x in v)
    return v


def normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_val(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    # the ANN-index/BPE oracles read persisted artifacts keyed by sf_dir;
    # export the gate dir BEFORE oracle_sql() is called so they build for
    # the same corpus the Spark side runs on
    import os

    os.environ["SPARK_GRAFT_GATE_SF_DIR"] = sf_dir

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            stypes = dict(sdf.dtypes)
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (rows-only check, {time.time()-t0:.1f}s)")
            if len(srows) == 0:
                print(f"      WARNING {name}: zero rows")
            continue
        try:
            res = con.sql(oracles[name])
            ocols = [d[0] for d in res.description]
            otypes = dict(zip(ocols, [str(t) for t in res.types]))
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            failures.append(name)
            continue
        sc, sv = normalize(scols, srows)
        oc, ov = normalize(ocols, orows)
        status = []
        if sc != oc:
            status.append(f"cols spark={sc} oracle={oc}")
        else:
            # dtype-kind comparison (the driver checks schema, not just names)
            for c in sc:
                sk = kind_of_spark(stypes.get(c, "?"))
                ok_ = kind_of_duck(otypes.get(c, "?"))
                if sk != ok_:
                    status.append(
                        f"dtype[{c}] spark={stypes.get(c)}({sk}) "
                        f"oracle={otypes.get(c)}({ok_})"
                    )
        if len(sv) != len(ov):
            status.append(f"rowcount spark={len(sv)} oracle={len(ov)}")
        if not status and sv != ov:
            ndiff = sum(1 for a, b in zip(sv, ov) if a != b)
            for a, b in zip(sv, ov):
                if a != b:
                    status.append(f"values differ ({ndiff}/{len(sv)}): first {a} vs {b}")
                    break
        if status:
            print(f"FAIL  {name}: {'; '.join(status)}")
            failures.append(name)
        else:
            print(f"OK    {name}: {len(sv)} rows ({time.time()-t0:.1f}s)")

    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("all checks passed")


if __name__ == "__main__":
    main()
