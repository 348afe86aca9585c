"""Driver-contract self-check: run each __spark_entry__ query against its
DuckDB oracle at a given sf dir (mirrors CORRECTNESS_r{N}.json semantics:
row count + schema names + order-insensitive values, columns sorted by name).

Usage: PYTHONPATH=/root/repo python tools/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from cdcrypt.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v


def rows_to_multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = {}
    for r in rows:
        t = tuple(norm(r[i]) for i in order)
        out[t] = out.get(t, 0) + 1
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    spark = get_spark("selfcheck", master="local[8]", shuffle_partitions=16)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        df = fn(spark, sf_dir)
        cols = df.columns
        rows = [tuple(r) for r in df.collect()]
        spark_sec = time.monotonic() - t0
        if name not in oracles:
            print(f"[rows-only] {name:24s} rows={len(rows):7d}  ({spark_sec:.1f}s)")
            continue
        res = con.execute(oracles[name])
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
        ok_cols = sorted(cols) == sorted(ocols)
        a = rows_to_multiset(rows, cols)
        b = rows_to_multiset(orows, ocols)
        ok_vals = a == b
        status = "OK " if (ok_cols and ok_vals and len(rows) == len(orows)) else "FAIL"
        print(f"[{status}] {name:24s} rows={len(rows):7d} oracle={len(orows):7d} "
              f"cols={'=' if ok_cols else 'DIFF'} vals={'=' if ok_vals else 'DIFF'} "
              f"({spark_sec:.1f}s)")
        if status == "FAIL":
            failures.append(name)
            if not ok_cols:
                print("   spark cols:", sorted(cols), "\n   oracle cols:", sorted(ocols))
            if not ok_vals:
                onlya = [k for k in a if a[k] != b.get(k, 0)][:3]
                onlyb = [k for k in b if b[k] != a.get(k, 0)][:3]
                print("   spark-only:", onlya)
                print("   oracle-only:", onlyb)
    # flagship smoke
    e = entrymod.entry(spark)
    erows = e.collect()
    print(f"[entry] rows={len(erows)} schema={e.columns}")
    for r in erows:
        print("   ", tuple(r))
    print("FAILURES:", failures or "none")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
