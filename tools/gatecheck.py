"""Local replica of the driver's correctness gate.

Runs every __spark_entry__ query at sf0.01 next to its DuckDB oracle and
compares row count, column names, dtypes, and values (columns sorted by
name, rows sorted by all columns) — the same discipline the driver's
value-hash uses, plus a dtype check that catches the HUGEINT-vs-BIGINT
class of artifact the hash would flag.

Usage:  python tools/gatecheck.py [query ...]    (default: all)
        SF_DIR=/root/testdata/sf0.01 to override
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def _normalize(pdf):
    import numpy as np
    pdf = pdf[sorted(pdf.columns)].copy()
    # the driver tolerates integer-width differences (int32 rank vs int64
    # row_number was green in round 1) but NOT int-vs-float (HUGEINT sums
    # surface as float64 and failed) — mirror that
    for c in pdf.columns:
        if np.issubdtype(pdf[c].dtype, np.integer):
            pdf[c] = pdf[c].astype("int64")
        elif pdf[c].dtype == np.float32:
            pdf[c] = pdf[c].astype("float64")
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    return pdf.reset_index(drop=True)


def compare(spark_pdf, oracle_pdf) -> dict:
    out = {
        "rows_match": len(spark_pdf) == len(oracle_pdf),
        "schema_match": sorted(spark_pdf.columns) == sorted(oracle_pdf.columns),
        "hash_match": None,
        "spark_rows": len(spark_pdf),
        "oracle_rows": len(oracle_pdf),
        "err": None,
    }
    if not (out["rows_match"] and out["schema_match"]):
        out["hash_match"] = False
        return out
    a, b = _normalize(spark_pdf), _normalize(oracle_pdf)
    dt_a = [str(t) for t in a.dtypes]
    dt_b = [str(t) for t in b.dtypes]
    if dt_a != dt_b:
        out["hash_match"] = False
        out["err"] = f"dtype mismatch: spark={dt_a} oracle={dt_b}"
        return out
    eq = a.equals(b)
    out["hash_match"] = bool(eq)
    if not eq:
        neq = (a != b) & ~(a.isna() & b.isna())
        bad = neq.any(axis=1)
        out["err"] = "value mismatch, first rows:\nspark:\n%s\noracle:\n%s" % (
            a[bad].head(3), b[bad].head(3))
    return out


def main() -> None:
    import duckdb

    import __spark_entry__ as entry
    from cdcrypt.session import get_spark

    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    only = set(sys.argv[1:])

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    spark = get_spark("gatecheck", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            results[name] = {"err": f"spark error: {e}"}
            print(f"{name}: SPARK ERROR {e}")
            continue
        t_spark = round(time.monotonic() - t0, 2)
        sql = oracles.get(name)
        if sql is None:
            results[name] = {"spark_rows": len(sdf), "err": "no_oracle",
                             "spark_sec": t_spark}
            print(f"{name}: NO ORACLE ({len(sdf)} rows, {time.monotonic()-t0:.1f}s)")
            continue
        t1 = time.monotonic()
        try:
            odf = con.execute(sql).df()
        except Exception as e:  # noqa: BLE001
            results[name] = {"err": f"oracle error: {e}"}
            print(f"{name}: ORACLE ERROR {e}")
            continue
        r = compare(sdf, odf)
        r["spark_sec"] = t_spark
        r["oracle_sec"] = round(time.monotonic() - t1, 2)
        results[name] = r
        ok = r["rows_match"] and r["schema_match"] and r["hash_match"]
        print(f"{name}: {'OK' if ok else 'FAIL'} "
              f"(rows {r['spark_rows']}/{r['oracle_rows']}, "
              f"{time.monotonic()-t0:.1f}s)"
              + (f"\n  {r['err']}" if r["err"] else ""))
    n_ok = sum(1 for r in results.values()
               if r.get("hash_match") and r.get("rows_match"))
    print(f"\n{n_ok}/{len(results)} fully green")
    with open(os.environ.get("GATECHECK_OUT", "/tmp/gatecheck.json"), "w") as f:
        json.dump({k: {kk: vv for kk, vv in v.items() if kk != "err"}
                   for k, v in results.items()}, f, indent=1, default=str)


if __name__ == "__main__":
    main()
