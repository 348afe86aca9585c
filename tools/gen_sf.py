"""Deterministic synthetic dataset generator for SCALE VALIDATION beyond
the driver-provided sf dirs (VERDICT r3 item 1: prove the gates and
their plans hold at ~10x bench scale).

Reproduces the driver tables' SCHEMAS and distribution shapes (profiled
from /root/testdata/sf0.1 — vocab, near-dup/exact-dup rates, value
ranges, fanouts) at an arbitrary scale factor, seed-fixed. This is NOT
the driver's generator; correctness at the new scale is still a real
check because the gate harness (tools/gatecheck.py) runs Spark AND
DuckDB on the SAME generated data.

Usage:  python tools/gen_sf.py --sf 1.0 --out /tmp/cdcrypt_sf1
Scale anchors (sf=0.1 == driver sf0.1): lineitem 6M @ sf1, documents
50k, events 1M, embeddings 8k (the driver's embeddings scale ~4x per
10x sf).
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = ("spark window merge table column vector stream value data small "
         "join filter big group hash customer sort order slow line part "
         "fast row the agg key query a scan batch").split()
LANGS = ["en", "fr", "es", "zh", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.14, 0.15]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def _write(out, name, table):
    pq.write_table(table, os.path.join(out, f"{name}.parquet"))
    print(f"{name}: {table.num_rows} rows")


def gen_documents(rng, out, n):
    lens = rng.integers(20, 89, n)
    texts = []
    for i in range(n):
        words = rng.choice(VOCAB, size=lens[i])
        texts.append(" ".join(words))
    # ~5% near-dups: copy an earlier doc and append ' dup'
    n_near = n // 20
    for t in rng.choice(np.arange(n // 2, n), size=n_near, replace=False):
        src = rng.integers(0, n // 2)
        texts[int(t)] = texts[int(src)] + " dup"
    # ~0.16% exact dups
    n_exact = max(2, round(n * 0.0016))
    for t in rng.choice(np.arange(n // 2, n), size=n_exact, replace=False):
        src = rng.integers(0, n // 2)
        texts[int(t)] = texts[int(src)]
    _write(out, "documents", pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(rng.choice(LANGS, size=n, p=LANG_P)),
        "source": pa.array([f"src{i % 20}" for i in range(n)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))


def gen_embeddings(rng, out, n, dim=64):
    X = rng.standard_normal((n, dim)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    _write(out, "embeddings", pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([row.tolist() for row in X],
                              pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n), pa.int32()),
    }))


def gen_events(rng, out, n, n_users):
    base = np.datetime64("2024-01-01T00:00:00.000000")
    span = 30 * 24 * 3600 * 1_000_000  # 30 days in micros
    ts = base + rng.integers(0, span, n).astype("timedelta64[us]")
    _write(out, "events", pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_users, n), pa.int64()),
        "event_type": pa.array(rng.choice(EVENT_TYPES, size=n)),
        "value": pa.array(np.round(rng.exponential(90.0, n), 2)
                          .clip(0, 600.0)),
        "props": pa.array([f'{{"k": {int(k)}}}'
                           for k in rng.integers(0, 100, n)]),
    }))


def gen_tpch(rng, out, n_li, n_orders, n_cust, n_supp, n_part):
    _write(out, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": pa.array([f"REGION_{i}" for i in range(5)]),
    }))
    _write(out, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": pa.array([f"NATION_{i}" for i in range(25)]),
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))
    _write(out, "customer", pa.table({
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": pa.array([f"Customer_{i}" for i in range(n_cust)]),
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": pa.array(np.round(rng.uniform(-999, 9999, n_cust), 2)),
        "c_mktsegment": pa.array(rng.choice(
            ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
             "MACHINERY"], size=n_cust)),
    }))
    _write(out, "supplier", pa.table({
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": pa.array([f"Supplier_{i}" for i in range(n_supp)]),
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": pa.array(np.round(rng.uniform(-999, 9999, n_supp), 2)),
    }))
    _write(out, "part", pa.table({
        "p_partkey": pa.array(range(n_part), pa.int64()),
        "p_name": pa.array([f"Part_{i}" for i in range(n_part)]),
        "p_brand": pa.array([f"Brand#{i % 25}" for i in range(n_part)]),
        "p_type": pa.array(rng.choice(
            ["STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO"],
            size=n_part)),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": pa.array(
            np.round(rng.uniform(900, 2000, n_part), 2)),
    }))
    obase = np.datetime64("1995-01-01T00:00:00.000000")
    ospan = int(6.5 * 365 * 24 * 3600) * 1_000_000
    odate = obase + rng.integers(0, ospan, n_orders).astype("timedelta64[us]")
    _write(out, "orders", pa.table({
        "o_orderkey": pa.array(range(n_orders), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_orders), pa.int64()),
        "o_orderstatus": pa.array(rng.choice(["F", "O", "P"],
                                             size=n_orders)),
        "o_totalprice": pa.array(
            np.round(rng.uniform(1000, 400000, n_orders), 2)),
        "o_orderdate": pa.array(odate, pa.timestamp("us")),
        "o_orderpriority": pa.array(rng.choice(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
            size=n_orders)),
    }))
    sdate = obase + rng.integers(0, ospan, n_li).astype("timedelta64[us]")
    sdate = sdate.astype("datetime64[D]").astype("datetime64[us]")
    _write(out, "lineitem", pa.table({
        "l_orderkey": pa.array(rng.integers(0, n_orders, n_li), pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": pa.array(rng.integers(1, 51, n_li).astype(np.float64)),
        "l_extendedprice": pa.array(
            np.round(rng.uniform(900, 105000, n_li), 2)),
        "l_discount": pa.array(np.round(rng.integers(0, 11, n_li) / 100, 2)),
        "l_tax": pa.array(np.round(rng.integers(0, 9, n_li) / 100, 2)),
        "l_returnflag": pa.array(rng.choice(["A", "N", "R"], size=n_li)),
        "l_linestatus": pa.array(rng.choice(["F", "O"], size=n_li)),
        "l_shipdate": pa.array(sdate, pa.timestamp("us")),
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=42)
    a = ap.parse_args()
    os.makedirs(a.out, exist_ok=True)
    s = a.sf / 0.1  # scale relative to the profiled sf0.1 anchors
    rng = np.random.default_rng(a.seed)
    gen_documents(rng, a.out, int(5000 * s))
    # driver embeddings scale ~4x per 10x sf
    gen_embeddings(rng, a.out, int(2000 * (4 ** np.log10(max(s, 1e-9)))))
    gen_events(rng, a.out, int(100_000 * s), n_users=int(1500 * s))
    gen_tpch(rng, a.out, n_li=int(600_000 * s), n_orders=int(150_000 * s),
             n_cust=int(15_000 * s), n_supp=int(1000 * s),
             n_part=int(20_000 * s))
    print(f"done: sf={a.sf} -> {a.out}")


if __name__ == "__main__":
    main()
