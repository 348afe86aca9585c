"""Corpus profiling (operators/profile.py): HLL accuracy, mergeability,
null handling, and cross-engine oracle equivalence."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from cdcrypt.operators.profile import (
    DEFAULT_P,
    build_profile_index,
    hll_estimate_from_registers,
    hll_registers,
    numeric_histogram,
    numeric_histogram_sql,
    numeric_quantiles,
    numeric_quantiles_sql,
    profile_columns,
    profile_columns_sql,
    read_profile,
    update_profile_index,
)


def test_hll_estimate_within_standard_error(spark):
    n = 50_000
    df = spark.range(n).select(F.concat(F.lit("v"), "id").alias("v"))
    est = profile_columns(df, ["v"]).first().distinct_est
    # p=12 -> ~1.6% standard error; 5% is > 3 sigma
    assert abs(est - n) / n < 0.05


def test_hll_registers_merge_equals_full(spark):
    df = spark.range(20_000).select(
        F.concat(F.lit("x"), "id").alias("v"), (F.col("id") % 2).alias("h"))
    full = {r.register: r.max_rank
            for r in hll_registers(df, "v").collect()}
    a = {r.register: r.max_rank
         for r in hll_registers(df.where("h = 0"), "v").collect()}
    b = {r.register: r.max_rank
         for r in hll_registers(df.where("h = 1"), "v").collect()}
    merged = {k: max(a.get(k, 0), b.get(k, 0)) for k in set(a) | set(b)}
    assert merged == full
    # the driver-side fold agrees with the distributed one
    assert hll_estimate_from_registers(list(full.items())) == \
        profile_columns(df, ["v"]).first().distinct_est


def test_small_cardinality_is_near_exact_and_nulls_counted(spark):
    df = spark.range(10_000).select(
        (F.col("id") % 10).cast("string").alias("v"),
        F.when(F.col("id") % 4 == 0, F.col("id").cast("string"))
        .alias("sparse"))
    rows = {r.col: r for r in profile_columns(df, ["v", "sparse"]).collect()}
    assert 8 <= rows["v"].distinct_est <= 12  # linear-counting regime
    assert rows["v"].n_nulls == 0
    assert rows["sparse"].n_nulls == 7_500
    assert rows["v"].min_len == 1 and rows["v"].max_len == 1

    allnull = spark.range(100).select(
        F.lit(None).cast("string").alias("v"))
    r = profile_columns(allnull, ["v"]).first()
    assert r.distinct_est == 0 and r.n_nulls == 100 and r.n_rows == 100
    assert r.min_len is None and r.avg_len is None


def test_oracle_sql_equivalence(spark, tmp_path):
    pq = str(tmp_path / "t.parquet")
    (spark.range(5_000).select(
        (F.col("id") % 700).alias("k"),
        F.concat(F.lit("doc-"), (F.col("id") % 1300).cast("string"))
        .alias("s"),
        F.when(F.col("id") % 3 == 0, F.lit(None))
        .otherwise(F.concat(F.lit("t"), "id")).alias("nullable"))
     .coalesce(1).write.mode("overwrite").parquet(pq))
    df = spark.read.parquet(pq)
    cols = ["k", "s", "nullable"]
    got = sorted(tuple(r) for r in profile_columns(df, cols).collect())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW t AS SELECT * FROM '{pq}/*.parquet'")
    want = sorted(tuple(r)
                  for r in con.sql(profile_columns_sql("t", cols)).fetchall())
    assert got == want


def test_numeric_histogram_shape_and_mass(spark):
    df = spark.range(10_000).select(F.col("id").cast("long").alias("x"))
    h = numeric_histogram(df, ["x"], bins=16).collect()
    assert len(h) == 16
    assert sum(r.cnt for r in h) == 10_000
    assert min(r.bin_lo for r in h) == 0.0
    assert max(r.bin_hi for r in h) == 9_999.0
    # uniform data -> near-uniform bins
    assert all(575 <= r.cnt <= 675 for r in h)

    const = spark.range(50).select(F.lit(7).alias("x"))
    hc = numeric_histogram(const, ["x"]).collect()
    assert len(hc) == 1 and hc[0].cnt == 50
    assert hc[0].bin_lo == 7.0 and hc[0].bin_hi == 7.0


def test_numeric_quantiles_accuracy(spark):
    n = 20_000
    df = spark.range(n).select(F.col("id").alias("x"))
    got = {r.q: r.est for r in
           numeric_quantiles(df, ["x"], qs=(0.25, 0.5, 0.75, 1.0),
                             bins=64).collect()}
    # interpolation error bounded by one bin width (n/64)
    for q in (0.25, 0.5, 0.75):
        assert abs(got[q] - q * n) <= n / 64 + 1
    assert got[1.0] <= n - 1 + n / 64

    with pytest.raises(ValueError):
        numeric_quantiles(df, ["x"], qs=(0.0, 0.5))


def test_numeric_oracle_equivalence(spark, tmp_path):
    pq = str(tmp_path / "n.parquet")
    (spark.range(7_000).select(
        (F.col("id") % 997).alias("a"),
        (F.col("id") * F.col("id") % 5_003).alias("b"),
        F.when(F.col("id") % 5 == 0, F.col("id")).alias("nullable"))
     .coalesce(1).write.mode("overwrite").parquet(pq))
    df = spark.read.parquet(pq)
    cols = ["a", "b", "nullable"]
    con = duckdb.connect()
    con.sql(f"CREATE VIEW t AS SELECT * FROM '{pq}/*.parquet'")
    got_h = sorted(tuple(r) for r in numeric_histogram(df, cols).collect())
    want_h = sorted(tuple(r) for r in
                    con.sql(numeric_histogram_sql("t", cols)).fetchall())
    assert got_h == want_h
    got_q = sorted(tuple(r) for r in numeric_quantiles(df, cols).collect())
    want_q = sorted(tuple(r) for r in
                    con.sql(numeric_quantiles_sql("t", cols)).fetchall())
    assert got_q == want_q


def test_incremental_profile_equals_oneshot(spark, tmp_path):
    root = str(tmp_path / "pidx")
    full = spark.range(9_000).select(
        F.concat(F.lit("d"), (F.col("id") % 4_000).cast("string"))
        .alias("s"),
        (F.col("id") % 13).alias("k"),
        F.when(F.col("id") % 7 == 0, F.lit(None).cast("string"))
        .otherwise(F.lit("x")).alias("nullable"))
    cols = ["s", "k", "nullable"]
    chunks = [full.where(F.col("k") % 3 == i) for i in range(3)]
    idx = build_profile_index(chunks[0], root, cols)
    idx = update_profile_index(idx, chunks[1])
    idx = update_profile_index(root, chunks[2])  # str form resolves too
    got = sorted(tuple(r) for r in read_profile(spark, idx).collect())
    want = sorted(tuple(r) for r in profile_columns(full, cols).collect())
    assert got == want
    assert idx.meta["ticks"] == 2 and idx.meta["version"] == 2
    # superseded versions reclaimed
    import os
    assert sorted(d for d in os.listdir(root) if d.startswith("v=")) \
        == ["v=2"]


def test_incremental_profile_from_empty_seed(spark, tmp_path):
    root = str(tmp_path / "pidx0")
    df = spark.range(500).select(
        F.col("id").cast("string").alias("v"))
    idx = build_profile_index(df.limit(0), root, ["v"])
    # empty corpus -> empty profile, same as one-shot profile_columns
    # on an empty frame (groupBy over zero rows emits zero groups)
    assert read_profile(spark, idx).count() == 0
    idx = update_profile_index(idx, df)
    got = sorted(tuple(r) for r in read_profile(spark, idx).collect())
    want = sorted(tuple(r) for r in profile_columns(df, ["v"]).collect())
    assert got == want


def test_profile_plan_has_no_join_over_data(spark):
    """The unpivot must be a generator in the scan stage, not a
    self-union of N scans: one FileScan regardless of column count."""
    df = spark.range(100).select(
        F.col("id").cast("string").alias("a"),
        F.col("id").cast("string").alias("b"),
        F.col("id").cast("string").alias("c"))
    plan = profile_columns(df, ["a", "b", "c"])._jdf.queryExecution() \
        .executedPlan().toString()
    # the only join is moments x est: two 3-row aggregates
    assert plan.lower().count("generate") >= 1
    assert "union" not in plan.lower()
