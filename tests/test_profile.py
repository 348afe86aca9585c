"""Corpus profiling (operators/profile.py): HLL accuracy, mergeability,
null handling, and cross-engine oracle equivalence."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from cdcrypt.operators.profile import (
    DEFAULT_P,
    hll_estimate_from_registers,
    hll_registers,
    profile_columns,
    profile_columns_sql,
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
