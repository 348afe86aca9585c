"""Hot-key detection (operators/skew.py): exactness of the pigeonhole
prune + verify pipeline, layout independence, nulls, and the oracle."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from cdcrypt.operators.skew import hot_keys, hot_keys_sql, skew_report


def _skewed(spark, n=20_000):
    # key 'hot1' ~10%, 'hot2' ~5%, remainder spread over 2000 cold keys
    return spark.range(n).select(
        F.when(F.col("id") % 10 == 0, F.lit("hot1"))
        .when(F.col("id") % 20 == 1, F.lit("hot2"))
        .otherwise(F.concat(F.lit("cold"),
                            (F.col("id") % 2000).cast("string")))
        .alias("k"),
        (F.col("id") % 3).alias("g"))


def _key(t):
    return tuple((x is None, x) for x in t)


def _exact(df, keys, t):
    return sorted((tuple(r) for r in
                   df.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"))
                   .where(F.col("cnt") >= t).collect()), key=_key)


def test_hot_keys_exact_vs_groupby(spark):
    df = _skewed(spark)
    got = sorted(tuple(r) for r in
                 hot_keys(df, "k", min_count=500).collect())
    assert got == _exact(df, ["k"], 500)
    assert {g[0] for g in got} == {"hot1", "hot2"}

    # min_share form, threshold low enough to catch cold keys too
    got2 = sorted(tuple(r) for r in
                  hot_keys(df, "k", min_share=0.0004).collect())
    assert got2 == _exact(df, ["k"], 8)
    assert len(got2) > 2


def test_hot_keys_layout_independent(spark):
    df = _skewed(spark, 8_000)
    a = sorted(tuple(r) for r in
               hot_keys(df.repartition(2), "k", min_count=300).collect())
    b = sorted(tuple(r) for r in
               hot_keys(df.repartition(17, "g"), "k",
                        min_count=300).collect())
    c = sorted(tuple(r) for r in
               hot_keys(df.coalesce(1), "k", min_count=300).collect())
    assert a == b == c == _exact(df, ["k"], 300)


def test_hot_keys_multi_key_and_nulls(spark):
    df = spark.range(5_000).select(
        F.when(F.col("id") % 4 == 0, F.lit(None))
        .otherwise((F.col("id") % 3).cast("string")).alias("a"),
        (F.col("id") % 2).alias("b"))
    got = sorted((tuple(r) for r in
                  hot_keys(df, ["a", "b"], min_count=600).collect()),
                 key=_key)
    assert got == _exact(df, ["a", "b"], 600)
    # the null group is hot (1250 rows split over b in {0,1})
    assert any(g[0] is None for g in got)


def test_hot_keys_argument_validation(spark):
    df = _skewed(spark, 100)
    with pytest.raises(ValueError):
        hot_keys(df, "k")
    with pytest.raises(ValueError):
        hot_keys(df, "k", min_count=5, min_share=0.1)
    with pytest.raises(ValueError):
        hot_keys(df, "k", min_share=1.5)


def test_hot_keys_empty_and_uniform(spark):
    empty = _skewed(spark, 2000).where("k = 'nope'")
    assert hot_keys(empty, "k", min_count=1).count() == 0
    uniform = spark.range(1000).select(
        F.col("id").cast("string").alias("k"))
    assert hot_keys(uniform, "k", min_count=2).count() == 0


def test_oracle_sql_equivalence(spark, tmp_path):
    pq = str(tmp_path / "e.parquet")
    _skewed(spark, 10_000).coalesce(1).write.mode("overwrite").parquet(pq)
    df = spark.read.parquet(pq)
    got = sorted(tuple(r) for r in
                 hot_keys(df, "k", min_share=0.003).collect())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW t AS SELECT * FROM '{pq}/*.parquet'")
    want = sorted(tuple(r) for r in
                  con.sql(hot_keys_sql("t", "k", 0.003)).fetchall())
    assert got == want


def test_skew_report(spark):
    df = _skewed(spark, 10_000)
    rep = skew_report(df, "k", min_share=0.01)
    assert rep["total"] == 10_000
    assert rep["hot"][0][0] == "hot1"
    assert rep["max_share"] == pytest.approx(0.1, abs=0.01)
    flat = skew_report(spark.range(500).select(
        F.col("id").cast("string").alias("k")), "k", min_share=0.01)
    assert flat["hot"] == [] and flat["max_share"] is None
