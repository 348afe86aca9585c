"""Bucketed range join: equivalence with the naive non-equi join,
half-open boundary semantics, bin-spanning intervals, the enforced
bin-width precondition, and the no-cross-product plan property."""

from __future__ import annotations

import datetime
import random

import pytest

from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from cdcrypt.operators.rangejoin import range_join


def _ts(minute, second=0):
    return datetime.datetime(2024, 1, 1, minute // 60, minute % 60, second)


@pytest.fixture(scope="module")
def data(spark):
    rng = random.Random(11)
    points = spark.createDataFrame(
        [(i, _ts(rng.randint(0, 600), rng.randint(0, 59)))
         for i in range(400)],
        "pid long, ts timestamp")
    iv_rows = []
    for j in range(60):
        m = rng.randint(0, 590)
        iv_rows.append((j, _ts(m), _ts(m + rng.randint(1, 9))))
    ivs = spark.createDataFrame(
        iv_rows, "iid long, start timestamp, end timestamp")
    return points, ivs


def test_matches_naive_nonequi_join(spark, data):
    points, ivs = data
    got = {(r.iid, r.pid)
           for r in range_join(points, ivs, point_ts="ts",
                               bin_seconds=600).collect()}
    want = {(r.iid, r.pid) for r in
            ivs.join(points, (F.col("start") <= F.col("ts"))
                     & (F.col("ts") < F.col("end"))).collect()}
    assert got == want and len(got) > 0


def test_half_open_boundaries(spark):
    points = spark.createDataFrame(
        [(1, _ts(10)), (2, _ts(15)), (3, _ts(20))], "pid long, ts timestamp")
    ivs = spark.createDataFrame(
        [(1, _ts(10), _ts(20))], "iid long, start timestamp, end timestamp")
    got = sorted(r.pid for r in
                 range_join(points, ivs, bin_seconds=600).collect())
    assert got == [1, 2]  # start inclusive, end exclusive


def test_interval_spanning_bins_matches_once(spark):
    # 2-minute interval straddling a 60s bin edge; point in the 2nd bin
    points = spark.createDataFrame(
        [(1, _ts(1, 30))], "pid long, ts timestamp")
    ivs = spark.createDataFrame(
        [(1, _ts(0, 30), _ts(2, 30))],
        "iid long, start timestamp, end timestamp")
    rows = range_join(points, ivs, bin_seconds=60 * 3).collect()
    assert [(r.iid, r.pid) for r in rows] == [(1, 1)]


def test_end_on_bin_edge_does_not_replicate(spark):
    # end exactly on a bin boundary: exclusive end must not pull the
    # interval into the next bin (and the point AT the edge not match)
    points = spark.createDataFrame(
        [(1, _ts(2, 0))], "pid long, ts timestamp")
    ivs = spark.createDataFrame(
        [(1, _ts(1, 0), _ts(2, 0))],
        "iid long, start timestamp, end timestamp")
    assert range_join(points, ivs, bin_seconds=60).count() == 0


def test_too_long_interval_raises(spark):
    points = spark.createDataFrame([(1, _ts(5))], "pid long, ts timestamp")
    ivs = spark.createDataFrame(
        [(1, _ts(0), _ts(30))], "iid long, start timestamp, end timestamp")
    with pytest.raises(Exception) as ei:
        range_join(points, ivs, bin_seconds=60).collect()
    assert "bin_seconds" in str(ei.value)


def test_plan_has_no_cross_product(spark, data):
    points, ivs = data
    plan = range_join(points, ivs, bin_seconds=600)\
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the naive formulation, by contrast, is a nested-loop join
    naive = ivs.join(points, (F.col("start") <= F.col("ts"))
                     & (F.col("ts") < F.col("end")))\
        ._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" in naive or "Cartesian" in naive


def test_salted_results_identical(spark, data):
    points, ivs = data
    base = {(r.iid, r.pid)
            for r in range_join(points, ivs, bin_seconds=600).collect()}
    salted = {(r.iid, r.pid)
              for r in range_join(points, ivs, bin_seconds=600,
                                  salt_k=4).collect()}
    assert salted == base and len(base) > 0


def test_salt_config_error(spark, data):
    points, ivs = data
    with pytest.raises(ValueError):
        range_join(points, ivs, bin_seconds=600, salt_k=0)


def test_inverted_interval_raises(spark):
    # a corrupt upstream row (end < start) must fail loud, never explode
    # one replica per bin between the two epochs
    points = spark.createDataFrame([(1, _ts(5))], "pid long, ts timestamp")
    ivs = spark.createDataFrame(
        [(1, _ts(100), _ts(0))], "iid long, start timestamp, end timestamp")
    with pytest.raises(Exception) as ei:
        range_join(points, ivs, bin_seconds=600).collect()
    assert "inverted" in str(ei.value)


def test_edge_aligned_interval_single_replica(spark):
    # [1:00, 2:00) with 60s bins must occupy EXACTLY bin 1 — the old
    # double-epsilon was below the ulp at epoch magnitudes, so the
    # interval leaked a replica into bin 2. Count replicas through the
    # join: one point per bin; an extra replica would surface as an
    # extra (pre-filter) match only in bin 2, so assert via a point AT
    # the edge (filtered) plus the exact integer bin arithmetic.
    from pyspark.sql import functions as F
    from cdcrypt.operators.rangejoin import range_join as rj

    e_us = int(_ts(2, 0).replace(tzinfo=datetime.timezone.utc).timestamp()
               * 1_000_000)
    bins = spark.range(1).select(
        F.floor((F.lit(e_us - 1) - F.pmod(F.lit(e_us - 1),
                                          F.lit(60_000_000)))
                / F.lit(60_000_000)).alias("end_bin"),
    ).head()
    assert bins.end_bin == (e_us // 60_000_000) - 1  # strictly inside bin 1
    # and end-to-end: the edge point still does not match
    points = spark.createDataFrame([(1, _ts(2, 0))], "pid long, ts timestamp")
    ivs = spark.createDataFrame(
        [(1, _ts(1, 0), _ts(2, 0))],
        "iid long, start timestamp, end timestamp")
    assert rj(points, ivs, bin_seconds=60).count() == 0
