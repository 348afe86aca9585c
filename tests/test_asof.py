"""asof_join vs pandas.merge_asof (independent oracle) + plan shape."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from cdcrypt.operators.asof import asof_join


def _rand_frames(seed, n_left=200, n_right=60, n_keys=7):
    rng = np.random.RandomState(seed)
    left = pd.DataFrame({
        "k": rng.randint(0, n_keys, n_left),
        "seq": rng.randint(0, 500, n_left).astype("int64"),
        "fact": rng.randn(n_left).round(4),
    })
    right = pd.DataFrame({
        "k": rng.randint(0, n_keys, n_right),
        "seq": rng.randint(0, 500, n_right).astype("int64"),
        "dim": rng.randn(n_right).round(4),
    })
    # merge_asof needs unique (k, seq) on the right for a deterministic
    # comparison (ties are unspecified in both engines)
    right = right.drop_duplicates(["k", "seq"])
    return left, right


def _oracle(left, right, direction, exact, tolerance):
    out = pd.merge_asof(
        left.sort_values("seq", kind="stable").reset_index(drop=True),
        right.sort_values("seq", kind="stable").reset_index(drop=True),
        on="seq", by="k", direction=direction,
        allow_exact_matches=exact,
        **({"tolerance": tolerance} if tolerance is not None else {}),
    )
    return out


def _run(spark, left, right, **kw):
    l = spark.createDataFrame(left)
    r = spark.createDataFrame(right)
    return (asof_join(l, r, key_cols=["k"], on="seq", **kw)
            .toPandas())


def _cmp(got, want):
    cols = ["k", "seq", "fact", "dim"]
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("exact", [True, False])
def test_matches_pandas_merge_asof(spark, seed, direction, exact):
    left, right = _rand_frames(seed)
    got = _run(spark, left, right, direction=direction,
               allow_exact_match=exact)
    _cmp(got, _oracle(left, right, direction, exact, None))


@pytest.mark.parametrize("tolerance", [0, 5, 50])
def test_tolerance(spark, tolerance):
    left, right = _rand_frames(7)
    got = _run(spark, left, right, tolerance=tolerance)
    _cmp(got, _oracle(left, right, "backward", True, tolerance))


def test_null_seqs_unmatched_and_null_right_dropped(spark):
    l = spark.createDataFrame(
        [(1, 10, "a"), (1, None, "b"), (2, 5, "c")],
        "k int, seq int, fact string")
    r = spark.createDataFrame(
        [(1, 8, "d1"), (1, None, "poison"), (2, 9, "d2")],
        "k int, seq int, dim string")
    rows = {(x.k, x.seq): x.dim
            for x in asof_join(l, r, key_cols=["k"], on="seq").collect()}
    assert rows[(1, 10)] == "d1"
    assert rows[(1, None)] is None        # null left seq never matches
    assert rows[(2, 5)] is None           # dim at 9 is after the fact
    # forward direction: null left seq sorts last under desc — still null
    rows_f = {(x.k, x.seq): x.dim
              for x in asof_join(l, r, key_cols=["k"], on="seq",
                                 direction="forward").collect()}
    assert rows_f[(1, None)] is None
    assert rows_f[(2, 5)] == "d2"


def test_matched_col_and_right_on(spark):
    l = spark.createDataFrame([(1, 10)], "k int, seq int")
    r = spark.createDataFrame([(1, 7, 1.5)], "k int, vseq int, dim double")
    row = asof_join(l, r, key_cols=["k"], on="seq", right_on="vseq",
                    matched_col="dim_seq").first()
    assert (row.dim, row.dim_seq) == (1.5, 7)


def test_collision_raises(spark):
    l = spark.createDataFrame([(1, 10, 2.0)], "k int, seq int, dim double")
    r = spark.createDataFrame([(1, 7, 1.5)], "k int, seq int, dim double")
    with pytest.raises(ValueError, match="collide"):
        asof_join(l, r, key_cols=["k"], on="seq")


def test_scd2_history_enrichment(spark):
    """Facts joined to an SCD2 history's open edges reproduce the
    interval containment read (scd2 intervals are [from, to))."""
    from cdcrypt.operators.scd2 import scd2_resolve

    ev = spark.createDataFrame(
        [("U", 1, 1, "v1"), ("U", 1, 5, "v2"), ("D", 1, 9, None),
         ("U", 2, 3, "w1")],
        "op string, k int, op_seq int, state string")
    hist = scd2_resolve(ev, key_cols=["k"])
    facts = spark.createDataFrame(
        [(1, 0), (1, 1), (1, 6), (1, 9), (2, 100)], "k int, seq int")
    dims = hist.select("k", F.col("valid_from_seq").alias("vseq"),
                       "state",
                       F.col("valid_to_seq").alias("vto"))
    out = asof_join(facts, dims, key_cols=["k"], on="seq", right_on="vseq",
                    payload_cols=["state", "vto"])
    # a fact past the interval's close (delete) must null out
    got = {(x.k, x.seq):
           (x.state if x.vto is None or x.seq < x.vto else None)
           for x in out.collect()}
    assert got == {(1, 0): None, (1, 1): "v1", (1, 6): "v2",
                   (1, 9): None, (2, 100): "w1"}


def test_plan_has_no_join_and_one_exchange(spark):
    left, right = _rand_frames(3)
    df = asof_join(spark.createDataFrame(left),
                   spark.createDataFrame(right), key_cols=["k"], on="seq")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
