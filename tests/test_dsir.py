"""DSIR spec (operators/dsir.py): feature extraction shapes, a pure-Python
replay of the full estimator (hashed features -> smoothed log-ratios ->
per-doc scores -> deterministic Gumbel top-k), the selection property the
operator exists for (target-like docs outrank noise), per_token vs raw-sum
modes, and rerun determinism."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from cdcrypt.operators.dsir import (
    dsir_sample,
    dsir_weights,
    hashed_ngram_features,
)

B = 512
TARGET = [
    (900, "the cat sat on the mat"),
    (901, "the cat ate the fish"),
    (902, "a cat and a dog sat"),
]
RAW = [
    (0, "the cat sat on the mat again"),      # target-like
    (1, "the dog ate the fish"),              # close
    (2, "quarterly revenue grew nine percent"),  # off-distribution
    (3, "colorless green ideas sleep furiously"),
    (4, "the cat sat"),                        # short target-like
    (5, ""),                                   # zero tokens -> absent
]


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _feats(text: str, b: int = B) -> dict[int, int]:
    ws = text.lower().split()
    grams = [f"u:{w}" for w in ws] + [
        f"b:{a} {c}" for a, c in zip(ws, ws[1:])]
    out: dict[int, int] = {}
    for g in grams:
        k = _h60(g) % b
        out[k] = out.get(k, 0) + 1
    return out


def _py_scores(raw, target, alpha=0.5, per_token=True, b=B):
    ct, cr = {}, {}
    for _, t in target:
        for k, v in _feats(t, b).items():
            ct[k] = ct.get(k, 0) + v
    for _, t in raw:
        for k, v in _feats(t, b).items():
            cr[k] = cr.get(k, 0) + v
    tt, tr = sum(ct.values()), sum(cr.values())
    scores = {}
    for did, t in raw:
        f = _feats(t, b)
        if not f:
            continue
        num = sum(v * (math.log((ct.get(k, 0) + alpha) / (tt + alpha * b))
                       - math.log((cr.get(k, 0) + alpha) / (tr + alpha * b)))
                  for k, v in f.items())
        scores[did] = round(num / (sum(f.values()) if per_token else 1.0), 4)
    return scores


@pytest.fixture(scope="module")
def raw(spark):
    return spark.createDataFrame(RAW, "doc_id bigint, text string")


@pytest.fixture(scope="module")
def target(spark):
    return spark.createDataFrame(TARGET, "doc_id bigint, text string")


def test_feature_counts_match_python(raw):
    got = {}
    for r in hashed_ngram_features(raw, B).collect():
        got.setdefault(r.id, {})[r.bucket] = r.cnt
    for did, text in RAW:
        assert got.get(did, {}) == _feats(text), did
    assert 5 not in got  # zero-token doc emits no features


def test_weights_match_python_estimator(raw, target):
    ref = _py_scores(RAW, TARGET)
    got = {r.doc_id: r.logw
           for r in dsir_weights(raw, target, n_buckets=B).collect()}
    assert set(got) == set(ref)
    for did in ref:
        assert got[did] == pytest.approx(ref[did], abs=2e-4), did


def test_target_like_outranks_noise(raw, target):
    got = {r.doc_id: r.logw
           for r in dsir_weights(raw, target, n_buckets=B).collect()}
    assert min(got[0], got[4]) > max(got[2], got[3])


def test_raw_sum_mode(raw, target):
    ref = _py_scores(RAW, TARGET, per_token=False)
    got = {r.doc_id: r.logw
           for r in dsir_weights(raw, target, n_buckets=B,
                                 per_token=False).collect()}
    for did in ref:
        assert got[did] == pytest.approx(ref[did], abs=2e-3), did


def test_gumbel_topk_deterministic_and_matches_python(raw, target):
    ref = _py_scores(RAW, TARGET)
    keyed = {}
    for did, lw in ref.items():
        u = _h60(f"{did}:dsir") / float(1 << 60)
        keyed[did] = round(lw + -math.log(-math.log(u)), 4)
    expect = sorted(keyed, key=lambda d: (-keyed[d], d))[:3]
    got = dsir_sample(raw, target, k=3, n_buckets=B).collect()
    assert [r.doc_id for r in sorted(got, key=lambda r: r.rank)] == expect
    again = dsir_sample(raw, target, k=3, n_buckets=B).collect()
    assert sorted(got) == sorted(again)  # rerun-stable
    # a different salt reshuffles the noise, same weights
    other = dsir_sample(raw, target, k=3, n_buckets=B, salt="x").collect()
    assert {r.doc_id: r.logw for r in other}.keys() <= set(ref)
