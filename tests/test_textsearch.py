"""BM25 ranked retrieval spec (operators/textsearch.py): hand-computed
ground truth on a tiny corpus, the one-shot == indexed equivalence, the
build+append == rebuild equivalence (df recomputation + meta counters),
degenerate inputs (zero-token docs, term missing from corpus, empty
index), and the indexed probe's plan shape (broadcast join, no corpus-side
text rescan)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from cdcrypt.operators.textsearch import (
    TextIndex,
    TextIndexError,
    append_to_text_index,
    bm25_topk,
    bm25_topk_indexed,
    build_text_index,
    doc_postings,
)

CORPUS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the log"),
    (2, "cat cat cat"),
    (3, "dog park"),
    (4, ""),  # zero-token doc: counts toward N, drags avgdl down
]
QUERIES = [(100, "cat"), (101, "dog park"), (102, "unicorn")]


def _bm25_py(corpus, queries, k1=1.2, b=0.75):
    """Independent pure-Python reference (no shared code with the module)."""
    toks = {d: t.lower().split() for d, t in corpus}
    n = len(corpus)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {}
    for ws in toks.values():
        for t in set(ws):
            df[t] = df.get(t, 0) + 1
    out = {}
    for qid, q in queries:
        scores = {}
        for t in set(q.lower().split()):
            if t not in df:
                continue
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            for d, ws in toks.items():
                tf = ws.count(t)
                if tf == 0:
                    continue
                dl = len(ws)
                s = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
                scores[d] = scores.get(d, 0.0) + s
        out[qid] = sorted(scores.items(),
                          key=lambda kv: (-round(kv[1], 4), kv[0]))
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id bigint, text string")


@pytest.fixture(scope="module")
def queries(spark):
    return spark.createDataFrame(QUERIES, "query_id bigint, query string")


def test_doc_postings_tf_and_dl(docs):
    rows = {(r.id, r.term): (r.tf, r.dl)
            for r in doc_postings(docs).collect()}
    assert rows[(0, "the")] == (2, 6)
    assert rows[(2, "cat")] == (3, 3)
    assert not any(i == 4 for i, _ in rows)  # empty doc has no postings


def test_bm25_matches_python_reference(docs, queries):
    got = bm25_topk(docs, queries, k=10).collect()
    ref = _bm25_py(CORPUS, QUERIES)
    by_q = {}
    for r in sorted(got, key=lambda r: (r.query_id, r.rank)):
        by_q.setdefault(r.query_id, []).append((r.doc_id, r.score))
    assert set(by_q) == {100, 101}  # 'unicorn' matches nothing
    for qid, pairs in by_q.items():
        expect = [(d, round(s, 4)) for d, s in ref[qid]]
        assert pairs == expect, (qid, pairs, expect)


def test_k_truncates_and_rank_is_dense_ordered(docs, queries):
    got = bm25_topk(docs, queries, k=1).collect()
    assert {(r.query_id, r.rank) for r in got} == {(100, 1), (101, 1)}


def test_indexed_equals_oneshot(spark, docs, queries, tmp_path):
    idx = build_text_index(docs, str(tmp_path / "tix"), n_partitions=8)
    a = sorted(bm25_topk(docs, queries, k=10).collect())
    via = bm25_topk_indexed(spark, idx, queries, k=10)
    assert sorted(via.collect()) == a
    # string-root form works too
    assert sorted(bm25_topk_indexed(spark, str(tmp_path / "tix"),
                                    queries, k=10).collect()) == a


def test_append_equals_rebuild(spark, docs, queries, tmp_path):
    half_a = docs.where(F.col("doc_id") < 2)
    half_b = docs.where(F.col("doc_id") >= 2)
    idx = build_text_index(half_a, str(tmp_path / "grow"), n_partitions=8)
    idx = append_to_text_index(idx, half_b, meta_extra={"batch": 1})
    assert idx.meta["appends"] == 1 and idx.meta["batch"] == 1
    assert idx.meta["n_docs"] == 5
    full = build_text_index(docs, str(tmp_path / "full"), n_partitions=8)
    assert sorted(bm25_topk_indexed(spark, idx, queries, k=10).collect()) \
        == sorted(bm25_topk_indexed(spark, full, queries, k=10).collect())


def test_empty_index_raises(spark, docs, queries, tmp_path):
    empty = build_text_index(docs.where(F.lit(False)),
                             str(tmp_path / "empty"), n_partitions=4)
    with pytest.raises(TextIndexError, match="empty index"):
        bm25_topk_indexed(spark, empty, queries)
    with pytest.raises(TextIndexError, match="not a text index"):
        TextIndex(str(tmp_path))


def test_indexed_plan_broadcasts_queries(spark, docs, queries, tmp_path):
    """The probe side is a broadcast join over the Hive-partitioned
    postings — the corpus text is never rescanned, and no corpus-sized
    exchange precedes the match."""
    idx = build_text_index(docs, str(tmp_path / "plan"), n_partitions=8)
    plan = bm25_topk_indexed(spark, idx, queries, k=5) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # single-scan pipeline: the postings parquet is read exactly once (df
    # comes from a window, not a groupBy+self-join re-scan)
    assert plan.count("FileScan parquet") == 1
