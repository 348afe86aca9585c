"""Line-level corpus dedup (docdedup.dedup_lines): RefinedWeb keep-none and
C4 keep-first semantics, short-line immunity, null/empty passthrough, and
full-strip rewrite."""

from __future__ import annotations

import pytest

from cdcrypt.operators.docdedup import dedup_lines

ROWS = [
    (1, "unique one\nSHARED BANNER LINE\nmore text"),
    (2, "SHARED BANNER LINE\nother prose"),
    (3, None),
    (4, "SHARED BANNER LINE"),
    (5, "ok\n\nok2"),          # short lines are never dup-eligible
    (6, "ok\n\nok2"),          # exact-duplicate doc of 5 (short lines only)
]


def docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def run(spark, **kw):
    return {r["doc_id"]: r["text"]
            for r in dedup_lines(docs(spark), min_line_chars=5,
                                 **kw).collect()}


def test_keep_none_strips_every_occurrence(spark):
    out = run(spark)
    assert out[1] == "unique one\nmore text"
    assert out[2] == "other prose"
    assert out[3] is None                  # null text passes through
    assert out[4] == ""                    # every line stripped
    assert out[5] == "ok\n\nok2"           # short lines survive
    assert out[5] == out[6]


def test_keep_first_retains_global_first(spark):
    out = run(spark, keep="first")
    # doc 1 holds the globally-first (doc_id, pos) occurrence
    assert out[1] == "unique one\nSHARED BANNER LINE\nmore text"
    assert out[2] == "other prose"
    assert out[4] == ""


def test_min_docs_threshold(spark):
    out = run(spark, min_docs=4)  # banner appears in only 3 docs
    assert out[1] == ROWS[0][1]


def test_bad_args(spark):
    with pytest.raises(ValueError, match="keep"):
        dedup_lines(docs(spark), keep="all")
    with pytest.raises(ValueError, match="min_docs"):
        dedup_lines(docs(spark), min_docs=1)
