"""Bigram-LM perplexity spec (operators/lmscore.py): hand-computed
probabilities on a tiny corpus, BOS handling, unseen-bigram smoothing
floor, reference-vs-gibberish ordering (the CCNet property the filter
exists for), the keep-rule semi-join, zero-token-doc absence, and a
DuckDB replay of the exact lag-window formulation the gate oracle uses."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from cdcrypt.operators.lmscore import (
    BOS,
    doc_bigrams,
    perplexity_filter,
    score_perplexity,
    train_bigram_lm,
)

REF = [
    (0, "the cat sat on the mat"),
    (1, "the cat ate the fish"),
    (2, "the dog sat on the log"),
]
ALPHA = 0.1


def _py_lm(corpus):
    cnt, ctx, vocab = {}, {}, set()
    for _, t in corpus:
        ws = t.lower().split()
        prev = BOS
        for w in ws:
            cnt[(prev, w)] = cnt.get((prev, w), 0) + 1
            ctx[prev] = ctx.get(prev, 0) + 1
            vocab.add(w)
            prev = w
    return cnt, ctx, len(vocab)


def _py_score(text, cnt, ctx, v, a=ALPHA):
    ws = text.lower().split()
    prev, lps = BOS, []
    for w in ws:
        c = cnt.get((prev, w), 0)
        n = ctx.get(prev, 0)
        lps.append(math.log((c + a) / (n + a * (v + 1))))
        prev = w
    return sum(lps) / len(lps)


@pytest.fixture(scope="module")
def ref_docs(spark):
    return spark.createDataFrame(REF, "doc_id bigint, text string")


@pytest.fixture(scope="module")
def lm(ref_docs):
    return train_bigram_lm(ref_docs)


def test_doc_bigrams_bos_and_counts(ref_docs):
    rows = doc_bigrams(ref_docs.where(F.col("doc_id") == 0)).collect()
    assert len(rows) == 6  # one per token, first paired with BOS
    from cdcrypt.functions.hash64 import h60
    bos_h = ref_docs.sparkSession.range(1).select(
        h60(F.lit(BOS))).first()[0]
    assert sum(1 for r in rows if r.hp == bos_h) == 1


def test_training_counts_match_python(lm, ref_docs, spark):
    cnt, ctx, v = _py_lm(REF)
    assert lm.vocab.first().v == v
    got_total = lm.bigrams.agg(F.sum("cnt")).first()[0]
    assert got_total == sum(cnt.values())
    # the most frequent context is 'the' (6 occurrences as prev)
    assert max(ctx.values()) == \
        lm.contexts.agg(F.max("ctx")).first()[0]


def test_scores_match_python(spark, lm):
    cnt, ctx, v = _py_lm(REF)
    probe = spark.createDataFrame(
        [(10, "the cat sat on the log"),     # in-distribution
         (11, "fish ate dog zzz unseenword")],  # heavy smoothing floor
        "doc_id bigint, text string")
    got = {r.doc_id: r for r in score_perplexity(probe, lm).collect()}
    for did, text in [(10, "the cat sat on the log"),
                      (11, "fish ate dog zzz unseenword")]:
        lp = _py_score(text, cnt, ctx, v)
        assert got[did].avg_logp == pytest.approx(round(lp, 4), abs=1e-4)
        assert got[did].ppl == pytest.approx(round(math.exp(-lp), 4),
                                             abs=1e-3)
        assert got[did].n_tokens == len(text.split())
    assert got[10].ppl < got[11].ppl  # the CCNet ordering property


def test_zero_token_docs_absent_and_filter(spark, lm):
    probe = spark.createDataFrame(
        [(20, "the cat sat"), (21, "zq wv xj"), (22, "   ")],
        "doc_id bigint, text string")
    scored = score_perplexity(probe, lm)
    assert {r.doc_id for r in scored.collect()} == {20, 21}
    cut = scored.where(F.col("doc_id") == 20).first().ppl
    kept = perplexity_filter(probe, lm, max_ppl=float(cut) + 0.1)
    assert {r.doc_id for r in kept.collect()} == {20}


def test_duckdb_lag_formulation_matches(spark, lm, ref_docs):
    """The gate oracle builds bigrams with a lag window instead of the
    engine's array zip — prove the two formulations agree end-to-end."""
    probe = spark.createDataFrame(
        [(30, "the dog ate the mat"), (31, "cat cat cat")],
        "doc_id bigint, text string")
    got = {(r.doc_id): (r.n_tokens, r.avg_logp, r.ppl)
           for r in score_perplexity(probe, lm).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE ref AS SELECT * FROM (VALUES "
                + ",".join(f"({i}, '{t}')" for i, t in REF)
                + ") v(doc_id, text)")
    con.execute("CREATE TABLE probe AS SELECT * FROM (VALUES "
                "(30, 'the dog ate the mat'), (31, 'cat cat cat')"
                ") v(doc_id, text)")
    sql = """
    WITH tok AS (
      SELECT doc_id, unnest(ws) AS term, generate_subscripts(ws, 1) AS pos
      FROM (SELECT doc_id, list_filter(regexp_split_to_array(
              regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' '),
              x -> x <> '') AS ws FROM {src})),
    big AS (
      SELECT doc_id,
        ('0x' || substr(md5(coalesce(lag(term) OVER
           (PARTITION BY doc_id ORDER BY pos), '<s>')),1,15))::BIGINT AS hp,
        ('0x' || substr(md5(term),1,15))::BIGINT AS ht
      FROM tok)
    """
    con.execute("CREATE TABLE train AS "
                + sql.format(src="ref")
                + "SELECT hp, ht, count(*) AS cnt FROM big GROUP BY 1, 2")
    oracle = con.execute(
        sql.format(src="probe") + """
        , ctx AS (SELECT hp, CAST(sum(cnt) AS BIGINT) AS ctx
                  FROM train GROUP BY hp),
        v AS (SELECT count(DISTINCT ht) AS v FROM train)
        SELECT doc_id, count(*) AS n_tokens,
               round(avg(ln((coalesce(cnt, 0) + 0.1)
                   / (coalesce(ctx, 0) + 0.1 * (v + 1)))), 4) AS avg_logp,
               round(exp(-avg(ln((coalesce(cnt, 0) + 0.1)
                   / (coalesce(ctx, 0) + 0.1 * (v + 1))))), 4) AS ppl
        FROM big LEFT JOIN train USING (hp, ht) LEFT JOIN ctx USING (hp)
        CROSS JOIN v GROUP BY doc_id
        """).fetchall()
    assert {r[0]: (r[1], r[2], r[3]) for r in oracle} == got


def test_lm_index_append_equals_retrain(spark, ref_docs, tmp_path):
    """build(half) + append(half) scores identically to train-from-scratch
    on the full corpus — the merge-on-read sum is exact; compaction folds
    segments without changing any score."""
    from cdcrypt.operators.lmscore import (
        BigramLMIndex,
        LMIndexError,
        append_to_lm_index,
        build_lm_index,
        compact_lm_index,
        score_perplexity,
        train_bigram_lm,
    )

    probe = spark.createDataFrame(
        [(40, "the cat sat on the log"), (41, "dog ate fish")],
        "doc_id bigint, text string")
    expect = sorted(score_perplexity(probe, train_bigram_lm(ref_docs))
                    .collect())

    idx = build_lm_index(ref_docs.where(F.col("doc_id") < 2),
                         str(tmp_path / "lm"), n_partitions=4)
    idx = append_to_lm_index(idx, ref_docs.where(F.col("doc_id") >= 2),
                             meta_extra={"batch": 7})
    assert idx.meta["n_docs"] == 3 and idx.meta["appends"] == 1
    assert idx.meta["batch"] == 7
    got = sorted(score_perplexity(probe, idx.lm(spark)).collect())
    assert got == expect

    idx = compact_lm_index(spark, idx)
    assert idx.meta["compactions"] == 1
    assert sorted(score_perplexity(probe, idx.lm(spark)).collect()) == expect
    # compaction actually folded the duplicate (hp, ht) segment rows
    import os
    raw = spark.read.parquet(os.path.join(idx.root, "counts"))
    merged = idx.read_counts(spark)
    assert raw.count() == merged.count()

    with pytest.raises(LMIndexError, match="not an LM index"):
        BigramLMIndex(str(tmp_path))
