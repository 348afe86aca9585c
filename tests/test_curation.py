"""End-to-end corpus curation (operators/curation.py): dedup survivors ->
quality/lang gates -> token counts -> deterministic component-keyed split,
verified against independent recomputation of each stage."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdcrypt.operators.curation import curate_corpus

WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}

GOOD = ("the quick brown fox jumps over the lazy dog and runs to the "
        "river of stars and the wind carries the sound of the trees ") * 3
NOISY = "!!! 123 ??? 456 ... 789 %%% 000 !!!"


def _docs(spark):
    rows = []
    for i in range(60):
        if i % 10 == 0:
            rows.append((i, GOOD))                       # cluster seed
        elif i % 10 == 1:
            rows.append((i, GOOD))                       # exact near-dup
        elif i % 10 == 2:
            rows.append((i, GOOD.replace("fox", "cat", 1)))  # near-dup
        elif i % 10 == 3:
            rows.append((i, NOISY))                      # low quality
        else:
            rows.append((i, f"word{i} " * 3 + GOOD[: 40 + i]))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pairs(spark):
    # near-dup relation matching the planted clusters (i, i+1, i+2)
    rows = []
    for i in range(0, 60, 10):
        rows += [(i, i + 1), (i + 1, i + 2)]
    return spark.createDataFrame(rows, "id_a long, id_b long")


def test_curation_pipeline_composes_all_stages(spark):
    docs, pairs = _docs(spark), _pairs(spark)
    out = curate_corpus(docs, pairs, WEIGHTS, min_quality=0.5,
                        langs=("en",)).collect()
    got = {r.doc_id: r for r in out}
    # one survivor per planted 3-doc cluster: the longest text (the seed
    # and the exact dup tie at full length -> min id wins)
    for i in range(0, 60, 10):
        assert i in got and i + 1 not in got and i + 2 not in got
        assert got[i].component == i
        assert got[i].n_in_cluster == 3
    # the noisy low-quality docs are gone even though they are singletons
    assert all(i not in got for i in range(3, 60, 10))
    # token counts match the independent expression
    from cdcrypt.functions.text import token_count
    want_tokens = {r.doc_id: r.n for r in docs.select(
        "doc_id", token_count(F.col("text")).alias("n")).collect()}
    assert all(r.n_tokens == want_tokens[i] for i, r in got.items())
    # split labels are the component-keyed deterministic assignment
    from cdcrypt.functions.sampling import split_case, unit_hash
    want_split = {r.doc_id: r.s for r in docs.select(
        "doc_id", split_case(unit_hash("doc_id", "split-v1"),
                             WEIGHTS).alias("s")).collect()}
    # survivors are component seeds (component == own id), so their split
    # equals the id-keyed assignment
    assert all(r.split == want_split[i] for i, r in got.items())


def test_curation_no_filters_keeps_every_survivor(spark):
    docs, pairs = _docs(spark), _pairs(spark)
    out = curate_corpus(docs, pairs, WEIGHTS)
    # 60 docs, 6 clusters of 3 collapse to 1 each -> 60 - 12 survivors
    assert out.count() == 48
    assert out.where("split not in ('train','val','test')").count() == 0


def test_curation_split_is_stable_across_runs_and_layouts(spark):
    docs, pairs = _docs(spark), _pairs(spark)
    a = {(r.doc_id, r.split)
         for r in curate_corpus(docs, pairs, WEIGHTS).collect()}
    b = {(r.doc_id, r.split)
         for r in curate_corpus(docs.repartition(13), pairs,
                                WEIGHTS).collect()}
    assert a == b


def test_curation_v2_repetition_and_pii_stages(spark):
    """max_dup_3gram drops repetitive survivors (GOOD is a x3-repeated
    sentence, so its dup_3gram is high) and emits the column; pii='flag'
    emits pii_count; pii='drop' removes flagged docs. The base projection
    (no optional stages) is unchanged — schema stability for the existing
    gate."""
    docs = _docs(spark).union(spark.createDataFrame(
        [(100, "kindly reach our analyst at spy@leak.example.net "
               "for all further onboarding details and schedules")],
        "doc_id long, text string"))
    pairs = _pairs(spark)
    base = curate_corpus(docs, pairs, WEIGHTS)
    assert "dup_3gram" not in base.columns and "pii_count" not in base.columns

    v2 = curate_corpus(docs, pairs, WEIGHTS, max_dup_3gram=0.2, pii="flag")
    rows = {r.doc_id: r for r in v2.collect()}
    # the x3-repeated GOOD survivor is gone; unique-text docs survive
    survived = set(rows)
    base_ids = {r.doc_id for r in base.collect()}
    dropped = base_ids - survived
    assert dropped and all(i % 10 in (0, 1, 2) for i in dropped)
    for r in rows.values():
        assert r.dup_3gram <= 0.2
    assert rows[100].pii_count == 1

    dropped_pii = curate_corpus(docs, pairs, WEIGHTS, pii="drop")
    assert 100 not in {r.doc_id for r in dropped_pii.collect()}

    import pytest as _pytest
    with _pytest.raises(ValueError, match="pii="):
        curate_corpus(docs, pairs, WEIGHTS, pii="redact")
