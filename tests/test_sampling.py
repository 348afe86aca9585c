"""Deterministic splitting/sampling (functions/sampling.py): pure function
of (id, salt) — stable under repartitioning, disjoint+exhaustive, nested
samples, per-stratum independence, and near-dup-cluster-safe splits."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdcrypt.functions.sampling import (
    deterministic_sample,
    deterministic_split,
    leakage_safe_split,
    stratified_sample,
)

WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


def _ids(spark, n=2000):
    return spark.range(n).select(F.col("id").alias("doc_id"))


def test_split_is_deterministic_and_partition_invariant(spark):
    df = _ids(spark)
    a = {r.doc_id: r.split
         for r in deterministic_split(df, WEIGHTS).collect()}
    b = {r.doc_id: r.split
         for r in deterministic_split(df.repartition(7), WEIGHTS).collect()}
    c = {r.doc_id: r.split
         for r in deterministic_split(df.orderBy(F.desc("doc_id")),
                                      WEIGHTS).collect()}
    assert a == b == c
    assert len(a) == 2000  # exhaustive: every row got exactly one label


def test_split_proportions_and_salt_independence(spark):
    df = _ids(spark)
    got = deterministic_split(df, WEIGHTS).groupBy("split").count()
    counts = {r.split: r["count"] for r in got.collect()}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 2000 - 0.8) < 0.04
    assert abs(counts["val"] / 2000 - 0.1) < 0.03
    # a different salt is a fresh, materially different assignment
    other = {r.doc_id: r.split
             for r in deterministic_split(df, WEIGHTS, salt="v2").collect()}
    base = {r.doc_id: r.split
            for r in deterministic_split(df, WEIGHTS).collect()}
    assert sum(base[i] != other[i] for i in base) > 400


def test_split_weight_validation():
    from cdcrypt.functions.sampling import _cumulative
    with pytest.raises(ValueError, match="sum to 1"):
        _cumulative({"a": 0.5, "b": 0.4})
    with pytest.raises(ValueError, match="positive"):
        _cumulative({"a": 1.2, "b": -0.2})
    with pytest.raises(ValueError, match="non-empty"):
        _cumulative({})


def test_nested_samples_and_incremental_stability(spark):
    df = _ids(spark)
    s10 = {r.doc_id for r in deterministic_sample(df, 0.1).collect()}
    s25 = {r.doc_id for r in deterministic_sample(df, 0.25).collect()}
    assert s10 <= s25                      # same salt: nested subsets
    assert abs(len(s25) / 2000 - 0.25) < 0.04
    ind = {r.doc_id for r in
           deterministic_sample(df, 0.25, salt="other").collect()}
    assert ind != s25                      # different salt: independent
    # incremental ingest never moves an old row's membership
    bigger = _ids(spark, 4000)
    again = {r.doc_id for r in
             deterministic_sample(bigger, 0.25).collect()}
    assert {i for i in again if i < 2000} == s25


def test_stratified_sample_per_stratum_independence(spark):
    df = _ids(spark).withColumn(
        "lang", F.when(F.col("doc_id") % 2 == 0, "en").otherwise("de"))
    a = stratified_sample(df, {"en": 0.5, "de": 0.1}, "lang")
    kept_a = {r.doc_id for r in a.collect()}
    n_en = sum(1 for i in kept_a if i % 2 == 0)
    n_de = len(kept_a) - n_en
    assert abs(n_en / 1000 - 0.5) < 0.06
    assert abs(n_de / 1000 - 0.1) < 0.04
    # changing ONE stratum's fraction must not reshuffle the other's keep
    b = stratified_sample(df, {"en": 0.5, "de": 0.3}, "lang")
    kept_b = {r.doc_id for r in b.collect()}
    assert {i for i in kept_a if i % 2 == 0} == \
        {i for i in kept_b if i % 2 == 0}
    # a stratum absent from fractions keeps nothing
    c = stratified_sample(df, {"en": 0.5}, "lang")
    assert all(r.lang == "en" for r in c.collect())


def test_leakage_safe_split_keeps_clusters_whole(spark):
    docs = _ids(spark, 300)
    # planted near-dup graph: chains {i, i+1, i+2} for i % 30 == 0 —
    # transitive clusters that single-pair reasoning would split
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 300, 30)]
        + [(i + 1, i + 2) for i in range(0, 300, 30)],
        "id_a long, id_b long")
    out = leakage_safe_split(docs, pairs, WEIGHTS)
    rows = {r.doc_id: (r.component, r.split) for r in out.collect()}
    assert len(rows) == 300
    for i in range(0, 300, 30):
        comp, split = rows[i]
        assert comp == i                      # min-id component label
        assert rows[i + 1] == (comp, split)   # whole cluster, one split
        assert rows[i + 2] == (comp, split)
    # singletons assign exactly as the plain id-keyed split
    plain = {r.doc_id: r.split
             for r in deterministic_split(docs, WEIGHTS).collect()}
    clustered = {i for i in range(300)
                 if i % 30 in (0, 1, 2)}
    assert all(split == plain[i] for i, (comp, split) in rows.items()
               if i not in clustered)


def test_null_id_raises_instead_of_single_bucket(spark):
    # ADVICE r3: concat_ws SKIPS nulls, so a null id would silently hash to
    # h60(':salt') and pile the whole null population into one bucket. The
    # operators now raise at execution instead.
    import pytest
    from cdcrypt.functions.sampling import (
        deterministic_sample,
        stratified_sample,
    )
    docs = spark.createDataFrame(
        [(1, "a"), (None, "b"), (2, "c")], "doc_id long, text string")
    with pytest.raises(Exception, match="NULL id"):
        deterministic_split(docs, WEIGHTS).collect()
    with pytest.raises(Exception, match="NULL id"):
        deterministic_sample(docs, 0.5).collect()
    with pytest.raises(Exception, match="NULL id"):
        stratified_sample(docs, {"b": 1.0}, "text").collect()
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    with pytest.raises(Exception, match="NULL id"):
        leakage_safe_split(docs, pairs, WEIGHTS).collect()
    # non-null inputs are untouched by the guard
    clean = docs.where("doc_id IS NOT NULL")
    assert deterministic_split(clean, WEIGHTS).count() == 2


def test_shuffle_dataset_deterministic_and_layout_invariant(spark):
    import duckdb

    from cdcrypt.functions.sampling import (
        shuffle_dataset, shuffle_dataset_sql,
    )
    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(400)], "doc_id long, text string")
    a = shuffle_dataset(docs, 8, with_rank=True)
    b = shuffle_dataset(docs.repartition(13).sortWithinPartitions("text"),
                        8, with_rank=True)
    rows_a = sorted(map(tuple, a.select(
        "doc_id", "shard", "sort_key", "shard_rank").collect()))
    rows_b = sorted(map(tuple, b.select(
        "doc_id", "shard", "sort_key", "shard_rank").collect()))
    assert rows_a == rows_b
    # every shard's ranks are dense 1..n
    by_shard = {}
    for _id, sh, _k, rk in rows_a:
        by_shard.setdefault(sh, []).append(rk)
    assert set(by_shard) == set(range(8))  # 400 rows cover all 8 shards
    for ranks in by_shard.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    # append-only stability: adding docs never moves an old row's
    # (shard, sort_key) — its within-shard ORDER relative to old rows
    # is unchanged (new rows interleave by sort_key)
    more = spark.createDataFrame(
        [(i, f"d{i}") for i in range(500)], "doc_id long, text string")
    c = {r["doc_id"]: (r["shard"], r["sort_key"])
         for r in shuffle_dataset(more, 8).collect()}
    assert all(c[i] == (sh, k) for i, sh, k, _ in rows_a)
    # DuckDB replica agrees bit-for-bit
    ora = duckdb.sql(
        "SELECT doc_id, " + shuffle_dataset_sql("doc_id", "shuffle-v1", 8)
        + " FROM (SELECT unnest(range(400)) AS doc_id)").fetchall()
    assert sorted((i, sh, k) for i, k, sh in ora) == [
        (i, sh, k) for i, sh, k, _ in rows_a]


def test_shuffle_dataset_validation(spark):
    import pytest

    from cdcrypt.functions.sampling import shuffle_dataset
    docs = spark.createDataFrame([(1,), (None,)], "doc_id long")
    with pytest.raises(ValueError, match="num_shards"):
        shuffle_dataset(docs, 0)
    with pytest.raises(Exception, match="NULL id"):
        shuffle_dataset(docs, 4).collect()


def test_quota_sample_exact_counts_nested_and_stable(spark):
    from cdcrypt.functions.sampling import quota_sample
    docs = spark.createDataFrame(
        [(i, ["en", "fr", "de"][i % 3]) for i in range(300)],
        "doc_id long, lang string")
    out = quota_sample(docs, {"en": 40, "fr": 10}, "lang")
    counts = {r["lang"]: r["n"] for r in
              out.groupBy("lang").count().withColumnRenamed(
                  "count", "n").collect()}
    assert counts == {"en": 40, "fr": 10}  # de unlisted -> dropped
    # nested: the 10-quota sample is a prefix of the 40-quota sample
    small = {r["doc_id"] for r in
             quota_sample(docs, {"en": 10}, "lang").collect()}
    big = {r["doc_id"] for r in out.where("lang = 'en'").collect()}
    assert small < big
    # layout-invariant
    out2 = quota_sample(docs.repartition(7), {"en": 40, "fr": 10}, "lang")
    assert sorted(map(tuple, out.collect())) == \
        sorted(map(tuple, out2.collect()))
    # quota above stratum size: whole stratum
    assert quota_sample(docs, {"fr": 10_000}, "lang").count() == 100
    # rank-limit pushdown: the literal conjunct keeps the shuffle
    # O(partitions x quota), not the corpus
    assert "WindowGroupLimit" in out._jdf.queryExecution() \
        .executedPlan().toString()
    import pytest
    with pytest.raises(ValueError, match="quota"):
        quota_sample(docs, {"en": -1}, "lang")
    with pytest.raises(ValueError, match="non-empty"):
        quota_sample(docs, {}, "lang")


def test_write_shuffled_sorted_shard_files(spark, tmp_path):
    import glob

    import pyarrow.parquet as pq

    from cdcrypt.functions.sampling import shuffle_dataset, write_shuffled
    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(400)], "doc_id long, text string")
    path = str(tmp_path / "export")
    write_shuffled(docs, path, 8)
    expected = {}
    for r in shuffle_dataset(docs, 8).collect():
        expected.setdefault(r["shard"], []).append(
            (r["sort_key"], r["doc_id"]))
    for sh, rows in expected.items():
        rows.sort()
        files = glob.glob(f"{path}/shard={sh}/*.parquet")
        assert len(files) == 1  # one sorted file per shard
        t = pq.read_table(files[0])
        got = list(zip(t["sort_key"].to_pylist(), t["doc_id"].to_pylist()))
        assert got == rows  # file order IS the shuffled order


# ---------------------------------------------------------------------------
# token-budget domain mixture
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def mix_docs(spark):
    # 3 domains, ~equal doc counts, distinct token masses: web docs are
    # 8 tokens, code 6, wiki 4 — exact totals web 80, code 60, wiki 20
    rows = []
    for i in range(10):
        rows.append((i, "w " * 8, "web"))
    for i in range(10, 20):
        rows.append((i, "c " * 6, "code"))
    for i in range(20, 25):
        rows.append((i, "k " * 4, "wiki"))
    rows.append((25, "x", "other"))            # unlisted domain: dropped
    return spark.createDataFrame(rows, ["doc_id", "text", "source"])


_MIX_SHARES = {"web": 0.5, "code": 0.3, "wiki": 0.2}


def test_mixture_plan_fractions_match_python(mix_docs):
    from cdcrypt.functions.sampling import mixture_plan

    got = {r.source: r for r in
           mixture_plan(mix_docs, _MIX_SHARES, budget_factor=2.0).collect()}
    toks = {"web": 80, "code": 60, "wiki": 20}
    # identical op order as the engine: T0 = min(tokens/share), then
    # (share * (T0 * factor)) / tokens — python floats are the same
    # IEEE doubles, so equality is exact (after the plan's round-6)
    t0 = min(toks[d] / _MIX_SHARES[d] for d in toks)
    for d, tk in toks.items():
        assert got[d].n_tokens == tk
        assert got[d].fraction == round(
            (_MIX_SHARES[d] * (t0 * 2.0)) / tk, 6)
    assert "other" not in got
    # wiki binds (20/.2=100 < 160, 200): factor 2 => 2 epochs of wiki
    assert got["wiki"].fraction == 2.0


def test_mixture_sample_copies_and_epochs(mix_docs):
    from cdcrypt.functions.sampling import mixture_by_tokens, mixture_plan

    out = mixture_by_tokens(mix_docs, _MIX_SHARES, budget_factor=2.0)
    rows = out.collect()
    frac = {r.source: r.fraction for r in mixture_plan(
        mix_docs, _MIX_SHARES, budget_factor=2.0).collect()}
    by_doc = {}
    for r in rows:
        by_doc.setdefault((r.doc_id, r.source), []).append(r.epoch)
    import math
    for (doc_id, src), epochs in by_doc.items():
        lo = math.floor(frac[src])
        assert len(epochs) in (lo, lo + 1)          # floor or ceil copies
        assert sorted(epochs) == list(range(len(epochs)))  # prefix 0..c-1
    # every wiki doc appears exactly twice (fraction exactly 2.0)
    wiki = [k for k in by_doc if k[1] == "wiki"]
    assert len(wiki) == 5 and all(len(by_doc[k]) == 2 for k in wiki)
    # unlisted domain excluded entirely
    assert not [k for k in by_doc if k[1] == "other"]


def test_mixture_sample_deterministic_and_nested(mix_docs):
    from cdcrypt.functions.sampling import mixture_by_tokens

    key = lambda r: (r.doc_id, r.epoch)  # noqa: E731
    a = sorted(map(key, mixture_by_tokens(
        mix_docs, _MIX_SHARES, budget_factor=1.3).collect()))
    b = sorted(map(key, mixture_by_tokens(
        mix_docs.repartition(7), _MIX_SHARES,
        budget_factor=1.3).collect()))
    assert a == b                       # layout-invariant
    big = set(map(key, mixture_by_tokens(
        mix_docs, _MIX_SHARES, budget_factor=1.9).collect()))
    # nested: a bigger budget never drops a (doc, epoch) the smaller kept
    assert set(a) <= big


def test_mixture_validation_and_guards(mix_docs):
    from cdcrypt.functions.sampling import mixture_by_tokens

    with pytest.raises(ValueError, match="sum to 1"):
        mixture_by_tokens(mix_docs, {"web": 0.5, "code": 0.3})
    with pytest.raises(ValueError, match="positive"):
        mixture_by_tokens(mix_docs, {"web": 1.5, "code": -0.5})
    with pytest.raises(ValueError, match="not both"):
        mixture_by_tokens(mix_docs, _MIX_SHARES, token_budget=100,
                          budget_factor=2.0)
    with pytest.raises(Exception, match="max_epochs"):
        # wiki has 20 tokens; a 10k-token budget implies 100 epochs of it
        mixture_by_tokens(mix_docs, _MIX_SHARES,
                          token_budget=10_000).collect()


def test_mixture_token_budget_absolute(mix_docs):
    from cdcrypt.functions.sampling import mixture_plan

    got = {r.source: r.fraction for r in mixture_plan(
        mix_docs, _MIX_SHARES, token_budget=100).collect()}
    # fraction = share * 100 / tokens
    assert got == {"web": round(0.5 * 100.0 / 80, 6),
                   "code": round(0.3 * 100.0 / 60, 6),
                   "wiki": round(0.2 * 100.0 / 20, 6)}


def test_mixture_realized_token_shares(spark):
    from cdcrypt.functions.sampling import mixture_by_tokens
    from cdcrypt.functions.text import token_count

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    shares = {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1}
    out = mixture_by_tokens(docs, shares, budget_factor=1.9)
    toks = {r["source"]: r["t"] for r in out.groupBy("source").agg(
        F.sum(token_count(F.col("text"))).alias("t")).collect()}
    total = sum(toks.values())
    for d, w in shares.items():
        # binomial remainder noise on ~25 docs/domain: generous tolerance
        assert abs(toks[d] / total - w) < 0.08, (d, toks[d] / total)
