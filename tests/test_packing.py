"""Sequence packing + chunking: determinism, bounded overflow, oracle
parity with DuckDB's window arithmetic, and the zero-shuffle chunk plan."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from cdcrypt.operators.packing import chunk_documents, pack_sequences


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_every_doc_packed_exactly_once(spark):
    df = _docs(spark, [(i, "w " * (i % 37 + 1)) for i in range(200)])
    out = pack_sequences(df, budget=64, n_shards=4).collect()
    assert len(out) == 200
    assert len({r["doc_id"] for r in out}) == 200
    assert all(r["shard"] == r["shard"] and 0 <= r["shard"] < 4 for r in out)


def test_bounded_overflow_and_offsets(spark):
    budget = 50
    df = _docs(spark, [(i, "tok " * (i % 23 + 1)) for i in range(300)])
    rows = pack_sequences(df, budget=budget, n_shards=2).collect()
    packs: dict[tuple, list] = {}
    for r in rows:
        packs.setdefault((r["shard"], r["pack"]), []).append(r)
    for members in packs.values():
        members.sort(key=lambda r: r["off_tokens"])
        # offsets are consistent cumulative positions below the budget
        cum = members[0]["off_tokens"]
        for r in members:
            assert r["off_tokens"] == cum
            assert r["off_tokens"] < budget  # a pack never STARTS a doc late
            cum += r["n_tokens"]
        # bounded overflow: total < budget + last member's tokens
        total = sum(r["n_tokens"] for r in members) + members[0]["off_tokens"]
        assert total < budget + members[-1]["n_tokens"]


def test_oversize_doc_gets_sole_pack_membership(spark):
    df = _docs(spark, [(1, "x " * 500), (2, "y y"), (3, "z z z")])
    rows = pack_sequences(df, budget=10, n_shards=1).collect()
    big = next(r for r in rows if r["doc_id"] == 1)
    others = [r for r in rows if r["doc_id"] != 1]
    # nothing shares the oversize doc's pack unless it started there
    for r in others:
        if r["pack"] == big["pack"]:
            assert r["off_tokens"] < big["off_tokens"]


def test_packing_deterministic_under_repartition(spark):
    df = _docs(spark, [(i, "w " * (i % 11 + 1)) for i in range(150)])
    a = {(r["doc_id"], r["shard"], r["pack"], r["off_tokens"])
         for r in pack_sequences(df, budget=32, n_shards=8).collect()}
    b = {(r["doc_id"], r["shard"], r["pack"], r["off_tokens"])
         for r in pack_sequences(
             df.repartition(13), budget=32, n_shards=8).collect()}
    assert a == b


def test_packing_matches_duckdb_window(spark):
    # the gate oracle's exact arithmetic replayed on a small frame
    rows = [(i, "w " * (i % 7 + 1)) for i in range(80)]
    got = {(r["doc_id"], r["n_tokens"], r["shard"], r["pack"], r["off_tokens"])
           for r in pack_sequences(
               _docs(spark, rows), budget=16, n_shards=4).collect()}
    want = set(duckdb.sql("""
        WITH base AS (
          SELECT doc_id,
                 CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                      ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
                      AS BIGINT) AS n_tokens,
                 ('0x' || substr(md5('pack' || ':' ||
                      CAST(doc_id AS VARCHAR)),1,15))::BIGINT AS h
          FROM (SELECT * FROM (VALUES {vals}) t(doc_id, text))
        ), cum AS (
          SELECT doc_id, n_tokens, CAST(h % 4 AS INT) AS shard,
                 COALESCE(SUM(n_tokens) OVER (
                     PARTITION BY h % 4 ORDER BY h, doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0) AS cb
          FROM base)
        SELECT doc_id, n_tokens, shard,
               CAST(cb // 16 AS BIGINT) AS pack,
               CAST(cb - (cb // 16) * 16 AS BIGINT) AS off_tokens
        FROM cum
    """.format(vals=", ".join(f"({i}, '{t}')" for i, t in rows))).fetchall())
    assert got == want


def test_null_id_raises(spark):
    df = spark.createDataFrame([(None, "a b")], "doc_id long, text string")
    with pytest.raises(Exception, match="NULL doc_id"):
        pack_sequences(df, budget=8).collect()


def test_chunking_reassembles_and_overlaps(spark):
    text = "".join(chr(ord("a") + i % 26) for i in range(95))
    df = _docs(spark, [(1, text), (2, ""), (3, None)])
    out = {r["doc_id"]: r for r in []}
    rows = chunk_documents(df, max_chars=40, overlap=10).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    chunks = [r["chunk"] for r in sorted(by_doc[1], key=lambda r: r["chunk_idx"])]
    # stride 30: starts 0,30,60,90 -> lengths 40,40,35,5
    assert [len(c) for c in chunks] == [40, 40, 35, 5]
    assert chunks[0][30:] == chunks[1][:10]  # overlap shared
    # non-overlapping prefixes reassemble the original
    assert "".join(c[:30] for c in chunks)[:95] == text
    assert by_doc[2][0]["chunk"] == ""  # empty text -> one empty chunk
    assert 3 not in by_doc  # null text -> no rows


def test_chunking_zero_shuffle_plan(spark):
    df = _docs(spark, [(1, "abc")])
    plan = chunk_documents(df, 2)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "EvalPython" not in plan


def test_config_errors(spark):
    df = _docs(spark, [(1, "a")])
    with pytest.raises(ValueError):
        pack_sequences(df, budget=0)
    with pytest.raises(ValueError):
        pack_sequences(df, budget=8, n_shards=0)
    with pytest.raises(ValueError):
        chunk_documents(df, 0)
    with pytest.raises(ValueError):
        chunk_documents(df, 10, overlap=10)


def test_materialize_packs_counts_and_order(spark):
    from cdcrypt.operators.packing import materialize_packs

    df = _docs(spark, [(i, "w " * (i % 37 + 1)) for i in range(200)])
    packed = pack_sequences(df, budget=64, n_shards=4)
    manifest = materialize_packs(packed).collect()
    flat = packed.collect()
    by_pack = {}
    for r in flat:
        by_pack.setdefault((r.shard, r.pack), []).append(r)
    assert len(manifest) == len(by_pack)
    for m in manifest:
        members = sorted(by_pack[(m.shard, m.pack)],
                         key=lambda r: (r.off_tokens, r.doc_id))
        assert m.n_docs == len(members)
        assert m.total_tokens == sum(r.n_tokens for r in members)
        assert list(m.doc_ids) == [r.doc_id for r in members]
        assert list(m.doc_offsets) == [r.off_tokens for r in members]
        # offsets are nondecreasing; the first offset may be nonzero when
        # the previous pack's last member overflowed into this pack's
        # token range (documented bounded-overshoot semantics)
        offs = list(m.doc_offsets)
        assert offs == sorted(offs) and 0 <= offs[0] < 64


def test_materialize_packs_token_stream(spark):
    # real-ids path: the pack's flattened token stream equals the members'
    # arrays concatenated in offset order, and boundaries line up
    from cdcrypt.operators.packing import materialize_packs
    from cdcrypt.operators.tokenizer import tokenize_and_pack, train_bpe

    df = _docs(spark, [(i, "alpha beta gamma delta " * (i % 7 + 1))
                       for i in range(60)])
    model = train_bpe(df, vocab_size=100, sample_rows=100)
    packed = tokenize_and_pack(df, model, 48, n_shards=2)
    mat = materialize_packs(packed, ids_col="token_ids")
    ref = {(r.shard, r.pack): r for r in mat.collect()}
    members = {}
    for r in packed.collect():
        members.setdefault((r.shard, r.pack), []).append(r)
    for key, rows in members.items():
        rows.sort(key=lambda r: (r.off_tokens, r.doc_id))
        want = [t for r in rows for t in r.token_ids]
        got = ref[key]
        assert list(got.token_ids) == want
        assert got.total_tokens == len(want)
        # each member's slice starts at its recorded offset... only true
        # when no pack overflows mid-pack: offset deltas equal member sizes
        for a, b in zip(rows, rows[1:]):
            assert b.off_tokens - a.off_tokens == a.n_tokens


def test_keep_cols_reserved_name_collision_raises(spark):
    from cdcrypt.operators.packing import pack_sequences
    df = spark.createDataFrame(
        [("d1", "a b c", 3)], "doc_id string, text string, pack long")
    with pytest.raises(ValueError, match="reserved output names"):
        pack_sequences(df, budget=10, keep_cols=("pack",))
    with pytest.raises(ValueError, match="reserved output names"):
        pack_sequences(df, budget=10, keep_cols=("doc_id",))
