"""BPE tokenizer: reference-example equivalence, determinism, round-trip,
and the tokenize_and_pack composition (real ids driving the packing
arithmetic). BPE's merge loop is not one-shot-SQL-expressible, so this
suite (not a DuckDB oracle) is the correctness evidence — the worked
example from Sennrich et al. 2016 pins the algorithm, the round-trip
property pins encode/decode inverse-ness, and the pure-Python encoder is
compared row-for-row against the Arrow-batched UDF output."""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F

from cdcrypt.operators.tokenizer import (
    END,
    BpeModel,
    bpe_decode,
    bpe_encode,
    encode_text,
    learn_merges,
    tokenize_and_pack,
    train_bpe,
)


def _mk_model(word_freqs: dict[str, int], n_merges: int) -> BpeModel:
    from cdcrypt.operators.tokenizer import _build_vocab

    merges, chars = learn_merges(word_freqs, n_merges)
    return BpeModel(merges=merges, vocab=_build_vocab(merges, chars))


class TestLearnMerges:
    def test_sennrich_worked_example(self):
        # the BPE paper's example: {low:5, lower:2, newest:6, widest:3}.
        # Highest-frequency adjacent pairs merge in order; the canonical
        # first merges are (e,s)->es [9], (es,t)->est [9], (est,</w>) [9],
        # (l,o) [7], (lo,w) [7] with lexicographic tie-breaks.
        freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
        merges, chars = learn_merges(freqs, 5)
        assert merges == (
            ("e", "s"), ("es", "t"), ("est", END), ("l", "o"), ("lo", "w"),
        )
        assert chars == sorted(set("lowernewstwid"))

    def test_tie_break_lexicographic(self):
        # "ab" and "cd" each appear twice -> (a,b) wins the tie over (c,d)
        merges, _ = learn_merges({"ab": 2, "cd": 2}, 1)
        assert merges == (("a", "b"),)

    def test_stops_when_nothing_repeats(self):
        merges, _ = learn_merges({"ab": 1, "cd": 1}, 50)
        assert merges == ()  # every pair count is 1 -> no merge earns keep

    def test_merge_application_in_encode(self):
        m = _mk_model({"low": 5, "lower": 2, "newest": 6, "widest": 3}, 5)
        ranks = {p: i for i, p in enumerate(m.merges)}
        ids = encode_text("lowest newest", ranks, m.vocab, m.unk_id)
        toks = [{v: k for k, v in m.vocab.items()}[i] for i in ids]
        # "lowest" -> low + est</w>; "newest" -> n e w + est</w>
        assert toks == ["low", "est</w>", "n", "e", "w", "est</w>"]


class TestSparkEncode:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        rng = random.Random(7)
        words = ["alpha", "beta", "gamma", "delta", "tool", "call",
                 "stream", "merge", "encrypt", "turn", "the", "of", "and"]
        rows = []
        for i in range(300):
            n = rng.randint(1, 30)
            rows.append((i, " ".join(rng.choice(words) for _ in range(n))))
        rows.append((300, None))
        rows.append((301, ""))
        rows.append((302, "  spaced   out\ttabs \n lines  "))
        return spark.createDataFrame(rows, "doc_id long, text string")

    @pytest.fixture(scope="class")
    def model(self, corpus):
        return train_bpe(corpus, vocab_size=200, sample_rows=1000)

    def test_train_deterministic_under_partitioning(self, corpus, model):
        m2 = train_bpe(corpus.repartition(7), vocab_size=200,
                       sample_rows=1000)
        assert m2.merges == model.merges and m2.vocab == model.vocab

    def test_udf_matches_pure_python(self, corpus, model):
        ranks = {p: i for i, p in enumerate(model.merges)}
        out = {r.doc_id: r.token_ids for r in
               bpe_encode(corpus, model).select("doc_id", "token_ids")
               .collect()}
        for r in corpus.collect():
            if r.text is None:
                assert out[r.doc_id] == []
            else:
                assert out[r.doc_id] == encode_text(
                    r.text, ranks, model.vocab, model.unk_id)

    def test_round_trip_whitespace_normalized(self, corpus, model):
        enc = bpe_encode(corpus, model)
        dec = bpe_decode(enc, model).select("doc_id", "text",
                                            "text_decoded").collect()
        checked = 0
        for r in dec:
            if r.text is None:
                continue
            assert r.text_decoded == " ".join(r.text.split())
            checked += 1
        assert checked >= 300

    def test_unk_for_unseen_chars(self, spark, model):
        df = spark.createDataFrame([(0, "alpha ☃")],
                                   "doc_id long, text string")
        ids = bpe_encode(df, model).head().token_ids
        assert model.unk_id in ids  # the snowman never appeared in training
        # but the known word still encodes without unk
        known = [i for i in ids if i != model.unk_id]
        assert known

    def test_model_json_round_trip(self, model):
        m2 = BpeModel.from_json(model.to_json())
        assert m2 == model

    def test_tokenize_and_pack_consistent(self, corpus, model):
        from cdcrypt.operators.packing import pack_sequences

        budget = 64
        out = tokenize_and_pack(corpus, model, budget, n_shards=4)
        rows = out.collect()
        assert {r.doc_id for r in rows} == set(range(303))
        for r in rows:
            assert r.n_tokens == len(r.token_ids)
            assert 0 <= r.off_tokens < budget or r.off_tokens == 0
        # pack assignment must equal pack_sequences fed the same counts
        enc = bpe_encode(corpus, model).withColumn(
            "n", F.size("token_ids").cast("long"))
        ref = {r.doc_id: (r.shard, r.pack, r.off_tokens)
               for r in pack_sequences(enc, budget, tokens_col="n",
                                       n_shards=4).collect()}
        for r in rows:
            assert (r.shard, r.pack, r.off_tokens) == ref[r.doc_id]

    def test_pack_budget_bounded_overflow(self, corpus, model):
        budget = 64
        out = tokenize_and_pack(corpus, model, budget, n_shards=4).collect()
        by_pack: dict[tuple, list] = {}
        for r in out:
            by_pack.setdefault((r.shard, r.pack), []).append(r)
        for members in by_pack.values():
            total = sum(r.n_tokens for r in members)
            biggest = max(r.n_tokens for r in members)
            # cumsum binning: overshoot bounded by the last member
            assert total <= budget + biggest


class TestAdviceR4Regressions:
    def test_sentinel_merge_never_learned(self):
        # a corpus rich in literal '</w>' markup: the pair whose
        # concatenation spells the sentinel must never become a merge,
        # so token id 1 is only ever a true word end
        freqs = {"</w>": 50, "a</w>b": 30, "x": 5}
        merges, _ = learn_merges(freqs, 20)
        assert all(a + b != END for a, b in merges)
        from cdcrypt.operators.tokenizer import encode_word
        m = _mk_model(freqs, 20)
        ranks = {p: i for i, p in enumerate(m.merges)}
        # the sentinel id may lawfully be ABSORBED into a bigger merged
        # token (e.g. '</w>'+END), but literal '</w>' characters must
        # never emit it MID-word — that was the id-1 collision
        for word in ("</w>", "a</w>b", "x</w>"):
            ids = encode_word(word, ranks, m.vocab, m.unk_id)
            assert m.unk_id not in ids
            assert m.vocab[END] not in ids[:-1]

    def test_vocab_bound_holds_when_base_chars_fit(self, spark):
        df = spark.createDataFrame(
            [("low low lower newest widest",)], "text string")
        m = train_bpe(df, vocab_size=16, sample_rows=10)
        assert len(m.vocab) <= 16

    def test_vocab_exceeds_bound_only_via_base_chars(self, spark):
        # 26 base chars with budget 8: all base chars kept (mandatory
        # for lossless coverage), zero merges — documented behavior
        import string
        df = spark.createDataFrame(
            [(" ".join(string.ascii_lowercase),)], "text string")
        m = train_bpe(df, vocab_size=8, sample_rows=10)
        assert m.merges == ()
        assert len(m.vocab) == 2 + 26
