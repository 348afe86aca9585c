"""Exact-substring span dedup: planted duplicates, within-doc repeats,
island merging, and a randomized equivalence check against a pure-Python
reimplementation of the gram/island contraction."""

from __future__ import annotations

import random

from cdcrypt.operators.substrdedup import (
    duplicate_spans,
    scrub_duplicate_spans,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _py_spans(texts: dict[int, str], k: int, min_occ: int = 2):
    """Independent oracle: dict doc_id -> list[(start, end)]."""
    grams: dict[str, int] = {}
    toks = {d: t.split() for d, t in texts.items()}
    pos: dict[int, list[int]] = {d: [] for d in texts}
    for d, w in toks.items():
        for i in range(len(w) - k + 1):
            g = " ".join(w[i:i + k])
            grams[g] = grams.get(g, 0) + 1
    for d, w in toks.items():
        for i in range(len(w) - k + 1):
            if grams[" ".join(w[i:i + k])] >= min_occ:
                pos[d].append(i)
    spans = {}
    for d, ps in pos.items():
        out, cur = [], None
        for p in ps:
            if cur is None or p - cur[1] > k:
                if cur:
                    out.append((cur[0], cur[1] + k))
                cur = [p, p]
            else:
                cur[1] = p
        if cur:
            out.append((cur[0], cur[1] + k))
        if out:
            spans[d] = out
    return spans


def test_planted_shared_substring(spark):
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, f"{shared} unique1 tail1"),
        (2, f"lead2 lead2b {shared} unique2"),
        (3, "nothing in common with anything else at all"),
    ]
    got = {(r["doc_id"], r["span_start"], r["span_end"])
           for r in duplicate_spans(_df(spark, rows), k=8).collect()}
    assert got == {(1, 0, 8), (2, 2, 10)}


def test_within_doc_repeat_and_scrub_to_empty(spark):
    rows = [(1, "x " * 20), (2, "all words distinct here truly")]
    out = {r["doc_id"]: r for r in
           scrub_duplicate_spans(_df(spark, rows), k=4).collect()}
    assert out[1]["text_clean"] == "" and out[1]["n_tokens_dropped"] == 20
    assert out[2]["text_clean"] == "all words distinct here truly"
    assert out[2]["n_tokens_dropped"] == 0


def test_short_docs_pass_through(spark):
    rows = [(1, "too short"), (2, "too short")]  # < k tokens: no grams
    assert duplicate_spans(_df(spark, rows), k=4).count() == 0
    out = {r["doc_id"]: r["text_clean"]
           for r in scrub_duplicate_spans(_df(spark, rows), k=4).collect()}
    assert out == {1: "too short", 2: "too short"}


def test_min_occurrences_threshold(spark):
    seg = "p q r s t u v w"
    rows = [(i, f"{seg} filler{i} one two three") for i in range(3)]
    assert duplicate_spans(_df(spark, rows), k=8,
                           min_occurrences=4).count() == 0
    assert duplicate_spans(_df(spark, rows), k=8,
                           min_occurrences=3).count() == 3


def test_adjacent_islands_merge(spark):
    # two duplicated 4-gram runs at gap exactly k merge into one span
    a = "m1 m2 m3 m4"
    b = "n1 n2 n3 n4"
    rows = [(1, f"{a} {b} suffix one two"), (2, f"{a} {b} other stuff here")]
    spans = duplicate_spans(_df(spark, rows), k=4).collect()
    per_doc = {}
    for r in spans:
        per_doc.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"]))
    assert per_doc[1] == [(0, 8)] and per_doc[2] == [(0, 8)]


def test_randomized_matches_python_oracle(spark):
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(12)]  # tiny vocab -> many collisions
    texts = {d: " ".join(rng.choice(vocab)
                         for _ in range(rng.randint(3, 60)))
             for d in range(40)}
    k = 5
    expect = _py_spans(texts, k)
    got: dict[int, list] = {}
    df = _df(spark, list(texts.items()))
    for r in duplicate_spans(df, k=k).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"]))
    assert {d: sorted(v) for d, v in got.items()} == expect
    # scrub equivalence on the same corpus
    scrub = {r["doc_id"]: r["text_clean"]
             for r in scrub_duplicate_spans(df, k=k).collect()}
    for d, t in texts.items():
        w = t.split()
        drop = set()
        for s, e in expect.get(d, []):
            drop.update(range(s, e))
        want = " ".join(w[i] for i in range(len(w)) if i not in drop)
        assert scrub[d] == want, d


def test_spans_reuse_parameter(spark):
    rows = [(1, "a b c d e f g h i"), (2, "z a b c d e f g h")]
    df = _df(spark, rows)
    spans = duplicate_spans(df, k=8)
    via_reuse = scrub_duplicate_spans(df, k=8, spans=spans).collect()
    direct = scrub_duplicate_spans(df, k=8).collect()
    key = lambda r: r["doc_id"]  # noqa: E731
    assert sorted(map(tuple, via_reuse), key=lambda t: t[0]) == \
        sorted(map(tuple, direct), key=lambda t: t[0])


def test_contaminated_spans_only_flags_reference_overlap(spark):
    from cdcrypt.operators.substrdedup import (
        contaminated_spans, scrub_contamination)
    bench = "q1 q2 q3 q4 q5"
    rows = [
        (1, f"intro words here {bench} trailing bits"),   # contaminated
        (2, "shared corpus run a b c d e suffix1"),       # corpus-only dup
        (3, "shared corpus run a b c d e suffix2"),       # corpus-only dup
        (4, "fully clean document with its own words"),
    ]
    df = _df(spark, rows)
    ref = spark.createDataFrame([(0, f"lead {bench} tail")], ["rid", "text"])
    spans = contaminated_spans(df, ref, k=5, ref_text_col="text").collect()
    assert {(r["doc_id"], r["span_start"], r["span_end"])
            for r in spans} == {(1, 3, 8)}  # docs 2/3 dup each other, NOT ref
    out = {r["doc_id"]: r["text_clean"]
           for r in scrub_contamination(df, ref, k=5).collect()}
    assert out[1] == "intro words here trailing bits"
    assert out[2] == "shared corpus run a b c d e suffix1"  # untouched
    assert out[4] == "fully clean document with its own words"


def test_contamination_matches_python_oracle(spark):
    from cdcrypt.operators.substrdedup import contaminated_spans
    rng = random.Random(11)
    vocab = [f"v{i}" for i in range(10)]
    texts = {d: " ".join(rng.choice(vocab) for _ in range(rng.randint(4, 40)))
             for d in range(30)}
    ref_texts = [" ".join(rng.choice(vocab) for _ in range(20))
                 for _ in range(3)]
    k = 4
    ref_grams = set()
    for t in ref_texts:
        w = t.split()
        for i in range(len(w) - k + 1):
            ref_grams.add(" ".join(w[i:i + k]))
    expect: dict[int, list] = {}
    for d, t in texts.items():
        w = t.split()
        ps = [i for i in range(len(w) - k + 1)
              if " ".join(w[i:i + k]) in ref_grams]
        out, cur = [], None
        for p in ps:
            if cur is None or p - cur[1] > k:
                if cur:
                    out.append((cur[0], cur[1] + k))
                cur = [p, p]
            else:
                cur[1] = p
        if cur:
            out.append((cur[0], cur[1] + k))
        if out:
            expect[d] = out
    df = _df(spark, list(texts.items()))
    ref = spark.createDataFrame(list(enumerate(ref_texts)), ["rid", "text"])
    got: dict[int, list] = {}
    for r in contaminated_spans(df, ref, k=k, ref_text_col="text").collect():
        got.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"]))
    assert {d: sorted(v) for d, v in got.items()} == expect
