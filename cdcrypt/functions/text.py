"""Text-analysis expression builders for training-data pipelines.

All pure Column expressions (JVM-side, whole-stage codegen — no Python in the
hot path): token counting, quality scoring, n-gram language ID heuristic,
rolling-hash document fingerprinting. Each has a matching DuckDB-SQL oracle in
``__spark_entry__.oracle_sql`` — the semantics are deliberately defined in
engine-portable arithmetic (length/replace/regexp counts) so both engines
compute bit-identical results.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def token_count(col: Column) -> Column:
    """Whitespace tokens: count of maximal non-space runs."""
    return F.size(F.split(F.trim(col), r"\s+")) - F.when(
        F.length(F.trim(col)) == 0, F.lit(1)
    ).otherwise(F.lit(0))


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-ish subword proxy: count word chunks + digits + punctuation marks
    separately (a cheap, deterministic stand-in for a real tokenizer)."""
    words = F.size(F.split(F.trim(col), r"\s+"))
    # every ~4 chars of a long word adds a subword
    subwords = F.floor(F.length(F.regexp_replace(col, r"\s", "")) / F.lit(4))
    return (words + subwords).cast("long")


def punct_ratio(col: Column) -> Column:
    punct = F.length(col) - F.length(F.regexp_replace(col, r"[.,;:!?'\"()\[\]{}]", ""))
    return F.round(punct / F.greatest(F.length(col), F.lit(1)), 6)


def digit_ratio(col: Column) -> Column:
    digits = F.length(col) - F.length(F.regexp_replace(col, r"[0-9]", ""))
    return F.round(digits / F.greatest(F.length(col), F.lit(1)), 6)


def space_ratio(col: Column) -> Column:
    spaces = F.length(col) - F.length(F.replace(col, F.lit(" "), F.lit("")))
    return F.round(spaces / F.greatest(F.length(col), F.lit(1)), 6)


def quality_score(col: Column) -> Column:
    """Composite [0,1] doc-quality heuristic: long enough, word-shaped,
    not punctuation/digit soup. Deterministic arithmetic only."""
    len_term = F.least(F.length(col) / F.lit(500.0), F.lit(1.0))
    space_term = F.least(space_ratio(col) * 8, F.lit(1.0))
    noise = punct_ratio(col) + digit_ratio(col)
    return F.round(
        F.greatest(
            (len_term * 0.4 + space_term * 0.4 + (1 - F.least(noise * 3, F.lit(1.0))) * 0.2),
            F.lit(0.0),
        ),
        6,
    )


# --- language ID: counts of script ranges + top English stopwords -----------
_EN_MARKERS = [" the ", " and ", " of ", " to "]


def lang_id(col: Column) -> Column:
    """Heuristic language tag: 'cjk' | 'greek' | 'en' | 'other'.

    Script detection by unicode-range regexp counts; English by stopword
    hits. Mirrors fastText-style n-gram heuristics at toy fidelity — the
    point is the *pipeline shape* (pure-Column, no UDF)."""
    cjk = F.regexp_count(col, F.lit(r"[぀-ヿ一-鿿]"))
    greek = F.regexp_count(col, F.lit(r"[Ͱ-Ͽ]"))
    en = sum(
        (F.length(col) - F.length(F.replace(col, F.lit(m), F.lit("")))) / len(m)
        for m in _EN_MARKERS
    )
    return (
        F.when(cjk > 0, F.lit("cjk"))
        .when(greek > 0, F.lit("greek"))
        .when(en >= 1, F.lit("en"))
        .otherwise(F.lit("other"))
    )


def fingerprint64(col: Column, family: str = "md5") -> Column:
    """Order-sensitive document fingerprint of the whitespace-normalized
    text (rolling-hash analogue, collision-grade). md5 family = 60-bit
    DuckDB-identical hash (functions/hash64.py, oracle-gated); xx64 =
    cheaper Spark-only xxhash64."""
    norm = F.regexp_replace(F.trim(col), r"\s+", " ")
    if family == "xx64":
        return F.xxhash64(norm)
    from cdcrypt.functions.hash64 import h60
    return h60(norm)


def dup_ngram_fraction(col: Column, n: int = 3) -> Column:
    """Gopher-style repetition signal: the fraction of word ``n``-grams
    that are duplicates of an earlier one — ``1 - distinct/total`` over
    the document's n-gram multiset (Rae et al. 2021, "Scaling Language
    Models", repetition filters). Boilerplate, template spam, and
    decoding loops score high; clean prose scores near 0.

    Pure Column higher-order functions — split → sliding window as a
    ``zip_with`` of n SHIFTED slices → ``array_distinct`` — one codegen
    stage, ZERO shuffles, no Python, and LINEAR per-row cost: n slices
    of the token array plus one zip, never a slice per gram index (the
    obvious ``transform(sequence(i), slice(toks, i, n))`` formulation is
    O(tokens²) per doc and measured 130 s for 50k sf1 docs vs ~4 s for
    this one). Docs shorter than ``n`` tokens (no grams) score 0. The
    DuckDB oracle reproduces the identical arithmetic via the same
    shifted-slice zip."""
    toks = F.split(F.trim(col), r"\s+")
    m = F.size(toks) - F.lit(n - 1)
    grams = F.slice(toks, 1, m)
    for i in range(1, n):
        grams = F.zip_with(grams, F.slice(toks, 1 + i, m),
                           lambda a, b: F.concat(a, F.lit(" "), b))
    frac = F.lit(1.0) - F.size(F.array_distinct(grams)) / F.size(grams)
    return F.round(
        F.when((F.length(F.trim(col)) > 0) & (m >= 1), frac)
        .otherwise(F.lit(0.0)), 6)


def repetition_stats(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-document repetition profile: duplicate 2-gram / 3-gram
    fractions plus duplicate whole-token fraction (n=1). The standard
    pre-training quality gate trio — filter e.g. ``dup_3gram < 0.2``."""
    c = F.col(text_col)
    return df.select(
        F.col(id_col),
        dup_ngram_fraction(c, 1).alias("dup_token"),
        dup_ngram_fraction(c, 2).alias("dup_2gram"),
        dup_ngram_fraction(c, 3).alias("dup_3gram"),
    )


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    c = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.length(c).alias("n_chars"),
        token_count(c).alias("n_tokens"),
        punct_ratio(c).alias("punct_ratio"),
        digit_ratio(c).alias("digit_ratio"),
        quality_score(c).alias("quality"),
        lang_id(c).alias("lang_guess"),
        fingerprint64(c).alias("fp64"),
    )
