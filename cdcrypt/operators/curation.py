"""End-to-end training-corpus curation: one call from a raw document
table to a deduplicated, quality-filtered, language-filtered, token-
counted, reproducibly-split corpus — the composition every large-scale
pretraining pipeline runs, expressed entirely in the engine's existing
oracle-verified stages:

    near-dup pairs (any LSH family)        operators/docdedup.py
      -> transitive clusters -> canonical survivor (dedup_near)
      -> quality / language gates          functions/text.py
      -> token counts                      functions/text.py
      -> deterministic split               functions/sampling.py

Leakage-safety falls out of the composition order: canonical dedup keeps
exactly ONE member of each near-dup cluster, so no near-duplicate can
straddle train and test no matter how the split falls — and the split
hash is keyed on the COMPONENT label anyway (stable if the survivor
choice ever changes). Everything is pure Column expressions over two
shuffled stages (the components contraction and the survivor aggregate),
both already sized for unbounded cluster counts; the filter/tokenize/
split tail adds no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdcrypt.functions.sampling import split_case, unit_hash
from cdcrypt.functions.text import (
    dup_ngram_fraction,
    lang_id,
    quality_score,
    token_count,
)
from cdcrypt.operators.docdedup import dedup_near


def curate_corpus(
    docs: DataFrame,
    pairs: DataFrame,
    weights: dict[str, float],
    min_quality: float = 0.0,
    langs: tuple[str, ...] | None = None,
    max_dup_3gram: float | None = None,
    pii: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "split-v1",
) -> DataFrame:
    """The curated corpus: one row per surviving document with
    ``(id_col, component, n_in_cluster, n_tokens, quality, lang_guess,
    split)``. ``pairs`` is any (id_a, id_b) near-dup relation (minhash /
    simhash / embedding LSH); ``langs=None`` keeps every language;
    ``min_quality=0.0`` keeps every document.

    Optional stages (off by default, so the base projection is stable):

    - ``max_dup_3gram`` — Gopher-style repetition gate: drop documents
      whose duplicate-3-gram fraction exceeds the threshold, and emit
      the ``dup_3gram`` column. Like every other stage it is a pure
      Column predicate fused into the existing survivor scan — zero
      added shuffles.
    - ``pii`` — ``'flag'`` emits ``pii_count`` (distinct structured-PII
      kinds detected, operators/pii.py); ``'drop'`` additionally removes
      any document containing PII (the redact/encrypt alternatives are
      separate write-path operators — curation only decides membership).
    """
    from cdcrypt.operators.pii import PII_PATTERNS, scan_pii

    if pii not in (None, "flag", "drop"):
        raise ValueError(f"pii={pii!r} must be None, 'flag', or 'drop'")
    survivors = dedup_near(docs, pairs, id_col=id_col, text_col=text_col)
    c = F.col(text_col)
    out = (
        docs.join(survivors, id_col)      # survivors only (one per cluster)
        .withColumn("quality", quality_score(c))
        .withColumn("lang_guess", lang_id(c))
    )
    if min_quality > 0.0:
        out = out.where(F.col("quality") >= F.lit(float(min_quality)))
    if langs is not None:
        out = out.where(F.col("lang_guess").isin(list(langs)))
    extra: list[str] = []
    if max_dup_3gram is not None:
        out = (out.withColumn("dup_3gram", dup_ngram_fraction(c, 3))
               .where(F.col("dup_3gram") <= F.lit(float(max_dup_3gram))))
        extra.append("dup_3gram")
    if pii is not None:
        out = scan_pii(out, text_col).drop(
            *[f"pii_{k}" for k in PII_PATTERNS])
        if pii == "drop":
            out = out.where(F.col("pii_count") == 0)
        extra.append("pii_count")
    return (
        out.withColumn("n_tokens", token_count(c).cast("long"))
        .withColumn("_u", unit_hash("component", salt))
        .withColumn("split", split_case(F.col("_u"), weights))
        .select(id_col, "component", "n_in_cluster", "n_tokens",
                "quality", "lang_guess", *extra, "split")
    )
