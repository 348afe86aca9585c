"""Text normalization for corpus curation: pure-Column, oracle-mirrored.

The standard web-corpus cleanup chain (C4 / RefinedWeb / Dolma style):
markup strip, HTML entity decode, control-character scrub, unicode
punctuation folding, whitespace canonicalization — everything a crawl
dump needs before quality scoring and dedup. All of it is Column
expressions (regexp_replace / replace / translate), so the chain runs
inside whole-stage codegen with ZERO Python and zero shuffles, and every
step has a token-for-token DuckDB SQL mirror (Java regex and RE2 agree
on the dialect subset used here: literal classes, hex escapes, ``[^>]``,
``\\s``).

The one step that cannot be a builtin Column is unicode NFC
(:func:`nfc`): Spark has no normalization function, so it is an
Arrow-batched pandas UDF over ``unicodedata.normalize`` — the documented
Python boundary, kept OUT of :func:`normalize_text`'s default chain so
the hot path stays JVM-side. Both ``unicodedata`` and DuckDB's
``nfc_normalize`` implement UAX #15, so even this step gates.

Ordering contract (mirrored in :func:`normalize_text_sql`):
tags/comments are stripped BEFORE entities are decoded (decoding first
would let ``&lt;script&gt;`` materialize as markup — the classic
double-decode bug), and ``&amp;`` decodes LAST so ``&amp;lt;`` yields
the literal ``&lt;`` instead of double-decoding, single-pass-safe.

Reference parity note: the reference SMT transforms record fields and
has no text-cleanup surface; this module exists for the engine's
training-data tier (SURVEY.md §2.5), patterned on published pipeline
descriptions, not on reference code.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# decode order matters: &amp; LAST (see module docstring)
_ENTITIES = [
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"),
    ("&apos;", "'"), ("&nbsp;", " "), ("&amp;", "&"),
]

# unicode punctuation -> ASCII fold (1:1, translate-able)
_PUNCT_FROM = "‘’“”–—… "
_PUNCT_TO = "''\"\"--. "

_CONTROL_RE = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"
_COMMENT_RE = r"<!--[^>]*-->"
_TAG_RE = r"<[^>]*>"
_WS_RE = r"\s+"


def strip_markup(c: Column) -> Column:
    """Comments first (their bodies may contain ``<``), then tags; each
    removed tag becomes a space so ``a<br>b`` stays two tokens."""
    c = F.regexp_replace(c, _COMMENT_RE, " ")
    return F.regexp_replace(c, _TAG_RE, " ")


def decode_entities(c: Column) -> Column:
    for ent, ch in _ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def strip_control_chars(c: Column) -> Column:
    return F.regexp_replace(c, _CONTROL_RE, "")


def fold_punctuation(c: Column) -> Column:
    return F.translate(c, _PUNCT_FROM, _PUNCT_TO)


def normalize_whitespace(c: Column) -> Column:
    return F.trim(F.regexp_replace(c, _WS_RE, " "))


def normalize_text(c: Column, markup: bool = True) -> Column:
    """The full chain (markup optional for plain-text sources); NULL
    passes through every step untouched."""
    if markup:
        c = decode_entities(strip_markup(c))
    c = fold_punctuation(strip_control_chars(c))
    return normalize_whitespace(c)


def nfc(c: Column) -> Column:
    """Unicode NFC via an Arrow-batched pandas UDF (Spark has no builtin
    normalizer). Off the default chain — use where composed/decomposed
    drift actually exists (OCR dumps, mixed crawls); both sides of the
    gate implement UAX #15 so it remains oracle-verifiable."""
    @F.pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        import unicodedata
        return s.map(lambda x: None if x is None
                     else unicodedata.normalize("NFC", x))

    return _nfc(c)


def normalize_documents(df: DataFrame, text_col: str = "text",
                        markup: bool = True,
                        with_nfc: bool = False) -> DataFrame:
    """Rewrite ``text_col`` normalized — the curation-pipeline entry
    point (compose before quality gates / shingling so dedup sees
    canonical text)."""
    c = normalize_text(F.col(text_col), markup=markup)
    if with_nfc:
        c = nfc(c)
    return df.withColumn(text_col, c)


# ---- DuckDB mirrors ----

def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def normalize_text_sql(expr: str, markup: bool = True) -> str:
    """DuckDB fragment computing exactly :func:`normalize_text`."""
    e = expr
    if markup:
        e = f"regexp_replace({e}, '{_COMMENT_RE}', ' ', 'g')"
        e = f"regexp_replace({e}, '{_TAG_RE}', ' ', 'g')"
        for ent, ch in _ENTITIES:
            e = f"replace({e}, {_sql_quote(ent)}, {_sql_quote(ch)})"
    e = f"regexp_replace({e}, '{_CONTROL_RE}', '', 'g')"
    e = (f"translate({e}, {_sql_quote(_PUNCT_FROM)}, "
         f"{_sql_quote(_PUNCT_TO)})")
    return f"trim(regexp_replace({e}, '{_WS_RE}', ' ', 'g'))"


def nfc_sql(expr: str) -> str:
    return f"nfc_normalize({expr})"
