"""Text normalization (functions/textnorm.py): chain semantics, decode
ordering, null passthrough, and cross-engine oracle equality."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from cdcrypt.functions.textnorm import (
    decode_entities,
    fold_punctuation,
    nfc,
    nfc_sql,
    normalize_documents,
    normalize_text,
    normalize_text_sql,
    normalize_whitespace,
    strip_control_chars,
    strip_markup,
)


def _one(spark, col, value):
    return spark.createDataFrame([(value,)], "t string") \
        .select(col(F.col("t")).alias("r")).first().r


def test_markup_becomes_token_boundary(spark):
    assert _one(spark, lambda c: normalize_whitespace(strip_markup(c)),
                "a<br>b <p class='x'>c</p><!-- note -->d") == "a b c d"


def test_entity_decode_is_single_pass_safe(spark):
    # &amp;lt; must yield the LITERAL '&lt;', not double-decode to '<'
    assert _one(spark, decode_entities, "&amp;lt; &lt;b&gt; &quot;")  \
        == '&lt; <b> "'


def test_control_and_punct_and_ws(spark):
    assert _one(spark, strip_control_chars, "a\x01b\x1fc\x7fd") == "abcd"
    assert _one(spark, fold_punctuation, "‘a’ “b” c—d e…") \
        == "'a' \"b\" c-d e."
    assert _one(spark, normalize_whitespace, "  a\t\tb\nc  ") == "a b c"


def test_full_chain_and_null_passthrough(spark):
    messy = ('<div id="m">Hello&nbsp;&amp;\x02 “world”</div>'
             "\n\n<!-- hidden -->  bye…  ")
    assert _one(spark, normalize_text, messy) == 'Hello & "world" bye.'
    assert _one(spark, normalize_text, None) is None
    # markup=False keeps literal angle text
    assert _one(spark, lambda c: normalize_text(c, markup=False),
                " a  <x> b ") == "a <x> b"


def test_normalize_documents_rewrites_column(spark):
    df = spark.createDataFrame(
        [(1, "<b>hi</b>  there"), (2, None)], "doc_id long, text string")
    got = {r.doc_id: r.text
           for r in normalize_documents(df).collect()}
    assert got == {1: "hi there", 2: None}


def test_oracle_equality_on_messy_corpus(spark, tmp_path):
    pq = str(tmp_path / "m.parquet")
    (spark.range(400).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit('<p class="c">text '), F.col("id").cast("string"),
            F.lit(" &amp;&lt;x&gt;‘q’—z<!--c--> end  "),
        ).alias("text"))
     .coalesce(1).write.mode("overwrite").parquet(pq))
    df = spark.read.parquet(pq)
    got = sorted(
        (r.doc_id, r.norm) for r in df.select(
            "doc_id", normalize_text(F.col("text")).alias("norm"))
        .collect())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW t AS SELECT * FROM '{pq}/*.parquet'")
    want = sorted(con.sql(
        f"SELECT doc_id, {normalize_text_sql('text')} AS norm FROM t"
    ).fetchall())
    assert got == want


def test_nfc_matches_duckdb(spark):
    # composed vs decomposed accents + hangul jamo
    vals = ["café", "café", "가", "plain", None]
    df = spark.createDataFrame([(v,) for v in vals], "t string")
    got = [r.r for r in df.select(nfc(F.col("t")).alias("r")).collect()]
    con = duckdb.connect()
    want = [con.sql(f"SELECT {nfc_sql('?')}", params=[v]).fetchone()[0]
            if v is not None else None for v in vals]
    assert got == want
    assert got[0] == got[1] == "café"
