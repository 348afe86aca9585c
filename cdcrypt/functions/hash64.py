"""Cross-engine 60-bit hashing (Spark Column + equivalent DuckDB SQL).

The dedup family (MinHash/SimHash/LSH) needs hashes that BOTH Spark and the
DuckDB correctness oracle can compute bit-identically, so every candidate
pair the engine emits is independently verifiable. ``xxhash64`` (the fastest
JVM-side choice) exists only in Spark, so the verifiable family derives a
60-bit value from md5 — available and identical in both engines:

    Spark : conv(substr(md5(x), 1, 15), 16, 10)  cast to long
    DuckDB: ('0x' || substr(md5(x), 1, 15))::BIGINT

15 hex chars = 60 bits, always non-negative and < 2^63, so decimal string
renderings (used when folding a hash into a seeded re-hash) agree across
engines and no ANSI overflow is possible. Collision probability at 60 bits
is ~n^2/2^61 — for 10^9 shingles ~0.4, i.e. a handful of spurious candidate
pairs at corpus scale, which the exact verify stage downstream removes.

Seeded variant (MinHash family member i, band hashes): re-hash the decimal
rendering joined with ':' — ``md5(CAST(h AS VARCHAR) || ':' || 'i')``.

PRECONDITION: inputs to the seeded/combined variants must be NON-NULL.
Spark's ``concat_ws`` skips null operands while DuckDB's ``||`` propagates
null, so a nullable column would silently diverge between the engine and
the oracle — feed only aggregated/derived values that cannot be null (as
every current caller does), or coalesce on BOTH sides first.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def h60(col: Column) -> Column:
    """60-bit md5-derived hash of a string column (non-negative long)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def h60_seeded(long_col: Column, seed: int | str) -> Column:
    """Seeded re-hash of a long column (decimal rendering + ':' + seed)."""
    return h60(F.concat_ws(":", long_col.cast("string"), F.lit(str(seed))))


def h60_combine(*cols: Column) -> Column:
    """Hash of several long columns joined with ':' (band hashes)."""
    return h60(F.concat_ws(":", *[c.cast("string") for c in cols]))


# ---- DuckDB SQL fragment builders (the oracle side of the contract) ----

def h60_sql(expr: str) -> str:
    return f"('0x' || substr(md5({expr}),1,15))::BIGINT"


def h60_seeded_sql(expr: str, seed: int | str) -> str:
    return h60_sql(f"CAST({expr} AS VARCHAR) || ':' || '{seed}'")


def h60_combine_sql(*exprs: str) -> str:
    joined = " || ':' || ".join(f"CAST({e} AS VARCHAR)" for e in exprs)
    return h60_sql(joined)
