"""As-of (temporal) join: enrich each fact row with the dimension version
in force at its sequence position.

The reference SMT has no join surface at all (Kafka Connect SMTs are
single-record — Transform.java applies per record), but the CDC tables this
engine materializes make the temporal-enrichment query the single most
common consumer pattern: "join each transcript event to the conversation /
user / config state AS OF that event" — i.e. pandas ``merge_asof`` /
DuckDB ``ASOF JOIN`` semantics, against either a raw change stream or an
SCD2 history table (operators/scd2.py produces exactly the version
intervals this join consumes via their ``valid_from_seq`` open edge).

Spark has no ASOF join operator, and the naive encodings do not survive
scale:

- ``left JOIN right ON key AND r.seq <= l.seq`` + keep-max is a range
  join — Catalyst plans BroadcastNestedLoopJoin (small side) or a
  cartesian-per-key, O(|L|·|R|) per key on hot keys;
- a correlated subquery per fact row is driver-side or re-scan-heavy.

This implementation is the **union + ordered-window** form: tag both
inputs, union them, and per key take the last dimension payload at or
before each fact row in one ``(key, seq)``-ordered window:

    ``last(dim_payload, ignorenulls=True) over (partition by key
      order by (seq, side) rows unbounded preceding .. current row)``

Cost at 100 TB: ONE shuffle of |L|+|R| rows on the key columns and one
spillable sort per partition — no join node exists in the plan at all,
so there is nothing for skew to quadratically amplify: a hot key costs
its own sort, never a per-key cross product. The fact payload rides the
union untouched (no second join to re-attach it).

Direction, inclusivity, and tolerance mirror ``pandas.merge_asof``
(property-tested against it in tests/test_asof.py):

- ``direction='backward'`` (default): greatest right seq <= left seq;
  ``'forward'``: smallest right seq >= left seq (same window trick over
  the descending order).
- ``allow_exact_match=False``: strict inequality — at equal seq the
  dimension row sorts AFTER the fact row instead of before it, so the
  window cannot see it (ordering by the side marker, zero extra passes).
- ``tolerance``: maximum |left seq - right seq|; stale matches null out
  (the matched seq travels inside the payload struct, so tolerance is a
  pure post-window column op).

Contract notes:
- ``right`` should be unique per (key, right_on); among exact ties the
  surviving payload is unspecified (same as DuckDB ASOF).
- right rows with a null seq are dropped (they can match nothing); left
  rows with a null seq always come out unmatched (pandas parity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "_asof_side"
_RP = "_asof_rp"
_RON = "_asof_ron"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key_cols,
    on: str = "op_seq",
    right_on: str | None = None,
    payload_cols=None,
    direction: str = "backward",
    allow_exact_match: bool = True,
    tolerance=None,
    matched_col: str | None = None,
) -> DataFrame:
    """Left as-of join: every row of ``left``, enriched with
    ``payload_cols`` from the nearest-preceding (or -following) row of
    ``right`` sharing ``key_cols``; unmatched rows keep null payloads.

    ``on``/``right_on``: ordering columns (same orderable type on both
    sides; ``right_on`` defaults to ``on``). ``matched_col`` additionally
    exposes the matched right seq (for audit / staleness metrics).
    ``tolerance`` requires a numeric seq column (interval arithmetic on
    timestamps differs per unit — cast to epoch numbers first).
    """
    keys = list(key_cols)
    ron = right_on or on
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if payload_cols is None:
        payload_cols = [c for c in right.columns if c not in keys + [ron]]
    payload_cols = list(payload_cols)
    clash = [c for c in payload_cols if c in left.columns] + (
        [matched_col] if matched_col in left.columns else [])
    if clash:
        raise ValueError(
            f"payload columns {clash} collide with left columns — alias "
            "them on the right side before joining")
    missing = [c for c in payload_cols if c not in right.columns]
    if missing:
        raise ValueError(f"payload columns {missing} not in right side")

    # side marker: dimension rows sort before facts at equal seq when
    # exact matches are allowed, after them when strict
    right_side = 0 if allow_exact_match else 2
    rp = F.struct(F.col(ron).alias(_RON),
                  *[F.col(c) for c in payload_cols])
    r = (right
         .where(F.col(ron).isNotNull())
         .select(*keys, F.col(ron).alias(on),
                 F.lit(right_side).alias(_SIDE), rp.alias(_RP)))
    l = left.select("*", F.lit(1).alias(_SIDE),
                    F.lit(None).cast(r.schema[_RP].dataType).alias(_RP))
    u = l.unionByName(r, allowMissingColumns=True)

    seq = F.col(on)
    order = [seq.asc(), F.col(_SIDE).asc()] if direction == "backward" \
        else [seq.desc(), F.col(_SIDE).asc()]
    w = (Window.partitionBy(*keys).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = F.last(_RP, ignorenulls=True).over(w)
    # a null left seq sorts at one end of the order (first asc / last
    # desc) — force no-match instead of inheriting a neighbor's state
    matched = F.when(seq.isNull(), F.lit(None)).otherwise(matched)
    if tolerance is not None:
        dist = F.abs(seq - matched[_RON])
        matched = F.when(dist <= F.lit(tolerance), matched)

    out = (u.withColumn(_RP, matched)
           .where(F.col(_SIDE) == 1)
           .select(*left.columns,
                   *[F.col(f"{_RP}.{c}").alias(c) for c in payload_cols],
                   *([F.col(f"{_RP}.{_RON}").alias(matched_col)]
                     if matched_col else [])))
    return out
