"""Hot-key detection: exact heavy hitters with partition-local pruning.

A CDC ingest at 10^10 events lives or dies on skew handling — the MERGE
(merge.py), the LWW resolution (dedup.py ``resolve_latest_salted``) and
the lake's bucket layout all have salting countermeasures, but they need
to KNOW the hot keys (or that there are none) to pick ``salt_buckets``
and to monitor drift. The naive ``groupBy(key).count()`` answer shuffles
one row per DISTINCT key — at 10^10 events with mostly-unique
conversation ids that is a 10^9-row exchange to find the 50 keys that
matter.

This operator makes the exchange proportional to the HOT mass instead,
while staying EXACT (unlike count-min / space-saving sketches, whose
estimates would also be engine-private and ungateable):

1. **Local prune** (``mapInPandas``, one pass, no shuffle): each
   partition counts its own keys (pandas ``value_counts`` over the whole
   partition iterator) and emits only keys with local count >=
   ceil(T / P). Pigeonhole: a key with global count >= T MUST reach that
   local count in at least one of the P partitions, so the prune has no
   false negatives; false positives are cheap (they just ride to step 2).
   This is the rare case the DataFrame API genuinely cannot express — a
   filter on the PARTIAL aggregation state below the exchange.
2. **Exact verify**: the candidate keys (a handful) broadcast back as a
   semi-join filter; the surviving rows group-count with map-side
   combine — a shuffle of at most |candidates| * P tiny partial rows —
   and the final ``cnt >= T`` keeps exactly the true heavy hitters.

The candidate set varies with the physical layout; the OUTPUT does not
(exactness of step 2), so the result is layout/engine-deterministic and
gates against a plain ``GROUP BY ... HAVING`` oracle.

Memory note: step 1 holds one partition's distinct keys in a pandas
value_counts — bounded by the partition's input split (a 128 MB split of
ids is a few-hundred-MB frame worst case), the same order as any
hash-aggregate's per-task state.

Reference parity: the reference SMT has no skew surface (Kafka Connect
partitions by record key and hopes); this exists for the engine's own
MERGE/salting tier (SURVEY.md P6), patterned on the standard heavy-
hitters pigeonhole, not on reference code.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hot_keys(df: DataFrame, key_cols: list[str] | str,
             min_count: int | None = None,
             min_share: float | None = None) -> DataFrame:
    """Exact (key..., cnt) for every key group occurring at least
    ``min_count`` times (or ``min_share`` of all rows — exactly one of
    the two must be given; share resolves to ceil(share * count()) with
    one counting pass). NULL key components count like any other value
    (they group together, matching SQL ``GROUP BY``)."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if (min_count is None) == (min_share is None):
        raise ValueError("pass exactly one of min_count / min_share")
    if min_share is not None:
        if not 0.0 < min_share <= 1.0:
            raise ValueError(f"min_share must be in (0, 1]: {min_share}")
        min_count = math.ceil(min_share * df.count())
    min_count = max(int(min_count), 1)

    kdf = df.select(*keys)
    # resolved BEFORE the job: the prune threshold must match the actual
    # scan parallelism (mapInPandas sits directly on the scan, so AQE
    # cannot re-split it afterwards)
    n_parts = max(kdf.rdd.getNumPartitions(), 1)
    local_t = max(math.ceil(min_count / n_parts), 1)
    schema = kdf.schema

    def prune(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # whole-partition counts: Arrow batches of ONE partition stream
        # through a single call, so accumulating across the iterator is
        # what makes the pigeonhole bound apply to the partition, not to
        # a 10k-row batch
        acc: pd.Series | None = None
        for pdf in pdfs:
            c = pdf.groupby(list(pdf.columns), dropna=False,
                            sort=False).size()
            acc = c if acc is None else acc.add(c, fill_value=0)
        if acc is None:
            return
        hits = acc[acc >= local_t]
        if len(hits):
            out = hits.index.to_frame(index=False)
            out.columns = list(schema.fieldNames())
            yield out

    candidates = kdf.mapInPandas(prune, schema).dropDuplicates(keys)
    # null-safe semi-join: candidate NULL keys must match data NULL keys
    cond = None
    for k in keys:
        c = kdf[k].eqNullSafe(candidates[k])
        cond = c if cond is None else cond & c
    return (kdf.join(F.broadcast(candidates), cond, "left_semi")
            .groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("cnt"))
            .where(F.col("cnt") >= min_count))


def hot_keys_sql(table: str, key_cols: list[str] | str,
                 min_share: float) -> str:
    """DuckDB mirror of :func:`hot_keys` in ``min_share`` form."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    kl = ", ".join(keys)
    return f"""
        SELECT {kl}, count(*) AS cnt FROM {table}
        GROUP BY {kl}
        HAVING count(*) >= ceiling(
            CAST({min_share!r} AS DOUBLE) * (SELECT count(*) FROM {table}))
    """


def skew_report(df: DataFrame, key_cols: list[str] | str,
                min_share: float = 0.001) -> dict:
    """Driver-side skew summary for sizing ``salt_buckets``: the hot keys
    above ``min_share`` (bounded: at most 1/min_share rows can exceed the
    share) plus the max observed share. Returns
    ``{"total": N, "threshold": T, "hot": [(key..., cnt), ...],
    "max_share": s}`` — ``hot`` is empty when the keyspace is uniform,
    which is itself the answer (salting off / bucket layout alone)."""
    total = df.count()
    hot = hot_keys(df, key_cols, min_share=min_share)
    rows = sorted((tuple(r) for r in hot.collect()),
                  key=lambda t: (-t[-1], t[:-1]))
    return {
        "total": total,
        "threshold": math.ceil(min_share * total),
        "hot": rows,
        "max_share": (rows[0][-1] / total) if rows else None,
    }
