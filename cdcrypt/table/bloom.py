"""Sidecar bloom filters for manifest-level file skipping.

The lake's per-file [min, max] bounds (operators/merge.py _footer_bounds)
prune range scans well only when files are clustered on the probed column;
a point lookup on a high-entropy key over arrival-ordered MoR delta files
finds nearly every file's bounds straddling the key. A per-file bloom
filter over the key column answers "definitely not in this file" for
exact-key probes regardless of clustering — Iceberg stores the same
artifact as Puffin blobs / parquet bloom filters; here it is one small
sidecar JSON per data file (``<file>.parquet.bloom``) referenced from the
manifest entry, so scan planning stays driver-side metadata arithmetic
and the snapshot JSONs stay light.

Design constraints honored:
- **Deterministic**: hashing is ``pandas.util.hash_array`` (SipHash-1-3
  over the utf-8 of the stringified value, vectorized in C) with the
  library-default key, plus Kirsch-Mitzenmacher double hashing for the
  k probe positions. Same value -> same bits on driver and in tests.
  Blooms are derivable artifacts: on a pandas-major upgrade, rebuild
  (rewrite_clustered) rather than chase cross-version hash stability.
- **No false negatives** (property-tested): a pruned file provably lacks
  the key; false positives only cost a redundant file in the scan.
- **Write cost is opt-in and explicit**: building a file's bloom reads
  that file's key column once via pyarrow (the writer already opens the
  footer for stats). Enable per table (``LakeTable.create(bloom_cols=)``)
  on lookup-heavy tables, or let ``rewrite_clustered`` attach blooms
  during compaction where the read-back is amortized into maintenance.

Reference parity note: the reference SMT has no storage layer at all
(Kafka Connect owns delivery; sink tables are out of scope for it) —
this module exists for the engine's own lake (SURVEY.md §2.3 P6 scan
planning), patterned on Iceberg's file-skipping metadata, not on any
reference code.
"""
from __future__ import annotations

import base64
import json
import math
import os
from typing import Iterable

import numpy as np
import pandas as pd

BLOOM_FORMAT = "cdcrypt-bloom/1"
DEFAULT_BITS_PER_KEY = 10   # ~1% fpp at k=7
DEFAULT_K = 7


def _hash64(values: Iterable) -> np.ndarray:
    """Deterministic uint64 hash of each value's canonical string form.

    Values are stringified first so the build side (numpy scalars read
    back from parquet) and the probe side (Python literals from a query)
    agree: ``str(np.int64(5)) == str(5)``. Nulls must be filtered by the
    caller (a NULL never has a defined point-lookup bloom semantics).
    """
    arr = np.array([str(v) for v in values], dtype=object)
    return pd.util.hash_array(arr, categorize=False).astype(np.uint64)


def _positions(h: np.ndarray, m: int, k: int) -> np.ndarray:
    """Kirsch-Mitzenmacher: k positions from one 64-bit hash.
    Returns shape (len(h), k) of int64 indices in [0, m)."""
    h1 = h
    # splitmix-style odd multiplier remix for the second hash; |1 keeps
    # the stride odd so k probes never collapse onto one slot for even m
    h2 = (h * np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)
    pos = (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m)
    return pos.astype(np.int64)


def build_bloom(values: Iterable, bits_per_key: int = DEFAULT_BITS_PER_KEY,
                k: int = DEFAULT_K) -> dict | None:
    """Bloom dict {format, m, k, n, bits(b64)} over the non-null values,
    or None for an empty input (a file with only NULL keys cannot serve
    point lookups and is left bloom-less = never pruned)."""
    vals = [v for v in values if v is not None]
    n = len(vals)
    if n == 0:
        return None
    m = max(64, int(math.ceil(n * bits_per_key / 8.0)) * 8)
    h = _hash64(vals)
    pos = _positions(h, m, k).ravel()
    bits = np.zeros(m // 8, dtype=np.uint8)
    np.bitwise_or.at(bits, pos >> 3,
                     np.left_shift(np.uint8(1), (pos & 7).astype(np.uint8)))
    return {"format": BLOOM_FORMAT, "m": m, "k": k, "n": n,
            "bits": base64.b64encode(bits.tobytes()).decode("ascii")}


def bloom_might_contain(bloom: dict, value) -> bool:
    """False means the value is PROVABLY absent from the file; True means
    'maybe' (probe the file). A None value is always 'maybe'."""
    if value is None:
        return True
    m, k = int(bloom["m"]), int(bloom["k"])
    bits = np.frombuffer(base64.b64decode(bloom["bits"]), dtype=np.uint8)
    pos = _positions(_hash64([value]), m, k).ravel()
    return bool(np.all(bits[pos >> 3] & (1 << (pos & 7))))


def write_bloom_sidecar(data_path: str, blooms: dict[str, dict]) -> str:
    """Write ``{col: bloom}`` next to the data file as
    ``<data_path>.bloom`` (atomic via temp + rename: a torn sidecar must
    never make a committed snapshot unreadable). Returns the sidecar path."""
    side = data_path + ".bloom"
    tmp = side + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"format": BLOOM_FORMAT, "cols": blooms}, f)
    os.replace(tmp, side)
    return side


def read_bloom_sidecar(path: str) -> dict[str, dict] | None:
    """Parse a sidecar; None when missing/corrupt — pruning then stays
    conservative (file scanned), mirroring the bounds rule that a file
    without stats is never pruned."""
    try:
        with open(path) as f:
            doc = json.load(f)
        if doc.get("format") != BLOOM_FORMAT:
            return None
        return doc["cols"]
    except (OSError, json.JSONDecodeError, KeyError, TypeError):
        return None
