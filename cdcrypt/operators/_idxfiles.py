"""Committed-file manifests for persisted index artifacts.

Parquet ``mode("append")`` gives no atomicity across the data write and
the meta JSON: a crash between them leaves files on disk that the meta
never acknowledged, and a redelivered streaming batch would then append
a SECOND copy (duplicate banded rows / vectors, inflating
cap-over-union counts — the MinHashIndex/EmbeddingLSHIndex disjoint-ids
contract). The fix is the Iceberg-snapshot pattern in miniature: the
meta records the exact set of committed data files per layout dir, the
meta's ``os.replace`` is the only commit point, readers open ONLY the
committed files, and the next append garbage-collects anything on disk
the meta never committed. Torn appends become invisible; replays land
exactly once.

At 100 TB the real artifact would be a proper table format (Iceberg's
manifest lists exist precisely because a flat file list in one JSON
stops scaling around 10^6 files); the shape here — atomic pointer swap
over immutable data files — is the same.
"""

from __future__ import annotations

import os

__all__ = ["list_parquet_files", "gc_uncommitted"]


def list_parquet_files(root: str, component: str) -> list[str]:
    """Relative paths of every parquet data file under ``root/component``
    — the manifest entry recorded in the meta's atomic commit."""
    base = os.path.join(root, component)
    out = []
    for r, _dirs, files in os.walk(base):
        for f in files:
            if f.endswith(".parquet"):
                out.append(os.path.relpath(os.path.join(r, f), base))
    return sorted(out)


def gc_uncommitted(root: str, component: str, committed: set[str]) -> int:
    """Remove data files on disk that the meta never committed — the
    debris of an append that crashed between the parquet write and the
    meta replace. Safe under the single-writer contract; returns the
    number of files removed."""
    base = os.path.join(root, component)
    n = 0
    for rel in list_parquet_files(root, component):
        if rel not in committed:
            os.remove(os.path.join(base, rel))
            n += 1
    return n
