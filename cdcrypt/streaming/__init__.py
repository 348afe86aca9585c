"""Micro-batch ingest driver: epoch-file source -> encrypt -> resolve ->
MERGE -> idempotent commit, with checkpoint lineage and resume."""

from cdcrypt.streaming.pipeline import IngestPipeline  # noqa: F401
