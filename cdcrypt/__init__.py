"""cdcrypt — a PySpark-native CDC / incremental-ingest engine.

Brand-new engine (NOT a port) with the query/data-processing capabilities of
the reference SMT ``rerorero/kafka-connect-transform-encrypt``: field-level
envelope encryption/decryption applied mid-pipeline to a binlog/WAL-shaped
change-event stream of conversation transcripts, deduplicated and MERGE-upserted
into an Iceberg-shaped lake table with exactly-once epoch commits, schema
evolution and checkpoint resume.

Layers
------
- ``cdcrypt.kms`` / ``cdcrypt.envelope``: pure-Python crypto core (mock KMS,
  AES-GCM envelope), no Spark dependency.
- ``cdcrypt.functions``: vectorized pandas UDFs (crypto) and pure-Column
  expression builders (field paths, condition gate, text analysis).
- ``cdcrypt.operators``: DataFrame-level operators (field transform, change
  dedup, last-writer-wins, salted merge, document dedup, similarity search).
- ``cdcrypt.sources``: deterministic change-event generator + epoch file source.
- ``cdcrypt.table``: from-scratch Iceberg-shaped lake table (snapshots,
  manifests, bucket partitioning, schema evolution, atomic idempotent commit).
- ``cdcrypt.streaming``: micro-batch ingest pipeline with checkpoint/lineage.
"""

__version__ = "0.1.0"
