"""From-scratch Iceberg-shaped lake table: snapshot metadata + manifests,
bucket(conv_id) partition layout, add-column schema evolution, atomic
idempotent epoch commits. No Iceberg/Delta JAR exists in the sandbox; the
format is part of the engine (SURVEY.md §4.2.3-4)."""

from cdcrypt.table.lake import LakeTable  # noqa: F401
