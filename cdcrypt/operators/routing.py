"""Key/Value operand routing — O11, the reference's Transform$Key/$Value.

The reference registers the same SMT twice, bound to either the record KEY
or the record VALUE operand (``Transform.java:139-154`` / ``:156-171``);
Connect rebuilds the record with the rewritten operand. In a DataFrame the
two operands are just column sets, but the SEMANTIC difference is real:

- the KEY participates in partitioning, dedup, joins and MERGE — its
  encryption must preserve equality, so the key route forces CONVERGENT
  mode (derived DEK + SIV nonce, ``envelope.py`` version 3; Vault's
  derived-key semantics, C4). Randomized encryption of a key column would
  silently break every downstream group/join (the same trap the reference
  avoids by pointing users at Vault convergent keys for key fields);
- the VALUE carries the payload — randomized per-batch-DEK envelopes
  (semantically stronger: no equality leakage).

``KeyValueTransform`` compiles both routes once and applies them as one
projection chain. Decrypt auto-detects each envelope's version, so a single
decrypt config reads both operands back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from cdcrypt.operators.transform import (
    ConfigError,
    FieldTransform,
    TransformConfig,
)


class KeyValueTransform:
    """One configured transform per operand, reference-style.

    ``key_fields`` / ``value_fields``: limited-JsonPath strings, same
    grammar as :class:`FieldTransform`. Shared kwargs (key_id, kms,
    encoding, condition, aad_field...) apply to both routes; the key route
    is forced ``deterministic=True`` on encrypt (see module docstring) and
    rejects an explicit ``deterministic=False``."""

    def __init__(self, mode: str, key_fields: list[str] | None = None,
                 value_fields: list[str] | None = None, **kw):
        if not key_fields and not value_fields:
            raise ConfigError("at least one of key_fields/value_fields")
        if kw.get("deterministic") is False and key_fields:
            raise ConfigError(
                "key route requires deterministic encryption (equality "
                "must survive for partitioning/dedup/merge)")
        self.key_transform = None
        self.value_transform = None
        if key_fields:
            key_kw = dict(kw)
            if mode == "encrypt":
                key_kw["deterministic"] = True
            self.key_transform = FieldTransform(TransformConfig(
                mode=mode, fields=list(key_fields), **key_kw))
        if value_fields:
            self.value_transform = FieldTransform(TransformConfig(
                mode=mode, fields=list(value_fields), **kw))

    def apply(self, df: DataFrame) -> DataFrame:
        if self.key_transform is not None:
            df = self.key_transform.apply(df)
        if self.value_transform is not None:
            df = self.value_transform.apply(df)
        return df
