"""FieldMasker — non-cryptographic field protection (mask / redact / hash).

The reference SMT family this mirrors is Kafka Connect's standard
single-message transforms that sit NEXT to the reference's crypto SMT in
real pipelines: ``MaskField`` (replace a field with a constant) and the
common hash-pseudonymization SMTs. The reference repo itself chains
transforms (``e2e/vault_config.json:14-30`` runs ``encrypt,decrypt`` as a
Connect chain); masking/hashing are the other members of that chain a CDC
user deploys before or instead of encryption:

- **mask**: replace the selected field with a literal (``MaskField.With``
  semantics), or redact substrings via regex (scrub emails/IDs from
  transcript text BEFORE it is encrypted or indexed).
- **hash**: deterministic one-way pseudonymization (``sha2``), optionally
  salted. Equality-preserving by design — a hashed key column still
  groups/joins/MERGEs, the same contract as the convergent-encryption
  mode (TransformConfig.deterministic) without key management, for fields
  that never need recovery.

Unlike the crypto transform there is NO Python anywhere: every mode
compiles to built-in Column expressions (``regexp_replace`` / ``sha2`` /
``transform``), so the whole operator stays inside whole-stage codegen —
at 100 TB this is a plain projection over the scan with zero extra
shuffles and zero Arrow boundaries.

Shared machinery with the crypto SMT (same semantics, same tests model):

- field selection: the limited-JsonPath compiler (functions/fieldpath.py)
  including nested structs, terminal ``[*]``/``[n]`` and mid-path
  ``[*].field`` / ``[n].field`` array segments;
- missing optional target -> silently skipped (``Transform.java:99-101``);
- null operand -> null passthrough (``Transform.java:57-60``);
- condition gate -> per-row CASE WHEN, non-matching rows pass through
  byte-identical (``Conditions.java:32-44`` existential semantics via
  functions/condition.py);
- config validation mirrors ``OneOfValidator.java:10-24`` and raises
  driver-side, pre-execution.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cdcrypt.functions.condition import compile_condition
from cdcrypt.functions.fieldpath import (
    CompiledPath,
    PathCompileError,
    compile_path,
    path_exists,
    rewrite,
    select_column,
)
from cdcrypt.operators.transform import ConfigError, _one_of

_MODES = ("mask", "hash")
_ALGOS = (256, 384, 512)


@dataclass
class MaskConfig:
    mode: str  # mask | hash
    fields: list[str]  # limited-JsonPath strings (same grammar as crypto)
    # mask mode: literal replacement (null input stays null) ...
    replacement: str = "***"
    # ... or regex redaction: every match of ``regex`` in the field is
    # replaced with ``replacement`` (non-matching text survives). Mutually
    # exclusive framings of the same mode: regex=None -> whole-value literal.
    regex: str | None = None
    # hash mode: sha2 bit width + optional salt. The salt is prepended as
    # ``salt|value`` so equal values hash equal WITHIN a salt (joins work)
    # but tables hashed under different salts cannot be linked.
    algo: int = 256
    salt: str | None = None
    condition_field: str | None = None
    condition_equals: str | None = None

    def __post_init__(self) -> None:
        _one_of("mode", self.mode, _MODES)
        if not self.fields:
            raise ConfigError("at least one field path is required")
        if (self.condition_field is None) != (self.condition_equals is None):
            raise ConfigError(
                "condition.field and condition.equals must be set together")
        if self.algo not in _ALGOS:
            raise ConfigError(f"algo={self.algo} must be one of {_ALGOS}")
        if self.mode == "hash" and self.regex is not None:
            raise ConfigError("regex redaction applies to mask mode only")
        if self.replacement is None:
            raise ConfigError(
                "replacement must be a string (mask-to-null would be "
                "indistinguishable from the null-passthrough contract)")


class FieldMasker:
    """Compiled masker; construct once per job, apply per micro-batch."""

    def __init__(self, config: MaskConfig):
        self.config = config
        try:
            self._paths: list[tuple[str, CompiledPath]] = [
                (p, compile_path(p)) for p in config.fields
            ]
        except PathCompileError as e:
            raise ConfigError(str(e)) from e

    def _masked(self, col: Column) -> Column:
        """The scalar rewrite: one pure-Column expression, null in -> null
        out (regexp_replace/sha2 propagate null; the literal branch guards
        explicitly)."""
        cfg = self.config
        if cfg.mode == "hash":
            src = (F.concat(F.lit(cfg.salt + "|"), col)
                   if cfg.salt is not None else col)
            return F.sha2(src, cfg.algo)
        if cfg.regex is not None:
            return F.regexp_replace(col, cfg.regex, cfg.replacement)
        return F.when(col.isNotNull(), F.lit(cfg.replacement))

    def apply(self, df: DataFrame) -> DataFrame:
        """Rewrite the configured fields; everything else passes through."""
        cfg = self.config
        gate = (
            compile_condition(df, cfg.condition_field, cfg.condition_equals)
            if cfg.condition_field is not None
            else None
        )
        for _, cp in self._paths:
            if not path_exists(df, cp):
                continue  # missing optional target -> skip
            cur = select_column(cp)
            if cp.has_inner:
                # nested arrays: select yields array<array> for [*]...[*],
                # a flat leaf array for the single-wildcard shapes, the
                # scalar leaf for [n]...[m] — masking is element-wise
                # pure, so no realignment needed
                if cp.array_wildcard and cp.inner_wildcard:
                    new = F.transform(
                        cur, lambda a: F.transform(a, self._masked))
                elif cp.vector_crypto:
                    new = F.transform(cur, self._masked)
                else:
                    new = self._masked(cur)
            elif cp.is_array and not cp.suffix:
                if cp.array_wildcard:  # terminal [*]: every element
                    new = F.transform(cur, self._masked)
                else:  # terminal [n]: one element, others untouched
                    n = cp.array_index
                    new = F.transform(
                        cur,
                        lambda x, i: F.when(
                            i == F.lit(n), self._masked(x)).otherwise(x),
                    )
            elif cp.array_wildcard:  # [*].field: leaf array, element-wise
                new = F.transform(cur, self._masked)
            else:  # scalar leaf (plain path or [n].field)
                new = self._masked(cur)
            if gate is not None:
                new = F.when(gate, new).otherwise(cur)
            df = rewrite(df, cp, new)
        return df


def mask_fields(df: DataFrame, fields: list[str], **kw) -> DataFrame:
    """One-shot literal/regex masking (``MaskField`` semantics)."""
    return FieldMasker(MaskConfig(mode="mask", fields=fields, **kw)).apply(df)


def hash_fields(df: DataFrame, fields: list[str], **kw) -> DataFrame:
    """One-shot deterministic hash pseudonymization (equality-preserving)."""
    return FieldMasker(MaskConfig(mode="hash", fields=fields, **kw)).apply(df)
