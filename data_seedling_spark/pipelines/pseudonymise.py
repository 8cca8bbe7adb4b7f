"""Pseudonymisation stage (reference ``transform.py`` capabilities).

Config-driven column transforms (UD3 dispatch, reference
``transform.py:156-195``):

- **hash**: salted SHA-256, renamed ``<col>_hashed``, original dropped
  (F1/F2; reference ``transform.py:134-152``; golden
  ``sha2('1'+salt)`` behaviour verified in tests),
- **round_datetime**: ``date_trunc`` generalisation; invalid input →
  NULL (F3; reference ``transform.py:104-113,185-188``),
- **remove**: drop with existence validation (P3; reference
  ``transform.py:57-80``),
- **free_text**: entity masking over free text (UD1; reference
  ``presidio.py:24-46``) — implemented as an Arrow-batched **pandas
  UDF** with per-worker compiled regexes instead of the reference's
  broadcast row-at-a-time UDF: at 100 TB the row-at-a-time
  JVM↔Python crossing is the bottleneck, and Presidio-style engines
  pickled through a broadcast don't survive worker churn; lazy
  per-worker init + Arrow batches do.

Every transform validates configured columns exist and raises
``KeyError`` otherwise (P13; reference ``transform.py:44-52`` etc.).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import (
    HASHED_SUFFIX,
    ColumnType,
    DateTimeRoundOpt,
    TableConfig,
)


def _require_columns(df: DataFrame, cols, op: str) -> None:
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise KeyError(f"{op}: column(s) {missing} not present in {df.columns}")


def hash_columns(df: DataFrame, cols: list[str], salt: str) -> DataFrame:
    """Salted SHA-256 per column → ``<col>_hashed``; original dropped.

    All JVM-side (`concat`/`cast`/`sha2`) — stays in WholeStageCodegen.
    """
    _require_columns(df, cols, "hash_columns")
    for c in cols:
        df = df.withColumn(
            c + HASHED_SUFFIX,
            F.sha2(F.concat(F.col(c).cast("string"), F.lit(salt)).cast("binary"), 256),
        ).drop(c)
    return df


def round_datetime_columns(
    df: DataFrame, cols: dict[str, DateTimeRoundOpt]
) -> DataFrame:
    """``date_trunc`` each configured datetime column in place (P1+F3).
    Non-castable input yields NULL (reference
    ``test_pseudonymisation.py:191-204``)."""
    _require_columns(df, cols, "round_datetime_columns")
    for c, opt in cols.items():
        # try_cast: ANSI mode (Spark 4 default) makes plain cast throw
        # on malformed input; the contract is invalid → NULL. NTZ keeps
        # the wall-clock semantics independent of the session timezone.
        df = df.withColumn(
            c, F.date_trunc(opt.value, F.col(c).try_cast("timestamp_ntz"))
        )
    return df


def remove_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Drop identifiable columns (P3) with existence validation."""
    _require_columns(df, cols, "remove_columns")
    return df.drop(*cols)


#: Deterministic masking rules: pattern → placeholder. The regex set is
#: the local stand-in for a Presidio-style analyzer (same output
#: contract: entities replaced by ``<ENTITY_TYPE>`` placeholders,
#: reference ``test_pseudonymisation.py:90-96``); a real model plugs in
#: via ``anonymiser=``.
MASKING_RULES: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL_ADDRESS>"),
    (r"https?://[^\s]+", "<URL>"),
    (r"\b\d{4}-\d{2}-\d{2}\b", "<DATE_TIME>"),
    (r"\b(?:\+?\d[\d\s-]{7,}\d)\b", "<PHONE_NUMBER>"),
    (r"\b(?:customer|supplier)\b", "<PERSON>"),
)


def _compile_rules():
    return [(re.compile(p), repl) for p, repl in MASKING_RULES]


def default_anonymiser(series: pd.Series) -> pd.Series:
    """NULL-safe regex masking over an Arrow batch (reference
    ``presidio.py:26-34`` NULL handling)."""
    rules = _compile_rules()

    def mask(text):
        if text is None:
            return None
        for rx, repl in rules:
            text = rx.sub(repl, text)
        return text

    return series.map(mask)


# Process-level engine cache for per_worker(). Executors import this
# module by name (the package ships to workers), so the dict lives once
# per Python worker process and survives task re-deserialization — the
# property that makes heavyweight engines affordable: init once per
# worker, not once per task/batch.
_WORKER_ENGINES: dict[str, object] = {}


def per_worker(key: str, factory):
    """Wrap a heavyweight anonymiser engine factory as a lazily
    per-worker-initialised callable (UD1 seam; reference
    ``presidio.py:24-46`` builds Presidio engines once and reuses
    them). ``factory()`` must return a ``Series -> Series`` callable;
    it runs at most once per executor Python process — the contract a
    Presidio/transformer-style analyzer needs (seconds of model load,
    unpicklable native state). Usage::

        anonymise_columns(df, cols,
                          anonymiser=per_worker("presidio", build_engine))
    """

    def anonymise(series: pd.Series) -> pd.Series:
        # Resolve the cache through a runtime import: this closure is
        # cloudpickled BY VALUE per task, and a direct global reference
        # would be captured as a per-task copy (defeating the cache —
        # measured: one init per task, not per worker). The import
        # returns the worker process's real module singleton.
        import importlib

        mod = importlib.import_module(__name__)
        engine = mod._WORKER_ENGINES.get(key)
        if engine is None:
            engine = mod._WORKER_ENGINES[key] = factory()
        return engine(series)

    return anonymise


def anonymise_columns(
    df: DataFrame, cols: list[str], anonymiser=None
) -> DataFrame:
    """Mask entities in free-text columns via a vectorized pandas UDF."""
    _require_columns(df, cols, "anonymise_columns")
    fn = anonymiser or default_anonymiser

    @F.pandas_udf(T.StringType())
    def mask_udf(s: pd.Series) -> pd.Series:
        return fn(s)

    for c in cols:
        df = df.withColumn(c, mask_udf(F.col(c)))
    return df


def pseudo_transform(
    df: DataFrame, config: TableConfig, anonymiser=None
) -> DataFrame:
    """Config dispatch (UD3; reference ``transform.py:156-195``):
    free-text masking → datetime rounding → hashing → removal.

    Hashing runs after masking so a column that is both hashed and
    configured free-text behaves like the reference's ordering; unknown
    treatment kinds cannot occur (typed config)."""
    if config.free_text_columns:
        df = anonymise_columns(df, config.free_text_columns, anonymiser)
    if config.round_datetime_columns:
        df = round_datetime_columns(df, config.round_datetime_columns)
    if config.hash_columns:
        df = hash_columns(df, config.hash_columns, config.salt)
    if config.remove_columns:
        df = remove_columns(df, config.remove_columns)
    return df


__all__ = [
    "ColumnType",
    "MASKING_RULES",
    "anonymise_columns",
    "default_anonymiser",
    "hash_columns",
    "per_worker",
    "pseudo_transform",
    "remove_columns",
    "round_datetime_columns",
]


def feistel_permute_key(
    col, salt: str, rounds: int = 4, bits: int = 32
):
    """Format-preserving key pseudonymisation: a balanced Feistel
    network over the low ``bits`` of an integer key — a BIJECTION on
    [0, 2^bits), so scrambled keys stay integers, stay unique
    (foreign-key joins keep working across tables scrambled with the
    same salt), and cannot collide — the property salted-sha2 string
    hashes give up. The round function is the engine-portable md5
    convention (``conv(substr(md5(R ':' round ':' salt), 1, 8))``), so
    the permutation is deterministic, keyed by the salt, and
    reproducible in ANY engine with md5 — unrolled SQL replays it
    exactly.

    SECURITY SCOPE: this is deterministic keyed pseudonymisation, NOT
    cryptographic format-preserving encryption. On a 32-bit domain the
    halves are 16 bits, where Luby–Rackoff bounds are vacuous and a
    per-value brute force is trivial; truncated md5 is not a PRF. An
    adversary who can guess-and-check salts, or who holds known
    (key, scrambled) pairs, should be assumed to win. It protects
    against casual re-identification in analytics outputs while
    preserving join structure; for adversarial settings use real FPE
    (FF1/FF3 with AES) outside this engine.

    Scale: ``rounds`` × ~4 codegen'd JVM expressions per row, no
    shuffle, no state. Inverse = the same network with the round
    schedule reversed (:func:`feistel_unpermute_key`)."""
    half = bits // 2
    mask = (1 << half) - 1
    left = F.shiftright(col.cast("long"), half).bitwiseAND(F.lit(mask))
    right = col.cast("long").bitwiseAND(F.lit(mask))
    for r in range(rounds):
        fk = F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        right.cast("string"),
                        F.lit(f":{r}:{salt}"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long").bitwiseAND(F.lit(mask))
        left, right = right, left.bitwiseXOR(fk)
    return (F.shiftleft(left, half) + right).cast("long")


def feistel_unpermute_key(
    col, salt: str, rounds: int = 4, bits: int = 32
):
    """Inverse of :func:`feistel_permute_key`: run the network with
    the round schedule reversed and the swap undone — the key holder
    (salt holder) can recover original keys; without the salt the
    permutation is a PRP."""
    half = bits // 2
    mask = (1 << half) - 1
    left = F.shiftright(col.cast("long"), half).bitwiseAND(F.lit(mask))
    right = col.cast("long").bitwiseAND(F.lit(mask))
    for r in range(rounds - 1, -1, -1):
        fk = F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        left.cast("string"),
                        F.lit(f":{r}:{salt}"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long").bitwiseAND(F.lit(mask))
        left, right = right.bitwiseXOR(fk), left
    return (F.shiftleft(left, half) + right).cast("long")
