"""Deterministic hash-based sampling — reproducible corpus splits.

The reference samples with RNG state (profiler_utils.shuffle_in_chunks:
94-141, seeded via rng_utils.py:10-19); that reproduces only within one
process. A training-data pipeline needs sampling that is *stable across
engines, partitionings, and reruns*: hash the key, keep a row iff the
hash falls under the fraction. Properties that matter at 100 TB:

- pure filter — no shuffle, no RNG state, pushes down past column
  pruning, trivially parallel at any partition count;
- consistent — the same key always lands in the same split (join-safe:
  sampling two tables by the same key keeps them aligned);
- mergeable — sample(f1) ⊆ sample(f2) for f1 < f2 (nested holdouts).

md5 is used (not xxhash64) so DuckDB oracles reproduce the decision
bit-for-bit (NOTES_r1 playbook: md5 is the only portable hash).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 8 hex chars → 32-bit space; uniform in [0, 1) after division
_HASH_SPACE = float(1 << 32)


# NULL keys hash the sentinel (not just the seed): every engine makes the
# same keep/drop decision for NULL-key rows, and they don't collapse onto
# the seed-only hash. A literal key equal to the sentinel collides with
# NULL — documented, vanishingly unlikely, and identical on both engines.
_NULL_SENTINEL = "\x00<null>"


def hash_fraction_expr(key: Column, seed: str = "dps-sample-v1") -> Column:
    """Uniform [0,1) decision value from md5(seed || key); NULL keys take
    the sentinel path (same decision on every engine)."""
    k = F.coalesce(key.cast("string"), F.lit(_NULL_SENTINEL))
    h = F.md5(F.concat_ws("|", F.lit(seed), k))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(_HASH_SPACE)


def hash_sample(df: DataFrame, key: str, fraction: float,
                seed: str = "dps-sample-v1") -> DataFrame:
    """Keep ~fraction of rows, decided by the key's hash. Same key ⇒
    same decision, on any engine, at any scale."""
    return df.where(hash_fraction_expr(F.col(key), seed) < fraction)


def stratified_hash_sample(df: DataFrame, key: str, strata_col: str,
                           fractions: dict[str, float],
                           default_fraction: float = 0.0,
                           seed: str = "dps-sample-v1") -> DataFrame:
    """Per-stratum deterministic sampling (df.stat.sampleBy semantics,
    but reproducible): each stratum gets its own keep-fraction via a
    flat map-literal lookup — still a pure filter, no shuffle. (A
    nested when/otherwise chain here overflows the column-converter
    stack at a few hundred strata; ``create_map`` is one expression
    node regardless of width. NULL or unlisted strata take the
    default, exactly like the CASE chain's otherwise branch.)"""
    frac = lookup_fraction_expr(F.col(strata_col), fractions,
                                default_fraction)
    return df.where(hash_fraction_expr(F.col(key), seed) < frac)


def lookup_fraction_expr(key: Column, fractions: dict[str, float],
                         default_fraction: float = 0.0) -> Column:
    """Flat per-key fraction lookup: map literal + element_at, with
    NULL/missing keys falling back to the default."""
    if not fractions:
        return F.lit(float(default_fraction))
    pairs: list[Column] = []
    for value, f in sorted(fractions.items()):
        pairs.append(F.lit(value))
        pairs.append(F.lit(float(f)))
    # try_element_at, not element_at: ANSI mode makes the latter THROW
    # on a missing map key, and unlisted strata are the normal case.
    return F.coalesce(F.try_element_at(F.create_map(*pairs), key),
                      F.lit(float(default_fraction)))


def _duck_hash_fraction(key: str, seed: str = "dps-sample-v1") -> str:
    sent = "chr(0) || '<null>'"
    return (f"CAST(('0x' || substr(md5('{seed}' || '|' || "
            f"COALESCE(CAST({key} AS VARCHAR), {sent})), 1, 8))"
            f"::BIGINT AS DOUBLE) / {_HASH_SPACE}")


def oracle_hash_sample_sql(table: str, key: str, fraction: float,
                           seed: str = "dps-sample-v1") -> str:
    return (f"SELECT * FROM {table} "
            f"WHERE {_duck_hash_fraction(key, seed)} < {fraction}")


def oracle_stratified_sql(table: str, key: str, strata_col: str,
                          fractions: dict[str, float],
                          default_fraction: float = 0.0,
                          seed: str = "dps-sample-v1") -> str:
    cases = " ".join(
        f"WHEN {strata_col} = '{v}' THEN {f}"
        for v, f in sorted(fractions.items()))
    return (f"SELECT * FROM {table} "
            f"WHERE {_duck_hash_fraction(key, seed)} < "
            f"(CASE {cases} ELSE {default_fraction} END)")
