"""Deterministic sampling for training-data pipelines.

``df.sample()`` is seed-dependent per partitioning (a repartition or
speculative retry changes the picked rows), which breaks reproducible
dataset builds. These operators derive the keep-decision from a HASH
OF THE ROW KEY (md5 -> uniform [0, 1)), so the same row is kept or
dropped regardless of partitioning, cluster size, retries, or engine
-- the DuckDB oracle twin replicates the decision bit for bit.

- ``deterministic_sample``: uniform fraction over the whole frame;
- ``stratified_sample``: per-stratum fractions (class rebalancing --
  e.g. downsample boilerplate languages, keep all rare ones);
- the ``salt`` picks independent samples from the same keys (two
  disjoint eval slices: salt="a" at 0.1 and salt="b" at 0.1 overlap
  ~1%, exactly as independent uniforms would).

All pure built-ins (md5 / conv / comparison) -- whole-stage codegen, a
narrow filter, no shuffle; the filter pushes down through the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DENOM = float(1 << 32)


def sample_hash_col(key: Column, salt: str = "") -> Column:
    """Uniform [0, 1) derived from md5(key || '|' || salt): the first 8
    hex chars as a 32-bit integer over 2^32. Identical in DuckDB:
    ('0x' || substring(md5(coalesce(key, '') || '|' || salt), 1, 8))
    ::UBIGINT / 4294967296.

    The explicit '|' separator keeps (key, salt) pairs from aliasing
    (key 'a' + salt 'bc' vs key 'ab' + salt 'c' hashed identically
    before). A NULL key coalesces to '' (so NULL-key rows get a real,
    shared keep-decision instead of a NULL predicate that silently
    dropped them from every sample) -- use a non-null key column for
    independent per-row decisions."""
    h = F.substring(
        F.md5(F.concat(F.coalesce(key.cast("string"), F.lit("")), F.lit("|" + salt))),
        1,
        8,
    )
    return F.conv(h, 16, 10).cast("double") / F.lit(_DENOM)


def deterministic_sample(
    df: DataFrame, fraction: float, key_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Keep rows with hash(key) < fraction -- partitioning-independent,
    retry-stable, reproducible anywhere md5 exists."""
    return df.filter(sample_hash_col(F.col(key_col), salt) < F.lit(float(fraction)))


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    stratum_col: str,
    key_col: str = "doc_id",
    default: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic fractions; strata absent from
    ``fractions`` keep ``default`` (0.0 = drop)."""
    frac = F.lit(float(default))
    for value, f in sorted(fractions.items()):
        frac = F.when(F.col(stratum_col) == value, F.lit(float(f))).otherwise(frac)
    return df.filter(sample_hash_col(F.col(key_col), salt) < frac)
