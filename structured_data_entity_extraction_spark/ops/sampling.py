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


def shuffle_shards(
    df: DataFrame,
    n_shards: int,
    key_col: str = "doc_id",
    salt: str = "",
    cluster: bool = False,
) -> DataFrame:
    """Deterministic global shuffle for training-data ordering.

    Training runs need the corpus in a reproducible pseudo-random
    order; a global ``orderBy(rand())`` is seed-per-partitioning (like
    ``sample()``) and a global ``row_number`` forces a single-partition
    window at 100 TB. Instead: ``shard`` = md5-derived bucket,
    ``sort_key`` = the full md5 hex -- the total order (shard-major,
    sort_key-minor) is a pure function of (key, salt), identical under
    any partitioning, cluster size, retry, or engine (DuckDB twin:
    ``('0x' || substring(md5(k || '|' || salt), 1, 8))::UBIGINT %
    n_shards``). A different ``salt`` is a fresh independent epoch
    order.

    ``cluster=True`` additionally repartitions by shard and sorts
    within partitions -- the write-side layout (one sorted file per
    shard via ``partitionBy("shard")``); at scale this is the ONLY
    data movement, one shuffle, no global sort barrier.
    """
    h = F.md5(
        F.concat(
            F.coalesce(F.col(key_col).cast("string"), F.lit("")), F.lit("|" + salt)
        )
    )
    out = df.withColumn("sort_key", h).withColumn(
        "shard",
        (F.conv(F.substring(F.col("sort_key"), 1, 8), 16, 10).cast("long")
         % F.lit(int(n_shards))).cast("int"),
    )
    if cluster:
        out = out.repartition("shard").sortWithinPartitions("sort_key")
    return out
