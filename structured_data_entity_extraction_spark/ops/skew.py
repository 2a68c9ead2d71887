"""Skew handling utilities (BASELINE.json:north_rule: "skew from
mega-repos is handled via salted repartitioning and AQE skew-join
hints").

AQE skew-join splitting is on globally (session.py). This module adds
the explicit patterns for the places AQE can't fix:

- ``salted_agg``: two-phase aggregation for a skewed group key (a
  mega-repo key that would pin one reducer). Phase 1 groups on
  (key, salt) -- the hot key fans out over `n_salts` reducers -- and
  phase 2 combines the partials. Works for any algebraic aggregate
  (count/sum/min/max).
- ``salt_col`` / ``with_salt``: deterministic salt derived from a
  second column (xxhash64 mod n), so repeated runs salt identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_col(*cols: str | Column, n_salts: int = 16) -> Column:
    """Deterministic salt in [0, n_salts) from the given columns."""
    return F.pmod(F.xxhash64(*[F.col(c) if isinstance(c, str) else c for c in cols]), F.lit(n_salts)).cast("int")


def with_salt(df: DataFrame, salt_from: list[str], n_salts: int = 16) -> DataFrame:
    return df.withColumn("_salt", salt_col(*salt_from, n_salts=n_salts))


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, str],
    salt_from: list[str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    aggs: {out_col: "count" | "sum:col" | "min:col" | "max:col"}.
    The salt derives from `salt_from` columns (e.g. the file path), so
    one hot `key` spreads over n_salts partial groups.
    """
    salted = with_salt(df, salt_from, n_salts)

    phase1_exprs = []
    phase2_exprs = []
    for out, spec in aggs.items():
        if spec == "count":
            phase1_exprs.append(F.count(F.lit(1)).alias(f"_p_{out}"))
            phase2_exprs.append(F.sum(f"_p_{out}").alias(out))
        else:
            op, col = spec.split(":", 1)
            fn = {"sum": F.sum, "min": F.min, "max": F.max}[op]
            phase1_exprs.append(fn(col).alias(f"_p_{out}"))
            combine = F.sum if op == "sum" else {"min": F.min, "max": F.max}[op]
            phase2_exprs.append(combine(f"_p_{out}").alias(out))

    partial = salted.groupBy(key, "_salt").agg(*phase1_exprs)
    return partial.groupBy(key).agg(*phase2_exprs)
