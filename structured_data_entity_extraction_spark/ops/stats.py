"""Percentile family with an explicit exact-vs-approximate contract.

``group_percentiles(exact=True)`` is the exact path (Spark
``percentile`` == DuckDB ``quantile_cont``: linear interpolation at
p*(n-1)) -- correct by contract, but at 100 TB each group's values
are buffered in one aggregation state, so a billion-row group is an
executor-memory hazard.

``group_percentiles(exact=False)`` is the scale path: Spark's
``approx_percentile`` (Greenwald-Khanna sketch) keeps O(accuracy)
state per group, merges map-side like any partial aggregate, and
guarantees a RANK error <= n/accuracy: the returned value is an
actual data element whose rank is within n/accuracy of ceil(p*n).
Use it whenever exactness is not contracted; the error bound is
validated in-plan by ``percentile_contract_check`` (each approx value
must lie between the exact percentiles at p -/+ 2/accuracy -- the 2x
margin absorbs interpolation-vs-element slack when n/accuracy is
small) and by the sf0.1 bounds pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_percentiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    ps: tuple[float, ...] = (0.5, 0.9, 0.99),
    exact: bool = True,
    accuracy: int = 1000,
    round_to: int = 6,
) -> DataFrame:
    """Per-group percentiles: columns p50, p90, ... (name = p + 100*p,
    trailing zeros trimmed the same way for 0.99 -> p99, 0.5 -> p50)."""
    aggs = []
    for p in ps:
        name = f"p{p * 100:g}".replace(".", "_")
        if exact:
            e = F.expr(f"percentile({value_col}, {p!r})")
        else:
            e = F.expr(f"approx_percentile({value_col}, {p!r}, {accuracy})")
        aggs.append(F.round(e, round_to).alias(name))
    return df.groupBy(group_col).agg(*aggs)


def percentile_contract_check(
    df: DataFrame,
    group_col: str,
    value_col: str,
    ps: tuple[float, ...] = (0.5, 0.9, 0.99),
    accuracy: int = 1000,
) -> DataFrame:
    """Per-group booleans: does each ``approx_percentile`` land between
    the exact percentiles at p -/+ 2/accuracy? True everywhere iff the
    sketch honors its documented rank-error bound on this data -- a
    SQL-expressible CONTRACT for an algorithm whose exact output is
    implementation-defined (so the oracle twin states the contract,
    not the sketch's internals)."""
    eps = 2.0 / accuracy
    checks = []
    for p in ps:
        name = f"p{p * 100:g}".replace(".", "_") + "_ok"
        approx = F.expr(f"approx_percentile({value_col}, {p!r}, {accuracy})")
        lo = F.expr(f"percentile({value_col}, {max(p - eps, 0.0)!r})")
        hi = F.expr(f"percentile({value_col}, {min(p + eps, 1.0)!r})")
        checks.append(((approx >= lo) & (approx <= hi)).alias(name))
    return df.groupBy(group_col).agg(*checks)
