"""Temporal join operators Spark lacks as built-ins: as-of join and
point-in-interval range join. Both are expressed as compositions of
existing DataFrame ops (the task brief's preferred route) -- no Python
in the plan, exact ANSI-SQL oracle twins in __spark_entry__.py.

Scale shapes:

- ``asof_join``: the naive formulation (per-left-row "latest right row
  <= ts" subquery or theta-join + window) explodes to O(|L| x |R|) per
  key. This implementation tags and UNIONS the two streams, then takes
  a running ``last(ignorenulls)`` over a (key, ts, side) window -- ONE
  shuffle on the key, no join at all, state bounded by the window
  frame. This is the standard distributed as-of pattern (the same
  shape Flink's temporal join and kdb's aj compile to).
- ``interval_join``: the theta-join (start <= ts <= end) would be a
  BroadcastNestedLoopJoin. Exploding each interval over the epoch
  BUCKETS it overlaps turns it into a keyed equi-join on
  (key, bucket) + an exact range filter; bucket width trades interval
  fanout against join selectivity. A point's bucket is always covered
  by any interval containing the point, and appears exactly once per
  interval -- so the equi-join loses nothing and never duplicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    value_cols: tuple[str, ...] = ("value",),
    suffix: str = "_asof",
    bucket_s: int | None = None,
) -> DataFrame:
    """For every left row, append the right side's ``value_cols`` from
    the most recent right row with right.ts <= left.ts on the same key
    (NULL when no such row). Ties at equal ts take the right row (the
    as-of convention: a quote AT the event time is visible to it).

    The right side is first collapsed to one row per (key, ts) --
    max per value column -- so the result is deterministic even with
    duplicate right timestamps; the oracle twin applies the identical
    collapse.

    NULL semantics: a right row whose value is NULL does not update the
    running state (last ignorenulls) -- the previous non-null value
    persists. Filter or impute the right side first if a NULL should
    overwrite. A right row with NULL ``ts`` is DROPPED (it has no
    as-of position); both paths share the filter, so default and
    bucketed output are identical by construction.

    SKEW: the default path's running-last window is partitioned by
    ``key`` alone, so ONE hot key (a user with 50M events) serializes
    its whole timeline into a single task -- the known cost of the
    union+window as-of shape. For skewed key distributions pass
    ``bucket_s`` (a coarse time-bucket width in seconds): the hot key
    then spreads over its time buckets via a two-pass scheme --
    (1) per-(key, bucket) carry-out = last non-null right value in the
    bucket, chained into a per-bucket carry-IN by a tiny window over
    bucket summaries (rows = distinct buckets per key, not events);
    (2) the running-last window repartitioned by (key, bucket), seeded
    with the carry-in as a synthetic first row. Identical output
    (oracle-checked on both paths), max task ≈ hot key's densest
    bucket."""
    # a right row with NULL ts has no as-of position: drop it up front
    # so both paths agree by construction (the default path's
    # nulls-first window would otherwise let it seed the running state,
    # while the bucketed path's max_by would never carry it)
    r = (
        right.filter(F.col(ts).isNotNull())
        .groupBy(key, ts)
        .agg(*[F.max(c).alias(c) for c in value_cols])
    )
    if bucket_s is None:
        lt = left.withColumn("_side", F.lit(1))
        rt = r.withColumn("_side", F.lit(0))
        u = lt.unionByName(rt, allowMissingColumns=True)
        w = (
            Window.partitionBy(key)
            .orderBy(F.col(ts).asc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        for c in value_cols:
            u = u.withColumn(
                c + suffix,
                F.last(F.when(F.col("_side") == 0, F.col(c)), ignorenulls=True).over(w),
            )
        return u.filter(F.col("_side") == 1).select(
            *left.columns, *[c + suffix for c in value_cols]
        )

    bucket = F.floor(F.unix_timestamp(F.col(ts)) / F.lit(int(bucket_s))).cast("long")
    rb = r.withColumn("_b", bucket)
    lb = left.withColumn("_b", bucket)
    # (1) carry-out per (key, bucket): last NON-NULL right value in the
    # bucket (max_by ignores rows whose ordering expr is null, so null
    # values never become a carry; all-null buckets carry null)
    carry_out = rb.groupBy(key, "_b").agg(
        *[
            F.max_by(F.col(c), F.when(F.col(c).isNotNull(), F.col(ts))).alias(c)
            for c in value_cols
        ]
    )
    # every bucket any LEFT row lands in needs a carry-in too (there may
    # be no right rows in it); distinct left buckets aggregate map-side
    buckets = (
        lb.select(key, "_b")
        .distinct()
        .unionByName(carry_out.select(key, "_b"))
        .select(key, "_b")
        .distinct()
    )
    wb = (
        Window.partitionBy(key)
        .orderBy(F.col("_b").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry_in = buckets.join(carry_out, [key, "_b"], "left").select(
        key,
        "_b",
        *[F.last(F.col(c), ignorenulls=True).over(wb).alias(c) for c in value_cols],
    )
    # (2) per-(key, bucket) running last, seeded by the carry-in as a
    # synthetic first row (_carry sorts it before every real row) --
    # no join of the event stream against the bucket summaries
    lt = lb.withColumn("_side", F.lit(1)).withColumn("_carry", F.lit(0))
    rt = rb.withColumn("_side", F.lit(0)).withColumn("_carry", F.lit(0))
    ct = carry_in.withColumn("_side", F.lit(0)).withColumn("_carry", F.lit(1))
    u = lt.unionByName(rt, allowMissingColumns=True).unionByName(
        ct, allowMissingColumns=True
    )
    w = (
        Window.partitionBy(key, "_b")
        .orderBy(F.col("_carry").desc(), F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in value_cols:
        u = u.withColumn(
            c + suffix,
            F.last(F.when(F.col("_side") == 0, F.col(c)), ignorenulls=True).over(w),
        )
    return u.filter(F.col("_side") == 1).select(
        *left.columns, *[c + suffix for c in value_cols]
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    start: str = "start",
    end: str = "end",
    bucket_s: int = 3600,
) -> DataFrame:
    """Inner join of point rows to every interval row (same key) whose
    [start, end] contains the point's timestamp (inclusive both ends).
    Callers rename colliding columns beforehand. ``bucket_s`` should be
    on the order of the typical interval length."""
    p = points.withColumn(
        "_b", F.floor(F.unix_timestamp(F.col(ts)) / F.lit(bucket_s)).cast("long")
    )
    i = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start)) / F.lit(bucket_s)).cast("long"),
                F.floor(F.unix_timestamp(F.col(end)) / F.lit(bucket_s)).cast("long"),
            )
        ),
    )
    return (
        p.join(i, [key, "_b"])
        .filter((F.col(ts) >= F.col(start)) & (F.col(ts) <= F.col(end)))
        .drop("_b")
    )
