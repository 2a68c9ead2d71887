"""Stage D (logical) -- TRIPLE PIVOT and the fidelity comparator.

T2 (SURVEY.md §2.7): the 13-field record melts into 13
``(subj=doc_id, pred=field, obj=value)`` triples via
``explode(map_from_arrays(...))`` -- a zero-shuffle projection.
``content_sha`` (the per-stage sha256 invariant key) is carried
through when the record frame has it. The P/R harness is a full
outer join on ``(doc_id, pred)`` with exact ``obj`` match
(BASELINE.json:metric, target ≥0.95 both directions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .schemas import RECORD_FIELDS


def records_to_triples(records: DataFrame) -> DataFrame:
    """record df (doc_id + 13 field cols [+ repo/lang/content_sha]) ->
    triples df (subj, pred, obj, doc_id, repo, lang, content_sha, conf)."""
    out = records.select(
        "doc_id",
        *[c for c in ("repo", "lang", "content_sha") if c in records.columns],
        F.explode(
            F.map_from_arrays(
                F.array(*[F.lit(f) for f in RECORD_FIELDS]),
                F.array(*[F.col(f) for f in RECORD_FIELDS]),
            )
        ).alias("pred", "obj"),
    )
    opt = lambda c: (  # noqa: E731
        F.col(c) if c in records.columns else F.lit(None).cast("string")
    ).alias(c)
    return out.select(
        F.col("doc_id").alias("subj"),
        "pred",
        "obj",
        "doc_id",
        opt("repo"),
        opt("lang"),
        opt("content_sha"),
        F.lit(1.0).alias("conf"),
    )


def precision_recall(engine: DataFrame, reference: DataFrame) -> dict:
    """Exact-match P/R of engine triples vs reference triples, joined on
    (doc_id, pred). Both frames: (doc_id, pred, obj). Empty-string objs
    count as 'no value emitted' on both sides (the reference's '' default
    means 'field not found')."""
    e = engine.select("doc_id", "pred", F.col("obj").alias("e_obj")).filter(
        F.col("e_obj") != ""
    )
    r = reference.select("doc_id", "pred", F.col("obj").alias("r_obj")).filter(
        F.col("r_obj") != ""
    )
    j = e.join(r, ["doc_id", "pred"], "full_outer")
    agg = j.agg(
        F.sum(
            F.when(
                (F.col("e_obj").isNotNull())
                & (F.col("r_obj").isNotNull())
                & (F.col("e_obj") == F.col("r_obj")),
                1,
            ).otherwise(0)
        ).alias("tp"),
        F.sum(F.when(F.col("e_obj").isNotNull(), 1).otherwise(0)).alias("e_total"),
        F.sum(F.when(F.col("r_obj").isNotNull(), 1).otherwise(0)).alias("r_total"),
    ).collect()[0]
    tp, e_total, r_total = agg["tp"] or 0, agg["e_total"] or 0, agg["r_total"] or 0
    return {
        "tp": tp,
        "engine_triples": e_total,
        "reference_triples": r_total,
        "precision": tp / e_total if e_total else 1.0,
        "recall": tp / r_total if r_total else 1.0,
    }
