"""Test-set decontamination for training-data pipelines: flag (and
drop) corpus documents that share word-k-gram shingles with a held-out
benchmark set -- the standard n-gram-collision decontamination step
(k=13 is the common choice for LLM eval hygiene).

Scale shape: the benchmark side is SMALL (eval suites are thousands of
rows), so its distinct shingle set is broadcast; the corpus side is one
explode + broadcast semi/equi join + per-doc aggregation -- the corpus
never shuffles on content, only the per-doc hit counts aggregate
(map-side combine first). No pairwise comparisons anywhere.

Both operators are pure built-ins with ANSI-SQL oracle twins in
__spark_entry__.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import shingles_col


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    k: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document contamination: (doc_id, n_shingles, n_hits,
    contamination) where n_hits counts the doc's DISTINCT word-k-grams
    that appear anywhere in the benchmark and contamination =
    n_hits / n_shingles. Docs with zero hits are included (0.0) --
    the report covers the whole corpus."""
    # shingles cross the broadcast + join as 8-byte md5-prefix keys, not
    # full k-gram strings: at k=13 a shingle is ~80 UTF-8 bytes, so the
    # 64-bit key cuts broadcast and probe-side bytes ~10x; collisions
    # (~n^2/2^64 for benchmark-shingle-set sizes) are the same odds that
    # already bound every MinHash band in this engine. The DuckDB twin
    # joins on the identical substring(md5(shingle), 1, 16) key.
    def _h(shingle):
        return F.unhex(F.substring(F.md5(shingle), 1, 16))

    bench_sh = (
        benchmark.select(F.explode(shingles_col(F.col(text_col), k)).alias("_s"))
        .select(_h(F.col("_s")).alias("_hkey"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    # ONE shingling pass over the corpus, evaluated ONCE per row: the
    # r7-start form selected size(_sh) AND explode(_sh) from the same
    # projection, and CollapseProject inlined the whole k-level
    # zip_with shingle chain into BOTH -- every row paid the k=13
    # kernel twice. The per-doc count is instead recovered AFTER the
    # explode as count(*): shingles_col yields a DISTINCT, null-free
    # array with >= 1 element for non-null text, so each doc emits
    # exactly size(_sh) rows and every doc survives the groupBy. The
    # corpus is also spread when it arrives as fewer splits than cores
    # (a single-file corpus serialized this per-row-heavy kernel onto
    # 2 cores -- measured 49 s -> ~2 s at 50k docs with both fixes;
    # a real multi-file corpus never pays the exchange).
    from .dedup import _ensure_parallelism

    ex = _ensure_parallelism(corpus).select(
        F.col(id_col).alias("doc_id"),
        F.explode(shingles_col(F.col(text_col), k)).alias("_s"),
    ).select("doc_id", _h(F.col("_s")).alias("_hkey"))
    return (
        ex.join(F.broadcast(bench_sh), "_hkey", "left")
        .groupBy("doc_id")
        .agg(
            # cast: size() was IntegerType; count is long -- keep the
            # public schema bit-identical to the pre-rewrite operator
            F.count(F.lit(1)).cast("int").alias("n_shingles"),
            F.sum(F.coalesce("_hit", F.lit(0))).cast("long").alias("n_hits"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_hits",
            F.round(F.col("n_hits") / F.col("n_shingles"), 6).alias("contamination"),
        )
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    max_contamination: float = 0.0,
    k: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Drop every corpus doc whose contamination exceeds
    ``max_contamination`` (default: any benchmark shingle hit drops the
    doc). Anti-join on the flagged id set -- corpus rows stream through
    untouched otherwise."""
    flagged = (
        contamination_report(corpus, benchmark, k, text_col, id_col)
        .filter(F.col("contamination") > max_contamination)
        .select(F.col("doc_id").alias("_flagged_id"))
    )
    return corpus.join(
        flagged, corpus[id_col] == flagged["_flagged_id"], "left_anti"
    )
