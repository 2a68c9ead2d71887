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
    # ONE shingling pass over the corpus: carry the per-doc shingle
    # count through the explode, flag hits with a broadcast left join,
    # and fold count + hits in a single aggregation (every doc has >= 1
    # shingle, so every doc survives the explode + groupBy)
    ex = corpus.select(
        F.col(id_col).alias("doc_id"), shingles_col(F.col(text_col), k).alias("_sh")
    ).select(
        "doc_id", F.size("_sh").alias("_n"), F.explode("_sh").alias("_s")
    ).select("doc_id", "_n", _h(F.col("_s")).alias("_hkey"))
    return (
        ex.join(F.broadcast(bench_sh), "_hkey", "left")
        .groupBy("doc_id")
        .agg(
            F.max("_n").alias("n_shingles"),
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
