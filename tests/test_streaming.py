"""Streaming ingestion: same extraction results as batch, exactly-once
across restarts (file-source checkpoint)."""

from __future__ import annotations

from structured_data_entity_extraction_spark import codekg
from structured_data_entity_extraction_spark.fixtures import repos_src_rows
from structured_data_entity_extraction_spark.schemas import REPOS_SRC
from structured_data_entity_extraction_spark.streaming import stream_repos_src


def _write_input(spark, rows, path):
    df = spark.createDataFrame(
        [(r["repo"], r["path"], r["commit"], r["lang"], r["content"]) for r in rows],
        REPOS_SRC,
    )
    df.coalesce(2).write.mode("append").parquet(path)


def test_stream_matches_batch(spark, tmp_path):
    rows = repos_src_rows(80, seed=5)
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_input(spark, rows[:50], inp)

    q = stream_repos_src(spark, inp, out, ckpt)
    q.awaitTermination(120)

    got1 = spark.read.parquet(out)
    batch_df = spark.createDataFrame(
        [(r["repo"], r["path"], r["commit"], r["lang"], r["content"]) for r in rows[:50]],
        REPOS_SRC,
    )
    want1 = codekg.extract_code_mentions(batch_df)
    key = ["doc_id", "field", "value", "span_start"]
    assert sorted(map(tuple, got1.select(*key).collect())) == sorted(
        map(tuple, want1.select(*key).collect())
    )

    # late-arriving files: restart picks up ONLY the new ones (checkpoint)
    _write_input(spark, rows[50:], inp)
    q2 = stream_repos_src(spark, inp, out, ckpt)
    q2.awaitTermination(120)
    got2 = spark.read.parquet(out)
    full_batch = spark.createDataFrame(
        [(r["repo"], r["path"], r["commit"], r["lang"], r["content"]) for r in rows],
        REPOS_SRC,
    )
    want2 = codekg.extract_code_mentions(full_batch)
    assert got2.count() == want2.count()  # no duplicates from reprocessing
