"""Structured Streaming ingestion (extension beyond the reference --
SURVEY.md §2.9 notes the stage-checkpoint design is micro-batch-shaped;
this is that natural extension, built).

``stream_repos_src`` ingests new repos_src parquet files as they land
(the "new commits" feed) and runs the extract stage per micro-batch via
``foreachBatch``, appending to the mentions table. Batch and streaming
share the exact same extraction code path, so correctness carries over;
``availableNow`` triggers make it testable (and backfill-able) without
a long-running query.

At scale: one streaming query per corpus shard, checkpointLocation on
durable storage gives exactly-once file-source progress; the
foreachBatch write appends partitioned parquet keyed the same way as
the batch pipeline ((repo_bucket, lang)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .codekg import extract_code_mentions
from .schemas import REPOS_SRC


def stream_repos_src(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    bucket_count: int = 64,
    available_now: bool = True,
):
    """File-source stream of repos_src parquet -> per-batch extract ->
    partitioned mentions append. Returns the StreamingQuery."""
    stream = (
        spark.readStream.schema(REPOS_SRC)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_path)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        mentions = extract_code_mentions(batch_df, bucket_count)
        (
            mentions.write.mode("append")
            .partitionBy("repo_bucket", "lang")
            .parquet(output_path)
        )

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
