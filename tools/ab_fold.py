"""Interleaved A/B: build_triples WITH the (repo_bucket, lang) dedup/
write-clustering fold (HEAD) vs the pre-fold formulation (full-key
groupBy, no repartition) -- same session, alternating rounds, best-of.
Counts only (no write), so this isolates the dedup-exchange plan cost;
the write-side benefit (file counts) is measured separately.
Usage: python tools/ab_fold.py [rounds] [repos_n]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from structured_data_entity_extraction_spark import codekg
from structured_data_entity_extraction_spark.codekg import _hex_pack, _hex_unpack, _is_hex
from structured_data_entity_extraction_spark.fixtures import repos_src_rows
from structured_data_entity_extraction_spark.schemas import REPOS_SRC
from structured_data_entity_extraction_spark.session import get_spark


def build_triples_prefold(candidates, nodes):
    """The r5 formulation: one exchange on the (mostly unique) full
    dedup key, repo_bucket/lang aggregated via max, no repartition."""
    pred = (
        F.when(F.col("field") == "import", F.lit("imports"))
        .when(F.col("field") == "def", F.lit("declares_function"))
        .when(F.col("field") == "class", F.lit("declares_class"))
        .when(F.col("field") == "config", F.lit("has_config_key"))
        .when(F.col("field") == "shebang", F.lit("has_shebang"))
        .when(F.col("field") == "encoding", F.lit("has_encoding"))
        .when(F.col("field") == "__error__", F.lit("extract_error"))
        .otherwise(F.lit("mentions_identifier"))
    )
    doc_dim = candidates.groupBy("doc_id").agg(
        F.max("repo").alias("repo"),
        F.max("repo_bucket").alias("repo_bucket"),
        F.max("lang").alias("lang"),
        F.max("content_sha").alias("content_sha"),
    )
    doc_triples = (
        candidates.join(
            F.broadcast(
                nodes.select(
                    F.col("surface").alias("value"),
                    F.col("canonical").alias("node_canonical"),
                )
            ),
            "value",
            "left",
        )
        .select(
            _hex_pack("doc_id").alias("_doc_id_b"),
            _is_hex("doc_id").alias("_doc_hex"),
            pred.alias("pred"),
            F.coalesce("node_canonical", "value").alias("obj"),
            "repo",
            "repo_bucket",
            "lang",
            _hex_pack("content_sha").alias("_content_sha_b"),
            _is_hex("content_sha").alias("_sha_hex"),
            F.coalesce("score", F.lit(1.0)).alias("conf"),
        )
        .groupBy("_doc_id_b", "_doc_hex", "pred", "obj")
        .agg(
            F.max("repo").alias("repo"),
            F.max("repo_bucket").alias("repo_bucket"),
            F.max("lang").alias("lang"),
            F.max(
                F.struct(
                    F.col("_sha_hex").alias("f"), F.col("_content_sha_b").alias("b")
                )
            ).alias("_sha"),
            F.max("conf").alias("conf"),
        )
        .select(
            _hex_unpack("_doc_id_b", "_doc_hex").alias("subj"),
            "pred",
            "obj",
            _hex_unpack("_doc_id_b", "_doc_hex").alias("doc_id"),
            "repo",
            "repo_bucket",
            "lang",
            F.when(F.col("_sha.f"), F.lower(F.hex("_sha.b")))
            .otherwise(F.decode(F.col("_sha.b"), "UTF-8"))
            .alias("content_sha"),
            "conf",
        )
    )
    repo_triples = doc_dim.select(
        F.col("repo").alias("subj"),
        F.lit("contains_file").alias("pred"),
        F.col("doc_id").alias("obj"),
        "doc_id",
        "repo",
        "repo_bucket",
        "lang",
        "content_sha",
        F.lit(1.0).alias("conf"),
    )
    return doc_triples.unionByName(repo_triples)


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    repos_n = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("ab-fold", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    rows = repos_src_rows(repos_n, seed=42)
    repos = (
        spark.createDataFrame(
            [(r["repo"], r["path"], r["commit"], r["lang"], r["content"]) for r in rows],
            REPOS_SRC,
        )
        .repartition(cpus)
        .cache()
    )
    repos.count()
    from structured_data_entity_extraction_spark.ops.cache import cache_scope

    # shared upstream (extract+link+canon) persisted per round inside
    # cache_scope; we time ONLY the triples tail per variant to isolate
    # the dedup-exchange change -- but the full-query timing is what the
    # bench records, so time build_kg end-to-end per variant instead.
    def run(build):
        orig = codekg.build_triples
        codekg.build_triples = build
        try:
            with cache_scope():
                t0 = time.time()
                n = codekg.build_kg(repos, use_lsh=True).count()
                return round(time.time() - t0, 3), n
        finally:
            codekg.build_triples = orig

    # warmup
    codekg.build_kg(repos.limit(100), use_lsh=True).count()
    samples = {"fold": [], "prefold": []}
    counts = {}
    for _ in range(rounds):
        for name, build in (
            ("fold", codekg.build_triples),
            ("prefold", build_triples_prefold),
        ):
            dt, n = run(build)
            samples[name].append(dt)
            counts[name] = n
            print(f"{name}: {dt}s n={n} load={os.getloadavg()[0]:.1f}", flush=True)
    import json

    print(
        json.dumps(
            {
                "best": {k: min(v) for k, v in samples.items()},
                "all": samples,
                "counts": counts,
            }
        )
    )


if __name__ == "__main__":
    main()
