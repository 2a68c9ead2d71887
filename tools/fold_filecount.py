"""File-count A/B for the r6 dedup/write-clustering fold (VERDICT r5
next-round item 1, the 'small-files explosion' half of the claim; the
wall-clock half is tools/ab_fold.py).

Writes the SAME triple frame partitionBy(repo_bucket, lang) twice:
- prefold: build_triples as of r5 -- one exchange on the full dedup
  key, so the write consumes arbitrary task partitioning and every
  task can emit a file into every (repo_bucket, lang) directory;
- fold (HEAD): build_triples repartitions on (repo_bucket, lang), so
  each hive partition is written by exactly one task.

Prints part-file counts, hive-partition counts, and rows for both.

Usage: python tools/fold_filecount.py [repos_n]
"""

from __future__ import annotations

import glob
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from structured_data_entity_extraction_spark import codekg
from structured_data_entity_extraction_spark.fixtures import repos_src_rows
from structured_data_entity_extraction_spark.schemas import REPOS_SRC
from structured_data_entity_extraction_spark.session import get_spark


def main() -> None:
    repos_n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("fold-filecount", master=f"local[{cpus}]")
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
    from tools.ab_fold import build_triples_prefold

    alias_dim = codekg.code_alias_dim(spark)
    mentions = codekg.extract_code_mentions(repos).persist()
    candidates = codekg.link_mentions(mentions, alias_dim, use_lsh=True).persist()
    candidates.count()
    edges = codekg.link_edges(candidates, alias_dim)
    nodes = codekg.canonicalize(candidates, alias_dim, edges).persist()
    nodes.count()

    base = "/tmp/fold_filecount"
    shutil.rmtree(base, ignore_errors=True)
    out = {}
    for name, build in (("fold", codekg.build_triples), ("prefold", build_triples_prefold)):
        path = os.path.join(base, name)
        df = build(candidates, nodes)
        df.write.partitionBy("repo_bucket", "lang").parquet(path)
        parts = glob.glob(os.path.join(path, "repo_bucket=*", "lang=*"))
        files = glob.glob(os.path.join(path, "repo_bucket=*", "lang=*", "*.parquet"))
        n = spark.read.parquet(path).count()
        out[name] = {"rows": n, "hive_partitions": len(parts), "part_files": len(files)}
        print(f"{name}: rows={n} hive_partitions={len(parts)} part_files={len(files)}",
              flush=True)
    import json

    print(json.dumps(out))


if __name__ == "__main__":
    main()
