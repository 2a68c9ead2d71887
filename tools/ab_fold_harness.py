"""Decisive canon-phase forensics on the EXACT scaling-phases corpus
(mult=16, content_scale=10, 8 cores, shuffle_partitions=64): times
canonicalize alone, then interleaves build_triples variants --
HEAD's salted fold vs the r5 pre-fold -- over the same persisted
candidates/nodes. Adjudicates the r6 canon readings (37-53 s vs r5's
16.8 s quiet floor).

Usage: python tools/ab_fold_harness.py [rounds] [mult]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel

from structured_data_entity_extraction_spark import codekg
from structured_data_entity_extraction_spark.fixtures import repos_src_rows
from structured_data_entity_extraction_spark.session import get_spark
from tools.ab_fold import build_triples_prefold
from tools.scaling_phases import REPOS_N


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark("ab-fold-harness", master=f"local[{cores}]",
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    rows = repos_src_rows(REPOS_N * mult, seed=42, content_scale=10)
    repos = spark.createDataFrame(
        [(r["repo"], r["path"], r["commit"], r["lang"], r["content"]) for r in rows],
        "repo string, path string, commit string, lang string, content string",
    ).repartition(cores * 2).persist(StorageLevel.MEMORY_AND_DISK)
    repos.count()
    codekg.extract_code_mentions(repos.limit(200)).count()  # warmup

    mentions = codekg.extract_code_mentions(repos).persist(StorageLevel.MEMORY_AND_DISK)
    mentions.count()
    alias = codekg.code_alias_dim(spark)
    cands = codekg.link_mentions(mentions, alias, use_lsh=True).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    cands.count()

    t0 = time.time()
    nodes = codekg.canonicalize(cands, alias)
    nodes_p = nodes.persist(StorageLevel.MEMORY_AND_DISK)
    nodes_p.count()
    canon_s = round(time.time() - t0, 3)
    print(f"canonicalize alone: {canon_s}s load={os.getloadavg()[0]:.1f}", flush=True)

    out = {"fold": [], "prefold": []}
    for r in range(rounds):
        for name, impl in (("fold", codekg.build_triples),
                           ("prefold", build_triples_prefold)):
            t0 = time.time()
            n = impl(cands, nodes_p).count()
            out[name].append(round(time.time() - t0, 3))
            print(f"round {r} {name}: {out[name][-1]}s rows={n} "
                  f"load={os.getloadavg()[0]:.1f}", flush=True)
    print(json.dumps({
        "canonicalize_s": canon_s,
        "rounds": out,
        "best": {k: min(v) for k, v in out.items()},
    }))


if __name__ == "__main__":
    main()


def composed(rounds: int = 2, mult: int = 16) -> None:
    """Time the EXACT harness composition (canonicalize + build_triples
    in one unit, nodes NOT persisted) to adjudicate composed-vs-
    decomposed: a gap means the nodes subtree is recomputed inside
    build_triples' broadcast."""
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark("ab-fold-harness-composed", master=f"local[{cores}]",
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    rows = repos_src_rows(REPOS_N * mult, seed=42, content_scale=10)
    repos = spark.createDataFrame(
        [(r["repo"], r["path"], r["commit"], r["lang"], r["content"]) for r in rows],
        "repo string, path string, commit string, lang string, content string",
    ).repartition(cores * 2).persist(StorageLevel.MEMORY_AND_DISK)
    repos.count()
    codekg.extract_code_mentions(repos.limit(200)).count()
    mentions = codekg.extract_code_mentions(repos).persist(StorageLevel.MEMORY_AND_DISK)
    mentions.count()
    alias = codekg.code_alias_dim(spark)
    cands = codekg.link_mentions(mentions, alias, use_lsh=True).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    cands.count()
    times = []
    for r in range(rounds):
        t0 = time.time()
        nodes = codekg.canonicalize(cands, alias)
        n = codekg.build_triples(cands, nodes).count()
        times.append(round(time.time() - t0, 3))
        print(f"composed round {r}: {times[-1]}s rows={n} "
              f"load={os.getloadavg()[0]:.1f}", flush=True)
    print(json.dumps({"composed": times, "best": min(times)}))
