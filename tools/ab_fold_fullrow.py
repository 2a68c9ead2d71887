"""Interleaved A/B of the FULL bench codekg_triples row (build_kg +
count, bench-identical input: repos_src_rows(20000, seed=42),
local[32]) with HEAD's folded build_triples vs the r5 pre-fold
formulation (tools/ab_fold.py isolates build_triples alone; this
measures the row the driver bench actually records, to adjudicate the
r6 quiet-window regression 5.0 -> 9.1 s).

Usage: python tools/ab_fold_fullrow.py [rounds] [repos_n]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from structured_data_entity_extraction_spark import codekg
from structured_data_entity_extraction_spark.fixtures import repos_src_rows
from structured_data_entity_extraction_spark.ops.cache import cache_scope
from structured_data_entity_extraction_spark.schemas import REPOS_SRC
from structured_data_entity_extraction_spark.session import get_spark
from tools.ab_fold import build_triples_prefold


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    repos_n = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("ab-fold-fullrow", master=f"local[{cpus}]")
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
    # untimed pUDF warmup (bench policy)
    codekg.build_kg(repos.limit(100), use_lsh=True).count()

    fold_build = codekg.build_triples
    out = {"fold": [], "prefold": []}
    loads = []
    for r in range(rounds):
        for name, impl in (("fold", fold_build), ("prefold", build_triples_prefold)):
            codekg.build_triples = impl
            t0 = time.time()
            with cache_scope():
                n = codekg.build_kg(repos, use_lsh=True).count()
            out[name].append(round(time.time() - t0, 3))
            loads.append(round(os.getloadavg()[0], 1))
        print(f"round {r}: fold={out['fold'][-1]} prefold={out['prefold'][-1]} "
              f"rows={n} load={loads[-1]}", flush=True)
    codekg.build_triples = fold_build
    print(json.dumps({
        "rounds": out,
        "best": {k: min(v) for k, v in out.items()},
        "median": {k: sorted(v)[len(v) // 2] for k, v in out.items()},
        "loadavg_after_each": loads,
        "repos_n": repos_n,
    }))


if __name__ == "__main__":
    main()
