"""Platform scaling ceiling: how well does this box scale ANY
embarrassingly-parallel CPU work from N to 4N processes, with zero
framework overhead?

Runs the engine's actual extraction kernel (refsem via
extract._extract_one) over the seeded corpus in a plain
multiprocessing.Pool at N and 4N workers, interleaved repeats,
best-of-N. The resulting efficiency is the DENOMINATOR for judging the
Spark job's scaling on this host: a single shared VM cannot emulate
adding machines -- per-core turbo frequency drops as cores engage,
L3/memory bandwidth is shared, and co-tenant load (avg 3-5) steals
cycles -- so even perfect parallel code lands well under 1.0 here
(measured ~0.7). On a real cluster each added executor brings its own
cores/memory/disk, which is the regime the north rule's two-cluster
criterion describes.

Usage: python tools/platform_ceiling.py [--n 2] [--repeats 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from multiprocessing import Pool

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _work(chunk):
    from structured_data_entity_extraction_spark.extract import _extract_one

    return sum(len(_extract_one(t)["mentions"]) for t in chunk)


def run(procs: int, docs: list[str]) -> float:
    chunks = [docs[i :: procs * 4] for i in range(procs * 4)]
    t0 = time.time()
    with Pool(procs) as p:
        p.map(_work, chunks)
    return time.time() - t0


def run_shuffle(cores: int, n_rows: int) -> float:
    """Pure-Spark shuffle ceiling: groupBy over mostly-unique synthetic
    string keys (the shape of triple dedup) with ZERO engine code. Runs
    in a fresh subprocess via --shuffle-one."""
    out = __import__("subprocess").run(
        [sys.executable, os.path.abspath(__file__), "--shuffle-one", str(cores),
         "--rows", str(n_rows)],
        capture_output=True, text=True, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])["secs"]


def shuffle_one(cores: int, n_rows: int) -> None:
    from pyspark.sql import functions as F

    from structured_data_entity_extraction_spark.session import get_spark

    spark = get_spark("shuffle-ceiling", master=f"local[{cores}]",
                      shuffle_partitions=max(cores, 8))
    spark.sparkContext.setLogLevel("ERROR")
    df = (
        spark.range(n_rows, numPartitions=cores * 2)
        .select(
            F.sha2(F.col("id").cast("string"), 256).alias("k1"),
            (F.col("id") % 1000).cast("string").alias("k2"),
            F.col("id").cast("double").alias("v"),
        )
        .persist()
    )
    df.count()
    t0 = time.time()
    df.groupBy("k1", "k2").agg(F.max("v")).count()
    secs = round(time.time() - t0, 3)
    spark.stop()
    print(json.dumps({"cores": cores, "secs": secs}))


def main():
    from structured_data_entity_extraction_spark.fixtures import avaluo_docs

    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--docs", type=int, default=8000)
    ap.add_argument("--content-scale", type=int, default=10)
    ap.add_argument("--kind", choices=["cpu", "shuffle"], default="cpu")
    ap.add_argument("--rows", type=int, default=17_000_000)
    ap.add_argument("--shuffle-one", type=int, default=0)
    args = ap.parse_args()
    if args.shuffle_one:
        shuffle_one(args.shuffle_one, args.rows)
        return
    levels = (args.n, 4 * args.n)
    times: dict[int, list[float]] = {c: [] for c in levels}
    docs = None
    if args.kind == "cpu":
        docs = [d["text"] for d in avaluo_docs(args.docs, seed=42, content_scale=args.content_scale)]
    for _ in range(args.repeats):
        for c in levels:
            if args.kind == "cpu":
                times[c].append(round(run(c, docs), 3))
            else:
                times[c].append(run_shuffle(c, args.rows))
    best = {c: min(ts) for c, ts in times.items()}
    speedup = best[levels[0]] / best[levels[1]]
    print(json.dumps({
        "metric": f"platform_ceiling_{args.kind}",
        "levels": levels,
        "best_secs": {str(c): best[c] for c in levels},
        "all_secs": {str(c): times[c] for c in levels},
        "speedup": round(speedup, 3),
        "ceiling_efficiency": round(speedup / 4.0, 3),
    }))


if __name__ == "__main__":
    main()
