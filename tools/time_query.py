"""Time registered queries in bench methodology (count action, fresh
cache_scope per repeat, best-of) without touching the frozen bench.py.
Usage: python tools/time_query.py <sf_dir> <repeats> <name> [name...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs("/dev/shm/spark-scratch", exist_ok=True)
os.environ.setdefault("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-scratch")

import __spark_entry__ as entry
from structured_data_entity_extraction_spark.ops.cache import cache_scope
from structured_data_entity_extraction_spark.session import get_spark

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    sf_dir = sys.argv[1]
    repeats = int(sys.argv[2])
    names = sys.argv[3:]
    spark = get_spark("time-query", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    out = {}
    for name in names:
        samples = []
        rows = None
        for _ in range(repeats):
            with cache_scope():
                t0 = time.time()
                rows = qs[name](spark, sf_dir).count()
                samples.append(round(time.time() - t0, 3))
        out[name] = {"best": min(samples), "samples": samples, "rows": rows}
        print(name, out[name], flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
