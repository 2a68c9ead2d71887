"""SparkSession factory with the engine's scale-oriented defaults.

Tuned for the target execution model (SURVEY.md §4): AQE on (runtime
re-plan + skew-join splitting for mega-repos), Arrow on (every UDF in
this engine is a vectorized pandas UDF), explicit shuffle-partition
sizing. On a real cluster the same confs ship via spark-submit --conf;
`local[N]` here is the sandbox stand-in for N executors.

Shuffle-partition sizing: size to DATA, not cores — target ~100-250k
rows (or ~128 MB) per reduce task. An undersized count makes reduce
hash-aggregations spill (measured: the 17M-row triple dedup was FLAT
from 2 to 8 cores at 8 partitions, 0.81-efficient at 64); an oversized
count is harmless because AQE coalesces it back down, but AQE can
never SPLIT an undersized aggregation.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONF = {
    # AQE: runtime coalescing + skew-join handling (north_rule)
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow transfer for pandas UDFs; bounded batches so huge `content`
    # blobs can't blow executor memory (100 TB corpora have fat rows)
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "2048",
    # broadcast threshold comfortably above our dim tables (~2.5k rows)
    "spark.sql.autoBroadcastJoinThreshold": str(32 * 1024 * 1024),
    # parquet scans: vectorized reader on by default; keep splits sane
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.sql.session.timeZone": "UTC",
    "spark.ui.enabled": "false",
    # local-mode sizing: this ONE JVM hosts the driver plus all N task
    # slots' execution memory plus every operator cache, so the old 8g
    # default left ~256 MB/slot at local[32] and GC-thrashed the
    # larger-SF bench (measured: the 10x-corpus artifact total fell
    # 30.9 -> 26.1 s and its median-over-best 1.18 -> 1.07 from this
    # alone; sf0.1 is unaffected). 20g is ~15% of the 128 GiB sandbox;
    # still env-overridable. On a real cluster executor memory is per
    # node and set via spark-submit, not this local default.
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "20g"),
    # shuffle/spill scratch: tmpfs when available (local-mode shuffle
    # writes otherwise bottleneck on the VM's shared disk)
    "spark.local.dir": os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/tmp"),
}


def get_spark(
    app_name: str = "structured-data-entity-extraction-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(DEFAULT_CONF)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions or cpus)
    conf.update(extra_conf or {})
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
