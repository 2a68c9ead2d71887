"""End-to-end orchestration: the resumable, checkpointed KG pipeline
(north_rule) plus a spark-submit entry point.

    spark-submit --py-files structured_data_entity_extraction_spark.zip \\
        -m structured_data_entity_extraction_spark.pipeline \\
        --input <repos_src parquet> --output <warehouse root>

Stages commit in order (extract -> link -> canonize -> triples); a
killed run re-invoked with the same --output resumes after the last
committed stage (StageStore manifest gate). Skew from mega-repos is
handled by AQE skew-join splitting (session.py) plus the repo_bucket
partitioning of every materialized table.
"""

from __future__ import annotations

import argparse
import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import codekg
from .link import avaluo_records, dim_frames
from .materialize import StageStore, doc_sha_digest, doc_sha_pairs, sha_invariant_report
from .triples import records_to_triples


def length_gate(docs: DataFrame, min_chars: int = 50, text_col: str = "text") -> DataFrame:
    """S1 -- the reference's page gate: keep only pages whose stripped
    text exceeds ``min_chars`` (extractorAvaluos.py:18-29 keeps pages
    with >50 chars). JVM-side filter, pushes down to the scan."""
    return docs.filter(F.length(F.trim(F.coalesce(F.col(text_col), F.lit("")))) > min_chars)


def run_codekg_pipeline(
    spark: SparkSession,
    repos_src: DataFrame,
    out_root: str,
    run_id: str = "run0",
    bucket_count: int = 64,
    use_lsh: bool = True,
    alias_rows=None,
    iceberg_catalog: str | None = None,
) -> dict:
    """repos_src -> {mentions, candidates, edges, nodes, triples}
    checkpointed under out_root (the node/edge KG tables are
    first-class stages per the north rule); returns stage row counts +
    timings."""
    store = StageStore(out_root, run_id=run_id, iceberg_catalog=iceberg_catalog)
    metrics: dict = {"run_id": run_id, "stages": {}}

    # the per-row invariant baseline: (doc_id, sha256(content)) over the
    # raw input (BASELINE.json:input_hint). A stage may legitimately drop
    # zero-mention docs (explode on []), so the check is "subset with no
    # sha mismatch", with the cheap digest-equality fast path.
    input_pairs, input_digest = input_identity(repos_src)
    input_pairs = input_pairs.persist()
    metrics["input_sha_digest"] = input_digest
    # stamp the input identity into every stage manifest: resume only
    # proceeds when the warehouse was built from THIS input (run_stage
    # raises otherwise -- the silent-stale-resume guard)
    store.input_digest = input_digest
    store.input_docs = input_pairs.count()

    def timed(stage, build, partition_by=None):
        t0 = time.time()
        df = store.run_stage(spark, stage, build, partition_by)
        info = {
            "rows": store.manifest(stage)["rows"],
            "wall_s": round(time.time() - t0, 3),
            "resumed": store.last_resumed.get(stage, False),
        }
        if "content_sha" in df.columns:
            info.update(sha_invariant_report(df, input_pairs, input_digest))
            if not info["sha_invariant_ok"]:
                raise RuntimeError(
                    f"content sha256 invariant violated at stage {stage}: "
                    f"{info['bad_pairs']} (doc_id, content_sha) pairs not in input"
                )
        metrics["stages"][stage] = info
        return df

    alias_dim = codekg.code_alias_dim(spark, alias_rows)

    mentions = timed(
        "mentions",
        lambda: codekg.extract_code_mentions(repos_src, bucket_count),
        partition_by=["repo_bucket", "lang"],
    )
    # input-identity sidecar: the exact (doc_id, content_sha) set this
    # warehouse was built from -- append-only ingest joins new batches
    # against it (a zero-mention doc has no mentions row but IS input).
    # Written only AFTER run_stage has built-or-identity-validated the
    # first stage: writing earlier would let a refused run over a
    # DIFFERENT input poison a legacy (sidecar-less) warehouse's
    # identity set. Write-if-missing thereafter. Marker-bracketed so a
    # crash mid-sidecar surfaces as a refusing torn append instead of a
    # silent fallback to the weaker mentions-derived guard.
    if not store.has_input_pairs():
        store.begin_append(["_input_pairs"])
        store.write_input_pairs(input_pairs)
        store.end_append()
    candidates = timed(
        "candidates",
        lambda: codekg.link_mentions(mentions, alias_dim, use_lsh=use_lsh),
        partition_by=["repo_bucket", "lang"],
    )
    edges = timed("edges", lambda: codekg.link_edges(candidates, alias_dim))
    nodes = timed("nodes", lambda: codekg.canonicalize(candidates, alias_dim, edges))
    triples = timed(
        "triples",
        lambda: codekg.build_triples(candidates, nodes),
        partition_by=["repo_bucket", "lang"],
    )
    metrics["triples"] = metrics["stages"]["triples"]["rows"]
    input_pairs.unpersist()
    return metrics


def input_identity(repos_src: DataFrame):
    """(distinct (doc_id, content_sha) pairs, additive digest) of a raw
    repos_src frame; doc_id = sha256(repo\\0path\\0commit). The digest
    is an action (one aggregate collect)."""
    keyed = repos_src.select(
        F.sha2(
            F.concat_ws("\x00", F.col("repo"), F.col("path"), F.col("commit")), 256
        ).alias("doc_id"),
        F.sha2(F.coalesce(F.col("content"), F.lit("")), 256).alias("content_sha"),
    )
    return doc_sha_pairs(keyed), doc_sha_digest(keyed)


def ingest_repos_batch(
    spark: SparkSession,
    store: StageStore,
    repos_src_batch: DataFrame,
    bucket_count: int = 64,
    use_lsh: bool = True,
    alias_rows=None,
) -> dict:
    """Land ONE batch of documents in a warehouse -- the streaming
    foreachBatch sink. An empty warehouse bootstraps the extract/link
    stages (mentions, candidates) plus the input-identity sidecar;
    a committed one takes the append-only path (``append_repos_batch``:
    overlap guard, additive digest, torn-append marker). Corpus-global
    stages (edges/nodes/triples) are NOT built per batch --
    canonicalization is corpus-global, so a batch "finalize"
    ``run_codekg_pipeline`` over the full input resumes
    mentions/candidates from these checkpoints and builds only the
    global stages.

    Idempotent under at-least-once delivery (``replay_ok``): a
    redelivered batch whose docs ALL already sit in the warehouse is a
    no-op, and a bootstrap crash ANYWHERE before the sidecar _SUCCESS
    self-heals: dispatch keys on the LAST bootstrap artifact (the
    input-identity sidecar), so a replay after a crash between the
    stage commits -- or in the invariant-report/sidecar window after
    the candidates commit, where several Spark jobs run outside any
    marker -- re-enters the bootstrap path, resumes the committed
    stages under the identity guard, and rebuilds the sidecar. Without
    the sidecar condition that window dispatched to the APPEND path,
    whose mentions-derived fallback guard drops zero-mention docs from
    the identity set (the crash-loop / digest-double-count ADVICE r5
    flagged). A legacy batch warehouse (no sidecar) streamed into with
    a DIFFERENT batch now refuses via the input-identity guard instead
    of silently degrading -- refusal is the guard working."""
    if (
        store.is_complete("mentions")
        and store.is_complete("candidates")
        and store.has_input_pairs()
    ):
        return append_repos_batch(
            spark,
            store,
            repos_src_batch,
            bucket_count=bucket_count,
            use_lsh=use_lsh,
            alias_rows=alias_rows,
            replay_ok=True,
        )
    pairs, digest = input_identity(repos_src_batch)
    pairs = pairs.persist()
    store.input_digest = digest
    store.input_docs = pairs.count()
    metrics: dict = {
        "run_id": store.run_id,
        "mode": "bootstrap",
        "new_docs": store.input_docs,
        "input_sha_digest": digest,
        "stages": {},
    }
    alias_dim = codekg.code_alias_dim(spark, alias_rows)
    mentions = store.run_stage(
        spark,
        "mentions",
        lambda: codekg.extract_code_mentions(repos_src_batch, bucket_count),
        ["repo_bucket", "lang"],
    )
    candidates = store.run_stage(
        spark,
        "candidates",
        lambda: codekg.link_mentions(mentions, alias_dim, use_lsh=use_lsh),
        ["repo_bucket", "lang"],
    )
    for stage, df in (("mentions", mentions), ("candidates", candidates)):
        rep = sha_invariant_report(df, pairs, digest)
        if not rep["sha_invariant_ok"]:
            raise RuntimeError(
                f"content sha256 invariant violated at stage {stage}: "
                f"{rep['bad_pairs']} (doc_id, content_sha) pairs not in input"
            )
        metrics["stages"][stage] = {
            "rows": store.manifest(stage)["rows"],
            **rep,
        }
    # sidecar LAST: run_stage has now either built the stages from this
    # batch or resumed them under the identity guard, so the sidecar
    # can never describe an input the warehouse does not hold. The
    # whole post-candidates window (invariant-report jobs + this
    # write) is crash-safe WITHOUT a wider marker because the stream
    # dispatch keys on the sidecar itself: no _SUCCESS -> the
    # redelivered batch re-enters bootstrap and self-heals. The marker
    # around the write additionally catches a torn multi-file sidecar
    # on the batch (run_codekg_pipeline) path, which has no redelivery.
    store.begin_append(["_input_pairs"])
    store.write_input_pairs(pairs)
    store.end_append()
    pairs.unpersist()
    return metrics


def append_repos_batch(
    spark: SparkSession,
    store: StageStore,
    repos_src_new: DataFrame,
    bucket_count: int = 64,
    use_lsh: bool = True,
    alias_rows=None,
    replay_ok: bool = False,
) -> dict:
    """Append ONE batch of new documents to a committed warehouse --
    the shared core of incremental batch ingest and the streaming
    foreachBatch sink. Extracts + links ONLY the batch, appends to the
    mentions/candidates stages inside one torn-append marker window,
    extends the input-identity sidecar, folds the additive digest into
    the manifests, and invalidates the corpus-global stages
    (edges/nodes/triples) whose old checkpoints describe the
    pre-append corpus. Rebuilding them is the caller's choice: the
    incremental CLI rebuilds immediately; the streaming sink leaves
    them invalidated so a batch "finalize" run over the union resumes
    mentions/candidates and rebuilds only the global stages.

    Overlap guard: new doc_ids are checked against the warehouse's
    input-identity sidecar (every doc ever ingested, including
    zero-mention docs); legacy warehouses without the sidecar fall
    back to mentions-derived ids."""
    for st in ("mentions", "candidates"):
        if not store.is_complete(st):
            raise RuntimeError(
                f"incremental append requires a committed '{st}' stage; "
                "run the full pipeline first"
            )
    store.check_no_pending()
    old_m = store.manifest("mentions")
    old_digest, old_docs = old_m.get("input_sha_digest"), old_m.get("input_docs")
    if old_digest is None:
        raise RuntimeError(
            "warehouse predates input-identity manifests; re-run the full "
            "pipeline once to stamp them before appending"
        )

    new_pairs, new_digest = input_identity(repos_src_new)
    new_pairs = new_pairs.persist()
    n_new = new_pairs.count()
    if store.has_input_pairs():
        existing = store.read_input_pairs(spark).select("doc_id", "content_sha").distinct()
    else:
        existing = store.read(spark, "mentions").select("doc_id", "content_sha").distinct()
    n_overlap = new_pairs.join(
        existing.select("doc_id").distinct(), "doc_id", "left_semi"
    ).count()
    if n_overlap:
        # replay-noop requires the EXACT (doc_id, content_sha) pair set:
        # a redelivered batch with the same ids but different content is
        # a content change, never a replay -- the sidecar carries
        # content_sha precisely to make this test exact
        n_exact = new_pairs.join(
            existing, ["doc_id", "content_sha"], "left_semi"
        ).count()
        if replay_ok and n_overlap == n_new and n_exact == n_new:
            # at-least-once replay: the warehouse committed this whole
            # batch but the caller's own checkpoint (e.g. the streaming
            # offset log) did not -- re-delivery must be a no-op, not a
            # crash loop. Partial overlap is never a replay and still
            # raises below.
            new_pairs.unpersist()
            return {
                "run_id": store.run_id,
                "mode": "replay_noop",
                "new_docs": 0,
                "replayed_docs": n_new,
                "stages": {},
            }
        if n_exact != n_overlap:
            raise RuntimeError(
                f"{n_overlap - n_exact} of the {n_new} new docs share a "
                "doc_id with the warehouse but carry DIFFERENT content "
                "(content_sha mismatch): update-in-place is not append; "
                "re-extracting changed documents needs a fresh warehouse"
            )
        raise RuntimeError(
            f"{n_overlap} of the {n_new} new docs already exist in the "
            "warehouse: incremental ingest is append-only; re-extracting "
            "changed documents needs a fresh warehouse (or delete + full run)"
        )
    store.input_digest = str(int(old_digest) + int(new_digest))
    store.input_docs = int(old_docs) + n_new

    metrics: dict = {
        "run_id": store.run_id,
        "mode": "incremental",
        "new_docs": n_new,
        "input_sha_digest": store.input_digest,
        "stages": {},
    }
    alias_dim = codekg.code_alias_dim(spark, alias_rows)
    # the new-batch frames feed both the append write and the
    # downstream link/invariant -- persist so the extraction pUDF runs
    # once per batch
    mentions_new = codekg.extract_code_mentions(repos_src_new, bucket_count).persist()
    candidates_new = codekg.link_mentions(
        mentions_new, alias_dim, use_lsh=use_lsh
    ).persist()
    store.begin_append(["mentions", "candidates", "_input_pairs"])
    for stage, df in (("mentions", mentions_new), ("candidates", candidates_new)):
        t0 = time.time()
        store.append(df, stage, ["repo_bucket", "lang"])
        rep = sha_invariant_report(df, new_pairs, new_digest)
        if not rep["sha_invariant_ok"]:
            raise RuntimeError(
                f"content sha256 invariant violated in appended batch at "
                f"stage {stage}: {rep['bad_pairs']} pairs not in new input"
            )
        metrics["stages"][stage] = {
            "appended_rows": store.manifest(stage)["rows"]
            - store.manifest(stage)["appended_from_rows"],
            "total_rows": store.manifest(stage)["rows"],
            "wall_s": round(time.time() - t0, 3),
            **rep,
        }
    if store.has_input_pairs():
        store.append_input_pairs(new_pairs)
    else:
        # legacy warehouse: seed the sidecar with old (from mentions,
        # best available) + new, so the NEXT append gets the exact guard
        store.write_input_pairs(
            store.read(spark, "mentions")
            .select("doc_id", "content_sha")
            .distinct()
            .unionByName(new_pairs)
            .distinct()
        )
    # the global stages describe the pre-append corpus; drop their
    # checkpoints inside the marker window so a crash here still
    # surfaces as a torn append rather than stale globals
    for st in ("edges", "nodes", "triples"):
        store.invalidate(st)
    store.end_append()
    for df in (mentions_new, candidates_new, new_pairs):
        df.unpersist()
    return metrics


def run_codekg_pipeline_incremental(
    spark: SparkSession,
    repos_src_new: DataFrame,
    out_root: str,
    run_id: str = "inc0",
    bucket_count: int = 64,
    use_lsh: bool = True,
    alias_rows=None,
    iceberg_catalog: str | None = None,
) -> dict:
    """Append-only incremental ingest (the 10^12-file reality is an
    append-only crawl): extract + link ONLY the new documents -- the
    Arrow-pUDF extraction is the dominant pipeline cost and is
    per-document independent, as is dictionary/LSH linking (value-level
    against the dim, no cross-document dependencies) -- append them to
    the committed mentions/candidates stages, then rebuild the global
    stages (edges/nodes/triples) from the union: canonicalization is
    corpus-global by definition (a new surface can re-canonicalize old
    triples through a new alias chain), so exact semantics require the
    downstream rebuild; it is the cheap part next to re-extracting.

    Input-identity bookkeeping is EXACT, not recomputed: the sha
    sum-fold digest is additive over disjoint doc sets, so the
    combined identity = old manifest digest + new batch digest. A
    subsequent FULL run over old+new input therefore resumes every
    stage cleanly, and the run_stage guard keeps refusing any other
    input. New docs must be genuinely new (doc_id overlap with the
    warehouse's input-identity sidecar raises -- update-in-place is
    not append)."""
    store = StageStore(out_root, run_id=run_id, iceberg_catalog=iceberg_catalog)
    metrics = append_repos_batch(
        spark,
        store,
        repos_src_new,
        bucket_count=bucket_count,
        use_lsh=use_lsh,
        alias_rows=alias_rows,
    )

    # global stages rebuild from the union (their old manifests carry
    # the pre-append input identity, which run_stage would refuse)
    alias_dim = codekg.code_alias_dim(spark, alias_rows)
    candidates_all = store.read(spark, "candidates")

    def timed(stage, build, partition_by=None):
        t0 = time.time()
        df = store.run_stage(spark, stage, build, partition_by)
        metrics["stages"][stage] = {
            "rows": store.manifest(stage)["rows"],
            "wall_s": round(time.time() - t0, 3),
            "rebuilt": True,
        }
        return df

    edges = timed("edges", lambda: codekg.link_edges(candidates_all, alias_dim))
    nodes = timed("nodes", lambda: codekg.canonicalize(candidates_all, alias_dim, edges))
    timed(
        "triples",
        lambda: codekg.build_triples(candidates_all, nodes),
        partition_by=["repo_bucket", "lang"],
    )
    metrics["triples"] = metrics["stages"]["triples"]["rows"]
    return metrics


def run_avaluo_pipeline(
    spark: SparkSession,
    docs: DataFrame,
    out_root: str,
    run_id: str = "run0",
    min_page_chars: int | None = None,
    iceberg_catalog: str | None = None,
) -> dict:
    """docs(doc_id, text) -> 13-field records + triples, checkpointed.
    ``min_page_chars`` wires the reference's S1 page gate (>50 chars,
    extractorAvaluos.py:18-29); None preserves every row. Both stage
    checkpoints carry content_sha and are verified against the (gated)
    input's per-document sha set."""
    store = StageStore(out_root, run_id=run_id, iceberg_catalog=iceberg_catalog)
    dims = dim_frames(spark)
    if min_page_chars is not None:
        docs = length_gate(docs, min_page_chars)
    input_keyed = docs.select(
        "doc_id",
        F.sha2(F.coalesce(F.col("text"), F.lit("")), 256).alias("content_sha"),
    )
    input_pairs = doc_sha_pairs(input_keyed).persist()
    input_digest = doc_sha_digest(input_keyed)
    store.input_digest = input_digest
    store.input_docs = input_pairs.count()
    out: dict = {"input_sha_digest": input_digest, "stages": {}}
    records = store.run_stage(
        spark, "records", lambda: avaluo_records(docs, dims)
    )
    triples = store.run_stage(
        spark, "triples", lambda: records_to_triples(records)
    )
    for stage, df in (("records", records), ("triples", triples)):
        rep = sha_invariant_report(df, input_pairs, input_digest)
        out["stages"][stage] = {"rows": store.manifest(stage)["rows"], **rep}
        if not rep["sha_invariant_ok"]:
            raise RuntimeError(
                f"content sha256 invariant violated at stage {stage}: "
                f"{rep['bad_pairs']} (doc_id, content_sha) pairs not in input"
            )
    input_pairs.unpersist()
    out["records"] = out["stages"]["records"]["rows"]
    out["triples"] = out["stages"]["triples"]["rows"]
    return out


def main(argv=None) -> None:
    from .session import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--input", default=None,
        help="input parquet path (required except with --compact)",
    )
    ap.add_argument("--output", required=True, help="warehouse root")
    ap.add_argument("--run-id", default="run0")
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--no-lsh", action="store_true")
    ap.add_argument(
        "--append", action="store_true",
        help="codekg: treat --input as NEW docs to append to an existing "
        "warehouse (extract+link only the batch, rebuild global stages)",
    )
    ap.add_argument(
        "--pipeline", choices=["codekg", "avaluo"], default="codekg",
        help="codekg: repos_src(repo,path,commit,lang,content); "
        "avaluo: docs(doc_id,text) reference-fidelity extraction",
    )
    ap.add_argument(
        "--min-page-chars", type=int, default=None,
        help="avaluo: wire the S1 page gate (reference uses 50)",
    )
    ap.add_argument(
        "--iceberg-catalog", default=None,
        help="route stage data through Iceberg writeTo on this catalog "
        "(catalog-present clusters only)",
    )
    ap.add_argument(
        "--stream", action="store_true",
        help="codekg: treat --input as a DIRECTORY watched by Structured "
        "Streaming (availableNow drain): each micro-batch of new parquet "
        "files lands in the warehouse via the bootstrap/append ingest "
        "path; finalize with a later plain run over the full input",
    )
    ap.add_argument(
        "--checkpoint", default=None,
        help="streaming checkpoint location (default <output>/_stream_ckpt)",
    )
    ap.add_argument(
        "--compact", default=None, metavar="STAGES",
        help="maintenance: compact the comma-separated stages (or 'all') "
        "of an existing --output warehouse into sized files and exit "
        "(verified read-equivalent; torn-compact marker on crash)",
    )
    ap.add_argument(
        "--target-file-mb", type=int, default=128,
        help="compaction target file size (MiB)",
    )
    args = ap.parse_args(argv)
    if args.input is None and not args.compact:
        ap.error("--input is required (except with --compact)")

    spark = get_spark(f"structured-data-entity-extraction-{args.pipeline}")
    t0 = time.time()
    if args.compact:
        from .materialize import StageStore

        store = StageStore(
            args.output, run_id=args.run_id, iceberg_catalog=args.iceberg_catalog
        )
        stages = (
            [
                st
                for st in ("mentions", "candidates", "edges", "nodes",
                           "triples", "records")
                if store.is_complete(st)
            ]
            if args.compact == "all"
            else args.compact.split(",")
        )
        metrics = {
            "mode": "compact",
            "stages": {
                st: store.compact(spark, st, target_file_mb=args.target_file_mb)
                for st in stages
            },
            "total_wall_s": round(time.time() - t0, 3),
        }
        print(json.dumps(metrics))
        return
    if args.stream:
        from .materialize import StageStore
        from .streaming import stream_repos_src

        ckpt = args.checkpoint or os.path.join(args.output, "_stream_ckpt")
        q = stream_repos_src(
            spark, args.input, args.output, ckpt,
            bucket_count=args.buckets, use_lsh=not args.no_lsh,
            run_id_prefix=args.run_id,
            iceberg_catalog=args.iceberg_catalog,
        )
        q.awaitTermination()
        store = StageStore(args.output)
        metrics = {
            "mode": "stream",
            "checkpoint": ckpt,
            "stages": {
                st: {"rows": store.manifest(st)["rows"]}
                for st in ("mentions", "candidates")
                if store.is_complete(st)
            },
        }
        metrics["total_wall_s"] = round(time.time() - t0, 3)
        print(json.dumps(metrics))
        return
    if args.pipeline == "avaluo":
        docs = spark.read.parquet(args.input)
        metrics = run_avaluo_pipeline(
            spark, docs, args.output, run_id=args.run_id,
            min_page_chars=args.min_page_chars,
            iceberg_catalog=args.iceberg_catalog,
        )
    else:
        repos_src = spark.read.parquet(args.input)
        runner = run_codekg_pipeline_incremental if args.append else run_codekg_pipeline
        metrics = runner(
            spark,
            repos_src,
            args.output,
            run_id=args.run_id,
            bucket_count=args.buckets,
            use_lsh=not args.no_lsh,
            iceberg_catalog=args.iceberg_catalog,
        )
    metrics["total_wall_s"] = round(time.time() - t0, 3)
    metrics["triples_per_sec"] = (
        round(metrics["triples"] / metrics["total_wall_s"], 1)
        if metrics["total_wall_s"]
        else None
    )
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
