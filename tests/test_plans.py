"""Plan-quality regression gates: the physical plans must keep the
properties PLANS.md documents. These assert plan SHAPE (which join
strategies appear), not timings -- cheap and stable across runs."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_asof_join_plan_has_no_join_operator(spark):
    """The as-of join compiles to union + window -- ZERO join nodes
    (the naive formulation plans a BroadcastNestedLoopJoin)."""
    from structured_data_entity_extraction_spark.ops import temporal

    base = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(1, 1, base)], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, base, 1.0)], "user_id long, ts timestamp, value double"
    )
    p = _plan(temporal.asof_join(left, right))
    assert "Join" not in p
    assert "Window" in p


def test_interval_join_plan_is_keyed_not_nested_loop(spark):
    """The range join must plan a keyed equi-join (hash/broadcast-hash),
    never BroadcastNestedLoopJoin -- the whole point of the bucket
    explode."""
    from structured_data_entity_extraction_spark.ops import temporal

    base = dt.datetime(2024, 1, 1)
    points = spark.createDataFrame(
        [(1, 1, base)], "event_id long, user_id long, ts timestamp"
    )
    intervals = spark.createDataFrame(
        [(1, 9, base, base + dt.timedelta(minutes=5))],
        "user_id long, interval_id long, start timestamp, end timestamp",
    )
    p = _plan(temporal.interval_join(points, intervals))
    assert "NestedLoopJoin" not in p and "CartesianProduct" not in p
    assert "Join" in p  # it IS a join -- just a keyed one


def test_top_orders_plan_uses_take_ordered(spark):
    """Top-k must be TakeOrderedAndProject (per-partition heap), not a
    single-partition global window sort."""
    import __spark_entry__ as entry

    p = _plan(entry.q_top_orders_by_lines(spark, SF))
    assert "TakeOrderedAndProject" in p


def test_decontam_plan_broadcasts_benchmark(spark):
    """The benchmark shingle side must broadcast -- no shuffle of the
    corpus on content, no nested-loop join."""
    import __spark_entry__ as entry

    p = _plan(entry.q_decontam_report(spark, SF))
    assert "NestedLoopJoin" not in p
    assert "BroadcastHashJoin" in p


def test_repetition_signals_plan_has_zero_exchange(spark):
    """VERDICT r3 #3 'done' criterion: the top-token mode is computed
    per-row (sorted-array max-run fold), so the whole operator is one
    narrow projection -- NO Exchange anywhere in the plan. The old
    formulation shuffled the corpus's per-doc-distinct vocabulary."""
    from structured_data_entity_extraction_spark.ops import textstats

    df = spark.createDataFrame(
        [(1, "a b b a"), (2, "x x x")], "doc_id long, text string"
    )
    p = _plan(textstats.repetition_signals(df))
    assert "Exchange" not in p
    assert "Join" not in p


def test_link_mentions_plan_has_no_pyspark_ml(spark):
    """VERDICT r2 #1 'done' criterion: the LSH link stage is native --
    the plan contains no pyspark.ml fit/transform artifacts (those
    show up as extra Python UDF nodes beyond the single extraction
    pUDF)."""
    from structured_data_entity_extraction_spark import codekg
    from structured_data_entity_extraction_spark.fixtures import repos_src_rows
    from structured_data_entity_extraction_spark.schemas import REPOS_SRC

    rows = repos_src_rows(60, seed=7)
    df = spark.createDataFrame(
        [(r["repo"], r["path"], r["commit"], r["lang"], r["content"]) for r in rows],
        REPOS_SRC,
    )
    mentions = codekg.extract_code_mentions(df)
    cands = codekg.link_mentions(mentions, codekg.code_alias_dim(spark), use_lsh=True)
    p = _plan(cands)
    # the ONLY Python boundary is the extraction pUDF (it reprints once
    # per consumer subtree at PLAN level; the pipeline persists it so it
    # runs once). The md5/banding LSH itself adds ZERO Python nodes --
    # the retired ml variant carried its own tokenizer/hash UDFs.
    for line in p.splitlines():
        if "EvalPython" in line:
            assert "extract_code_udf" in line, line
    assert "BatchEvalPython" not in p  # no row-at-a-time UDF ever


def test_simhash_candidates_plan_is_one_join(spark):
    """r5 Manku block-permute 'done' criterion: candidate generation is
    ONE equi-join on a single packed long key -- not the old 4-branch
    band-join union (whose per-branch 16-bit keys were the quadratic
    hazard). Exactly one join node, zero Union nodes."""
    from structured_data_entity_extraction_spark.ops import dedup

    h = spark.createDataFrame([(1, 7), (2, 9)], "doc_id long, sim long")
    p = _plan(dedup.simhash_candidates(h, max_hamming=3))
    join_lines = [ln for ln in p.splitlines() if "Join" in ln]
    assert len(join_lines) == 1, join_lines
    assert "Union" not in p
    assert "NestedLoopJoin" not in p and "CartesianProduct" not in p


def test_build_triples_dedup_reuses_write_clustering(spark):
    """r5 verdict #1: ONE exchange -- the explicit repartition on the
    write-partition columns plus the key-derived salt (repo_bucket,
    lang, _ws) -- serves BOTH the triple dedup and the final
    partitioned-write clustering. The dedup aggregate keeps the
    repartition columns in its key set, so HashPartitioning on the
    subset satisfies its clustered distribution and Catalyst must not
    plan a second ENSURE_REQUIREMENTS exchange on the full dedup key.
    The salt lifts the bucket_count x |langs| (~384) parallelism cap a
    bare (bucket, lang) key would impose at cluster scale, while the
    write still sees at most write_salt files per hive partition."""
    from structured_data_entity_extraction_spark import codekg

    cand = spark.createDataFrame(
        [("d1", "s1", "import", "numpy", "r1", 3, "python", 0.9)],
        "doc_id string, content_sha string, field string, value string, "
        "repo string, repo_bucket int, lang string, score double",
    )
    nodes = spark.createDataFrame([("numpy", "numpy")], "surface string, canonical string")
    p = _plan(codekg.build_triples(cand, nodes))
    assert "REPARTITION_BY_COL" in p
    assert "_ws" in p  # the salt is a materialized column, in the exchange
    # the dedup key columns never appear in any exchange's partitioning
    assert not any(
        "Exchange" in ln and "_doc_id_b" in ln for ln in p.splitlines()
    ), p
    # exactly the intended shuffles -- the salted repartition per union
    # branch plus doc_dim's map-side-combined per-doc aggregate; the
    # salted dedup aggregate must NOT have re-introduced its own
    # ENSURE_REQUIREMENTS exchange on top of the REPARTITION_BY_COL one
    shuffles = [ln for ln in p.splitlines() if "Exchange hashpartitioning" in ln]
    assert len(shuffles) == 3, p
    assert sum("ENSURE_REQUIREMENTS" in ln for ln in shuffles) == 1, p


def test_simhash_popcount_filter_runs_before_pair_distinct(spark):
    """r5 verdict finding #2: the popcount filter is row-local, so it
    must run BEFORE the pair-dedup distinct -- the distinct's exchange
    then carries only true pairs (each duplicated up to C(6,3)=20x by
    multi-combo agreement) instead of the full candidate set. In the
    printed tree children are below parents, so the bit_count filter
    line must appear AFTER the first Exchange line (the distinct's)."""
    from structured_data_entity_extraction_spark.ops import dedup

    h = spark.createDataFrame([(1, 7), (2, 9)], "doc_id long, sim long")
    p = _plan(dedup.simhash_candidates(h, max_hamming=3))
    lines = p.splitlines()
    # the condition may survive as a Filter node or be pushed into the
    # join condition -- either way it must sit below the distinct's shuffle
    filt = next(i for i, ln in enumerate(lines) if "bit_count" in ln)
    exch = next(i for i, ln in enumerate(lines) if "Exchange" in ln)
    assert filt > exch, p


def test_cooccurrence_exact_tail_plan_splits_branches(spark):
    """exact_tail routes over-cap docs into a separate join branch:
    the plan contains a Union of two keyed joins plus the anti/semi
    routing joins -- and still no nested loop anywhere."""
    from structured_data_entity_extraction_spark import codekg

    t = spark.createDataFrame(
        [("d", "imports", "x"), ("d", "imports", "y")],
        "doc_id string, pred string, obj string",
    )
    p = _plan(codekg.entity_cooccurrence(t, max_per_doc=8, exact_tail=True))
    assert "Union" in p
    assert "NestedLoopJoin" not in p and "CartesianProduct" not in p


def test_percentile_contract_plan_is_single_aggregate(spark):
    """The approx-percentile contract check is one groupBy: a single
    shuffle (the aggregation exchange), no join, no window."""
    from structured_data_entity_extraction_spark.ops import stats

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0)], "event_type string, value double"
    )
    p = _plan(stats.percentile_contract_check(df, "event_type", "value"))
    assert "Join" not in p and "Window" not in p
    assert p.count("Exchange") <= 2  # partial agg + final agg exchange
