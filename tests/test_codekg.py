"""North-rule pipeline tests: planted-mention recall, CC correctness vs
union-find, stage resume, per-partition lineage reconciliation, sha256
invariant (SURVEY.md §5 items 2/4/5)."""

from __future__ import annotations

import hashlib
import json
import os

import pytest
from pyspark.sql import functions as F

from structured_data_entity_extraction_spark import codekg
from structured_data_entity_extraction_spark.cc import connected_components
from structured_data_entity_extraction_spark.fixtures import repos_src_rows
from structured_data_entity_extraction_spark.materialize import StageStore
from structured_data_entity_extraction_spark.pipeline import run_codekg_pipeline
from structured_data_entity_extraction_spark.schemas import REPOS_SRC


@pytest.fixture(scope="module")
def rows():
    return repos_src_rows(300, seed=11)


@pytest.fixture(scope="module")
def repos_df(spark, rows):
    return spark.createDataFrame(
        [(r["repo"], r["path"], r["commit"], r["lang"], r["content"]) for r in rows],
        REPOS_SRC,
    )


def test_planted_mention_recall(spark, repos_df, rows):
    """Every planted import/def/class/config value must be extracted
    (recall=1.0 on the seeded corpus)."""
    mentions = codekg.extract_code_mentions(repos_df)
    got = {
        (r["path"], r["field"], r["value"])
        for r in mentions.select("path", "field", "value").collect()
    }
    missing = []
    for row in rows:
        for field, value in row["planted"]:
            if (row["path"], field, value) not in got:
                missing.append((row["path"], field, value))
    assert not missing, f"{len(missing)} planted mentions missed: {missing[:5]}"


def test_doc_id_and_sha_invariant(spark, repos_df, rows):
    mentions = codekg.extract_code_mentions(repos_df)
    got = {
        r["path"]: (r["doc_id"], r["content_sha"])
        for r in mentions.select("path", "doc_id", "content_sha").distinct().collect()
    }
    for row in rows[:50]:
        want_doc = hashlib.sha256(
            f"{row['repo']}\x00{row['path']}\x00{row['commit']}".encode()
        ).hexdigest()
        want_sha = hashlib.sha256(row["content"].encode()).hexdigest()
        assert got[row["path"]] == (want_doc, want_sha)


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_cc_matches_union_find(spark):
    """Property check: CC labels equal a driver-side union-find on a
    random-ish alias graph with chains, stars and singleton pairs --
    on ALL FOUR strategies (driver, min-label, star, auto-fallback)."""
    import random

    rng = random.Random(3)
    nodes = [f"n{i:03d}" for i in range(120)]
    edges = []
    for _ in range(150):
        a, b = rng.sample(nodes, 2)
        edges.append((a, b))
    # a long chain to force >2 iterations + a self loop (singleton)
    for i in range(20):
        edges.append((f"c{i:02d}", f"c{i+1:02d}"))
    edges.append(("loner", "loner"))
    df = spark.createDataFrame(edges, ["src", "dst"])
    want = _union_find(edges)
    # driver fast path (small graph)
    got_fast = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert got_fast == want
    # distributed min-label path (forced; 21-chain needs ~21 rounds)
    got_ml = {
        r["node"]: r["component"]
        for r in connected_components(df, small_threshold=0, method="minlabel", max_iter=30).collect()
    }
    assert got_ml == want
    # distributed two-phase star path (forced)
    stats: dict = {}
    got_star = {
        r["node"]: r["component"]
        for r in connected_components(df, small_threshold=0, method="star", stats=stats).collect()
    }
    assert got_star == want
    assert stats["method"] == "star" and stats["rounds"] <= 8
    # auto with a tiny min-label budget: must detect the deep chain and
    # fall back to star, still exact
    stats2: dict = {}
    got_auto = {
        r["node"]: r["component"]
        for r in connected_components(
            df, small_threshold=0, method="auto", minlabel_rounds=3, stats=stats2
        ).collect()
    }
    assert got_auto == want and stats2["method"] == "star"


def test_cc_star_beats_minlabel_on_deep_chain(spark):
    """A planted 200-node chain: min-label needs O(diameter) rounds
    (raises at max_iter=20); the star algorithm converges in O(log^2 n)
    -- the 100-TB-scale argument for deep near-dup link chains."""
    import pytest as _pytest

    edges = [(f"v{i:04d}", f"v{i+1:04d}") for i in range(200)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, small_threshold=0, method="minlabel", max_iter=20)
    stats: dict = {}
    got = {
        r["node"]: r["component"]
        for r in connected_components(df, small_threshold=0, method="star", stats=stats).collect()
    }
    assert got == _union_find(edges)
    assert stats["rounds"] <= 12  # vs 200 rounds for min-label


def test_pipeline_resume_and_lineage(spark, repos_df, tmp_path):
    out = str(tmp_path / "warehouse")
    m1 = run_codekg_pipeline(spark, repos_df, out, run_id="r1", use_lsh=False)
    assert m1["triples"] > 0
    # lineage row counts reconcile with manifest totals per stage
    store = StageStore(out, run_id="r1")
    for stage in ("mentions", "candidates", "edges", "nodes", "triples"):
        lin = store.lineage(spark, stage)
        total = lin.agg(F.sum("rows")).collect()[0][0]
        assert total == store.manifest(stage)["rows"]

    # kill-after-stage simulation: drop 'triples' commit, resume under a
    # new run_id -> earlier stages are skipped (resumed), output identical
    t1 = spark.read.parquet(os.path.join(out, "triples", "data"))
    rows_before = sorted(
        (r["subj"], r["pred"], r["obj"]) for r in t1.select("subj", "pred", "obj").collect()
    )
    os.remove(os.path.join(out, "triples", "_MANIFEST.json"))
    m2 = run_codekg_pipeline(spark, repos_df, out, run_id="r2", use_lsh=False)
    assert m2["stages"]["mentions"]["resumed"] is True
    assert m2["stages"]["triples"]["resumed"] is False
    t2 = spark.read.parquet(os.path.join(out, "triples", "data"))
    rows_after = sorted(
        (r["subj"], r["pred"], r["obj"]) for r in t2.select("subj", "pred", "obj").collect()
    )
    assert rows_before == rows_after


def test_resume_refuses_changed_input(spark, repos_df, tmp_path):
    """Silent-stale-resume guard (r4): a warehouse built from input A,
    re-run over A + appended docs, must RAISE -- the per-stage sha
    invariant alone cannot catch this (stale stages are a legitimate
    SUBSET of the grown input), so an append would otherwise resume
    checkpoints that silently miss every new document. Identical input
    keeps resuming cleanly."""
    out = str(tmp_path / "w")
    m1 = run_codekg_pipeline(spark, repos_df, out, run_id="r1", use_lsh=False)
    assert m1["triples"] > 0
    # same input -> clean resume
    m2 = run_codekg_pipeline(spark, repos_df, out, run_id="r2", use_lsh=False)
    assert all(s["resumed"] for s in m2["stages"].values())
    # appended input -> refuse
    extra = spark.createDataFrame(
        [("org9/new", "src/new.py", "f" * 40, "python", "import numpy")], REPOS_SRC
    )
    grown = repos_df.unionByName(extra)
    with pytest.raises(RuntimeError, match="different input"):
        run_codekg_pipeline(spark, grown, out, run_id="r3", use_lsh=False)


def test_incremental_append_matches_full_rebuild(spark, tmp_path):
    """run_codekg_pipeline_incremental: extract+link only the new batch,
    append, rebuild global stages -- final triples must be IDENTICAL to
    a from-scratch run over the full corpus (incl. the LSH link stage:
    linking is value-level with no cross-doc deps, canonicalization is
    rebuilt globally). The additive input digest must let a subsequent
    FULL run over old+new resume every stage; re-appending existing
    docs must raise."""
    from structured_data_entity_extraction_spark.pipeline import (
        run_codekg_pipeline_incremental,
    )

    rows = repos_src_rows(200, seed=23)
    mk = lambda rs: spark.createDataFrame(
        [(r["repo"], r["path"], r["commit"], r["lang"], r["content"]) for r in rs],
        REPOS_SRC,
    )
    df_a, df_b, df_ab = mk(rows[:160]), mk(rows[160:]), mk(rows)
    inc_root, full_root = str(tmp_path / "inc"), str(tmp_path / "full")

    run_codekg_pipeline(spark, df_a, inc_root, run_id="base", use_lsh=True)
    m_inc = run_codekg_pipeline_incremental(
        spark, df_b, inc_root, run_id="inc", use_lsh=True
    )
    assert m_inc["new_docs"] == 40
    assert m_inc["stages"]["mentions"]["appended_rows"] > 0
    assert m_inc["stages"]["triples"]["rebuilt"] is True

    m_full = run_codekg_pipeline(spark, df_ab, full_root, run_id="f", use_lsh=True)
    cols = ["subj", "pred", "obj", "doc_id", "repo", "lang", "content_sha", "conf"]
    got = sorted(
        map(tuple, spark.read.parquet(f"{inc_root}/triples/data").select(*cols).collect())
    )
    want = sorted(
        map(tuple, spark.read.parquet(f"{full_root}/triples/data").select(*cols).collect())
    )
    assert got == want and m_inc["triples"] == m_full["triples"]

    # additive digest: a FULL run over old+new now resumes everything
    m_resume = run_codekg_pipeline(spark, df_ab, inc_root, run_id="r", use_lsh=True)
    assert all(s["resumed"] for s in m_resume["stages"].values())

    # append-only: re-sending already-ingested docs raises
    with pytest.raises(RuntimeError, match="append-only"):
        run_codekg_pipeline_incremental(spark, df_b, inc_root, run_id="dup")


def test_append_guard_catches_zero_mention_docs(spark, tmp_path):
    """The overlap guard joins the input-identity SIDECAR, not extracted
    mentions: a doc whose content yields zero mentions (comment-only)
    has no mentions row, but re-appending it must still be refused --
    otherwise the additive digest double-counts it and a later full run
    over the true union spuriously refuses to resume."""
    from structured_data_entity_extraction_spark.pipeline import (
        run_codekg_pipeline_incremental,
    )

    rows = repos_src_rows(30, seed=31)
    base = spark.createDataFrame(
        [(r["repo"], r["path"], r["commit"], r["lang"], r["content"]) for r in rows],
        REPOS_SRC,
    )
    # empty python file: the mention explode on [] drops the doc
    ghost = ("orgz/ghost", "notes/empty.py", "a" * 40, "python", "")
    ghost_df = spark.createDataFrame([ghost], REPOS_SRC)
    root = str(tmp_path / "w")
    run_codekg_pipeline(
        spark, base.unionByName(ghost_df), root, run_id="b", use_lsh=False
    )
    mentions = spark.read.parquet(f"{root}/mentions/data")
    from pyspark.sql import functions as F

    ghost_id = (
        ghost_df.select(
            F.sha2(F.concat_ws("\x00", "repo", "path", "commit"), 256).alias("d")
        ).collect()[0]["d"]
    )
    assert mentions.filter(F.col("doc_id") == ghost_id).count() == 0  # truly zero-mention
    with pytest.raises(RuntimeError, match="append-only"):
        run_codekg_pipeline_incremental(spark, ghost_df, root, run_id="dup")


def test_ingest_batch_replay_and_partial_bootstrap(spark, tmp_path):
    """At-least-once safety for the streaming sink (code-review r5):
    (a) a REPLAYED batch (warehouse committed it, streaming offset log
    did not) is a no-op, not a crash loop; (b) partial overlap still
    raises; (c) a bootstrap crash between the mentions and candidates
    commits self-heals on redelivery."""
    from structured_data_entity_extraction_spark.materialize import StageStore
    from structured_data_entity_extraction_spark.pipeline import ingest_repos_batch

    rows = repos_src_rows(60, seed=41)
    mk = lambda rs: spark.createDataFrame(
        [(r["repo"], r["path"], r["commit"], r["lang"], r["content"]) for r in rs],
        REPOS_SRC,
    )
    root = str(tmp_path / "w")
    store = StageStore(root, run_id="b0")
    m0 = ingest_repos_batch(spark, store, mk(rows[:40]))
    assert m0["mode"] == "bootstrap"
    m1 = ingest_repos_batch(spark, StageStore(root, run_id="b1"), mk(rows[40:]))
    assert m1["mode"] == "incremental" and m1["new_docs"] == 20
    digest_after = StageStore(root).manifest("mentions")["input_sha_digest"]

    # (a) full replay of batch 1 -> no-op, digest unchanged
    m_replay = ingest_repos_batch(spark, StageStore(root, run_id="b1r"), mk(rows[40:]))
    assert m_replay["mode"] == "replay_noop" and m_replay["replayed_docs"] == 20
    assert StageStore(root).manifest("mentions")["input_sha_digest"] == digest_after

    # (b) partial overlap (10 old + 10 genuinely new) is NOT a replay
    more = repos_src_rows(80, seed=41)[60:70]
    with pytest.raises(RuntimeError, match="append-only"):
        ingest_repos_batch(
            spark, StageStore(root, run_id="bad"), mk(rows[50:] + more)
        )

    # (c) partial bootstrap: candidates commit lost -> redelivery of the
    # SAME first batch resumes mentions and rebuilds candidates
    root2 = str(tmp_path / "w2")
    ingest_repos_batch(spark, StageStore(root2, run_id="c0"), mk(rows[:40]))
    import shutil

    shutil.rmtree(f"{root2}/candidates")
    import os as _os

    if _os.path.exists(f"{root2}/_input_pairs"):
        shutil.rmtree(f"{root2}/_input_pairs")  # crash before sidecar write
    m_heal = ingest_repos_batch(spark, StageStore(root2, run_id="c1"), mk(rows[:40]))
    assert m_heal["mode"] == "bootstrap"
    st2 = StageStore(root2)
    assert st2.is_complete("candidates") and st2.has_input_pairs()
    # and the healed warehouse accepts a fresh append
    m2 = ingest_repos_batch(spark, StageStore(root2, run_id="c2"), mk(rows[40:]))
    assert m2["mode"] == "incremental"


def test_full_run_refusal_does_not_poison_legacy_sidecar(spark, tmp_path):
    """Code-review r5: on a legacy (sidecar-less) warehouse, a refused
    run over a DIFFERENT input must not write that input's identity
    sidecar -- it would let already-ingested docs re-append as 'new'."""
    import shutil

    rows = repos_src_rows(30, seed=43)
    mk = lambda rs: spark.createDataFrame(
        [(r["repo"], r["path"], r["commit"], r["lang"], r["content"]) for r in rs],
        REPOS_SRC,
    )
    root = str(tmp_path / "w")
    run_codekg_pipeline(spark, mk(rows[:20]), root, run_id="b", use_lsh=False)
    shutil.rmtree(f"{root}/_input_pairs")  # legacy warehouse
    from structured_data_entity_extraction_spark.materialize import StageStore

    with pytest.raises(RuntimeError, match="different input"):
        run_codekg_pipeline(spark, mk(rows[20:]), root, run_id="x", use_lsh=False)
    assert not StageStore(root).has_input_pairs()  # NOT poisoned
    # the matching input re-seeds the sidecar on resume
    m = run_codekg_pipeline(spark, mk(rows[:20]), root, run_id="r", use_lsh=False)
    assert all(s["resumed"] for s in m["stages"].values())
    assert StageStore(root).has_input_pairs()


def test_torn_append_marker_blocks_resume(spark, tmp_path):
    """A crash between data append and manifest swap leaves the
    warehouse pending marker; every later resume/append must refuse
    with the recovery path instead of reading data that no longer
    matches its manifest."""
    import json as _json
    import os as _os

    from structured_data_entity_extraction_spark.materialize import StageStore
    from structured_data_entity_extraction_spark.pipeline import (
        run_codekg_pipeline_incremental,
    )

    rows = repos_src_rows(30, seed=32)
    mk = lambda rs: spark.createDataFrame(
        [(r["repo"], r["path"], r["commit"], r["lang"], r["content"]) for r in rs],
        REPOS_SRC,
    )
    root = str(tmp_path / "w")
    run_codekg_pipeline(spark, mk(rows[:20]), root, run_id="b", use_lsh=False)
    # simulate the torn state: marker present, no committed batch
    store = StageStore(root)
    with open(store.pending_path(), "w", encoding="utf-8") as fh:
        _json.dump(
            {"stages": ["mentions"], "run_id": "crashed", "started_at": "x"}, fh
        )
    with pytest.raises(RuntimeError, match="TORN APPEND"):
        run_codekg_pipeline(spark, mk(rows[:20]), root, run_id="r")
    with pytest.raises(RuntimeError, match="TORN APPEND"):
        run_codekg_pipeline_incremental(spark, mk(rows[20:]), root, run_id="i")
    _os.remove(store.pending_path())
    # clean again: resume works
    m = run_codekg_pipeline(spark, mk(rows[:20]), root, run_id="r2", use_lsh=False)
    assert all(s["resumed"] for s in m["stages"].values())


def test_compact_preserves_reads_and_guards(spark, tmp_path, monkeypatch):
    """StageStore.compact (r5 verdict #5): after N appends the stage
    holds many small batch files; compact must (a) drop the file count,
    (b) keep reads bit-identical, (c) keep the resume identity guard
    refusing changed input, and (d) surface a crash mid-swap as a
    refusing TORN APPEND (the kill -9 twin, simulated by failing the
    second directory rename)."""
    import os as _os

    from structured_data_entity_extraction_spark.materialize import StageStore
    from structured_data_entity_extraction_spark.pipeline import (
        run_codekg_pipeline_incremental,
    )

    rows = repos_src_rows(120, seed=77)
    mk = lambda rs: spark.createDataFrame(
        [(r["repo"], r["path"], r["commit"], r["lang"], r["content"]) for r in rs],
        REPOS_SRC,
    )
    root = str(tmp_path / "w")
    run_codekg_pipeline(spark, mk(rows[:60]), root, run_id="b", use_lsh=False)
    run_codekg_pipeline_incremental(spark, mk(rows[60:90]), root, run_id="i1", use_lsh=False)
    run_codekg_pipeline_incremental(spark, mk(rows[90:]), root, run_id="i2", use_lsh=False)

    def nfiles(stage):
        out = 0
        for r, _d, fs in _os.walk(_os.path.join(root, stage, "data")):
            out += sum(1 for f in fs if f.endswith(".parquet"))
        return out

    store = StageStore(root, run_id="c")
    cols = ["doc_id", "field", "value", "content_sha"]
    before = sorted(map(tuple, store.read(spark, "mentions").select(*cols).collect()))
    files_before = nfiles("mentions")
    rep = store.compact(spark, "mentions")
    assert rep["files_after"] < files_before
    assert nfiles("mentions") == rep["files_after"]
    after = sorted(map(tuple, store.read(spark, "mentions").select(*cols).collect()))
    assert before == after
    # manifest keeps rows + input identity: full run over the true union
    # still resumes, a grown input still refuses
    m = run_codekg_pipeline(spark, mk(rows), root, run_id="r", use_lsh=False)
    assert all(s["resumed"] for s in m["stages"].values())
    extra = spark.createDataFrame(
        [("orgx/zzz", "a.py", "e" * 40, "python", "import os")], REPOS_SRC
    )
    with pytest.raises(RuntimeError, match="different input"):
        run_codekg_pipeline(spark, mk(rows).unionByName(extra), root, run_id="r2")

    # crash mid-swap: data dir renamed away, marker still present ->
    # every later run refuses with the recovery text
    real_rename = _os.rename
    calls = {"n": 0}

    def failing_rename(src, dst):
        calls["n"] += 1
        if calls["n"] == 2:
            raise OSError("simulated kill -9 mid-swap")
        return real_rename(src, dst)

    monkeypatch.setattr(_os, "rename", failing_rename)
    with pytest.raises(OSError, match="mid-swap"):
        StageStore(root, run_id="c2").compact(spark, "candidates")
    monkeypatch.setattr(_os, "rename", real_rename)
    with pytest.raises(RuntimeError, match="TORN APPEND"):
        run_codekg_pipeline(spark, mk(rows), root, run_id="r3", use_lsh=False)


def test_determinism(spark, repos_df, tmp_path):
    """Same input twice -> identical triples (SURVEY.md §5 item 4)."""
    a = run_codekg_pipeline(spark, repos_df, str(tmp_path / "w1"), use_lsh=False)
    b = run_codekg_pipeline(spark, repos_df, str(tmp_path / "w2"), use_lsh=False)
    ta = spark.read.parquet(str(tmp_path / "w1" / "triples" / "data"))
    tb = spark.read.parquet(str(tmp_path / "w2" / "triples" / "data"))
    sa = sorted(map(tuple, ta.select("subj", "pred", "obj").collect()))
    sb = sorted(map(tuple, tb.select("subj", "pred", "obj").collect()))
    assert sa == sb


def test_build_triples_non_hex_ids_roundtrip(spark):
    """Regression (r3 review): the binary-shuffle optimization must not
    corrupt non-sha ids -- canonical-hex, mixed-case-hex and plain
    string ids all round-trip exactly and never merge."""
    cand_rows = [
        # (doc_id, repo, repo_bucket, lang, content_sha, field, value)
        ("d1", "r", 0, "python", "ab", "import", "numpy"),
        ("D1", "r", 0, "python", "AB", "import", "numpy"),
        ("doc-x", "r", 0, "python", "not-hex", "import", "numpy"),
    ]
    cands = spark.createDataFrame(
        cand_rows,
        "doc_id string, repo string, repo_bucket int, lang string, "
        "content_sha string, field string, value string",
    ).withColumn("score", F.lit(1.0)).withColumn("canonical", F.col("value"))
    nodes = spark.createDataFrame(
        [("numpy", "e", "numpy")], "surface string, entity_id string, canonical string"
    )
    out = codekg.build_triples(cands, nodes)
    doc_rows = {
        r["doc_id"]: r["content_sha"]
        for r in out.filter(F.col("pred") == "imports").collect()
    }
    assert doc_rows == {"d1": "ab", "D1": "AB", "doc-x": "not-hex"}


def test_lsh_links_near_aliases(spark):
    """MinHash-LSH blocking links a near-miss surface form to its dim
    canonical (L6)."""
    rows = [
        ("o/r", "a.py", "c" * 40, "python", "import numpyy\nimport totallyunknownmod"),
    ]
    df = spark.createDataFrame(rows, REPOS_SRC)
    mentions = codekg.extract_code_mentions(df)
    cands = codekg.link_mentions(
        mentions, codekg.code_alias_dim(spark), lsh_threshold=0.4
    )
    got = {
        r["value"]: (r["canonical"], r["method"])
        for r in cands.filter(F.col("field") == "import").collect()
    }
    assert got["numpyy"][0] == "numpy"
    assert got["numpyy"][1] == "lsh"
    assert got["totallyunknownmod"][0] is None


def test_repos_fixture_parquet_matches_generator():
    """The committed input fixture parquet (the shared input of the
    codekg_triples SQL oracle) must be byte-equal to
    repos_src_rows(400, seed=42) -- so the oracle's input can never
    silently drift from the generator the tests and bench use."""
    import pyarrow.parquet as pq

    import __spark_entry__ as entry

    rows = repos_src_rows(400, seed=42)
    t = pq.read_table(entry._REPOS_FIXTURE).to_pydict()
    assert len(t["repo"]) == len(rows)
    for col in ("repo", "path", "commit", "lang", "content"):
        assert t[col] == [r[col] for r in rows], f"fixture drift in {col}"


def test_codekg_sql_oracle_matches_golden_parquet():
    """Triangulation (pure DuckDB, no Spark): the r4 full-pipeline SQL
    oracle must reproduce the make_goldens parquet (itself produced by
    an independent Python twin and historically hash-verified against
    Spark). Three implementations -- Spark engine, SQL oracle, Python
    twin -- all agree or this fails in ~2 s."""
    import duckdb

    import __spark_entry__ as entry

    golden = os.path.join(entry._GOLDEN_DIR, "codekg_triples.parquet")
    con = duckdb.connect()
    mine = con.sql(entry._codekg_triples_sql()).df()
    gold = con.sql(
        f"SELECT subj, pred, obj, doc_id, repo, lang, content_sha, conf "
        f"FROM read_parquet('{golden}') ORDER BY subj, pred, obj"
    ).df()
    assert len(mine) == len(gold)
    m, g = mine.reset_index(drop=True), gold.reset_index(drop=True)
    diff = (m != g) & ~(m.isna() & g.isna())
    assert not diff.any(axis=1).any(), m[diff.any(axis=1)].head()


def test_lsh_recall_holds_across_alias_lengths(spark):
    """Property gate (VERDICT r3 #10): lsh_threshold=0.5 with r=1/b=16
    banding is tuned for short import strings; a future dim change must
    not silently gut fuzzy recall as aliases grow. Plant 8 aliases per
    length 10..40, mutate one interior char each, and require >= 0.95
    recall (mutated -> canonical) at EVERY length. Single-char edit at
    length L gives char-3-gram jaccard ~ (L-3)/(L+3) > 0.5 for L >= 10,
    and 16 r=1 bands catch j >= 0.5 with P ~ 1-2^-16 -- so a miss here
    means the machinery regressed, not the math."""
    import random
    import string

    rng = random.Random(5)
    dim_rows, probes = [], []
    for length in range(10, 41):
        for i in range(8):
            alias = "".join(rng.choice(string.ascii_lowercase) for _ in range(length))
            canonical = f"canon-{length}-{i}"
            dim_rows.append((alias, canonical))
            pos = rng.randrange(2, length - 2)
            sub = rng.choice([c for c in string.ascii_lowercase if c != alias[pos]])
            probes.append((alias[:pos] + sub + alias[pos + 1 :], canonical, length))
    dim = codekg.code_alias_dim(spark, dim_rows)
    values = spark.createDataFrame([(v,) for v, _c, _l in probes], "value string")
    got = {
        r["value"]: r["lsh_canonical"]
        for r in codekg.lsh_alias_map(values, dim, threshold=0.5).collect()
    }
    by_len: dict[int, list[bool]] = {}
    for v, c, length in probes:
        by_len.setdefault(length, []).append(got.get(v) == c)
    for length, hits in sorted(by_len.items()):
        recall = sum(hits) / len(hits)
        assert recall >= 0.95, f"recall {recall:.2f} at alias length {length}"


def test_lsh_candidate_volume_linear_in_misses(spark):
    """Property gate (VERDICT r4 #8): the band join's candidate count
    stays ~LINEAR in |misses| against a 10k-row dim -- the evidence
    behind link_mentions' 'broadcast the lsh map, dimension-sized at
    any corpus scale' claim. Probe sets are nested prefixes (250 ⊂ 500
    ⊂ 1000 mixed mutated-alias + garbage values), so candidates-per-
    miss must hold roughly constant as |misses| quadruples; a
    super-linear blowup here would mean band buckets degenerate."""
    import random
    import string

    from pyspark.sql import functions as F

    rng = random.Random(11)

    def word(n=12):
        return "".join(rng.choice(string.ascii_lowercase) for _ in range(n))

    dim_rows = [(word(), f"c{i}") for i in range(10_000)]
    probes = []
    for i in range(1000):
        if i % 2 == 0:
            alias = dim_rows[rng.randrange(len(dim_rows))][0]
            pos = rng.randrange(2, len(alias) - 2)
            sub = rng.choice([c for c in string.ascii_lowercase if c != alias[pos]])
            probes.append(alias[:pos] + sub + alias[pos + 1 :])
        else:
            probes.append(word())
    dg = spark.createDataFrame(dim_rows, "alias string, canonical string").withColumn(
        "grams", codekg.char_ngrams_col(F.col("alias"))
    )
    per_miss = {}
    for m in (250, 500, 1000):
        vg = spark.createDataFrame(
            [(v,) for v in probes[:m]], "value string"
        ).withColumn("grams", codekg.char_ngrams_col(F.col("value")))
        n_cand = codekg._lsh_band_candidates(vg, dg).count()
        per_miss[m] = n_cand / m
    # bounded per-miss fanout, and no super-linear growth across a 4x
    # miss-set scale-up (ratio of per-miss rates stays near 1)
    assert all(r <= 64 for r in per_miss.values()), per_miss
    assert per_miss[1000] <= 2.0 * per_miss[250] + 1, per_miss


def test_entity_cooccurrence_cap_bounds_mega_doc(spark):
    """VERDICT r3 #4: a planted imports-everything doc (500 distinct
    imports) must emit at most C(cap, 2) pairs, the truncation report
    must surface it (no silent caps), and uncapped docs are unaffected."""
    mega = [("mega", "imports", f"mod{i:04d}") for i in range(500)]
    small = [("small", "imports", m) for m in ("a", "b", "c")]
    triples = spark.createDataFrame(
        mega + small, "doc_id string, pred string, obj string"
    )
    cap = 50
    pairs = codekg.entity_cooccurrence(triples, max_per_doc=cap)
    n_pairs = pairs.count()
    assert n_pairs == cap * (cap - 1) // 2 + 3  # capped mega + full small
    small_pairs = {
        (r["src"], r["dst"])
        for r in pairs.filter(F.col("src").isin("a", "b")).collect()
    }
    assert small_pairs == {("a", "b"), ("a", "c"), ("b", "c")}
    report = codekg.cooccurrence_truncation_report(triples, max_per_doc=cap).collect()
    assert [(r["doc_id"], r["n_entities"]) for r in report] == [("mega", 500)]
    # cap disabled (0) -> nothing is truncated -> empty report, and the
    # edge count goes fully quadratic on the mega doc
    assert codekg.cooccurrence_truncation_report(triples, max_per_doc=0).count() == 0
    assert (
        codekg.entity_cooccurrence(triples, max_per_doc=0).count()
        == 500 * 499 // 2 + 3
    )


def test_entity_cooccurrence_exact_tail_matches_uncapped(spark):
    """VERDICT r4 #7: exact_tail=True routes a planted 2k-import doc
    through the isolated tail branch and yields EXACTLY the uncapped
    pair counts -- n_docs is never bounded-wrong -- while shared pairs
    across branches still sum correctly."""
    mega = [("mega", "imports", f"mod{i:04d}") for i in range(2000)]
    # overlap: a/b also appear in the mega doc -> the (a, b)-style edges
    # must sum across the head and tail branches
    small = [("small", "imports", m) for m in ("mod0000", "mod0001", "zzz")]
    tiny = [("tiny", "imports", m) for m in ("mod0000", "mod0001")]
    triples = spark.createDataFrame(
        mega + small + tiny, "doc_id string, pred string, obj string"
    )
    want = {
        (r["src"], r["dst"]): r["n_docs"]
        for r in codekg.entity_cooccurrence(triples, max_per_doc=0).collect()
    }
    got = {
        (r["src"], r["dst"]): r["n_docs"]
        for r in codekg.entity_cooccurrence(
            triples, max_per_doc=64, exact_tail=True
        ).collect()
    }
    assert got == want
    assert got[("mod0000", "mod0001")] == 3  # mega + small + tiny
    # whereas the plain cap undercounts that edge (mega truncated away)
    capped = {
        (r["src"], r["dst"]): r["n_docs"]
        for r in codekg.entity_cooccurrence(triples, max_per_doc=2).collect()
    }
    assert capped[("mod0000", "mod0001")] == 3  # first-2-by-obj keeps these
    assert len(capped) < len(want)


def test_empty_content_doc_does_not_abort(spark, tmp_path):
    """ADVICE r1 (high): a doc with zero extractable mentions (empty or
    comment-only content) is dropped by the mentions explode; the sha
    invariant must treat that as a legitimate subset, not corruption."""
    rows = [
        ("o/r", "empty.py", "c" * 40, "python", ""),
        ("o/r", "comment.py", "d" * 40, "python", None),
        ("o/r", "real.py", "e" * 40, "python", "import numpy\ndef load_data(x):\n    return x"),
    ]
    df = spark.createDataFrame(rows, REPOS_SRC)
    m = run_codekg_pipeline(spark, df, str(tmp_path / "w"), use_lsh=False)
    assert m["triples"] > 0
    assert m["stages"]["mentions"]["sha_invariant_ok"] is True
    assert m["stages"]["mentions"]["docs_dropped"] == 2


def test_avaluo_pipeline_gate_and_invariant(spark, tmp_path):
    """S1 page gate (>50 chars) + per-stage sha invariant on the avaluo
    path (reference: extractorAvaluos.py:18-29)."""
    from structured_data_entity_extraction_spark.pipeline import (
        length_gate,
        run_avaluo_pipeline,
    )
    from structured_data_entity_extraction_spark.schemas import AVALUO_DOCS

    rows = [
        ("d1", ""),  # gated out
        ("d2", "  corto  "),  # gated out (<=50 after trim)
        ("d3", "AVALÚO COMERCIAL folio 1234 " + "relleno " * 20 + "VALOR CONCLUIDO $1,234,567.89"),
    ]
    docs = spark.createDataFrame(rows, AVALUO_DOCS)
    assert length_gate(docs).count() == 1
    m = run_avaluo_pipeline(spark, docs, str(tmp_path / "w"), min_page_chars=50)
    assert m["records"] == 1
    assert m["triples"] == 13
    for stage in ("records", "triples"):
        assert m["stages"][stage]["sha_invariant_ok"] is True


def test_stagestore_iceberg_routing(spark, tmp_path):
    """Flag off (default): parquet path, iceberg_table null in manifest.
    Flag on: the write routes through DataFrameWriterV2.writeTo against
    the named catalog -- in this catalog-less sandbox that must surface
    as a catalog-resolution error naming OUR catalog, proving the
    Iceberg code path is actually taken."""
    rows = [("o/r", "a.py", "c" * 40, "python", "import numpy")]
    df = spark.createDataFrame(rows, REPOS_SRC)

    store = StageStore(str(tmp_path / "w"), run_id="r1")
    store.write(df, "mentions")
    assert store.manifest("mentions")["iceberg_table"] is None

    ice = StageStore(str(tmp_path / "w2"), run_id="r1", iceberg_catalog="prodcat")
    assert ice.iceberg_ident("mentions") == "prodcat.structured_data_entity_extraction.mentions"
    with pytest.raises(Exception, match="prodcat"):
        ice.write(df, "mentions")
