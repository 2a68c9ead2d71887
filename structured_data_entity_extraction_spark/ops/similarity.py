"""Similarity search over embedding columns (array<float>).

- ``cosine_expr``: pure built-in (zip_with + aggregate) cosine -- stays
  in whole-stage codegen, no Python;
- ``brute_force_topk``: exact top-k per query via broadcast query set +
  window row_number (the correctness baseline);
- ``lsh_topk``: the scale path -- random-hyperplane sign buckets
  (seeded, deterministic) shrink the candidate set before exact rerank.
  At 100 TB the bucket join replaces the full cross product; multiprobe
  (hamming-1 neighbor buckets) keeps recall high.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def cosine_expr(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns, JVM-side."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x))
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))


def _planes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).tolist()


def signature_col(vec: Column, n_planes: int, seed: int = 42, dim: int = 64) -> Column:
    """Sign-LSH bucket id: bit i = sign(vec . plane_i). Hyperplanes are
    literal arrays (seeded) -> constant-folded by Catalyst."""
    planes = _planes(dim, n_planes, seed)
    sig = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        dot = F.aggregate(
            F.zip_with(vec, plane, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        )
        sig = sig + F.when(dot >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return sig


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(query_id, vec_id, cos, rank) exact top-k neighbors per query.
    Query set is broadcast (small); corpus never shuffles until the
    per-query window."""
    from .dedup import _ensure_parallelism

    # single-split embeddings scan would run all |corpus| x |queries|
    # cosines on one core (the scoring is the whole query)
    c = _ensure_parallelism(corpus).select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("cvec")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qvec")
    )
    scored = c.join(F.broadcast(q), F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        "vec_id",
        cosine_expr(F.col("qvec"), F.col("cvec")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos", "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    codebook: list[list[float]] | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: a coarse quantizer
    assigns every corpus vector to its nearest centroid (the inverted
    list), each query probes only its ``n_probe`` closest centroids'
    lists, and candidates are reranked by exact cosine.

    ``codebook``: a precomputed centroid table (the production path --
    train offline with tools/train_codebook.py's deterministic k-means
    on a sample, then pass the centroids here; they are embedded as
    literal arrays, i.e. broadcast). Without it, the centroids default
    to the ``n_centroids`` lowest-id corpus rows -- deterministic but
    unrepresentative on clustered data (an inline distributed k-means
    would be partition-order dependent, i.e. nondeterministic).
    Assignment is a JVM-side argmax over the centroid cosine
    expressions -- a narrow map over the corpus, no shuffle; the probe
    join keys on centroid id, so per-query work is
    |corpus| * n_probe / n_centroids."""
    if codebook is not None:
        cents = [(i, [float(x) for x in c]) for i, c in enumerate(codebook)]
        n_probe = min(n_probe, len(cents))
    else:
        rows = (
            corpus.select(
                F.col(id_col).alias("vid"), F.col(vec_col).cast("array<double>").alias("v")
            )
            .orderBy("vid")
            .limit(n_centroids)
            .collect()
        )
        cents = [(i, list(r["v"])) for i, r in enumerate(rows)]

    def best_cells(vec: Column, n: int) -> Column:
        """Array of the n centroid ids with highest cosine (desc, id asc)."""
        scored = F.array(
            *[
                F.struct(
                    (-cosine_expr(vec, F.array(*[F.lit(float(x)) for x in cv]))).alias("neg"),
                    F.lit(ci).alias("cell"),
                )
                for ci, cv in cents
            ]
        )
        return F.slice(F.array_sort(scored), 1, n).getField("cell")

    from .dedup import _ensure_parallelism

    # spread the scan before the per-row coarse-cell assignment (the
    # literal-centroid l2 argmin is the CPU-heavy part; one split
    # would serialize it)
    c = _ensure_parallelism(corpus).select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("cvec")
    ).withColumn("cell", best_cells(F.col("cvec"), 1)[0])
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qvec")
    ).withColumn("cell", F.explode(best_cells(F.col("qvec"), n_probe)))
    # no distinct needed: each corpus vector sits in exactly one cell
    # and a query's probe cells are distinct, so (query_id, vec_id)
    # pairs are already unique -- a distinct here would be a pure
    # wasted shuffle of the whole candidate set
    cand = c.join(F.broadcast(q), "cell").filter(F.col("vec_id") != F.col("query_id"))
    scored = cand.select(
        "query_id", "vec_id", cosine_expr(F.col("qvec"), F.col("cvec")).alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos", "rank")
    )


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    coarse: list[list[float]],
    pq: list[list[list[float]]],
    k: int = 10,
    n_probe: int = 4,
    rerank: int = 32,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-PQ approximate top-k (Jegou, Douze & Schmid, "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011) -- the
    memory-scale path the raw-vector IVF lacks: the inverted lists
    carry only m PQ codes per vector (m bytes at ksub<=256 vs
    4*dim bytes raw -- ~3 TB of hot floats at 10^9 x 768-d shrinks to
    ~tens of GB), the probe join scans codes with an asymmetric-
    distance (ADC) score against the query's real vector, and only the
    top ``rerank`` candidates per query touch raw vectors again for the
    exact-cosine rerank.

    Both codebooks are pinned offline artifacts
    (tools/train_codebook.py --pq -> data/ivf_pq_codebook.json),
    embedded as literal arrays so Catalyst constant-folds them --
    encoding, probing, and ADC are all JVM expressions, zero Python.
    No residual encoding (FAISS by_residual=false flavor): codes
    quantize the raw vector, which keeps the ADC score a pure
    query-independent table lookup AND keeps the whole operator
    SQL-oracle-able.

    Determinism contract (shared with the DuckDB oracle): PQ encode =
    argmin L2^2 per subspace (ties -> lowest code); ADC score =
    cos(query, reconstruction), ROUNDED to 6 dp before the rerank
    cutoff (ties -> vec_id asc) so bit-level float fold differences
    between engines cannot flip the cutoff set; final ranking by exact
    cosine (ties -> vec_id asc)."""
    m = len(pq)
    ksub = len(pq[0])
    dsub = len(pq[0][0])
    cents = [(i, [float(x) for x in c]) for i, c in enumerate(coarse)]
    n_probe = min(n_probe, len(cents))

    def best_cells(vec: Column, n: int) -> Column:
        scored = F.array(
            *[
                F.struct(
                    (-cosine_expr(vec, F.array(*[F.lit(float(x)) for x in cv]))).alias(
                        "neg"
                    ),
                    F.lit(ci).alias("cell"),
                )
                for ci, cv in cents
            ]
        )
        return F.slice(F.array_sort(scored), 1, n).getField("cell")

    def sub(vec: Column, mi: int) -> Column:
        return F.slice(vec, mi * dsub + 1, dsub)

    def l2sq(a: Column, cv: list[float]) -> Column:
        lit = F.array(*[F.lit(float(x)) for x in cv])
        return F.aggregate(
            F.zip_with(a, lit, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    def encode(vec: Column) -> Column:
        """array<int> of m PQ codes: per subspace, argmin L2^2 (ties ->
        lowest code, via array_sort on (dist, code) structs)."""
        parts = []
        for mi in range(m):
            scored = F.array(
                *[
                    F.struct(
                        l2sq(sub(vec, mi), pq[mi][ci]).alias("d"),
                        F.lit(ci).alias("code"),
                    )
                    for ci in range(ksub)
                ]
            )
            parts.append(F.array_sort(scored)[0]["code"])
        return F.array(*parts)

    # per-subspace centroid tables as literal array-of-arrays (indexed
    # by code via element_at) + precomputed squared norms for |x_hat|
    pq_lits = [
        F.array(*[F.array(*[F.lit(float(x)) for x in cv]) for cv in pq[mi]])
        for mi in range(m)
    ]
    norm_lits = [
        F.array(*[F.lit(float(sum(x * x for x in cv))) for cv in pq[mi]])
        for mi in range(m)
    ]

    from .dedup import _ensure_parallelism

    # the embeddings table scans as a single split, which would run the
    # CPU-heavy encode/ADC projection below on one core (measured: a
    # 2.5 s one-task stage at sf0.1); round-robin spread first
    c = _ensure_parallelism(corpus).select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("cvec"),
    )
    # the inverted list: (cell, vec_id, codes) -- this is ALL the probe
    # join ever touches; raw vectors stay in c and are fetched only for
    # the reranked few
    c_codes = c.select(
        "vec_id",
        best_cells(F.col("cvec"), 1)[0].alias("cell"),
        encode(F.col("cvec")).alias("codes"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qvec"),
    ).withColumn("cell", F.explode(best_cells(F.col("qvec"), n_probe)))

    cand = c_codes.join(F.broadcast(q), "cell").filter(
        F.col("vec_id") != F.col("query_id")
    )
    code_at = lambda mi: F.element_at(F.col("codes"), mi + 1)
    adc_dot = sum(
        (
            F.aggregate(
                F.zip_with(
                    sub(F.col("qvec"), mi),
                    F.element_at(pq_lits[mi], code_at(mi) + 1),
                    lambda x, y: x * y,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            for mi in range(m)
        ),
        F.lit(0.0),
    )
    xhat_norm = F.sqrt(
        sum((F.element_at(norm_lits[mi], code_at(mi) + 1) for mi in range(m)), F.lit(0.0))
    )
    qnorm = F.sqrt(
        F.aggregate(F.col("qvec"), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    scored = cand.select(
        "query_id",
        "vec_id",
        "qvec",
        F.round(
            F.when(
                (qnorm > 0) & (xhat_norm > 0), adc_dot / (qnorm * xhat_norm)
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("adc"),
    )
    w_adc = Window.partitionBy("query_id").orderBy(F.desc("adc"), F.asc("vec_id"))
    shortlist = (
        scored.withColumn("arank", F.row_number().over(w_adc))
        .filter(F.col("arank") <= rerank)
        .select("query_id", "vec_id", "qvec")
    )
    # exact rerank: only |queries| * rerank rows fetch a raw vector
    exact = F.broadcast(shortlist).join(c, "vec_id").select(
        "query_id",
        "vec_id",
        cosine_expr(F.col("qvec"), F.col("cvec")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos", "rank")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 6,
    multiprobe: bool = True,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: candidates share the query's sign bucket (or a
    hamming-1 neighbor bucket when multiprobe), exact cosine rerank."""
    from .dedup import _ensure_parallelism

    corpus = _ensure_parallelism(corpus)
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("cvec"),
    ).withColumn("cbucket", signature_col(F.col("cvec"), n_planes))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qvec"),
    ).withColumn("qbucket", signature_col(F.col("qvec"), n_planes))
    if multiprobe:
        probes = F.array(
            F.col("qbucket"),
            *[F.col("qbucket").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)],
        )
        q = q.withColumn("probe", F.explode(probes))
    else:
        q = q.withColumn("probe", F.col("qbucket"))
    # no distinct needed (same argument as ivf_topk): each corpus vector
    # has exactly one cbucket and a query's probe values (qbucket and its
    # single-bit flips) are pairwise distinct, so the join emits every
    # (query_id, vec_id) pair at most once -- a distinct here would be a
    # pure wasted shuffle of the candidate set
    cand = c.join(
        F.broadcast(q),
        (F.col("cbucket") == F.col("probe")) & (F.col("vec_id") != F.col("query_id")),
    ).select(
        "query_id",
        "vec_id",
        cosine_expr(F.col("qvec"), F.col("cvec")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos", "rank")
    )
