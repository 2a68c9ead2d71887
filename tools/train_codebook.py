"""Deterministic spherical k-means codebook trainer for
``similarity.ivf_topk(codebook=...)`` -- the offline scale path: at
100 TB you train the coarse quantizer once on a driver-side sample and
broadcast the centroids; the inline lowest-id default is only a
fallback for ad-hoc queries.

Determinism (same input -> same centroids, any machine):
- init = the first ``n_centroids`` vectors in ID order;
- fixed ``n_iter`` Lloyd iterations (no tolerance-based early exit);
- assignment by cosine argmax with ties -> lowest centroid index
  (numpy argmax order);
- float64 means over members in ID order.

CLI: python tools/train_codebook.py <embeddings.parquet> <out.json>
     [n_centroids] [n_iter] -- reads (vec_id, embedding), samples the
     lowest `--sample` ids (deterministic), writes the codebook JSON.
"""

from __future__ import annotations

import json
import sys

import numpy as np


def train_codebook(
    vectors: list[list[float]],
    n_centroids: int = 16,
    n_iter: int = 10,
) -> list[list[float]]:
    """vectors (already in a deterministic order, e.g. sorted by id) ->
    n_centroids x dim centroid list."""
    x = np.asarray(vectors, dtype=np.float64)
    if len(x) < n_centroids:
        raise ValueError(f"need >= {n_centroids} vectors, got {len(x)}")
    norms = np.linalg.norm(x, axis=1)
    xn = np.where(norms[:, None] > 0, x / np.maximum(norms, 1e-300)[:, None], 0.0)
    cents = x[:n_centroids].copy()
    for _ in range(n_iter):
        cn_norm = np.linalg.norm(cents, axis=1)
        cn = np.where(
            cn_norm[:, None] > 0, cents / np.maximum(cn_norm, 1e-300)[:, None], 0.0
        )
        assign = np.argmax(xn @ cn.T, axis=1)  # ties -> lowest index
        for ci in range(n_centroids):
            members = x[assign == ci]
            if len(members):
                cents[ci] = members.mean(axis=0)
            # empty cluster: keep the previous centroid (deterministic)
    return cents.tolist()


def train_pq(
    vectors: list[list[float]],
    m: int = 8,
    ksub: int = 16,
    n_iter: int = 10,
) -> list[list[list[float]]]:
    """Product-quantization codebooks: split each vector into ``m``
    contiguous subspaces and run plain-L2 k-means per subspace (init =
    first ``ksub`` subvectors in ID order, argmin L2 with ties -> lowest
    code, float64 means, fixed iterations -- deterministic like
    train_codebook). Returns m x ksub x (dim/m)."""
    x = np.asarray(vectors, dtype=np.float64)
    if len(x) < ksub:
        raise ValueError(f"need >= {ksub} vectors, got {len(x)}")
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    out = []
    for mi in range(m):
        sub = x[:, mi * dsub : (mi + 1) * dsub]
        cents = sub[:ksub].copy()
        for _ in range(n_iter):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)  # ties -> lowest code
            for ci in range(ksub):
                members = sub[assign == ci]
                if len(members):
                    cents[ci] = members.mean(axis=0)
        out.append(cents.tolist())
    return out


def main(argv: list[str]) -> None:
    import pyarrow.parquet as pq

    if argv and argv[0] == "--pq":
        # python tools/train_codebook.py --pq <embeddings.parquet> <out.json>
        #   [n_coarse] [m] [ksub] [n_iter] [sample]
        src, out = argv[1], argv[2]
        n_coarse = int(argv[3]) if len(argv) > 3 else 16
        m = int(argv[4]) if len(argv) > 4 else 8
        ksub = int(argv[5]) if len(argv) > 5 else 16
        n_iter = int(argv[6]) if len(argv) > 6 else 10
        sample = int(argv[7]) if len(argv) > 7 else 100_000
        tbl = pq.read_table(src).to_pylist()
        tbl.sort(key=lambda r: r["vec_id"])
        vecs = [[float(v) for v in r["embedding"]] for r in tbl[:sample]]
        cb = {
            "coarse": train_codebook(vecs, n_centroids=n_coarse, n_iter=n_iter),
            "pq": train_pq(vecs, m=m, ksub=ksub, n_iter=n_iter),
        }
        with open(out, "w", encoding="utf-8") as fh:
            json.dump(cb, fh)
        print(
            f"wrote {out}: coarse {n_coarse} x {len(cb['coarse'][0])}, "
            f"pq {m} x {ksub} x {len(cb['pq'][0][0])} from {len(vecs)} vectors"
        )
        return

    src, out = argv[0], argv[1]
    n_centroids = int(argv[2]) if len(argv) > 2 else 16
    n_iter = int(argv[3]) if len(argv) > 3 else 10
    sample = int(argv[4]) if len(argv) > 4 else 100_000
    tbl = pq.read_table(src).to_pylist()
    tbl.sort(key=lambda r: r["vec_id"])
    vecs = [[float(v) for v in r["embedding"]] for r in tbl[:sample]]
    cb = train_codebook(vecs, n_centroids=n_centroids, n_iter=n_iter)
    with open(out, "w", encoding="utf-8") as fh:
        json.dump(cb, fh)
    print(f"wrote {out}: {n_centroids} centroids x {len(cb[0])} dims from {len(vecs)} vectors")


if __name__ == "__main__":
    main(sys.argv[1:])
