"""Generate a 10x perf-validation dataset (`/root/sfbig`, sf1.0-like).

The driver's round-end MEASUREMENT escalates to a driver-generated
sf1.0 (BENCH_r06.json: 50k documents, 6M lineitem). That data is not
on the box, so perf work above sf0.1 needs a stand-in with the same
shape. This mirrors the observable generation process of
/root/testdata/sf0.1 (read-only, never modified):

- documents: 31-word vocab soup (30 uniform words + the `dup` marker
  that near-dup copies carry), lengths uniform 10-100 words, ~0.5%
  near-dup copies (one word replaced by `dup`) and ~0.16% exact
  copies at random positions -- reproduces the measured profile
  (sf0.1: 27k distinct shingles, max df 25, 1.27M candidate pairs,
  256 jaccard>=0.8 pairs; 10x docs => ~100x candidate pairs ~127M,
  ~2.5k result pairs, both matching the r6 driver artifact's sf1.0
  row counts).
- TPC-H-ish facts: replicate sf0.1 10x with key offsets (join
  fan-outs and group cardinalities scale linearly, as the driver's
  own sf1.0 did).
- events: 10x replication with id/user/time offsets.
- embeddings: 20k x 64-d float32, labels 0-9, seeded normal.

NOT an oracle input -- correctness stays on the driver's sf0.001/0.01
data. This is for timing only. Usage:

    python tools/gen_sfbig.py [/root/sfbig]
"""

from __future__ import annotations

import os
import random
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
MULT = 10

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup_src",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
VOCAB.remove("dup_src")  # 30 uniform words; `dup` only via mutation


def gen_documents(out_dir: str, n_docs: int, seed: int = 42) -> None:
    rng = random.Random(seed)
    langs = ["en"] * 8 + ["zh", "zh", "es", "es", "fr", "fr", "de", "de"]
    n_near = int(n_docs * 0.0496)  # sf0.1: 248/5000
    n_exact = int(n_docs * 0.0016)  # sf0.1: 8/5000
    base_n = n_docs - n_near - n_exact
    texts = []
    for _ in range(base_n):
        ln = rng.randint(10, 100)
        texts.append(" ".join(rng.choice(VOCAB) for _ in range(ln)))
    for _ in range(n_near):
        src = rng.choice(texts[:base_n])
        ws = src.split()
        ws[rng.randrange(len(ws))] = "dup"
        texts.append(" ".join(ws))
    for _ in range(n_exact):
        texts.append(rng.choice(texts[:base_n]))
    rng.shuffle(texts)
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array([rng.choice(langs) for _ in range(n_docs)], pa.string()),
            "source": pa.array([f"src{rng.randrange(20)}" for _ in range(n_docs)], pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(out_dir, "documents.parquet"))


def gen_embeddings(out_dir: str, n: int, dim: int = 64, seed: int = 42) -> None:
    rs = np.random.RandomState(seed)
    vecs = rs.randn(n, dim).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
            "label": pa.array((np.arange(n) % 10).astype(np.int32), pa.int32()),
        }
    )
    pq.write_table(tbl, os.path.join(out_dir, "embeddings.parquet"))


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/sfbig"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    reps = ", ".join(str(i) for i in range(MULT))

    def copy(sql: str, name: str) -> None:
        con.sql(f"COPY ({sql}) TO '{out}/{name}.parquet' (FORMAT parquet)")
        print(name, con.sql(f"SELECT count(*) FROM '{out}/{name}.parquet'").fetchone()[0])

    # dims unchanged
    copy(f"SELECT * FROM '{SRC}/region.parquet'", "region")
    copy(f"SELECT * FROM '{SRC}/nation.parquet'", "nation")
    # replicated facts, keys offset per replica so joins stay consistent
    copy(
        f"""SELECT c_custkey + i*15000 AS c_custkey, c_name, c_nationkey,
                   c_acctbal, c_mktsegment
            FROM '{SRC}/customer.parquet', (VALUES ({reps.replace(', ', '), (')})) t(i)""",
        "customer",
    )
    copy(
        f"""SELECT s_suppkey + i*1000 AS s_suppkey, s_name, s_nationkey, s_acctbal
            FROM '{SRC}/supplier.parquet', (VALUES ({reps.replace(', ', '), (')})) t(i)""",
        "supplier",
    )
    copy(
        f"""SELECT p_partkey + i*20000 AS p_partkey, p_name, p_brand, p_type,
                   p_size, p_retailprice
            FROM '{SRC}/part.parquet', (VALUES ({reps.replace(', ', '), (')})) t(i)""",
        "part",
    )
    copy(
        f"""SELECT o_orderkey + i*150000 AS o_orderkey,
                   o_custkey + i*15000 AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM '{SRC}/orders.parquet', (VALUES ({reps.replace(', ', '), (')})) t(i)""",
        "orders",
    )
    copy(
        f"""SELECT l_orderkey + i*150000 AS l_orderkey,
                   l_partkey + i*20000 AS l_partkey,
                   l_suppkey + i*1000 AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM '{SRC}/lineitem.parquet', (VALUES ({reps.replace(', ', '), (')})) t(i)""",
        "lineitem",
    )
    copy(
        f"""SELECT event_id + i*100000 AS event_id,
                   ts + INTERVAL (i*30) DAY AS ts,
                   user_id + i*1500 AS user_id, event_type, value, props
            FROM '{SRC}/events.parquet', (VALUES ({reps.replace(', ', '), (')})) t(i)""",
        "events",
    )
    gen_documents(out, 5000 * MULT)
    print("documents", 5000 * MULT)
    gen_embeddings(out, 2000 * MULT)
    print("embeddings", 2000 * MULT)
    open(os.path.join(out, "_DONE"), "w").close()


if __name__ == "__main__":
    main()
