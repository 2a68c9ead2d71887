"""Reproducible physical-plan audit: prints `.explain("formatted")` for
the scale-critical queries and greps each plan for the checklist
(SURVEY.md §4): predicate pushdown, column pruning, broadcast joins,
whole-stage codegen spans, Python-boundary count. PLANS.md is written
from this output. Usage: python tools/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def audit(name: str, df) -> None:
    p = plan_of(df)
    checks = {
        "PushedFilters": len(re.findall(r"PushedFilters: \[[^\]]", p)),
        "ReadSchema_cols": re.findall(r"ReadSchema: struct<([^>]*)>", p),
        "BroadcastHashJoin": p.count("BroadcastHashJoin"),
        "SortMergeJoin": p.count("SortMergeJoin"),
        "ArrowEvalPython": p.count("ArrowEvalPython"),
        "WholeStageCodegen_spans": len(set(re.findall(r"\[codegen id : (\d+)\]", p))),
        "InMemoryTableScan": p.count("InMemoryTableScan"),
        "Exchange": p.count("Exchange"),
        "partial_HashAggregate": p.count("HashAggregate"),
    }
    print(f"\n===== {name} =====")
    for k, v in checks.items():
        print(f"  {k}: {v}")
    if os.environ.get("EXPLAIN_FULL"):
        print(p)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as entry

    from structured_data_entity_extraction_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    for name in (
        "tpch_q1_pricing_summary",
        "region_rollup_broadcast_join",
        "minhash_lsh_pairs",
        "ngram_jaccard_pairs",
        "codekg_triples",
        "avaluo_triples",
        "token_stats",
        "ann_lsh_topk",
        "asof_join_last_purchase",
        "interval_join_signup_window",
        "decontam_report",
        "entity_cooccurrence",
        "entity_cooccurrence_exact",
        "top_orders_by_lines",
        "simhash_pairs",
        "ann_ivf_codebook_topk",
        "value_percentiles_approx",
    ):
        audit(name, qs[name](spark, sf_dir))
    spark.stop()


if __name__ == "__main__":
    main()
