#!/usr/bin/env python3
"""Plan-quality audit: for every query in __spark_entry__.queries(), inspect
the executed physical plan and report the scale-relevant properties —
shuffle (Exchange) count, broadcast joins, sort-merge joins, whole-stage
codegen coverage, parquet filter pushdown, and in-Python (non-codegen) ops.

Usage: python scripts/explain_audit.py [sf_dir] [query ...]
Prints one summary line per query + a JSON dump at the end. Use it after
adding an operator: a query that suddenly gains an Exchange or loses
PushedFilters regressed, even if it still passes the oracle.

Caveat: codegen_spans undercounts inside AQE-replanned subtrees (the
adaptive plan string does not always render the *(n) markers); exchanges,
join strategies, python ops, and pushdown counts are exact.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def audit_plan(df) -> dict:
    # execute THIS df's plan (noop sink, no rows back) so AQE finalizes it
    df.write.format("noop").mode("overwrite").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "broadcast_joins": len(re.findall(r"BroadcastHashJoin", plan)),
        "sortmerge_joins": len(re.findall(r"SortMergeJoin", plan)),
        "nested_loop_joins": len(re.findall(r"NestedLoop", plan)),
        "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "python_ops": len(re.findall(r"(ArrowEvalPython|BatchEvalPython|FlatMapGroupsInPandas|MapInPandas)", plan)),
        "scans_with_pushdown": len(re.findall(r"PushedFilters: \[[^\]]", plan)),
        "scans": len(re.findall(r"FileScan|BatchScan", plan)),
        "takeordered": len(re.findall(r"TakeOrderedAndProject", plan)),
        "global_sorts": len(re.findall(r"Sort \[", plan)) - len(re.findall(r"SortMergeJoin", plan)) * 2,
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("explain-audit")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            a = audit_plan(df)
            out[name] = a
            flags = []
            if a["nested_loop_joins"]:
                flags.append("nested-loop")
            if a["python_ops"]:
                flags.append(f"python×{a['python_ops']}")
            print(
                f"{name:32s} exch={a['exchanges']:2d} bhj={a['broadcast_joins']} "
                f"smj={a['sortmerge_joins']} codegen={a['codegen_spans']:2d} "
                f"{' '.join(flags)}"
            )
        except Exception as exc:  # pragma: no cover
            out[name] = {"error": str(exc)[:200]}
            print(f"{name:32s} ERROR {str(exc)[:120]}")
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
