"""Plan-quality audit: for each query, print the physical-plan
properties that matter at scale — does the filter reach the scan
(PushedFilters), is the projection pruned (ReadSchema), which join
strategies fire, how many shuffles (Exchange) the plan carries, and
whether whole-stage codegen covers the hot path.

Usage: python tools/explain_all.py [sf_dir] [query ...]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E
from spectrify_spark.session import get_spark


def audit(name: str, df) -> None:
    plan = df._jdf.queryExecution().executedPlan().toString()
    joins = sorted(set(re.findall(r"(\w*HashJoin|SortMergeJoin|BroadcastNestedLoopJoin)", plan)))
    n_exchange = len(re.findall(r"\bExchange\b", plan))
    n_codegen = len(re.findall(r"WholeStageCodegen", plan))
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    pushed_any = any(p.strip() for p in pushed)
    reads = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    n_cols = [len(r.split(",")) for r in reads if r]
    print(
        f"{name:22s} joins={','.join(joins) or '-':40s} "
        f"exchanges={n_exchange} codegen_spans={n_codegen} "
        f"pushed_filters={'Y' if pushed_any else '-'} scan_cols={n_cols}"
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("explain-all")
    for name, fn in E.queries().items():
        if only and name not in only:
            continue
        try:
            audit(name, fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {e}")


if __name__ == "__main__":
    main()
