"""Catalyst plan-compile forensics: where does DRIVER time go for a
query's analysis/optimization, rule by rule?

The round-4 crawl-loop speedup came from exactly this measurement
(BENCH/BASELINE.md "plan-tax" block): `RuleExecutor.dumpTimeSpent()`
showed PruneFilters spending 10.6 s/plan deriving constraints over
the staged URL-canon projection with zero effective rewrites.

Usage:
    python tools/plan_tax.py <query_name> [sf_dir]   # a queries() entry
    python tools/plan_tax.py --all [sf_dir]          # every entry, sorted

Prints per-query wall time to build `executedPlan` plus the top
Catalyst rules by total time. Compare a cold first call with a
repeat: the delta is Janino codegen cache effect; the repeat is the
pure per-plan optimizer tax an iterative job pays every round.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rule_dump(jvm, top: int = 8) -> str:
    dump = jvm.org.apache.spark.sql.catalyst.rules.RuleExecutor \
        .dumpTimeSpent()
    lines = [ln for ln in dump.split("\n") if ln.strip()]
    # header (3 lines) + top rules
    return "\n".join(lines[1:3] + lines[4:4 + top])


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    run_all = "--all" in sys.argv
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"

    import __spark_entry__ as entry
    from frontier.spark.session import get_spark

    spark = get_spark(app="plan-tax", cores=8, shuffle_partitions=8)
    jvm = spark._jvm
    qs = entry.queries()
    names = list(qs) if run_all else [args[0]]

    rows = []
    for name in names:
        df = qs[name](spark, sf_dir)
        jvm.org.apache.spark.sql.catalyst.rules.RuleExecutor \
            .resetMetrics()
        t0 = time.perf_counter()
        df._jdf.queryExecution().executedPlan()
        cold = time.perf_counter() - t0
        dump = _rule_dump(jvm)
        # fresh DataFrame, warm codegen cache → the recurring tax
        df2 = qs[name](spark, sf_dir)
        t0 = time.perf_counter()
        df2._jdf.queryExecution().executedPlan()
        warm = time.perf_counter() - t0
        rows.append((name, cold, warm, dump))

    rows.sort(key=lambda r: -r[2])
    for name, cold, warm, dump in rows:
        print(f"\n=== {name}: plan {cold:.2f}s cold / {warm:.2f}s "
              f"repeat ===")
        if not run_all or warm > 0.5:
            print(dump)
    spark.stop()


if __name__ == "__main__":
    main()
