"""Per-query isolation bench (guide §1.4): times individual
``queries()`` entries through the noop sink with job labels, and can
dump ``.explain('formatted')`` plans. bench.py is FROZEN for the
driver's measurement; every number cited from here lands in
OPTIMIZATION_r07.md, never in the driver record.

Usage:
  python bench_extra.py q1,q2,... [--sf-dir DIR] [--repeats N]
      [--explain-dir plans/r07] [--suffix _before]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("names")
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="")
    args = ap.parse_args()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import __spark_entry__ as entrymod
    from frontier.spark.session import get_spark

    spark = get_spark(app="bench-extra", cores=cpus,
                      shuffle_partitions=max(cpus, 8))
    from pyspark.sql import functions as F
    spark.range(100000).select(F.sum("id")).collect()  # JVM warm

    qs = entrymod.queries()
    names = [n for n in args.names.split(",") if n]
    out = {}
    for name in names:
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            df = qs[name](spark, args.sf_dir)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution
                .ExplainMode.fromString("formatted"))
            with open(os.path.join(
                    args.explain_dir,
                    f"{name}{args.suffix}.txt"), "w") as f:
                f.write(txt)
        runs = []
        for i in range(args.repeats):
            spark.sparkContext.setJobDescription(f"{name} run{i}")
            t0 = time.perf_counter()
            qs[name](spark, args.sf_dir).write.format("noop") \
                .mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        out[name] = {"min": min(runs), "runs": runs}
        print(json.dumps({name: out[name]}), flush=True)
    print("RESULT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
