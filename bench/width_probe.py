"""Width-scaling probes: what does THIS BOX allow at 8→32-wide?

Two microbenchmarks under the same single-JVM width-limit methodology
as scaling_single_jvm.py, chosen to bracket the frontier job:

* cpu probe — md5 over generated longs: arithmetic-dense, tiny
  working set, no input IO. If the box scaled cores independently
  this hits ~1.0.
* scan probe — sum(length(html)) over the 8M-page parquet in tmpfs:
  pure columnar scan, memory-bandwidth-bound, no Python.

The frontier headline sits between these two; if the scan probe caps
near the headline's efficiency, the ceiling is the shared memory bus,
not the query plan — the exact resource a real 4N-executor cluster
multiplies with N.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    amplify = int(os.environ.get("FRONTIER_BENCH_AMPLIFY", "1600"))
    rounds = int(os.environ.get("FRONTIER_SCALING_ROUNDS", "3"))
    pages_path = f"/dev/shm/frontier_bench/pages_x{amplify}"

    from pyspark.sql import functions as F

    from frontier.spark.session import get_spark

    os.environ.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/spark-local")
    spark = get_spark(app="width-probe", cores=32, shuffle_partitions=32,
                      extra={"spark.sql.adaptive.enabled": "false"})

    def cpu_probe(par: int) -> float:
        t0 = time.perf_counter()
        (spark.range(0, 60_000_000, 1, par)
         .select(F.sum(F.conv(F.substring(F.md5(F.col("id")
                 .cast("string")), 1, 4), 16, 10).cast("long")))
         .collect())
        return time.perf_counter() - t0

    def scan_probe(par: int) -> float:
        pages = spark.read.parquet(pages_path).coalesce(par)
        t0 = time.perf_counter()
        pages.select(F.sum(F.length("html"))).collect()
        return time.perf_counter() - t0

    probes = {"cpu_md5": cpu_probe, "scan_bytes": scan_probe}
    for fn in probes.values():
        fn(8)
        fn(32)
    best = {m: {8: 1e9, 32: 1e9} for m in probes}
    for rnd in range(rounds):
        for par in (8, 32):
            for m, fn in probes.items():
                took = fn(par)
                best[m][par] = min(best[m][par], took)
                print(f"round {rnd} par={par} {m}: {took:.2f}s",
                      flush=True)
    for m, d in best.items():
        eff = d[8] / d[32] / 4
        print(f"{m}: {d[8]:.2f}s -> {d[32]:.2f}s  efficiency={eff:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
