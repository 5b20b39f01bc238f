"""Two-cluster-size scaling evidence, single-JVM methodology.

This sandbox VM suffers minute-scale host contention: identical
spark-submit runs drift up to 7x (see bench/scaling.py history), so
back-to-back separate-JVM comparisons are unusable. Instead we hold
ONE local[32] JVM and vary the *achievable parallelism* of the same
job — the input is laid out as exactly N partitions and
``spark.sql.shuffle.partitions`` is set to N at runtime (AQE off for
these runs so the setting is respected). N=8 vs N=32 is then a
faithful proxy for N vs 4N executor slots: every stage (scan, Python
kernel, shuffles, windows) runs at most N-wide. Runs are interleaved
A/B/A/B… and the per-config minimum is taken, so slow host windows
hit both configs equally.

Output: BENCH/BASELINE.md with throughput at both sizes + efficiency.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    amplify = int(os.environ.get("FRONTIER_BENCH_AMPLIFY", "400"))
    rounds = int(os.environ.get("FRONTIER_SCALING_ROUNDS", "3"))

    from pyspark.sql import functions as F

    from frontier import synth
    from frontier.spark import parse, schedule
    from frontier.spark.session import get_spark

    os.environ.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/spark-local")
    spark = get_spark(app="frontier-scaling", cores=32,
                      shuffle_partitions=32,
                      extra={"spark.sql.adaptive.enabled": "false"})

    # pages input pinned to tmpfs (the VM drops its page cache)
    pages_path = f"/dev/shm/frontier_bench/pages_x{amplify}"
    if not os.path.exists(os.path.join(pages_path, "_SUCCESS")):
        synth.pages_from_documents(spark, sf_dir, amplify=amplify) \
            .write.mode("overwrite").parquet(pages_path)
    robots = synth.robots_df(spark).cache()
    robots.count()

    n_pages = spark.read.parquet(pages_path).count()

    def headline(par: int) -> float:
        spark.conf.set("spark.sql.shuffle.partitions", str(par))
        pages = spark.read.parquet(pages_path).coalesce(par)
        frontier = pages.select("url", "warc_ts") \
            .withColumn("priority", F.lit(0))
        staged = schedule.with_host(schedule.with_url_canon(frontier))
        gated = schedule.apply_robots(staged, robots) \
            .where(F.col("robots_allowed"))
        cut = schedule.politeness_cut(gated, budget_per_host=1000)
        ordered = schedule.fetch_order(cut, num_partitions=par) \
            .select("url")
        fetched = pages.join(F.broadcast(ordered), "url")
        t0 = time.perf_counter()
        parse.extract_main_text(fetched) \
            .where(F.col("text").isNotNull()).count()
        return time.perf_counter() - t0

    # warm both shapes once
    headline(8)
    headline(32)

    best = {8: 1e9, 32: 1e9}
    for r in range(rounds):
        for par in (8, 32):
            took = headline(par)
            best[par] = min(best[par], took)
            print(f"round {r} par={par}: {took:.2f}s", flush=True)

    t8, t32 = best[8], best[32]
    thr8, thr32 = n_pages / t8, n_pages / t32
    eff = thr32 / (4 * thr8)

    md = f"""# BENCH — measured baseline (this engine)

## Two-cluster-size scaling (north_rule evidence)

No multi-node cluster exists in this sandbox, and separate-JVM runs
on this VM drift up to 7x from minute-scale host contention — so the
scaling evidence uses a single local[32] JVM in which the SAME job is
limited to N-wide parallelism (input coalesced to N partitions,
spark.sql.shuffle.partitions = N, AQE off), interleaved N/4N x
{rounds} rounds, per-config minimum. N=8 vs N=32 proxies N vs 4N
executor slots for every stage: scan, Arrow parse kernel, politeness
windows, fetch join.

Job = full frontier round over {n_pages:,} synthetic Common-Crawl
pages ({sf_dir}, amplify x{amplify}): canonicalize → robots gate →
salted two-phase per-host budget cut → fetch-ordered batch →
broadcast-fetch → MHTML parse + byte-faithful main-text extraction.

| parallelism | wall sec | URLs scheduled+parsed/sec |
|---|---|---|
| 8-wide  (N proxy)  | {t8:.2f} | {thr8:,.0f} |
| 32-wide (4N proxy) | {t32:.2f} | {thr32:,.0f} |

**Scaling efficiency N→4N = {eff:.3f}** (target ≥ 0.8, BASELINE.json)

Caveats, disclosed: single-JVM local mode shares one memory bus, GC,
and shuffle disk across both configs — a real 4N-executor cluster
scales those independently. Python workers of the 8-wide config may
use idle cores for IPC (same as any local[8] run on a 32-core host).

## Reference comparison

The reference (Querela/MHTML) is a single-threaded stdlib-only
library with no published benchmarks (README.rst, repo-wide — see
/root/repo/BASELINE.md). Its per-document cost is one linear parse
pass; this engine's kernel does the same work per page inside Arrow
batches, so single-core throughput is comparable by construction and
all scaling beyond 1 core is net new capability.

Raw: best-of-{rounds} interleaved, {json.dumps({str(k): round(v, 2)
    for k, v in best.items()})}
"""
    out_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as fh:
        fh.write(md)
    print(f"wrote {out_path}; efficiency={eff:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
