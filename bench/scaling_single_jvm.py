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

Round 2 measures BOTH fetch strategies at both widths:

* broadcast-fetch — the scheduled batch is broadcast onto the pages
  scan. The broadcast hash-relation build (~1M url strings here) is
  DRIVER-side serial work: the round-1 Amdahl fit attributed ~7.8 s
  of constant cost largely to it, capping local efficiency near 0.5.
* bucketed co-partitioned fetch — pages live in a hash-bucketed table
  (one bucket per slot, one file per bucket), the batch shuffles with
  a SHUFFLE_HASH hint. No broadcast build at all; the only serial
  residue is stage dispatch. Buckets are written per width (8 and 32)
  because a real N-executor cluster would bucket at multiples of its
  own width.

Output: BENCH/BASELINE.md with throughput at both sizes + efficiency
for both strategies.
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
                      extra={"spark.sql.adaptive.enabled": "false",
                             "spark.sql.warehouse.dir":
                                 "/dev/shm/frontier_bench/warehouse"})

    # pages input pinned to tmpfs (the VM drops its page cache)
    pages_path = f"/dev/shm/frontier_bench/pages_x{amplify}"
    if not os.path.exists(os.path.join(pages_path, "_SUCCESS")):
        synth.pages_from_documents(spark, sf_dir, amplify=amplify) \
            .write.mode("overwrite").parquet(pages_path)
    robots = synth.robots_df(spark).cache()
    robots.count()
    n_pages = spark.read.parquet(pages_path).count()

    # bucketed copies, one per width: repartition(par, url) before the
    # bucketed write aligns writer tasks with bucket ids → ONE file per
    # bucket → the scan yields exactly par partitions (width limit) and
    # no exchange on the join
    for par in (8, 32):
        tbl = f"pages_x{amplify}_b{par}"
        if not spark.catalog.tableExists(tbl):
            (spark.read.parquet(pages_path)
             .repartition(par, "url")
             .write.mode("overwrite")
             .bucketBy(par, "url")
             .option("path", f"/dev/shm/frontier_bench/{tbl}")
             .format("parquet")
             .saveAsTable(tbl))

    from frontier.spark import urlcanon

    def schedule_batch(pages, par):
        frontier = pages.select("url", "warc_ts") \
            .withColumn("priority", F.lit(0))
        staged = schedule.with_host(schedule.with_url_canon(frontier))
        # pruned gate host set from the RAW url column (bench.py):
        # no barrier, canon single-read, the prune's extra work is a
        # parallel column re-scan — the best-scaling pruned shape
        # (variant x width matrix in BENCH/BASELINE.md §robots-prune)
        hosts = pages.select(
            urlcanon.host_expr(F.col("url"), validate=False)
            .alias("host"))
        gated = schedule.apply_robots(staged, robots,
                                      prune_hosts=hosts) \
            .where(F.col("robots_allowed"))
        cut = schedule.politeness_cut(gated, budget_per_host=1000)
        return schedule.fetch_order(cut, num_partitions=par) \
            .select("url")

    def headline_broadcast(par: int) -> float:
        spark.conf.set("spark.sql.shuffle.partitions", str(par))
        pages = spark.read.parquet(pages_path).coalesce(par)
        ordered = schedule_batch(pages, par)
        fetched = pages.join(F.broadcast(ordered), "url")
        t0 = time.perf_counter()
        parse.extract_main_text(fetched) \
            .where(F.col("text").isNotNull()).count()
        return time.perf_counter() - t0

    def headline_bucketed(par: int) -> float:
        spark.conf.set("spark.sql.shuffle.partitions", str(par))
        pages = spark.table(f"pages_x{amplify}_b{par}")
        ordered = schedule_batch(pages, par)
        fetched = pages.join(ordered.hint("shuffle_hash"), "url")
        t0 = time.perf_counter()
        parse.extract_main_text(fetched) \
            .where(F.col("text").isNotNull()).count()
        return time.perf_counter() - t0

    modes = {"broadcast": headline_broadcast,
             "bucketed": headline_bucketed}
    # warm every shape once
    for fn in modes.values():
        fn(8)
        fn(32)

    best = {m: {8: 1e9, 32: 1e9} for m in modes}
    for rnd in range(rounds):
        for par in (8, 32):
            for m, fn in modes.items():
                took = fn(par)
                best[m][par] = min(best[m][par], took)
                print(f"round {rnd} par={par} {m}: {took:.2f}s",
                      flush=True)

    rows = []
    for m in modes:
        t8, t32 = best[m][8], best[m][32]
        thr8, thr32 = n_pages / t8, n_pages / t32
        eff = thr32 / (4 * thr8)
        rows.append((m, t8, t32, thr8, thr32, eff))

    table = "\n".join(
        f"| {m} | {t8:.2f} | {t32:.2f} | {thr8:,.0f} | {thr32:,.0f} "
        f"| **{eff:.3f}** |"
        for m, t8, t32, thr8, thr32, eff in rows)

    md = f"""# BENCH — measured baseline (this engine)

## Two-cluster-size scaling (north_rule evidence)

No multi-node cluster exists in this sandbox, and separate-JVM runs
on this VM drift up to 7x from minute-scale host contention — so the
scaling evidence uses a single local[32] JVM in which the SAME job is
limited to N-wide parallelism (input laid out as exactly N
partitions, spark.sql.shuffle.partitions = N, AQE off), interleaved
N/4N x {rounds} rounds, per-config minimum. N=8 vs N=32 proxies
N vs 4N executor slots for every stage: scan, Arrow parse kernel,
politeness windows, fetch join.

Job = full frontier round over {n_pages:,} synthetic Common-Crawl
pages ({sf_dir}, amplify x{amplify}): canonicalize → robots gate →
salted two-phase per-host budget cut → fetch-ordered batch → fetch
join → MHTML parse + byte-faithful main-text extraction. Two fetch
strategies (crawl.fetch_pages):

| fetch mode | 8-wide s | 32-wide s | 8-wide URLs/s | 32-wide URLs/s | N→4N efficiency |
|---|---|---|---|---|---|
{table}

(target ≥ 0.8, BASELINE.json)

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

Raw: best-of-{rounds} interleaved, {json.dumps({m: {str(k): round(v, 2)
    for k, v in d.items()} for m, d in best.items()})}
"""
    out_path = os.path.join(REPO, "BENCH", "scaling_raw.md")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as fh:
        fh.write(md)
    for m, t8, t32, thr8, thr32, eff in rows:
        print(f"{m}: eff={eff:.3f} ({t8:.2f}s -> {t32:.2f}s)")
    print(f"wrote {out_path}")
    spark.stop()


if __name__ == "__main__":
    main()
