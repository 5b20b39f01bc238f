"""Crawl-LOOP two-width scaling — end-to-end evidence for the
round-2 driver-serial-work cut.

Same single-JVM width-limit methodology as scaling_single_jvm.py, but
the measured unit is a full crawl ROUND through ``crawl.crawl``:
robots gate → salted politeness cut → fetch join → discovery → Bloom
∪ + exact seen update → snapshot COMMIT (parquet writes + footer
metrics + observations). This is the loop whose round-1 shape spent
~6 recomputations of its lineage on driver-side actions; round 2 runs
exactly ONE pre-commit action per round.

Setup (untimed): the fused page index is materialized to tmpfs at N
partitions; seeds = every 5th page. Each timed run starts from a
fresh store (same work every time) in tmpfs.

Output: printed table + BENCH/scaling_crawl_raw.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    amplify = int(os.environ.get("FRONTIER_BENCH_AMPLIFY", "400"))
    rounds = int(os.environ.get("FRONTIER_SCALING_ROUNDS", "2"))
    crawl_rounds = int(os.environ.get("FRONTIER_CRAWL_ROUNDS", "2"))

    from pyspark.sql import functions as F

    from frontier import synth
    from frontier.spark import crawl
    from frontier.spark.session import get_spark
    from frontier.spark.snapshots import SnapshotStore

    os.environ.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/spark-local")
    spark = get_spark(app="frontier-crawl-scaling", cores=32,
                      shuffle_partitions=32,
                      extra={"spark.sql.adaptive.enabled": "false"})

    pages_path = f"/dev/shm/frontier_bench/pages_x{amplify}"
    if not os.path.exists(os.path.join(pages_path, "_SUCCESS")):
        synth.pages_from_documents(spark, sf_dir, amplify=amplify) \
            .write.mode("overwrite").parquet(pages_path)
    index_path = f"/dev/shm/frontier_bench/page_index_x{amplify}"
    if not os.path.exists(os.path.join(index_path, "_SUCCESS")):
        crawl.prepare_page_index(spark.read.parquet(pages_path)) \
            .write.mode("overwrite").parquet(index_path)

    robots = synth.robots_df(spark).cache()
    robots.count()
    n_pages = spark.read.parquet(index_path).count()

    def one_crawl(par: int) -> float:
        spark.conf.set("spark.sql.shuffle.partitions", str(par))
        page_index = spark.read.parquet(index_path).coalesce(par) \
            .persist()
        page_index.count()
        seeds = (page_index
                 .where(F.col("url_canon").isNotNull())
                 .select(F.col("url_canon").alias("url"))
                 .withColumn("priority", F.lit(0))
                 .withColumn("source_rank",
                             F.monotonically_increasing_id()))
        store_dir = f"/dev/shm/frontier_bench/crawl_store_{par}"
        shutil.rmtree(store_dir, ignore_errors=True)
        store = SnapshotStore(store_dir)
        fetch_mode = os.environ.get("FRONTIER_FETCH_MODE", "auto")
        t0 = time.perf_counter()
        crawl.crawl(spark, page_index, seeds, robots, store,
                    budget_per_host=1000, max_rounds=crawl_rounds,
                    num_buckets=64, fetch_mode=fetch_mode)
        took = time.perf_counter() - t0
        page_index.unpersist()
        # Local-mode measurement hygiene: broadcast/shuffle artifacts
        # are cleaned by ContextCleaner only when the DRIVER GCs, and
        # a 48g heap may not GC for many minutes — consecutive runs
        # then degrade 2x from accumulated executor-side blocks
        # (measured: 83→162 s across 3 identical crawls; flat with
        # this GC). Real clusters GC per-executor naturally; see also
        # spark.cleaner.periodicGC.interval.
        spark.sparkContext._jvm.System.gc()
        return took

    # Both canon implementations are measured: "jvm" is the cluster
    # default whose width-scaling the north rule grades (Python
    # workers share executor cores on a real cluster); "pandas" is
    # the local-mode default and the absolute-throughput reference
    # here (local Python workers run OUTSIDE the width limit, so its
    # 8-wide times are flattered — see BENCH/BASELINE.md).
    results = {}
    for impl in ("jvm", "pandas"):
        os.environ["FRONTIER_CANON_IMPL"] = impl
        one_crawl(8)
        one_crawl(32)
        best = {8: 1e9, 32: 1e9}
        for rnd in range(rounds):
            for par in (8, 32):
                took = one_crawl(par)
                best[par] = min(best[par], took)
                print(f"[{impl}] round {rnd} par={par}: {took:.2f}s",
                      flush=True)
        eff = best[8] / best[32] / 4
        results[impl] = (best[8], best[32], eff)
        print(f"crawl loop [{impl}]: {best[8]:.2f}s -> {best[32]:.2f}s"
              f"  eff={eff:.3f}", flush=True)

    md = [f"# crawl-loop scaling raw ({n_pages:,} pages, "
          f"{crawl_rounds} crawl rounds, budget 1000/host)\n",
          "| canon impl | 8-wide s | 32-wide s | raw N→4N eff |",
          "|---|---|---|---|"]
    for impl, (t8, t32, eff) in results.items():
        md.append(f"| {impl} | {t8:.2f} | {t32:.2f} | {eff:.3f} |")
    md.append("")
    # preserve manually-recorded sections (streaming-loop regimes,
    # standalone clean-window runs): everything from the first
    # non-crawl-loop '# ' heading onward survives the rewrite
    raw_path = os.path.join(REPO, "BENCH", "scaling_crawl_raw.md")
    tail = ""
    if os.path.exists(raw_path):
        with open(raw_path) as fh:
            old = fh.read()
        for i, line in enumerate(old.splitlines(keepends=True)):
            if line.startswith("# ") and \
                    not line.startswith("# crawl-loop scaling raw"):
                tail = "".join(old.splitlines(keepends=True)[i:])
                break
    with open(raw_path, "w") as fh:
        fh.write("\n".join(md) + "\n")
        if tail:
            fh.write("\n" + tail)
    spark.stop()


if __name__ == "__main__":
    main()
