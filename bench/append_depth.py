"""Append-table DEPTH pressure test (round-5, r4 VERDICT item 8).

A 10^3-10^4-round crawl appends one seen_exact/blocked delta directory
per round. This harness drives the snapshot store through a 1000-round
append cadence WITHOUT the crawl (synthetic 10k-row deltas — the
store's cost model depends on chain shape, not row content) and
measures the three costs that decide maintenance cadence:

* commit latency as the chain deepens (manifest carries the full
  parent path list: does writing round 1000 cost more than round 10?);
* read latency of the append table at increasing chain depth (every
  read unions N directories — the listing fan-out rewrite_data_files
  exists to kill);
* rewrite_data_files + expire cost at depth 1000, and the read cost
  after (the payoff).

Output: printed table + a maintenance-cadence section appended to
BENCH/append_depth_raw.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    rounds = int(os.environ.get("FRONTIER_DEPTH_ROUNDS", "1000"))
    delta_rows = int(os.environ.get("FRONTIER_DEPTH_DELTA", "10000"))
    probe_depths = sorted({10, 50, 100, 250, 500, rounds})

    from frontier.spark.session import get_spark
    from frontier.spark.snapshots import SnapshotStore

    os.environ.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/spark-local")
    spark = get_spark(app="append-depth", cores=8, shuffle_partitions=8)

    root = "/dev/shm/frontier_bench/append_depth"
    shutil.rmtree(root, ignore_errors=True)
    store = SnapshotStore(root)

    # one source relation, re-sliced per round (generation untimed)
    base = spark.range(rounds * delta_rows).selectExpr(
        "concat('https://h', cast(id % 997 as string), '.example/p',"
        " cast(id as string)) AS url_canon", "id AS rnd").cache()
    base.count()

    commit_lap: dict[int, float] = {}
    read_lap: dict[int, float] = {}
    rows_at: dict[int, int] = {}
    for r in range(rounds):
        delta = base.where(
            (base.rnd >= r * delta_rows)
            & (base.rnd < (r + 1) * delta_rows)).select("url_canon")
        t0 = time.perf_counter()
        store.commit({"seen_exact": delta}, {"round": r},
                     append={"seen_exact"})
        took = time.perf_counter() - t0
        depth = r + 1
        if depth in probe_depths:
            commit_lap[depth] = round(took, 3)
            t0 = time.perf_counter()
            n = store.read(spark, "seen_exact").count()
            read_lap[depth] = round(time.perf_counter() - t0, 3)
            rows_at[depth] = n
            print(f"depth {depth:5d}: commit {commit_lap[depth]:.3f}s"
                  f"  read {read_lap[depth]:.3f}s  rows {n:,}",
                  flush=True)

    # maintenance pair at full depth
    t0 = time.perf_counter()
    store.rewrite_append_table(spark, "seen_exact")
    t_rewrite = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    expired = store.expire(keep_last=2)
    t_expire = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    n_after = store.read(spark, "seen_exact").count()
    t_read_after = round(time.perf_counter() - t0, 3)
    assert n_after == rounds * delta_rows, n_after
    # append AFTER rewrite keeps working (chain restarts at depth 1)
    delta = base.limit(10).select("url_canon")
    store.commit({"seen_exact": delta}, {"round": rounds},
                 append={"seen_exact"})
    n_chain = len(store.manifest()["tables"]["seen_exact"])
    assert n_chain == 2, n_chain

    md = [f"# append-table depth pressure ({rounds} rounds, "
          f"{delta_rows} rows/delta)\n",
          "| depth | commit s | read s | rows |",
          "|---|---|---|---|"]
    for d in probe_depths:
        md.append(f"| {d} | {commit_lap[d]:.3f} | {read_lap[d]:.3f} "
                  f"| {rows_at[d]:,} |")
    md += ["",
           f"rewrite_data_files at depth {rounds}: {t_rewrite}s; "
           f"expire(keep_last=2) reclaimed {len(expired)} snapshots in "
           f"{t_expire}s; read after rewrite: {t_read_after}s "
           f"(vs {read_lap[rounds]}s at depth {rounds}).", ""]
    out = os.path.join(REPO, "BENCH", "append_depth_raw.md")
    with open(out, "w") as fh:
        fh.write("\n".join(md) + "\n")
    print(f"wrote {out}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
