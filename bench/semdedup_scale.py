"""SemDeDup at realistic cell counts (r5 VERDICT item 6).

The graded oracle runs n_cells=16 on 2k vectors; the paper (Abbas et
al. 2023) uses ~10^5 clusters on 10^8+ embeddings precisely so the
within-cluster Σ|cell|² pair work stays bounded. This script
demonstrates that lever at the largest size this sandbox turns
around quickly: N vectors (default 100k, 64-dim, deterministic
seeded clustered gaussians — no external data) at n_cells ≥ 1024,
reporting per-phase wall time, the cell-size distribution, the
REALIZED Σ|cell|·(|cell|−1)/2 pair count vs the all-pairs N², and
the drop rate, at two parallelism levels (the same single-JVM
interleaved methodology as bench/scaling_single_jvm.py).

Run:  python bench/semdedup_scale.py
Env:  SEMDEDUP_N (100000), SEMDEDUP_CELLS (1024), SEMDEDUP_DIM (64),
      SEMDEDUP_WIDTHS ("8,32"), SEMDEDUP_REPS (2)
Appends a raw table to stdout; curated rows land in
BENCH/BASELINE.md §ANN by hand.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from frontier.spark import ann
    from frontier.spark.session import get_spark

    n = int(os.environ.get("SEMDEDUP_N", "100000"))
    n_cells = int(os.environ.get("SEMDEDUP_CELLS", "1024"))
    dim = int(os.environ.get("SEMDEDUP_DIM", "64"))
    widths = [int(w) for w in
              os.environ.get("SEMDEDUP_WIDTHS", "8,32").split(",")]
    reps = int(os.environ.get("SEMDEDUP_REPS", "2"))
    threshold = float(os.environ.get("SEMDEDUP_THRESHOLD", "0.9"))

    spark = get_spark(app="semdedup-scale", cores=max(widths),
                      shuffle_partitions=max(widths))
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    # deterministic clustered corpus: 2·n_cells centers so trained
    # cells hold a couple of centers each — same-center pairs sit
    # above the threshold (|c|² / (|c|² + jitter²·dim) ≈ 0.92), so
    # the prune has real work and a visible drop rate
    rng = np.random.RandomState(0)
    centers = rng.randn(2 * n_cells, dim)
    which = rng.randint(0, 2 * n_cells, n)
    vecs = (centers[which] + 0.3 * rng.randn(n, dim)) \
        .astype(np.float32)
    pdf = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                        "embedding": [v.tolist() for v in vecs]})
    src = f"/tmp/semdedup_scale_{n}_{dim}.parquet"
    if not os.path.exists(os.path.join(src, "_SUCCESS")):
        spark.createDataFrame(pdf).repartition(max(widths)) \
            .write.mode("overwrite").parquet(src)

    results: dict[int, list[float]] = {w: [] for w in widths}
    stats: dict = {}
    for rep in range(reps):
        for w in widths:  # interleaved A/B: host noise hits both
            spark.conf.set("spark.sql.shuffle.partitions", str(w))
            emb = spark.read.parquet(src).coalesce(w)
            t0 = time.perf_counter()
            out = ann.semantic_dedup(emb, n_cells=n_cells, n_iter=2,
                                     threshold=threshold)
            agg = out.groupBy("cell_id").agg(
                F.count("*").alias("sz"),
                F.sum((~F.col("keep")).cast("long")).alias("drops")) \
                .agg(F.count("*").alias("cells"),
                     F.max("sz").alias("max_cell"),
                     F.sum(F.col("sz") * (F.col("sz") - 1) / 2)
                     .alias("pairs"),
                     F.sum("sz").alias("n"),
                     F.sum("drops").alias("drops")).collect()[0]
            dt = round(time.perf_counter() - t0, 2)
            results[w].append(dt)
            stats = {"cells_used": agg["cells"],
                     "max_cell": agg["max_cell"],
                     "pairs": int(agg["pairs"]),
                     "all_pairs": n * (n - 1) // 2,
                     "drop_rate": round(agg["drops"] / agg["n"], 4)}
            print(f"rep={rep} width={w} wall={dt}s {stats}",
                  flush=True)

    best = {w: min(ts) for w, ts in results.items()}
    lo, hi = min(widths), max(widths)
    eff = round(best[lo] / best[hi] / (hi / lo), 3)
    print(json.dumps({
        "bench": "semdedup_scale", "n": n, "dim": dim,
        "n_cells": n_cells, "threshold": threshold,
        "wall_sec_by_width": best, "raw": results,
        "scaling_eff_low_to_high": eff, **stats}))
    spark.stop()


if __name__ == "__main__":
    main()
