"""SparkSession factory tuned for the frontier workload.

Local-mode settings mirror what a 1000-executor cluster deployment
would set per-executor; comments note the at-scale intent so the same
config module serves both (SURVEY.md §4.2, pyspark guide).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "frontier",
              cores: int | None = None,
              shuffle_partitions: int | None = None,
              extra: dict | None = None) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        # local: match cores; cluster: ~2-3x total executor cores, or
        # rely on AQE coalescing from a higher initial value
        shuffle_partitions = max(cores, 8)

    builder = (
        SparkSession.builder
        .master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # host-skewed shuffles: let AQE split oversized partitions
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", os.environ.get("FRONTIER_DRIVER_MEM",
                                                      "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # pages carry KB-scale MHTML blobs here (real crawls: set lower
        # for MB-scale pages). 1024 rows/batch ≈ 2-4 MB Arrow batches —
        # measured 2.5x faster than 256 at 32-way concurrency (fewer
        # allocation/IPC round-trips), still memory-safe per worker
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                os.environ.get("FRONTIER_ARROW_BATCH", "1024"))
        .config("spark.ui.enabled", "false")
        # Constraint propagation is O(expression²) on the staged URL-
        # canon projection (~30 derived columns): PruneFilters alone
        # spent 10.6 s per crawl-round plan deriving constraints it
        # never used (0 effective runs — measured round 4, Catalyst
        # rule dump). Disabling is the documented Spark remedy for
        # large iterative plans; it only drops inferred-filter
        # optimizations, never changes results.
        .config("spark.sql.constraintPropagation.enabled", "false")
        # 128 MiB parquet split targets — at 100 TB this yields ~800k
        # input tasks, the right granularity for 1000 executors
        .config("spark.sql.files.maxPartitionBytes", "134217728")
    )
    for key, value in (extra or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def checkpoint_rdd(df):
    """The java RDD that ``df.localCheckpoint(...)`` persisted.

    ``DataFrame.unpersist()`` only uncaches CacheManager entries
    (``persist()``); a localCheckpoint persists the query's INTERNAL
    RDD directly, so freeing its blocks needs the RDD handle — the
    checkpointed plan is a ``LogicalRDD`` wrapping exactly that RDD.
    Callers hold this handle and ``.unpersist(False)`` it once every
    downstream consumer is done (the lineage is truncated: blocks
    gone = result unrecomputable)."""
    return df._jdf.queryExecution().analyzed().rdd()
