"""The crawl loop: schedule → fetch → parse → discover → update state.

Batch-iterative BFS with per-round Iceberg-style snapshot commits
(SURVEY.md §7.4). Each round:

1. robots gate — blocked URLs leave the frontier permanently
2. politeness budget — skew-safe per-host top-k (schedule.py)
3. "fetch" — in the sandbox a join against the synthetic ``pages``
   table on ``url_canon`` (on a real cluster this stage is the HTTP
   fetcher); parse + main-text extraction is the Arrow kernel
4. discovery — outbound links, canonicalized, priority = parent+1,
   merged min-(priority, warc_ts) per new URL (deterministic at any
   parallelism; mirrored by frontier.kernel.simulator)
5. seen-set update — partitioned Bloom ∪ batch, exact table appended
6. snapshot commit — frontier / seen / bloom / results + metrics;
   ``resume=True`` restarts from the latest manifest and produces
   identical final state

Scale notes: every per-round shuffle keys on url_canon or host; the
pages join is a sort-merge join on url_canon at 10^10 rows (both sides
bucketable by the same key in a real deployment); results append,
never rewrite. Plan-lineage truncation comes free from the per-round
parquet checkpoint — without it the iterative plan would grow
unboundedly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import schedule as sched
from . import seen as seenmod
from .parse import extract_main_text, parse_pages, discovered_links
from .snapshots import SnapshotStore

FRONTIER_COLS = ["url_canon", "priority", "warc_ts"]


def prepare_page_index(pages: DataFrame) -> DataFrame:
    """pages → fetch-lookup index: url_canon, warc_ts, text, links.

    One parse pass (two kernels share the scan); cached by caller.
    """
    text_df = sched.with_url_canon(extract_main_text(pages)) \
        .select("url_canon", "warc_ts", "text")
    res = parse_pages(pages, with_content=False)
    links_df = (discovered_links(res)
                .groupBy("src_url")
                .agg(F.collect_list("url").alias("links")))
    links_df = sched.with_url_canon(links_df, "src_url") \
        .select("url_canon", "links")
    return (text_df.join(links_df, "url_canon", "left")
            .withColumn("links", F.coalesce("links", F.array()))
            .dropDuplicates(["url_canon"]))


def crawl(spark: SparkSession, page_index: DataFrame, seeds: DataFrame,
          robots: DataFrame | None, store: SnapshotStore,
          budget_per_host: int = 10, max_rounds: int = 5,
          num_buckets: int = seenmod.DEFAULT_NUM_BUCKETS,
          resume: bool = False) -> dict:
    """Run (or resume) a crawl; returns the final manifest dict.

    seeds: (url, priority, source_rank) — source_rank breaks dup-seed
    ties first-wins, mirroring merge.py:30-44.
    """
    latest = store.manifest() if resume else None
    if latest is not None:
        frontier = store.read(spark, "frontier")
        seen_exact = store.read(spark, "seen_exact")
        seen_bloom = store.read(spark, "seen_bloom")
        blocked = store.read(spark, "blocked")
        start_round = latest["metrics"]["round"] + 1
    else:
        frontier = _seed_frontier(seeds)
        seen_exact = spark.createDataFrame([], "url_canon string")
        seen_bloom = spark.createDataFrame([], seenmod.BLOOM_DDL)
        blocked = spark.createDataFrame([], "url_canon string")
        start_round = 0

    for round_no in range(start_round, max_rounds):
        if frontier.isEmpty():
            break

        staged = sched.with_host(frontier)

        # 1. robots gate
        if robots is not None:
            staged = sched.apply_robots(staged, robots)
            newly_blocked = staged.where(~F.col("robots_allowed")) \
                .select("url_canon")
            staged = staged.where(F.col("robots_allowed"))
            blocked = blocked.unionByName(newly_blocked) \
                .dropDuplicates(["url_canon"])

        # 2. politeness budget (skew-safe two-phase top-k)
        batch = sched.politeness_cut(staged, budget_per_host) \
            .select(*FRONTIER_COLS, "host", "rank_in_host")
        if batch.isEmpty():
            break
        leftover = staged.select(*FRONTIER_COLS) \
            .join(batch.select("url_canon"), "url_canon", "left_anti")

        # 3. fetch + parse (page_index lookup). The scheduled batch is
        # budget-bounded (hosts x budget) and slim — broadcast it onto
        # the page index so page text/links never shuffle; URLs with
        # no page simply don't match (inner join), and seen-marking
        # uses `batch` directly so nothing is lost.
        fetched = page_index.select("url_canon",
                                    F.col("warc_ts").alias("page_ts"),
                                    "text", "links") \
            .join(F.broadcast(batch.select("url_canon", "priority")),
                  "url_canon")
        results = fetched.where(F.col("text").isNotNull()) \
            .select("url_canon", "text",
                    F.lit(round_no).alias("round"))

        # 4. discovery: explode links, canon, min-merge per new url
        raw_links = (fetched
                     .where(F.col("links").isNotNull())
                     .select(F.col("priority"), F.col("page_ts"),
                             F.explode("links").alias("link")))
        candidates = (sched.with_url_canon(raw_links, "link")
                      .where(F.col("url_canon").isNotNull())
                      .groupBy("url_canon")
                      .agg(F.min(F.struct(
                          (F.col("priority") + 1).alias("priority"),
                          F.col("page_ts").alias("warc_ts"))).alias("o"))
                      .select("url_canon", "o.priority", "o.warc_ts"))

        # 5. seen update + unseen filter
        new_seen = seen_exact.unionByName(batch.select("url_canon")) \
            .dropDuplicates(["url_canon"])
        batch_bloom = seenmod.build(batch.select("url_canon"),
                                    num_buckets=num_buckets)
        new_bloom = seenmod.merge_blooms(seen_bloom, batch_bloom) \
            if not seen_bloom.isEmpty() else batch_bloom

        fresh = seenmod.filter_unseen(candidates, new_bloom, new_seen,
                                      num_buckets=num_buckets)
        fresh = fresh.join(blocked, "url_canon", "left_anti") \
            .join(leftover.select("url_canon"), "url_canon", "left_anti")

        new_frontier = leftover.unionByName(fresh.select(*FRONTIER_COLS))

        # 6. snapshot commit (also truncates plan lineage)
        metrics = {
            "round": round_no,
            "scheduled": batch.count(),
            "extracted_texts": results.count(),
            "discovered_new": fresh.count(),
            "frontier_size": new_frontier.count(),
            "budget_per_host": budget_per_host,
        }
        store.commit({
            "frontier": new_frontier,
            "seen_exact": new_seen,
            "seen_bloom": new_bloom,
            "blocked": blocked,
            "batch": batch,
            "results": results,
        }, metrics)

        frontier = store.read(spark, "frontier")
        seen_exact = store.read(spark, "seen_exact")
        seen_bloom = store.read(spark, "seen_bloom")
        blocked = store.read(spark, "blocked")

    return store.manifest() or {}


def _seed_frontier(seeds: DataFrame) -> DataFrame:
    """Seed list → initial frontier. Dup URLs resolve first-wins by
    source_rank (the reference's known_urls insertion semantics,
    merge.py:30-44), then min-(priority, warc_ts) like any offer."""
    canon = sched.with_url_canon(seeds) \
        .where(F.col("url_canon").isNotNull())
    from pyspark.sql import Window
    w = Window.partitionBy("url_canon").orderBy("source_rank")
    return (canon
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("url_canon", "priority",
                    F.timestamp_micros(F.lit(0)).alias("warc_ts")))


def collect_results(spark: SparkSession, store: SnapshotStore) -> DataFrame:
    """Union of per-round results tables across all snapshots."""
    ids = store.snapshot_ids()
    out = None
    for sid in ids:
        df = store.read(spark, "results", sid)
        if df is None:
            continue
        out = df if out is None else out.unionByName(df)
    return out
