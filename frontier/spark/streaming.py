"""Structured Streaming wrappers: incremental page ingestion.

The reference is batch-only; the north_rule's crawl rounds are batch
iterations with snapshot checkpoints (crawl.py). This module adds the
streaming face of the same operators for continuous ingestion
deployments: new page files land in a directory (or Kafka topic on a
real cluster), main text + links flow out incrementally, with
watermarked per-window crawl metrics and a stateful per-host rate
limiter (``applyInPandasWithState``).

``trigger(availableNow=True)`` gives exactly-once batch-incremental
runs — the streaming analog of one crawl round — which is what the
tests exercise (no always-on cluster in the sandbox).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .parse import MAIN_TEXT_CANON_DDL, extract_main_text

PAGES_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                "text string, lang string")


def stream_pages(spark: SparkSession, path: str,
                 max_files_per_trigger: int | None = None) -> DataFrame:
    """Directory parquet source of pages (file-arrival streaming)."""
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger",
                               str(max_files_per_trigger))
    return reader.parquet(path)


def stream_extract(pages_stream: DataFrame) -> DataFrame:
    """Incremental main-text extraction — the same Arrow kernel as the
    batch path (stateless mapInArrow works unchanged on streams)."""
    return extract_main_text(pages_stream, with_canon=True)


def crawl_metrics(texts_stream: DataFrame,
                  window: str = "10 minutes",
                  watermark: str = "1 hour") -> DataFrame:
    """Watermarked windowed crawl metrics: pages + extracted texts per
    (event-time window, lang); late pages beyond the watermark drop."""
    return (texts_stream
            .withWatermark("warc_ts", watermark)
            .groupBy(F.window("warc_ts", window).alias("w"), "lang")
            .agg(F.count("*").alias("n_pages"),
                 F.count("text").alias("n_texts"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "lang", "n_pages", "n_texts"))


RATE_STATE_DDL = "served bigint"
RATE_OUT_DDL = ("host string, n_requested bigint, n_allowed bigint, "
                "served_total bigint")


def rate_limited_hosts(texts_stream: DataFrame, budget_per_trigger: int,
                       host_col: str = "url_canon") -> DataFrame:
    """Stateful per-host politeness limiter: each host may serve at
    most ``budget_per_trigger`` pages per trigger; the running served
    count persists in GroupState across triggers.

    The streaming twin of schedule.politeness_cut — custom state via
    applyInPandasWithState (the reference has no analog; SURVEY.md
    §2.7 'Streaming').
    """
    hosts = texts_stream.withColumn(
        "host", F.regexp_extract(F.col(host_col),
                                 r"^[a-z][a-z0-9+.-]*://([^/:?#]+)", 1))

    def limiter(key, pdfs, state: GroupState):
        total = state.get[0] if state.exists else 0
        n_req = 0
        for pdf in pdfs:
            n_req += len(pdf)
        allowed = min(n_req, budget_per_trigger)
        total += allowed
        state.update((total,))
        yield pd.DataFrame({"host": [key[0]],
                            "n_requested": [n_req],
                            "n_allowed": [allowed],
                            "served_total": [total]})

    # "append" operator mode: each trigger's per-host row is final, and
    # it keeps the query compatible with file sinks (parquet rejects
    # update-mode streaming writes)
    return (hosts.groupBy("host")
            .applyInPandasWithState(limiter, RATE_OUT_DDL, RATE_STATE_DDL,
                                    "append",
                                    GroupStateTimeout.NoTimeout))


SEEN_STATE_DDL = "first_ts_us bigint"
FIRST_SEEN_OUT_DDL = "url_canon string, warc_ts timestamp, text string"


def first_seen_texts(texts_stream: DataFrame) -> DataFrame:
    """Streaming URL-seen set: emit each url_canon's text exactly ONCE
    across all triggers (first-wins by warc_ts, deterministic) — the
    stateful-streaming twin of the batch crawl's Bloom+exact
    anti-join (seen.filter_unseen) and of the reference's merge
    seen-set (merge.py:30-44).

    State = one bigint per seen url, sharded by Spark's state store
    (RocksDB on a real cluster): the 10^10-url state lives with the
    shuffle partitioning, never on one node. Duplicates inside one
    trigger resolve by min (warc_ts, text) before emission.
    """
    def dedup(key, pdfs, state: GroupState):
        rows = [pdf for pdf in pdfs if len(pdf)]
        if state.exists or not rows:
            return  # already emitted in an earlier trigger
        import pandas as pd2
        all_rows = pd2.concat(rows, ignore_index=True)
        all_rows["_ts"] = all_rows["warc_ts"].astype("int64")
        first = all_rows.sort_values(["_ts", "text"]).iloc[0]
        state.update((int(first["_ts"]),))
        yield pd2.DataFrame({"url_canon": [key[0]],
                             "warc_ts": [first["warc_ts"]],
                             "text": [first["text"]]})

    return (texts_stream
            .where(F.col("url_canon").isNotNull())
            .select("url_canon", "warc_ts", "text")
            .groupBy("url_canon")
            .applyInPandasWithState(dedup, FIRST_SEEN_OUT_DDL,
                                    SEEN_STATE_DDL, "append",
                                    GroupStateTimeout.NoTimeout))


def streaming_crawl_round(spark: SparkSession, pages_path: str,
                          seeds: DataFrame, robots: DataFrame | None,
                          budget_per_host: int,
                          out_path: str, checkpoint: str,
                          max_files_per_trigger: int | None = None):
    """One incremental crawl round as an ``availableNow`` streaming
    job — the streaming twin of ``crawl.crawl(max_rounds=1)``
    (round-2 VERDICT item 9), composing the existing pieces:

    1. schedule the seed frontier exactly like the batch round
       (canon → robots gate → skew-safe politeness cut — all batch:
       the scheduled set is small and static for the round);
    2. stream pages as files land (parquet file source; several
       triggers under availableNow when ``max_files_per_trigger``
       is set);
    3. stream-static broadcast semi-join onto the scheduled set —
       page bytes never shuffle, same property as the batch fetch;
    4. incremental main-text extraction (same Arrow kernel);
    5. exactly-once per url across triggers via the stateful seen
       set (:func:`first_seen_texts`);
    6. append results parquet (url_canon, text) + checkpoint.

    tests/test_streaming.py proves the results table is identical to
    ``crawl.crawl(max_rounds=1)``'s round-0 results over the same
    pages/seeds/robots/budget.
    """
    from . import crawl as crawlmod
    from . import schedule as sched

    frontier = crawlmod._seed_frontier(seeds)
    batch = sched.schedule(frontier, robots, budget_per_host) \
        .select("url_canon")
    stream = stream_pages(spark, pages_path, max_files_per_trigger)
    texts = stream_extract(stream) \
        .join(F.broadcast(batch), "url_canon") \
        .where(F.col("text").isNotNull())
    once = first_seen_texts(texts).select("url_canon", "text")
    return run_available_now(once, out_path, checkpoint)


def run_available_now(df: DataFrame, out_path: str, checkpoint: str,
                      output_mode: str = "append"):
    """Run a streaming DF to parquet with availableNow (one
    batch-incremental pass), blocking until done."""
    query = (df.writeStream
             .outputMode(output_mode)
             .trigger(availableNow=True)
             .option("checkpointLocation", checkpoint)
             .format("parquet")
             .option("path", out_path)
             .start())
    query.awaitTermination()
    return query
