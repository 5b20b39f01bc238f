"""Structured Streaming face of the engine (availableNow triggers)."""

import os

import pyspark.sql.functions as F
import pytest

from frontier import synth
from frontier.spark import streaming


@pytest.fixture(scope="module")
def pages_dir(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("stream_pages"))
    synth.pages_from_documents(spark, sf_dir) \
        .write.mode("overwrite").parquet(path)
    return path


def test_stream_extract_matches_batch(spark, sf_dir, pages_dir,
                                      tmp_path_factory):
    out = str(tmp_path_factory.mktemp("stream_out"))
    ckpt = str(tmp_path_factory.mktemp("stream_ckpt"))
    stream = streaming.stream_extract(
        streaming.stream_pages(spark, pages_dir))
    streaming.run_available_now(stream, out, ckpt)

    got = spark.read.parquet(out)
    batch = spark.read.parquet(pages_dir)
    assert got.count() == batch.count()
    joined = got.select("url", F.col("text").alias("stream_text")) \
        .join(batch.select("url", "text"), "url")
    mismatch = joined.where(
        ~((F.col("stream_text") == F.col("text")) |
          (F.col("stream_text").isNull() & F.col("text").isNull()))
    ).count()
    assert mismatch == 0


def test_stream_incremental_second_batch(spark, sf_dir, pages_dir,
                                         tmp_path_factory):
    """availableNow is exactly-once: a second run with new files only
    processes the new files."""
    out = str(tmp_path_factory.mktemp("inc_out"))
    ckpt = str(tmp_path_factory.mktemp("inc_ckpt"))
    src = str(tmp_path_factory.mktemp("inc_src"))

    batch = spark.read.parquet(pages_dir)
    first = batch.limit(100)
    first.write.mode("append").parquet(src)
    stream = streaming.stream_extract(streaming.stream_pages(spark, src))
    streaming.run_available_now(stream, out, ckpt)
    n1 = spark.read.parquet(out).count()

    batch.limit(150).write.mode("append").parquet(src)
    stream = streaming.stream_extract(streaming.stream_pages(spark, src))
    streaming.run_available_now(stream, out, ckpt)
    n2 = spark.read.parquet(out).count()
    assert n1 == 100
    assert n2 == 250  # 100 + 150 appended rows, no reprocessing dups


def test_crawl_metrics_watermark(spark, sf_dir, pages_dir,
                                 tmp_path_factory):
    out = str(tmp_path_factory.mktemp("met_out"))
    ckpt = str(tmp_path_factory.mktemp("met_ckpt"))
    # append-mode windows only emit once the watermark passes them in a
    # LATER micro-batch — so force several batches (maxFilesPerTrigger)
    # and keep the watermark shorter than the corpus' event-time span
    stream = streaming.crawl_metrics(
        streaming.stream_extract(
            streaming.stream_pages(spark, pages_dir,
                                   max_files_per_trigger=2)),
        window="1 minute", watermark="2 minutes")
    streaming.run_available_now(stream, out, ckpt, output_mode="append")
    got = spark.read.parquet(out)
    # 500 pages spread over ~500s → ~9 one-minute windows × langs
    assert got.count() > 0
    assert got.agg(F.sum("n_pages")).first()[0] > 0


def test_rate_limited_hosts_state(spark, sf_dir, pages_dir,
                                  tmp_path_factory):
    out = str(tmp_path_factory.mktemp("rate_out"))
    ckpt = str(tmp_path_factory.mktemp("rate_ckpt"))
    stream = streaming.rate_limited_hosts(
        streaming.stream_extract(streaming.stream_pages(spark, pages_dir)),
        budget_per_trigger=5)
    streaming.run_available_now(stream, out, ckpt, output_mode="append")
    got = spark.read.parquet(out)
    assert got.where(F.col("n_allowed") > 5).count() == 0
    assert got.where(F.col("n_requested") > F.col("n_allowed")).count() > 0


def test_first_seen_texts_exactly_once(spark, sf_dir, pages_dir,
                                       tmp_path_factory):
    """Stateful streaming seen-set: a url emitted in trigger 1 is
    suppressed when the same url arrives again in trigger 2."""
    out = str(tmp_path_factory.mktemp("seen_out"))
    ckpt = str(tmp_path_factory.mktemp("seen_ckpt"))
    src = str(tmp_path_factory.mktemp("seen_src"))

    batch = spark.read.parquet(pages_dir)
    batch.limit(100).write.mode("append").parquet(src)
    stream = streaming.first_seen_texts(
        streaming.stream_extract(streaming.stream_pages(spark, src)))
    streaming.run_available_now(stream, out, ckpt, output_mode="append")
    n1 = spark.read.parquet(out).count()
    assert n1 == 100

    # second batch: 150 rows of which 100 are the SAME urls again
    batch.limit(150).write.mode("append").parquet(src)
    stream = streaming.first_seen_texts(
        streaming.stream_extract(streaming.stream_pages(spark, src)))
    streaming.run_available_now(stream, out, ckpt, output_mode="append")
    got = spark.read.parquet(out)
    assert got.count() == 150  # only the 50 new urls added
    assert got.groupBy("url_canon").count() \
        .where(F.col("count") > 1).count() == 0


def test_streaming_crawl_round_equals_batch_round(spark, sf_dir,
                                                  pages_dir,
                                                  tmp_path_factory):
    """The availableNow streaming crawl round must produce the exact
    results table of crawl.crawl(max_rounds=1) over the same pages,
    seeds, robots, and budget — several triggers forced via
    maxFilesPerTrigger so exactly-once state is actually exercised."""
    from frontier.spark import crawl
    from frontier.spark.snapshots import SnapshotStore

    seeds = synth.seeds_from_documents(spark, sf_dir).cache()
    robots = synth.robots_df(spark).cache()
    budget = 3

    # batch round
    pages = spark.read.parquet(pages_dir)
    page_index = crawl.prepare_page_index(pages).cache()
    store = SnapshotStore(str(tmp_path_factory.mktemp("batch_round")))
    crawl.crawl(spark, page_index, seeds, robots, store,
                budget_per_host=budget, max_rounds=1, num_buckets=8)
    batch_results = {(r.url_canon, r.text) for r in
                     store.read(spark, "results").collect()}

    # streaming round over the same parquet directory
    out = str(tmp_path_factory.mktemp("stream_round_out"))
    ckpt = str(tmp_path_factory.mktemp("stream_round_ckpt"))
    streaming.streaming_crawl_round(
        spark, pages_dir, seeds, robots, budget, out, ckpt,
        max_files_per_trigger=1)
    got = {(r.url_canon, r.text) for r in
           spark.read.parquet(out).collect()}
    assert got == batch_results and len(got) > 0


def test_streaming_crawl_multiround_equals_batch(spark, sf_dir,
                                                 pages_dir,
                                                 tmp_path_factory):
    """The N-round streaming crawl (ONE long-lived incremental query,
    per-host frontier state, filesystem feedback — r4 VERDICT item 3)
    must produce EXACTLY crawl.crawl(max_rounds=N)'s results table —
    same (url_canon, text, round) triples — over the same pages,
    seeds, robots, and budget. That requires the whole frontier
    evolution to match: seen set, first-offer-wins merge, politeness
    order, leftover re-offer, robots entry gate."""
    from frontier.spark import crawl
    from frontier.spark.snapshots import SnapshotStore

    seeds = synth.seeds_from_documents(spark, sf_dir).cache()
    robots = synth.robots_df(spark).cache()
    budget, rounds = 3, 3

    pages = spark.read.parquet(pages_dir)
    page_index = crawl.prepare_page_index(pages).cache()

    store = SnapshotStore(str(tmp_path_factory.mktemp("batch_n")))
    crawl.crawl(spark, page_index, seeds, robots, store,
                budget_per_host=budget, max_rounds=rounds,
                num_buckets=8)
    batch_results = {(r.url_canon, r.text, r.round) for r in
                     crawl.collect_results(spark, store).collect()}

    work = str(tmp_path_factory.mktemp("stream_n"))
    stats = streaming.streaming_crawl(
        spark, page_index, seeds, robots, budget, work,
        max_rounds=rounds)
    got = {(r.url_canon, r.text, r.round) for r in
           spark.read.parquet(os.path.join(work, "results"))
           .collect()}
    assert stats["rounds"] == rounds
    assert got == batch_results and len(got) > 0


def test_streaming_crawl_stops_when_frontier_dry(spark, sf_dir,
                                                 pages_dir,
                                                 tmp_path_factory):
    """With a huge budget the synthetic graph exhausts quickly: the
    loop must stop on its own (a round scheduling zero urls) before
    max_rounds, and match the batch loop's early-stop state."""
    from frontier.spark import crawl
    from frontier.spark.snapshots import SnapshotStore

    seeds = synth.seeds_from_documents(spark, sf_dir).cache()
    pages = spark.read.parquet(pages_dir)
    page_index = crawl.prepare_page_index(pages).cache()

    store = SnapshotStore(str(tmp_path_factory.mktemp("batch_dry")))
    crawl.crawl(spark, page_index, seeds, None, store,
                budget_per_host=10_000, max_rounds=8, num_buckets=8)
    batch_results = {(r.url_canon, r.round) for r in
                     crawl.collect_results(spark, store)
                     .select("url_canon", "round").collect()}

    work = str(tmp_path_factory.mktemp("stream_dry"))
    stats = streaming.streaming_crawl(
        spark, page_index, seeds, None, 10_000, work, max_rounds=8)
    got = {(r.url_canon, r.round) for r in
           spark.read.parquet(os.path.join(work, "results"))
           .select("url_canon", "round").collect()}
    assert stats["rounds"] < 8  # stopped on a dry frontier
    assert got == batch_results


def test_streaming_crawl_resumes_mid_crawl(spark, sf_dir, pages_dir,
                                           tmp_path_factory):
    """Restart safety (north_rule: resumable mid-crawl): run the
    streaming loop for 2 rounds, stop, then re-invoke on the SAME
    work dir with a larger horizon. The checkpoint restores source
    offsets and per-host state (seen set + pending queues), the
    seeded marker prevents re-seeding, and the combined results must
    equal an uninterrupted batch crawl of the full horizon."""
    from frontier.spark import crawl
    from frontier.spark.snapshots import SnapshotStore

    seeds = synth.seeds_from_documents(spark, sf_dir).cache()
    robots = synth.robots_df(spark).cache()
    budget, horizon = 3, 4

    pages = spark.read.parquet(pages_dir)
    page_index = crawl.prepare_page_index(pages).cache()

    store = SnapshotStore(str(tmp_path_factory.mktemp("batch_ref4")))
    crawl.crawl(spark, page_index, seeds, robots, store,
                budget_per_host=budget, max_rounds=horizon,
                num_buckets=8)
    want = {(r.url_canon, r.text, r.round) for r in
            crawl.collect_results(spark, store).collect()}

    work = str(tmp_path_factory.mktemp("stream_resume"))
    first = streaming.streaming_crawl(
        spark, page_index, seeds, robots, budget, work, max_rounds=2)
    assert first["rounds"] == 2
    # resume: same work dir, full horizon — continues at round 2
    second = streaming.streaming_crawl(
        spark, page_index, seeds, robots, budget, work,
        max_rounds=horizon)
    got = {(r.url_canon, r.text, r.round) for r in
           spark.read.parquet(os.path.join(work, "results"))
           .collect()}
    assert got == want and len(got) > 0
    # the resumed run processed only the remaining rounds
    assert all(b >= 2 for b in second["scheduled_per_round"])


def test_streaming_crawl_pinned_state_partitions(spark, sf_dir,
                                                 pages_dir,
                                                 tmp_path_factory):
    """state_partitions pins the state store's partition count to the
    per-trigger delta (the measured width lever: one delta file per
    partition per micro-batch, BENCH/BASELINE.md streaming-loop
    notes) WITHOUT changing results or leaking the narrowed setting
    into the session or the batch-side plans."""
    from frontier.spark import crawl
    from frontier.spark.snapshots import SnapshotStore

    seeds = synth.seeds_from_documents(spark, sf_dir).cache()
    robots = synth.robots_df(spark).cache()
    budget, rounds = 3, 2

    pages = spark.read.parquet(pages_dir)
    page_index = crawl.prepare_page_index(pages).cache()

    store = SnapshotStore(str(tmp_path_factory.mktemp("batch_sp")))
    crawl.crawl(spark, page_index, seeds, robots, store,
                budget_per_host=budget, max_rounds=rounds,
                num_buckets=8)
    want = {(r.url_canon, r.text, r.round) for r in
            crawl.collect_results(spark, store).collect()}

    shuffle_before = spark.conf.get("spark.sql.shuffle.partitions")
    work = str(tmp_path_factory.mktemp("stream_sp"))
    stats = streaming.streaming_crawl(
        spark, page_index, seeds, robots, budget, work,
        max_rounds=rounds, state_partitions=4)
    got = {(r.url_canon, r.text, r.round) for r in
           spark.read.parquet(os.path.join(work, "results"))
           .collect()}
    assert stats["rounds"] == rounds
    assert got == want and len(got) > 0
    # the checkpoint froze exactly 4 state partitions for operator 0
    state_root = os.path.join(work, "ckpt", "state", "0")
    parts = sorted(int(d) for d in os.listdir(state_root)
                   if d.isdigit())
    assert parts == [0, 1, 2, 3]
    # the narrowed width never leaks back into the session
    assert spark.conf.get(
        "spark.sql.shuffle.partitions") == shuffle_before


def test_streaming_crawl_incremental_robots_and_sitemaps(
        spark, sf_dir, pages_dir, tmp_path_factory):
    """r6: the streaming loop with BOTH continuous-ingestion sources
    — sitemap seed offers and in-loop incremental robots acquisition
    (robots_docs=…) — must equal the batch crawl run with the same
    sources, INCLUDING across a restart mid-acquisition (stop after
    2 rounds, resume to the full horizon: the robots_rules state
    table must carry the acquired knowledge over). The state table
    must hold each host at most once and only the touched subset."""
    from frontier.spark import crawl, schedule, sitemaps
    from frontier.spark.snapshots import SnapshotStore

    seeds = synth.seeds_from_documents(spark, sf_dir).cache()
    robots_txt = synth.robots_txt_df(spark).cache()
    offer_rows = sitemaps.discover_offers(
        robots_txt, synth.sitemap_docs_df(spark, sf_dir)).collect()
    sitemaps.release_checkpoints()
    offers_df = spark.createDataFrame(
        offer_rows, "url_canon string, priority int, warc_ts timestamp")
    budget, horizon = 3, 3

    pages = spark.read.parquet(pages_dir)
    page_index = crawl.prepare_page_index(pages).cache()

    store = SnapshotStore(str(tmp_path_factory.mktemp("batch_ir")))
    crawl.crawl(spark, page_index, seeds, None, store,
                budget_per_host=budget, max_rounds=horizon,
                num_buckets=8, robots_docs=robots_txt,
                sitemap_offers=offers_df)
    want = {(r.url_canon, r.text, r.round) for r in
            crawl.collect_results(spark, store).collect()}

    work = str(tmp_path_factory.mktemp("stream_ir"))
    first = streaming.streaming_crawl(
        spark, page_index, seeds, None, budget, work, max_rounds=2,
        robots_docs=robots_txt, sitemap_offers=offers_df)
    assert first["rounds"] == 2
    second = streaming.streaming_crawl(
        spark, page_index, seeds, None, budget, work,
        max_rounds=horizon, robots_docs=robots_txt,
        sitemap_offers=offers_df)
    got = {(r.url_canon, r.text, r.round) for r in
           spark.read.parquet(os.path.join(work, "results"))
           .collect()}
    assert got == want and len(got) > 0
    assert all(b >= 2 for b in second["scheduled_per_round"])

    rules = spark.read.schema(schedule.ROBOTS_DDL) \
        .parquet(os.path.join(work, "robots_rules")).collect()
    hosts = [r.host for r in rules]
    assert len(hosts) == len(set(hosts)), "host re-acquired"
    assert 0 < len(hosts) < 1000, "must be only the touched hosts"


def _write_doc_file(docs_pdf, path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string()),
                        ("lang", pa.string())])
    pq.write_table(pa.Table.from_pandas(docs_pdf, schema=schema,
                                        preserve_index=False), path)


def test_streaming_curate_equals_batch(spark, sf_dir, tmp_path_factory):
    """streaming_curate over an incrementally-arriving corpus selects
    EXACTLY the batch pipeline's docs: exact-dedup reps (min doc_id —
    duplicates injected across files) gated by gopher + frozen-eval
    decontam + frozen-LM floor. Two invocations: the second curates
    only the new arrivals (checkpointed seen-state carries over)."""
    from frontier.spark import textops

    docs_dir = str(tmp_path_factory.mktemp("curate_docs"))
    out = str(tmp_path_factory.mktemp("curate_out"))
    ckpt = str(tmp_path_factory.mktemp("curate_ckpt"))

    base = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text", "lang"))
    # duplicates: every 7th doc re-arrives later under a higher id
    dups = (base.where(F.col("doc_id") % 7 == 0)
            .select((F.col("doc_id") + 100000).alias("doc_id"),
                    "text", "lang"))
    all_docs = base.unionByName(dups)
    pdf = all_docs.orderBy("doc_id").toPandas()
    third = len(pdf) // 3

    # frozen sides, shared verbatim by both paths
    model = textops.unigram_model(base).persist()
    eval_docs = base.where(F.col("doc_id") % 97 == 0).persist()
    min_lp = -3_405_000

    # batch reference: dedup reps + per-doc gates, absent -> drop
    reps = textops.exact_dedup(all_docs).select("doc_id", "text", "lang")
    flags = (reps
             .join(textops.gopher_quality(reps)
                   .select("doc_id", "passes_gopher"), "doc_id")
             .join(textops.decontam_overlap(reps, eval_docs)
                   .select("doc_id",
                           (F.col("n_overlap") == 0).alias("q_d")),
                   "doc_id")
             .join(textops.unigram_logprob(reps, model=model)
                   .select("doc_id", "mean_lp_micro"), "doc_id", "left"))
    expect = {r.doc_id for r in flags.where(
        F.col("passes_gopher") & F.col("q_d")
        & (F.coalesce(F.col("mean_lp_micro"),
                      F.lit(float(min_lp - 1))) >= min_lp)).collect()}
    assert expect, "gates must keep something for the test to mean much"
    dup_ids = {r.doc_id for r in dups.select("doc_id").collect()}
    assert not expect & dup_ids  # min-id reps only

    # invocation 1: first two thirds, one file per trigger
    _write_doc_file(pdf.iloc[:third], f"{docs_dir}/file_000.parquet")
    _write_doc_file(pdf.iloc[third:2 * third],
                    f"{docs_dir}/file_001.parquet")
    r1 = streaming.streaming_curate(
        spark, docs_dir, out, ckpt, model=model, eval_docs=eval_docs,
        min_lp=min_lp, max_files_per_trigger=1)
    assert r1["rounds"] == 2

    # invocation 2: the rest arrives; only IT is curated
    _write_doc_file(pdf.iloc[2 * third:], f"{docs_dir}/file_002.parquet")
    r2 = streaming.streaming_curate(
        spark, docs_dir, out, ckpt, model=model, eval_docs=eval_docs,
        min_lp=min_lp, max_files_per_trigger=1)
    assert list(r2["selected_per_round"]) == [2]

    got = spark.read.parquet(out)
    got_ids = {r.doc_id for r in got.select("doc_id").collect()}
    assert got_ids == expect
    # each survivor emitted exactly once across all rounds
    assert got.count() == len(expect)
    # round-2 output is exclusively late arrivals
    late_ids = set(pdf.iloc[2 * third:]["doc_id"])
    r2_ids = {r.doc_id for r in
              got.where(F.col("round") == 2).collect()}
    assert r2_ids <= late_ids
    model.unpersist()
    eval_docs.unpersist()


def test_streaming_curate_paragraph_gate_equals_batch(
        spark, sf_dir, tmp_path_factory):
    """r6: with paras_path the curate loop maintains the paragraph-
    hash index incrementally across TWO invocations of a split
    corpus; the final selection — streamed survivors anti-joined
    against paragraph_casualties over the accumulated index — must
    equal the batch pipeline (same gates + the q_para rule over the
    full corpus). Casualties must include docs whose verdict only
    became 'drop' after LATER arrivals duplicated their paragraphs —
    the case a per-batch gate cannot decide."""
    from frontier.spark import textops

    docs_dir = str(tmp_path_factory.mktemp("pcurate_docs"))
    out = str(tmp_path_factory.mktemp("pcurate_out"))
    ckpt = str(tmp_path_factory.mktemp("pcurate_ckpt"))
    paras = str(tmp_path_factory.mktemp("pcurate_paras"))
    max_dup = 0.5

    base = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text", "lang"))
    # boilerplate injection: 20 docs gain a shared footer (2 of
    # their 3 paragraphs duplicated), chosen to STRADDLE the
    # invocation split — exactly ONE arrives in invocation 1 (its
    # footer paragraphs are still unique then → kept), the rest in
    # invocation 2 (whose arrival flips the early doc's verdict —
    # the decision a per-batch gate cannot make). Footered ids avoid
    # the %97 eval slice so the footer trips ONLY the paragraph
    # gate, not decontamination.
    base_ids = sorted(r.doc_id for r in base.select("doc_id").collect())
    half = len(base_ids) // 2
    footer_ids = [i for i in base_ids[half - 1:]
                  if i % 97 != 0][:20]
    assert len(footer_ids) == 20 and footer_ids[0] == base_ids[half - 1]
    footer = ("\n\nall rights reserved footer"
              "\n\nterms of service apply")
    docs = base.withColumn(
        "text", F.when(F.col("doc_id").isin(footer_ids),
                       F.concat_ws("", F.col("text"), F.lit(footer)))
        .otherwise(F.col("text")))
    pdf = docs.orderBy("doc_id").toPandas()
    assert int((pdf.iloc[:half]["doc_id"]).isin(footer_ids).sum()) == 1

    model = textops.unigram_model(docs).persist()
    eval_docs = docs.where(F.col("doc_id") % 97 == 0).persist()
    min_lp = -10_000_000  # permissive: the para gate is under test

    # batch reference over the full corpus: the streaming gates plus
    # the paragraph rule (dup fraction > max_dup drops, computed by
    # textops.paragraph_dedup — the casualty-list semantic)
    flags = (docs
             .join(textops.gopher_quality(docs)
                   .select("doc_id", "passes_gopher"), "doc_id")
             .join(textops.decontam_overlap(docs, eval_docs)
                   .select("doc_id",
                           (F.col("n_overlap") == 0).alias("q_d")),
                   "doc_id")
             .join(textops.unigram_logprob(docs, model=model)
                   .select("doc_id", "mean_lp_micro"), "doc_id", "left")
             .join(textops.paragraph_dedup(docs)
                   .groupBy("doc_id")
                   .agg((F.sum(F.col("is_dup").cast("long"))
                         / F.count("*") > max_dup).alias("_pd")),
                   "doc_id", "left"))
    expect = {r.doc_id for r in flags.where(
        F.col("passes_gopher") & F.col("q_d")
        & (F.coalesce(F.col("mean_lp_micro"),
                      F.lit(float(min_lp - 1))) >= min_lp)
        & ~F.coalesce(F.col("_pd"), F.lit(False))).collect()}
    # the footer must actually bite: some doc passing every other
    # gate is dropped by the paragraph rule
    dropped_by_para = {r.doc_id for r in flags.where(
        F.col("passes_gopher") & F.col("q_d")
        & (F.coalesce(F.col("mean_lp_micro"),
                      F.lit(float(min_lp - 1))) >= min_lp)
        & F.coalesce(F.col("_pd"), F.lit(False))).collect()}
    assert dropped_by_para, "test corpus must exercise the gate"

    _write_doc_file(pdf.iloc[:half], f"{docs_dir}/file_000.parquet")
    streaming.streaming_curate(
        spark, docs_dir, out, ckpt, model=model, eval_docs=eval_docs,
        min_lp=min_lp, paras_path=paras)
    early_casualties = {r.doc_id for r in streaming
                        .paragraph_casualties(spark, paras,
                                              max_dup_para=max_dup)
                        .collect()}
    _write_doc_file(pdf.iloc[half:], f"{docs_dir}/file_001.parquet")
    streaming.streaming_curate(
        spark, docs_dir, out, ckpt, model=model, eval_docs=eval_docs,
        min_lp=min_lp, paras_path=paras)

    casualties = streaming.paragraph_casualties(
        spark, paras, max_dup_para=max_dup)
    final = {r.doc_id for r in
             spark.read.parquet(out)
             .join(casualties, "doc_id", "left_anti").collect()}
    assert final == expect and len(final) > 0
    # the late arrivals flipped the early footered doc's verdict
    flipped = {r.doc_id for r in casualties.collect()} \
        - early_casualties
    assert footer_ids[0] in flipped
    model.unpersist()
    eval_docs.unpersist()


def test_streaming_crawl_window_ms_equals_batch(
        spark, sf_dir, pages_dir, tmp_path_factory):
    """r6: Crawl-delay budgets in the STREAMING loop — streaming_crawl
    (window_ms=500) must reproduce crawl(window_ms=500) exactly: the
    per-host cap rides the offer files into the state store (the
    long-lived plan never joins robots), and the cap provably bites
    (fewer results than an uncapped streaming run)."""
    from frontier.spark import crawl
    from frontier.spark.snapshots import SnapshotStore

    seeds = synth.seeds_from_documents(spark, sf_dir).cache()
    robots = synth.robots_df(spark).cache()
    budget, rounds, window_ms = 3, 3, 500

    pages = spark.read.parquet(pages_dir)
    page_index = crawl.prepare_page_index(pages).cache()

    store = SnapshotStore(str(tmp_path_factory.mktemp("batch_w")))
    crawl.crawl(spark, page_index, seeds, robots, store,
                budget_per_host=budget, max_rounds=rounds,
                num_buckets=8, window_ms=window_ms)
    want = {(r.url_canon, r.text, r.round) for r in
            crawl.collect_results(spark, store).collect()}

    work = str(tmp_path_factory.mktemp("stream_w"))
    stats = streaming.streaming_crawl(
        spark, page_index, seeds, robots, budget, work,
        max_rounds=rounds, window_ms=window_ms)
    got = {(r.url_canon, r.text, r.round) for r in
           spark.read.parquet(os.path.join(work, "results"))
           .collect()}
    assert got == want and len(got) > 0

    # the cap must actually bite vs an uncapped streaming run
    work_u = str(tmp_path_factory.mktemp("stream_wu"))
    streaming.streaming_crawl(
        spark, page_index, seeds, robots, budget, work_u,
        max_rounds=rounds)
    uncapped = {(r.url_canon, r.round) for r in
                spark.read.parquet(os.path.join(work_u, "results"))
                .select("url_canon", "round").collect()}
    capped = {(u, rd) for u, _t, rd in got}
    assert capped != uncapped
    assert stats["rounds"] == rounds


def test_streaming_curate_shingle_index_equals_batch(
        spark, sf_dir, tmp_path_factory):
    """r6: the ExactSubstr tier over the INCREMENTAL shingle index —
    two invocations of a split corpus maintain the k-gram index; the
    read-time rewrite (substring_casualty_spans +
    apply_substring_spans) must equal batch substring_dedup over the
    full deduped corpus, and a span whose duplicate arrives LATE
    must appear in the final span set but not the early one."""
    from frontier.spark import textops

    docs_dir = str(tmp_path_factory.mktemp("scur_docs"))
    out = str(tmp_path_factory.mktemp("scur_out"))
    ckpt = str(tmp_path_factory.mktemp("scur_ckpt"))
    shingles = str(tmp_path_factory.mktemp("scur_shingles"))
    k = 8

    base = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text", "lang"))
    base_ids = sorted(r.doc_id for r in base.select("doc_id").collect())
    half = len(base_ids) // 2
    early_id, late_id = base_ids[0], base_ids[-1]
    tail = " " + " ".join(f"t{i}" for i in range(10))
    docs = base.withColumn(
        "text", F.when(F.col("doc_id").isin([early_id, late_id]),
                       F.concat_ws("", F.col("text"), F.lit(tail)))
        .otherwise(F.col("text")))
    pdf = docs.orderBy("doc_id").toPandas()

    model = textops.unigram_model(docs).persist()
    eval_docs = docs.where(F.col("doc_id") % 97 == 0).persist()

    _write_doc_file(pdf.iloc[:half], f"{docs_dir}/file_000.parquet")
    streaming.streaming_curate(
        spark, docs_dir, out, ckpt, model=model, eval_docs=eval_docs,
        min_lp=-99_000_000, shingles_path=shingles, substr_k=k)
    early_spans = {(r.doc_id, r.s) for r in
                   streaming.substring_casualty_spans(spark, shingles)
                   .collect()}
    _write_doc_file(pdf.iloc[half:], f"{docs_dir}/file_001.parquet")
    streaming.streaming_curate(
        spark, docs_dir, out, ckpt, model=model, eval_docs=eval_docs,
        min_lp=-99_000_000, shingles_path=shingles, substr_k=k)
    spans = streaming.substring_casualty_spans(spark, shingles)
    final_spans = {(r.doc_id, r.s) for r in spans.collect()}

    # the shared TAIL's spans only exist once its twin arrived (the
    # corpus has natural duplicated 8-grams too, so assert on the
    # tail tokens specifically: present under the early span set,
    # cut under the final one)
    assert {s for d, s in early_spans if d == early_id} \
        < {s for d, s in final_spans if d == early_id}
    assert any(d == late_id for d, _ in final_spans)
    early_df = spark.createDataFrame(
        sorted(early_spans) or [(None, None)], "doc_id long, s int") \
        .where(F.col("doc_id").isNotNull())
    one = docs.where(F.col("doc_id") == early_id)
    before = textops.apply_substring_spans(one, early_df, k=k) \
        .collect()[0]
    after = textops.apply_substring_spans(
        one, spans, k=k).collect()[0]
    assert " t0 " in f" {before.clean_text} "
    assert " t0 " not in f" {after.clean_text} "

    # read-time rewrite equals batch ExactSubstr over the deduped
    # full corpus, restricted to the streamed survivors
    out_docs = spark.read.parquet(out).select("doc_id", "text")
    got = {r.doc_id: (r.n_removed, r.clean_text) for r in
           textops.apply_substring_spans(out_docs, spans, k=k)
           .collect()}
    reps = textops.exact_dedup(docs).select("doc_id", "text")
    want_all = {r.doc_id: (r.n_removed, r.clean_text) for r in
                textops.substring_dedup(reps, k=k).collect()}
    assert got and set(got) <= set(want_all)
    for d, v in got.items():
        assert v == want_all[d], d
    model.unpersist()
    eval_docs.unpersist()
