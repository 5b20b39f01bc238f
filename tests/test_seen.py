"""Partitioned Bloom seen-set: no false negatives, bounded FPP,
merge correctness, exact-confirm anti-join semantics."""

import pyspark.sql.functions as F
import pytest

from frontier.spark import seen

BUCKETS = 8


@pytest.fixture(scope="module")
def urls(spark):
    return spark.range(0, 2000).select(
        F.concat(F.lit("https://h"), (F.col("id") % 50),
                 F.lit(".example/p"), F.col("id")).alias("url_canon"))


@pytest.fixture(scope="module")
def other_urls(spark):
    return spark.range(5000, 15000).select(
        F.concat(F.lit("https://h"), (F.col("id") % 50),
                 F.lit(".example/p"), F.col("id")).alias("url_canon"))


def test_no_false_negatives(spark, urls):
    bloom = seen.build(urls, num_buckets=BUCKETS,
                       expected_keys_per_bucket=1000)
    tagged = seen.probe(urls, bloom, num_buckets=BUCKETS)
    assert tagged.where(~F.col("maybe_seen")).count() == 0


def test_fpp_bounded(spark, urls, other_urls):
    bloom = seen.build(urls, num_buckets=BUCKETS,
                       expected_keys_per_bucket=1000)
    tagged = seen.probe(other_urls, bloom, num_buckets=BUCKETS)
    fpp = tagged.where(F.col("maybe_seen")).count() / other_urls.count()
    assert fpp < 0.05  # 10 bits/key k=7 → ~0.8% expected


def test_filter_unseen_exact_confirm(spark, urls, other_urls):
    bloom = seen.build(urls, num_buckets=BUCKETS,
                       expected_keys_per_bucket=1000)
    mixed = urls.unionByName(other_urls)
    out = seen.filter_unseen(mixed, bloom, seen_exact=urls,
                             num_buckets=BUCKETS)
    # exactly the unseen survive: false positives rescued by the
    # exact anti-join, seen urls all dropped
    assert out.count() == other_urls.count()
    assert out.join(urls, "url_canon", "left_semi").count() == 0


def test_merge_blooms_is_union(spark, urls, other_urls):
    b1 = seen.build(urls, num_buckets=BUCKETS,
                    expected_keys_per_bucket=1000)
    b2 = seen.build(other_urls, num_buckets=BUCKETS,
                    expected_keys_per_bucket=1000)
    merged = seen.merge_blooms(b1, b2)
    both = urls.unionByName(other_urls)
    tagged = seen.probe(both, merged, num_buckets=BUCKETS)
    assert tagged.where(~F.col("maybe_seen")).count() == 0
    assert merged.count() <= BUCKETS


def test_bloom_deterministic_across_parallelism(spark, urls):
    b1 = seen.build(urls.repartition(1), num_buckets=BUCKETS,
                    expected_keys_per_bucket=1000)
    b8 = seen.build(urls.repartition(8), num_buckets=BUCKETS,
                    expected_keys_per_bucket=1000)
    joined = b1.alias("a").join(b8.alias("b"), "bucket") \
        .where(F.col("a.bloom") != F.col("b.bloom"))
    assert joined.count() == 0


def test_probe_jvm_matches_pandas_probe(spark):
    """The pure-JVM bloom probe must be bit-identical to the pandas
    kernel probe on the same filter relation — including bucket
    misses, false-positive territory (tiny filter), and unsigned
    position arithmetic on negative-wrapped h1/h2."""
    from frontier.spark import seen as seenmod

    urls = spark.createDataFrame(
        [(f"https://h{i % 17}.example/p{i}",) for i in range(500)],
        "url_canon string")
    # tiny NON-power-of-two filter (m must not divide 2^64 — the
    # uint64 position wrap is invisible otherwise) + forces FPs
    bloom = seenmod.build(urls, num_buckets=8, bits_per_bucket=10000)
    cands = spark.createDataFrame(
        [(f"https://h{i % 17}.example/p{i}",) for i in range(0, 1500)],
        "url_canon string")
    a = {(r.url_canon, r.maybe_seen) for r in
         seenmod.probe(cands, bloom, num_buckets=8).collect()}
    b = {(r.url_canon, r.maybe_seen) for r in
         seenmod.probe_jvm(cands, bloom, num_buckets=8).collect()}
    assert a == b
    # all inserted urls must read maybe_seen (no false negatives)
    seen_true = {u for u, m in b if m}
    inserted = {r.url_canon for r in urls.collect()}
    assert inserted <= seen_true


def test_probe_jvm_empty_bloom(spark):
    from frontier.spark import seen as seenmod

    bloom = spark.createDataFrame([], seenmod.BLOOM_DDL)
    cands = spark.createDataFrame([("https://x/1",)],
                                  "url_canon string")
    rows = seenmod.probe_jvm(cands, bloom, num_buckets=8).collect()
    assert rows[0].maybe_seen is False


def test_probe_jvm_plan_is_python_free_on_candidates(spark):
    """The CANDIDATE hot path must be whole-stage codegen — Python
    appears only on the tiny broadcast (bloom) side: word expansion
    is an Arrow pass over one row per bucket."""
    from frontier.spark import seen as seenmod

    urls = spark.createDataFrame([("https://a/1",)], "url_canon string")
    bloom = seenmod.build(urls, num_buckets=8, bits_per_bucket=4096)
    cands = spark.createDataFrame([("https://a/2",)],
                                  "url_canon string")
    out = seenmod.probe_jvm(cands, bloom, num_buckets=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # everything above the BroadcastExchange is the stream
    # (candidate) side — it must carry no Python eval
    stream_side = plan.split("BroadcastExchange")[0]
    assert "ArrowEvalPython" not in stream_side
    assert "FlatMapCoGroupsInPandas" not in plan  # that's probe()'s shape


def test_filter_unseen_impls_identical(spark):
    from frontier.spark import seen as seenmod

    urls = spark.createDataFrame(
        [(f"https://h{i % 5}.example/s{i}",) for i in range(200)],
        "url_canon string")
    bloom = seenmod.build(urls, num_buckets=8, bits_per_bucket=4096)
    cands = spark.createDataFrame(
        [(f"https://h{i % 5}.example/s{i}",) for i in range(0, 600)],
        "url_canon string")
    a = {r.url_canon for r in seenmod.filter_unseen(
        cands, bloom, urls, num_buckets=8, impl="pandas").collect()}
    b = {r.url_canon for r in seenmod.filter_unseen(
        cands, bloom, urls, num_buckets=8, impl="jvm").collect()}
    assert a == b
    # exact confirm kills every false positive: unseen = 200..599
    assert a == {f"https://h{i % 5}.example/s{i}" for i in range(200, 600)}
