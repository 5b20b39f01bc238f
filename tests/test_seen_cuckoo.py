"""Spark-side cuckoo seen-set: build / probe / delete."""

import pyspark.sql.functions as F
import pytest

from frontier.spark import seen

BUCKETS = 8


@pytest.fixture(scope="module")
def urls(spark):
    return spark.range(0, 3000).select(
        F.concat(F.lit("https://h"), (F.col("id") % 40),
                 F.lit(".example/c"), F.col("id")).alias("url_canon"))


def test_cuckoo_no_false_negatives(spark, urls):
    filt = seen.build_cuckoo(urls, num_buckets=BUCKETS)
    tagged = seen.probe_cuckoo(urls, filt, num_buckets=BUCKETS)
    assert tagged.where(~F.col("maybe_seen")).count() == 0


def test_cuckoo_fpp(spark, urls):
    filt = seen.build_cuckoo(urls, num_buckets=BUCKETS)
    other = spark.range(50000, 70000).select(
        F.concat(F.lit("https://h"), (F.col("id") % 40),
                 F.lit(".example/c"), F.col("id")).alias("url_canon"))
    fpp = seen.probe_cuckoo(other, filt, num_buckets=BUCKETS) \
        .where(F.col("maybe_seen")).count() / other.count()
    assert fpp < 0.01


def test_cuckoo_delete_then_unseen(spark, urls):
    filt = seen.build_cuckoo(urls, num_buckets=BUCKETS)
    victims = urls.where(F.col("url_canon").endswith("7"))
    updated = seen.cuckoo_delete(filt, victims, num_buckets=BUCKETS)
    gone = seen.probe_cuckoo(victims, updated, num_buckets=BUCKETS)
    # tiny residue possible from fingerprint collisions with kept keys
    assert gone.where(F.col("maybe_seen")).count() \
        < 0.02 * victims.count() + 1
    kept = urls.join(victims, "url_canon", "left_anti")
    still = seen.probe_cuckoo(kept, updated, num_buckets=BUCKETS)
    assert still.where(~F.col("maybe_seen")).count() == 0


def test_cuckoo_deterministic_across_parallelism(spark, urls):
    a = seen.build_cuckoo(urls.repartition(1), num_buckets=BUCKETS)
    b = seen.build_cuckoo(urls.repartition(8), num_buckets=BUCKETS)
    diff = a.alias("a").join(b.alias("b"), "bucket") \
        .where(F.col("a.table") != F.col("b.table")).count()
    assert diff == 0
