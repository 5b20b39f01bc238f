"""Snapshot store maintenance: compaction + expiration + time travel."""

import os

import pytest

from frontier.spark.snapshots import SnapshotStore


@pytest.fixture()
def store(spark, tmp_path):
    st = SnapshotStore(str(tmp_path / "snaps"))
    for rnd in range(4):
        results = spark.createDataFrame(
            [(f"u{rnd}-{i}", rnd) for i in range(5)],
            "url_canon string, round int")
        frontier = spark.createDataFrame(
            [(f"f{rnd}",)], "url_canon string")
        st.commit({"results": results, "frontier": frontier},
                  {"round": rnd})
    return st


def test_time_travel_and_lineage(spark, store):
    assert store.snapshot_ids() == [0, 1, 2, 3]
    old = store.read(spark, "results", snapshot_id=1)
    assert {r.round for r in old.collect()} == {1}
    man = store.manifest(2)
    assert man["lineage"]["results"]["n_rows"] == 5
    assert sum(man["lineage"]["results"]["file_rows"].values()) == 5


def test_compact_then_expire(spark, store):
    path = store.compact_results(spark)
    compacted = spark.read.parquet(path)
    assert compacted.count() == 20  # 4 rounds x 5 rows
    assert {r.round for r in compacted.collect()} == {0, 1, 2, 3}

    dropped = store.expire(keep_last=1)
    assert dropped == [0, 1, 2]
    assert store.snapshot_ids() == [3]
    # expired data dirs are gone; retained snapshot + compaction live
    root = store.root
    assert not os.path.exists(os.path.join(root, "data", "snap-0"))
    assert store.read(spark, "frontier").collect()[0].url_canon == "f3"
    assert spark.read.parquet(path).count() == 20
    # resume-style read still works off the latest manifest
    assert store.manifest()["metrics"]["round"] == 3


def test_expire_keeps_all_when_keep_exceeds(store):
    assert store.expire(keep_last=10) == []
    assert store.snapshot_ids() == [0, 1, 2, 3]


def test_compact_folds_in_prior_compaction(spark, store):
    """Compact → expire → more rounds → compact again: the new
    ``results-upto-N`` must contain ALL rounds, including those whose
    snapshots were expired (their rows survive only in the prior
    compacted file)."""
    first = store.compact_results(spark)
    store.expire(keep_last=1)  # rounds 0-2 survive only in `first`
    for rnd in (4, 5):
        results = spark.createDataFrame(
            [(f"u{rnd}-{i}", rnd) for i in range(5)],
            "url_canon string, round int")
        store.commit({"results": results}, {"round": rnd})

    path = store.compact_results(spark)
    compacted = spark.read.parquet(path)
    assert {r.round for r in compacted.collect()} == {0, 1, 2, 3, 4, 5}
    assert compacted.count() == 30  # overlap (round 3) deduped
    # superseded compacted dir cleaned up
    assert not os.path.exists(first)
    # idempotent: compacting again folds its own output, no dup rows
    again = store.compact_results(spark)
    assert spark.read.parquet(again).count() == 30
