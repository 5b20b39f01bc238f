"""Gap-based sessionization semantics."""

import pyspark.sql.functions as F

from frontier.spark import eventops


def test_sessionize_gaps(spark):
    rows = [  # user 1: events at 0s, 30s, 200s (gap 60 → 2 sessions)
        (1, 1, 0), (2, 1, 30_000_000), (3, 1, 200_000_000),
        (4, 2, 0),  # user 2: single session
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, us long") \
        .select("event_id", "user_id",
                F.timestamp_micros("us").alias("ts"))
    s = eventops.sessionize(df, gap_seconds=60)
    got = {r.event_id: r.session_seq for r in s.collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 1}
    stats = eventops.session_stats(df, gap_seconds=60)
    rows = {(r.user_id, r.session_seq): (r.n_events, r.span_us,
                                         r.first_event_id)
            for r in stats.collect()}
    assert rows[(1, 1)] == (2, 30_000_000, 1)
    assert rows[(1, 2)] == (1, 0, 3)
    assert rows[(2, 1)] == (1, 0, 4)


def test_sessionize_boundary_exact_gap_stays(spark):
    # gap EXACTLY equal to threshold does NOT split (strict >)
    rows = [(1, 1, 0), (2, 1, 60_000_000)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, us long") \
        .select("event_id", "user_id",
                F.timestamp_micros("us").alias("ts"))
    got = {r.event_id: r.session_seq
           for r in eventops.sessionize(df, gap_seconds=60).collect()}
    assert got == {1: 1, 2: 1}


def test_asof_join_semantics(spark):
    from datetime import datetime

    from frontier.spark import eventops
    T = lambda s: datetime(2024, 1, 1, 0, 0, s)
    left = spark.createDataFrame(
        [(1, 10, T(5)), (2, 10, T(2)), (3, 10, T(1)), (4, 20, T(9))],
        "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(100, 10, T(2), 1.0),   # ties left event 2 exactly (<= incl.)
         (101, 10, T(4), 2.0),
         (102, 30, T(0), 9.9)],  # other user: never matched
        "view_event_id long, user_id long, ts timestamp, "
        "view_value double")
    out = {r.event_id: r for r in eventops.asof_join(
        left, right, keys=["user_id"]).collect()}
    assert out[1].view_event_id == 101      # latest of 100,101 <= t5
    assert out[2].view_event_id == 100      # equal ts: inclusive
    assert out[3].view_event_id is None     # nothing at or before t1
    assert out[4].view_event_id is None     # user 20 has no views
    assert out[1].view_value == 2.0
    assert len(out) == 4                    # left-join row preservation


def test_asof_join_right_ts_tie_deterministic(spark):
    from datetime import datetime

    from frontier.spark import eventops
    T = lambda s: datetime(2024, 1, 1, 0, 0, s)
    left = spark.createDataFrame(
        [(1, 10, T(5))], "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(100, 10, T(3), 1.0), (105, 10, T(3), 0.5)],
        "view_event_id long, user_id long, ts timestamp, "
        "view_value double")
    rows = [eventops.asof_join(left, right, keys=["user_id"])
            .collect()[0] for _ in range(2)]
    # documented tie-break: max payload struct (105 > 100)
    assert rows[0].view_event_id == rows[1].view_event_id == 105


def test_range_join_count(spark):
    from datetime import datetime

    from frontier.spark import eventops
    T = lambda s: datetime(2024, 1, 1, 0, 1, s)
    left = spark.createDataFrame(
        [(1, 10, T(30)), (2, 10, T(0)), (3, 20, T(30))],
        "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(10, T(0)), (10, T(59)), (10, T(29)),   # user 10 views
         (20, T(5))],                            # outside ±30 of T(30)? no: 5 vs 30 -> in range (25s)
        "user_id long, ts timestamp")
    out = {r.event_id: r.n_in_range for r in eventops.range_join_count(
        left, right, keys=["user_id"], lower_s=-30, upper_s=30,
        bucket_s=7).collect()}  # odd bucket width: exercises spans
    # event 1 (user10 @T30): views at T0 (30s, incl), T59 (29s), T29 -> 3
    assert out[1] == 3
    # event 2 (user10 @T0): views at T0, T29 in [-30,+30]; T59 is 59s -> 2
    assert out[2] == 2
    # event 3 (user20 @T30): view at T5 -> 25s away -> 1
    assert out[3] == 1


def test_range_join_count_zero_rows_kept(spark):
    from datetime import datetime

    from frontier.spark import eventops
    left = spark.createDataFrame(
        [(1, 99, datetime(2024, 1, 1))],
        "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [], "user_id long, ts timestamp")
    rows = eventops.range_join_count(left, right, ["user_id"]).collect()
    assert rows[0].n_in_range == 0


def test_range_join_plans_as_hash_join(spark):
    """The bucketized decomposition must plan as an equi hash join —
    never BroadcastNestedLoopJoin (the naive interval-join plan)."""
    from datetime import datetime

    from frontier.spark import eventops
    left = spark.createDataFrame(
        [(i, i % 5, datetime(2024, 1, 1)) for i in range(100)],
        "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(i % 5, datetime(2024, 1, 1)) for i in range(100)],
        "user_id long, ts timestamp")
    plan = eventops.range_join_count(left, right, ["user_id"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_range_join_count_duplicate_left_rows(spark):
    # ADVICE r3: duplicate left rows must each get the TRUE count,
    # not count × duplicate-factor
    from frontier.spark import eventops

    left = spark.createDataFrame(
        [("u", "2024-01-01 00:00:10"), ("u", "2024-01-01 00:00:10")],
        "user_id string, ts string")
    right = spark.createDataFrame(
        [("u", "2024-01-01 00:00:15"), ("u", "2024-01-01 00:00:20")],
        "user_id string, ts string")
    out = eventops.range_join_count(left, right, ["user_id"],
                                    lower_s=-30, upper_s=30).collect()
    assert len(out) == 2
    assert [r["n_in_range"] for r in out] == [2, 2]


def test_range_join_count_null_left_column(spark):
    # a NULL in a non-key left column must not zero the count
    from frontier.spark import eventops

    left = spark.createDataFrame(
        [("u", "2024-01-01 00:00:10", None)],
        "user_id string, ts string, tag string")
    right = spark.createDataFrame(
        [("u", "2024-01-01 00:00:15")], "user_id string, ts string")
    out = eventops.range_join_count(left, right, ["user_id"],
                                    lower_s=-30, upper_s=30).collect()
    assert out[0]["n_in_range"] == 1


def test_asof_join_raises_on_payload_collision(spark):
    import pytest
    from frontier.spark import eventops

    left = spark.createDataFrame(
        [("u", "2024-01-01", 1)], "user_id string, ts string, v int")
    right = spark.createDataFrame(
        [("u", "2024-01-01", 2)], "user_id string, ts string, v int")
    with pytest.raises(ValueError, match="payload columns"):
        eventops.asof_join(left, right, ["user_id"])

    l2 = left.withColumnRenamed("v", "_side")
    r2 = right.withColumnRenamed("v", "rv")
    with pytest.raises(ValueError, match="internal tags"):
        eventops.asof_join(l2, r2, ["user_id"])


def test_range_join_release_checkpoints(spark):
    """range_join_count's lazy localCheckpoints accumulate across
    calls (its result's lineage depends on them, so it cannot free
    them itself); release_checkpoints() must free exactly those
    blocks once results are consumed — and leave other caches alone
    (r4 ADVICE)."""
    from frontier.spark import eventops

    jsc = spark.sparkContext._jsc
    before = set(jsc.getPersistentRDDs().keySet())
    bystander = spark.range(50).persist()
    bystander.count()

    left = spark.createDataFrame(
        [("u", "2024-01-01 00:00:00")] * 3, "user_id string, ts string")
    right = spark.createDataFrame(
        [("u", "2024-01-01 00:00:10")], "user_id string, ts string")
    for _ in range(2):  # repeated calls, as in a long session
        out = eventops.range_join_count(left, right, ["user_id"])
        assert [r.n_in_range for r in out.collect()] == [1, 1, 1]
    eventops.release_checkpoints()

    assert bystander.count() == 50 and bystander.storageLevel.useMemory
    bystander.unpersist(True)
    leaked = set(jsc.getPersistentRDDs().keySet()) - before
    assert not leaked, f"range_join_count leaked: {leaked}"
