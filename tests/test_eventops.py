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
