"""Event-log operators: sessionization over the ``events`` table.

The crawl analog: fetch-event streams per host/user get segmented
into sessions for politeness accounting and abuse detection. The
operator shape (lag + conditional cumsum inside one window pair) is
the standard gap-based sessionization — one shuffle on the entity
key, everything else codegen'd window functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(events: DataFrame, gap_seconds: int = 60,
               key_col: str = "user_id", ts_col: str = "ts",
               order_tiebreak: str = "event_id") -> DataFrame:
    """Assign gap-based session ids per entity.

    A new session starts when the time since the previous event of
    the same key exceeds ``gap_seconds``. ``session_seq`` is a dense
    per-key session counter (1-based); deterministic via the
    (ts, tiebreak) ordering. Single window partition per key — at
    skewed keys, pre-split by day/bucket upstream (same discipline as
    the politeness two-phase cut).
    """
    # exact integer microsecond arithmetic — no float-boundary risk
    # at the gap comparison, and TIMESTAMP_NTZ-safe
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(key_col).orderBy(ts_col, order_tiebreak)
    prev_us = F.lag(us).over(w)
    new_session = (prev_us.isNull() |
                   (us - prev_us > gap_seconds * 1_000_000)).cast("int")
    return (events
            .withColumn("_ts_us", us)
            .withColumn("_new", new_session)
            .withColumn("session_seq",
                        F.sum("_new").over(
                            w.rowsBetween(Window.unboundedPreceding, 0)))
            .drop("_new"))


def session_stats(events: DataFrame, gap_seconds: int = 60,
                  key_col: str = "user_id", ts_col: str = "ts"
                  ) -> DataFrame:
    """Per-session aggregates: event count, span seconds, value sum —
    what a politeness/abuse monitor consumes."""
    s = sessionize(events, gap_seconds, key_col, ts_col)
    return (s.groupBy(key_col, "session_seq")
            .agg(F.count("*").alias("n_events"),
                 (F.max("_ts_us") - F.min("_ts_us"))
                 .alias("span_us"),
                 F.min("event_id").alias("first_event_id")))
