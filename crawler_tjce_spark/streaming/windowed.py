"""Structured Streaming operators.

The reference has no true streaming (SURVEY.md §2.9) — these exist
because the engine's 100 TB deployment story includes continuous
ingestion of crawl events: the same frontier/payload tables fed by a
stream instead of wave batches. Patterns covered:

* watermarked tumbling/sliding window aggregation (late-data tolerant);
* session windows (``F.session_window``) — the streaming twin of the
  batch sessionize operator in ``__spark_entry__.q36``;
* stateful dedup on event ids inside the watermark horizon — the
  streaming analogue of the crawl seen-set.

All are testable offline: a bounded parquet dir drives the stream via
``processAllAvailable`` into a memory sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tz(events: DataFrame, ts_col: str) -> DataFrame:
    """Watermarks require TIMESTAMP (with zone); testdata is NTZ — cast
    is exact because the session time zone is pinned UTC."""
    if dict(events.dtypes).get(ts_col) == "timestamp_ntz":
        return events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return events


def windowed_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked (sliding) window counts per event_type."""
    events = _tz(events, ts_col)
    w = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(w.alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("total"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n",
            "total",
        )
    )


def session_counts(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Session-window event counts per user (streaming sessionization)."""
    events = _tz(events, ts_col)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("sess"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("sess.start").alias("sess_start"),
            F.col("sess.end").alias("sess_end"),
            "user_id",
            "n_events",
        )
    )


def dedup_stream(events: DataFrame, key: str = "event_id", ts_col: str = "ts",
                 watermark: str = "30 minutes") -> DataFrame:
    """Exactly-once-per-key within the watermark horizon — the streaming
    seen-set (state store instead of bloom+anti-join)."""
    return _tz(events, ts_col).withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark([key])


def run_bounded(stream_df: DataFrame, query_name: str):
    """Drive a streaming DataFrame to completion over a bounded source
    (memory sink); returns the owning query (caller stops it)."""
    q = (
        stream_df.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    return q
