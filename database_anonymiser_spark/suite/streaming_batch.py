"""Event-time windowing over ``events`` (SURVEY.md §2.10), batch-equivalent.

These are the exact expressions the streaming module
(database_anonymiser_spark.streaming) wraps with readStream + watermark;
declaring them batch-side makes them oracle-checkable, per SURVEY.md §5.

Window grids align to the epoch in both engines: Spark window() starts at
1970-01-01; DuckDB time_bucket's default origin 2000-01-03 00:00:00 is a
multiple of every sub-hour bucket width used here, so the grids coincide.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from database_anonymiser_spark.suite.base import dsum, dsum_sql, load, register


@register(
    "stream_tumbling",
    f"""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           count(*) AS n,
           {dsum_sql('value')} AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("streaming",),
)
def stream_tumbling(spark, sf_dir):
    # Tumbling 1h windows; in streaming form this is the partial-agg-friendly
    # shape (watermark bounds state; each window closes once).
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@register(
    "stream_sliding",
    f"""
    WITH grid AS (
      SELECT time_bucket(INTERVAL 30 MINUTES, ts) AS w0, * FROM events
    ), assigned AS (
      SELECT w0 AS window_start, value FROM grid
      UNION ALL
      SELECT w0 - INTERVAL 30 MINUTES AS window_start, value FROM grid
    )
    SELECT window_start, count(*) AS n, {dsum_sql('value')} AS sum_value
    FROM assigned
    GROUP BY window_start
    """,
    tags=("streaming",),
)
def stream_sliding(spark, sf_dir):
    # Sliding 1h window / 30min slide: each event lands in exactly 2 windows.
    # The oracle materialises the same assignment with a UNION ALL of the two
    # shifted 30-min buckets.
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value"))
        .select(F.col("window.start").alias("window_start"), "n", "sum_value")
    )


@register(
    "stream_session",
    f"""
    WITH ordered AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 30 MINUTES
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), islands AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM ordered
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTES AS session_end,
           count(*) AS n_events,
           {dsum_sql('value')} AS sum_value
    FROM islands
    GROUP BY user_id, session_id
    """,
    tags=("streaming",),
)
def stream_session(spark, sf_dir):
    # Session windows, 30-min gap. Spark's session_window end = last event +
    # gap; the oracle's gaps-and-islands reproduces exactly that. In streaming
    # form this is the applyInPandasWithState-free path: session_window is a
    # built-in stateful operator with watermark-driven state eviction.
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


@register("stream_watermark_late_drop", None, tags=("streaming",))
def stream_watermark_late_drop(spark, sf_dir):
    """Watermark semantics demo (rows-only): tumbling agg of events that a
    10-minute watermark would admit, computed batch-side.

    True late-data dropping is a streaming-runtime behaviour (tested with a
    real readStream in tests/test_streaming.py); the batch rendition keeps a
    stable, checkable row surface here.
    """
    ev = load(spark, sf_dir, "events")
    max_ts = ev.agg(F.max("ts").alias("m")).first()["m"]
    return (
        ev.where(F.col("ts") <= F.lit(max_ts))
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("window_start"), "n")
    )
