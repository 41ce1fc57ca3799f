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
    "stream_windows",
    f"""
    SELECT 'tumbling' AS kind,
           date_trunc('hour', ts) AS window_start,
           event_type,
           count(*) AS n,
           {dsum_sql('value')} AS sum_value
    FROM events
    GROUP BY 2, 3
    UNION ALL
    SELECT 'sliding' AS kind, window_start,
           CAST(NULL AS VARCHAR) AS event_type,
           count(*) AS n, {dsum_sql('value')} AS sum_value
    FROM (
      WITH grid AS (
        SELECT time_bucket(INTERVAL 30 MINUTES, ts) AS w0, * FROM events
      )
      SELECT w0 AS window_start, value FROM grid
      UNION ALL
      SELECT w0 - INTERVAL 30 MINUTES AS window_start, value FROM grid
    )
    GROUP BY window_start
    UNION ALL
    SELECT 'watermark_final' AS kind, window_start,
           CAST(NULL AS VARCHAR) AS event_type,
           n, CAST(NULL AS DOUBLE) AS sum_value
    FROM (
      WITH w AS (
        SELECT date_trunc('hour', ts) AS window_start, count(*) AS n
        FROM events GROUP BY 1
      ),
      wm AS (SELECT max(ts) - INTERVAL 10 MINUTES AS watermark FROM events)
      SELECT window_start, n FROM w, wm
      WHERE window_start + INTERVAL 1 HOUR <= watermark
    )
    """,
    tags=("streaming",),
)
def stream_windows(spark, sf_dir):
    """Tumbling (1h, keyed by event_type) + sliding (1h / 30min slide)
    event-time windows, plus the watermark-finalization surface — tagged
    and unioned.

    In streaming form tumbling/sliding are the partial-agg-friendly shapes
    (watermark bounds state; each window closes once). The sliding oracle
    materialises the every-event-in-exactly-2-windows assignment with a
    UNION ALL of the two shifted 30-min buckets. 'watermark_final' rows are
    exactly the tumbling windows whose END is at or before a 10-minute
    watermark (max event time − 10 min) — the windows a streaming run would
    have finalized; the cutoff is computed IN-PLAN (1-row max aggregate
    broadcast into a join filter, no driver-side action). True late-data
    dropping is exercised against the real streaming runtime in
    tests/test_streaming.py.
    """
    # ONE scan: pre-aggregate to 30-minute buckets (the common grid every
    # window family nests in), then derive tumbling / sliding /
    # watermark-finalized from the tiny pre-agg. The naive formulation is
    # three unioned aggregations = three full passes over events; this is
    # one pass + re-aggregations over ~(buckets × types) rows. Sums stay in
    # exact decimal through the re-aggregation (sum of partial decimal sums
    # == direct decimal sum), cast to double only at the edge — so values
    # are bit-identical to the oracle's three independent aggregations.
    ev = load(spark, sf_dir, "events")
    pre = (
        ev.groupBy(F.window("ts", "30 minutes"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("_sv"),
            F.max("ts").alias("_max_ts"),
        )
        .select(F.col("window.start").alias("w0"), "event_type", "_n", "_sv", "_max_ts")
        # The cache is what makes this ONE scan: per-branch column pruning
        # specializes each consumer's scan→partial-agg subtree, so Catalyst
        # cannot dedup them as ReusedExchange (verified: uncached = 4 scans).
        # Lifecycle (ADVICE r2 — never unpersisted): every harness
        # (bench.py, tools/check_oracle.py, tools/plan_audit.py) clears the
        # cache between queries, so nothing leaks across measurements.
        .cache()
    )
    tumbling = (
        pre.groupBy(F.date_trunc("hour", "w0").alias("window_start"), "event_type")
        .agg(F.sum("_n").alias("n"), F.sum("_sv").cast("double").alias("sum_value"))
        .select(
            F.lit("tumbling").alias("kind"), "window_start", "event_type", "n", "sum_value"
        )
    )
    shifted = pre.select(F.col("w0").alias("ws"), "_n", "_sv").unionByName(
        pre.select((F.col("w0") - F.expr("INTERVAL 30 MINUTES")).alias("ws"), "_n", "_sv")
    )
    sliding = (
        shifted.groupBy(F.col("ws").alias("window_start"))
        .agg(F.sum("_n").alias("n"), F.sum("_sv").cast("double").alias("sum_value"))
        .select(
            F.lit("sliding").alias("kind"),
            "window_start",
            F.lit(None).cast("string").alias("event_type"),
            "n",
            "sum_value",
        )
    )
    wm = pre.agg((F.max("_max_ts") - F.expr("INTERVAL 10 MINUTES")).alias("watermark"))
    hourly = pre.groupBy(F.date_trunc("hour", "w0").alias("window_start")).agg(
        F.sum("_n").alias("n")
    )
    finalized = (
        hourly.join(
            F.broadcast(wm),
            hourly.window_start + F.expr("INTERVAL 1 HOUR") <= wm.watermark,
        )
        .select(
            F.lit("watermark_final").alias("kind"),
            "window_start",
            F.lit(None).cast("string").alias("event_type"),
            "n",
            F.lit(None).cast("double").alias("sum_value"),
        )
    )
    return tumbling.unionByName(sliding).unionByName(finalized)


@register(
    "stream_session",
    f"""
    WITH ordered AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       >= INTERVAL 30 MINUTES
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
    # gap, and sessions merge only on strict [ts, ts+gap) overlap — an event
    # arriving exactly `gap` after the previous one starts a NEW session,
    # which the oracle's `>= INTERVAL 30 MINUTES` new-session test mirrors.
    # In streaming form this is the applyInPandasWithState-free path:
    # session_window is a built-in stateful operator with watermark-driven
    # state eviction.
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


