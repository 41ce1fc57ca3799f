"""Structured Streaming surface (SURVEY.md §2.10 extensions).

The reference is strictly batch; these wrappers lift the engine's event-time
operators (tumbling/sliding/session windows, masking projections) onto
``readStream``/``writeStream`` with watermark-driven state eviction. The
batch-equivalent forms in suite/streaming_batch.py share the same expression
trees — the oracle-checked surface — so the streaming wrappers only add the
runtime (sources, sinks, triggers, watermarks).
"""

from database_anonymiser_spark.streaming.pipeline import (  # noqa: F401
    dedup_stream,
    enriched_stream,
    masked_stream,
    purchase_view_join_stream,
    run_foreach_batch,
    run_stream_neardedup,
    session_agg_stream,
    sliding_agg_stream,
    stream_events,
    tumbling_agg_stream,
    user_running_stats_stream,
)
