"""Regenerate COVERAGE.md from the live query registry.

Fails if any registered query is uncategorised (or vice versa), so the doc
can't silently drift from the code. Run: python tools/gen_coverage.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from database_anonymiser_spark.suite import all_queries  # noqa: E402

CATEGORIES = [
    ("Scans / sources / sinks (§2.1)", ["catalog_scan", "sample_scan"]),
    ("Masking strategies T1-T7 (§2.3)", ["mask_strategies", "anonymise_customer"]),
    ("Aggregations (§2.4)", ["count_rows", "agg_orders_stats", "agg_multidim", "agg_pivot", "agg_approx_sketch"]),
    ("Joins (§2.5)", ["join_broadcast", "join_sortmerge", "join_outer", "join_semi_anti", "join_range", "join_cross", "join_asof", "join_salted", "join_bloom"]),
    ("Window functions (§2.6)", ["window_pack"]),
    ("Sorts / top-k (§2.7)", ["topk_orders"]),
    ("Set operations (§2.8)", ["setop_pack"]),
    ("Scalar functions (§2.9)", ["func_string", "func_math_null", "func_array", "func_json", "func_explode"]),
    ("Streaming (§2.10)", ["stream_windows", "stream_session"]),
    ("SQL front door + flagship analytics", ["sql_cte_scalar", "tpch_q1", "tpch_q3", "tpch_q4", "tpch_q5", "tpch_q6_q14", "tpch_q18", "tpch_q2_q10_q22"]),
    ("UDF surface (§2.11)", ["pandas_grouped_norm"]),
    ("Deduplication (LLM-pipeline)", ["dedup_exact", "dedup_jaccard", "dedup_minhash", "sim_cosine_pairs"]),
    ("Similarity search (LLM-pipeline)", ["sim_topk_bruteforce", "sim_topk_ann"]),
    ("Text analysis (LLM-pipeline)", ["text_profile", "text_tfidf", "text_pii_scrub", "text_quality_spans"]),
    ("Multimodal (LLM-pipeline)", ["mm_binary_meta", "mm_extract_features"]),
    ("Versioned tables (transaction log)", ["merge_upsert"]),
]

# Round-2 consolidation: the suite was packed from 81 entries to 49 so the
# driver's 50-entry correctness window covers EVERY query (round 1 left 31
# entries unchecked). Merged entries keep full operator coverage — each pack
# applies all its operators in one query (union-with-tag or one projection):
MERGE_MAP = [
    ("mask_strategies", "mask_keep + mask_set_null + mask_redact + mask_hash (+ real sha256) + mask_truncate + mask_email_fake + mask_sample_preview"),
    ("count_rows", "count_rows + count_total (ROLLUP grand total)"),
    ("sample_scan", "sample_limit + sample_notnull + hash_sample + mixture_sample (data mixing with upsampling, round 3) + token_budget_sample (token-weighted mixture, round 4) + stratified_sample (exact n-per-stratum with KMV-style prefilter, round 5) + cluster_balanced_sample + cap_per_group (domain_cap) + shard_assign (shard variant, round 9)"),
    ("catalog_scan", "schema_scan + plan_filter"),
    ("agg_orders_stats", "agg_distinct + agg_percentile"),
    ("agg_multidim", "agg_cube + agg_rollup + agg_grouping_sets"),
    ("agg_approx_sketch", "agg_approx_distinct + approx_percentile (HLL/GK moved to error-bound pytest pins) + deterministic KMV distinct-count sketch (round 4 - makes the entry fully oracle-checked) + Count-Min point-frequency sketch with one-sided guarantee (round 5) + hash-sample quantile sketch (round 5) + Theta-style KMV set operations: union/intersection/Jaccard estimated from two bottom-k sketches without rescanning either table, exact when merged size < k (round 6)"),
    ("join_semi_anti", "join_semi + join_anti"),
    ("merge_upsert", "MERGE upsert + Z-ORDER OPTIMIZE row-set identity (round 5) + scoped update_where under key-range prune + delete_where (round 6 - the copy-on-write mutation path is value-hash checked as one committed lineage, versions 0..4) + SQL DML face ('sqldml' variant, round 13 - UPDATE/DELETE/MERGE INTO statement strings through sql_dml.execute_dml, the --sql router; the parser itself is value-hash checked)"),
    ("window_pack", "window_rank + window_running_sum + window_lag + window_lead_ntile + window_range_frame"),
    ("setop_pack", "setop_union + setop_intersect + setop_except"),
    ("func_math_null", "func_math + func_null + func_map"),
    ("func_json", "func_json + func_json_struct"),
    ("stream_windows", "stream_tumbling + stream_sliding + stream_watermark_late_drop (now in-plan + oracle-checked)"),
    ("tpch_q6_q14", "tpch_q6 + tpch_q14"),
    ("dedup_exact", "whole-document exact dedup + cross-document line dedup (RefinedWeb-style boilerplate removal, round 4) + quality-aware survivor selection ('best' variant, round 9)"),
    ("dedup_jaccard", "dedup_ngram_jaccard + dedup_jaccard_capped + dedup_clusters (connected components, round 3) + decontaminate (train/eval n-gram overlap, round 3)"),
    ("sim_topk_ann", "sim_topk_lsh + sim_topk_ivf + bulk knn_join branch (round 4, exact-decimal scores) + ivf_sq persisted-index branch + metadata-filtered search + product-quantization ADC branch (round 5)"),
    ("sim_topk_bruteforce", "sim_topk_bruteforce + int8-quantized top-k (compressed-domain scoring, round 3)"),
    ("text_profile", "text_tokens + text_quality + text_langid + text_fingerprint + train_eval_split (leakage-safe, round 3) + repetition_profile (Gopher-style repetition gates, round 3) + c4_clean line-cleaning signals (round 4)"),
    ("mm_extract_features", "mm_extract_features + mm_frame_sample (chained per-frame features) + mm_resize_meta (per-doc resize metadata joined onto the frame rows, round 5)"),
    # Round-5 consolidation: the new surface packed back to exactly 50 so
    # every declared operator stays inside the driver's 50-entry
    # alphabetical correctness window:
    ("tpch_q2_q10_q22", "tpch_q2 (correlated scalar-MIN, decorrelation equivalence) + tpch_q10 (returned-item top-20) + tpch_q22 (scalar-AVG threshold + NOT EXISTS anti join) + tpch_q12 (conditional priority sums) + tpch_q13 (custdist outer join + count-of-counts) + tpch_q17 (decorrelated per-part AVG threshold) + tpch_q19 (disjunctive OR-of-ANDs) - round 5 + tpch_q7 (nation-pair volume, symmetric disjunction over twice-joined nation) + tpch_q9 (5-way star profit by nation/year) + tpch_q11 (group HAVING vs global scalar, exact integer cents) + tpch_q21 (double-correlated EXISTS + NOT EXISTS self-joins, deterministic top-10) - round 6: + tpch_q8 (8-way market-share division of exact sums) + tpch_q15 (CTE revenue view + scalar-MAX equality) + tpch_q16 (partsupp as DISTINCT lineitem pairs, NOT IN exclusion) + tpch_q20 (nested IN + per-part half-volume threshold in exact BIGINTs) - ALL 22 canonical TPC-H shapes value-hash checked - round 7: + q2ps/q11ps/q16ps/q20ps (the same four shapes against a DERIVED first-class partsupp with real integer ps_availqty/ps_supplycost semantics; stand-ins kept as regression rows)"),
    ("text_quality_spans", "text_quality_clf (fixed-weight linear quality classifier, bit-exact scores) + dedup_spans (windowed ExactSubstr duplicated-span cover) - round 5 + char_bigram_lm (corpus-trained add-one-smoothed bigram LM, exact-integer mean transition probability; the CCNet/Dolma LM-filter class with a bounded 784-cell model aggregate) - round 6"),
    ("sim_cosine_pairs", "+ dedup_semantic (SemDeDup-style closure: 'cluster' variant = per-vector cluster id + survivor verdict, recursive-CTE oracle) - round 5"),
    ("dedup_minhash", "+ dedup_simhash ('simhash' variant rows carry the 64-bit signature in id_b) - round 5"),
    ("func_math_null", "+ func_date (year/month/day/date_trunc/datediff over l_shipdate) - round 5"),
    ("text_profile", "+ dedup_fingerprint (identical md5 fingerprint/fingerprint64 columns already oracled there; standalone entry retired) - round 5"),
    ("func_explode", "+ chunk_documents ('chunk' mode: fixed-size overlapping RAG/long-doc window splitter with stable md5 chunk ids) - round 5"),
]

HEADER = """# COVERAGE: SURVEY.md section 2 operator inventory mapped to declared queries

Every row is a `__spark_entry__.py::queries()` entry. **oracle** = full
row-count + schema + value-hash check vs DuckDB at sf0.01; **rows-only** =
driver's weaker check (genuinely non-SQL-expressible: sketches with
engine-internal state, mapInPandas binary plumbing, catalog introspection,
streaming-only semantics) — each has its values pinned by a unit test
instead. Non-query surfaces (config/planner/preflight/executor pipeline,
CLI, sources/ connectors, streaming runtime, bucketing, skew salting) are
covered by tests/ (pytest) and tests/test_plans.py (physical-plan
assertions).
"""


STREAMING_EVIDENCE = """## Streaming-runtime evidence (decision, round-3)

The streaming-runtime operators — readStream ingest, key-level dedup
via `dropDuplicatesWithinWatermark`, watermarked stream-stream joins
(inner AND left-outer with watermark-closed NULL emission, r5),
`applyInPandasWithState` sessionization, stream-static enrichment, the
idempotent foreachBatch sink, streaming corpus curation, the
streaming-merge sink into versioned tables, and the incremental
change-feed consumer (`streaming/pipeline.py`) — are
deliberately evidenced by the REAL structured-streaming tests in
`tests/test_streaming.py` (each runs an actual streaming query and compares
its emitted rows against the batch equivalent on the same data), not by a
declared batch entry. Rationale: the suite's batch surface already
oracle-checks the streaming *semantics* (`stream_windows` covers
tumbling/sliding/watermark finalization, `stream_session` covers session
windows), so a packed batch stand-in for the runtime operators would
re-prove semantics while destroying `stream_windows`' plan-asserted
single-scan property; what actually needs evidence for the runtime is
watermark-driven state eviction and emission timing, which only a real
`readStream` execution exercises. The streaming tests ARE that check.
"""


def main():
    qs = all_queries()
    listed = {n for _, ns in CATEGORIES for n in ns}
    missing = set(qs) - listed
    extra = listed - set(qs)
    assert not missing, f"uncategorised queries: {sorted(missing)}"
    assert not extra, f"categorised but unregistered: {sorted(extra)}"
    lines = [HEADER]
    for cat, names in CATEGORIES:
        lines.append(f"## {cat}\n")
        lines.append("| query | check | tags |")
        lines.append("|---|---|---|")
        for n in names:
            spec = qs[n]
            check = "oracle" if spec.oracle else "rows-only"
            lines.append(f"| `{n}` | {check} | {', '.join(spec.tags)} |")
        lines.append("")
    n_oracle = sum(1 for s in qs.values() if s.oracle)
    lines.append(
        f"**Total: {len(qs)} queries — {n_oracle} oracle-checked, "
        f"{len(qs) - n_oracle} rows-only.**"
    )
    lines.append("")
    lines.append(STREAMING_EVIDENCE)
    lines.append("## Round-2 consolidation map (old round-1 entries → packed entries)")
    lines.append("")
    lines.append("| packed entry | absorbs |")
    lines.append("|---|---|")
    for packed, absorbs in MERGE_MAP:
        lines.append(f"| `{packed}` | {absorbs} |")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "COVERAGE.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"COVERAGE.md: {len(qs)} queries, {n_oracle} oracle-checked")


if __name__ == "__main__":
    main()
