"""Driver-contract query plans over the synthetic testdata."""

from garmin_data_pipeline_spark.plans import llm_queries  # noqa: F401  (registers)
from garmin_data_pipeline_spark.plans.queries import (
    QUERIES,
    oracle_sql,
    queries,
)

# Driver-visibility ROTATION. The correctness driver records rows for
# exactly the FIRST 50 registered queries each round, so iteration
# order decides which queries get a hard correctness signal. Policy:
#   1. _HEAD = queries with the OLDEST (or no) driver row, plus every
#      query whose plan changed this round, plus new registrations —
#      these must be inside the first 50.
#   2. _TAIL = sized so len(QUERIES) - len(_TAIL) == 50: only queries
#      green in the IMMEDIATELY PREVIOUS round with unchanged code may
#      rotate out, trivial projections/filters first.
#   3. Next round, last round's tail rotates back into the head.
#
# Coverage ledger (round each query last had a green driver row):
#   r4: f2 p13 p3 p4 p6 o3 d3p d4p t8p v4p t11 t12 st3 d5 a13 m3 a14
#       t6 t6b m2 t1 t3 d1 d2 v1 v2 v3 m1 t4 t5 t9 t10 a1 a3 a4 w1
#       j1 f23 w5 s3 st1 st2 j5 j6 a12 j4
#       (rows-only r4: d3 d4 v4 t8 — no_oracle by design)
#   r3: a5 a11 w2 u1 a8 a2 t7 t2 p1 p9 p10 p12 p14 p11 a6 a7 a10 f4
#       f12 f22 f26 (r4's committed tail — rotating back in NOW, the
#       r4 verdict's top directive)
#   never: m4 (new in r5 — decode_frames Arrow boundary, checksum
#       kernel), c1 (contamination scan), t13 (hash split + shuffle
#       order), v5 (int8 quantization), t14 (repetition metrics),
#       t15 (vocab top-k), st4 (stream-stream attribution batch
#       twin), d5s (star-CC twin of d5 against the same oracle) —
#       all new in r5, all oracle-backed
_HEAD = [
    # r4's tail rotates back in (green r3, code unchanged since):
    "a5_total_duration",
    "a11_correlation",
    "w2_prior_order_price",
    "u1_union_mixed_schemas",
    "a8_impute_mean",
    "a2_daily_min",
    "t7_bpe_token_count",
    "t2_language_id",
    "p1_projection_revenue",
    "p9_filter_status_neq",
    "p10_filter_notnull",
    "p12_flag_date_threshold",
    "p14_masked_mean",
    "p11_filter_contains",
    "a6_null_counts",
    "a7_distinct_counts",
    "a10_event_type_counts",
    "f4_date_parts",
    "f12_time_string_kit",
    "f22_sentinel_replace",
    "f26_fill_and_coalesce",
    # plans changed in r5 — must re-certify:
    #   st2: gap predicate -> timestamp_diff intrinsic
    #   st3: dedup keyed on the full column list (ADVICE r4)
    #   d5:  CC convergence folded into the update job + pointer
    #        jumping + pre-partitioned edge list
    #   v2/v3: LSH dim now an explicit kwarg at the call site
    "st2_sessionize",
    "st3_replay_dedup",
    "d5_duplicate_groups",
    "v2_cosine_topk_lsh",
    "v3_embedding_near_dups",
    # new in r5 (first driver row ever):
    "m4_frame_checksums",
    "c1_contamination",
    "t13_hash_split",
    "v5_quantize_embeddings",
    "t14_repetition_metrics",
    "t15_vocab_topk",
    "st4_attribution",
    "d5s_duplicate_groups_star",
]
_TAIL = [
    # green in r4, code unchanged in r5, trivial-or-twice-certified
    # semantics — rotated out so the grown surface fits the 50-row cap
    # (sized by the ordering test to len(QUERIES) - 50):
    "f2_epoch_millis",
    "p13_threshold_count",
    "p3_drop_all_null_columns",
    "p4_drop_constant_columns",
    "p6_clean_headers",
    "o3_topk_orders",
    "t1_token_quality",
    "t3_fingerprint",
    "t4_length_quantiles",
    "t9_length_trim",
    "t11_document_chunking",
    "t12_pii_redaction",
    "d1_exact_dedup",
    "m1_multimodal_metadata",
    "m2_frame_sampling",
    "m3_audio_windows",
    "a1_pricing_summary",
    "a3_latest_order_per_customer",
    "a4_dedupe_latest_lineitem",
    "w1_cumulative_spend",
    "f23_binned_group_mean",
    "s3_json_props_extract",
    "t5_corpus_mix",
    "a13_pivot_event_values",
    "j5_asof_join",
    "j6_range_join",
    "a12_time_rollup",
    "st1_tumbling_daily",
    "t10_clean_corpus",
]


def _reorder() -> None:
    snapshot = dict(QUERIES)
    order = (
        [n for n in _HEAD if n in snapshot]
        + [n for n in snapshot if n not in _HEAD and n not in _TAIL]
        + [n for n in _TAIL if n in snapshot]
    )
    QUERIES.clear()
    for n in order:
        QUERIES[n] = snapshot[n]


_reorder()

__all__ = ["QUERIES", "oracle_sql", "queries"]
