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
#   r3: s3 st1 st2 a5 j5 j6 a12 t6b d2 j4 t10 t1 t2 t3 d1 v1 v2 v3 m1
#       m2 t4 t5 t6 t7 t9 a1 a2 a3 a4 w1 w2 u1 a10 p11 j1 p1 p9 p10
#       p12 p14 a6 a7 a8 a11 f4 f12 f22 f23 f26 w5
#   r2: f2 p13 p3 p4 p6 o3 (green r1+r2, code unchanged since)
#   r1/r2 rows-only: d3 d4 v4 t8 (no_oracle by design)
#   never: d3p d4p t8p (new in r4 — md5 hash-parity twins)
#          v4p (new in r4 — grid-codebook IVF, hash-matched)
#          t11 t12 (new in r4 — chunking / PII scrub, hash-matched)
#          st3 (new in r4 — streaming-dedup batch twin, hash-matched)
#          d5 (new in r4 — connected-components dup groups, hash-matched)
#          a13 (new in r4 — fixed-column pivot, hash-matched)
#          m3 (new in r4 — audio windowing, hash-matched)
#          a14 (new in r4 — salted skew-safe aggregate, hash-matched)
_HEAD = [
    # no driver row since r2 (green r1+r2, unchanged — re-certify):
    "f2_epoch_millis",
    "p13_threshold_count",
    "p3_drop_all_null_columns",
    "p4_drop_constant_columns",
    "p6_clean_headers",
    "o3_topk_orders",
    # new in r4 (first driver row ever, hash-matched):
    "d3p_minhash_lsh_pairs",
    "d4p_simhash_candidates",
    "t8p_rolling_fingerprint",
    "v4p_cosine_topk_ivf_grid",
    "t11_document_chunking",
    "t12_pii_redaction",
    "st3_replay_dedup",
    "d5_duplicate_groups",
    "a13_pivot_event_values",
    "m3_audio_windows",
    "a14_salted_event_stats",
    # rows-only family: last recorded r2; v4 additionally changed
    # behavior in r3 (sample_fraction) with no row since (ADVICE r3):
    "d3_minhash_lsh_pairs",
    "d4_simhash_candidates",
    "v4_cosine_topk_ivf",
    "t8_rolling_fingerprint",
    # plans changed in r4 (t6 -> sharded packer; t6b -> driver-side
    # offsets; m2 -> JVM-side substring slice):
    "t6_sequence_packing",
    "t6b_sequence_packing_sharded",
    "m2_frame_sampling",
]
_TAIL = [
    # green in r3, code unchanged in r4, trivial semantics — rotated
    # out so the grown surface fits the 50-row cap (sized by the
    # ordering test to len(QUERIES) - 50):
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
