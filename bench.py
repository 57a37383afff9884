"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE compact JSON contract line (LAST on stdout):
    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": 0.1, "cpus": "...",
     "value_full": sec, "calibration_s": sec, "host_factor": x,
     "full_payload": "bench_full_rNN.json"}
The full payload (spreads, stall re-run series, normalized walls,
sf1 probe, methodology notes) is written to the named
bench_full_rNN.json next to this script — r14 verdict: the old
everything-on-one-line output grew past the driver's capture window
and a truncated line killed an entire round-over-round table.

Queries are executed with the noop sink (full plan runs, nothing is
collected to the driver). Each query gets ``WARMUPS`` untimed
executions, then ``REPEATS`` timed ones; the reported time is the
MEDIAN and ``spread`` is max-min across timed repeats. The per-query
warm-up (new in r5) pins the noisy LSH cells the r4 verdict flagged:
a freshly-built plan's first 1-2 executions run 20-40% slow while the
JIT compiles its generated code, which put a descending slope inside
the timed window (d3 r4: spread 3.81s ~ the 3.48s median). The metric
is therefore STEADY-STATE throughput — the shape a standing pipeline
runs — and the r1-r4 series (medians over cold-ish triples) reads
slightly pessimistic against it.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

REPEATS = 3
WARMUPS = 2

# --- Stall auto-adjudication (r12 verdict directive 2) ---------------
# The documented host-stall signature is a cell whose spread is on
# the order of its median (r10: v9 47.8s/48.3 spread; r12: st2
# 0.410->2.855s and t4 0.296->1.909s with spreads ~= medians, both
# FROZEN code). The repo's host_stall_note prescribes a same-host
# re-run before reading such a cell as a regression — r12 committed
# a stalled artifact without applying it, overstating the anchor by
# ~40%. The protocol is now MECHANICAL: any cell whose spread
# exceeds STALL_SPREAD_FRACTION of its median triggers one automatic
# same-session re-run; the better-behaved (lower-median) series is
# kept — an idle host cannot run the code FASTER than it is, so the
# smaller median is the truth — and both series ship in the payload
# (`stall_reruns`) for audit. Sub-noise-floor cells (median under
# STALL_MIN_MEDIAN_S) are exempt: at 0.1s walls the spread/median
# ratio is all scheduler noise and a re-run decides nothing.
# Threshold calibration: clean cells' within-session spreads run
# 5-25% of the median (serve tiers: <0.3s on 2-6s walls); the r12
# stall cells read spread/median 29% (st2: 0.832/2.855) and 50%
# (t4: 0.957/1.909). 0.25 catches both documented stalls while a
# false trip only costs one extra 3-rep cell run whose result is
# kept anyway if it agrees.
# Warm-up caveat (r13 review): a tripped cell's re-run executes
# after 3 extra same-plan reps, so its median can be faster purely
# from deeper JIT warming, not host idleness — tripped cells are
# therefore measured slightly warmer than untripped ones. This bias
# points TOWARD the bench's declared metric (steady-state
# throughput, per the module docstring), not away from it, and both
# series ship in the payload so the audit can see the difference;
# it is accepted rather than corrected.
STALL_SPREAD_FRACTION = 0.25
# The floor is compared against the TRIPPING series' median, and a
# stall INFLATES the median (r12: 0.296s code read 1.909s, 0.410s
# code read 2.855s) — so the floor only needs to sit below stalled
# medians, not below true walls. 0.5s skips the sub-noise-floor
# churn the first r13 bench showed (13 cells with 0.2-0.6s medians
# re-ran on scheduler noise, every kept median within noise of the
# first) while still catching any stall big enough to matter.
STALL_MIN_MEDIAN_S = 0.5


def is_stall_suspect(reps: list[float]) -> bool:
    """True when a timed-rep series carries the stall signature:
    spread > STALL_SPREAD_FRACTION x median (above the noise floor)."""
    med = statistics.median(reps)
    return (
        med >= STALL_MIN_MEDIAN_S
        and (max(reps) - min(reps)) > STALL_SPREAD_FRACTION * med
    )


def pick_series(first: list[float], rerun: list[float]) -> str:
    """Which series to report after a stall re-run. ADVICE r13:
    always keeping the lower median is a min-of-two-medians
    selection that biases genuinely-noisy (non-stall) cells downward
    relative to untripped cells, compounded by the warmer-JIT rerun.
    The re-run therefore replaces the first series only on a CLEAR
    stall signature — its median improves on the first median by
    more than the stall spread fraction (a real host stall inflates
    medians far past that: r12's st2 read 7x, t4 read 6.5x their
    true walls). Anything smaller is ordinary variance and the
    first, JIT-comparable series stands."""
    f = statistics.median(first)
    r = statistics.median(rerun)
    return "rerun" if (f - r) > STALL_SPREAD_FRACTION * f else "first"


def contract_line(
    payload: dict, out_name: str | None
) -> dict:
    """The compact stdout contract (r14 verdict "What's wrong" #2):
    exactly the driver's required keys (metric/value/unit/queries/sf)
    plus a few SCALAR extras and the name of the full-payload file.
    Everything bulky (spreads, stall series, normalized walls, the
    sf1 probe, methodology notes) stays in the bench_full file only,
    so the one-line JSON can never again outgrow the driver's output
    capture. The per-query medians in `queries` are byte-identical
    to the full payload's."""
    return {
        "metric": payload["metric"],
        "value": payload["value"],
        "unit": payload["unit"],
        "queries": payload["queries"],
        "sf": payload["sf"],
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", ""),
        "value_full": payload["value_full"],
        "calibration_s": payload["calibration_s"],
        "host_factor": payload["host_factor"],
        "full_payload": out_name,
    }


def cross_round_suspects(
    timings: dict[str, float],
    prior: dict[str, float],
    factor: float = 2.0,
    floor: float = 0.5,
) -> dict[str, dict[str, float]]:
    """Cross-round sanity flag (r13 verdict directive 5): cells whose
    kept median exceeds ``factor`` x the previous committed round's
    wall (above the noise floor) — the uniformly-slow-window stall
    the within-session spread trigger cannot see (r13: g1 committed
    5.84s vs 1.59s prior with BOTH rep series stalled; idle-host
    re-time read 1.84s). Flagged cells are SUSPECT, not adjudicated:
    a plan change legitimately moves a wall, so the flag records the
    pair for the verdict's audit rather than re-running anything."""
    out = {}
    for name, t in timings.items():
        p = prior.get(name)
        if p is not None and p >= floor and t > factor * p:
            out[name] = {"now": t, "prior": p}
    return out


def load_prior_bench(here: Path) -> tuple[dict[str, float], str]:
    """The most recent committed bench_full_r*.json's per-query
    NORMALIZED medians (falling back to raw for pre-normalization
    artifacts; empty when none exists). Normalized, because the
    suspect comparison crosses VMs — raw-vs-raw would false-flag on
    the documented ~1.6x host drift and miss real stalls on a fast
    host (r14 review finding)."""
    import re

    best, best_no = None, -1
    for p in here.glob("bench_full_r*.json"):
        m = re.match(r"bench_full_r(\d+)\.json", p.name)
        if m and int(m.group(1)) > best_no:
            best, best_no = p, int(m.group(1))
    if best is None:
        return {}, ""
    try:
        payload = json.loads(best.read_text())
        return (
            payload.get("queries_normalized")
            or payload.get("queries", {}),
            best.name,
        )
    except (OSError, ValueError):
        return {}, ""

# --- Host-speed calibration (r6 verdict directive 2) -----------------
# Same-code anchor totals drifted up to ~1.6x between round VMs (r5:
# 8.79s; four r6 runs: 10.4-14.3s), making cross-round per-query
# comparisons undecidable. Fix: time a FIXED pure-compute job (no
# parquet IO, fully deterministic: range -> xxhash64 -> 2M-group
# aggregate -> terminal sort, exercising codegen CPU + shuffle + sort
# like the real queries) in the same session, and report
#   host_factor = calibration_s / CALIBRATION_REF_S
# so any series can be divided by host_factor to compare across
# rounds. CALIBRATION_REF_S is the calibration as measured BY THE
# BENCH ITSELF on the r7 reference VM (bench_full_r07.json,
# 2026-08-14) — the ref must come from the same position in the same
# sequence the factor is measured in, because JVM/session context
# shifts the job ~15% (quiet-session medians read 2.8-3.2 on the same
# host). host_factor == 1.0 therefore means "the r7 bench host";
# within-session repeatability is ~±10%, adequate for the ~1.3-1.6x
# cross-round drift this exists to detect.
CALIBRATION_REF_S = 3.383
CAL_ROWS = 30_000_000
CAL_GROUPS = 2_000_003
CAL_REPS = 5


def _calibration_job(spark) -> None:
    from pyspark.sql import functions as F

    df = (
        spark.range(0, CAL_ROWS, 1, 32)
        .withColumn("h", F.xxhash64("id"))
        .withColumn("k", F.pmod("h", F.lit(CAL_GROUPS)))
        .groupBy("k")
        .agg(
            # pmod keeps the ANSI sum far from LONG overflow
            F.sum(F.pmod("h", F.lit(1_000_003))).alias("s"),
            F.count("*").alias("c"),
        )
        .orderBy("s", "k")
    )
    df.write.mode("overwrite").format("noop").save()


def calibrate(spark) -> float:
    """Median wall time of the fixed calibration job (2 warm-ups).
    The canonical-position sample: runs where r7-r10 ran it (after
    the bench warm-up, before the query loop), which is the position
    CALIBRATION_REF_S was measured in."""
    import gc

    for _ in range(WARMUPS):
        _calibration_job(spark)
    reps = []
    for _ in range(CAL_REPS):
        gc.collect()
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        _calibration_job(spark)
        reps.append(time.perf_counter() - t0)
    return round(statistics.median(reps), 3)


def calibrate_sample(spark) -> float:
    """One mid-run calibration sample (median of 3 reps, no warm-ups
    — the JVM is hot mid-bench). r10 verdict directive 4: two
    same-round single-sample calibrations on near-identical hosts
    read 3.578 vs 2.617s (~1.4x), which is the size of the effects
    host_factor is used to detect — so a single sample cannot bear
    the weight the normalization puts on it. The bench now takes 5
    samples interleaved through the query loop and normalizes by
    their median; every sample wall ships in the artifact."""
    import gc

    reps = []
    for _ in range(3):
        gc.collect()
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        _calibration_job(spark)
        reps.append(time.perf_counter() - t0)
    return round(statistics.median(reps), 3)

# Headline set: scan-heavy agg, window chains, multi-joins, streaming-
# equivalent, plus the LLM ops that scale (exact dedup, minhash AND
# simhash candidate generation, text quality, ANN top-k — brute-force
# baseline v1 plus both 100TB scale paths, LSH v2 and IVF v4 — and
# sharded packing). Excludes the O(n^2)-ish exact-Jaccard verifier.
#
# ANCHOR is the exact query set round 1 measured (27.797s total): the
# reported "value" sums ONLY these so the round-over-round series and
# the 2x-of-BASELINE gate stay apples-to-apples as the headline set
# grows. Everything timed is still in "queries"; "value_full" sums
# the whole set and "value_scale_paths" the post-r1 additions.
ANCHOR = [
    "a1_pricing_summary",
    "a2_daily_min",
    "a3_latest_order_per_customer",
    "a4_dedupe_latest_lineitem",
    "w1_cumulative_spend",
    "w5_densify_ffill",
    "j1_master_daily_join",
    "st1_tumbling_daily",
    "f23_binned_group_mean",
    "d1_exact_dedup",
    "d3_minhash_lsh_pairs",
    "t1_token_quality",
    "t3_fingerprint",
    "v1_cosine_topk_bruteforce",
    "m1_multimodal_metadata",
    "m2_frame_sampling",
    "st2_sessionize",
    "t4_length_quantiles",
]

HEADLINE = [
    "a1_pricing_summary",
    "a2_daily_min",
    "a3_latest_order_per_customer",
    "a4_dedupe_latest_lineitem",
    "w1_cumulative_spend",
    "w5_densify_ffill",
    "j1_master_daily_join",
    "st1_tumbling_daily",
    "f23_binned_group_mean",
    "d1_exact_dedup",
    "d3_minhash_lsh_pairs",
    "d4_simhash_candidates",
    "t1_token_quality",
    "t3_fingerprint",
    "t6b_sequence_packing_sharded",
    "v1_cosine_topk_bruteforce",
    "v2_cosine_topk_lsh",
    "v4_cosine_topk_ivf",
    # ANN serve shape: large query batch / warm index (see
    # plans/llm_queries.py bench-variant notes) — at the registered
    # Q=5 shape the index overhead dominates and brute force wins;
    # these entries time the shape a standing deployment runs.
    "v2_lsh_serve_q500",
    "v4_ivf_serve_q500",
    "m1_multimodal_metadata",
    "m2_frame_sampling",
    "st2_sessionize",
    "t4_length_quantiles",
    "j4_spatial_join",
    "t10_clean_corpus",
    # r4 additions: chunking/PII are narrow text passes, st3 is the
    # streaming-dedup twin, a13 the fixed-column pivot, and
    # d5_groups_lsh the full dedup composition (LSH candidates ->
    # connected-components groups — the pipeline a 100 TB dedup run
    # actually executes; registered d5 uses the d2 exact verifier for
    # oracle-ability and is priced by it).
    "t11_document_chunking",
    "t12_pii_redaction",
    "st3_replay_dedup",
    "a13_pivot_event_values",
    "d5_groups_lsh",
    # r5 additions: contamination scan (cross-corpus inverted index),
    # dataset split + shuffle order (range exchange), int8 embedding
    # quantization, Gopher repetition metrics, vocab top-k.
    "c1_contamination",
    "t13_hash_split",
    "v5_quantize_embeddings",
    "t14_repetition_metrics",
    "t15_vocab_topk",
    "st4_attribution",
    # r6 additions: multi-probe LSH serve (prices the recall knob vs
    # v2_lsh_serve_q500), int8-index serve (the v5 quantizer's
    # consumer: 1/8-size index, dequantize-only-candidates), and the
    # fused end-to-end master-table pipeline (MLPREP+MERGE in one
    # plan).
    "v2mp_lsh_serve_q500",
    "v5_int8_serve_q500",
    "e2e_master_daily",
    # r6 batch-2 additions: semantic dedup (the SemDeDup scale path
    # over the clustered embedding space), the bucketed co-located
    # join (steady-state = exchange-free merge join; the one-off
    # layout write happens in the warm-ups), and the stream-static
    # segment rollup twin.
    "v6_semantic_dedup",
    # r8: the SemDeDup SCALE path (corpus-sized codebook — the sf1.0
    # probe measured the fixed 8-cell oracle shape quadratic at 17x
    # wall for 10x data; this is what a 100 TB run calls).
    "v6s_semantic_dedup_scaled",
    "b1_bucketed_join_agg",
    "st5_segment_rollup",
    # r6 batch-3 additions: TF-IDF matrix (vocab join), BPE merge-step
    # pair counts, per-label centroids (posexplode aggregate), CUBE
    # lattice aggregate.
    "t17_tfidf_matrix",
    "t18_bpe_pairs",
    "v7_label_centroids",
    "a15_cube_events",
    "a16_decile_stats",
    "p15_semi_anti_orders",
    "g1_pagerank_bipartite",
    "g2_dup_triangles",
    "st2b_session_window",
    "t19_quality_verdicts",
    "t20_stratified_take_k",
    "d6_edit_distance_pairs",
    "w6_rolling_7d",
    "c2_decontaminated_corpus",
    "q3_sql_revenue_topk",
    "t21_unigram_logprob",
    "v8_pq_codes",
    "v8_pq_serve_q500",
    # r7: trained-codebook ADC serve (fit_pq_codebooks on a corpus
    # sample during warm-up; timed region is serve-only, same plan
    # shape as v8_pq_serve_q500 — prices the trained-vs-grid tier).
    "v8t_pq_serve_q500",
    # r7: IVFADC — IVF cells + trained residual PQ; the composed
    # index at the same 8-byte code budget (best quantized recall).
    "v9_ivfpq_serve_q500",
    # r9: IVFADC over the product-assigned (inverted-multi-index)
    # coarse level — per-half probe ranking, nothing C-sized at
    # build OR serve; the plan shape for corpus-scaled cell counts.
    "v9ps_ivfpq_product_serve_q500",
    # r8: IVFADC + exact rerank of a 50-candidate shortlist
    # (IVFADC+R) — same index, recall bounded by shortlist recall
    # instead of code resolution (0.711 vs 0.387 @10 on the fixture).
    "v9r_ivfpq_rerank_serve_q500",
    "o4_topk_orders_per_customer",
    # r7 registrations: cohort retention (two user-keyed shuffles +
    # distinct count), ordered funnel (stage scans + min-aggregates),
    # unpivot (zero-shuffle Expand).
    "e3_cohort_retention",
    "e4_funnel_stages",
    "u3_unpivot_measures",
    # r7 batch 2: CDC snapshot diff (two argmax snapshots + full-outer
    # classify), SCD2 intervals (one LEAD window), exact grouped
    # median (percentile aggregate).
    "j8_snapshot_diff",
    "w8_scd2_intervals",
    "o5_median_quantity",
    # r8 registrations: interval x interval overlap (two exploded
    # bin-bucketed sides), LEAD-state time-weighted mean, the dedup
    # purge composition (pair graph -> CC -> per-cluster argmax), and
    # the standardized LM quality score (t21 + corpus moments).
    "j9_interval_overlap",
    "w9_time_weighted_avg",
    "d7_canonical_docs",
    "t22_lm_quality_zscore",
    # r9: the oracle-certified IVFADC+rerank twin (registered), and
    # the dedup-purge retention at its SCALE shape (MinHash-LSH
    # candidates feeding the canonical pick — registered d7 keeps the
    # exact-Jaccard input for oracle-ability, mirroring d5 vs
    # d5_groups_lsh).
    "v9rp_ivfpq_rerank_grid",
    "d7_canonical_docs_lsh",
    # r9 late registrations: integer-exact novelty, all-DECIMAL EWMA,
    # the interval anti-join
    "t23_ngram_novelty",
    "w10_ewma_8",
    "j10_interval_anti_join",
    # r10 registrations: the oracle-certified IMI serve twin (grid
    # books, per-half probe ranking at per_half < kc), and the
    # TPC-H Q5-shape six-relation star join (five bhj over one
    # lineitem scan, one aggregate shuffle).
    "v9pss_imi_serve_grid",
    "q5_local_supplier_volume",
    # r10: the Z-order layout key (exact-min/max Morton arithmetic —
    # the write-time data-skipping lever; prices the 32-term
    # interleave projection + the 4-scalar broadcast aggregate).
    "b2_zorder_key",
    # r10 second wave: the skyline (aggregate-and-broadcast frontier)
    # and the lossless prefix-filtered Jaccard join (prices the
    # df-ordered prefix index vs d2's capped index on the same
    # corpus).
    "o6_pareto_frontier",
    "d8_prefix_jaccard_pairs",
    # r10 third wave: containment (subset) pairs — one rarest-shingle
    # probe per doc against the inverted index + exact verify.
    "d9_containment_pairs",
    # r11: substring-level exact dedup (positional window hashes,
    # count-distinct-per-hash — never pairs — then island merge) and
    # the md5-parity LSH purge pipeline (prices the certified
    # composition next to the xxhash64 production one above).
    "d10_exact_substring_spans",
    "d10x_substring_excision",
    "d7p_canonical_docs_lsh",
    # r11 third wave: span-level decontamination (one train pass,
    # broadcast eval window set, island merge)
    "c3_span_decontamination",
    # r11 fourth wave: the REAL pure-stdlib codec paths — netpbm
    # pixel decode and WAV PCM16 encode->decode round-trip, both
    # shuffle-free single-scan Arrow-kernel plans (prices the Python
    # decode boundary itself)
    "m5_image_stats",
    "m6_audio_features",
    # r11 fifth wave: real mixed AVI/GIF video frame decode
    "m7_video_frame_stats",
    # r11 sixth wave: temperature-based source mixture (exact-integer
    # rates, broadcast-only plan)
    "t24_temperature_mix",
    # r11 seventh wave: WARC (Common Crawl) ingest — grouped gzip
    # encode + record explode + JVM HTTP split
    "s14_warc_scan",
    # r12 registrations: HTML→text extraction (the WET step — prices
    # the one-Arrow-projection extraction boundary), the fused crawl
    # front-end (WARC → extract → langID → quality → dedup in one
    # plan; ONE pipeline shuffle), and the iterative BPE trainer +
    # encoder (K vocabulary-sized aggregate rounds + a zero-shuffle
    # encode pass).
    "s15_html_extract",
    "e2e_crawl",
    "t25_bpe_train_encode",
    # r12 second wave: the fixed-weight quality scorer (pure
    # row-local integer expressions — prices the zero-shuffle
    # model-scoring pass next to rule-based t19).
    "t26_quality_linear_score",
    # r12 third wave: URL/domain curation (row-local parses +
    # broadcast blocklist anti-join; r13 made the cap two-phase and
    # the registered-domain parse PSL-backed).
    "s16_url_curation",
    # r13 registrations: URL canonicalization + URL-level dedup
    # (row-local regex/array expressions + one canonical-URL window
    # — the stage that now runs BEFORE extraction in e2e_crawl),
    # main-content block filtering (one Arrow segmentation pass +
    # JVM-side jusText scoring), and the quantized TRAINED quality
    # model (same zero-shuffle integer path as t26).
    "s17_url_canonical_dedup",
    "s18_main_content_blocks",
    "t26b_quality_trained_score",
    # r13 fourth wave: the fused front-end with main-content
    # extraction (block segmentation + keep policy + bounded per-doc
    # reassembly replacing the tag-strip kernel).
    "e2e_crawl_mc",
    # r14 registrations: the interpolated bigram LM (one tokenize
    # pass, two explodes, three equi-joins on count relations —
    # prices the higher-order LM against t21's unigram pass) and the
    # trained quantized language-ID model (pure row-local
    # regexp-count projections — prices the feature-extraction scan;
    # zero shuffle, zero UDF).
    "t27_bigram_logprob",
    "t28_langid_model",
    # r14 third wave: CCNet-style perplexity tiering — t21's scoring
    # plan + two tiny cutoff aggregates broadcast back (prices the
    # quality-tier pass over the scored corpus).
    "t29_perplexity_buckets",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])

    from garmin_data_pipeline_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("bench")
    qs = entrymod.queries()
    # Demoted pytest-tier queries leave the driver registry but stay
    # benchable (t3_fingerprint is in the pinned r1 ANCHOR set — the
    # anchor series must keep timing it across demotions).
    from garmin_data_pipeline_spark import plans as _plans

    qs.update({n: q.fn for n, q in _plans.PYTEST_QUERIES.items()})

    # Production (non-oracle-parity) plan overrides: same query, the
    # double-accumulation path a real pipeline would run (the oracle
    # keeps DECIMAL purely for cross-engine hash stability).
    from garmin_data_pipeline_spark.plans.llm_queries import (
        d5_groups_lsh,
        d7_canonical_docs_lsh,
        v2_lsh_serve_q500,
        v2mp_lsh_serve_q500,
        v4_ivf_serve_q500,
        v5_int8_serve_q500,
        v6s_semantic_dedup_scaled,
        v8_pq_serve_q500,
        v8t_pq_serve_q500,
        v9_ivfpq_serve_q500,
        v9ps_ivfpq_product_serve_q500,
        v9r_ivfpq_rerank_serve_q500,
    )
    from garmin_data_pipeline_spark.plans.queries import (
        a1_pricing_summary_production,
    )

    overrides = {
        "a1_pricing_summary": a1_pricing_summary_production,
        "v2_lsh_serve_q500": v2_lsh_serve_q500,
        "v2mp_lsh_serve_q500": v2mp_lsh_serve_q500,
        "v4_ivf_serve_q500": v4_ivf_serve_q500,
        "v5_int8_serve_q500": v5_int8_serve_q500,
        "v6s_semantic_dedup_scaled": v6s_semantic_dedup_scaled,
        "v8_pq_serve_q500": v8_pq_serve_q500,
        "v8t_pq_serve_q500": v8t_pq_serve_q500,
        "v9_ivfpq_serve_q500": v9_ivfpq_serve_q500,
        "v9ps_ivfpq_product_serve_q500": v9ps_ivfpq_product_serve_q500,
        "v9r_ivfpq_rerank_serve_q500": v9r_ivfpq_rerank_serve_q500,
        "d5_groups_lsh": d5_groups_lsh,
        "d7_canonical_docs_lsh": d7_canonical_docs_lsh,
    }

    def run(df) -> None:
        df.write.mode("overwrite").format("noop").save()

    # Warm-up: spin the JVM/codegen once on a small plan.
    run(qs["a2_daily_min"](spark, sf_dir).limit(10))

    # Host-speed calibration: the canonical-position sample BEFORE
    # the query loop (the position CALIBRATION_REF_S is pinned to),
    # then 4 more samples interleaved through the loop (directive 4,
    # r10 verdict: a single 3-second sample has ~1.4x run-to-run
    # variance — as large as the effects it normalizes). host_factor
    # uses the MEDIAN of all 5; each sample wall ships in the payload.
    calibration_samples = [calibrate(spark)]

    timings: dict[str, float] = {}
    spread: dict[str, float] = {}
    stall_reruns: dict[str, dict] = {}
    from garmin_data_pipeline_spark.operators.dedup_scale import (
        unpersist_signatures,
    )

    import gc

    def collect_garbage() -> None:
        # localCheckpoint blocks (the CC loop's per-round state) and
        # superseded caches free only after the Python DataFrame is
        # collected AND the JVM's ContextCleaner sees the weak ref die
        # — force both OUTSIDE the timed region so no rep eats a
        # stop-the-world GC of a previous run's garbage (observed:
        # 4-20s outlier reps on whatever ran near the d5 composition).
        gc.collect()
        spark._jvm.System.gc()

    from garmin_data_pipeline_spark.session import (
        release_new_persistent_rdds,
        snapshot_persistent_rdds,
    )

    # interleave the remaining 4 calibration samples at the quartile
    # boundaries of the query loop
    cal_points = {
        (len(HEADLINE) * i) // 4 for i in range(1, 4)
    } | {len(HEADLINE) - 1}

    for qi, name in enumerate(HEADLINE):
        fn = overrides[name] if name in overrides else qs[name]
        # Checkpoint hygiene (r10): the serve tiers materialize
        # per-call lazy localCheckpoints that only the (lagging)
        # ContextCleaner frees — across a warm-up+reps cell they
        # accumulate as storage pressure and GC noise (the r10
        # serving bench measured v9ps reps growing 5.4 -> 12.9s in
        # one session). Baseline after the first warm-up (which
        # persists the long-lived index) and release the per-call
        # garbage after every subsequent run, outside the timers.
        ckpt_base: set[int] | None = None
        for i in range(WARMUPS):
            run(fn(spark, sf_dir))
            if i == 0:
                ckpt_base = snapshot_persistent_rdds(spark)
            else:
                release_new_persistent_rdds(spark, ckpt_base)
        def timed_reps() -> list[float]:
            out = []
            for _ in range(REPEATS):
                collect_garbage()
                t0 = time.perf_counter()
                run(fn(spark, sf_dir))
                out.append(time.perf_counter() - t0)
                release_new_persistent_rdds(spark, ckpt_base)
            return out

        reps = timed_reps()
        if is_stall_suspect(reps):
            # mechanical stall adjudication: one same-session re-run,
            # keep the better-behaved series, ship both for audit
            rerun = timed_reps()
            kept = pick_series(reps, rerun)
            stall_reruns[name] = {
                "first": [round(r, 3) for r in reps],
                "rerun": [round(r, 3) for r in rerun],
                "kept": kept,
            }
            reps = reps if kept == "first" else rerun
        timings[name] = round(statistics.median(reps), 3)
        spread[name] = round(max(reps) - min(reps), 3)
        # Cache hygiene BETWEEN cells: signature tables persisted by an
        # LSH query would otherwise sit in executor storage while later
        # cells run (each query rebuilds its own plan anyway), showing
        # up as eviction/GC noise in unrelated cells — the d5 spread
        # blow-up the r5 tuning pass chased. Inside a cell the cache is
        # live and measured; releasing it here is outside any timer.
        unpersist_signatures()
        if qi in cal_points:
            calibration_samples.append(calibrate_sample(spark))

    calibration_s = round(statistics.median(calibration_samples), 3)
    host_factor = round(calibration_s / CALIBRATION_REF_S, 3)

    anchor_total = round(sum(timings[n] for n in ANCHOR), 3)
    full_total = round(sum(timings.values()), 3)

    # One-shot sf1.0 scale probe (r7 verdict directive 8): walls and
    # sf1/sf0.1 ratios measured by tools/scale_probe.py in a single
    # session over a deterministic 10x replica set. Folded in from
    # its committed artifact so the per-round bench payload carries
    # the sf1 evidence next to the sf0.1 numbers; ratios are host-
    # independent (both SFs in one session), so staleness only
    # matters when a probed query's plan changes — re-run the probe
    # then.
    sf1_probe = None
    try:
        sf1_probe = json.loads(
            (Path(__file__).resolve().parent / "sf1_probe.json")
            .read_text()
        )
    except (OSError, ValueError):
        pass
    normalized = {
        n: round(t / host_factor, 3) for n, t in timings.items()
    }
    prior_timings, prior_artifact = load_prior_bench(
        Path(__file__).resolve().parent
    )
    # compare in NORMALIZED (host-factor-corrected) space on both
    # sides — cross-round raw walls differ by VM speed alone
    suspects = cross_round_suspects(normalized, prior_timings)
    payload = {
                # r1-r4 name: headline_queries_total_wall. Renamed per
                # ADVICE r4 so the name matches the definition; the
                # VALUE is the same series (the 18-query r1 anchor sum,
                # r1=27.797s at sf0.1), keeping the 2x-of-BASELINE gate
                # apples-to-apples.
                "metric": "anchor18_queries_total_wall",
                "value": anchor_total,
                "unit": "sec",
                "queries": timings,
                "spread": spread,
                "stall_reruns": stall_reruns,
                "stall_rerun_note": (
                    "r12 verdict directive 2: any cell whose timed-"
                    "rep spread exceeds "
                    f"{STALL_SPREAD_FRACTION:.0%} of its median "
                    "(above a "
                    f"{STALL_MIN_MEDIAN_S}s noise floor) is re-run "
                    "once in the same session; the lower-median "
                    "series is reported (an idle host cannot beat "
                    "the code's true wall, so the smaller median is "
                    "the truth) and both series ship here for audit"
                ),
                "sf": sf,
                "value_anchor18": anchor_total,
                "value_full": full_total,
                "value_scale_paths": round(full_total - anchor_total, 3),
                "calibration_s": calibration_s,
                "calibration_samples": calibration_samples,
                "calibration_ref_s": CALIBRATION_REF_S,
                "host_factor": host_factor,
                "value_anchor18_normalized": round(
                    anchor_total / host_factor, 3
                ),
                "queries_normalized": normalized,
                "c1_ab_note": (
                    "r6 verdict directive 3 settled by same-host A/B "
                    "(2026-08-14, 2 warm-ups + 7 reps each): c1 with "
                    "the r6 single-train-scan change (da6b7b5) median "
                    "2.544s vs its parent (238f722) 2.949s at sf0.1 — "
                    "the change is a real ~14% win; the r6 2.55->3.69s "
                    "series move was host drift. Change kept"
                ),
                "v8t_ab_note": (
                    "r9 verdict directive 3 (v8t 4.19->6.35s "
                    "normalized r8->r9 with no code change) settled "
                    "by a same-session 7-rep A/B (2026-08-15, "
                    "tools/serving_bench.py -> bench_serving_r10."
                    "json): v8t median 3.144s vs v8 3.125s at sf0.1 "
                    "(spreads 0.27/0.28s — the tightest of all "
                    "tiers), identical plan, identical wall. The "
                    "cross-round move was host drift; the same-code "
                    "noise band is hereby documented as up to ~1.5x "
                    "ACROSS rounds at these absolute walls (the "
                    "host_factor calibration itself swings ~20%), "
                    "while within-session spreads stay under 0.3s. "
                    "No code change needed"
                ),
                "host_stall_note": (
                    "r10: the first full r10 bench run carried two "
                    "transient host stalls (median-of-3 cells at "
                    "HEADLINE positions 50-54 and 63 read 1.8-4.1x "
                    "their r9 normalized walls with spread ~= "
                    "median; v9 serve read 47.8s/48.3 spread). "
                    "Adjudicated the c1 way, same host, minutes "
                    "apart: the immediate full re-run returned every "
                    "affected cell to its r9 band (v9 6.28s spread "
                    "0.94, g1 2.75, g2 4.09, st2b 0.81, t20 0.31), "
                    "and the dedicated serving artifact plus a "
                    "fresh 3-rep repro agreed (~6-9s). The committed "
                    "artifact is the clean second run; a "
                    "median-of-3 cell CAN absorb a multi-rep VM "
                    "stall, so any cross-round cell move with "
                    "spread ~= median gets a same-host re-run "
                    "before being read as a regression"
                ),
                "v4_ab_note": (
                    "r10 verdict directive 3: v4_cosine_topk_ivf's "
                    "committed r10 cell (6.00s, spread 2.95 ~= "
                    "median — the documented stall signature) and "
                    "w9_time_weighted_avg (1.11s) adjudicated by a "
                    "same-session 2-warmup+7-rep A/B on the r11 VM "
                    "(2026-08-15): v4 median 3.721s spread 0.141 — "
                    "the r10 cell was a transient stall, the true "
                    "band is ~3.7s on this host (r9's 2.96s is the "
                    "same code inside the ~1.5x cross-round host "
                    "band); w9 median 0.806s spread 0.283 — "
                    "between its r9 (0.55) and r10 (1.11) walls, "
                    "sub-noise-floor absolute. No code change "
                    "indicated for either"
                ),
                "checkpoint_hygiene_note": (
                    "r10: per-call serve localCheckpoints are "
                    "released between reps (session."
                    "release_new_persistent_rdds) — the lagging "
                    "ContextCleaner otherwise accumulates them as "
                    "storage pressure (v9ps reps grew 5.4->12.9s "
                    "within one pre-fix session). Walls from r10 on "
                    "are steady-state per call"
                ),
                "calibration_note": (
                    "calibration_s = MEDIAN OF 5 SAMPLES of a fixed "
                    "pure-compute job (range->xxhash64->2M-group agg->"
                    "sort, no IO): one in the canonical r7-r10 "
                    "position (post-warm-up, pre-loop, itself a "
                    "median of 5 reps) plus 4 interleaved at the "
                    "query-loop quartiles (median of 3 reps each) — "
                    "r10 verdict directive 4: two same-round single "
                    "samples read 3.578 vs 2.617s on near-identical "
                    "hosts, a ~1.4x method error as large as any "
                    "effect since r7, so host_factor now rests on "
                    "the median and every sample wall ships in "
                    "calibration_samples. host_factor = calibration_s"
                    " / calibration_ref_s where the ref is the r7 VM."
                    " Divide any series by host_factor before cross-"
                    "round comparison; cross-round claims should "
                    "still be stated raw + the documented ~1.5x "
                    "same-code band when the factor's samples spread "
                    "past ~20%"
                ),
                "anchor_note": (
                    "value == value_anchor18 sums the 18-query round-1 "
                    "anchor set (r1=27.797s at sf0.1); queries/"
                    "value_full cover the grown headline set incl. "
                    "LSH/IVF serve paths; timings are steady-state "
                    "(2 untimed warm-ups per query since r5)"
                ),
                "cross_round_suspects": suspects,
                "cross_round_suspect_prior_artifact": prior_artifact,
                "cross_round_suspect_note": (
                    "r13 verdict directive 5: any NORMALIZED kept "
                    "median > 2x the previous committed round's "
                    "normalized wall (>= 0.5s) is flagged here — "
                    "the uniformly-slow-window stall the within-"
                    "session spread trigger cannot see. Normalized "
                    "on both sides so VM-speed drift neither "
                    "false-flags nor masks. Flags are SUSPECT "
                    "markers for the audit, not adjudications: "
                    "plan-changed queries legitimately move"
                ),
                "r13_adjudication_note": (
                    "the two suspect r13 cells were idle-host "
                    "re-timed by the r13 verdict and adjudicated "
                    "CLEAN: g1_pagerank_bipartite committed 5.839s, "
                    "idle-host median 1.84s (both bench series were "
                    "stalled — the double-stall this round's "
                    "cross_round_suspects flag exists to catch); "
                    "v9ps_ivfpq_product_serve_q500 committed 7.862s, "
                    "idle-host steady-state 5.52s (slow-window, "
                    "tight spread). Neither was a code regression; "
                    "serve tiers re-priced via tools/serving_bench.py "
                    "this round"
                ),
                "sf1_probe": sf1_probe,
                "host_note": (
                    "SAME-CODE anchor totals measured 10.4/13.3/14.3/"
                    "11.2s across four r6 runs on that round's VM vs "
                    "8.79s in r5 — per-round VM speed varies up to "
                    "~1.6x. Since r7 the calibration job quantifies "
                    "this: use host_factor / queries_normalized for "
                    "any cross-round comparison"
                ),
            }
    # Persist the FULL payload (medians + spreads + stall series +
    # normalization + sf1 probe + methodology notes) to a committed
    # per-round artifact so every number stays auditable. Round
    # number: explicit $SPARK_GRAFT_ROUND, else 1 + the highest
    # BENCH_r*.json the driver has already recorded next to this
    # script. Written BEFORE the contract line so a crash between the
    # two can only lose the redundant copy.
    out_name = None
    try:
        here = Path(__file__).resolve().parent
        round_no = os.environ.get("SPARK_GRAFT_ROUND")
        if round_no is None:
            import re

            seen = [
                int(m.group(1))
                for p in here.glob("BENCH_r*.json")
                if (m := re.match(r"BENCH_r(\d+)\.json", p.name))
            ]
            round_no = str(max(seen, default=0) + 1)
        out = here / f"bench_full_r{int(round_no):02d}.json"
        out.write_text(json.dumps(payload, indent=2) + "\n")
        out_name = out.name
    except OSError:
        pass  # bench output on stdout is the contract; the file is extra

    # The stdout CONTRACT LINE is printed LAST and kept COMPACT
    # (r14 verdict "What's wrong" #2: the full payload had grown to
    # one enormous line — 109 medians + spreads + stall series + the
    # sf1 probe + session history — and the r13 run's line was
    # truncated in the driver's output capture, killing the entire
    # round-over-round table; BENCH_r13.json's tail starts
    # mid-object). The line carries exactly the driver contract
    # (metric/value/unit/queries/sf) plus a few scalar extras
    # (~4 KB); everything bulky lives only in the bench_full file
    # named here. No number changed meaning: `queries` are the same
    # per-query medians as before.
    print(json.dumps(contract_line(payload, out_name)))


if __name__ == "__main__":
    main()
