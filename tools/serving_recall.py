"""Measured recall@k of every ANN serve tier vs brute force.

Feeds SERVING.md (the committed serve-tier selection guide) and
tests/test_serving_guide.py (which recomputes these figures — every
tier is seeded/deterministic, so the numbers are exact, not
thresholds). Run directly for a refresh:

    python tools/serving_recall.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def tier_recalls(spark, sf_dir: str, k: int = 10) -> dict[str, float]:
    """recall@k against exact cosine for each serve tier, at the
    bench serve shape (Q=500 queries, the tiers' registered build
    parameters: 8 planes / dim 64 / radius-2 probes / 64-cell IVF —
    n_probe=4 for v4's exact rerank, n_probe=16 for v9's IVFADC
    bench shape / m=8 k=16 PQ; v9r = v9's index + exact rerank of a
    50-candidate shortlist)."""
    from garmin_data_pipeline_spark.operators.similarity import (
        cosine_topk_bruteforce,
    )
    from garmin_data_pipeline_spark.plans.llm_queries import (
        _serve_queries,
        v2_lsh_serve_q500,
        v2mp_lsh_serve_q500,
        v4_ivf_serve_q500,
        v5_int8_serve_q500,
        v8_pq_serve_q500,
        v8t_pq_serve_q500,
        v9_ivfpq_serve_q500,
        v9ps_ivfpq_product_serve_q500,
        v9r_ivfpq_rerank_serve_q500,
    )
    from garmin_data_pipeline_spark.plans.registry import table

    emb = table(spark, sf_dir, "embeddings")
    exact = cosine_topk_bruteforce(emb, _serve_queries(emb), k=k)
    exact_set = {
        (r.query_id, r.vec_id) for r in exact.collect()
    }

    def recall(df) -> float:
        got = {
            (r.query_id, r.vec_id)
            for r in df.limit(10_000_000).collect()
        }
        return round(len(exact_set & got) / len(exact_set), 3)

    tiers = {
        "v2_lsh": v2_lsh_serve_q500,
        "v2mp_lsh": v2mp_lsh_serve_q500,
        "v4_ivf": v4_ivf_serve_q500,
        "v5_int8": v5_int8_serve_q500,
        "v8_pq_grid": v8_pq_serve_q500,
        "v8t_pq_trained": v8t_pq_serve_q500,
        "v9_ivfpq": v9_ivfpq_serve_q500,
        "v9ps_ivfpq_product": v9ps_ivfpq_product_serve_q500,
        "v9r_ivfpq_rerank": v9r_ivfpq_rerank_serve_q500,
    }
    out = {"v1_float": 1.0}
    for name, fn in tiers.items():
        out[name] = recall(fn(spark, sf_dir))
    return out


def imi_per_half_curve(
    spark, sf_dir: str, per_halfs=(2, 4, 8), k: int = 10
) -> dict[int, float]:
    """recall@k of the IMI serve (v9ps) vs ``per_half`` at the bench
    shape (fixed n_probe=16, kc=8 half-books) — THE tuning knob a
    corpus-scaled-C deployment has (r9 verdict directive 5): the
    per-half cutoff can miss a pair whose halves both rank just past
    it, and per_half = kc (= sqrt(C) = 8 here) is the exhaustive
    setting, pytest-pinned bit-equal to the flat ranking. Reuses the
    cached v9ps index so the sweep prices only the serve."""
    from garmin_data_pipeline_spark.operators.similarity import (
        cosine_topk_bruteforce,
        search_ivf_pq_product,
    )
    from garmin_data_pipeline_spark.plans.llm_queries import (
        _IVFPQ_PROD_SERVE_CACHE,
        _PQ_K,
        _PQ_M,
        _PQ_SUBDIM,
        _serve_queries,
        v9ps_ivfpq_product_serve_q500,
    )
    from garmin_data_pipeline_spark.plans.registry import table

    emb = table(spark, sf_dir, "embeddings")
    v9ps_ivfpq_product_serve_q500(spark, sf_dir)  # populate cache
    index, coarse, books = _IVFPQ_PROD_SERVE_CACHE[sf_dir]
    exact_set = {
        (r.query_id, r.vec_id)
        for r in cosine_topk_bruteforce(
            emb, _serve_queries(emb), k=k
        ).collect()
    }
    out = {}
    for ph in per_halfs:
        got = {
            (r.query_id, r.vec_id)
            for r in search_ivf_pq_product(
                index, coarse, books, _serve_queries(emb),
                k=k, n_probe=16, per_half=ph,
                pq_m=_PQ_M, pq_k=_PQ_K, subdim=_PQ_SUBDIM,
            ).collect()
        }
        out[ph] = round(len(exact_set & got) / len(exact_set), 3)
    return out


def ivfadc_n_probe_curve(
    spark, sf_dir: str, n_probes=(4, 16, 32, 64), k: int = 10
) -> dict[int, float]:
    """recall@k of the flat IVFADC serve (v9) vs ``n_probe`` — the
    knob SERVING.md tells deployments to turn FIRST (the per_half
    curve saturates, candidate-cell coverage doesn't): measured
    rather than asserted. n_probe=64 probes every cell, so what's
    left of the gap to 1.0 there is pure 8-byte code resolution —
    the share of recall only the v9r rerank stage can buy back.
    Reuses the cached v9 index so the sweep prices only the serve."""
    from garmin_data_pipeline_spark.operators.similarity import (
        cosine_topk_bruteforce,
        search_ivf_pq,
    )
    from garmin_data_pipeline_spark.plans.llm_queries import (
        _IVFPQ_SERVE_CACHE,
        _PQ_K,
        _PQ_M,
        _PQ_SUBDIM,
        _serve_queries,
        v9_ivfpq_serve_q500,
    )
    from garmin_data_pipeline_spark.plans.registry import table

    emb = table(spark, sf_dir, "embeddings")
    v9_ivfpq_serve_q500(spark, sf_dir)  # populate cache
    index, cents, books = _IVFPQ_SERVE_CACHE[sf_dir]
    exact_set = {
        (r.query_id, r.vec_id)
        for r in cosine_topk_bruteforce(
            emb, _serve_queries(emb), k=k
        ).collect()
    }
    out = {}
    for np_ in n_probes:
        got = {
            (r.query_id, r.vec_id)
            for r in search_ivf_pq(
                index, cents, books, _serve_queries(emb),
                k=k, n_probe=np_,
                pq_m=_PQ_M, pq_k=_PQ_K, subdim=_PQ_SUBDIM,
            ).collect()
        }
        out[np_] = round(len(exact_set & got) / len(exact_set), 3)
    return out


def main() -> None:
    from garmin_data_pipeline_spark.session import get_spark

    sf_dir = (
        sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    )
    spark = get_spark("serving_recall")
    for name, r in tier_recalls(spark, sf_dir).items():
        print(f"{name}: {r}")
    for ph, r in imi_per_half_curve(spark, sf_dir).items():
        print(f"v9ps per_half={ph}: {r}")
    for np_, r in ivfadc_n_probe_curve(spark, sf_dir).items():
        print(f"v9 n_probe={np_}: {r}")


if __name__ == "__main__":
    main()
