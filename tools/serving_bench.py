"""One-session serving-tier wall snapshot -> bench_serving_r{N}.json.

r9 verdict directive 4: SERVING.md's wall column used to quote the
per-round ``bench_full_r*.json``, which the round driver RE-RUNS and
overwrites after the builder commits — so the quoted walls stopped
being reproducible from the repo. This tool writes a dedicated
artifact that ``bench.py`` never touches: every serve tier timed in
ONE session (internally comparable), with the same calibration job
bench.py runs (divide by ``host_factor`` for cross-round comparison).

It also carries the r9 directive-3 adjudication protocol built in:
each tier gets the c1-method treatment (2 untimed warm-ups + 7 timed
reps, median + full rep list recorded), so any cross-round move of a
single tier — like v8t's unexplained 4.19 -> 6.35s normalized r8->r9
— can be judged against its own same-session spread instead of
against single-run walls from different VMs.

Usage: python tools/serving_bench.py [sf_dir]   (default sf0.1 —
the SERVING.md pricing shape; ~6-10 min; run on an IDLE machine)
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

WARMUPS = 2
REPEATS = 7


def _round_no() -> int:
    env = os.environ.get("SPARK_GRAFT_ROUND")
    if env is not None:
        return int(env)
    seen = [
        int(m.group(1))
        for p in ROOT.glob("BENCH_r*.json")
        if (m := re.match(r"BENCH_r(\d+)\.json", p.name))
    ]
    return max(seen, default=0) + 1


def main() -> None:
    from bench import CALIBRATION_REF_S, calibrate

    from garmin_data_pipeline_spark.plans.llm_queries import (
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
    from garmin_data_pipeline_spark.session import get_spark

    sf_dir = (
        sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    )
    spark = get_spark("serving-bench")
    spark.sparkContext.setLogLevel("ERROR")

    tiers = {
        "v2_lsh_serve_q500": v2_lsh_serve_q500,
        "v2mp_lsh_serve_q500": v2mp_lsh_serve_q500,
        "v4_ivf_serve_q500": v4_ivf_serve_q500,
        "v5_int8_serve_q500": v5_int8_serve_q500,
        "v8_pq_serve_q500": v8_pq_serve_q500,
        "v8t_pq_serve_q500": v8t_pq_serve_q500,
        "v9_ivfpq_serve_q500": v9_ivfpq_serve_q500,
        "v9ps_ivfpq_product_serve_q500": v9ps_ivfpq_product_serve_q500,
        "v9r_ivfpq_rerank_serve_q500": v9r_ivfpq_rerank_serve_q500,
    }

    calibration_s = calibrate(spark)
    host_factor = round(calibration_s / CALIBRATION_REF_S, 3)

    def run(df) -> None:
        df.write.mode("overwrite").format("noop").save()

    from garmin_data_pipeline_spark.session import (
        release_new_persistent_rdds,
        snapshot_persistent_rdds,
    )

    results: dict[str, dict] = {}
    for name, fn in tiers.items():
        # baseline after the index-persisting first warm-up; release
        # per-call checkpoint garbage after every later run (see
        # session.release_new_persistent_rdds — without this, v9ps
        # reps grew monotonically 5.4 -> 12.9s within one session)
        ckpt_base = None
        for i in range(WARMUPS):
            run(fn(spark, sf_dir))
            if i == 0:
                ckpt_base = snapshot_persistent_rdds(spark)
            else:
                release_new_persistent_rdds(spark, ckpt_base)
        reps = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            run(fn(spark, sf_dir))
            reps.append(round(time.perf_counter() - t0, 3))
            release_new_persistent_rdds(spark, ckpt_base)
        med = round(statistics.median(reps), 3)
        results[name] = {
            "median_s": med,
            "median_normalized_s": round(med / host_factor, 3),
            "reps_s": reps,
            "spread_s": round(max(reps) - min(reps), 3),
        }
        print(
            f"{name}: median={med}s "
            f"(normalized {results[name]['median_normalized_s']}s, "
            f"reps {reps})",
            file=sys.stderr,
        )

    payload = {
        "sf_dir": sf_dir,
        "warmups": WARMUPS,
        "repeats": REPEATS,
        "calibration_s": calibration_s,
        "calibration_ref_s": CALIBRATION_REF_S,
        "host_factor": host_factor,
        "tiers": results,
        "note": (
            "All serve tiers timed in ONE session (2 untimed warm-ups"
            " + 7 timed reps each — the c1 A/B protocol), medians +"
            " full rep lists recorded. This artifact is written ONLY"
            " by tools/serving_bench.py; bench.py never overwrites it,"
            " so SERVING.md's wall column stays reproducible from the"
            " repo (r9 verdict directive 4). Divide by host_factor"
            " for cross-round comparison; within-session tier"
            " ordering is the primary signal."
        ),
    }
    out = ROOT / f"bench_serving_r{_round_no():02d}.json"
    out.write_text(json.dumps(payload, indent=2) + "\n")
    print(json.dumps({str(out.name): {n: r["median_s"] for n, r in results.items()}}))


if __name__ == "__main__":
    main()
