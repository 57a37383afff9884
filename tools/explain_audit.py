"""Physical-plan audit: regenerate EXPLAIN.md.

For every registered query (plus bench-only serve variants), walks the
executed plan and tabulates the properties that decide 100 TB
behavior: shuffle count, join strategies, whole-stage-codegen span
count, Python boundaries, scan-level filter pushdown and column
pruning. The committed EXPLAIN.md is the reviewable evidence that the
plans have the shapes the docstrings claim.

Usage: python tools/explain_audit.py [sf_dir]   (default sf0.001 —
plan SHAPE is scale-invariant; AQE may pick different join physical
ops at larger SFs, noted inline)
"""

from __future__ import annotations

import re
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from garmin_data_pipeline_spark.plans.lint import (  # noqa: E402
    NLJ_ALLOWLIST,
)

MD = Path(__file__).resolve().parent.parent / "EXPLAIN.md"

# Plan-node spellings that matter at scale.
PATTERNS = {
    "shuffles": r"Exchange (?:hashpartitioning|rangepartitioning|RoundRobinPartitioning|SinglePartition)",
    "bhj": r"BroadcastHashJoin",
    "smj": r"SortMergeJoin",
    "shj": r"ShuffledHashJoin",
    "bnlj": r"BroadcastNestedLoopJoin",
    "cartesian": r"CartesianProduct",
    "codegen": r"\*\(\d+\)",
    "arrow_python": r"MapInPandas|FlatMapGroupsInPandas|ArrowEvalPython",
    "row_python": r"BatchEvalPython",
    "window": r"\bWindow\b|RunningWindowFunction",
    "hashagg": r"HashAggregate|ObjectHashAggregate",
    "sortagg": r"SortAggregate",
}


def audit_one(plan: str) -> dict:
    out = {k: len(re.findall(p, plan)) for k, p in PATTERNS.items()}
    # codegen: count DISTINCT span ids, not node annotations
    out["codegen"] = len(set(re.findall(r"\*\((\d+)\)", plan)))
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    out["pushed_filters"] = sum(1 for p in pushed if p.strip())
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    cols = max((len(s.split(",")) for s in schemas if s), default=0)
    # A long FileScan line truncates its ReadSchema struct mid-type
    # (no closing `>`, so the regex above misses it — the four `?`
    # cells of r9). The scan's bracketed OUTPUT list on the same line
    # is the identical pruned column set and never truncates at these
    # widths — count that too and keep the widest.
    scans = re.findall(r"FileScan \S+ \[([^\]]*)\]", plan)
    cols = max(
        cols,
        max((len(s.split(",")) for s in scans if s.strip()), default=0),
    )
    if not cols:
        # A lazily-localCheckpointed relation replaces its whole
        # subtree (file scan included) with `Scan ExistingRDD[...]`,
        # so ReadSchema is genuinely absent — the checkpoint output
        # width IS the pruning evidence at that boundary (what was
        # materialized and re-scanned downstream).
        rdd_outs = re.findall(r"Scan ExistingRDD[^\[]*\[([^\]]*)\]", plan)
        cols = max(
            (len(s.split(",")) for s in rdd_outs if s.strip()), default=0
        )
    out["scan_cols"] = str(cols) if cols else "?"
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from garmin_data_pipeline_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("explain-audit")
    qs = dict(entrymod.queries())

    # Demoted pytest-tier queries stay in the audit: demotion changes
    # driver visibility, not plan standards (ledger policy 4).
    from garmin_data_pipeline_spark.plans import PYTEST_QUERIES

    for name, q in PYTEST_QUERIES.items():
        qs[f"{name} (pytest-tier)"] = q.fn

    # Bench-only variants are part of the perf story — audit them too.
    from garmin_data_pipeline_spark.plans.llm_queries import (
        d5_groups_lsh,
        d7_canonical_docs_lsh,
        v2_index_build,
        v2_lsh_serve_q500,
        v2mp_lsh_serve_q500,
        v4_index_build,
        v4_ivf_serve_q500,
        v5_int8_serve_q500,
        v6s_semantic_dedup_scaled,
        v8_pq_serve_q500,
        v8t_index_build,
        v8t_pq_serve_q500,
        v9_index_build,
        v9_ivfpq_serve_q500,
        st8_overlap_batch,
        v9pr_index_build,
        v9ps_ivfpq_product_serve_q500,
        v9r_ivfpq_rerank_serve_q500,
    )

    qs["v2_lsh_serve_q500 (bench-only)"] = v2_lsh_serve_q500
    qs["v2mp_lsh_serve_q500 (bench-only)"] = v2mp_lsh_serve_q500
    qs["v4_ivf_serve_q500 (bench-only)"] = v4_ivf_serve_q500
    qs["v5_int8_serve_q500 (bench-only)"] = v5_int8_serve_q500
    qs["v8_pq_serve_q500 (bench-only)"] = v8_pq_serve_q500
    qs["v8t_pq_serve_q500 (bench-only)"] = v8t_pq_serve_q500
    qs["v9_ivfpq_serve_q500 (bench-only)"] = v9_ivfpq_serve_q500
    qs["v9ps_ivfpq_product_serve_q500 (bench-only)"] = (
        v9ps_ivfpq_product_serve_q500
    )
    qs["v9r_ivfpq_rerank_serve_q500 (bench-only)"] = (
        v9r_ivfpq_rerank_serve_q500
    )
    qs["v6s_semantic_dedup_scaled (bench-only)"] = v6s_semantic_dedup_scaled
    qs["d5_groups_lsh (bench-only)"] = d5_groups_lsh
    qs["d7_canonical_docs_lsh (bench-only)"] = d7_canonical_docs_lsh
    qs["v2_index_build (probe-only)"] = v2_index_build
    qs["v4_index_build (probe-only)"] = v4_index_build
    qs["v8t_index_build (probe-only)"] = v8t_index_build
    qs["v9_index_build (probe-only)"] = v9_index_build
    qs["v9pr_index_build (probe-only)"] = v9pr_index_build
    qs["st8_overlap_batch (probe-only)"] = st8_overlap_batch

    rows = []
    totals: Counter = Counter()
    for name, fn in qs.items():
        plan = (
            fn(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        a = audit_one(plan)
        totals.update(
            {k: a[k] for k in ("shuffles", "row_python", "cartesian")}
        )
        joins = "/".join(
            f"{a[k]}{k}" for k in ("bhj", "smj", "shj", "bnlj") if a[k]
        ) or "—"
        python = (
            "row!" if a["row_python"]
            else ("arrow" if a["arrow_python"] else "—")
        )
        rows.append(
            f"| {name} | {a['shuffles']} | {joins} | {a['codegen']} "
            f"| {python} | {a['window']} | {a['pushed_filters']} "
            f"| {a['scan_cols']} |"
        )

    lines = [
        "# EXPLAIN audit — physical-plan properties per registered query",
        "",
        "Generated by `python tools/explain_audit.py` (re-run after plan",
        f"changes). Plans compiled against `{sf_dir}`; plan SHAPE is",
        "scale-invariant, though AQE may swap join physical operators at",
        "runtime on real statistics.",
        "",
        "Reading guide: **shuffles** = `Exchange` nodes (each is a full",
        "network repartition of its input — the unit of cost at 100 TB);",
        "**joins** = broadcast-hash (bhj) / sort-merge (smj) /",
        "shuffled-hash (shj) / broadcast-nested-loop (bnlj — only the",
        "documented deliberate ones); **codegen** = distinct whole-stage",
        "codegen spans (work fused into single JVM loops); **python** =",
        "`arrow` for vectorized mapInPandas kernels (multimodal decode",
        "only), `row!` would flag row-at-a-time Python (none; enforced by",
        "tests/test_scale_ops.py); **win** = window operators (all",
        "partitioned — enforced by the same test); **pushed** = scans",
        "with non-empty `PushedFilters`; **cols** = widest scan's column",
        "count after pruning (documents/events tables are 4-6 cols wide,",
        "lineitem 7 — a narrow number here means pruning reached the",
        "reader; a truncated ReadSchema falls back to the FileScan's",
        "bracketed output list — the same pruned column set).",
        "",
        "Checkpoint visibility: `e2e_crawl` lazily localCheckpoints",
        "its extracted relation (one kernel pass feeds both dedup-",
        "annotation join sides), so the outer plan audited here shows",
        "only the aggregate/join tail — the upstream (grouped Arrow",
        "WARC build, record explode, partitioned canonical-URL window,",
        "SINGLE-evaluation extraction kernel) is asserted directly on",
        "the pre-checkpoint relation by",
        "tests/test_skew_hardening.py::TestCrawlDedupAnnotationShape.",
        "",
        "| query | shuffles | joins | codegen | python | win | pushed | cols |",
        "|---|---|---|---|---|---|---|---|",
        *rows,
        "",
        f"**Totals:** {totals['shuffles']} shuffles across "
        f"{len(rows)} plans (registered + bench-only); "
        f"{totals['row_python']} row-at-a-time Python nodes; "
        f"{totals['cartesian']} cartesian products.",
        "",
        "Invariants enforced in CI (tests/test_scale_ops.py):",
        "no `BatchEvalPython` anywhere, `MapInPandas` only in the",
        "multimodal decode, no `CartesianProduct`, `BroadcastNestedLoopJoin`",
        "only in the allowlisted broadcast-small-side plans (the",
        "operative list — shared with the test via",
        "`plans.lint.NLJ_ALLOWLIST`, so this prose cannot drift):",
        "",
        *[
            f"- `{name}` — {reason}"
            for name, reason in sorted(NLJ_ALLOWLIST.items())
        ],
        "",
        "plus: no unpartitioned Window in any registered query, no",
        "Array/Map/Struct column in any registered output",
        "(driver-hashable scalars only), no computed-double->DECIMAL",
        "cast (plans/lint.py float discipline), and the serve-plan",
        "invariant: every `*_serve_q500` plan has NO SortMergeJoin and",
        "at most one Exchange (two for v4's documented query-side",
        "probe-rank window) — the corpus-sized index never moves at",
        "serve time (r7 verdict directive 3).",
        "",
    ]
    MD.write_text("\n".join(lines))
    print(f"wrote {MD} ({len(rows)} queries)")


if __name__ == "__main__":
    main()
