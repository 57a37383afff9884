"""Plan-level float-discipline lint.

The r8 ``w9_time_weighted_avg`` failure mode: a COMPUTED double
expression cast to DECIMAL. double->DECIMAL conversion is a decimal
ROUNDING of the double's decimal expansion, and the rounding mode is
engine-dependent (Spark HALF_UP, DuckDB HALF_EVEN) — so a query can
hash-match its oracle on one host and miss on another whenever a
product/sum lands within half an ULP of the target scale's midpoint.
``tools/check.py`` passing locally is NOT a sufficient gate for this
class (w9 passed strict local equality for a full round while the
driver disagreed), hence a static lint over the plan itself.

Sanctioned forms the lint allows:
- ``CAST(col AS DECIMAL(p,s))`` of a BARE double column: raw data on
  a known decimal grid (events.value is 2-dp) — the stored double is
  the nearest double to a grid point, whose decimal expansion is
  never a round-half tie, so both engines round it identically.
- ``CAST(ROUND(x, n) AS DECIMAL)``: round() snaps to the n-dp grid
  first (same never-a-tie argument) — the t21/t22 idiom.
- Casts of integral or decimal expressions (exact by construction;
  decimal->decimal rescale narrowing is a separate concern the
  DECIMAL-exact queries avoid by only widening).

Flagged: any Cast to DecimalType whose operand is a computed
expression through which an unconverted double reaches the cast.
"""

from __future__ import annotations

import json
from typing import Any, Iterator


# Single source of truth for the deliberate BroadcastNestedLoopJoin
# plans (every one a tiny-broadcast-side cross join) — consumed by
# BOTH tests/test_scale_ops.py::test_registered_plans_stay_jvm_side
# (the operative gate) and tools/explain_audit.py's footer prose, so
# the two can never drift (ADVICE r8: the footer named 5 of 10).
NLJ_ALLOWLIST: dict[str, str] = {
    "v1_cosine_topk_bruteforce": "corpus x broadcast query set",
    "t9_length_trim": "corpus x broadcast 1-row bounds",
    "b2_zorder_key": (
        "events x broadcast 1-row global min/max bounds for the "
        "Morton scaling (t9's pattern)"
    ),
    "v4_cosine_topk_ivf": "queries x broadcast centroid table",
    "v4p_cosine_topk_ivf_grid": "corpus/queries x broadcast codebook",
    "v9p_ivfpq_codes_grid": (
        "corpus x broadcast codebook (same assign_cells_fixed "
        "scoring as v4p)"
    ),
    "v9rp_ivfpq_rerank_grid": (
        "corpus/queries x broadcast codebook (v9p's build + "
        "probe-cell scoring)"
    ),
    "v6_semantic_dedup": "corpus x broadcast grid codebook",
    "v6p_semantic_dedup_product": "corpus x broadcast dual codebook",
    "o6_pareto_frontier": (
        "per-day max table x broadcast copy of itself (calendar-"
        "bounded: one row per day ever observed) for the cross-"
        "bucket prefix max"
    ),
    "e2e_master_daily": "master x broadcast 1-row mean",
    "t17_tfidf_matrix": "tf x broadcast 1-row corpus count",
    "t21_unigram_logprob": "tokens x broadcast 1-row total",
    "t27_bigram_logprob": (
        "bigram instances x broadcast 1-row token total (t21's "
        "pattern, one LM order higher)"
    ),
    "t22_lm_quality_zscore": "t21's 1-row total + 1-row moments",
    "t29_perplexity_buckets": (
        "scores x broadcast 1-row median then 1-row quartile "
        "cutoffs (plus t21's 1-row total inside the composed "
        "scoring plan)"
    ),
    "t24_temperature_mix": (
        "#sources-row stats x broadcast 1-row total/denominator "
        "(t17/t21's pattern) for the exact mixture rates"
    ),
    "t25_bpe_train_encode": (
        "word/doc states x broadcast 1-ROW argmax merge, K times "
        "(training-order merge application; t17/t21's 1-row pattern "
        "chained)"
    ),
}


# Queries carrying a computed-double->DECIMAL cast that is PROVABLY
# tie-free by magnitude. The rounding modes only diverge on an exact
# round-half tie, and a finite double can only sit exactly on a
# half-ULP-of-scale-s point when its own ULP is >= 2**-(s+1), i.e.
# |x| >= 2**(51 - s): 3.5e13 at s=6, 5.5e11 at s=12. Below that, a
# double's decimal expansion always has nonzero digits past the tie
# position, and HALF_UP == HALF_EVEN. w9's cents x micros products
# sat at ~1e15 — ABOVE the s=6 threshold — which is exactly how it
# produced a locally-green/driver-red hash; the casts below are
# bounded orders of magnitude under their thresholds.
DECIMAL_CAST_ALLOWLIST: dict[str, str] = {
    # sum(extendedprice * (1 - discount) [* (1 + tax)]) at s=6:
    # products < 1e7 << 3.5e13
    "a1_pricing_summary": "revenue products < 1e7 << 2**45",
    "q3_sql_revenue_topk": "revenue products < 1e7 << 2**45",
    # mean token log-prob at s=6: |log p| < 25 << 3.5e13
    "t21_unigram_logprob": "log-probs bounded ~25 << 2**45",
    # same bound, bigram order: the interpolation floor is
    # (1-λ)·c(w2)/T >= 0.25/T, so |ln p| < ln(4T) ~ 25 at any SF
    "t27_bigram_logprob": "log-probs bounded ~25 << 2**45",
    # composes t21's plan (and so its cast), same bound
    "t29_perplexity_buckets": "t21's cast inherited, bounded ~25",
    # squared mean log-prob at s=12: < 650 << 5.5e11 (plus t21's own
    # cast, inherited through composition)
    "t22_lm_quality_zscore": "squares bounded ~650 << 2**39",
}


def _simple(node: dict) -> str:
    return node["class"].rsplit(".", 1)[-1]


def _build(nodes: list[dict], i: int = 0) -> tuple[tuple, int]:
    """Rebuild one tree from TreeNode.toJSON's flat pre-order list."""
    node = nodes[i]
    n = int(node.get("num-children", 0))
    children = []
    j = i + 1
    for _ in range(n):
        child, j = _build(nodes, j)
        children.append(child)
    return (node, children), j


def _iter_expr_trees(obj: Any) -> Iterator[tuple]:
    """Yield rebuilt expression trees from a parsed plan JSON: any
    list of dicts whose head is a catalyst expression node is one
    flattened expression (pre-order, possibly several roots)."""
    if isinstance(obj, list):
        if (
            obj
            and isinstance(obj[0], dict)
            and "class" in obj[0]
            and ".catalyst.expressions." in obj[0]["class"]
        ):
            i = 0
            while i < len(obj):
                tree, i = _build(obj, i)
                yield tree
        else:
            for x in obj:
                yield from _iter_expr_trees(x)
    elif isinstance(obj, dict):
        for k, v in obj.items():
            if k != "class":
                yield from _iter_expr_trees(v)


def _expr_id(node: dict) -> tuple | None:
    eid = node.get("exprId")
    if isinstance(eid, dict):
        return (eid.get("id"), eid.get("jvmId"))
    return None


# Expression roots whose RESULT cannot be a double even when a double
# appears somewhere beneath them (predicates, counts, hashes) — used
# only to avoid tainting an alias of e.g. a boolean flag computed
# FROM a double. The value that reaches a later cast is not the
# double itself there.
_NONDOUBLE_ROOTS = {
    "GreaterThan", "GreaterThanOrEqual", "LessThan",
    "LessThanOrEqual", "EqualTo", "EqualNullSafe", "In", "InSet",
    "IsNull", "IsNotNull", "Not", "And", "Or", "StartsWith",
    "EndsWith", "Contains", "RLike", "Like", "Count", "Size",
    "Length", "Md5", "Sha2", "XxHash64", "Murmur3Hash", "Crc32",
}

_WRAPPERS = ("Alias", "AggregateExpression", "WindowExpression")

# ADVICE r10: aggregate/function nodes do NOT serialize a dataType in
# TreeNode.toJSON (it's a derived def, not a constructor param), so a
# type-based source rule never sees them. These classes return double
# for EVERY input type — their result is a computed double even over
# exact int/decimal children.
_ALWAYS_DOUBLE_CLASSES = {
    "StddevPop", "StddevSamp", "VariancePop", "VarianceSamp",
    "Skewness", "Kurtosis", "Corr", "CovPopulation", "CovSample",
    "Sqrt", "Cbrt", "Exp", "Expm1", "Log", "Logarithm", "Log2",
    "Log10", "Log1p", "Pow", "Rand", "Randn", "Atan2", "Hypot",
    "Sin", "Cos", "Tan", "Asin", "Acos", "Atan", "Sinh", "Cosh",
    "Tanh", "ToRadians", "ToDegrees",
}
# ...and these return double UNLESS their input is decimal (where the
# result stays decimal-exact): avg(long) is double, avg(decimal) is
# decimal(p+4, s+4); l / r over non-decimals is double division.
_DOUBLE_UNLESS_DECIMAL = {"Average", "Divide"}


def _any_child_decimal(children: list) -> bool:
    """True if any direct child's serialized result type is decimal,
    looking through wrapper nodes that don't serialize a dataType."""
    for cnode, cch in children:
        dt = cnode.get("dataType")
        if dt is not None:
            if str(dt).startswith("decimal"):
                return True
        elif cch and _any_child_decimal(cch):
            return True
    return False


def _double_reaches(node: dict, children: list, taint: set) -> bool:
    """True if a COMPUTED double flows from this subtree into the
    enclosing decimal cast. Barriers: casts to decimal (they convert —
    and are linted on their own) and round()/bround() (explicit grid
    snap). Sources: double-typed leaves, attributes TAINTED by an
    upstream computed-double projection/aggregate (see
    ``unsafe_decimal_casts``), and casts to double — EXCEPT a
    cast-to-double of a bare untainted column/literal or of a
    double-free (integer/decimal) expression, which is the exact
    widening of raw or exact data (float32 embedding elements,
    integer counts, DECIMAL accumulators) and carries the same
    data-grid contract as a bare double column."""
    cls = _simple(node)
    dt = str(node.get("dataType", ""))
    if cls in _WRAPPERS and children:
        # wrappers report the wrapped value's dataType — judge the
        # value root itself so Alias(Round(x, 6)) stays a barrier
        return _double_reaches(children[0][0], children[0][1], taint)
    if cls == "Cast":
        if dt.startswith("decimal"):
            return False
        if dt == "double" and children:
            cnode, cch = children[0]
            if _simple(cnode) in ("AttributeReference", "Literal"):
                return _expr_id(cnode) in taint
            return _double_reaches(cnode, cch, taint)
    if cls in ("Round", "BRound"):
        return False
    if cls in ("Floor", "Ceil"):
        # floor/ceil of a double are UNAMBIGUOUS (no rounding mode —
        # both engines produce the identical integral value from the
        # identical double), and their result type is LONG/DECIMAL(_,0),
        # so a downstream decimal cast converts exact data. Same
        # barrier status as round()/bround()'s explicit grid snap.
        # CAVEAT (ADVICE r11): like Round/BRound, this barrier makes
        # the CAST exact, not the input deterministic — it assumes
        # the double being floored is itself cross-engine stable
        # (a correctly-rounded producer like sqrt over exact ints,
        # the t24 shape), NOT e.g. a reordered float sum sitting
        # near an integral boundary. Determinism of the producer is
        # the query author's burden; the lint only closes the
        # representation gap.
        return False
    if cls in ("AttributeReference", "Literal"):
        return dt == "double" or _expr_id(node) in taint
    if dt == "double" and cls not in _NONDOUBLE_ROOTS:
        # double-PRODUCING node whose result type IS serialized
        # (rare outside Cast/Attribute — kept for completeness)
        return True
    if cls in _ALWAYS_DOUBLE_CLASSES:
        # ADVICE r10: avg(int_col)/stddev/ln/... have no serialized
        # dataType, so cast(avg(int) as decimal) passed the lint it
        # was meant to catch. Class-based source rule instead.
        return True
    if cls in _DOUBLE_UNLESS_DECIMAL and not _any_child_decimal(
        children
    ):
        return True
    return any(_double_reaches(c[0], c[1], taint) for c in children)


def _scan_expr(
    node: dict, children: list, hits: list[str], taint: set
) -> None:
    cls = _simple(node)
    if (
        cls == "Cast"
        and str(node.get("dataType", "")).startswith("decimal")
        and children
    ):
        child_node, child_children = children[0]
        ccls = _simple(child_node)
        if ccls in ("AttributeReference", "Literal"):
            if _expr_id(child_node) in taint:
                hits.append(
                    f"cast(tainted {child_node.get('name', '?')} "
                    f"as {node['dataType']})"
                )
        elif _double_reaches(child_node, child_children, taint):
            hits.append(
                f"cast({ccls}(...) as {node['dataType']})"
            )
    for c in children:
        _scan_expr(c[0], c[1], hits, taint)


def _taint_aliases(tree: tuple, taint: set) -> None:
    """If ``tree`` is a named expression whose value is a computed
    double (or a pass-through of an already-tainted attribute), mark
    its exprId tainted."""
    node, children = tree
    if _simple(node) != "Alias" or not children:
        return
    alias_id = _expr_id(node)
    vnode, vchildren = children[0]
    # unwrap aggregate/window wrappers to find the value root
    eff, effc = vnode, vchildren
    while _simple(eff) in _WRAPPERS and effc:
        eff, effc = effc[0]
    ecls = _simple(eff)
    if ecls == "AttributeReference":
        if _expr_id(eff) in taint:
            taint.add(alias_id)
        return
    if ecls in ("Literal",) or ecls in _NONDOUBLE_ROOTS:
        return
    if _double_reaches(vnode, vchildren, taint):
        taint.add(alias_id)


def _walk_plan(node: dict, children: list, taint: set,
               hits: list[str]) -> None:
    """Post-order over the logical plan: child nodes' aliases taint
    first, so a parent's casts see the provenance of every attribute
    they reference."""
    for c in children:
        _walk_plan(c[0], c[1], taint, hits)
    for tree in _iter_expr_trees(
        {k: v for k, v in node.items() if k != "class"}
    ):
        _scan_expr(tree[0], tree[1], hits, taint)
        _taint_aliases(tree, taint)


def unsafe_decimal_casts(df) -> list[str]:
    """All computed-double->DECIMAL casts in ``df``'s analyzed plan,
    tracked ACROSS plan nodes: an attribute produced by a computed
    double expression in any prior projection, aggregate, or window
    is tainted by exprId, so ``select((v*f).alias('x'))`` followed by
    ``col('x').cast('decimal')`` — or the same through an ``agg`` —
    is flagged exactly like the single-expression form (ADVICE r9:
    the analyzed-plan-only lint exempted any cast whose direct child
    was an AttributeReference, letting the w9 antipattern re-enter in
    the codebase's common multi-stage style). Known limits: taint
    does not cross Union branch remapping or localCheckpoint
    boundaries (a checkpointed relation re-enters as raw leaf
    attributes — the same contract as raw data, which every
    checkpointed producer in this repo satisfies by rounding first).

    Empty list == the plan obeys the float-oracle discipline (for
    this failure class). Non-empty == every listed cast can hash
    differently across engines/hosts; rework the query to cast raw
    grid data / round() output only, or stay in exact integer or
    DECIMAL arithmetic end to end (the w9 fix pattern)."""
    plan_json = json.loads(
        df._jdf.queryExecution().analyzed().toJSON()
    )
    hits: list[str] = []
    taint: set = set()
    i = 0
    while i < len(plan_json):
        tree, i = _build(plan_json, i)
        _walk_plan(tree[0], tree[1], taint, hits)
    return hits
