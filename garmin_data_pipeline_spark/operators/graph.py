"""Connected components over a pair list — the group-resolution step
of a dedup pipeline (no reference counterpart; BASELINE.json
north-star addition).

Candidate generators (d2/d3/d4) emit duplicate PAIRS; choosing one
canonical document per duplicate CLUSTER requires the transitive
closure: connected components of the pair graph. Two pure-DataFrame
algorithms (no GraphFrames dependency), identical output:

- **min-label propagation with pointer jumping** (default): every
  node repeatedly adopts the smallest label among itself, its
  neighbors, and *its label's own label* (the pointer-jumping
  shortcut). The shortcut halves the remaining distance to the
  component minimum each round, so convergence is O(log diameter)
  rounds instead of O(diameter) — a 10k-node chain resolves in ~15
  rounds. Duplicate clusters are dense and shallow (diameter 2-4), so
  they converge in 2-3 rounds either way.
- **large-star / small-star** (``algorithm="star"``): the alternating
  edge-rewriting algorithm of Kiveris et al., "Connected Components in
  MapReduce and Beyond" (SoCC'14). Each round rewrites the edge list
  itself (large-star links every strictly-larger neighbor to the local
  minimum; small-star links the smaller-or-equal ones), converging in
  O(log n) rounds to a forest of stars centered at each component's
  minimum. Same per-round shape (shuffle join + hash aggregate), but
  state is the edge list rather than a label table — the right choice
  when the graph is adversarial (long chains, high-degree hubs) and
  edges outnumber nodes.

Scale notes: each round of either algorithm is one or two
shuffle-joins plus a hash aggregate — the classic Pregel-style shape.
Convergence is detected inside the SAME job that materializes the
round's state (a ``__changed`` flag summed for min-label; an edge
count + order-independent checksum for star), so a round costs ONE
Spark job, not a separate join-and-count. A capped non-converged run
raises instead of returning silently wrong groups. Node ids are
type-agnostic (strings — URLs, content hashes — work).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _symmetrize(edges: DataFrame, src: str, dst: str) -> DataFrame:
    return edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).union(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """Resolve an undirected pair list into components.

    Returns (node, component) for every node appearing in ``edges``,
    where ``component`` is the smallest node id in the node's
    connected component. Deterministic; raises ``RuntimeError`` if the
    fixpoint is not reached within ``max_iter`` rounds (~log2 of the
    graph diameter, thanks to the pointer-jumping shortcut) rather
    than returning partial labels.
    """
    # localCheckpoint (eager) per round: materializes the labels AND
    # truncates lineage — without it, round k's plan contains every
    # previous round's joins (exponential analysis cost), and a
    # persist would need a manual unpersist lifecycle. Blocks are
    # freed when the superseded DataFrame is garbage collected.
    # Materialize the symmetrized edge list ONCE: it is re-joined every
    # round, and without this the whole upstream pipeline that produced
    # the pairs (e.g. a shingle inverted-index self-join) re-executes
    # per round — the loop's cost would be rounds x candidate-generation
    # instead of rounds x |edges|. Hash-partitioned by the join key
    # BEFORE the checkpoint: localCheckpoint preserves partitioning, so
    # every round's neighbor join reuses this distribution and only the
    # (smaller) label table shuffles — the edge side, the largest
    # relation in the loop, shuffles exactly once for all rounds.
    sym = (
        _symmetrize(edges, src, dst).repartition("b").localCheckpoint()
    )

    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )

    for _ in range(max_iter):
        nbr_min = (
            sym.join(
                labels.select(
                    F.col("node").alias("b"),
                    F.col("label").alias("nbr_label"),
                ),
                "b",
            )
            .groupBy("a")
            .agg(F.min("nbr_label").alias("nbr_min"))
        )
        # Pointer-jumping shortcut: my new label may also come from my
        # label's OWN label (labels joined against themselves on
        # label = node). Each round the distance-to-minimum at least
        # halves, so chains converge in O(log diameter) rounds.
        jump = labels.select(
            F.col("node").alias("__jt"), F.col("label").alias("jump_label")
        )
        new_label = F.least(
            F.col("label"),
            F.coalesce(F.col("nbr_min"), F.col("label")),
            F.coalesce(F.col("jump_label"), F.col("label")),
        )
        # Lazy checkpoint: the convergence aggregate right below is the
        # materializing action, so each round costs ONE job. The
        # changed flag is computed IN the update projection (labels are
        # never NULL and only ever decrease), which replaces the old
        # separate join-against-previous-labels + count job.
        labels = (
            labels.join(nbr_min, labels["node"] == nbr_min["a"], "left")
            .join(jump, labels["label"] == F.col("__jt"), "left")
            .select(
                "node",
                new_label.alias("label"),
                (new_label != F.col("label")).cast("long").alias("__changed"),
            )
            .localCheckpoint(eager=False)
        )
        changed = labels.agg(F.sum("__changed")).first()[0]
        if not changed:
            return labels.select("node", F.col("label").alias("component"))

    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )


def _large_star(e: DataFrame) -> DataFrame:
    """One large-star round: for each node u, link every strictly
    larger neighbor to min(Γ(u) ∪ {u}). Connectivity-preserving
    (Kiveris et al., Lemma 1); strictly-larger targets guarantee no
    self-loops (m <= u < v)."""
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    mins = sym.groupBy("a").agg(
        F.least(F.min("b"), F.first("a")).alias("m")
    )
    return (
        sym.filter(F.col("b") > F.col("a"))
        .join(mins, "a")
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
        .dropDuplicates()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """One small-star round: orient every edge large->small, then for
    each node u link its smaller-or-equal neighborhood (and u itself)
    to min(Γ(u) ∪ {u})."""
    dd = (
        e.select(
            F.greatest("a", "b").alias("hi"), F.least("a", "b").alias("lo")
        )
        .filter(F.col("hi") != F.col("lo"))
        .dropDuplicates()
    )
    mins = dd.groupBy("hi").agg(F.min("lo").alias("m"))
    joined = dd.join(mins, "hi")
    return (
        joined.filter(F.col("lo") != F.col("m"))
        .select(F.col("lo").alias("a"), F.col("m").alias("b"))
        .union(joined.select(F.col("hi").alias("a"), F.col("m").alias("b")))
        .dropDuplicates()
    )


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """Large-star/small-star connected components (Kiveris et al.,
    SoCC'14): same (node, component) contract as
    :func:`connected_components`, O(log n) rounds on any graph shape.

    Convergence: the edge set is a fixpoint of both rewrites exactly
    when it is a forest of stars rooted at each component minimum.
    Stability is detected for BOTH half-rounds in ONE job per round: a
    tagged union of the two rewrites aggregated per half (edge count +
    order-independent xxhash64 checksum), which also materializes both
    lazy checkpoints. Per-round collision odds ~2^-64; a per-round
    exact check would cost an extra shuffle each round, so instead the
    FINAL edge set gets one exact fixpoint audit (both rewrites must
    reproduce it; symmetric difference empty) — the returned answer is
    therefore exact, not probabilistic (ADVICE r5 closed).
    Self-loop-only nodes (and any input self-loops) are preserved via
    a final left join against the distinct-node table, labeling them
    as their own singleton component, matching min-label behavior.
    """
    nodes = (
        _symmetrize(edges, src, dst)
        .select(F.col("a").alias("node"))
        .distinct()
        .localCheckpoint()
    )
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates()
        .localCheckpoint()
    )

    def _tagged(df: DataFrame, half: int) -> DataFrame:
        return df.select(F.lit(half).alias("__half"), "a", "b")

    prev = None
    converged = False
    for _ in range(max_iter):
        e1 = _large_star(e).localCheckpoint(eager=False)
        e2 = _small_star(e1).localCheckpoint(eager=False)
        # ONE job per round (halved from r5's one per half-round): a
        # tagged union of both rewrites aggregated per half. Computing
        # it materializes e1's lazy checkpoint once — shared by the
        # tag-1 branch and e2's lineage — then e2's. Per-half stats:
        # edge count + order-independent checksum, decimal(38,0) sum
        # so it is exact and overflow-free under ANSI mode (a plain
        # long sum of 2^63-scale hashes throws).
        stats = {
            r["__half"]: (r["n"], r["h"])
            for r in _tagged(e1, 1)
            .unionAll(_tagged(e2, 2))
            .groupBy("__half")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.xxhash64("a", "b").cast("decimal(38,0)")
                ).alias("h"),
            )
            .collect()
        }
        s1 = stats.get(1, (0, None))
        s2 = stats.get(2, (0, None))
        e = e2
        if prev is not None and s1 == prev and s2 == s1:
            converged = True
            break
        prev = s2
    if not converged:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} rounds"
        )

    # Exact fixpoint audit on the FINAL edge set only (ADVICE r5): the
    # per-round checksum tolerates a ~2^-64 collision; this closes it
    # for the answer actually returned, at the cost of ONE extra job
    # total (not per round). A converged star forest must be a strict
    # fixpoint of both rewrites — any symmetric-difference row means
    # the checksum converged on a lie.
    ls, ss = _large_star(e), _small_star(e)
    drift = (
        ls.exceptAll(e)
        .unionAll(e.exceptAll(ls))
        .unionAll(ss.exceptAll(e))
        .unionAll(e.exceptAll(ss))
    )
    if drift.limit(1).count() > 0:
        raise RuntimeError(
            "connected_components_star: checksum convergence did not "
            "survive the exact fixpoint audit (hash collision)"
        )

    # e is now (child, root) stars; roots appear only on the b side.
    labels = e.select(F.col("a").alias("node"), F.col("b").alias("component"))
    return (
        nodes.join(labels, "node", "left")
        .select(
            "node",
            F.coalesce(F.col("component"), F.col("node")).alias("component"),
        )
    )


def duplicate_groups(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    algorithm: str = "min_label",
) -> DataFrame:
    """Pair list -> (doc_id, group_id, group_size): each duplicate
    cluster labeled by its smallest member (the canonical choice the
    exact-dedup operator also makes), with the cluster size attached
    for keep/drop policies.

    ``algorithm``: ``"min_label"`` (default — label-table propagation,
    best when clusters are shallow, the dedup norm) or ``"star"``
    (large-star/small-star edge rewriting — best for adversarial
    shapes: long chains, hub-heavy graphs). Output is identical.
    """
    if algorithm == "min_label":
        comp = connected_components(pairs, id_a, id_b)
    elif algorithm == "star":
        comp = connected_components_star(pairs, id_a, id_b)
    else:
        raise ValueError(f"unknown algorithm: {algorithm!r}")
    # No broadcast hint: the sizes table is O(#components) — unbounded
    # at corpus scale. A plain equi-join lets AQE broadcast it only
    # when runtime stats say it actually fits.
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("group_size")
    )
    return comp.join(sizes, "component").select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("group_id"),
        "group_size",
    )


# ---------------------------------------------------------------------------
# PageRank (simplified: no dangling-mass redistribution — mass leaks
# from sink nodes, the standard simplification when ranks are used
# for ORDERING, e.g. picking canonical duplicates or ranking
# crawl-frontier URLs). Second iterative algorithm beside connected
# components; same Pregel-style per-round shape and the same
# lineage-truncation discipline.
# ---------------------------------------------------------------------------
def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iterations: int = 5,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list; returns
    (node, rank) for every node appearing as src or dst.

    rank_{k+1}(v) = (1-d)/N + d * sum_{u->v} rank_k(u) / outdeg(u)

    Scale shape: per round, ONE shuffle join (edge list x rank table
    on src) + ONE hash aggregate on dst with map-side partials. The
    edge list is hash-partitioned by ``src`` and localCheckpointed
    ONCE before the loop, so the big relation shuffles once for all
    rounds and only the (node-sized) rank table moves per round; rank
    tables are lazily checkpointed per round to truncate lineage.

    Determinism contract: per-edge contributions accumulate in
    DECIMAL(28,12) — an order-independent exact sum — so the result
    is bit-stable across partitionings AND mirror-able by an engine
    summing in any other order (the driver oracle unrolls the same
    ``iterations`` as chained CTEs; see plans/llm_queries.py g1).
    Fixed iteration count, not a convergence test: rank deltas are
    floats, and a float-threshold stop could converge after different
    rounds on different engines.
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .repartition("src")
        .localCheckpoint()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        # Empty edge input (e.g. every row dropped by NULL guards):
        # return an empty (node, rank) relation with the contract
        # schema instead of tripping ZeroDivisionError on 1/n below.
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    teleport = (1.0 - damping) / n
    for _ in range(iterations):
        contribs = (
            e.join(
                ranks.join(out_deg, ranks["node"] == out_deg["src"])
                .select(
                    F.col("node").alias("c_src"),
                    (F.col("rank") / F.col("outdeg")).alias("contrib"),
                ),
                F.col("src") == F.col("c_src"),
            )
            .groupBy("dst")
            .agg(
                F.sum(
                    F.col("contrib").cast("decimal(28,12)")
                ).cast("double").alias("inflow")
            )
        )
        ranks = (
            ranks.join(contribs, ranks["node"] == contribs["dst"], "left")
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks


# ---------------------------------------------------------------------------
# Triangle enumeration (cluster-density analysis over the near-dup
# pair graph: triangles = tightly-bound duplicate triples; the
# triangle count / local clustering coefficient is the standard
# graph-quality metric for candidate-pair generators).
# ---------------------------------------------------------------------------
def triangles(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Enumerate each triangle of the undirected graph exactly once,
    as a canonical id-sorted triple ``(v1, v2, v3)``.

    Algorithm (the MapReduce-classic degree orientation): orient every
    edge from its (degree, id)-smaller endpoint to the larger; each
    triangle then has exactly ONE vertex with two out-edges, so
    enumerating out-neighbor pairs (wedges) and closing them against
    the canonical edge set counts each triangle once. Orienting by
    DEGREE (not id) bounds any vertex's out-degree by O(sqrt(m)) —
    the wedge self-join is Sum(outdeg^2) work, so a celebrity hub
    with 10^6 neighbors generates ~m wedges instead of 10^12
    (Suri & Vassilvitskii, WWW'11 shape).

    Per-stage shapes: one hash aggregate for degrees, two broadcast-
    or-shuffle joins to attach them, a self-join on the apex, and one
    closing equi-join — all spill-safe relational ops, no driver
    state.
    """
    # Materialize the canonical edge set ONCE (eager, like the CC
    # loop's edge checkpoint). The plan references it four times
    # (degree attach x2, wedge self-join, closing join); exchange
    # reuse already avoids recomputing the upstream pair generator
    # within the job, but the checkpoint also skips the post-exchange
    # distinct on each reference and keeps the triangle plan
    # independent of how expensive the edge producer was (measured:
    # ~10% on the near-dup graph, structural insurance elsewhere).
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(
            F.col("a").isNotNull()
            & F.col("b").isNotNull()
            & (F.col("a") != F.col("b"))
        )
        .distinct()
        .localCheckpoint()
    )
    deg = (
        e.select(F.col("a").alias("n"))
        .union(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    withdeg = (
        e.join(deg.select(F.col("n").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("n").alias("b"), F.col("deg").alias("db")), "b")
    )
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = withdeg.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
    )
    x, y = oriented.alias("x"), oriented.alias("y")
    wedges = x.join(y, F.col("x.u") == F.col("y.u")).filter(
        F.col("x.v") < F.col("y.v")
    )
    closed = wedges.join(
        e,
        (F.least(F.col("x.v"), F.col("y.v")) == F.col("a"))
        & (F.greatest(F.col("x.v"), F.col("y.v")) == F.col("b")),
    )
    tri = closed.select(
        F.array_sort(
            F.array(F.col("x.u"), F.col("x.v"), F.col("y.v"))
        ).alias("t")
    )
    return tri.select(
        F.col("t")[0].alias("v1"),
        F.col("t")[1].alias("v2"),
        F.col("t")[2].alias("v3"),
    )
