"""Connected components over a pair list — the group-resolution step
of a dedup pipeline (no reference counterpart; BASELINE.json
north-star addition).

Candidate generators (d2/d3/d4) emit duplicate PAIRS; choosing one
canonical document per duplicate CLUSTER requires the transitive
closure: connected components of the pair graph. Implemented as
iterative min-label propagation in pure DataFrame ops (no GraphFrames
dependency): every node repeatedly adopts the smallest label among
itself and its neighbors, converging to the component's minimum node
id.

Scale notes: each round is one shuffle-join of the (symmetrized) edge
list against the current labels plus a hash aggregate — the classic
Pregel-style shape. Rounds needed = graph diameter; duplicate
clusters are dense and shallow (diameter 2-4 in practice), so a
handful of rounds suffices at any corpus size. For adversarial
long-chain graphs, the documented upgrade path is the large-star/
small-star algorithm (alternating pointer-doubling, O(log n) rounds,
same per-round shape) — not needed for dedup workloads. Convergence
is detected with a changed-label count per round (type-agnostic: ids
may be strings — URLs, content hashes); a capped non-converged run
raises instead of returning silently wrong groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
    fixpoint is not reached within ``max_iter`` rounds (diameter
    bound) rather than returning partial labels.
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
    # instead of rounds x |edges|.
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(
            edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
        )
        .localCheckpoint()
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
        prev = labels
        # Lazy checkpoint: the convergence count right below is the
        # materializing action, so each round costs ONE job, not two.
        labels = (
            labels.join(
                nbr_min, labels["node"] == nbr_min["a"], "left"
            )
            .select(
                "node",
                F.least(
                    F.col("label"),
                    F.coalesce(F.col("nbr_min"), F.col("label")),
                ).alias("label"),
            )
            .localCheckpoint(eager=False)
        )
        # Type-agnostic convergence: count nodes whose label changed
        # this round (ids may be strings — URLs, content hashes — so
        # no numeric summary of the label column is assumed). Labels
        # are never NULL (they start as the node id and move through
        # NULL-skipping min), so != is a safe comparison.
        changed = (
            labels.join(
                prev.select(
                    "node", F.col("label").alias("__prev_label")
                ),
                "node",
            )
            .filter(F.col("label") != F.col("__prev_label"))
            .count()
        )
        if changed == 0:
            return labels.select(
                "node", F.col("label").alias("component")
            )

    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )


def duplicate_groups(
    pairs: DataFrame, id_a: str = "doc_a", id_b: str = "doc_b"
) -> DataFrame:
    """Pair list -> (doc_id, group_id, group_size): each duplicate
    cluster labeled by its smallest member (the canonical choice the
    exact-dedup operator also makes), with the cluster size attached
    for keep/drop policies."""
    comp = connected_components(pairs, id_a, id_b)
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
