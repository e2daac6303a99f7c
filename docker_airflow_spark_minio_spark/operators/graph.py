"""Iterative graph operators: connected components.

The dedup end-game: near-dup PAIRS (from MinHash/SimHash/cosine) must be
collapsed into CLUSTERS so one canonical document survives per group --
that is connected components over the pair graph, an operator Spark has
no built-in for (GraphFrames is an external package).

Implementation: min-label propagation with path halving.  Every node
starts as its own component; each round, every node takes the min
component id among itself, its neighbors, and its current label's own
label (pointer jumping) -- so chains collapse in O(log diameter)
rounds, not O(diameter).  Near-dup clusters are small and dense
(near-cliques), converging in 2-3 rounds; ``max_iter`` bounds the rest.

Scale notes (100 TB posture):
 * each round is one shuffle on the node id (join + groupBy share the
   key); edges are shuffled once per round -- the alternative
   large-star/small-star algorithm lowers round count on huge diameters
   at the cost of edge rewrites, unnecessary for dedup-shaped graphs
 * labels are persisted across rounds and the convergence check is a
   metadata-sized count, not a collect of the labels
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components of an undirected graph.

    ``edges``: one row per edge (direction irrelevant).  Returns
    ``(id, component)`` where ``component`` is the smallest node id in
    the component -- a deterministic canonical representative.

    Raises ``RuntimeError`` if labels are still changing after
    ``max_iter`` rounds: returning unconverged labels would silently
    split components, and wrong-but-plausible dedup clusters are worse
    than a loud failure.  With path halving, rounds grow with
    log(diameter), so max_iter=20 covers any graph of practical size;
    raise it rather than accepting a silent pass.

    The returned DataFrame is localCheckpoint-backed (materialized,
    lineage truncated); its blocks are freed when the DataFrame is
    garbage-collected.
    """
    # The edge list is reused EVERY round: without persisting it, each
    # iteration would re-execute the whole upstream plan that produced
    # the edges (for dedup, the entire MinHash pipeline -- measured 3x
    # the total runtime).
    bi = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionAll(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .persist()
    )
    nodes = bi.select(F.col("a").alias("id")).distinct()
    # localCheckpoint (not bare persist): each round's plan references
    # the previous labels several times (neighbors + path-halving
    # shortcut), so without lineage truncation the logical plan grows
    # exponentially with the round count and analysis time dominates.
    # Checkpointing materializes AND cuts the plan to the cached blocks.
    labels = nodes.select("id", F.col("id").alias("component")).localCheckpoint(
        eager=True
    )

    changed = -1
    null_old = F.lit(None).cast(labels.schema["component"].dataType)
    for _ in range(max_iter):
        msgs = bi.join(labels, bi["a"] == labels["id"]).select(
            F.col("b").alias("id"), "component", null_old.alias("old")
        )
        # Path halving: each node also adopts its current label's OWN
        # label (component pointers jump two hops per round), so chains
        # collapse in O(log diameter) rounds instead of O(diameter).
        # The extra join unions into the same aggregation -- still one
        # job per round, the fixed per-round cost is unchanged.
        shortcut = (
            labels.alias("x")
            .join(labels.alias("y"), F.col("x.component") == F.col("y.id"))
            .select(
                F.col("x.id").alias("id"),
                F.col("y.component").alias("component"),
                null_old.alias("old"),
            )
        )
        # The previous label rides along as `old` (exactly one non-null
        # per id, from the self branch), so convergence is read off the
        # SAME checkpointed result with a cached-block count -- no
        # separate join-the-old-labels job per round (halves the
        # per-round job count; the fixed per-job overhead dominates on
        # dedup-shaped graphs).
        new_labels = (
            labels.select("id", "component", F.col("component").alias("old"))
            .unionAll(msgs)
            .unionAll(shortcut)
            .groupBy("id")
            .agg(F.min("component").alias("component"), F.min("old").alias("old"))
            .localCheckpoint(eager=True)
        )
        changed = new_labels.where(F.col("component") != F.col("old")).count()
        labels = new_labels.select("id", "component")
        if changed == 0:
            break
    bi.unpersist()
    if changed != 0:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing); raise max_iter"
        )
    return labels


# PageRank in integer nano-units: double accumulation order differs
# between engines (and between Spark partitions run-to-run), so a float
# PageRank could never be oracle-checked exactly.  All arithmetic here is
# int64 -- contributions use integer division, the damping step is
# (850 * s) div 1000 -- so the ranks are bit-identical everywhere, and
# an ANSI-SQL oracle can replay the unrolled iterations.
PAGERANK_SCALE = 1_000_000_000  # initial rank per node, "nano-rank"
PAGERANK_DAMP_NUM = 850         # 0.85 damping as an integer ratio
PAGERANK_DAMP_DEN = 1000


def pagerank_int(
    edges: DataFrame,
    n_iter: int,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Deterministic damped PageRank over an undirected graph.

    Returns ``(id, rank)`` with ranks in integer nano-units
    (initial = PAGERANK_SCALE).  Update rule per iteration:

        rank' = (1-d)*SCALE + d * sum_{neighbors u} (rank_u div deg_u)

    with d = 850/1000 applied as integer multiply-then-div.  Nodes keep
    the base term even with no in-edges.

    Scale notes: the edge list (with the out-degree attached once) is
    persisted and reused every round; each iteration is ONE shuffle --
    a join on the source id followed by a groupBy on the destination
    (same key chain as connected_components).  Ranks are
    localCheckpoint-backed per round so the plan stays flat.
    """
    bi = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionAll(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    deg = bi.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    bi_deg = bi.join(deg, "a").persist()
    nodes = bi_deg.select(F.col("a").alias("id")).distinct()
    base = (PAGERANK_SCALE * (PAGERANK_DAMP_DEN - PAGERANK_DAMP_NUM)) // PAGERANK_DAMP_DEN
    ranks = nodes.select(
        "id", F.lit(PAGERANK_SCALE).cast("long").alias("rank")
    ).localCheckpoint(eager=True)
    for _ in range(n_iter):
        contrib = bi_deg.join(ranks, bi_deg["a"] == ranks["id"]).select(
            F.col("b").alias("id"),
            F.expr("rank div deg").alias("c"),
        )
        summed = contrib.groupBy("id").agg(F.sum("c").alias("s"))
        ranks = (
            nodes.join(summed, "id", "left")
            .select(
                "id",
                (
                    F.lit(base)
                    + F.expr(
                        f"(({PAGERANK_DAMP_NUM} * coalesce(s, 0L)) div "
                        f"{PAGERANK_DAMP_DEN})"
                    )
                ).cast("long").alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    bi_deg.unpersist()
    return ranks
