"""Distributed graph operators: PageRank by unrolled relational steps.

PageRank is the canonical "iterative compute on a relational engine"
shape (alongside the connected-components dedup clustering in
operators/dedup.py and the k-means refinement in similarity.py): each
iteration is one equi-join (edge ⋈ rank on src) + one aggregation
(contributions by dst) + one left join back to the node set. Unrolling
a fixed iteration count into a single plan lets Catalyst pipeline the
iterations and keeps the whole computation declarative — no driver
loop over actions, no RDDs.

Determinism: float contribution sums are summation-order dependent at
the 1e-16 level, so each iteration's rank is rounded to 9 decimals —
absorbing partitioning noise while leaving the semantics intact (the
same discipline as the k-means oracle's round(avg, 6); ranks are
O(1/N) with per-sum error ~1e-15, far below the rounding grain).

Scale shape: ranks and degrees are O(|V|) frames hash-partitioned by
node id; contributions shuffle on dst — the same key every iteration,
so a real deployment co-partitions edges once and every join after
that is shuffle-free on the edge side. Dangling nodes (outdeg 0) are
not redistributed — callers ensure none exist (an undirected edge set
has none) or accept the rank leak, as documented.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMPING = 0.85
ROUND = 9


def pagerank(edges: DataFrame, iters: int = 3, damping: float = DAMPING) -> DataFrame:
    """Ranks after ``iters`` power iterations from the uniform vector.

    ``edges``: (src, dst) pairs, pre-deduplicated; every node must
    appear as a src (undirected graphs: include both directions).
    Returns (node, pr).

    The iteration invariant — edges joined with out-degrees — is
    repartitioned by ``src`` ONCE before the loop. Every iteration's
    join then sees the identical edge-side Exchange subtree, which
    Spark dedupes via ReusedExchange: the corpus-sized edge shuffle
    executes once instead of once per iteration. Interleaved A/B at
    sf0.1 (1.2M edges, 3 iterations): base 9.2-13.5 s with 0
    ReusedExchange, co-partitioned 6.0 s — pinned by
    tests/test_plans.py::test_pagerank_reuses_edge_exchange.

    Deliberately NOT persisted: the same A/B shows
    ``.repartition("src").persist()`` at 9.9-11.0 s — caching
    materializes the edges through the block manager and fences off
    whole-stage codegen, while ReusedExchange already gives the
    reuse for free from shuffle files.

    Deliberately NOT localCheckpoint'ed either (the r15-opt deferred
    re-A/B, now run): interleaved 3-round A/B at sf0.1, identical
    output values in all variants — this shape warm 7.4-7.5 s;
    eager localCheckpoint of the edge invariant 10.0-11.2 s;
    additionally checkpointing each iteration's rank frame
    10.9-12.2 s. Same mechanism as the persist loss: block-manager
    materialization + codegen fences cost more than the ~100 k-char
    unrolled plan saves at 3 iterations. The materialize-the-iteration-
    invariant rule only pays when reuse can't come from an exchange
    (operators/bpe.py's rewrite is the opposite call, decided by the
    same measurement discipline)."""
    nodes = edges.select(F.col("src").alias("node")).distinct()
    n_frame = F.broadcast(nodes.agg(F.count(F.lit(1)).alias("n")))
    outdeg = edges.groupBy("src").agg(
        F.count(F.lit(1)).cast("long").alias("outdeg")
    )
    edge_deg = edges.join(outdeg, "src").repartition("src")
    pr = nodes.crossJoin(n_frame).select(
        "node", "n", (F.lit(1.0) / F.col("n")).alias("pr")
    )
    for _ in range(iters):
        contrib = (
            edge_deg.join(pr, edge_deg.src == pr.node)
            .groupBy("dst")
            .agg(F.sum(F.col("pr") / F.col("outdeg")).alias("c"))
        )
        pr = (
            nodes.crossJoin(n_frame)
            .join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                "n",
                F.round(
                    F.lit(1.0 - damping) / F.col("n")
                    + F.lit(damping) * F.coalesce("c", F.lit(0.0)),
                    ROUND,
                ).alias("pr"),
            )
        )
    return pr.select("node", "pr")
