"""Graph operators expressed as keyed DataFrame programs.

Connected components live in ``pipelines/dedup.connected_components``
(pointer-jumping, used by the dedup clusters); this module holds the
rank-propagation side.  Everything is deterministic: DECIMAL
contribution sums (shuffle-order-independent) and fixed iteration
counts, so a SQL oracle can unroll the same program.
"""

from __future__ import annotations

from collections.abc import Sequence  # noqa: F401  (kept for sig parity)

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_fixed(
    edges: DataFrame,
    nodes: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    iters: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration PageRank (power iteration unrolled ``iters``
    times from the uniform vector): ``pr' = (1-d)/N + d·Σ_in pr/outdeg``.
    Multi-edges contribute once each (weight = multiplicity via the
    edge list itself).  Callers must ensure every node has ≥1
    out-edge (no dangling-mass redistribution here — the caller's
    graph construction owns that contract).

    Scale shape per iteration: one src-keyed join (edge list × rank
    vector, co-partitioned on the node key at scale), one dst-keyed
    DECIMAL-sum aggregation, one left join back to the node list for
    zero-in-degree nodes.  Rank magnitudes are O(1/N); DECIMAL(38,18)
    sums keep the aggregation order-independent so the unrolled SQL
    oracle matches bit-for-bit after 6dp rounding of ``pr·N``.
    """
    n_nodes = nodes.count()  # bounded: one scalar, the only collect
    outdeg = edges.groupBy(src_col).agg(F.count(F.lit(1)).alias("_deg"))
    pr = nodes.select(
        F.col(node_col), F.lit(1.0 / n_nodes).alias("_pr")
    )
    base = (1.0 - damping) / n_nodes
    for _ in range(iters):
        contrib = (
            edges.join(pr, edges[src_col] == pr[node_col])
            .join(outdeg, src_col)
            .select(
                F.col(dst_col).alias("_to"),
                (F.col("_pr") / F.col("_deg")).alias("_c"),
            )
        )
        summed = contrib.groupBy("_to").agg(
            F.sum(F.col("_c").cast("decimal(38,18)")).cast("double").alias("_in")
        )
        pr = nodes.join(
            summed, nodes[node_col] == summed["_to"], "left"
        ).select(
            F.col(node_col),
            (base + damping * F.coalesce(F.col("_in"), F.lit(0.0))).alias("_pr"),
        )
    return pr.select(F.col(node_col), F.col("_pr").alias("pagerank"))


def bfs_hops(
    edges: DataFrame,
    sources: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    max_hops: int = 4,
) -> DataFrame:
    """Multi-source BFS: minimum hop distance from any source node,
    bounded at ``max_hops`` (nodes further away are absent from the
    output).  The bounded-frontier form of label propagation — the
    building block for k-hop neighborhoods, blast-radius queries, and
    graph-distance features at 100 TB.

    Each round expands ONLY the current frontier (nodes whose distance
    equals the round number minus one): one node-keyed join edge-list ×
    frontier plus one min-combine groupBy — two shuffles per round,
    both on the node key, so at scale both sides co-partition.  Rounds
    are fixed (``max_hops``), lineage is flattened per round with
    ``localCheckpoint`` (the iterative-DataFrame rule: an unflattened
    loop grows the plan exponentially).  Deterministic: min() combine,
    no RNG — a recursive-CTE SQL oracle walks the same fixpoint.
    """
    dist = sources.select(
        F.col(node_col), F.lit(0).alias("hops")
    ).distinct().localCheckpoint(eager=True)
    for h in range(1, max_hops + 1):
        frontier = dist.filter(F.col("hops") == h - 1).select(
            F.col(node_col).alias("_fnode")
        )
        reached = (
            edges.join(frontier, edges[src_col] == F.col("_fnode"))
            .select(F.col(dst_col).alias(node_col), F.lit(h).alias("hops"))
        )
        dist = (
            dist.unionByName(reached)
            .groupBy(node_col)
            .agg(F.min("hops").alias("hops"))
            .localCheckpoint(eager=True)
        )
    return dist
