"""Graph-analytics catalog entries (beyond-reference, SURVEY §2.14):
rank propagation over an event-derived interaction graph.  The dedup
side of the graph family (connected components) is exercised by d5/v9.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.graph import pagerank_fixed
from ..sources.tables import load_table
from .registry import r6 as _r6
from .registry import register


def _g1_iteration(i: int, prev: str) -> str:
    return f"""
c{i} AS (
  SELECT e.dst AS node,
         CAST(SUM(CAST(p.pr / d.deg AS DECIMAL(38,18))) AS DOUBLE) AS m
  FROM edges e
  JOIN {prev} p ON e.src = p.node
  JOIN deg d ON e.src = d.src
  GROUP BY e.dst
),
pr{i} AS (
  SELECT nodes.node,
         (1.0 - 0.85) / nn.n_nodes + 0.85 * COALESCE(c{i}.m, 0.0) AS pr
  FROM nodes CROSS JOIN nn
  LEFT JOIN c{i} ON nodes.node = c{i}.node
)"""


def _g1_oracle() -> str:
    its = ",".join(_g1_iteration(i, f"pr{i - 1}" if i > 1 else "pr0") for i in (1, 2, 3))
    return f"""
WITH u AS (SELECT MAX(user_id) + 1 AS n FROM events),
edges AS (
  SELECT user_id AS src,
         (user_id + 1 + event_id % 7) % (SELECT n FROM u) AS dst
  FROM events
),
nodes AS (SELECT DISTINCT user_id AS node FROM events),
nn AS (SELECT COUNT(*) AS n_nodes FROM nodes),
deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
pr0 AS (SELECT node, 1.0 / nn.n_nodes AS pr FROM nodes CROSS JOIN nn),
{its}
SELECT node AS user_id, ROUND(pr * nn.n_nodes, 6) AS pr_x_n
FROM pr3 CROSS JOIN nn
"""


@register("g1_pagerank", oracle=_g1_oracle(), tags=("graph",))
def g1_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration PageRank (3 unrolled power iterations, damping
    0.85) over the event-derived interaction graph — edge per event
    from its user to a deterministic neighbor
    ``(user_id + 1 + event_id % 7) mod N`` (user ids are contiguous at
    every SF, so every edge lands on an existing node and every node
    has out-degree ≥ 1: no dangling mass) —
    ``operators/graph.pagerank_fixed``.  The oracle unrolls the SAME
    three iterations in CTEs; DECIMAL contribution sums make each
    iteration shuffle-order-independent, so the two programs agree to
    the 6dp rounding of pr·N.  Scale shape per iteration: one
    node-keyed join + one DECIMAL-sum agg + one left join — the
    standard distributed power-iteration step (public technique;
    Page et al. 1999, Pregel-style propagation)."""
    ev = load_table(spark, sf_dir, "events")
    n_users = ev.agg(F.max("user_id")).first()[0] + 1  # bounded 1-row
    edges = ev.select(
        F.col("user_id").alias("src"),
        ((F.col("user_id") + 1 + F.col("event_id") % 7) % n_users).alias("dst"),
    )
    nodes = ev.select(F.col("user_id").alias("node")).distinct()
    pr = pagerank_fixed(edges, nodes, "src", "dst", "node", iters=3, damping=0.85)
    n_nodes = n_users  # contiguous ids: every node present
    return pr.select(
        F.col("node").alias("user_id"),
        _r6(F.col("pagerank") * n_nodes).alias("pr_x_n"),
    )
