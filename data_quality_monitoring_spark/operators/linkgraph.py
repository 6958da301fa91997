"""Host-level link-graph reputation (fixed-iteration PageRank).

Crawl pipelines rank hosts before they rank text: harvest priority,
crawl-budget allocation, and spam demotion all key off a link-graph
centrality score (Common Crawl publishes exactly this as its host-level
web graph ranks).  The reference has no graph operator at all; this is a
beyond-reference training-pipeline component (SURVEY.md §6) and the second
iterative-algorithm showcase next to
``operators.dedup.connected_components``.

Spark-first shape, per iteration:

* ``contribs``: edges ⋈ ranks on ``src`` (shuffle on src), ``rank/outdeg``
  summed per ``dst`` (map-side combined shuffle on dst) — both keyed on the
  high-cardinality host id, so they scale exactly like the dedup joins,
* dangling mass (nodes with no outlinks) is ONE scalar aggregate per
  iteration — a bounded driver-side reduce like connected_components'
  convergence ``count()``, not a per-row collect,
* ``localCheckpoint`` truncates the iterative lineage each round.

Fixed ``n_iter`` (default 5) keeps the operator deterministic and lets a
second engine replay it as unrolled relational algebra (the contract
oracle); a production run at 10^8 hosts would instead iterate to an L1
tolerance — the loop body is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """(node, rank) after ``n_iter`` synchronous PageRank steps over the
    distinct edge list, with uniform teleport and dangling-mass
    redistribution.  Ranks sum to 1 at every step."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    outdeg = e.groupBy("src").agg(F.count("*").cast("double").alias("od")).persist()
    e_w = (
        e.join(outdeg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("od")).alias("w"))
        .persist()
    )
    dangling_nodes = nodes.join(
        outdeg, nodes["node"] == outdeg["src"], "left_anti"
    ).persist()
    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).localCheckpoint(eager=True)
    base = (1.0 - damping) / n
    try:
        for _ in range(n_iter):
            dang = (
                dangling_nodes.join(ranks, "node")
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
                .first()[0]
            )
            summed = (
                e_w.join(ranks.withColumnRenamed("node", "src"), "src")
                .groupBy(F.col("dst").alias("node"))
                .agg(F.sum(F.col("rank") * F.col("w")).alias("c"))
            )
            ranks = (
                nodes.join(summed, "node", "left")
                .select(
                    "node",
                    (
                        F.lit(base)
                        + F.lit(damping)
                        * (F.coalesce(F.col("c"), F.lit(0.0)) + F.lit(dang / n))
                    ).alias("rank"),
                )
                .localCheckpoint(eager=True)
            )
        return ranks
    finally:
        for df in (nodes, outdeg, e_w, dangling_nodes):
            df.unpersist()
