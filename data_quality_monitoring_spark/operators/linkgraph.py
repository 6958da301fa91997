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
* dangling mass (nodes with no outlinks) rides the SAME aggregation as the
  contributions: dangling nodes emit a NULL-dst sentinel row, the one-row
  ``sum`` over that group cross-joins back broadcast — no per-iteration
  driver action, and the contribution shuffle is reused between the two
  branches (ReusedExchange),
* ``localCheckpoint`` truncates the iterative lineage each round, so each
  iteration is exactly one Spark job.

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
    dst_type = e.schema["dst"].dataType
    # dangling nodes contribute their whole rank to a NULL-dst sentinel
    # group, so one aggregation yields both the per-node contributions and
    # the dangling mass
    e_aug = (
        e.join(outdeg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("od")).alias("w"))
        .unionAll(
            nodes.join(outdeg, nodes["node"] == outdeg["src"], "left_anti").select(
                F.col("node").alias("src"),
                F.lit(None).cast(dst_type).alias("dst"),
                F.lit(1.0).alias("w"),
            )
        )
        .persist()
    )
    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).localCheckpoint(eager=True)
    base = (1.0 - damping) / n
    try:
        for _ in range(n_iter):
            summed = e_aug.join(
                ranks.withColumnRenamed("node", "src"), "src"
            ).groupBy("dst").agg(F.sum(F.col("rank") * F.col("w")).alias("c"))
            dang_row = summed.agg(
                F.coalesce(
                    F.sum(F.when(F.col("dst").isNull(), F.col("c"))), F.lit(0.0)
                ).alias("dang")
            )
            ranks = (
                nodes.join(summed, nodes["node"] == summed["dst"], "left")
                .crossJoin(F.broadcast(dang_row))
                .select(
                    "node",
                    (
                        F.lit(base)
                        + F.lit(damping)
                        * (
                            F.coalesce(F.col("c"), F.lit(0.0))
                            + F.col("dang") / F.lit(float(n))
                        )
                    ).alias("rank"),
                )
                .localCheckpoint(eager=True)
            )
        return ranks
    finally:
        nodes.unpersist()
        outdeg.unpersist()
        e_aug.unpersist()
