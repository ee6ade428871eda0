"""Connected components over duplicate-pair edges.

Alternating large-star / small-star (Kiveris et al. 2014, "Connected
Components in MapReduce and Beyond") expressed as DataFrame groupBy+join
rounds — O(log n) rounds, each a hash-partitioned aggregation, no driver
state. Cluster id = min member id (deterministic; the reference's cluster
numbering is order-dependent, so parity tests compare *partitions*, not
labels — SURVEY.md §7).

Per-round lineage is truncated with localCheckpoint (required for iterative
plans; on a cluster use checkpoint() to a reliable store — see
plans/pipeline.py for the checkpointed variant with lineage counters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .filter(F.col("src") != F.col("dst"))
        .select(
            F.greatest("src", "dst").alias("u"), F.least("src", "dst").alias("v")
        )
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(N(u) ∪ {u})."""
    bidir = e.select(F.col("u").alias("n"), F.col("v").alias("m")).unionByName(
        e.select(F.col("v").alias("n"), F.col("u").alias("m"))
    )
    mins = bidir.groupBy("n").agg(F.min("m").alias("mn"))
    mins = mins.withColumn("mn", F.least("mn", F.col("n")))
    return (
        bidir.join(mins, "n")
        .filter(F.col("m") > F.col("n"))
        .select(F.col("m").alias("u"), F.col("mn").alias("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """For each u (neighbors all <= u after canon): connect u and its
    neighbors to the minimum of the neighborhood."""
    mins = e.groupBy("u").agg(F.min("v").alias("mn"))
    moved = (
        e.join(mins, "u")
        .filter(F.col("v") != F.col("mn"))
        .select(F.col("v").alias("u"), F.col("mn").alias("v"))
    )
    self_edges = mins.select("u", F.col("mn").alias("v"))
    return moved.unionByName(self_edges).filter(F.col("u") != F.col("v")).distinct()


def _signature(e: DataFrame) -> tuple[int, int]:
    # decimal(38,0) accumulator: exact and overflow-free under ANSI mode
    row = e.agg(
        F.count(F.lit(1)).alias("c"),
        F.coalesce(
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")), F.lit(0)
        ).alias("h"),
    ).collect()[0]
    return int(row["c"]), int(row["h"])


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    max_iter: int = 50,
) -> DataFrame:
    """edges(src, dst) [+ nodes(node)] -> assignments(node, component).

    component = min node id of the component. Nodes absent from any edge
    (singletons) are included iff ``nodes`` is given.
    """
    spark = edges.sparkSession
    e = _canon(edges).localCheckpoint()
    prev_sig = None
    for _ in range(max_iter):
        e = _small_star(_large_star(e)).localCheckpoint()
        sig = _signature(e)
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")

    # converged: every edge points a node at its component root
    assign = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = e.select(F.col("v").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    assign = assign.unionByName(roots).groupBy("node").agg(
        F.min("component").alias("component")
    )
    if nodes is not None:
        all_nodes = nodes.select(F.col("node").cast("long")).distinct()
        assign = (
            all_nodes.join(assign, "node", "left")
            .select("node", F.coalesce("component", "node").alias("component"))
        )
    return assign
