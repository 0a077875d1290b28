"""Distributed connected components over a pair graph.

`dedup.dedup_survivors` applies the standard single-hop keep-smallest rule;
full dup-cluster resolution needs the transitive closure: every document
labeled with the minimum id of its connected component.  This is the
label-propagation (hash-min) algorithm — the shape GraphX/GraphFrames use —
expressed purely in DataFrame ops so it inherits shuffle partitioning, AQE
and spill behavior like every other operator here.

Scale notes:
  * one iteration = one equi-join (messages) + one min-aggregate — both hash
    shuffles on the vertex id; labels monotonically decrease, so convergence
    is detected by a SCALAR checksum (exact decimal sum of labels) instead of
    a changed-rows join — one extra reduce per iteration, no extra shuffle;
  * iteration count is bounded by the component diameter.  Near-dup graphs
    are unions of near-cliques (diameter 2-3); for long-chain graphs switch
    to the large-star/small-star contraction variant, which converges in
    O(log n) rounds at higher per-round cost;
  * each iteration persists its labels and unpersists the previous one, so
    lineage (and the DAG Catalyst must re-optimize) stays one round deep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """-> (id, component) for every vertex appearing in ``edges``; component
    = the minimum vertex id reachable through the undirected pair graph.

    Raises RuntimeError if the propagation has not converged after
    ``max_iter`` rounds (diameter > max_iter — switch to star contraction).
    """
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("lbl", F.col("id"))
        .persist()
    )
    # exact, overflow-proof checksum: labels only ever decrease, so the sum
    # strictly decreases every round until the fixpoint
    prev_sum = labels.agg(F.sum(F.col("lbl").cast("decimal(38,0)"))).first()[0]
    for _ in range(max_iter):
        msgs = sym.join(labels, sym["a"] == labels["id"]).select(
            F.col("b").alias("id"), F.col("lbl")
        )
        new_labels = (
            labels.select("id", "lbl")
            .unionByName(msgs)
            .groupBy("id")
            .agg(F.min("lbl").alias("lbl"))
            .persist()
        )
        cur_sum = new_labels.agg(F.sum(F.col("lbl").cast("decimal(38,0)"))).first()[0]
        labels.unpersist()
        labels = new_labels
        if cur_sum == prev_sum:
            return labels.select("id", F.col("lbl").alias("component"))
        prev_sum = cur_sum
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(component diameter exceeds max_iter; use star contraction)"
    )
