"""Connected components over a pair/edge list — the step that turns
near-duplicate PAIRS into duplicate CLUSTERS (pick one canonical doc per
component, drop the rest).

Spark-first shape: iterative min-label propagation expressed as
DataFrame joins, with a pointer-jumping step per round so convergence is
O(log n) rounds for chains, O(diameter) worst case. Each round cuts
lineage via the shared ``persist.materialize`` (iterative=True — the
cluster mode is a reliable checkpoint). Near-dup graphs are overwhelmingly tiny star/clique
components, so rounds ≈ 2-3 in practice at any corpus size; every round
is two shuffles on node id (AQE-coalesced), never a driver-side
collect of the graph.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from chillastic_spark.persist import materialize, release


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iters: int = 25,
) -> DataFrame:
    """(node, component) for every node in ``edges`` (undirected);
    ``component`` is the smallest node id in the node's component.

    Raises if not converged within ``max_iters`` rounds (a round =
    neighbor-min propagation + one pointer jump).
    """
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).union(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    sym = materialize(sym.distinct(), iterative=True)
    labels = (
        sym.select(F.col("a").alias("node")).distinct().withColumn("comp", F.col("node"))
    )
    prev_pinned = None
    for _ in range(max_iters):
        nbr_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy("a")
            .agg(F.min("comp").alias("_nbr"))
        )
        prop = (
            labels.join(nbr_min, labels["node"] == nbr_min["a"], "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce(F.col("_nbr"), F.col("comp"))).alias(
                    "comp"
                ),
                F.col("comp").alias("_old"),
            )
        )
        # pointer jump: comp ← label(comp)
        ptr = prop.select(F.col("node").alias("_pn"), F.col("comp").alias("_pc"))
        jumped = (
            prop.join(ptr, prop["comp"] == ptr["_pn"], "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce(F.col("_pc"), F.col("comp"))).alias(
                    "comp"
                ),
                "_old",
            )
        )
        jumped = materialize(jumped, iterative=True)
        changed = jumped.filter(F.col("comp") != F.col("_old")).limit(1).count()
        # release the PREVIOUS round's pin now that this round is fully
        # computed — unreleased, a k-round convergence holds k
        # graph-sized checkpoints live until scope exit
        if prev_pinned is not None:
            release(prev_pinned)
        prev_pinned = jumped
        labels = jumped.select("node", "comp")
        if changed == 0:
            return labels.select("node", F.col("comp").alias("component"))
    raise RuntimeError(f"connected_components did not converge in {max_iters} rounds")


def duplicate_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Cluster assignment from a near-dup pair list: (doc_id,
    cluster_id, is_canonical). Canonical = the smallest doc id of the
    cluster — the row a curation pipeline keeps."""
    comps = connected_components(pairs, src=id_a, dst=id_b)
    return comps.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        (F.col("node") == F.col("component")).alias("is_canonical"),
    )
