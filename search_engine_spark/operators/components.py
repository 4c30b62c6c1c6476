"""Connected components via iterative min-label propagation — the
consolidation step of near-duplicate pipelines (LSH candidate pairs →
duplicate clusters → canonical keeper per cluster).

GraphX-style: each round is one edge join + one min-aggregate, followed
by a POINTER-DOUBLING shortcut (label ← label(label)), so rounds are
bounded by log₂(diameter) rather than the diameter itself — a 10⁶-node
chain (the worst case for plain propagation, which would need 10⁶
rounds) converges in ~20.  Near-dup clusters are near-cliques, so 2-3
rounds in practice.  No driver-side graph materialization; the only
driver action per round is the convergence count.  localCheckpoint
truncates lineage every round — without it each iteration nests the
previous round's plan and plan construction itself OOMs (exponential
growth).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(pairs: DataFrame, a: str = "da", b: str = "db",
                         max_rounds: int = 50) -> DataFrame:
    """pairs(a, b) undirected → (doc_id, cluster) for every endpoint,
    cluster = smallest reachable id (deterministic canonical keeper)."""
    edges = (
        pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
        .unionByName(pairs.select(F.col(b).alias("src"), F.col(a).alias("dst")))
    ).localCheckpoint()
    labels = (
        edges.select(F.col("src").alias("doc_id")).distinct()
        .withColumn("cluster", F.col("doc_id"))
        .localCheckpoint()
    )
    changed = -1
    for _ in range(max_rounds):
        prop = (
            labels.join(edges, labels.doc_id == edges.src)
            .select(F.col("dst").alias("doc_id"), "cluster")
        )
        new_labels = (
            labels.unionByName(prop)
            .groupBy("doc_id")
            .agg(F.min("cluster").alias("cluster"))
        )
        # pointer doubling: every cluster value is itself a node id (the
        # min id seen so far), so jumping each label to ITS label halves
        # the remaining chain depth — the join key is the same doc_id the
        # next round's edge join needs, and label(v) ≤ v keeps the min
        # semantics (the hop can only lower a label)
        hop = new_labels.select(
            F.col("doc_id").alias("_l"), F.col("cluster").alias("_lc")
        )
        new_labels = (
            new_labels.join(hop, new_labels.cluster == hop._l)
            .select("doc_id", F.col("_lc").alias("cluster"))
            .localCheckpoint()
        )
        changed = (
            new_labels.join(labels.withColumnRenamed("cluster", "_old"),
                            "doc_id")
            .filter(F.col("cluster") < F.col("_old"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        # chain-shaped graphs can exceed max_rounds; silently returning the
        # partially-propagated labels would split real clusters
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds "
            f"({changed} labels still changing); raise max_rounds for "
            f"high-diameter candidate graphs"
        )
    return labels.select("doc_id", "cluster")
