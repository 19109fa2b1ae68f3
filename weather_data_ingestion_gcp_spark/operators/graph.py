"""Connected components for dedup-cluster resolution.

Near-dup detection (MinHash/SimHash/Jaccard — operators.dedup) emits PAIRS;
a curation pipeline needs CLUSTERS: every document labeled with a canonical
representative so one keep-decision covers the whole duplicate group. Pairs
are edges; the cluster label is the minimum doc id reachable through them.

Algorithm: iterative min-label propagation (each node adopts the smallest
label among itself and its neighbors) until a fixpoint. Convergence takes
O(graph diameter) rounds; dedup graphs are overwhelmingly tiny cliques plus
the occasional chain, so in practice <10 rounds. Each round is one shuffle
join on the edge list (both relations hash-partitioned on the join key —
at cluster scale the edge relation's partitioning is reused every round).
For adversarial long-chain graphs at 100 TB, the alternating large-star /
small-star algorithm (Kiveris et al., "Connected Components in MapReduce
and Beyond", SoCC'14) halves chain lengths per round (O(log n) rounds);
label propagation is the right default for dedup-shaped graphs because its
per-round cost is strictly lower and diameters are small.

The driver-side loop is control flow only — no data ever hits the driver
except the single `changed` count per round (an aggregate, not a collect of
rows). Each round's labels are persisted and the previous round's are
unpersisted, so the lineage chain never grows unboundedly (a truncation
concern for any iterative Spark algorithm).

Reference parity: the reference engine has no graph step (its dedup is
day-partition overwrite, sp_raw_to_transformed_update_weather_data_query
.sql:2-5); this is part of the training-data-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node with the minimum node id of its component.

    ``nodes``: one row per node (isolated nodes keep their own id as label).
    ``edges``: undirected pairs; direction/duplication is normalized here.
    Returns (id_col, component) — component = min reachable id.
    """
    sym = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .union(edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = nodes.select(F.col(id_col).alias("node"), F.col(id_col).alias("label"))
    labels = labels.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        for _ in range(max_iter):
            nbr_min = (
                sym.join(labels, sym.dst == labels.node)
                .groupBy("src")
                .agg(F.min("label").alias("nbr_label"))
            )
            new_labels = (
                labels.join(nbr_min, labels.node == nbr_min.src, "left")
                .select(
                    "node",
                    F.least(
                        F.col("label"), F.coalesce("nbr_label", F.col("label"))
                    ).alias("label"),
                    (F.col("nbr_label") < F.col("label")).alias("_changed"),
                )
            )
            new_labels = new_labels.persist(StorageLevel.MEMORY_AND_DISK)
            changed = new_labels.filter(F.col("_changed")).count()  # one scalar
            old = labels
            labels = new_labels.drop("_changed")
            old.unpersist()
            if changed == 0:
                break
        return labels.select(F.col("node").alias(id_col), F.col("label").alias("component"))
    finally:
        sym.unpersist()


def dedup_cluster_stats(components: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Cluster summary: representative (the component min id), member count.
    Single map-side-combining aggregate on the component label."""
    return components.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min(id_col).alias("keep_id"),
    )
