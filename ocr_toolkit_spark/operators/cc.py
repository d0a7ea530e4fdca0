"""Distributed connected components over near-duplicate pair graphs.

The dedup operators (MinHash/SimHash/embedding) emit verified PAIRS; an
actual dedup decision needs the duplicate CLUSTER: connected components
over the pair graph, keep one representative per component. This is the
iterative-algorithm leg of the engine (no reference analog — the reference
dedups nothing).

Algorithm: hash-min label propagation. Every node starts labeled with its
own id; each round a node takes the min of its label and its neighbors'
labels; stop when no label changes. Rounds = graph diameter. That is the
right choice for THIS workload: near-dup components are overwhelmingly
small cliques, and oversized boilerplate buckets arrive STAR-SHAPED from
operators/skew.py (diameter ≤ 2), so propagation converges in 2–3 rounds
regardless of corpus size. (For general graphs with long chains use
large-star/small-star for O(log n) rounds — deliberately not needed here.)

Scale shape per round: one shuffle join (edges ⋈ labels on dst) + one hash
agg (min per src) + one join back — all on node-id keys. `localCheckpoint`
every round truncates the growing lineage so round N's plan does not
re-execute rounds 1..N-1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) for every node appearing in `pairs`; component =
    min node id of the connected component. Converges early when a round
    changes nothing; raises if max_iter rounds were not enough."""
    e = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    edges = edges.localCheckpoint(eager=True)

    labels = (
        edges.select(F.col("src").alias("node")).distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr_min, labels.node == nbr_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", "label")
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select(
                F.col("node"), F.col("label").alias("component")
            )
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "graph diameter exceeds max_iter (raise it, or pre-star the input)"
    )


def near_dedup_keep_first(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Dedup decision from verified near-dup pairs: every doc in a
    component except its min-id representative is dropped."""
    cc = connected_components(pairs)
    losers = cc.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")
