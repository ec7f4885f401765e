"""Distributed connected components — the clustering step of a dedup
pipeline (LSH/Jaccard candidate *pairs* → duplicate *clusters* → one
canonical document per cluster).

No reference counterpart (the reference stops at factorization); this
is the standard label-propagation formulation used at corpus scale:

  label(v) := min(label(v), min over neighbors' labels), iterate to
  fixpoint. Each round is one shuffle join (edges ⋈ labels) + one
  map-side-combinable min aggregation, lineage truncated per round via
  localCheckpoint — O(graph diameter) rounds. Dedup graphs are
  near-cliques of duplicates, so diameter (and round count) is tiny
  regardless of corpus size; for adversarial long-chain graphs the
  large-star/small-star variant (Kiveris et al., "Connected Components
  in MapReduce and Beyond") halves rounds to O(log d) — not needed for
  the dedup shape.

Convergence check is one tiny count per round (rows whose label
changed), not a collect of the labels.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    ``component`` is the minimum node id reachable from the node.

    Nodes absent from ``edges`` (singletons) are not emitted — callers
    left-join and coalesce to the node's own id.
    """
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).union(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    sym = sym.persist()
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
        .localCheckpoint(eager=True)
    )
    changed = 0
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["a"] == labels["node"])
            .groupBy(F.col("b").alias("node"))
            .agg(F.min("lbl").alias("_nlbl"))
        )
        new_labels = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(F.col("lbl"), F.coalesce("_nlbl", "lbl")).alias("lbl"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        # Truncated output is silently wrong (labels not at fixpoint);
        # surface it — graphs whose diameter exceeds the budget need a
        # larger max_iter or the large-star/small-star variant.
        warnings.warn(
            f"connected_components did not converge within max_iter={max_iter}; "
            "labels are NOT at fixpoint (components may be split). "
            "Raise max_iter for long-chain graphs.",
            RuntimeWarning,
            stacklevel=2,
        )
    sym.unpersist()
    return labels.select("node", F.col("lbl").alias("component"))
