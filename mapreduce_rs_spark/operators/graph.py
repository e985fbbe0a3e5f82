"""Iterative graph algorithms over candidate-pair edges.

The one operator family where a driver-side loop is the RIGHT Spark
shape: iterative label propagation (Pregel-style) runs a bounded number
of DataFrame jobs, each fully distributed — the driver holds only the
convergence counter, never data. This is the missing piece between
pair GENERATION (MinHash-LSH / SimHash banding, operators/dedup.py) and
actual DEDUP DECISIONS: near-duplicate pairs form clusters (A~B, B~C ⇒
{A,B,C} even when A,C never co-banded), and the canonical-document
choice must be made per CLUSTER, not per pair.

Reference parity note: the reference has no iterative operators at all
(single map→reduce pass, ``src/mr/coordinator.rs:342-345``); this is
blueprint surface for the LLM-pipeline north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreduce_rs_spark.operators.dedup import minhash_lsh_pairs


def connected_components(edges: DataFrame, max_iter: int = 20) -> DataFrame:
    """Connected components by min-label propagation.

    ``edges`` has columns (doc_a, doc_b). Each node starts labeled with
    its own id; every iteration each node takes the min of its label
    and its neighbors' labels; convergence when no label changes. The
    component id is therefore the MIN node id in the component —
    deterministic, oracle-reproducible (the oracle computes the same
    fixpoint as a recursive-CTE transitive closure).

    Scale shape: each iteration is one join + one aggregate, both on
    the edge list — O(E) shuffle per round, O(diameter) rounds.
    Near-dup clusters have tiny diameters (dense clique-ish blocks), so
    this converges in a handful of rounds; ``localCheckpoint`` per
    round truncates the otherwise-exponentially-growing lineage, which
    is what makes iterative DataFrame loops viable at all. (GraphX /
    GraphFrames uses the same alternating large-star/small-star trick
    for worst-case graphs; min-propagation is the right tool for
    bounded-diameter dedup clusters.)

    Returns (doc_id, component) for every node that appears in an edge.
    """
    converged = False
    nodes = (
        edges.select(F.col("doc_a").alias("doc_id"))
        .union(edges.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    # Undirected adjacency, both directions.
    nbrs = (
        edges.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(edges.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .localCheckpoint()
    )
    labels = nodes.select("doc_id", F.col("doc_id").alias("component")).localCheckpoint()
    for _ in range(max_iter):
        nbr_min = (
            nbrs.join(labels, nbrs.dst == labels.doc_id)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(nbr_min, labels.doc_id == nbr_min.src, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .where(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        # Silent wrong answers are worse than loud failures: unconverged
        # labels under-merge clusters. Raise rather than return them —
        # callers with genuinely long-diameter graphs raise max_iter (or
        # switch to large-star/small-star, which converges in O(log n)).
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations; "
            "increase max_iter for long-chain graphs"
        )
    return labels


def dedup_components(df: DataFrame) -> DataFrame:
    """Near-duplicate CLUSTERS from MinHash-LSH candidate pairs:
    transitive closure over the pair graph, then per-doc component
    assignment (component id = min doc_id in the cluster — the doc an
    exact-dedup pass would keep). Only documents that have at least one
    near-duplicate appear; singletons are implicitly their own
    component. The end-to-end shape of a production near-dup pass:
    sign → band → pair → cluster → keep-min."""
    edges = minhash_lsh_pairs(df).select("doc_a", "doc_b")
    return connected_components(edges)
