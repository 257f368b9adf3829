"""Iterative min-label propagation — connected components for dedup graphs.

The final stage of a near-dup pipeline groups documents into duplicate
clusters: nodes are documents, edges are verified near-dup pairs, and each
document should map to the minimum doc_id of its connected component.
One-hop assignment (plans.pipeline.dedup_canonical_assign) is exact only
for diameter <= 2 clusters; this operator iterates to the fixpoint — the
standard Pregel-style min-label propagation (rounds = graph diameter,
2-3 in practice for dedup graphs).

Scale shape per round: one shuffle (edges join labels + groupBy min), all
algebraic (partial aggregation). Lineage is truncated per round with
``localCheckpoint`` — without it the iterated join plan grows linearly and
re-optimizes from scratch each round. Convergence detection is a scalar
``sum(label)``: labels only ever decrease, so an unchanged sum IS the
fixpoint — one cheap action per round instead of a change-count join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def min_label_propagation(
    nodes: DataFrame,
    edges: DataFrame,
    max_rounds: int = 25,
) -> DataFrame:
    """Connected-component labels by iterative neighbor-min folding.

    Parameters
    ----------
    nodes: one column ``id`` (distinct).
    edges: columns ``src``, ``dst`` — DIRECTED; pass both directions for an
        undirected graph.
    max_rounds: upper bound on rounds; must exceed the graph diameter.
        Raises ``RuntimeError`` if the fixpoint is not reached — silently
        returning partially-propagated labels would hand callers WRONG
        component ids.

    Returns ``DataFrame[id, label]`` with ``label`` = min id reachable.
    """
    # the convergence probe sums labels in DECIMAL(38,0): BIGINT sum would
    # overflow LONG at ~10^9 nodes with large ids (ANSI mode raises mid-job)
    probe = F.sum(F.col("label").cast("decimal(38,0)"))
    # materialize the edge list ONCE: edges is typically the output of the
    # whole dedup funnel (shingle -> LSH -> verify), and without this every
    # round's join would re-execute that funnel from the parquet scan up —
    # measured 6.7x wall at the 10x rehearsal before this cut
    edges = edges.localCheckpoint(eager=True)
    labels = nodes.select("id", F.col("id").alias("label")).localCheckpoint(eager=True)
    prev_sum = labels.agg(probe).collect()[0][0]
    for _ in range(max_rounds):
        nbr_min = (
            edges.join(labels, edges["src"] == labels["id"])
            .groupBy(edges["dst"].alias("id"))
            .agg(F.min("label").alias("nbr_label"))
        )
        # least() ignores the NULL nbr_label of isolated nodes
        labels = (
            labels.join(nbr_min, "id", "left")
            .select("id", F.least("label", "nbr_label").alias("label"))
            .localCheckpoint(eager=True)
        )
        new_sum = labels.agg(probe).collect()[0][0]
        if new_sum == prev_sum:
            return labels
        prev_sum = new_sum
    raise RuntimeError(
        f"min_label_propagation did not converge in {max_rounds} rounds; "
        "the component diameter exceeds max_rounds — raise it (labels at "
        "this point would be incorrect for the deepest chains)"
    )
