"""Connected components over near-dup candidate pairs — the clustering
step that turns pairwise dedup verdicts (SURVEY.md §2.11) into "keep one
document per duplicate cluster".

Iterative min-label propagation on DataFrames:

    label(n) ← min(label(n), min over neighbors label(nb))

repeated to fixpoint. Each round is one join + one groupBy (both
shuffles keyed by node id — uniform, no skew beyond the graph's own
degree skew), and ``localCheckpoint`` truncates the lineage so round
N's plan doesn't embed rounds 1..N-1 (without it the plan doubles per
iteration and the optimizer chokes by round ~15). Diameter bounds the
round count: near-dup clusters are short chains, so convergence is
typically ≤ 5 rounds; the cap is a safety rail.

This is the canonical Spark shape for iterative graph algorithms when
GraphFrames isn't available — same structure as Pregel-style label
propagation, one superstep per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(nodes: DataFrame, edges: DataFrame,
                         node_col: str = "id",
                         src: str = "a", dst: str = "b",
                         max_rounds: int = 25) -> DataFrame:
    """(node, component) where component = min node id reachable.
    ``nodes``: one column ``node_col`` (isolated nodes allowed — they
    become singleton components). ``edges``: undirected pairs."""
    # Checkpoint the edge relation ONCE: upstream it is the whole LSH
    # candidate pipeline (shingle → minhash → bucket join) — without this
    # every propagation round re-executes it inside the join.
    both = (
        edges.select(F.col(src).alias("n"), F.col(dst).alias("m"))
        .unionByName(edges.select(F.col(dst).alias("n"), F.col(src).alias("m")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # Propagate over the EDGE SUBGRAPH only (round 12): a node with no
    # edges can never change its label, so seeding the iteration with
    # the whole corpus made every round's join, groupBy and checkpoint
    # carry corpus-sized dead weight. Labels iterate over the distinct
    # edge endpoints (the oracle's `walk` CTE walks exactly this set);
    # isolated nodes rejoin as singletons in the final projection.
    # (the aliases mint fresh attribute ids — localCheckpoint preserves
    # exprIds, so a plain `both.select("n")` seed would make the round's
    # both⋈labels join an ambiguous self-join)
    labels = (
        both.select(F.col("n").alias("__seed"))
        .distinct()
        .select(F.col("__seed").alias("n"), F.col("__seed").alias("label"))
        .localCheckpoint(eager=True)
    )

    # Convergence witness: the count of rows whose label shrank this
    # round — works for ANY orderable label type (a Σlabel witness would
    # be NULL for string ids and falsely converge on round 1). The
    # changed flag rides the checkpointed frame, so the count is a cheap
    # scan of materialized partitions, not a plan re-execution.
    converged = False
    for _ in range(max_rounds):
        neighbor_min = (
            both.join(labels, both["m"] == labels["n"], "inner")
            .select(both["n"].alias("n"), F.col("label"))
            .groupBy("n")
            .agg(F.min("label").alias("nb_label"))
        )
        stepped = (
            labels.join(neighbor_min, "n", "left")
            .select(
                "n",
                F.least(
                    F.col("label"), F.coalesce(F.col("nb_label"), F.col("label"))
                ).alias("label"),
                (F.col("nb_label") < F.col("label")).alias("__changed"),
            )
            .localCheckpoint(eager=True)
        )
        n_changed = stepped.filter(F.col("__changed")).count()
        labels = stepped.drop("__changed")
        if n_changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge within {max_rounds} "
            "rounds — raise max_rounds (component diameter exceeds it); "
            "returning partial labels would silently split clusters"
        )
    # Isolated nodes (no candidate pair) are singleton components
    # labeled by themselves — the left join + coalesce mirrors the
    # oracle's `documents LEFT JOIN comp` tail exactly.
    comp = labels.select(F.col("n").alias("__cc_n"),
                         F.col("label").alias("__cc_label"))
    return (
        nodes.select(F.col(node_col).alias("n"))
        .join(comp, F.col("n") == F.col("__cc_n"), "left")
        .select(
            F.col("n").alias(node_col),
            F.coalesce(F.col("__cc_label"), F.col("n")).alias("component"),
        )
    )
