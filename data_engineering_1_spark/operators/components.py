"""Connected components over an edge list — the clustering stage of a
near-dup pipeline: pairs -> clusters -> one survivor per cluster.

The reference stops at exact-hash dedup (no pair/cluster stage); this is
[north-star] scope: near-dup PAIRS (operators/dedup.py) only become a
deduplicated corpus once transitively-connected docs are grouped and one
representative is kept per group.

Spark-first design: iterative min-label propagation expressed as
DataFrame joins, with the loop on the driver.

- Each iteration is one equi-join (edges x labels on the edge endpoint)
  plus one groupBy-min — both shuffle on node id, so successive
  iterations reuse the same hash partitioning (AQE coalesces the tiny
  tails). No RDDs, no collect: the edge list never leaves the cluster.
- Convergence is detected with a single scalar aggregate: labels only
  ever DECREASE, so sum(label) is strictly monotone until the fixpoint
  and "sum unchanged" <=> "no label changed" — one cheap action per
  iteration instead of a join-and-compare.
- ``localCheckpoint(eager=True)`` truncates the logical plan each
  iteration; without it the plan doubles per round and analysis time
  dominates by iteration ~10. (On a real cluster with a checkpoint dir,
  ``checkpoint()`` to reliable storage is the durable equivalent; local
  checkpoint is the right call in local mode and keeps the operator
  self-contained.)
- Iterations needed = cluster diameter, and near-dup clusters are
  shallow (a dup cluster's diameter is rarely > 3-4 hops), so the loop
  terminates in a handful of rounds. For adversarial graphs (long
  chains) the alternating large-star/small-star formulation (Kiveris et
  al., "Connected Components in MapReduce and Beyond", SoCC'14)
  converges in O(log n) rounds at ~2x the per-round cost; plug it in
  here if diameters grow — the contract (node -> min id in component)
  is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_out: str = "node",
    comp_out: str = "component",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node in ``edges``; component = the
    smallest node id reachable from the node (deterministic labels,
    engine-portable: an oracle can reproduce them with a recursive CTE).

    Nodes with no edges don't appear — callers keep singletons by
    left-joining this result against the full id set.
    """
    # Persist the symmetric edge list: every iteration joins against it,
    # and without this the ENTIRE upstream pipeline that produced the
    # pairs (LSH + verify, typically the expensive part) re-executes per
    # round (measured 4x on the fixture pipeline). MEMORY_AND_DISK via
    # persist() — not localCheckpoint — so a 100 TB edge list spills
    # rather than OOMs, and lineage survives executor loss.
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .persist()
    )
    # Seed with iteration-1's result directly: comp0(u) = min(u, min(v)).
    # Materializing the node set needs a shuffle on u either way
    # (distinct); folding the first min-propagation into that same
    # shuffle saves one full join+groupBy round.
    labels = (
        sym.groupBy(F.col("u").alias("node"))
        .agg(F.least(F.first("u"), F.min("v")).alias("comp"))
        .localCheckpoint(eager=True)
    )
    prev_sum = None
    prev_ckpt = None
    for _ in range(max_iter):
        cur = labels.agg(
            F.sum(F.col("comp").cast("decimal(38,0)")).alias("s")
        ).first()["s"]
        if cur is None or cur == prev_sum:
            break
        prev_sum = cur
        nbr_min = sym.join(
            labels, sym["v"] == labels["node"]
        ).select(F.col("u").alias("node"), "comp")
        new_labels = (
            labels.union(nbr_min)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=True)
        )
        # The superseded checkpoint's blocks are dead once the new one is
        # materialized (nothing downstream can reference it) — free them,
        # or repeated calls leak executor storage run over run.
        if prev_ckpt is not None:
            prev_ckpt.unpersist()
        prev_ckpt = labels
        labels = new_labels
    sym.unpersist()  # labels is checkpointed; the edge cache is done
    if prev_ckpt is not None:
        prev_ckpt.unpersist()
    return labels.select(
        F.col("node").alias(node_out), F.col("comp").alias(comp_out)
    )
