"""Connected components over an edge list — the clustering stage of a
near-dup pipeline: pairs -> clusters -> one survivor per cluster.

The reference stops at exact-hash dedup (no pair/cluster stage); this is
[north-star] scope: near-dup PAIRS (operators/dedup.py) only become a
deduplicated corpus once transitively-connected docs are grouped and one
representative is kept per group.

Spark-first design: iterative min-label propagation expressed as
DataFrame joins, with the loop on the driver.

- The symmetric edge list is built in ONE pass over the input
  (explode of a 2-struct array, not a self-union): the upstream pipeline
  that produced the pairs (LSH + Jaccard verify, typically the expensive
  part) executes once, not once per union branch.
- Each iteration is one equi-join (edges x labels on the edge endpoint)
  plus one groupBy-min. The cached edge list is pre-hash-partitioned on
  the join key, so per iteration only the (much smaller) label table
  shuffles.
- The iterative tail runs at a partition count sized to the EDGE LIST,
  not the session default: a near-dup edge list is orders of magnitude
  smaller than the corpus that produced it (365 edges from 5 k docs on
  the fixture; the same ratio holds at 100 TB), and pushing a few
  hundred surviving rows through 64-partition shuffles every round made
  task-scheduling overhead dominate the loop. One partition per ~1 M
  edges, clamped to the session ceiling, keeps each round dense while
  still scaling out for billion-edge graphs.
- Convergence is detected with a single scalar aggregate: labels only
  ever DECREASE, so sum(label) is strictly monotone until the fixpoint
  and "sum unchanged" <=> "no label changed". That same action
  materializes the round's LAZY ``localCheckpoint`` — one job per
  iteration total, instead of eager-checkpoint + convergence-check jobs.
  The checkpoint truncates the logical plan each round; without it the
  plan doubles per iteration and analysis time dominates by round ~10.
  (On a real cluster with a checkpoint dir, ``checkpoint()`` to reliable
  storage is the durable equivalent; local checkpoint is the right call
  in local mode and keeps the operator self-contained.)
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

# One shuffle partition per this many edges in the iterative tail; tiny
# graphs collapse to a single dense task, billion-edge graphs fan out.
_EDGES_PER_PARTITION = 1_000_000


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
    u, v = F.col(src), F.col(dst)
    # Symmetrize in one pass (explode, not union: the union's two
    # branches would each re-execute the whole upstream pair pipeline
    # when this cache first materializes — measured 2x on the fixture
    # LSH pipeline). MEMORY_AND_DISK via persist() — not localCheckpoint
    # — so a 100 TB edge list spills rather than OOMs, and lineage
    # survives executor loss.
    sym = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(u.alias("u"), v.alias("v")),
                    F.struct(v.alias("u"), u.alias("v")),
                )
            ).alias("e")
        )
        .select("e.u", "e.v")
        .persist()
    )
    # Materialize the cache and size the iterative tail from the actual
    # edge count. The count is not an extra pass: the seed aggregate
    # below would materialize the cache anyway, and every subsequent
    # iteration reads the cached blocks.
    n_edges = sym.count()
    spark = edges.sparkSession
    ceiling = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    parts = max(1, min(ceiling, n_edges // _EDGES_PER_PARTITION + 1))
    # Pre-partition the edge cache on the join key (v): per iteration
    # the join then reuses this layout and only the label table moves.
    # Materialize it NOW, while `sym` is still cached — one cheap
    # cache-to-cache shuffle; deferring it past sym.unpersist() would
    # re-run the whole upstream pair pipeline instead.
    sym_by_v = sym.repartition(parts, "v").persist()
    sym_by_v.count()
    # Seed with iteration-1's result directly: comp0(u) = min(u, min(v)).
    # The groupBy rides the explicit u-repartition (same key, no second
    # shuffle), so the seed is one tight shuffle at `parts` width.
    labels = (
        sym.repartition(parts, "u")
        .groupBy(F.col("u").alias("node"))
        .agg(F.least(F.first("u"), F.min("v")).alias("comp"))
        .localCheckpoint(eager=True)
    )
    sym.unpersist()  # superseded by sym_by_v for the loop
    prev_sum = None
    prev_ckpt = None
    converged = False
    for _ in range(max_iter):
        # Single action per round: materializes the (lazy) checkpoint
        # AND yields the convergence scalar.
        cur = labels.agg(
            F.sum(F.col("comp").cast("decimal(38,0)")).alias("s")
        ).first()["s"]
        if cur is None or cur == prev_sum:
            converged = True
            break
        prev_sum = cur
        nbr_min = sym_by_v.join(
            labels, sym_by_v["v"] == labels["node"]
        ).select(F.col("u").alias("node"), "comp")
        new_labels = (
            labels.union(nbr_min)
            .repartition(parts, "node")
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=False)
        )
        # The superseded checkpoint's blocks are dead once the new one is
        # materialized (nothing downstream can reference it) — free them,
        # or repeated calls leak executor storage run over run.
        if prev_ckpt is not None:
            prev_ckpt.unpersist()
        prev_ckpt = labels
        labels = new_labels
    if not converged:
        # max_iter exit: the last checkpoint is still lazy; materialize
        # it BEFORE dropping the caches its plan reads from (a truncated
        # checkpoint cannot recompute lost input blocks).
        labels.count()
    sym_by_v.unpersist()
    if prev_ckpt is not None:
        prev_ckpt.unpersist()
    return labels.select(
        F.col("node").alias(node_out), F.col("comp").alias(comp_out)
    )
