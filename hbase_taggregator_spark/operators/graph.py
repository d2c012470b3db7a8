"""Link-graph operators for corpus curation.

Web-scale training pipelines use link-graph signals (PageRank / harmonic
centrality over the URL graph) as document quality priors — the classic
example being crawl-frontier and quality filtering over Common Crawl's
host graph. The operator here is the fixed-iteration power method,
expressed relationally the way the other iterative algorithms in this
package are (k-means refinement, connected components): a driver-side
Python loop that DEEPENS one declarative plan per iteration, never
collecting intermediate state. The loop-invariant inputs (distinct
edges, node list, out-degrees) are pinned with an eager localCheckpoint
before the first step so every iteration reuses them structurally
instead of hoping the planner's exchange-reuse fires.

100 TB shape per iteration: one shuffle keyed on the edge source (attach
ranks to edges), one shuffle keyed on the destination (sum contributions)
— both hash joins/aggregates on the natural graph keys, partial-aggregated
map-side. Edges are the big table and stream through; the rank vector is
nodes-sized. At web scale you'd persist the edge table bucketed by src so
the attach join never re-shuffles; the iteration count is fixed and small
(quality signals use 3-10 power steps, not convergence).

Cross-engine determinism discipline (same as the rest of the package):
per-edge contributions are doubles from correctly-rounded divisions,
pinned to DECIMAL(38,18) before the per-destination sum so accumulation
order cannot matter, and the damping update is a chain of individually
correctly-rounded IEEE ops — the DuckDB oracle restates the identical
algebra and hash-matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    edges: DataFrame,
    n_iter: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list.

    Semantics (restated exactly by the oracle): nodes are the distinct
    union of sources and destinations; every node starts at rank 1/N;
    each step sends ``rank/outdegree`` along every out-edge and updates
    ``rank' = (1-d)/N + d * sum(incoming)``. Dangling-node mass (nodes
    with no out-edges) is NOT redistributed — the standard simplification
    for quality-signal use, where relative ordering is what matters;
    document-ranking consumers rescale anyway. Multi-edges count once:
    pass a pre-aggregated or distinct edge list (the operator distincts
    defensively so the contract holds regardless).

    Node ids keep their INPUT type (string URLs, longs, binary keys all
    work): the operator never casts the key columns, it only requires
    src/dst to share one type (mismatched types raise at analysis via the
    union). The earlier long-cast contract silently nulled string ids —
    collapsing every URL into one null node — and is gone.

    Physical pinning: the distinct edge list is materialized ONCE (eager
    ``localCheckpoint``) before the loop, and the derived loop invariants
    (node list, out-degrees) are lazily persisted — without this every
    unrolled iteration re-derives all three, and whether the planner
    reuses those exchanges is its choice, not a guarantee (at 3
    iterations the audited plan carried ~70 exchanges; pinned it carries
    ~22). The checkpoint trade-off (shared with
    ``duplicate_components``): local checkpoints are unreplicated, so on
    a multi-executor cluster a lost executor fails the job instead of
    recomputing — acceptable for a short fixed-iteration job; use a
    reliable ``checkpoint()`` dir for long-running production runs. The
    persisted invariants recompute from the pinned edges on loss.
    Lifecycle: construction materializes the edge list eagerly (Spark
    jobs run even if the result is never consumed) and neither the
    cache nor the checkpoint is released by this function — when calling
    pagerank repeatedly in one session (per-subgraph loops), drop them
    between calls (``spark.catalog.clearCache()``; checkpoint blocks are
    reclaimed by the ContextCleaner once unreferenced) or reuse one call.

    Returns (node, rank) — rank as double, deterministic.
    """
    from pyspark.storagelevel import StorageLevel

    e = edges.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("dst"),
    ).distinct().localCheckpoint()
    # nodes/out-degrees are loop invariants DERIVED from the pinned edge
    # list: a lazy persist (filled on first use, recomputable from the
    # checkpointed e on executor loss) reuses them across iterations
    # without paying two more eager materialization jobs up front
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # node count rides along as a broadcast 1-row frame — no driver collect
    n_frame = nodes.agg(F.count(F.lit(1)).alias("__n"))
    outdeg = (
        e.groupBy("src")
        .agg(F.count(F.lit(1)).alias("__od"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    ranks = nodes.crossJoin(F.broadcast(n_frame)).select(
        "node", (F.lit(1.0) / F.col("__n").cast("double")).alias("rank")
    )
    for _ in range(n_iter):
        contrib = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("node"),
                # correctly-rounded division, then decimal-pinned so the
                # per-destination sum is accumulation-order-free
                (F.col("rank") / F.col("__od").cast("double"))
                .cast("decimal(38,18)")
                .alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").cast("double").alias("__in"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(n_frame))
            .select(
                "node",
                (
                    F.lit(1.0 - damping) / F.col("__n").cast("double")
                    + F.lit(damping) * F.coalesce(F.col("__in"), F.lit(0.0))
                ).alias("rank"),
            )
        )
    return ranks
