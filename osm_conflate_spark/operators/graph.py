"""Link-graph analytics: distributed PageRank over an edge table.

Web-corpus pipelines rank hosts/documents by link authority (the
CommonCrawl host-level ranks, RefinedWeb/CCNet-style quality priors)
before sampling training data — PageRank over the crawl's link graph
is the canonical such operator, and the classic test of an engine's
iterative-job story.

Spark plan (per iteration, fully declarative — no ``collect`` in the
loop):

1. ``contribs``: ranks ⋈ weighted-edges on ``src`` → groupBy ``dst``
   sum(rank·w).  The edge table is hash-repartitioned on ``src`` ONCE
   and cached before the loop, so every iteration's join moves only
   the skinny (node, rank) side — the 100 TB-scale invariant (GraphX
   and every Pregel-on-Spark implementation does exactly this; the
   big static table never re-shuffles).
2. ``dangling``: 1-row aggregate of rank mass on nodes with no
   out-edges, cross-joined back via ``broadcast`` — uniform
   redistribution, the standard formulation, kept declarative so the
   whole iteration is one lazy plan (no per-iteration driver
   round-trip).
3. new rank = (1−d)/N + d·(contrib + dangling/N), left-joined onto
   the full node set so zero-in-degree nodes keep the teleport term.

Lineage is truncated with ``localCheckpoint`` every
``checkpoint_interval`` iterations — iterative DataFrame plans grow
exponentially otherwise (Catalyst re-analyzes the whole unrolled tree
each pass).  On a real cluster with HDFS you'd use reliable
``checkpoint()`` instead; same call shape, noted not built.

Float determinism: per-node contribution sums have in-degree-many
terms; addition-order variation across engines/partitionings is
O(eps·in_degree) — callers should round published ranks (the driver
query emits ``round(rank·N, 6)``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def synthetic_link_edges(
    docs: DataFrame,
    out_degree: int = 3,
    mult: int = 48271,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic synthetic link graph over a contiguous-id corpus:
    doc ``i`` links to ``(i·mult + j) mod N`` for ``j`` in
    1..out_degree (N = corpus size, computed declaratively and
    broadcast — ids must be 0..N−1, which the driver asserts of the
    test corpus).  Every node has out-degree ``out_degree`` (no
    dangling nodes) and the multiplier is a full-period MINSTD
    constant so in-degrees spread.  Replayable in any SQL engine —
    this is what makes the PageRank driver row oracle-able."""
    n_df = docs.agg(F.count(F.lit(1)).alias("__n"))
    return (
        docs.select(F.col(id_col).alias("src"))
        .crossJoin(F.broadcast(n_df))
        .select(
            "src",
            F.explode(
                F.expr(
                    f"transform(sequence(1, {int(out_degree)}), "
                    f"j -> pmod(src * {int(mult)} + j, __n))"
                )
            ).alias("dst"),
        )
    )


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    checkpoint_interval: int = 3,
    partitions: int | None = None,
) -> DataFrame:
    """PageRank over ``edges`` (directed, duplicates allowed — a
    doubled edge carries double weight).  Returns (node, rank) for
    every node appearing as a source or target; ranks sum to 1.

    Dangling nodes (no out-edges) redistribute their mass uniformly
    each iteration — the standard random-surfer formulation.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    if partitions:
        nodes = nodes.repartition(partitions, "node")
    nodes = nodes.cache()
    n_df = F.broadcast(nodes.agg(F.count(F.lit(1)).alias("__n")))

    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__deg"))
    # Static weighted edge table: partitioned on the join key once,
    # cached — iterations shuffle only the rank side.
    ew = (
        e.join(deg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("__deg")).alias("w"))
    )
    ew = ew.repartition(partitions or e.sparkSession.sparkContext.defaultParallelism, "src").cache()
    has_out = deg.select("src").distinct()

    ranks = nodes.crossJoin(n_df).select(
        "node", (F.lit(1.0) / F.col("__n")).alias("rank")
    )
    teleport = 1.0 - damping
    for i in range(iterations):
        contribs = (
            ranks.join(ew, ranks.node == ew.src)
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("w")).alias("__c"))
            .withColumnRenamed("dst", "node")
        )
        dangling = F.broadcast(
            ranks.join(has_out, ranks.node == has_out.src, "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dm"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(n_df)
            .crossJoin(dangling)
            .select(
                "node",
                (
                    F.lit(teleport) / F.col("__n")
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("__c"), F.lit(0.0))
                        + F.col("__dm") / F.col("__n")
                    )
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_interval == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    # Materialize the final ranks, then release the per-call caches
    # (round-5 ADVICE: repeated invocations in a long-lived session —
    # the bench loop — otherwise accumulate cached nodes/ew blocks
    # until storage evicts under pressure).  The eager checkpoint pins
    # the result so unpersisting its inputs cannot trigger recompute.
    ranks = ranks.localCheckpoint(eager=True)
    nodes.unpersist()
    ew.unpersist()
    return ranks
