"""Link-analysis operators: PageRank over a DataFrame edge list.

The north star's frontier priority is (depth, inlink count); the classic
refinement real crawlers layer on top is link-graph PageRank (host- or
page-level). This module implements power-iteration PageRank in the
Spark shape that survives a 100 TB link graph:

- the adjacency is built ONCE (groupBy src → out-degree), cached, and
  re-joined each iteration — the per-iteration cost is one join on src +
  one groupBy on dst, both shuffling only (node, rank) pairs, never the
  raw edge payload;
- dangling mass (nodes with no out-edges) is redistributed uniformly via
  a 1-row aggregate broadcast — no driver collect of node state;
- a FIXED iteration count (no floating-point convergence test) keeps the
  result deterministic across partitionings and engines; ranks are
  rounded at the END only.

Composition with the dedup tier (`dedup_centrality` in queries.py): run
PageRank on the MinHash-LSH near-dup pair graph and pick each connected
cluster's canonical representative by centrality — the "which copy do we
keep" answer a dedup pipeline needs after pair detection.

Reference: the crawl stores inlink counts only (frontier priority,
frontier/engine.py); the reference repo has no link analysis at all —
this is public PageRank (Brin & Page 1998) in DataFrame form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    n_iter: int = 10,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """PageRank over a directed edge list → (node, rank), sum(rank) == 1.

    Fixed ``n_iter`` power iterations. Each iteration is one join of the
    rank vector against the cached out-degree edges plus one groupBy on
    dst; dangling mass and the teleport term are scalar broadcasts.
    Returns ranks rounded to 9 dp (cross-partitioning stable well above
    double noise; exact determinism for a FIXED partitioning is already
    given by Spark's pairwise-sum tree, and the rounding makes the
    equality-to-numpy test partition-invariant).
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .cache()
    )
    n_nodes = nodes.count()  # scalar: the one driver-side value PageRank needs
    out_deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    adj = e.join(out_deg, on="src").cache()
    adj.count()  # materialize once; iterations re-read the cache

    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    for _ in range(n_iter):
        contrib = (
            adj.join(ranks, adj.src == ranks.node)
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("in_rank"))
        )
        # dangling mass: rank sitting on nodes with no out-edges
        dangling = (
            ranks.join(out_deg, ranks.node == out_deg.src, "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
        )
        base = (1.0 - damping) / n_nodes
        ranks = (
            nodes.join(contrib, on="node", how="left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("in_rank"), F.lit(0.0)) + F.col("dm") / n_nodes)
                ).alias("rank"),
            )
            # sever lineage each iteration (same discipline as
            # dedup.dedup_clusters): without it the rank plan nests one
            # join+agg level per iteration and both analysis cost and
            # recompute fan-out grow without bound; RDD-scoped storage,
            # so the ContextCleaner frees old vectors as they drop
            .localCheckpoint(eager=True)
        )
    out = ranks.select("node", F.round("rank", 9).alias("rank"))
    adj.unpersist()
    nodes.unpersist()
    return out


def cluster_representatives(
    pairs: DataFrame,
    labels: DataFrame,
    n_iter: int = 10,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    label_col: str = "cluster_id",
    id_col: str = "doc_id",
) -> DataFrame:
    """Canonical representative per near-dup cluster: PageRank the
    UNDIRECTED pair graph (each pair contributes both directions) and keep
    each cluster's highest-centrality member (ties → smallest doc_id).

    ``pairs``: near-dup pairs (e.g. dedup.minhash_lsh_pairs output);
    ``labels``: (doc_id, cluster) connected-component labels
    (dedup.cluster_labels). Output: (cluster, rep_doc_id, rep_rank,
    n_members)."""
    und = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst")).unionByName(
        pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
    )
    pr = pagerank(und, n_iter=n_iter)
    member = labels.select(
        F.col(id_col).alias("node"), F.col(label_col).alias("cluster")
    ).join(pr, on="node", how="left")
    w = Window.partitionBy("cluster").orderBy(
        F.col("rank").desc_nulls_last(), F.col("node").asc()
    )
    return (
        member.withColumn("_rn", F.row_number().over(w))
        .withColumn("n_members", F.count("*").over(Window.partitionBy("cluster")))
        .filter(F.col("_rn") == 1)
        .select(
            "cluster",
            F.col("node").alias("rep_doc_id"),
            F.col("rank").alias("rep_rank"),
            F.col("n_members").cast("bigint").alias("n_members"),
        )
    )
