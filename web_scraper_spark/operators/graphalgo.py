"""Link-analysis operators: PageRank over a DataFrame edge list.

The north star's frontier priority is (depth, inlink count); the classic
refinement real crawlers layer on top is link-graph PageRank (host- or
page-level). This module implements power-iteration PageRank in the
Spark shape that survives a 100 TB link graph:

- the adjacency is built ONCE (groupBy src → out-degree), cached, and
  re-joined each iteration — the per-iteration cost is one join on src +
  one groupBy on dst, both shuffling only (node, rank) pairs, never the
  raw edge payload;
- dangling mass (nodes with no out-edges) is folded INTO the rank-update
  job: iteration i's eager localCheckpoint carries an ``Observation`` of
  the live mass Σ rank(has_out), and dm_i = 1 − live (the rank vector
  sums to 1 by construction), so iteration i+1 uses a plain Python float
  literal — ONE Spark job per iteration, no anti-join aggregate, no
  per-iteration broadcast build (r3 VERDICT item 1);
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

from pyspark.sql import DataFrame, Observation, Window
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    n_iter: int = 10,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    edges_distinct: bool = False,
) -> DataFrame:
    """PageRank over a directed edge list → (node, rank), sum(rank) == 1.

    Fixed ``n_iter`` power iterations, ONE Spark job each: the rank-update
    plan (join of the rank vector against the cached out-degree adjacency,
    groupBy dst, teleport + dangling redistribution) materializes via an
    eager ``localCheckpoint`` whose ``Observation`` reports the live mass
    Σ rank(nodes with out-edges); the next iteration's dangling mass is
    the Python float ``1 − live`` (exact because each update renormalizes:
    Σ rank_{i+1} = (1−d) + d·(Σ in_rank + dm) = 1). No per-iteration
    anti-join, no broadcast build. Pass ``edges_distinct=True`` when the
    caller already deduplicated (src, dst) to skip the extra shuffle.

    Returns ranks rounded to 9 dp (cross-partitioning stable well above
    double noise; exact determinism for a FIXED partitioning is already
    given by Spark's pairwise-sum tree, and the rounding makes the
    equality-to-numpy test partition-invariant).
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if not edges_distinct:
        e = e.distinct()
    out_deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    # nodes carries has_out so every iteration's observation can split
    # live vs dangling mass without a second aggregate; its own
    # materialization job doubles as the (n_nodes, n_out) scalar read.
    # localCheckpoint, not cache: RDD-scoped storage, no unpersist
    # bookkeeping, and the final lazy iteration can safely reference it
    # after this function returns.
    setup_obs = Observation()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .join(
            out_deg.select(F.col("src").alias("node"), F.lit(1).alias("has_out")),
            on="node",
            how="left",
        )
        .select("node", F.coalesce(F.col("has_out"), F.lit(0)).alias("has_out"))
        .observe(setup_obs, F.count("*").alias("n"), F.sum("has_out").alias("n_out"))
        .localCheckpoint(eager=True)
    )
    stats = setup_obs.get
    n_nodes, n_out = stats["n"], stats["n_out"] or 0
    adj = e.join(out_deg, on="src").localCheckpoint(eager=True)

    base = (1.0 - damping) / n_nodes
    dm = (n_nodes - n_out) / n_nodes  # dangling mass of the uniform init
    ranks = nodes.select("node", "has_out", F.lit(1.0 / n_nodes).alias("rank"))
    for it in range(n_iter):
        contrib = (
            adj.join(ranks, adj.src == ranks.node)
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("in_rank"))
        )
        ranks = nodes.join(contrib, on="node", how="left").select(
            "node",
            "has_out",
            (
                F.lit(base)
                + F.lit(damping)
                * (F.coalesce(F.col("in_rank"), F.lit(0.0)) + F.lit(dm / n_nodes))
            ).alias("rank"),
        )
        if it == n_iter - 1:
            # the last update's dangling mass feeds nothing — stay lazy
            # (one join+agg level above the checkpointed ranks_{n-1};
            # the caller's consuming action materializes it exactly once)
            break
        obs = Observation()
        ranks = ranks.observe(
            obs,
            F.sum(
                F.when(F.col("has_out") == 1, F.col("rank")).otherwise(F.lit(0.0))
            ).alias("live"),
            # sever lineage each iteration (same discipline as
            # dedup.dedup_clusters): without it the rank plan nests one
            # join+agg level per iteration and both analysis cost and
            # recompute fan-out grow without bound; RDD-scoped storage,
            # so the ContextCleaner frees old vectors as they drop. The
            # eager materialization is ALSO the action that fires the
            # observation feeding the next iteration's dangling mass.
        ).localCheckpoint(eager=True)
        dm = 1.0 - obs.get["live"]
    return ranks.select("node", F.round("rank", 9).alias("rank"))


def cluster_representatives(
    pairs: DataFrame,
    labels: DataFrame,
    n_iter: int = 10,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    label_col: str = "cluster_id",
    id_col: str = "doc_id",
    edges: DataFrame | None = None,
) -> DataFrame:
    """Canonical representative per near-dup cluster: PageRank the
    UNDIRECTED pair graph (each pair contributes both directions) and keep
    each cluster's highest-centrality member (ties → smallest doc_id).

    ``pairs``: near-dup pairs (e.g. dedup.minhash_lsh_pairs output);
    ``labels``: (doc_id, cluster) connected-component labels
    (dedup.cluster_labels). Pass ``edges`` (a materialized DISTINCT
    undirected (src, dst) frame, e.g. ``dedup.undirected_edges(pairs)``)
    to share the edge build with a composed ``dedup_clusters`` call —
    the pair pipeline then runs once, not twice.
    Output: (cluster, rep_doc_id, rep_rank, n_members)."""
    if edges is None:
        edges = pairs.select(
            F.col(id_a).alias("src"), F.col(id_b).alias("dst")
        ).unionByName(
            pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
        ).distinct()
    pr = pagerank(edges, n_iter=n_iter, edges_distinct=True)
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


def hits(
    edges: DataFrame,
    n_iter: int = 10,
    src: str = "src",
    dst: str = "dst",
    edges_distinct: bool = False,
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999) over a directed edge
    list → (node, hub, authority), each vector L2-normalized.

    The crawl-priority complement to :func:`pagerank`: authority ranks
    pages worth fetching, hub ranks pages worth EXPANDING (their
    outlinks feed the frontier) — the two frontier signals a link-aware
    scheduler combines with depth/inlinks.

    Spark shape — same discipline as pagerank, but CHEAPER per
    iteration: the classic per-step L2 normalization only rescales, and
    power iteration is scale-invariant, so normalization happens ONCE at
    the end. Each iteration is then just auth ← Σ_{u→v} hub(u) (groupBy
    dst) and hub ← Σ_{u→v} auth(v) (groupBy src) — two co-keyed
    join+agg levels shuffling only (node, score) pairs, materialized by
    ONE eager localCheckpoint per iteration (lineage sever, RDD-scoped).
    Magnitudes grow like the dominant eigenvalue^k; with fixed small
    n_iter that stays far inside double range for any real graph, and
    the final normalization restores unit scale before the 9-dp rounding
    (the pagerank determinism recipe: fixed iterations, round at the
    end only).
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if not edges_distinct:
        e = e.distinct()
    e = e.localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # the hub vector only ever needs SOURCE nodes: a node with no
    # out-edges has hub 0 in every iteration and contributes nothing to
    # any authority, and the hub update (groupBy src over the edge join)
    # covers every source by construction — so the loop carries no
    # restore-missing-nodes outer join at all (pure-sink nodes rejoin
    # with hub 0 in the final output projection). Initializing hub = 1
    # on sources only is identity-equal to ones-over-all-nodes for the
    # same reason (the numpy twin initializes over all nodes).
    hub = e.select(F.col("src").alias("node")).distinct().select(
        "node", F.lit(1.0).alias("hub")
    )
    for _ in range(n_iter):
        auth = (
            e.join(hub, e.src == hub.node)
            .select(F.col("dst").alias("node"), F.col("hub").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("authority"))
        )
        hub = (
            e.join(auth, e.dst == auth.node)
            .select(F.col("src").alias("node"), F.col("authority").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("hub"))
            # sever lineage each iteration (the dedup_clusters/pagerank
            # discipline); RDD-scoped storage, freed by the ContextCleaner
            .localCheckpoint(eager=True)
        )
    auth = (
        e.join(hub, e.src == hub.node)
        .select(F.col("dst").alias("node"), F.col("hub").alias("c"))
        .groupBy("node")
        .agg(F.sum("c").alias("authority"))
    )
    scored = (
        nodes.join(auth, on="node", how="left")
        .join(hub, on="node", how="left")
        .select(
            "node",
            F.coalesce(F.col("hub"), F.lit(0.0)).alias("hub"),
            F.coalesce(F.col("authority"), F.lit(0.0)).alias("authority"),
        )
        .localCheckpoint(eager=True)
    )
    norms = scored.agg(
        F.sqrt(F.sum(F.col("hub") * F.col("hub"))).alias("nh"),
        F.sqrt(F.sum(F.col("authority") * F.col("authority"))).alias("na"),
    ).collect()[0]
    nh = norms["nh"] or 1.0
    na = norms["na"] or 1.0
    return scored.select(
        "node",
        F.round(F.col("hub") / F.lit(nh), 9).alias("hub"),
        F.round(F.col("authority") / F.lit(na), 9).alias("authority"),
    )


def opic(
    edges: DataFrame,
    n_iter: int = 8,
    src: str = "src",
    dst: str = "dst",
    edges_distinct: bool = False,
) -> DataFrame:
    """OPIC — On-line Page Importance Computation (Abiteboul, Preda &
    Cobena, WWW 2003), the importance estimator designed FOR crawlers:
    unlike PageRank it needs no full-graph power iteration to converge
    before being useful — cash+history give an anytime estimate that a
    frontier can rank on mid-crawl.

    Synchronous batch variant over a directed edge list → (node,
    importance), Σ importance == 1:

    - every node starts with cash 1/n and empty history;
    - each round, a node banks its cash into history and distributes it
      equally along its out-edges; dangling cash is redistributed
      uniformly (the "virtual page" of the paper, without self-loops);
    - after G rounds the estimate is X_i = (h_i + c_i) / (G + 1)
      (total banked history is exactly 1 per round, current cash sums
      to 1, so the denominator normalizes to Σ X = 1).

    Spark shape: identical discipline to :func:`pagerank` — adjacency
    built once and localCheckpoint'ed, each iteration ONE job whose
    eager checkpoint both severs lineage and fires the ``Observation``
    reporting the live (non-dangling) cash for the next round's
    dangling redistribution; shuffles carry only (node, cash, hist)
    triples. Fixed iteration count; rounding at the END only (9 dp).
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if not edges_distinct:
        e = e.distinct()
    out_deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    setup_obs = Observation()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .join(
            out_deg.select(F.col("src").alias("node"), F.lit(1).alias("has_out")),
            on="node",
            how="left",
        )
        .select("node", F.coalesce(F.col("has_out"), F.lit(0)).alias("has_out"))
        .observe(setup_obs, F.count("*").alias("n"), F.sum("has_out").alias("n_out"))
        .localCheckpoint(eager=True)
    )
    stats = setup_obs.get
    n_nodes, n_out = stats["n"], stats["n_out"] or 0
    adj = e.join(out_deg, on="src").localCheckpoint(eager=True)

    state = nodes.select(
        "node",
        "has_out",
        F.lit(1.0 / n_nodes).alias("cash"),
        F.lit(0.0).alias("hist"),
    )
    dm = (n_nodes - n_out) / n_nodes  # dangling cash of the uniform init
    for it in range(n_iter):
        contrib = (
            adj.join(state, adj.src == state.node)
            .select(F.col("dst").alias("node"), (F.col("cash") / F.col("deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("in_cash"))
        )
        state = state.join(contrib, on="node", how="left").select(
            "node",
            "has_out",
            (F.coalesce(F.col("in_cash"), F.lit(0.0)) + F.lit(dm / n_nodes)).alias(
                "cash"
            ),
            (F.col("hist") + F.col("cash")).alias("hist"),
        )
        if it == n_iter - 1:
            break
        obs = Observation()
        state = state.observe(
            obs,
            F.sum(
                F.when(F.col("has_out") == 1, F.col("cash")).otherwise(F.lit(0.0))
            ).alias("live"),
        ).localCheckpoint(eager=True)
        dm = 1.0 - obs.get["live"]
    return state.select(
        "node",
        F.round((F.col("hist") + F.col("cash")) / F.lit(float(n_iter + 1)), 9).alias(
            "importance"
        ),
    )
