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
    round_dp: int = 9,
    tol: float | None = None,
    iters_out: list | None = None,
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

    ``tol``: optional early exit — the per-iteration ``Observation``
    additionally reports the L1 delta Σ|rank_i − rank_{i-1}| (the old
    rank rides the update projection as an extra column, so the check
    costs ZERO extra Spark jobs and no extra join: the update already
    left-joins the previous rank frame), and the loop stops as soon as
    delta < tol. ``n_iter`` stays the hard cap. The anytime/registered
    oracle twins use fixed-iteration mode (tol=None) — the DuckDB twin
    unrolls a FIXED count; tol mode is for production callers (e.g. the
    dedup-centrality representative pick, where only the RANKING
    matters) and is tested for ranking-equality + early termination in
    tests/test_graphalgo.py. ``iters_out``: optional list; the number of
    update iterations actually executed is appended (observability for
    tests/bench).

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
    it_done = 0
    for it in range(n_iter):
        contrib = (
            adj.join(ranks, adj.src == ranks.node)
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("in_rank"))
        )
        # join the PREVIOUS rank frame (not the node frame) so the old
        # rank stays in scope — identical row set, and tol mode's L1
        # delta then needs no extra join or job.
        new_rank = (
            F.lit(base)
            + F.lit(damping)
            * (F.coalesce(F.col("in_rank"), F.lit(0.0)) + F.lit(dm / n_nodes))
        ).alias("rank")
        cols = ["node", "has_out", new_rank]
        if tol is not None:
            cols.append(F.col("rank").alias("_prev"))
        ranks = ranks.join(contrib, on="node", how="left").select(*cols)
        it_done = it + 1
        if it == n_iter - 1:
            # the last update's dangling mass feeds nothing — stay lazy
            # (one join+agg level above the checkpointed ranks_{n-1};
            # the caller's consuming action materializes it exactly once)
            break
        obs = Observation()
        metrics = [
            F.sum(
                F.when(F.col("has_out") == 1, F.col("rank")).otherwise(F.lit(0.0))
            ).alias("live"),
        ]
        if tol is not None:
            metrics.append(
                F.sum(F.abs(F.col("rank") - F.col("_prev"))).alias("delta")
            )
        ranks = ranks.observe(
            obs,
            *metrics,
            # sever lineage each iteration (same discipline as
            # dedup.dedup_clusters): without it the rank plan nests one
            # join+agg level per iteration and both analysis cost and
            # recompute fan-out grow without bound; RDD-scoped storage,
            # so the ContextCleaner frees old vectors as they drop. The
            # eager materialization is ALSO the action that fires the
            # observation feeding the next iteration's dangling mass.
        ).localCheckpoint(eager=True)
        got = obs.get
        dm = 1.0 - got["live"]
        if tol is not None and got["delta"] < tol:
            break
    if iters_out is not None:
        iters_out.append(it_done)
    return ranks.select("node", F.round("rank", round_dp).alias("rank"))


def cluster_representatives(
    pairs: DataFrame,
    labels: DataFrame,
    n_iter: int = 10,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    label_col: str = "cluster_id",
    id_col: str = "doc_id",
    edges: DataFrame | None = None,
    round_dp: int = 9,
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
    pr = pagerank(edges, n_iter=n_iter, edges_distinct=True, round_dp=round_dp)
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
    round_dp: int = 9,
    tol: float | None = None,
    iters_out: list | None = None,
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

    ``tol``: optional early exit. Because the unnormalized hub vector
    grows like λ₁^k, the raw L1 delta never shrinks; the standard
    power-method residual is used instead: with s_i = Σ hub_i observed
    per iteration, r̂ = s_{i-1}/s_{i-2} estimates the dominant
    eigenvalue (exact at convergence), and the loop stops when
    Σ|hub_i − r̂·hub_{i-1}| / s_i < tol — i.e. the DIRECTION of the
    vector stopped changing. Costs one co-partitioned (node, hub) join
    per iteration (both sides hash-partitioned on node by their
    groupBys, so no extra exchange) and no extra jobs (the residual
    rides the checkpoint ``Observation``); checked from iteration 3
    onward (two sums must exist to form r̂). ``iters_out``: list to
    append the executed iteration count to.
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
    s_prev: float | None = None
    s_prev2: float | None = None
    it_done = 0
    for it in range(n_iter):
        auth = (
            e.join(hub, e.src == hub.node)
            .select(F.col("dst").alias("node"), F.col("hub").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("authority"))
        )
        new_hub = (
            e.join(auth, e.dst == auth.node)
            .select(F.col("src").alias("node"), F.col("authority").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("hub"))
        )
        it_done = it + 1
        check = tol is not None and s_prev is not None and s_prev2 is not None
        obs = Observation() if tol is not None else None
        if check:
            r_hat = s_prev / s_prev2
            # hub's node set is the fixed source set from iteration 1 on,
            # so this outer join only guards the first checked iteration;
            # both sides are hash-partitioned on node by their groupBys —
            # no extra exchange in the joined plan.
            new_hub = (
                new_hub.join(
                    hub.select("node", F.col("hub").alias("_ph")), "node", "outer"
                )
                .select(
                    "node",
                    F.coalesce("hub", F.lit(0.0)).alias("hub"),
                    F.coalesce("_ph", F.lit(0.0)).alias("_ph"),
                )
                .observe(
                    obs,
                    F.sum("hub").alias("s"),
                    F.sum(
                        F.abs(F.col("hub") - F.lit(r_hat) * F.col("_ph"))
                    ).alias("d"),
                )
                .select("node", "hub")
            )
        elif tol is not None:
            new_hub = new_hub.observe(obs, F.sum("hub").alias("s"))
        hub = (
            new_hub
            # sever lineage each iteration (the dedup_clusters/pagerank
            # discipline); RDD-scoped storage, freed by the ContextCleaner
            .localCheckpoint(eager=True)
        )
        if tol is not None:
            got = obs.get
            if check and got["d"] / got["s"] < tol:
                break
            s_prev2, s_prev = s_prev, got["s"]
    if iters_out is not None:
        iters_out.append(it_done)
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
        F.round(F.col("hub") / F.lit(nh), round_dp).alias("hub"),
        F.round(F.col("authority") / F.lit(na), round_dp).alias("authority"),
    )


def opic(
    edges: DataFrame,
    n_iter: int = 8,
    src: str = "src",
    dst: str = "dst",
    edges_distinct: bool = False,
    round_dp: int = 9,
    tol: float | None = None,
    iters_out: list | None = None,
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

    ``tol``: optional early exit on the L1 cash delta Σ|c_i − c_{i-1}|
    riding the same per-iteration ``Observation`` (zero extra jobs — the
    update projection already has the previous cash in scope); the final
    estimate divides by the ACTUAL rounds executed + 1, which is the
    paper's anytime property: stopping early is a valid estimate, just a
    different one, so the registered/oracled query uses fixed-iteration
    mode (the DuckDB twin unrolls a fixed count). ``iters_out``: list to
    append the executed round count to.
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
    it_done = 0
    for it in range(n_iter):
        contrib = (
            adj.join(state, adj.src == state.node)
            .select(F.col("dst").alias("node"), (F.col("cash") / F.col("deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("in_cash"))
        )
        cols = [
            F.col("node"),
            F.col("has_out"),
            (F.coalesce(F.col("in_cash"), F.lit(0.0)) + F.lit(dm / n_nodes)).alias(
                "cash"
            ),
            (F.col("hist") + F.col("cash")).alias("hist"),
        ]
        if tol is not None:
            cols.append(F.col("cash").alias("_prev"))
        state = state.join(contrib, on="node", how="left").select(*cols)
        it_done = it + 1
        if it == n_iter - 1:
            break
        obs = Observation()
        metrics = [
            F.sum(
                F.when(F.col("has_out") == 1, F.col("cash")).otherwise(F.lit(0.0))
            ).alias("live"),
        ]
        if tol is not None:
            metrics.append(
                F.sum(F.abs(F.col("cash") - F.col("_prev"))).alias("delta")
            )
        state = state.observe(obs, *metrics).localCheckpoint(eager=True)
        got = obs.get
        dm = 1.0 - got["live"]
        if tol is not None and got["delta"] < tol:
            break
    if iters_out is not None:
        iters_out.append(it_done)
    return state.select(
        "node",
        F.round(
            (F.col("hist") + F.col("cash")) / F.lit(float(it_done + 1)), round_dp
        ).alias("importance"),
    )


# ---------------------------------------------------------------------------
# DuckDB twins — the resolve_redirects recipe extended to power iteration.
#
# A FIXED iteration count makes the whole computation a finite expression
# DAG, so the oracle simply UNROLLS it: one (contrib, state) CTE pair per
# iteration, each a plain double-arithmetic restatement of the Spark
# update. Every scalar the Spark side derives on the driver (n_nodes,
# n_out, the per-iteration dangling mass fed forward through the
# Observation) becomes a scalar subquery computed from the same frame.
# All literals and divisions are cast ::DOUBLE explicitly — DuckDB parses
# bare decimal literals as DECIMAL, whose division semantics differ from
# the IEEE doubles Spark uses. The only engine divergence left is
# aggregation ORDER inside sum(); that is ~1 ulp (~1e-16 relative) per
# iteration, and the final round() (6 dp for the registered queries, vs
# values O(1e-3)) sits ~9 orders of magnitude above it, so the rounded
# scores hash-match (the source_kl argument, applied to an iterative op).


def _graph_setup_sql(links_cte: str) -> str:
    """Shared CTE prelude: distinct edges, out-degrees, the node frame
    with has_out, the (n, n_out) scalar frame, and the adjacency.

    Every CTE here and in the unrolled iteration chain is declared
    MATERIALIZED: DuckDB 1.0 INLINES plain CTEs per reference, and the
    s{{i}} -> s{{i-1}} -> ... chain with per-step scalar subqueries would
    re-expand the whole prefix exponentially (observed as "Too many open
    files" re-scanning the parquet thousands of times). Materialization
    makes the oracle evaluate each step exactly once — the same
    once-per-iteration cost profile as the Spark side's localCheckpoint."""
    return f"""
        links AS MATERIALIZED ({links_cte}),
        e AS MATERIALIZED (SELECT DISTINCT src, dst FROM links),
        out_deg AS MATERIALIZED (
            SELECT src, count(*) AS deg FROM e GROUP BY src),
        nodes AS MATERIALIZED (
            SELECT node, max(has_out) AS has_out FROM (
                SELECT src AS node, 1 AS has_out FROM e
                UNION ALL
                SELECT dst AS node, 0 AS has_out FROM e
            ) u GROUP BY node
        ),
        g AS MATERIALIZED (
            SELECT count(*) AS n, sum(has_out) AS n_out FROM nodes),
        adj AS MATERIALIZED (
            SELECT e.src, e.dst, d.deg FROM e JOIN out_deg d USING (src))
    """


def pagerank_sql(
    links_cte: str,
    n_iter: int = 10,
    damping: float = 0.85,
    round_dp: int = 9,
) -> str:
    """Unrolled fixed-iteration PageRank twin of :func:`pagerank`."""
    d = repr(float(damping))
    parts = [_graph_setup_sql(links_cte)]
    parts.append("""
        s0 AS MATERIALIZED (
            SELECT node, has_out,
                   1.0::DOUBLE / (SELECT n FROM g) AS rank
            FROM nodes
        ),
        d0 AS MATERIALIZED (SELECT ((SELECT n FROM g) - (SELECT n_out FROM g))::DOUBLE
                      / (SELECT n FROM g) AS dm)
    """)
    for i in range(1, n_iter + 1):
        p = i - 1
        parts.append(f"""
        c{i} AS MATERIALIZED (
            SELECT a.dst AS node, sum(s.rank / a.deg) AS in_rank
            FROM adj a JOIN s{p} s ON a.src = s.node GROUP BY a.dst
        ),
        s{i} AS MATERIALIZED (
            SELECT s.node, s.has_out,
                   (1.0::DOUBLE - {d}::DOUBLE) / (SELECT n FROM g)
                   + {d}::DOUBLE * (coalesce(c.in_rank, 0.0::DOUBLE)
                       + (SELECT dm FROM d{p}) / (SELECT n FROM g)) AS rank
            FROM s{p} s LEFT JOIN c{i} c ON s.node = c.node
        )
        """)
        if i < n_iter:
            parts.append(f"""
        d{i} AS MATERIALIZED (SELECT 1.0::DOUBLE - (SELECT sum(CASE WHEN has_out = 1
                        THEN rank ELSE 0.0::DOUBLE END) FROM s{i}) AS dm)
            """)
    body = ",".join(parts)
    return f"""
        WITH {body}
        SELECT node, round(rank, {round_dp}) AS rank FROM s{n_iter}
    """


def opic_sql(links_cte: str, n_iter: int = 8, round_dp: int = 9) -> str:
    """Unrolled fixed-iteration OPIC twin of :func:`opic`."""
    parts = [_graph_setup_sql(links_cte)]
    parts.append("""
        s0 AS MATERIALIZED (
            SELECT node, has_out,
                   1.0::DOUBLE / (SELECT n FROM g) AS cash,
                   0.0::DOUBLE AS hist
            FROM nodes
        ),
        d0 AS MATERIALIZED (SELECT ((SELECT n FROM g) - (SELECT n_out FROM g))::DOUBLE
                      / (SELECT n FROM g) AS dm)
    """)
    for i in range(1, n_iter + 1):
        p = i - 1
        parts.append(f"""
        c{i} AS MATERIALIZED (
            SELECT a.dst AS node, sum(s.cash / a.deg) AS in_cash
            FROM adj a JOIN s{p} s ON a.src = s.node GROUP BY a.dst
        ),
        s{i} AS MATERIALIZED (
            SELECT s.node, s.has_out,
                   coalesce(c.in_cash, 0.0::DOUBLE)
                       + (SELECT dm FROM d{p}) / (SELECT n FROM g) AS cash,
                   s.hist + s.cash AS hist
            FROM s{p} s LEFT JOIN c{i} c ON s.node = c.node
        )
        """)
        if i < n_iter:
            parts.append(f"""
        d{i} AS MATERIALIZED (SELECT 1.0::DOUBLE - (SELECT sum(CASE WHEN has_out = 1
                        THEN cash ELSE 0.0::DOUBLE END) FROM s{i}) AS dm)
            """)
    body = ",".join(parts)
    return f"""
        WITH {body}
        SELECT node,
               round((hist + cash) / {float(n_iter + 1)!r}::DOUBLE,
                     {round_dp}) AS importance
        FROM s{n_iter}
    """


def hits_sql(links_cte: str, n_iter: int = 4, round_dp: int = 9) -> str:
    """Unrolled fixed-iteration HITS twin of :func:`hits`.

    Same recipe as :func:`pagerank_sql` — one (auth, hub) MATERIALIZED
    CTE pair per iteration, one extra authority update after the loop,
    then L2 normalization restated as scalar subqueries over the scored
    frame (the Spark side's driver-collected norms). Hub rides source
    nodes only (identity-equal to all-node init, see :func:`hits`);
    sink/pure-authority nodes rejoin with 0 in the final projection.
    Precision: the unnormalized vectors grow like the dominant
    eigenvalue^k, but both engines accumulate the SAME products in
    different orders (~1 ulp relative drift per sum), and the final
    normalized values are O(1/sqrt(n)) rounded at ``round_dp`` — the
    same ~9-orders-of-headroom argument as the pagerank twin."""
    parts = [_graph_setup_sql(links_cte)]
    parts.append("""
        h0 AS MATERIALIZED (
            SELECT DISTINCT src AS node, 1.0::DOUBLE AS hub FROM e)
    """)
    for i in range(1, n_iter + 1):
        p = i - 1
        parts.append(f"""
        a{i} AS MATERIALIZED (
            SELECT e.dst AS node, sum(h.hub) AS authority
            FROM e JOIN h{p} h ON e.src = h.node GROUP BY e.dst
        ),
        h{i} AS MATERIALIZED (
            SELECT e.src AS node, sum(a.authority) AS hub
            FROM e JOIN a{i} a ON e.dst = a.node GROUP BY e.src
        )
        """)
    parts.append(f"""
        afin AS MATERIALIZED (
            SELECT e.dst AS node, sum(h.hub) AS authority
            FROM e JOIN h{n_iter} h ON e.src = h.node GROUP BY e.dst
        ),
        scored AS MATERIALIZED (
            SELECT n.node,
                   coalesce(h.hub, 0.0::DOUBLE) AS hub,
                   coalesce(a.authority, 0.0::DOUBLE) AS authority
            FROM (SELECT node FROM nodes) n
            LEFT JOIN h{n_iter} h ON n.node = h.node
            LEFT JOIN afin a ON n.node = a.node
        ),
        norms AS MATERIALIZED (
            SELECT sqrt(sum(hub * hub)) AS nh,
                   sqrt(sum(authority * authority)) AS na
            FROM scored
        )
    """)
    body = ",".join(parts)
    return f"""
        WITH {body}
        SELECT node,
               round(hub / (SELECT nh FROM norms), {round_dp}) AS hub,
               round(authority / (SELECT na FROM norms), {round_dp}) AS authority
        FROM scored
    """


def cluster_representatives_sql(
    pairs_cte: str, n_iter: int = 10, round_dp: int = 9
) -> str:
    """DuckDB twin of :func:`cluster_representatives` — the same two
    already-proven recipes composed over ONE materialized pair frame:
    connected-component labels via the recursive min-reachable CTE
    (dedup.dedup_clusters_sql) and the unrolled fixed-iteration
    :func:`pagerank_sql` over the undirected edge union, then the
    per-cluster argmax window (rank DESC NULLS LAST, node ASC — tie
    order is decided on values both engines agree on at ``round_dp``)."""
    from web_scraper_spark.operators.dedup import dedup_clusters_sql

    pr = pagerank_sql("SELECT src, dst FROM und", n_iter=n_iter, round_dp=round_dp)
    cl = dedup_clusters_sql("SELECT * FROM lshp")
    return f"""
        WITH lshp AS MATERIALIZED ({pairs_cte}),
        und AS MATERIALIZED (
            SELECT doc_a AS src, doc_b AS dst FROM lshp
            UNION ALL
            SELECT doc_b AS src, doc_a AS dst FROM lshp
        ),
        pr AS MATERIALIZED (SELECT * FROM ({pr}) p),
        cl AS MATERIALIZED (SELECT * FROM ({cl}) c),
        member AS (
            SELECT cl.doc_id AS node, cl.cluster_id AS cluster, pr.rank
            FROM cl LEFT JOIN pr ON pr.node = cl.doc_id
        ),
        ranked AS (
            SELECT cluster, node, rank,
                   row_number() OVER (
                       PARTITION BY cluster
                       ORDER BY rank DESC NULLS LAST, node ASC) AS rn,
                   count(*) OVER (PARTITION BY cluster) AS n_members
            FROM member
        )
        SELECT cluster, node AS rep_doc_id, rank AS rep_rank,
               n_members::BIGINT AS n_members
        FROM ranked WHERE rn = 1
    """
