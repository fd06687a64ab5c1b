"""Graph traversal over the way-adjacency network (routing-adjacent
analytics the reference's downstream users run in osmnx/networkx after
materializing a GeoDataFrame — here distributed, over the same
``way_refs`` table that feeds topology segmentation).

``bfs_hops`` is multi-source breadth-first hop distance: the driver loop
iterates one frontier expansion per level — one join + one
partial-aggregated ``min`` per iteration, ``localCheckpoint`` truncating
lineage — exactly the iteration discipline of ``connected_components``
(and of GraphX/GraphFrames under the hood).  Per-level shuffle volume is
bounded by |frontier| × avg-degree, and only NEWLY-reached nodes expand
(a node's min-hops is final the level it first appears: textbook BFS,
not Bellman-Ford re-relaxation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col, lit


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 3,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "node_id",
) -> DataFrame:
    """Hop distance from the seed set along (symmetrized) edges, capped at
    ``max_hops``.  Returns (id_col, hops) for every reached node — the
    k-hop neighborhood query behind "all roads within 3 blocks",
    contamination blast-radius, and dedup-cluster expansion.

    ``edges`` is treated as undirected.  Early-exits when a frontier goes
    empty; the per-level count() that detects it is the same driver-side
    convergence probe ``connected_components`` uses.
    """
    sym = (
        edges.select(col(src).alias("s"), col(dst).alias("d"))
        .union(edges.select(col(dst).alias("s"), col(src).alias("d")))
        .localCheckpoint()
    )
    dist = seeds.select(col(id_col), lit(0).alias("hops")).localCheckpoint()
    frontier = dist
    for k in range(1, max_hops + 1):
        nxt = (
            frontier.join(sym, frontier[id_col] == sym["s"])
            .select(col("d").alias(id_col), lit(k).alias("hops"))
        )
        dist = (
            dist.union(nxt)
            .groupBy(id_col)
            .agg(F.min("hops").alias("hops"))
            .localCheckpoint()
        )
        frontier = dist.filter(col("hops") == k)
        if frontier.limit(1).count() == 0:
            break
    return dist


def pagerank_integer(
    edges: DataFrame,
    nodes: DataFrame,
    iters: int = 5,
    damping_pct: int = 85,
    scale: int = 1_000_000_000_000,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "node_id",
    checkpoint: bool = True,
) -> DataFrame:
    """Fixed-iteration PageRank in EXACT integer arithmetic — the third
    iterative-loop operator next to ``connected_components`` and
    ``bfs_hops``, and the one where float nondeterminism usually bites:
    a parallel double sum of incoming contributions differs run-to-run,
    so naive distributed PageRank is not reproducible.  Here ranks live
    in integer pico-units (``scale`` = 1e12 per unit of probability
    mass) and every step is BIGINT: contribution = r div out_degree,
    update = (1-d)*scale + (cs div 100)*d_pct + ((cs % 100)*d_pct) div
    100 — algebraically identical to (d_pct*cs) div 100 for cs ≥ 0 but
    division-first, so the multiplication can NEVER overflow BIGINT (the
    naive d_pct*cs form wraps silently once a hub's summed
    in-contribution exceeds ~2^63/d_pct ≈ 1.08e17 pico-units, e.g. a
    ~100k-in-degree node at the default scale).  Bit-identical on any
    engine, partitioning, or rerun (the dangling-node mass is dropped,
    the common simplification).

    Per iteration: one shuffle join of ranks onto the edge list keyed by
    source + one partial-aggregated sum keyed by destination —
    GraphX/Pregel's exact data movement — with ``localCheckpoint``
    truncating lineage so iteration N's plan does not replay iterations
    1..N-1.  The edge list (with out-degrees attached) materializes ONCE
    and is reused every round.
    """
    base = (100 - damping_pct) * scale // 100
    # checkpoint=False exists ONLY for plan-shape audits (test_plans.py
    # pins the per-iteration data movement): localCheckpoint is eager and
    # replaces lineage with an RDD scan, hiding the joins it executes.
    # Per-round checkpoints are LAZY (round 6): a fixed-iteration loop
    # needs no per-round action, so all rounds build into one chain and a
    # single action materializes it — eager rounds paid one scheduled job
    # each for pure lineage truncation.
    ckpt = (lambda df: df.localCheckpoint()) if checkpoint else (lambda df: df)
    lazy = (
        (lambda df: df.localCheckpoint(eager=False)) if checkpoint else (lambda df: df)
    )
    deg = edges.groupBy(src).agg(F.count("*").alias("deg"))
    e = ckpt(edges.join(deg, src))
    ranks = lazy(nodes.select(col(id_col), lit(scale).cast("long").alias("r")))
    for _ in range(iters):
        contrib = (
            ranks.join(e, ranks[id_col] == e[src])
            .select(col(dst).alias(id_col), F.expr("r div deg").alias("c"))
            .groupBy(id_col)
            .agg(F.sum("c").alias("cs"))
        )
        ranks = (
            nodes.join(contrib, id_col, "left")
            .select(
                col(id_col),
                F.expr(
                    f"CAST({base} + (coalesce(cs, 0) div 100) * {damping_pct}"
                    f" + ((coalesce(cs, 0) % 100) * {damping_pct}) div 100"
                    " AS BIGINT)"
                ).alias("r"),
            )
        )
        ranks = lazy(ranks)
    return ranks


def bellman_ford_integer(
    edges: DataFrame,
    seeds: DataFrame,
    iters: int = 4,
    src: str = "src",
    dst: str = "dst",
    w: str = "w",
    id_col: str = "node_id",
    checkpoint: bool = True,
) -> DataFrame:
    """Bounded Bellman-Ford shortest path from a seed set over WEIGHTED
    edges with exact BIGINT weights — the routing primitive ``bfs_hops``
    (hop counts) upgrades to: after ``iters`` relaxation rounds every
    node reachable within ``iters`` edges carries its exact shortest
    distance over at-most-``iters``-edge paths.  Float edge weights make
    distributed shortest path nondeterministic at ties (two equal-cost
    paths whose float sums differ in the last ulp); integer weights
    (e.g. L1 micro-degrees, time in ms) make every relaxation
    bit-identical on any engine or partitioning.

    Per round: one join of the current distance table onto the edge list
    keyed by source + one partial-aggregated ``min`` per destination —
    the same GraphX/Pregel data movement as ``pagerank_integer``, with
    LAZY ``localCheckpoint`` truncating lineage per round.  Unlike BFS, a
    node may improve in a later round (re-relaxation is the point).

    Convergence probing is ADAPTIVE (round 6): for a long horizon
    (``iters`` > 6) each round pays a driver probe and exits as soon as
    a round improves nothing; for the bounded few-round contract the
    probes themselves dominate (2 scheduled jobs per round against a
    possible saving of ≤ ``iters`` cheap rounds — measured ~2s of pure
    scheduling at sf0.01), so all rounds build lazily and ONE action
    materializes the chain.  Early exit never changes the result —
    a converged table is a fixpoint of further relaxation — so the two
    regimes are result-identical.
    """
    ckpt = (lambda df: df.localCheckpoint()) if checkpoint else (lambda df: df)
    lazy = (
        (lambda df: df.localCheckpoint(eager=False)) if checkpoint else (lambda df: df)
    )
    probe = checkpoint and iters > 6
    e = ckpt(edges.select(col(src).alias("s"), col(dst).alias("d"), col(w).alias("w")))
    dist = lazy(seeds.select(col(id_col), lit(0).cast("long").alias("dist")))
    for _ in range(iters):
        relaxed = (
            dist.join(e, dist[id_col] == e["s"])
            .select(col("d").alias(id_col), (col("dist") + col("w")).alias("dist"))
        )
        new_dist = lazy(
            dist.unionByName(relaxed).groupBy(id_col).agg(F.min("dist").alias("dist"))
        )
        # converged when no node improved this round (exact integer equality)
        if probe:
            improved = (
                new_dist.join(dist.withColumnRenamed("dist", "old"), id_col, "left")
                .filter(col("old").isNull() | (col("dist") < col("old")))
                .limit(1)
                .count()
            )
            dist = new_dist
            if improved == 0:
                break
        else:
            dist = new_dist
    return dist


def kcore_peel(
    edges: DataFrame,
    k: int = 3,
    rounds: int = 12,
    src: str = "src",
    dst: str = "dst",
    checkpoint: bool = True,
) -> DataFrame:
    """Bounded k-core peel: iterated degree pruning over a SYMMETRIC
    deduplicated edge list — after ``rounds`` rounds every surviving node
    has degree ≥ k among survivors, and when the peel converges within
    the budget (it cascades at most a few levels on real graphs — 6-9
    rounds on the suite's graphs at every sf) the survivors ARE the
    k-core.  Running the fixed budget instead of probing convergence is
    the ``bellman_ford_integer`` lesson: for a bounded-round contract
    the per-round driver probes cost more than the cheap extra rounds,
    and a converged alive-set is a fixpoint of further peeling, so the
    two regimes are result-identical.

    Per round: restrict the ORIGINAL edge list to the current alive set
    (two equi-joins — same movement as the oracle's unrolled CTEs), one
    partial-aggregated degree count, keep deg ≥ k.  Lazy
    ``localCheckpoint`` per round; ONE action materializes the chain.

    Returns ``(node_id, core_deg)`` — survivors with their degree within
    the final peel set (at convergence: their k-core degree).  Set
    semantics only — exact, deterministic under any partitioning."""
    lazy = (
        (lambda df: df.localCheckpoint(eager=False)) if checkpoint else (lambda df: df)
    )
    e = lazy(edges.select(col(src).alias("s"), col(dst).alias("d")))
    alive = None
    deg = None
    for _ in range(rounds):
        cur = e
        if alive is not None:
            cur = (
                e.join(alive.withColumnRenamed("v", "s"), "s")
                .join(alive.withColumnRenamed("v", "d"), "d")
            )
        deg = cur.groupBy(col("s").alias("v")).agg(F.count("*").alias("deg"))
        alive = lazy(deg.filter(col("deg") >= k).select("v"))
    return deg.filter(col("deg") >= k).select(
        col("v").alias("node_id"), col("deg").alias("core_deg")
    )
