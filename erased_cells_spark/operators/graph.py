"""Graph analytics over a link-edge table: PageRank (iterative rank flow)
and triangle counting (higher-order structure) — the host/link-graph
operators a web-corpus engine needs next to connected components
(operators/components.py: who is duplicated) — PageRank answers "who is
authoritative", triangles "how clustered is a neighborhood".

Edge tables are ordinary DataFrames (src, dst). The engine's test graph is
deterministic arithmetic over doc_ids (doc_link_edges / DOC_EDGES_SQL:
three affine families (m*u + c) mod N, dedup'd, self-loops dropped), so the
DuckDB oracle can generate the identical graph — no fixture files.

PageRank (standard damping form, NO dangling-mass redistribution — both
engines compute the same functional, stated so the oracle is exact):

    rank_0(v)   = 1 / N
    rank_i+1(v) = (1 - d) / N + d * sum_{(u,v) in E} rank_i(u) / outdeg(u)

Scale shape: each iteration is one equi-join (edges ⋈ ranks on src, edges
are the big side, ranks the small-but-data-scaled side) + one groupBy(dst)
with map-side partial sums, then a left join back to nodes so zero-in-degree
vertices keep their (1-d)/N floor. Lineage is cut with an eager
localCheckpoint per iteration (the components.py convention) — at a real
deployment scale this becomes a reliable checkpoint dir; rank state is one
(id, rank) row per vertex, never driver-side.

Triangles: degree-oblivious orientation a < b on the undirected edge set,
then the canonical 3-way self-join (a<b<c counts each triangle once).
Skew note: the self-join fan-out is bounded by max degree^2; for power-law
web graphs orient by (degree, id) instead — the test graph is near-regular
(out-degree <= 3), so plain id orientation is the right grain here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the affine edge families: (1,1)/(1,2) are the ring successors — they make
# (u, u+1, u+2) a triangle for EVERY u, so the triangle surface is
# non-vacuous by construction — and the coprime multipliers add long-range
# permutation edges (gcd(m, N) = 1 for every testdata N), guaranteeing
# in-degree >= 1 everywhere (each family alone covers all vertices)
EDGE_FAMILIES = ((1, 1), (1, 2), (31, 7), (17, 3))


def doc_link_edges(docs: DataFrame, n_nodes: int, id_col: str = "doc_id") -> DataFrame:
    """Deterministic synthetic link graph: dst = (m * src + c) mod N for
    each family, DISTINCT, self-loops dropped — identical arithmetic to
    DOC_EDGES_SQL so both engines see the same graph."""
    fams = F.array(
        *[
            F.pmod(F.col("src") * F.lit(m) + F.lit(c), F.lit(n_nodes))
            for m, c in EDGE_FAMILIES
        ]
    )
    return (
        docs.select(F.col(id_col).alias("src"))
        .select("src", F.explode(fams).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def doc_edges_sql(n_expr: str = "(SELECT count(*) FROM documents)") -> str:
    """The identical edge generator in ANSI SQL for the DuckDB oracle."""
    fams = ", ".join(f"({m}, {c})" for m, c in EDGE_FAMILIES)
    return f"""
SELECT DISTINCT src, dst FROM (
  SELECT d.doc_id AS src, (d.doc_id * k.m + k.c) % {n_expr} AS dst
  FROM documents d, (VALUES {fams}) AS k(m, c)
) WHERE src != dst
"""


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    n_iter: int = 10,
    damping: float = 0.85,
    id_col: str = "id",
) -> DataFrame:
    """PageRank after exactly ``n_iter`` synchronous iterations.

    ``nodes`` must contain every vertex (isolated ones included — they hold
    the (1-d)/N floor); ``edges`` columns (src, dst). Returns (id, rank).
    """
    n = nodes.count()
    if n == 0:
        raise ValueError("pagerank needs a non-empty node set")
    base = 1.0 / n
    floor = (1.0 - damping) / n
    outdeg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    ranks = nodes.select(F.col(id_col).alias("id"), F.lit(base).alias("rank"))
    for _ in range(n_iter):
        contrib = (
            edges.join(ranks, edges["src"] == ranks["id"])
            .join(outdeg, "src")
            .select(F.col("dst"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.select(F.col(id_col).alias("id"))
            .join(contrib, F.col("id") == F.col("dst"), "left")
            .select(
                "id",
                (
                    F.lit(floor)
                    + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)  # bound lineage per iteration
        )
    return ranks


def triangle_count(edges: DataFrame) -> DataFrame:
    """All triangles of the UNDIRECTED simple graph underlying ``edges``,
    each counted once via the a < b < c orientation. Returns one row per
    triangle (a, b, c) — aggregate downstream (global count, per-bucket
    rollups, per-vertex participation)."""
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    e1 = und.select(F.col("a"), F.col("b"))
    e2 = und.select(F.col("a").alias("b2"), F.col("b").alias("c"))
    e3 = und.select(F.col("a").alias("a3"), F.col("b").alias("c3"))
    return (
        e1.join(e2, F.col("b") == F.col("b2"))
        .join(e3, (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")))
        .select("a", "b", "c")
    )


def bfs_hops(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int,
    id_col: str = "id",
) -> DataFrame:
    """Multi-source BFS shortest hop counts over a directed edge table:
    (id, hops) for every vertex reachable from any source within
    max_hops (sources themselves at 0). Level-synchronous frontier
    expansion — each level is one equi-join frontier->edges plus an
    anti-join against the visited set, lineage cut per level with
    localCheckpoint (the components.py convention); the only driver
    state is one emptiness scalar per level. Level-synchrony IS the
    shortest-path proof: a vertex is labeled the first level it appears,
    and every edge is explored from a frontier exactly once.

    Scale shape: right for SMALL-DIAMETER graphs (web/link graphs, ~6
    levels at any size — O(diameter) shuffles on dst). High-diameter
    reachability belongs to the pointer-jumping components operator
    (doubling rounds), not BFS."""
    if max_hops < 0:
        raise ValueError("max_hops must be >= 0")
    frontier = (
        sources.select(F.col(id_col).alias("id"))
        .distinct()
        .withColumn("hops", F.lit(0).cast("long"))
        .localCheckpoint(eager=True)
    )
    visited = frontier
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(edges, frontier["id"] == edges["src"])
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(visited.select("id"), "id", "left_anti")
            .withColumn("hops", F.lit(h).cast("long"))
            .localCheckpoint(eager=True)
        )
        if nxt.limit(1).count() == 0:
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited


def bellman_ford(
    edges: DataFrame,
    sources: DataFrame,
    rounds: int,
    id_col: str = "id",
) -> DataFrame:
    """Weighted shortest paths after exactly `rounds` synchronous
    relaxation rounds (distributed Bellman-Ford): (id, cost) where cost
    is the exact minimum total weight over walks of at most `rounds`
    edges from any source (sources at 0). Integer weights -> every cost
    and comparison is exact int64; with rounds >= |V|-1 and nonnegative
    weights this is the true shortest-path table.

    Each round is one equi-join dist->edges plus a min-fold groupBy —
    the relaxation never needs the visited/frontier machinery BFS uses
    because the min-fold is idempotent; lineage is cut per round
    (localCheckpoint, the iterative-operator convention here). O(rounds)
    shuffles on dst; right for the bounded-hop queries a link graph
    asks ("cheapest path within 4 hops"), with the same small-diameter
    caveat as bfs_hops for unbounded ones."""
    if rounds < 0:
        raise ValueError("rounds must be >= 0")
    dist = (
        sources.select(F.col(id_col).alias("id"))
        .distinct()
        .withColumn("cost", F.lit(0).cast("long"))
        .localCheckpoint(eager=True)
    )
    for _ in range(rounds):
        relaxed = (
            dist.join(edges, dist["id"] == edges["src"])
            .select(F.col("dst").alias("id"), (F.col("cost") + F.col("w")).alias("cost"))
        )
        new = (
            dist.unionByName(relaxed)
            .groupBy("id")
            .agg(F.min("cost").alias("cost"))
            .localCheckpoint(eager=True)
        )
        # fixpoint: relaxation is monotone, equal row count + equal min-sum
        # means no label changed (costs only ever decrease)
        if (
            new.count() == dist.count()
            and new.agg(F.sum("cost")).collect()[0][0]
            == dist.agg(F.sum("cost")).collect()[0][0]
        ):
            return new
        dist = new
    return dist


def dag_depth(edges: DataFrame, max_rounds: int = 50) -> DataFrame:
    """Topological depth (longest-path layer) of every vertex in a DAG:
    depth(v) = 0 for sources (no in-edges), else 1 + max(depth(u)) over
    in-edges (u, v) — the scheduling-layer / dependency-level query.
    Synchronous max-fold relaxation: each round joins current depths to
    out-edges and max-folds per dst; a fixpoint (no depth grew) ends it,
    and exceeding max_rounds RAISES — on a DAG depths grow at most
    |longest path| rounds, so non-termination means the input has a
    cycle and a silent wrong answer would be worse than an error.
    Exact integers; lineage cut per round (the iterative-operator
    convention); O(depth) shuffles on dst."""
    nodes = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    depth = nodes.withColumn("depth", F.lit(0).cast("long")).localCheckpoint(
        eager=True
    )
    for _ in range(max_rounds):
        relaxed = (
            depth.join(edges, depth["id"] == edges["src"])
            .select(F.col("dst").alias("id"), (F.col("depth") + 1).alias("depth"))
        )
        new = (
            depth.unionByName(relaxed)
            .groupBy("id")
            .agg(F.max("depth").alias("depth"))
            .localCheckpoint(eager=True)
        )
        if (
            new.agg(F.sum("depth")).collect()[0][0]
            == depth.agg(F.sum("depth")).collect()[0][0]
        ):
            return new
        depth = new
    raise ValueError(
        f"dag_depth: no fixpoint after {max_rounds} rounds — the edge set "
        "contains a cycle (or raise max_rounds for a deeper DAG)"
    )


def hits(
    nodes: DataFrame,
    edges: DataFrame,
    n_iter: int = 6,
    id_col: str = "id",
) -> DataFrame:
    """HITS hubs & authorities after ``n_iter`` synchronous (Jacobi)
    iterations, UN-normalized:

        auth_{k+1}(v) = sum_{(u,v) in E} hub_k(u)
        hub_{k+1}(v)  = sum_{(v,w) in E} auth_k(w)

    with hub_0 = auth_0 = 1. Deferring normalization makes every score an
    EXACT INTEGER (sums of integers starting from 1 — no divisions inside
    the loop), so iterates are bit-identical on any engine and any
    partitioning/summation order up to 2^53 — callers bound n_iter by
    max_degree^(2*n_iter) < 2^53 and normalize once at the end (a single
    exact divide by the max). The parallel update (hub from the PREVIOUS
    auth) is power iteration on the doubled graph: same fixpoint
    direction as the textbook sequential form, chosen because it is
    expressible as ONE pass over the previous state in both engines.

    Complements pagerank: PageRank scores endorsement flow along edges;
    HITS separates "points at good pages" (hub) from "is pointed at by
    good hubs" (authority) — on directed link graphs the two rankings
    disagree in exactly the ways a crawl-prioritizer cares about.

    Scale shape: per iteration, two equi-joins sharing the edges table +
    two map-side-combined groupBys, state is one (id, hub, auth) row per
    vertex, lineage cut per iteration (localCheckpoint, the components.py
    convention). Returns (id, hub, auth) as exact int64."""
    state = nodes.select(
        F.col(id_col).alias("id"),
        F.lit(1).cast("long").alias("hub"),
        F.lit(1).cast("long").alias("auth"),
    )
    for _ in range(n_iter):
        auth_new = (
            edges.join(state, edges["src"] == state["id"])
            .groupBy(F.col("dst").alias("a_id"))
            .agg(F.sum("hub").alias("auth_in"))
        )
        hub_new = (
            edges.join(state, edges["dst"] == state["id"])
            .groupBy(F.col("src").alias("h_id"))
            .agg(F.sum("auth").alias("hub_in"))
        )
        state = (
            nodes.select(F.col(id_col).alias("id"))
            .join(hub_new, F.col("id") == F.col("h_id"), "left")
            .join(auth_new, F.col("id") == F.col("a_id"), "left")
            .select(
                "id",
                F.coalesce("hub_in", F.lit(0)).cast("long").alias("hub"),
                F.coalesce("auth_in", F.lit(0)).cast("long").alias("auth"),
            )
            .localCheckpoint(eager=True)
        )
    return state


def clustering_coefficient(edges: DataFrame) -> DataFrame:
    """Local clustering coefficient per vertex of the undirected simple
    graph: coeff(v) = 2*T(v) / (deg(v)*(deg(v)-1)) — how close v's
    neighborhood is to a clique (the community-structure microscope next
    to the global triangle count). Exact components: T(v) = triangles
    containing v (each a<b<c triangle explodes to its 3 vertices),
    deg(v) from the distinct undirected edge set; the one float is the
    final single divide of exact ints (deterministic), rounded by the
    caller. Vertices with deg < 2 are excluded (coefficient undefined).
    Returns (id, deg, n_tri, coeff).

    Scale shape: reuses triangle_count's oriented 3-way self-join
    (bounded by max-degree^2 fan-out; orient by (degree, id) for
    power-law graphs) + two metadata-light aggregations."""
    tri = triangle_count(edges)
    per_v = (
        tri.select(F.col("a").alias("id"))
        .unionAll(tri.select(F.col("b").alias("id")))
        .unionAll(tri.select(F.col("c").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("id"))
        .unionAll(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    return (
        deg.filter(F.col("deg") >= 2)
        .join(per_v, "id", "left")
        .select(
            "id",
            "deg",
            F.coalesce("n_tri", F.lit(0)).alias("n_tri"),
            (
                (F.coalesce("n_tri", F.lit(0)) * 2).cast("double")
                / (F.col("deg") * (F.col("deg") - 1)).cast("double")
            ).alias("coeff"),
        )
    )


def temporal_reachability(
    edges: DataFrame,
    sources: DataFrame,
    id_col: str = "id",
    max_rounds: int = 50,
) -> DataFrame:
    """Time-respecting reachability: the earliest time each vertex can be
    reached from any source through a chain of contacts whose times
    never decrease — the epidemic/influence/information-flow question
    static reachability gets WRONG (a contact that happened BEFORE the
    carrier was reached cannot transmit).

    edges: DIRECTED (src, dst, t) with integer times (union both
    directions for symmetric contacts); sources: (id_col) rows, reached
    at time 0 (use shifted times if 0 is meaningful). Returns
    (id, arrival) for every reachable vertex.

    Algorithm: label-correcting min-arrival relaxation —
        arrival(v) = min over edges (u, v, t) with t >= arrival(u) of t
    iterated to a VERIFIED fixpoint (each round one equi-join + min
    aggregate; arrivals are monotone non-increasing ints so the sum
    converges; lineage cut per round, the components.py convention;
    fail-loud at max_rounds like dag_depth). Exact integer times; no
    floats anywhere.

    Scale shape: per round one join edges⋈arrivals on the vertex key +
    one min groupBy — the PageRank shuffle profile; state is one (id,
    arrival) row per REACHED vertex. Rounds are bounded by the longest
    time-respecting path, not the vertex count."""
    arr = sources.select(F.col(id_col).alias("id"), F.lit(0).cast("long").alias("arr"))
    arr = arr.groupBy("id").agg(F.min("arr").alias("arr")).localCheckpoint(eager=True)
    e = edges.select(
        F.col("src").alias("id"), F.col("dst"), F.col("t").cast("long").alias("t")
    )
    prev_state = None
    for _ in range(max_rounds):
        cand = (
            arr.join(e, "id")
            .filter(F.col("t") >= F.col("arr"))
            .select(F.col("dst").alias("id"), F.col("t").alias("arr"))
        )
        new_arr = (
            arr.unionAll(cand)
            .groupBy("id")
            .agg(F.min("arr").alias("arr"))
            .localCheckpoint(eager=True)
        )
        state = new_arr.agg(
            F.count(F.lit(1)).alias("n"), F.sum("arr").alias("s")
        ).collect()[0]
        if prev_state == (state.n, state.s):
            return new_arr
        prev_state = (state.n, state.s)
        arr = new_arr
    raise RuntimeError(
        f"temporal_reachability did not converge in {max_rounds} rounds"
    )
