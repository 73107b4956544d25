"""Iterative-fixpoint graph algorithms on edge DataFrames.

Used for SPARQL property paths ``+``/``*`` (SURVEY §2.2 P7), the
owl:TransitiveProperty inference rule, and owl:sameAs equivalence classes
(SURVEY §2.8). Semi-naive evaluation: each round joins only the *delta*
(paths discovered last round) against the base edges, so round k costs
O(|delta_k| ⋈ |E|), not O(|paths| ⋈ |E|) — the SURVEY §7 "hard part (6)"
requirement. ``localCheckpoint`` truncates lineage so plans don't grow
exponentially with iterations (critical at scale: a 20-round closure
otherwise builds a 2^20-node plan).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..plans.ckpt import CheckpointTracker


def transitive_closure(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 50,
    seeds: DataFrame | None = None,
    broadcast_seeds: bool = False,
) -> DataFrame:
    """All pairs (a, b) with a path a →+ b (SPARQL ``p+`` semantics).

    Semi-naive: delta ⋈ edges per round, de-duplicated against the
    accumulated path set before the next round.

    ``seeds`` (a one-column DataFrame of node ids, src-typed) restricts
    evaluation to pairs whose SOURCE is a seed: the fixpoint starts from
    seeds ⋈ edges instead of the whole edge set, so each round's delta is
    the seeds' expanding FRONTIER and total cost is O(reachable-from-
    seeds), not O(all pairs) — the number of rounds is bounded by the
    reachable set's diameter, not the graph's. This is the scale path for
    bound-endpoint SPARQL paths (``ex:X ex:p+ ?y``): at 100 TB the full
    closure of a predicate graph dwarfs one node's reachable set by
    orders of magnitude.

    ``broadcast_seeds``: callers that KNOW the seed set is tiny (a
    constant endpoint) assert it to pin a broadcast seeding join.
    Variable-seeded routes pass an accumulated BGP binding set of
    unbounded size — there the hint is omitted and AQE picks the join
    strategy from runtime stats (broadcast when small, shuffle when
    not), avoiding a driver OOM at exactly the scale the seeding
    optimization targets."""
    tr = CheckpointTracker(edges)
    base = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    base, base_ids = tr.checkpoint(base)

    if seeds is not None:
        seed_col = seeds.columns[0]
        seed_df = seeds.select(F.col(seed_col).alias("src")).distinct()
        if broadcast_seeds:
            seed_df = F.broadcast(seed_df)
        init = seed_df.join(base, "src")
        init, init_ids = tr.checkpoint(init)
        paths = init
        delta = init
    else:
        paths = base
        delta = base
    # checkpoint generations currently referenced by the lazy `paths`
    # union (deltas since the last compaction + the last compaction)
    union_ids: set = set()
    rounds_since_compact = 0
    for _ in range(max_iterations):
        grown = (
            delta.alias("d")
            .join(base.alias("e"), F.col("d.dst") == F.col("e.src"))
            .select(F.col("d.src").alias("src"), F.col("e.dst").alias("dst"))
            .distinct()
        )
        # Semi-naive delta: only genuinely new pairs feed the next round.
        # Anti-join, not exceptAll: both sides are already distinct, and a
        # hash anti-join beats exceptAll's sort-based set difference.
        # eqNullSafe keys: correct for struct-typed node ids with null
        # fields, and generates no IsNotNull constraints (plain equi-keys
        # trip Catalyst's Union constraint rewrite on checkpointed plans).
        new_delta, new_delta_ids = tr.checkpoint(
            grown.alias("g").join(
                paths.alias("p"),
                F.col("g.src").eqNullSafe(F.col("p.src"))
                & F.col("g.dst").eqNullSafe(F.col("p.dst")),
                "left_anti",
            )
        )
        if new_delta.isEmpty():
            tr.free(new_delta_ids)  # dead end: nothing references it
            break
        # The accumulated path set stays a lazy union of the (already
        # checkpointed) deltas — materializing the whole union again every
        # round cost O(rounds × |paths|) extra work (~20% of the operator
        # at bench scale). Only every 8th round compacts the union with a
        # checkpoint so plan depth stays bounded on deep graphs.
        # dropDuplicates on the delta is a semantic no-op (the delta is
        # distinct by construction) but inserts an Aggregate that
        # regenerates plan constraints — without it, Catalyst's Union
        # constraint rewrite hits a stale-attribute lookup
        # (NoSuchElementException: key not found) when a later round
        # checkpoints a struct-keyed anti-join against this union.
        paths = paths.unionByName(new_delta.dropDuplicates())
        union_ids |= new_delta_ids
        rounds_since_compact += 1
        if rounds_since_compact >= 8:
            paths, compact_ids = tr.checkpoint(paths)
            # every generation the compacted union subsumed is now garbage
            # — except the current delta, which still feeds the next round
            tr.free(union_ids - new_delta_ids)
            union_ids = compact_ids | new_delta_ids
            rounds_since_compact = 0
        delta = new_delta
    return paths


def reflexive_transitive_closure(
    edges: DataFrame,
    nodes: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "id",
) -> DataFrame:
    """SPARQL ``p*``: closure plus (n, n) for every node in scope."""
    plus = transitive_closure(edges, src, dst)
    self_pairs = nodes.select(
        F.col(node_col).alias("src"), F.col(node_col).alias("dst")
    ).distinct()
    return plus.unionByName(self_pairs).distinct()


_PR_UNIT = 10**9  # rank 1.0 == 1e9 nano-units


def _pagerank_setup(edges: DataFrame, src: str, dst: str, damping: float):
    """Shared scaffolding for both PageRank entry points: checkpointed
    edge/node frames, out-degrees, and the damping constant as an exact
    integer fraction (see pagerank's fixed-point rationale)."""
    from fractions import Fraction

    frac = Fraction(str(damping)).limit_denominator(10**6)
    d_num, d_den = frac.numerator, frac.denominator
    tr = CheckpointTracker(edges)
    e, e_ids = tr.checkpoint(
        edges.select(F.col(src).alias("e_src"), F.col(dst).alias("e_dst"))
    )
    nodes, node_ids = tr.checkpoint(
        e.select(F.col("e_src").alias("id"))
        .unionByName(e.select(F.col("e_dst").alias("id")))
        .distinct()
    )
    degrees = e.groupBy(F.col("e_src").alias("id")).agg(
        F.count("*").alias("out_deg")
    )
    return tr, e, e_ids, nodes, node_ids, degrees, d_num, d_den


def _pagerank_round(tr, e, nodes, degrees, ranks, d_num: int, d_den: int,
                    src_flag: DataFrame | None = None,
                    with_delta: bool = False):
    """One power iteration: one groupBy(dst) shuffle of integer
    contributions, damping applied as an exact integer fraction.
    ``src_flag`` (personalized variant) restricts the teleport base to
    the flagged source nodes — everyone else receives only damped
    in-flow.

    ``with_delta`` (the convergence probe, round 12): the per-node
    |new - old| rides as a ``_delta`` column and the round output is
    localCheckpointed LAZILY — the caller's single max-aggregate action
    both materializes the checkpoint blocks and returns the convergence
    delta, one job per round instead of checkpoint + a separate
    join-against-previous probe job. Rank values are bit-identical
    either way (the extra id-equijoin only attaches the old rank)."""
    base_units = (_PR_UNIT * (d_den - d_num)) // d_den
    contribs = (
        e.join(ranks, e.e_src == ranks.id)
        .join(degrees, "id")
        .select(
            F.col("e_dst").alias("id"),
            F.expr("rank div out_deg").alias("c"),
        )
    )
    summed = contribs.groupBy("id").agg(
        F.sum(F.col("c").cast("decimal(38,0)")).alias("in_sum")
    )
    joined = nodes.join(summed, "id", "left")
    if src_flag is None:
        base = F.lit(base_units).cast("decimal(38,0)")
    else:
        joined = joined.join(
            src_flag.withColumn("_is_src", F.lit(1)), "id", "left"
        )
        base = F.when(
            F.col("_is_src").isNotNull(), F.lit(base_units)
        ).otherwise(F.lit(0)).cast("decimal(38,0)")
    new_rank = (
        base
        + F.expr(
            f"(cast({d_num} as decimal(38,0)) *"
            f" coalesce(in_sum, cast(0 as decimal(38,0))))"
            f" div {d_den}"
        ).cast("decimal(38,0)")
    ).cast("long")
    if not with_delta:
        return tr.checkpoint(joined.select("id", new_rank.alias("rank")))
    # every node is present in `ranks` (both derive from `nodes`), so the
    # left join never produces a null _prev / null _delta
    out = (
        joined.join(
            ranks.select("id", F.col("rank").alias("_prev")), "id", "left"
        )
        .select(
            "id", new_rank.alias("rank"),
            F.abs(new_rank - F.col("_prev")).alias("_delta"),
        )
        .localCheckpoint(eager=False)
    )
    return out, CheckpointTracker._owned_ids(out)


def _pagerank_result(ranks: DataFrame) -> DataFrame:
    return ranks.select(
        "id",
        (F.col("rank").cast("double") / F.lit(float(_PR_UNIT))).alias("rank"),
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 2,
    damping: float = 0.85,
) -> DataFrame:
    """Power-iteration PageRank → (id, rank), GraphX-style but pure
    DataFrame: per round one groupBy(dst) shuffle of contributions; the
    out-degree side is computed once and re-joined (broadcast when small).
    Dangling mass follows the common simplification of redistributing only
    through the damping constant. Fixed iteration count keeps the result
    deterministic (and SQL-oracle-expressible); the rank pipeline is pure
    FIXED-POINT INTEGER arithmetic — ranks in nano-units (1e9 per unit of
    rank), contributions via truncating integer division, damping applied
    as (d_num * sum) div d_den — because both double-rounding and
    double→decimal casts are tie-sensitive across engines (1-ulp oracle
    drifts surfaced at sf1 in both variants); integer ops are bit-exact
    everywhere. Sums ride in decimal(38,0) so ~1e11-node graphs can't
    overflow the 64-bit range mid-aggregate. Only the returned column
    converts to double (exact: nano-unit counts < 2^53)."""
    tr, e, e_ids, nodes, node_ids, degrees, d_num, d_den = _pagerank_setup(
        edges, src, dst, damping
    )
    ranks = nodes.select("id", F.lit(_PR_UNIT).cast("long").alias("rank"))
    rank_ids: set = set()
    for _ in range(iterations):
        ranks, new_rank_ids = _pagerank_round(
            tr, e, nodes, degrees, ranks, d_num, d_den
        )
        tr.free(rank_ids)  # previous generation fully superseded
        rank_ids = new_rank_ids
    if rank_ids:
        # final ranks are materialized: the edge/node scaffolding is garbage
        tr.free(e_ids | node_ids)
    return _pagerank_result(ranks)


def pagerank_converged(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 20,
) -> tuple[DataFrame, int]:
    """Production PageRank (VERDICT r5 task 7): iterate until the largest
    per-node rank change drops below ``tol`` (in rank units) or
    ``max_iter`` rounds, whichever first. Returns (ranks, rounds_run).

    Same fixed-point integer pipeline and one-shuffle round as
    `pagerank`, so at any stopping point the ranks are bit-identical to
    the fixed-iteration twin at the same round count. The convergence
    probe is one max-aggregate per round — a single scalar to the driver,
    O(1) driver traffic per round like the BFS frontier probe
    (graph/paths.py). Old rank generations are freed as soon as the delta
    that references them is computed."""
    tol_units = max(int(tol * _PR_UNIT), 1)
    tr, e, e_ids, nodes, node_ids, degrees, d_num, d_den = _pagerank_setup(
        edges, src, dst, damping
    )
    ranks = nodes.select("id", F.lit(_PR_UNIT).cast("long").alias("rank"))
    rank_ids: set = set()
    rounds = 0
    for _ in range(max_iter):
        # fused round+probe (round 12): one action materializes the round's
        # lazy checkpoint AND returns max|Δrank| — was checkpoint job +
        # join-probe job per round
        new_ranks, new_rank_ids = _pagerank_round(
            tr, e, nodes, degrees, ranks, d_num, d_den, with_delta=True
        )
        rounds += 1
        delta_row = new_ranks.agg(F.max("_delta").alias("d")).collect()
        delta = delta_row[0]["d"] if delta_row else None
        tr.free(rank_ids)
        ranks, rank_ids = new_ranks.select("id", "rank"), new_rank_ids
        if delta is None or delta < tol_units:
            break
    if rank_ids:
        tr.free(e_ids | node_ids)
    return _pagerank_result(ranks), rounds


def personalized_pagerank(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 2,
    damping: float = 0.85,
) -> DataFrame:
    """Personalized PageRank → (id, rank): teleportation returns mass
    only to ``sources`` (a DataFrame with an ``id`` column) instead of to
    all nodes. Contract (deliberately UNNORMALIZED over the source set):
    every source starts at rank 1.0 and receives the full (1-d) teleport
    base each round, so total mass scales with |sources| — each source
    contributes a unit personalization vector, and the result equals the
    sum of per-source personalized ranks (GraphX instead normalizes the
    teleport vector to sum 1 over the set; divide by |sources| to match
    it). Everyone else keeps pure damped in-flow, so mass concentrates in
    the sources' forward neighborhoods. Same fixed-point integer pipeline
    and one-shuffle round as `pagerank` (bit-exact across engines); the
    source set rides as one checkpointed semi-join side — broadcast when
    small, exactly the 100 TB shape (seed sets are tiny relative to the
    graph)."""
    tr, e, e_ids, nodes, node_ids, degrees, d_num, d_den = _pagerank_setup(
        edges, src, dst, damping
    )
    srcs, srcs_ids = tr.checkpoint(
        nodes.join(sources.select("id").distinct(), "id", "semi")
    )
    ranks = (
        nodes.join(srcs.withColumn("_s", F.lit(1)), "id", "left")
        .select(
            "id",
            F.when(F.col("_s").isNotNull(), F.lit(_PR_UNIT))
            .otherwise(F.lit(0)).cast("long").alias("rank"),
        )
    )
    rank_ids: set = set()
    for _ in range(iterations):
        ranks, new_rank_ids = _pagerank_round(
            tr, e, nodes, degrees, ranks, d_num, d_den, src_flag=srcs
        )
        tr.free(rank_ids)
        rank_ids = new_rank_ids
    if rank_ids:
        tr.free(e_ids | node_ids | srcs_ids)
    return _pagerank_result(ranks)


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 50,
) -> DataFrame:
    """Undirected connected components → (id, component) with component =
    min member id. Used for owl:sameAs equivalence classes (SURVEY §2.8).

    Min-label propagation **with pointer doubling**: each round every node
    first adopts the smallest label among itself and its neighbours, then
    shortcuts through its label's own label (``component :=
    component[component]``). The doubling step compresses label-chains
    geometrically, so a path graph of diameter d converges in O(log d)
    rounds — plain propagation alone needs d rounds, which silently
    truncates on long near-dup chains. Each round is two shuffles (one
    neighbour groupBy, one label-to-label join), both keyed on node id.

    Raises ``RuntimeError`` if ``max_iterations`` rounds pass without
    reaching a fixpoint, rather than returning silently wrong labels.
    """
    tr = CheckpointTracker(edges)
    sym, sym_ids = tr.checkpoint(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    labels, label_ids = tr.checkpoint(
        sym.select(F.col("a").alias("id"))
        .distinct()
        .select(F.col("id"), F.col("id").alias("component"))
    )
    converged = False
    for _ in range(max_iterations):
        # Step 1: candidate label for each node = min over neighbours'
        # labels (and its own).
        neighbour_min = (
            sym.join(labels, sym.b == labels.id)
            .groupBy(F.col("a").alias("id"))
            .agg(F.min("component").alias("nbr_component"))
        )
        cand = labels.join(neighbour_min, "id", "left").select(
            "id",
            F.least(
                F.col("component"),
                F.coalesce(F.col("nbr_component"), F.col("component")),
            ).alias("component"),
        )
        # Step 2: pointer doubling — follow the candidate label to ITS
        # label. Labels only ever decrease toward the component minimum,
        # so the composition is still an upper bound on the true minimum
        # and strictly accelerates chains.
        hop = labels.select(
            F.col("id").alias("h_id"), F.col("component").alias("h_component")
        )
        new_comp = F.least(
            F.col("component"), F.coalesce(F.col("h_component"), F.col("component"))
        )
        # The convergence flag rides along into the checkpoint, so the
        # stability test is a scan of the materialized result — no second
        # join-against-previous-labels job per round. `moved` compares the
        # doubled label against the label at the START of the round.
        prev = labels.select(
            F.col("id"), F.col("component").alias("prev_component")
        )
        updated, new_label_ids = tr.checkpoint(
            cand.join(hop, cand.component == F.col("h_id"), "left")
            .join(prev, "id")
            .select(
                "id",
                new_comp.alias("component"),
                (new_comp < F.col("prev_component")).alias("moved"),
            )
        )
        tr.free(label_ids)  # previous label generation fully superseded
        label_ids = new_label_ids
        stable = updated.filter(F.col("moved")).isEmpty()
        labels = updated.select("id", "component")
        if stable:
            converged = True
            break
    if converged:
        tr.free(sym_ids)  # final labels are materialized; edges scaffold dead
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge within {max_iterations} "
            "rounds; the component graph is deeper than the iteration "
            "budget — raise max_iterations"
        )
    return labels


def bfs_hops(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 50,
) -> DataFrame:
    """Multi-source BFS levels → (id, hops): the minimum edge count from
    any source node, following edges src→dst (pass a symmetrized edge set
    for undirected graphs). GraphX/Pregel ``shortestPaths`` shape as a
    semi-naive frontier loop: each round expands ONLY the previous
    frontier (one keyed join), anti-joins the visited set, and
    checkpoints just the new delta — the accumulated level table stays a
    lazy union of already-materialized blocks, so round cost is
    O(|frontier| ⋈ edges), not O(|visited|). Rounds = eccentricity of the
    source set, with ``max_iterations`` as the runaway guard (raises,
    never truncates silently).
    """
    tr = CheckpointTracker(edges)
    e, _ = tr.checkpoint(
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).distinct()
    )
    frontier, _ = tr.checkpoint(
        sources.select(F.col(sources.columns[0]).alias("id")).distinct()
    )
    levels = [frontier.select("id", F.lit(0).cast("long").alias("hops"))]
    visited = levels[0]
    for d in range(1, max_iterations + 1):
        nxt, nxt_ids = tr.checkpoint(
            e.join(frontier, e.u == frontier.id)
            .select(F.col("v").alias("id"))
            .distinct()
            .join(visited, "id", "left_anti")
        )
        if nxt.isEmpty():
            tr.free(nxt_ids)  # dead end: nothing references it
            return visited
        frontier = nxt
        levels.append(nxt.select("id", F.lit(d).cast("long").alias("hops")))
        visited = levels[0]
        for lvl in levels[1:]:
            visited = visited.unionByName(lvl)
    raise RuntimeError(
        f"bfs_hops did not exhaust the graph within {max_iterations} "
        "rounds; eccentricity exceeds the iteration budget — raise "
        "max_iterations"
    )


def sssp(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    max_iterations: int = 50,
) -> DataFrame:
    """Weighted single-source(s) shortest paths → (id, dist): minimum
    total edge weight from any source, non-negative INTEGER weights
    (bit-exact across engines, same rationale as PageRank's fixed-point
    arithmetic). Bellman-Ford as a semi-naive frontier relaxation —
    GraphX/Pregel ``shortestPaths`` generalized to weights:

    each round relaxes ONLY the vertices improved last round (one keyed
    join frontier⋈edges + one min-aggregate), joins candidate distances
    against the current bests, and keeps the strict improvements as the
    next frontier. Round count is bounded by the longest shortest-path
    edge count (the graph's weighted "depth"), each round is one shuffle
    on dst, and the frontier-only expansion keeps round cost
    O(|frontier| ⋈ edges) — identical scale shape to ``bfs_hops``. The
    empty-frontier probe is the only per-round driver traffic. Raises at
    ``max_iterations`` rather than returning silently-unconverged
    distances (negative cycles cannot occur: weights are non-negative).
    """
    tr = CheckpointTracker(edges)
    e, _ = tr.checkpoint(
        edges.select(
            F.col(src).alias("u"), F.col(dst).alias("v"),
            F.col(weight).cast("long").alias("w"),
        )
    )
    dists, dist_ids = tr.checkpoint(
        sources.select(F.col(sources.columns[0]).alias("id"))
        .distinct()
        .select("id", F.lit(0).cast("long").alias("dist"))
    )
    frontier = dists
    for _ in range(max_iterations):
        candidates = (
            e.join(frontier, e.u == frontier.id)
            .groupBy(F.col("v").alias("cid"))
            .agg(F.min(F.col("dist") + F.col("w")).alias("cand"))
        )
        joined = candidates.join(
            dists, candidates.cid == dists.id, "left"
        )
        improved, imp_ids = tr.checkpoint(
            joined.filter(
                F.col("dist").isNull() | (F.col("cand") < F.col("dist"))
            ).select(F.col("cid").alias("id"), F.col("cand").alias("dist"))
        )
        if improved.isEmpty():
            tr.free(imp_ids)
            return dists
        new_dists, new_ids = tr.checkpoint(
            dists.join(improved.select("id"), "id", "left_anti")
            .unionByName(improved)
        )
        tr.free(dist_ids)
        dists, dist_ids = new_dists, new_ids
        frontier = improved
    raise RuntimeError(
        f"sssp did not converge within {max_iterations} rounds — raise "
        "max_iterations (longest shortest path exceeds the budget)"
    )


def triangle_vertex_counts(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Per-vertex triangle participation → (id, n_triangles), undirected.

    Degree-oriented enumeration (the MapReduce "node-iterator++" scheme):
    every edge is directed from its lower-(degree, id) endpoint to the
    higher one, wedges are generated only at each edge's *apex* (the
    lowest-ordered vertex of the triangle), and each wedge is closed by an
    equi-join against the canonical edge set. The orientation bounds each
    vertex's out-degree by O(sqrt(|E|)), so the wedge intermediate is
    O(|E|^1.5) worst-case instead of sum-of-squares-of-degrees — the
    property that keeps hub vertices from exploding the join at 100 TB.
    Every triangle is emitted exactly once, then exploded to its three
    vertices for the per-vertex count (one final groupBy(id) shuffle).
    """
    canon = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        canon.select(F.col("u").alias("id"))
        .unionByName(canon.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    du = deg.select(F.col("id").alias("u"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("id").alias("v"), F.col("deg").alias("deg_v"))
    with_deg = canon.join(du, "u").join(dv, "v")
    lower_first = (F.col("deg_u") < F.col("deg_v")) | (
        (F.col("deg_u") == F.col("deg_v")) & (F.col("u") < F.col("v"))
    )
    oriented = with_deg.select(
        F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("b"),
    )
    # Wedges at the apex: two out-edges of the same (low-ordered) vertex.
    o1 = oriented.select(F.col("a"), F.col("b").alias("x"))
    o2 = oriented.select(F.col("a"), F.col("b").alias("y"))
    wedges = o1.join(o2, "a").filter(F.col("x") < F.col("y"))
    closed = wedges.join(
        canon,
        (F.least(F.col("x"), F.col("y")) == F.col("u"))
        & (F.greatest(F.col("x"), F.col("y")) == F.col("v")),
    ).select("a", "x", "y")
    verts = closed.select(
        F.explode(F.array(F.col("a"), F.col("x"), F.col("y"))).alias("id")
    )
    return verts.groupBy("id").agg(F.count("*").alias("n_triangles"))


def hits_scores(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 2,
) -> DataFrame:
    """HITS hubs/authorities → (id, hub, authority), UNNORMALIZED with a
    fixed iteration count — the same determinism contract as `pagerank`:
    starting from hub = 1, every round is two aggregate-message shuffles
    (authority(v) = Σ hub over in-edges, then hub(u) = Σ authority over
    out-edges) in pure integer arithmetic, so results are bit-identical
    across engines and partitionings — no float normalization step whose
    rounding could drift. Sums ride in decimal(38,0) (two iterations
    multiply magnitudes by at most |E|² — far outside long-overflow
    territory at 100 TB edge counts if left at 64-bit). GraphX exposes
    the same shape via aggregateMessages; the normalized variant is one
    extra scalar divide at read time."""
    # e and nodes are referenced 2x per round: materialize once so each
    # round's plan is two join+agg shuffles over a checkpointed edge set,
    # not a re-expansion of the whole upstream subtree per reference
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    hub = nodes.select("id", F.lit(1).cast("decimal(38,0)").alias("hub"))
    auth = None
    zero = F.lit(0).cast("decimal(38,0)")
    # each round's authority table feeds BOTH the hub half-round and
    # (on the last round) the final hub⋈auth join, and each hub table
    # feeds the next round's authority — checkpoint the intermediate
    # generations so the plan stays one join+agg chain per half-round
    # instead of re-expanding every prior round per reference. The last
    # hub half-round stays a live plan (plan-contract visibility).
    tr = CheckpointTracker(edges)
    gen_ids: set = set()
    for it in range(iterations):
        auth_in = (
            e.join(hub.withColumnRenamed("id", "src"), "src")
            .groupBy("dst")
            .agg(F.sum("hub").alias("authority"))
            .withColumnRenamed("dst", "id")
        )
        auth, auth_ids = tr.checkpoint(
            nodes.join(auth_in, "id", "left").select(
                "id", F.coalesce(F.col("authority"), zero).alias("authority")
            )
        )
        tr.free(gen_ids)
        gen_ids = auth_ids
        hub_out = (
            e.join(auth.withColumnRenamed("id", "dst"), "dst")
            .groupBy("src")
            .agg(F.sum("authority").alias("hub"))
            .withColumnRenamed("src", "id")
        )
        hub = nodes.join(hub_out, "id", "left").select(
            "id", F.coalesce(F.col("hub"), zero).alias("hub")
        )
        if it < iterations - 1:
            hub, hub_ids = tr.checkpoint(hub)
            # auth of a non-final round is referenced only by this hub —
            # wait to free it until the hub generation is materialized
            tr.free(gen_ids)
            gen_ids = hub_ids
    return (
        hub.join(auth, "id")
        .select(
            "id",
            F.col("hub").cast("bigint").alias("hub"),
            F.col("authority").cast("bigint").alias("authority"),
        )
    )


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
) -> DataFrame:
    """Synchronous label propagation (community detection) → (id, label).

    GraphX's LabelPropagation with a DETERMINISTIC tie-break: every node
    starts labeled with its own id; each round it adopts the most
    frequent label among its (undirected) neighbors, ties resolved to the
    SMALLEST label — so a fixed iteration count gives bit-identical
    results across engines and partitionings (GraphX's own tie-break is
    hash-order dependent; an oracle can't reproduce that). Isolated nodes
    keep their label. Per round: one neighbor-label join, one
    (node, label) count aggregation, and a per-node argmax window — all
    partitioned by the same node key, so the round is effectively two
    exchanges at scale."""
    from pyspark.sql import Window

    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(
            F.col("a").isNotNull() & F.col("b").isNotNull()
            & (F.col("a") != F.col("b"))
        )
        .distinct()
    )
    und = (
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = und.select(F.col("a").alias("id")).distinct() \
        .localCheckpoint(eager=True)
    labels = nodes.select("id", F.col("id").alias("label"))
    w = Window.partitionBy("id").orderBy(
        F.col("n").desc(), F.col("label").asc()
    )
    # each round references `labels` twice (the neighbor join and the
    # keep-old-label fallback), so an uncheckpointed loop doubles the
    # plan per iteration — 2^r subtree copies by round r. Checkpoint
    # every generation that feeds another round and free its
    # predecessor (pagerank's rank-table lifecycle); the FINAL round
    # stays a live plan so callers see the round's real shape.
    tr = CheckpointTracker(edges)
    label_ids: set = set()
    for r in range(iterations):
        neigh = (
            und.join(
                labels.withColumnRenamed("id", "b"), "b"
            )
            .select(F.col("a").alias("id"), "label")
        )
        best = (
            neigh.groupBy("id", "label").agg(F.count("*").alias("n"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("id", F.col("label").alias("new_label"))
        )
        round_out = (
            nodes.join(best, "id", "left")
            .join(labels, "id")
            .select(
                "id",
                F.coalesce(F.col("new_label"), F.col("label")).alias("label"),
            )
        )
        if r < iterations - 1:
            new_labels, new_ids = tr.checkpoint(round_out)
            tr.free(label_ids)
            labels, label_ids = new_labels, new_ids
        else:
            labels = round_out
    return labels


def k_core(
    edges: DataFrame,
    k: int,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Bounded k-core peeling → (id, degree) for nodes still alive after
    ``rounds`` synchronous peels, with their degree in the alive-induced
    subgraph.

    Classic k-core iterates peeling to a fixpoint; a FIXED round count is
    the engine-portable contract (same rationale as `pagerank`/`hits`):
    an oracle can reproduce R unrolled rounds exactly, and R rounds of
    synchronous peeling equal the fixpoint whenever the peel converges
    that fast (the tests pin a graph where it does). Per round: restrict
    the undirected edge set to alive×alive (two semi-joins on the node
    key), one degree aggregation, one filter — a bounded chain of
    key-partitioned exchanges, no driver traffic at all."""
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(
            F.col("a").isNotNull() & F.col("b").isNotNull()
            & (F.col("a") != F.col("b"))
        )
        .distinct()
    )
    und = (
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    alive = und.select(F.col("a").alias("id")).distinct()
    deg = None
    for _ in range(rounds):
        live = und.join(
            alive.withColumnRenamed("id", "a"), "a", "semi"
        ).join(alive.withColumnRenamed("id", "b"), "b", "semi")
        deg = live.groupBy(F.col("a").alias("id")).agg(
            F.count("*").alias("degree")
        )
        alive = deg.filter(F.col("degree") >= k).select("id")
        # each round's alive set feeds TWO semi-joins next round and the
        # final degree pass: checkpoint so round r+1's plan doesn't
        # re-expand rounds 1..r twice over
        alive = alive.localCheckpoint(eager=True)
    final = (
        und.join(alive.withColumnRenamed("id", "a"), "a", "semi")
        .join(alive.withColumnRenamed("id", "b"), "b", "semi")
        .groupBy(F.col("a").alias("id"))
        .agg(F.count("*").cast("bigint").alias("degree"))
    )
    return final
