"""Structural decompositions: SCC, minimum spanning forest, maximal
independent set, greedy coloring, topological levels.

Beyond-reference operators (the reference library — io/kgraph/library/,
registry GraphAlgorithmType.java:33-116 — has no directed-component,
forest, or coloring algorithms): standard companions to the component
tier (components.py) that any GraphX/Gelly user of the reference would
expect. All are DataFrame recurrences on ChainLoop — equi-joins keyed on
vertex/component ids, map-side-combined min/max aggregation, one action
per round (chunked via paths._frontier_loop where rounds are cheap), no
driver-side materialization of graph data.

Scale notes (100 TB framing):
- SCC uses min-forward/min-backward labeling with label-class
  partitioning: each outer round peels every label-consistent SCC AND
  deletes all cross-class edges, so the remainder splits into classes
  that resolve concurrently — a condensation chain of any depth
  finishes in 2 outer rounds, and rounds stay near-logarithmic in
  practice. Propagation depth rides chunked frontier relaxation
  (8 lazy rounds per driver action); ``max_iterations`` raises on
  exhaustion instead of returning a partial answer.
- Boruvka halves the component count per round: O(log V) rounds, each a
  min_by partial agg per component plus a label merge (delegated to the
  pointer-jumped connected_components loop, itself O(log V)).
- Luby MIS decides an expected constant fraction of vertices per round:
  O(log V) expected rounds, deterministic via xxhash64 priorities.
- Topological levels are monotone max-relaxation with executor-side
  cycle detection (level >= |V| aborts with a certificate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_graphs_spark.graph import Graph
from kafka_graphs_spark.library._loop import (
    MAX_LONG,
    ChainLoop,
    eager_checkpoint,
    message_loop,
    free_df,
    sized_cache,
)
from kafka_graphs_spark.library.components import (
    _undirected_simple_edges,
    connected_components,
)
from kafka_graphs_spark.library.paths import _frontier_loop


def _min_step(state: DataFrame, edges: DataFrame) -> DataFrame:
    """One monotone relaxation round: changed vertices send their label
    along out-edges; receivers keep the min. Bellman-Ford-style frontier
    (an unchanged vertex's label was already delivered)."""
    frontier = state.filter(F.col("_changed")).select("id", "lbl")
    msgs = (
        frontier.join(edges, frontier["id"] == edges["src"])
        .select(F.col("dst").alias("id"), F.col("lbl").alias("m"))
        .groupBy("id")
        .agg(F.min("m").alias("m"))  # min combiner — map-side partial agg
    )
    return state.join(msgs, on="id", how="left").select(
        "id",
        F.least(F.col("lbl"), F.coalesce("m", F.col("lbl"))).alias("lbl"),
        (F.coalesce("m", F.lit(MAX_LONG)) < F.col("lbl")).alias("_changed"),
    )


def _propagate_min(loop: ChainLoop, vertices: DataFrame, edges: DataFrame,
                   max_iterations: int) -> DataFrame:
    """Fixpoint of label(v) = min(label(v), min over in-edges label(src)):
    the min vertex id over ancestors-and-self, i.e. min-label reachability
    ALONG edge direction. Rides paths._frontier_loop (chunked lazy rounds,
    one probe action per chunk), raising on round-budget exhaustion —
    SCC labels are only meaningful at the fixpoint."""
    init = vertices.select(
        "id", F.col("id").alias("lbl"), F.lit(True).alias("_changed")
    )
    state = _frontier_loop(
        loop, init, lambda s, _i: _min_step(s, edges), max_iterations,
        raise_label="scc min-label propagation",
    )
    return state.select("id", "lbl")


def strongly_connected_components(
    graph: Graph, max_iterations: int = 200, max_propagation_rounds: int = 10_000
) -> DataFrame:
    """(id, value = min vertex id in the strongly connected component).

    Min-forward/min-backward peeling with label-class partitioning
    (Orzan-style coloring): per outer round compute minF(v) = min id that
    REACHES v (min-label propagation along edges) and minB(v) = min id
    REACHABLE FROM v (propagation along reversed edges). minF(v) ==
    minB(v) == c certifies mutual reachability between v and c, so every
    such v is peeled with final label c. For the rest, any two vertices of
    one SCC share BOTH labels, so edges whose endpoints differ in either
    label can never be intra-SCC and are DELETED — the remainder splits
    into independent (minF, minB) classes that all resolve in parallel in
    later rounds. Each class contains its own min id, whose SCC becomes
    min-consistent next round, so every class strictly shrinks: a
    condensation chain of ANY depth finishes in 2 outer rounds (labels
    separate every level), and outer rounds stay near-logarithmic in
    practice rather than O(condensation depth). Labels agree with the
    batch-WCC convention of components.py (min member id).

    Everything is vertex-id equi-joins and min-combined aggregation; the
    only driver value per round is the ChainLoop probe row.
    """
    spark = graph.vertices.sparkSession
    active_v = graph.vertices.select("id")
    active_e = graph.edges.select("src", "dst").filter(
        F.col("src") != F.col("dst")
    ).distinct()
    result = None
    outer = 0
    while True:
        outer += 1
        if outer > max_iterations:
            raise RuntimeError(
                f"scc did not converge in {max_iterations} peel rounds"
            )
        e_cached, release_e = sized_cache(active_e)
        loop = message_loop(e_cached)
        fwd = None
        try:
            # detach fwd from the loop's 2-generation window: the backward
            # propagation runs more advances before fwd is read, and the
            # window would free fwd's checkpoint blocks under the join
            fwd = eager_checkpoint(
                _propagate_min(loop, active_v, e_cached, max_propagation_rounds)
            )
            rev = e_cached.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
            bwd = _propagate_min(loop, active_v, rev, max_propagation_rounds)
            both = fwd.join(
                bwd.select("id", F.col("lbl").alias("lbl_b")), on="id"
            )
            # one action: materialize decided + count the remainder
            decided, row = loop.advance(
                both.select(
                    "id", F.col("lbl").alias("value"), "lbl_b",
                    (F.col("lbl") == F.col("lbl_b")).alias("_done"),
                ),
                probes=[
                    F.sum(F.when(~F.col("_done"), 1).otherwise(0)).alias("left")
                ],
            )
            chunk = eager_checkpoint(
                decided.filter(F.col("_done")).select("id", "value")
            )
            result = chunk if result is None else result.unionByName(chunk)
            if not row["left"]:
                break
            undecided = decided.filter(~F.col("_done"))
            nxt_v = eager_checkpoint(undecided.select("id"))
            # keep only intra-class edges: endpoints of one SCC share both
            # labels, so a (minF, minB) mismatch can never be intra-SCC —
            # the classes then resolve independently (and in parallel)
            lbls = undecided.select("id", "value", "lbl_b")
            nxt_e = eager_checkpoint(
                e_cached.join(
                    lbls.select(
                        F.col("id").alias("src"),
                        F.col("value").alias("_sf"),
                        F.col("lbl_b").alias("_sb"),
                    ),
                    on="src",
                )
                .join(
                    lbls.select(
                        F.col("id").alias("dst"),
                        F.col("value").alias("_tf"),
                        F.col("lbl_b").alias("_tb"),
                    ),
                    on="dst",
                )
                .filter((F.col("_sf") == F.col("_tf")) & (F.col("_sb") == F.col("_tb")))
                .select("src", "dst")
            )
            # previous round's induced-subgraph frames are superseded
            if outer > 1:
                free_df(active_v)
                free_df(active_e)
            active_v, active_e = nxt_v, nxt_e
        finally:
            loop.release()
            release_e()
            if fwd is not None:
                free_df(fwd)
    if result is None:  # empty graph
        return spark.createDataFrame([], "id long, value long")
    return result.localCheckpoint(eager=True)


def _canonical_weighted_edges(edges: DataFrame) -> DataFrame:
    """Undirected simple weighted edge set oriented ascending, parallel
    edges collapsed to their min weight (deterministic): (a, b, weight)."""
    return (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            F.col("value").cast("double").alias("weight"),
        )
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.min("weight").alias("weight"))
    )


def minimum_spanning_forest(graph: Graph, max_iterations: int = 64) -> DataFrame:
    """Boruvka minimum spanning forest: (src, dst, weight), src < dst.

    Per round every component selects its minimum-weight outgoing edge
    (ties broken deterministically by (weight, src, dst), so the result is
    unique even with duplicate weights) and the selected edges contract
    the component labels. The component count at least halves per round →
    O(log V) rounds. Selection is a min_by partial agg keyed on component
    id; contraction reuses the pointer-jumped connected_components loop on
    the (tiny) selected-edge graph; the vertex→component map is refreshed
    by one equi-join. Parallel edges collapse to their min weight first
    (only a lighter parallel edge can be in the MSF).
    """
    spark = graph.vertices.sparkSession
    ew, release_ew = sized_cache(_canonical_weighted_edges(graph.edges))
    comp = graph.vertices.select("id", F.col("id").alias("comp"))
    msf = None
    loop = message_loop(ew)
    try:
        comp, _ = loop.advance(comp)
        rounds = 0
        while True:
            rounds += 1
            if rounds > max_iterations:
                raise RuntimeError(
                    f"minimum_spanning_forest did not converge in "
                    f"{max_iterations} Boruvka rounds"
                )
            labeled = (
                ew.join(
                    comp.select(F.col("id").alias("a"), F.col("comp").alias("ca")),
                    on="a",
                )
                .join(
                    comp.select(F.col("id").alias("b"), F.col("comp").alias("cb")),
                    on="b",
                )
                .filter(F.col("ca") != F.col("cb"))
            )
            # per-component min outgoing edge, deterministic tiebreak
            sides = labeled.select(
                F.col("ca").alias("c"), "a", "b", "weight", "ca", "cb"
            ).unionByName(
                labeled.select(
                    F.col("cb").alias("c"), "a", "b", "weight", "ca", "cb"
                )
            )
            sel = (
                sides.groupBy("c")
                .agg(
                    F.min_by(
                        F.struct("a", "b", "weight", "ca", "cb"),
                        F.struct("weight", "a", "b"),
                    ).alias("e")
                )
                .select("e.a", "e.b", "e.weight", "e.ca", "e.cb")
                .distinct()
            )
            sel, row = loop.advance(sel)
            if not row["_kgs_rows"]:
                break
            picked = sel.select(
                F.col("a").alias("src"), F.col("b").alias("dst"), "weight"
            ).localCheckpoint(eager=True)
            msf = picked if msf is None else msf.unionByName(picked)
            # contract: WCC over the selected component-level edges (≤ one
            # edge per component → tiny), then refresh the vertex→comp map
            comp_edges = sel.select(
                F.col("ca").alias("src"), F.col("cb").alias("dst"), F.lit(1).alias("value")
            )
            comp_ids = (
                comp_edges.select(F.col("src").alias("id"))
                .unionByName(comp_edges.select(F.col("dst").alias("id")))
                .distinct()
                .select("id", F.lit(0).alias("value"))
            )
            merged = connected_components(
                Graph(comp_ids, comp_edges), max_iterations=max_iterations
            )
            comp, _ = loop.advance(
                comp.join(
                    merged.select(F.col("id").alias("comp"), F.col("value").alias("_new")),
                    on="comp",
                    how="left",
                ).select("id", F.coalesce("_new", F.col("comp")).alias("comp"))
            )
    finally:
        loop.release()
        release_ew()
    if msf is None:
        return spark.createDataFrame([], "src long, dst long, weight double")
    return msf.localCheckpoint(eager=True)


def maximal_independent_set(
    graph: Graph, max_iterations: int = 100, seed: int = 42
) -> DataFrame:
    """Luby's maximal independent set: (id,) — the chosen vertices.

    Deterministic: per round r every undecided vertex draws priority
    xxhash64(id, seed, r); a vertex enters the MIS iff its (priority, id)
    pair is strictly smaller than every undecided neighbor's (the id
    component breaks hash collisions, so some vertex always wins and the
    loop provably progresses); its neighbors leave the pool. Expected
    O(log V) rounds; each round is one min-combined neighbor agg + one
    join, one ChainLoop action. Isolated vertices enter immediately.
    """
    und, release_und = sized_cache(_undirected_simple_edges(graph.edges))
    # status: 0 undecided / 1 in MIS / 2 excluded
    state = graph.vertices.select("id", F.lit(0).alias("status"))
    loop = message_loop(und)
    try:
        state, row = loop.advance(
            state,
            probes=[F.sum(F.when(F.col("status") == 0, 1).otherwise(0)).alias("u")],
        )
        rounds = 0
        while row["u"]:
            rounds += 1
            if rounds > max_iterations:
                raise RuntimeError(
                    f"maximal_independent_set did not converge in "
                    f"{max_iterations} rounds"
                )
            prio = state.select(
                "id",
                "status",
                F.xxhash64(F.col("id"), F.lit(seed), F.lit(rounds)).alias("p"),
            )
            undecided = prio.filter(F.col("status") == 0)
            # min undecided-neighbor (priority, id) per vertex
            nbr_min = (
                undecided.join(und, undecided["id"] == und["src"])
                .select(F.col("dst").alias("id"), F.struct("p", F.col("src").alias("i")).alias("np"))
                .groupBy("id")
                .agg(F.min("np").alias("np"))
            )
            winners = (
                undecided.join(nbr_min, on="id", how="left")
                .filter(
                    F.col("np").isNull()
                    | (F.struct(F.col("p"), F.col("id").alias("i")) < F.col("np"))
                )
                .select("id")
            )
            losers = (
                winners.join(und, winners["id"] == und["src"])
                .select(F.col("dst").alias("id"))
                .distinct()
            )
            updated = (
                state.join(winners.withColumn("_w", F.lit(1)), on="id", how="left")
                .join(losers.withColumn("_l", F.lit(1)), on="id", how="left")
                .select(
                    "id",
                    F.when(F.col("status") != 0, F.col("status"))
                    .when(F.col("_w").isNotNull(), F.lit(1))
                    .when(F.col("_l").isNotNull(), F.lit(2))
                    .otherwise(F.lit(0))
                    .alias("status"),
                )
            )
            state, row = loop.advance(
                updated,
                probes=[F.sum(F.when(F.col("status") == 0, 1).otherwise(0)).alias("u")],
            )
        out = state.filter(F.col("status") == 1).select("id").localCheckpoint(eager=True)
    finally:
        loop.release()
        release_und()
    return out


def greedy_coloring(
    graph: Graph, max_colors: int = 1000, seed: int = 42
) -> DataFrame:
    """(id, color) — proper coloring by iterated MIS peeling
    (Jones–Plassmann style): color c goes to a maximal independent set of
    the still-uncolored subgraph, which is then removed. Maximality gives
    the classic per-vertex bound color(v) <= degree(v) (a vertex skipped at
    color c' < c had a neighbor colored c'), hence <= Δ+1 colors overall —
    an SQL-checkable invariant. Deterministic via the MIS hash priorities
    (seeded per color so rounds are independent draws).
    """
    remaining = graph
    result = None
    color = 0
    while True:
        if not remaining.vertices.take(1):
            break
        if color >= max_colors:
            raise RuntimeError(
                f"greedy_coloring exceeded max_colors={max_colors}"
            )
        mis = maximal_independent_set(remaining, seed=seed + color)
        level = mis.select("id", F.lit(color).alias("color"))
        result = level if result is None else result.unionByName(level)
        color += 1
        keep = remaining.vertices.join(mis, on="id", how="left_anti").select("id")
        keep = keep.localCheckpoint(eager=True)
        edges = (
            remaining.edges.join(keep, remaining.edges["src"] == keep["id"], "left_semi")
            .join(keep, remaining.edges["dst"] == keep["id"], "left_semi")
            .localCheckpoint(eager=True)
        )
        remaining = Graph(keep.select("id", F.lit(0).alias("value")), edges)
    if result is None:
        spark = graph.vertices.sparkSession
        return spark.createDataFrame([], "id long, color int")
    return result.localCheckpoint(eager=True)


def topological_levels(graph: Graph, max_iterations: int = 10_000) -> DataFrame:
    """(id, level) — longest-path layering of a DAG: sources at level 0,
    every vertex one past its deepest predecessor (the scheduling /
    dependency-wave number).

    Beyond-reference operator. Monotone max-relaxation on the shared
    chunked frontier loop (paths._frontier_loop). Cycles make the
    recurrence diverge, so any level reaching |V| aborts with a cycle
    error — self-loops included (they relax themselves upward each round
    until the bound trips) — run :func:`strongly_connected_components`
    first if cyclicity is unknown.
    """
    n_vertices = graph.vertices.count()
    # keep self-loops: a self-loop IS a cycle and must trip the detector,
    # not be silently ignored
    edges, release_e = sized_cache(graph.edges.select("src", "dst").distinct())
    loop = message_loop(edges)
    try:
        init = graph.vertices.select(
            "id", F.lit(0).cast("long").alias("level"), F.lit(True).alias("_changed")
        )

        def step(state, _round):
            frontier = state.filter(F.col("_changed")).select("id", "level")
            msgs = (
                frontier.join(edges, frontier["id"] == edges["src"])
                .select(F.col("dst").alias("id"), (F.col("level") + 1).alias("m"))
                .groupBy("id")
                .agg(F.max("m").alias("m"))  # max combiner — map-side partial agg
            )
            return state.join(msgs, on="id", how="left").select(
                "id",
                F.greatest(F.col("level"), F.coalesce("m", F.col("level"))).alias("level"),
                (F.coalesce("m", F.lit(-1)) > F.col("level")).alias("_changed"),
            )

        def check(row):
            if row["max_level"] is not None and row["max_level"] >= n_vertices:
                raise ValueError(
                    "topological_levels: level reached the vertex count "
                    f"({n_vertices}) — the graph contains a cycle"
                )

        state = _frontier_loop(
            loop, init, step, max_iterations,
            extra_probes=[F.max("level").alias("max_level")],
            probe_check=check,
            raise_label="topological_levels",
        )
        return state.select("id", "level").localCheckpoint(eager=True)
    finally:
        loop.release()
        release_e()
