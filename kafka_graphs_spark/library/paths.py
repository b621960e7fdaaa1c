"""Shortest-path family: BFS, SSSP, MSSP.

Reference compute functions:
- io/kgraph/library/BreadthFirstSearch.java:33-73
- io/kgraph/library/SingleSourceShortestPaths.java:30-68
- io/kgraph/library/MultipleSourceShortestPaths.java:32-75

Spark re-expression: frontier-based relaxation loops. The per-superstep
message exchange becomes ``frontier ⋈ edges → groupBy(dst).min`` — the min
combiner is a partial aggregation, so hub vertices (skew) are combined
map-side before the shuffle.

Scale mechanics shared by all three:
- the edges projection is persisted once (otherwise every iteration
  re-reads the source and recomputes any derivation under it);
- iteration rides ``ChainLoop``: each round is ONE Spark action — the agg
  that materializes the new generation's cache doubles as the termination
  probe (count of relaxed vertices) — with periodic localCheckpoint
  lineage truncation (see _loop.ChainLoop for the scale rationale).

MSSP runs ALL landmarks in one loop by normalizing the reference's
``Map<landmark,double>`` vertex value into (id, landmark, dist) rows — one
Spark job relaxes every landmark at once; the map is reassembled at the end.
"""

from __future__ import annotations

import os
from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_graphs_spark.graph import Graph
from kafka_graphs_spark.library._loop import (
    INF,
    MAX_LONG,
    ChainLoop,
    message_loop,
    prunable_source,
    sized_cache,
)

# NULL-means-unchanged contract for sparse loop state (ADVICE r13): in
# the full-outer merges below, a state row that receives NO message this
# round gets _changed = NULL (the comparison against a null message is
# null), not False. Both consumers honor it — the frontier filter
# (F.col("_changed")) keeps only TRUE rows, and _n_changed counts
# NULL as 0 via otherwise(0). Any new consumer must NOT use ~_changed
# or _changed == False.
#
# Graph invariant the sparse merges assume (also ADVICE r13): every edge
# endpoint appears in graph.vertices (Graph.from_edges derives vertices
# FROM the endpoints, so graphs built that way satisfy it by
# construction). A hand-built Graph whose edges mention ids absent from
# its vertex table lets those ids enter loop state and relay messages;
# the final densify join then drops them from the output, but distances
# that flowed THROUGH them are kept — the same behavior the whole
# bfs/sssp family has shared since the r13 sparse-state change.


def _n_changed():
    # built lazily: Column construction needs an active SparkContext
    return F.sum(F.when(F.col("_changed"), 1).otherwise(0)).alias("n_changed")


# Rounds per driver probe. Each chained round is a ChainLoop.chain leaf
# (bounded plan); the probe action materializes the whole chunk in ONE
# job, cutting driver round-trips ~CHUNK× on long-diameter graphs. Cost:
# up to CHUNK−1 empty tail rounds after the frontier dies (no-op scans)
# and a ≤2^CHUNK stats-estimate growth between measured probes — both
# cheap at 8 (see ChainLoop.chain).
_CHUNK = 8

# Frontier size at or below which a round runs in LITERAL mode (r14,
# guide §3/§6): the frontier's (id, value) rows are inlined into the
# plan as literals, so the round is a FILTERED SCAN of the edge source
# (src IN (...) — pushed to parquet / bucket-pruned on bucketed tables,
# batch-pruned on cached frames) plus the usual min-combine and state
# merge, with NO join and NO broadcast. A broadcast join already
# collects the frontier to the driver every round — literal mode
# collects the same ≤_LITERAL_MAX rows and skips shipping them back.
# Kept well under the parquet In-pushdown conversion threshold's useful
# range and small enough that the per-round plan stays tiny.
_LITERAL_MAX = 64

# Edge count below which literal mode is NOT worth it: a literal round
# costs one extra driver action (the bounded frontier collect) to avoid
# one full O(|E|) edge scan; when the whole edge set scans in less than
# a job launch, the r13 chunked path (8 rounds per driver action) wins.
# Measured crossover on this box: at |E| = 1e5 (sf0.1) literal rounds
# run at par-to-slightly-slower in quiet phases; at |E| = 5e6 (sf5.0)
# they win multiples (BASELINE r14). Scale-dependent, so env-overridable
# (KGS_LITERAL_MIN_EDGES); at 100 TB every graph clears any plausible
# setting.
_LITERAL_MIN_EDGES = int(os.environ.get("KGS_LITERAL_MIN_EDGES", "1000000"))


def _frontier_loop(loop: "ChainLoop", state, step, max_iterations: int,
                   extra_probes=(), probe_check=None, raise_label=None,
                   literal_step=None, literal_max: int = _LITERAL_MAX):
    """Drive a frontier-relaxation loop with chunked termination probes.

    ``step(state, round_no)`` builds ONE lazy round from a leaf frame.
    Rounds within a chunk are chained through ``loop.chain`` leaves; the
    chunk-ending ``loop.advance`` materializes them all in one action and
    reports whether the LAST round changed anything — if the frontier died
    mid-chunk the remaining rounds are no-ops and the probe reads 0.

    ``extra_probes`` ride the same probe action; ``probe_check(row)`` runs
    per probe (raise inside it to abort, e.g. cycle detection); a
    ``raise_label`` turns round-budget exhaustion into a RuntimeError
    instead of returning the non-converged state (for callers whose
    result is only meaningful at the fixpoint).

    ``literal_step(state, frontier_rows, round_no)`` (optional) builds
    one round from the COLLECTED frontier instead of a join — used
    whenever the live frontier has ≤ ``literal_max`` rows (known from
    the previous probe's ``n_changed``, re-checked by a bounded
    ``limit(k+1).collect()`` on the cached state). Single-source
    traversals spend most rounds far under the threshold (a BFS frontier
    starts at 1), and each such round then prunes the edge scan instead
    of scanning everything; hub rounds fall back to the chunked join
    path automatically. Semantics are unchanged: each literal round is
    exactly one relaxation round.
    """
    state, _ = loop.advance(state)
    it = 0
    try_literal = literal_step is not None
    while it < max_iterations:
        if try_literal:
            rows = (
                state.filter(F.col("_changed")).select("id", "value")
                .limit(literal_max + 1).collect()
            )
            if not rows:
                return state
            if len(rows) <= literal_max:
                it += 1
                state, row = loop.advance(
                    literal_step(state, rows, it),
                    probes=[_n_changed(), *extra_probes],
                )
                if probe_check is not None:
                    probe_check(row)
                if not row["n_changed"]:
                    return state
                try_literal = row["n_changed"] <= literal_max
                continue
            try_literal = False
        n = min(_CHUNK, max_iterations - it)
        for _ in range(n - 1):
            it += 1
            state = loop.chain(step(state, it))
        it += 1
        state, row = loop.advance(
            step(state, it), probes=[_n_changed(), *extra_probes]
        )
        if probe_check is not None:
            probe_check(row)
        if not row["n_changed"]:
            return state
        try_literal = (
            literal_step is not None and row["n_changed"] <= literal_max
        )
    if raise_label is not None:
        raise RuntimeError(
            f"{raise_label} did not converge in {max_iterations} rounds"
        )
    return state


def bfs(graph: Graph, src_vertex_id, max_iterations: int = 50) -> DataFrame:
    """Hop count from ``src_vertex_id``; unvisited = Long.MAX_VALUE.

    Reference: BreadthFirstSearch.java:33-73 — superstep n labels the
    frontier with n; messages only carry activation. Returns (id, value).

    SPARSE loop state (r13, the mssp pattern): only REACHED vertices
    carry a row through the rounds, so the per-round merge shuffles
    O(|reached|) instead of O(|V|) — on a 100 TB graph a BFS that
    touches one component must not rewrite a billion-row state every
    superstep. Unvisited vertices join back as MAX_LONG in ONE densify
    pass at the end.
    """
    raw_edges = graph.edges.select("src", "dst")
    edges, release_edges = sized_cache(raw_edges)
    # literal rounds filter the UN-projected source FIRST when its plan
    # is storage-only (see sssp) — the filter reaches the parquet scan
    lit_base = prunable_source(graph.edges)

    def lit_scan(cond):
        if lit_base is not None:
            return lit_base.filter(cond).select("src", "dst")
        return edges.filter(cond)
    state = (
        graph.vertices.filter(F.col("id") == src_vertex_id)
        .select(
            "id",
            F.lit(0).cast("long").alias("value"),
            F.lit(True).alias("_changed"),
        )
    )

    def merge(state, reached, hop):
        # full-outer sparse merge: a row NEW to the state (old value
        # null) is this hop's frontier; existing rows keep their label
        return (
            state.join(reached.withColumn("_new", F.lit(True)), on="id", how="full_outer")
            .select(
                "id",
                F.coalesce(F.col("value"), F.lit(hop).cast("long")).alias("value"),
                F.col("value").isNull().alias("_changed"),
            )
        )

    def step(state, hop):
        frontier = state.filter(F.col("_changed")).select("id")
        reached = (
            frontier.join(edges, frontier["id"] == edges["src"])
            .select(F.col("dst").alias("id"))
            .distinct()
        )
        return merge(state, reached, hop)

    def literal_step(state, rows, hop):
        # frontier inlined as literals: filtered scan, no join
        reached = (
            lit_scan(F.col("src").isin([r["id"] for r in rows]))
            .select(F.col("dst").alias("id"))
            .distinct()
        )
        return merge(state, reached, hop)

    loop = message_loop(edges)
    # literal rounds only when the avoided per-round O(|E|) scan beats
    # the extra driver action (see _LITERAL_MIN_EDGES)
    lit = literal_step if loop._body_rows >= _LITERAL_MIN_EDGES else None
    try:
        state = _frontier_loop(loop, state, step, max_iterations,
                               literal_step=lit)
        result = (
            graph.vertices.select("id")
            .join(state.select("id", "value"), on="id", how="left")
            .select("id", F.coalesce(F.col("value"), F.lit(MAX_LONG)).alias("value"))
            .localCheckpoint(eager=True)
        )
    finally:
        loop.release()
        release_edges()
    return result


def sssp(graph: Graph, src_vertex_id, max_iterations: int = 50) -> DataFrame:
    """Bellman-Ford relaxation from one source; unreached = +inf.

    Reference: SingleSourceShortestPaths.java:30-68 — relax if the combined
    min message < value, then send ``min + edge.value`` along out-edges.
    Returns (id, value double).

    SPARSE loop state (r13, the mssp pattern): only REACHED vertices
    carry a row through the rounds, so the per-round merge shuffles
    O(|reached|) instead of O(|V|) — Bellman-Ford from one source on a
    100 TB graph must not rewrite a billion-row state every relaxation
    round. Unreached vertices join back as +inf in ONE densify pass at
    the end.
    """
    raw_edges = graph.edges.select(
        "src", "dst", F.col("value").cast("double").alias("w")
    )
    edges, release_edges = sized_cache(raw_edges)
    # literal rounds filter the UN-projected source FIRST when its plan
    # is storage-only: the filter-first shape does not match the cached
    # projection's plan, so the src IN (...) predicate reaches parquet
    # (PushedFilters + bucket pruning on bucketed tables) instead of
    # re-scanning the cache; otherwise they filter the cached frame
    lit_base = prunable_source(graph.edges)

    def lit_scan(cond):
        if lit_base is not None:
            return lit_base.filter(cond).select(
                "src", "dst", F.col("value").cast("double").alias("w")
            )
        return edges.filter(cond)

    id_type = dict(graph.vertices.dtypes)["id"]
    state = (
        graph.vertices.filter(F.col("id") == src_vertex_id)
        .select("id", F.lit(0.0).alias("value"), F.lit(True).alias("_changed"))
    )

    def merge(state, msgs):
        return state.join(msgs, on="id", how="full_outer").select(
            "id",
            F.least(
                F.coalesce(F.col("value"), F.lit(INF)),
                F.coalesce(F.col("d"), F.lit(INF)),
            ).alias("value"),
            (F.col("d") < F.coalesce(F.col("value"), F.lit(INF))).alias("_changed"),
        )

    def step(state, _it):
        frontier = state.filter(F.col("_changed")).select("id", "value")
        msgs = (
            frontier.join(edges, frontier["id"] == edges["src"])
            .select(F.col("dst").alias("id"), (F.col("value") + F.col("w")).alias("d"))
            .groupBy("id")
            .agg(F.min("d").alias("d"))  # min combiner — map-side partial agg
        )
        return merge(state, msgs)

    def literal_step(state, rows, _it):
        # frontier inlined as literals: filtered scan + map lookup, no join
        vmap = F.create_map(
            *[c for r in rows
              for c in (F.lit(r["id"]).cast(id_type), F.lit(r["value"]))]
        )
        msgs = (
            lit_scan(F.col("src").isin([r["id"] for r in rows]))
            .select(
                F.col("dst").alias("id"),
                (F.element_at(vmap, F.col("src")) + F.col("w")).alias("d"),
            )
            .groupBy("id")
            .agg(F.min("d").alias("d"))
        )
        return merge(state, msgs)

    loop = message_loop(edges)
    # literal rounds only when the avoided per-round O(|E|) scan beats
    # the extra driver action (see _LITERAL_MIN_EDGES)
    lit = literal_step if loop._body_rows >= _LITERAL_MIN_EDGES else None
    try:
        state = _frontier_loop(loop, state, step, max_iterations,
                               literal_step=lit)
        result = (
            graph.vertices.select("id")
            .join(state.select("id", "value"), on="id", how="left")
            .select("id", F.coalesce(F.col("value"), F.lit(INF)).alias("value"))
            .localCheckpoint(eager=True)
        )
    finally:
        loop.release()
        release_edges()
    return result


def mssp(
    graph: Graph, landmark_vertex_ids: Iterable, max_iterations: int = 50
) -> DataFrame:
    """Per-landmark min-distance map: (id, value map<landmark,double>).

    Reference: MultipleSourceShortestPaths.java:32-75 — vertex value is a
    Map<landmark,double>, merged with ``min`` per landmark. Unreached
    landmarks surface as +inf in the final map, matching the reference's
    map initialization.
    """
    landmarks = list(landmark_vertex_ids)
    spark = graph.vertices.sparkSession
    edges, release_edges = sized_cache(
        graph.edges.select("src", "dst", F.col("value").cast("double").alias("w"))
    )

    # landmark column uses the graph's own id type (not hardcoded long)
    id_type = dict(graph.vertices.dtypes)["id"]
    lm_df = spark.createDataFrame([(l,) for l in landmarks], f"landmark {id_type}")
    # Sparse state: only (id, landmark) pairs actually reached carry a row —
    # at scale this is |V|·|reached landmarks|, not |V|·|landmarks|.
    state = (
        graph.vertices.select("id")
        .filter(F.col("id").isin(landmarks))
        .select(
            "id", F.col("id").alias("landmark"), F.lit(0.0).alias("dist"),
            F.lit(True).alias("_changed"),
        )
    )
    def step(state, _it):
        frontier = state.filter(F.col("_changed")).select("id", "landmark", "dist")
        msgs = (
            frontier.join(edges, frontier["id"] == edges["src"])
            .select(
                F.col("dst").alias("id"), "landmark", (F.col("dist") + F.col("w")).alias("d")
            )
            .groupBy("id", "landmark")
            .agg(F.min("d").alias("d"))
        )
        return state.join(msgs, on=["id", "landmark"], how="full_outer").select(
            "id",
            "landmark",
            F.least(
                F.coalesce(F.col("dist"), F.lit(INF)), F.coalesce(F.col("d"), F.lit(INF))
            ).alias("dist"),
            (F.col("d") < F.coalesce(F.col("dist"), F.lit(INF))).alias("_changed"),
        )

    # per-round messages are (edge x landmark) pairs — scale the narrow
    # per-message width by the landmark fan-out
    loop = message_loop(edges, bytes_per_row=32 * max(1, len(landmarks)))
    try:
        state = _frontier_loop(loop, state, step, max_iterations)
        state = state.select("id", "landmark", "dist")
        # reassemble the reference's map value, +inf for unreached landmarks
        full = (
            graph.vertices.select("id")
            .crossJoin(F.broadcast(lm_df))
            .join(state, on=["id", "landmark"], how="left")
            .select("id", "landmark", F.coalesce(F.col("dist"), F.lit(INF)).alias("dist"))
        )
        result = full.groupBy("id").agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("landmark", "dist")))
            ).alias("value")
        )
        out = result.localCheckpoint(eager=True)
    finally:
        loop.release()
        release_edges()
    return out


def temporal_earliest_arrival(
    graph: Graph, src_vertex_id, start_time: int = 0, max_iterations: int = 50
) -> DataFrame:
    """(id, value) — the earliest time each vertex is reachable from
    ``src_vertex_id`` along TIME-RESPECTING paths; unreached = MAX_LONG.

    Beyond-reference temporal-graph operator (the reference's streaming
    tier processes edges in arrival order but has no time-respecting path
    semantics). Edge timestamps ride the graph's edge ``value`` column
    (cast to long). An edge (u, v, t) is traversable only when
    t ≥ arrival(u) — you cannot take a connection that departed before
    you arrived — and then arrival(v) ≤ t. The source starts at
    ``start_time``.

    Same frontier-relaxation scale shape as :func:`sssp`: arrival times
    are monotone non-increasing, so the fixpoint exists and each round is
    one equi-join on ``src`` (the temporal gate ``t ≥ arrival`` is a
    post-join filter, not a join-strategy change) with a map-side-combined
    ``min`` per destination, chunk-chained through ChainLoop. When a
    vertex's arrival improves it re-enters the frontier and re-offers its
    now-usable later edges — the standard label-correcting treatment of
    temporal graphs (Wu et al., "Path Problems in Temporal Graphs",
    VLDB 2014 — single-pass relaxation semantics).

    SPARSE loop state (r13, the bfs/sssp pattern): only REACHED vertices
    carry a row through the rounds, so the per-round merge shuffles
    O(|reached|) instead of O(|V|). Unreached vertices join back as
    MAX_LONG in ONE densify pass at the end — identical output. The
    merge is the same full-outer state⋈messages the whole frontier
    family uses: the r13 in-session merge-shape A/B (dense left-join vs
    sparse full-outer vs sparse union+groupBy, interleaved, identical
    checksums) measured full-outer fastest in the clean sessions at
    sf0.1 (sssp) and sf1.0 (this operator) — the dense left join pays
    an O(|V|) state scan+rewrite every round instead.
    """
    raw_edges = graph.edges.select(
        "src", "dst", F.col("value").cast("long").alias("t")
    )
    edges, release_edges = sized_cache(raw_edges)
    # literal rounds filter the UN-projected source FIRST when its plan
    # is storage-only (see sssp) — the filter reaches the parquet scan
    lit_base = prunable_source(graph.edges)

    def lit_scan(cond):
        if lit_base is not None:
            return lit_base.filter(cond).select(
                "src", "dst", F.col("value").cast("long").alias("t")
            )
        return edges.filter(cond)

    id_type = dict(graph.vertices.dtypes)["id"]
    state = (
        graph.vertices.filter(F.col("id") == src_vertex_id)
        .select(
            "id",
            F.lit(int(start_time)).cast("long").alias("value"),
            F.lit(True).alias("_changed"),
        )
    )

    def merge(state, msgs):
        return state.join(msgs, on="id", how="full_outer").select(
            "id",
            F.least(
                F.coalesce(F.col("value"), F.lit(MAX_LONG)),
                F.coalesce(F.col("t"), F.lit(MAX_LONG)),
            ).alias("value"),
            (F.col("t") < F.coalesce(F.col("value"), F.lit(MAX_LONG))).alias("_changed"),
        )

    def step(state, _it):
        frontier = state.filter(F.col("_changed")).select("id", "value")
        msgs = (
            frontier.join(
                edges,
                (frontier["id"] == edges["src"]) & (edges["t"] >= frontier["value"]),
            )
            .select(F.col("dst").alias("id"), "t")
            .groupBy("id")
            .agg(F.min("t").alias("t"))
        )
        return merge(state, msgs)

    def literal_step(state, rows, _it):
        # frontier inlined as literals: filtered scan + map-lookup
        # temporal gate, no join
        vmap = F.create_map(
            *[c for r in rows
              for c in (F.lit(r["id"]).cast(id_type), F.lit(r["value"]))]
        )
        msgs = (
            lit_scan(F.col("src").isin([r["id"] for r in rows]))
            .filter(F.col("t") >= F.element_at(vmap, F.col("src")))
            .select(F.col("dst").alias("id"), "t")
            .groupBy("id")
            .agg(F.min("t").alias("t"))
        )
        return merge(state, msgs)

    loop = message_loop(edges)
    # literal rounds only when the avoided per-round O(|E|) scan beats
    # the extra driver action (see _LITERAL_MIN_EDGES)
    lit = literal_step if loop._body_rows >= _LITERAL_MIN_EDGES else None
    try:
        state = _frontier_loop(loop, state, step, max_iterations,
                               literal_step=lit)
        result = (
            graph.vertices.select("id")
            .join(state.select("id", "value"), on="id", how="left")
            .select("id", F.coalesce(F.col("value"), F.lit(MAX_LONG)).alias("value"))
            .localCheckpoint(eager=True)
        )
    finally:
        loop.release()
        release_edges()
    return result


def _seed_walks(graph: Graph, walks_per_vertex: int) -> DataFrame:
    """(walk_id, start) — one row per (vertex, replica); walk_id =
    "<start>#<replica>" is the deterministic draw key both walkers share."""
    return (
        graph.vertices.select(F.col("id").alias("start"))
        .crossJoin(
            graph.vertices.sparkSession.range(walks_per_vertex).select(
                F.col("id").alias("_w")
            )
        )
        .select(
            F.concat(F.col("start").cast("string"), F.lit("#"), F.col("_w")).alias(
                "walk_id"
            ),
            "start",
        )
    )


def _walk_draw(seed: str, step: int) -> "F.Column":
    """Uniform [0, 2^32) md5 draw over (walk key, step, current vertex) —
    the shared randomness source; mirrored verbatim by the SQL oracles."""
    return F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("walk_id"), F.lit(f":{seed}:{step}:"),
                    F.col("cur").cast("string"),
                )
            ),
            1, 8,
        ),
        16, 10,
    ).cast("long")


def _drive_walks(frontier: DataFrame, walk_length: int, step_fn) -> DataFrame:
    """Shared walker choreography: frontier carries (walk_id, start, cur,
    …); ``step_fn(frontier, step)`` returns the next same-shaped frontier.

    Two ChainLoops: the frontier and the accumulated output each need
    their plans cut to a leaf every step — the output unions every step's
    frontier, and ChainLoop frees blocks older than two generations, so
    an un-cut union would reference freed checkpoint blocks. Returns
    (walk_id, start, step, vertex), materialized.
    """
    out = frontier.select(
        "walk_id", "start", F.lit(0).cast("long").alias("step"),
        F.col("cur").alias("vertex"),
    )
    loop = ChainLoop()
    out_loop = ChainLoop(adaptive=False)
    try:
        frontier, _ = loop.advance(frontier)
        out, _ = out_loop.advance(out)
        for step in range(1, walk_length + 1):
            frontier, row = loop.advance(step_fn(frontier, step))
            if row["_kgs_rows"] == 0:
                break
            out, _ = out_loop.advance(
                out.unionByName(
                    frontier.select(
                        "walk_id", "start",
                        F.lit(step).cast("long").alias("step"),
                        F.col("cur").alias("vertex"),
                    )
                )
            )
        out = out.localCheckpoint(eager=True)
    finally:
        loop.release()
        out_loop.release()
    return out


def random_walks(
    graph: Graph,
    walk_length: int,
    walks_per_vertex: int = 1,
    seed: str = "walk",
) -> DataFrame:
    """(walk_id, start, step, vertex) — deterministic hash-seeded random
    walks, the corpus generator for DeepWalk/node2vec-style embeddings.

    Beyond-reference operator. Each step chooses the next out-neighbor by
    an md5 draw over (walk key, step, current vertex) modulo out-degree —
    deterministic, so walks are reproducible across runs, partitionings,
    and engines (the draw has a closed-form SQL twin), yet well-mixed
    across walks and steps. Walks stop early at sinks (no out-edges).

    Scale shape: the adjacency is ranked once (row_number per source —
    one shuffle), then each step is two broadcast-free equi-joins: the
    frontier joins degrees to draw an index, then joins the ranked
    adjacency on (vertex, index). State is |walks| rows; path history
    accumulates as output rows, not in the frontier. ``walk_length``
    steps = that many fixed-size jobs — same bound as BFS.
    """
    from pyspark.sql.window import Window

    if walk_length < 0 or walks_per_vertex < 1:
        raise ValueError("walk_length >= 0 and walks_per_vertex >= 1 required")
    e = graph.edges.select("src", "dst").distinct()
    ranked = e.withColumn(
        "_idx",
        F.row_number().over(Window.partitionBy("src").orderBy("dst")) - 1,
    )
    degs = e.groupBy("src").agg(F.count(F.lit(1)).alias("_deg"))
    adj, release_adj = sized_cache(ranked)
    deg, release_deg = sized_cache(degs)

    def step_fn(frontier, step):
        draw = _walk_draw(seed, step)
        return (
            frontier.join(deg, frontier["cur"] == deg["src"])
            .select("walk_id", "start", "cur", (draw % F.col("_deg")).alias("_i"))
            .join(adj, on=[F.col("cur") == adj["src"], F.col("_i") == adj["_idx"]])
            .select("walk_id", "start", F.col("dst").alias("cur"))
        )

    try:
        frontier = _seed_walks(graph, walks_per_vertex).select(
            "walk_id", "start", F.col("start").alias("cur")
        )
        return _drive_walks(frontier, walk_length, step_fn)
    finally:
        release_adj()
        release_deg()


def node2vec_walks(
    graph: Graph,
    walk_length: int,
    p: float = 1.0,
    q: float = 1.0,
    walks_per_vertex: int = 1,
    seed: str = "n2v",
) -> DataFrame:
    """(walk_id, start, step, vertex) — deterministic node2vec walks.

    Second-order biased walks (Grover & Leskovec 2016): stepping from
    ``cur`` with predecessor ``prev``, each out-neighbor ``x`` weighs
    1/p if x == prev (return), 1 if x is also a neighbor of prev
    (common neighbor, BFS-ish), else 1/q (exploration, DFS-ish). The
    first step is uniform. Selection applies the shared md5 draw to the
    CUMULATIVE weight profile: pick the neighbor (in dst order) whose
    interval [lag(cumw), cumw) contains u·total — the lagged prefix
    (not cumw − w, which can leave FP gaps/overlaps for non-dyadic
    weights) makes the intervals an exact partition of [0, total).
    Dyadic p/q keep every value exactly representable, so walks are
    bit-reproducible across engines — the draw has an exact SQL twin.

    Scale shape: per step, one equi-join to enumerate candidates, one
    broadcast-free equi-join probing prev→x edge existence, and one
    per-(walk) window cumsum whose partition size is the out-degree of
    ``cur`` — the same shuffle profile as the uniform walker plus the
    edge probe. Walks stop early at sinks.
    """
    from pyspark.sql.window import Window

    if walk_length < 0 or walks_per_vertex < 1:
        raise ValueError("walk_length >= 0 and walks_per_vertex >= 1 required")
    if p <= 0 or q <= 0:
        raise ValueError("p and q must be positive")
    e = graph.edges.select("src", "dst").distinct()
    adj, release_adj = sized_cache(e)
    probe = e.select(F.col("src").alias("_pa"), F.col("dst").alias("_pb"))

    def step_fn(frontier, step):
        cand = (
            frontier.join(adj, frontier["cur"] == adj["src"])
            .select("walk_id", "start", "prev", "cur", F.col("dst").alias("x"))
            .join(
                probe,
                on=[
                    F.col("prev").eqNullSafe(F.col("_pa")),
                    F.col("x") == F.col("_pb"),
                ],
                how="left",
            )
            .select(
                "walk_id", "start", "prev", "cur", "x",
                F.when(F.col("prev").isNull(), F.lit(1.0))
                .when(F.col("x") == F.col("prev"), F.lit(1.0 / p))
                .when(F.col("_pa").isNotNull(), F.lit(1.0))
                .otherwise(F.lit(1.0 / q))
                .alias("w"),
            )
        )
        win = Window.partitionBy("walk_id").orderBy("x")
        u = (_walk_draw(seed, step) / F.lit(float(1 << 32))) * F.col("totw")
        return (
            cand.select(
                "walk_id", "start", "cur", "x", "w",
                F.sum("w").over(win).alias("cumw"),
                F.sum("w").over(Window.partitionBy("walk_id")).alias("totw"),
            )
            .withColumn("_lo", F.lag("cumw", 1, 0.0).over(win))
            .withColumn("_u", u)
            .filter((F.col("cumw") > F.col("_u")) & (F.col("_lo") <= F.col("_u")))
            .select(
                "walk_id", "start",
                F.col("cur").alias("prev"), F.col("x").alias("cur"),
            )
        )

    try:
        frontier = _seed_walks(graph, walks_per_vertex).select(
            "walk_id", "start",
            F.lit(None).cast("long").alias("prev"),
            F.col("start").alias("cur"),
        )
        return _drive_walks(frontier, walk_length, step_fn)
    finally:
        release_adj()


MIN_LONG = -9223372036854775808


def temporal_latest_departure(
    graph: Graph, dst_vertex_id, deadline: int, max_iterations: int = 50
) -> DataFrame:
    """(id, value) — the LATEST time each vertex can depart and still
    reach ``dst_vertex_id`` by ``deadline`` along time-respecting paths;
    no valid departure = MIN_LONG.

    The dual of :func:`temporal_earliest_arrival` (Wu et al.'s
    latest-departure path problem): an edge (u, v, t) is usable when its
    time t is no later than v's own latest departure (t ≤ departure(v) —
    arriving at v at t still leaves every v-onward connection at or
    after t available, because departure(v) is the latest such time) and
    within the deadline (t ≤ deadline); taking it means leaving u at t,
    so departure(u) = max over usable edges. The target itself scores
    ``deadline``. Departure times are monotone non-DEcreasing under
    relaxation, so the fixpoint exists; when a vertex's departure
    improves it re-enters the frontier and re-offers its in-edges.

    Scale shape mirrors sssp/temporal_earliest_arrival with the join
    keyed on ``dst`` (messages flow BACKWARD along edges): one equi-join
    per round, temporal gate as a post-join filter, map-side-combined
    ``max`` per source, chunk-chained through ChainLoop.

    SPARSE loop state (r13, the bfs/sssp pattern): only vertices with a
    valid departure carry a row through the rounds, so the per-round
    merge shuffles O(|reached|) instead of O(|V|). Vertices with no
    valid departure join back as MIN_LONG in ONE densify pass at the
    end — identical output. Full-outer state merge, like the rest of
    the frontier family (see :func:`temporal_earliest_arrival`).
    """
    raw_edges = graph.edges.select(
        "src", "dst", F.col("value").cast("long").alias("t")
    ).filter(F.col("t") <= F.lit(int(deadline)))
    edges, release_edges = sized_cache(raw_edges)
    # literal rounds filter the UN-projected source FIRST when its plan
    # is storage-only. Messages flow BACKWARD, so the literal filter is
    # dst IN (...) — no bucket pruning on src-bucketed tables, but the
    # predicate still pushes to parquet and the join and the frontier
    # broadcast still disappear from every small round
    lit_base = prunable_source(graph.edges)

    def lit_scan(cond):
        if lit_base is not None:
            return (
                lit_base.filter(cond)
                .select("src", "dst", F.col("value").cast("long").alias("t"))
                .filter(F.col("t") <= F.lit(int(deadline)))
            )
        return edges.filter(cond)
    id_type = dict(graph.vertices.dtypes)["id"]
    state = (
        graph.vertices.filter(F.col("id") == dst_vertex_id)
        .select(
            "id",
            F.lit(int(deadline)).cast("long").alias("value"),
            F.lit(True).alias("_changed"),
        )
    )

    def merge(state, msgs):
        return state.join(msgs, on="id", how="full_outer").select(
            "id",
            F.greatest(
                F.coalesce(F.col("value"), F.lit(MIN_LONG)),
                F.coalesce(F.col("t"), F.lit(MIN_LONG)),
            ).alias("value"),
            (F.col("t") > F.coalesce(F.col("value"), F.lit(MIN_LONG))).alias("_changed"),
        )

    def step(state, _it):
        frontier = state.filter(F.col("_changed")).select("id", "value")
        msgs = (
            frontier.join(
                edges,
                (frontier["id"] == edges["dst"]) & (edges["t"] <= frontier["value"]),
            )
            .select(F.col("src").alias("id"), "t")
            .groupBy("id")
            .agg(F.max("t").alias("t"))
        )
        return merge(state, msgs)

    def literal_step(state, rows, _it):
        vmap = F.create_map(
            *[c for r in rows
              for c in (F.lit(r["id"]).cast(id_type), F.lit(r["value"]))]
        )
        msgs = (
            lit_scan(F.col("dst").isin([r["id"] for r in rows]))
            .filter(F.col("t") <= F.element_at(vmap, F.col("dst")))
            .select(F.col("src").alias("id"), "t")
            .groupBy("id")
            .agg(F.max("t").alias("t"))
        )
        return merge(state, msgs)

    loop = message_loop(edges)
    # literal rounds only when the avoided per-round O(|E|) scan beats
    # the extra driver action (see _LITERAL_MIN_EDGES)
    lit = literal_step if loop._body_rows >= _LITERAL_MIN_EDGES else None
    try:
        state = _frontier_loop(loop, state, step, max_iterations,
                               literal_step=lit)
        result = (
            graph.vertices.select("id")
            .join(state.select("id", "value"), on="id", how="left")
            .select("id", F.coalesce(F.col("value"), F.lit(MIN_LONG)).alias("value"))
            .localCheckpoint(eager=True)
        )
    finally:
        loop.release()
        release_edges()
    return result
