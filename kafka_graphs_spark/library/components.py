"""Connected components & label propagation.

Reference compute functions:
- io/kgraph/library/ConnectedComponents.java:28-62 — min-label propagation
  with a label-to-label messaging quirk (`sendMessageTo(currentValue,
  e.target())` when the out-neighbor id is smaller) whose fixpoint is the
  weakly-connected-component labeling min(component). We compute the same
  fixpoint by propagating min labels over the undirected edge set —
  frontier-based, min-combined (map-side partial agg).
- io/kgraph/library/LabelPropagation.java:29-59 — community detection:
  adopt the max-frequency label among in-messages (ties → larger label),
  move only upward (vertexValue < maxKey), fixed iteration count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_graphs_spark.graph import Graph
from kafka_graphs_spark.library._loop import ChainLoop, message_loop, sized_cache


def connected_components(graph: Graph, max_iterations: int = 50) -> DataFrame:
    """Weakly connected components: (id, value = min vertex id in component).

    Reference: ConnectedComponents.java:28-62; init value = own id
    (GraphAlgorithmType.java:111-112). The reference's directed messaging +
    label-to-label quirk converges to the weak-component min; propagating
    over the undirected edge set reaches the same fixpoint with standard
    frontier semantics (HashMin, cf. GraphOperationsITCase/CC tests).
    """
    und, release_und = sized_cache(
        graph.edges.select("src", "dst")
        .unionByName(graph.edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    state = graph.vertices.select("id", F.col("id").alias("value"))
    loop = message_loop(und)
    try:
        result = _wcc_loop(loop, state, und, max_iterations)
    finally:
        loop.release()
        release_und()
    return result


def _wcc_loop(loop, state, und, max_iterations):
    state, _ = loop.advance(state)
    it = 0
    while it < max_iterations:
        it += 1
        # (a) HashMin propagation: min neighbor label per vertex
        nbr = (
            state.join(und, state["id"] == und["src"])
            .select(F.col("dst").alias("id"), F.col("value").alias("m"))
            .groupBy("id")
            .agg(F.min("m").alias("m"))  # min combiner — map-side partial agg
        )
        # (b) pointer jumping: label-of-label — doubles propagation reach per
        # round, turning O(diameter) rounds into O(log diameter). The label
        # table is (id → comp), so comp(comp(id)) is one self-join.
        jump = (
            state.alias("a")
            .join(
                state.select(F.col("id").alias("_cid"), F.col("value").alias("j")),
                F.col("a.value") == F.col("_cid"),
            )
            .select(F.col("a.id").alias("id"), F.col("j"))
        )
        updated = (
            state.join(nbr, on="id", how="left")
            .join(jump, on="id", how="left")
            .select(
                "id",
                F.least(
                    F.col("value"),
                    F.coalesce(F.col("m"), F.col("value")),
                    F.coalesce(F.col("j"), F.col("value")),
                ).alias("value"),
                (
                    F.least(
                        F.col("value"),
                        F.coalesce(F.col("m"), F.col("value")),
                        F.coalesce(F.col("j"), F.col("value")),
                    )
                    < F.col("value")
                ).alias("_changed"),
            )
        )
        # ONE action: materialize the round + count lowered labels
        state, row = loop.advance(
            updated, probes=[F.sum(F.when(F.col("_changed"), 1).otherwise(0)).alias("n")]
        )
        if not row["n"]:
            break
    return state.select("id", "value").localCheckpoint(eager=True)


def label_propagation(
    graph: Graph, max_iterations: int = 10, weighted: bool = False
) -> DataFrame:
    """Community detection by monotone max-frequency label adoption.

    Reference: LabelPropagation.java:29-59 — per superstep every vertex
    sends map{label: 1} along OUT-edges; receivers sum counts per label and
    adopt argmax (ties broken toward the LARGER label) only if it exceeds
    their current label. No vote-to-halt: runs exactly ``max_iterations``
    update rounds. Init value = own id (GraphAlgorithmType.java:111-112).

    Spark: the message maps become (dst, label) rows; count aggregation is
    a partial agg; argmax via max_by over struct(count, label) — the exact
    (count, then label) comparator of LabelPropagation.java:45-48.

    ``weighted=True`` (beyond-reference) votes with the edge value instead
    of 1 per edge — strong ties dominate community adoption. Same
    monotone upward-move semantics; sums replace counts in the argmax.
    """
    cols = ["src", "dst"] + (["value"] if weighted else [])
    edges, release_edges = sized_cache(graph.edges.select(*cols))
    state = graph.vertices.select("id", F.col("id").alias("value"))
    loop = message_loop(edges)
    try:
        state, _ = loop.advance(state)
        for _ in range(max_iterations):
            joined = state.join(edges, state["id"] == edges["src"])
            vote = (
                edges["value"].cast("double") if weighted else F.lit(1).cast("long")
            )
            counts = joined.groupBy(
                F.col("dst").alias("id"), state["value"].alias("label")
            ).agg(F.sum(vote).alias("cnt"))
            best = counts.groupBy("id").agg(
                F.max_by("label", F.struct(F.col("cnt"), F.col("label"))).alias("best")
            )
            # fixed iteration count (no vote-to-halt in the reference) — the
            # advance action only materializes the round
            state, _ = loop.advance(
                state.join(best, on="id", how="left").select(
                    "id",
                    F.when(F.col("best") > F.col("value"), F.col("best"))
                    .otherwise(F.col("value"))
                    .alias("value"),
                )
            )
        result = state.localCheckpoint(eager=True)
    finally:
        loop.release()
        release_edges()
    return result


def _undirected_simple_edges(edges: DataFrame) -> DataFrame:
    """Distinct undirected edge set, self-loops dropped — the single
    degree semantics used by every k_core path (including k <= 0)."""
    return (
        edges.select("src", "dst")
        .unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def k_core(graph: Graph, k: int, max_iterations: int | None = None) -> DataFrame:
    """Vertices of the k-core: (id, degree) with degree ≥ k in the core.

    Beyond-reference operator (the reference library has no core
    decomposition): iteratively peel vertices whose undirected degree is
    < k until fixpoint. Each round is one map-side-combined degree count
    plus two semi-joins on the peeled vertex set — all equi-joins keyed on
    vertex id, no collects; rounds are ChainLoop generations (one action
    per round, bounded plans). The number of peel rounds is NOT bounded by
    the degeneracy — a path graph peels from both ends and needs O(|V|)
    rounds for k=2 — so by default this iterates to the fixpoint
    (``max_iterations=None``). Passing a bound raises RuntimeError on
    exhaustion rather than silently returning a non-k-core.

    Degree semantics are uniform across all k (including k <= 0):
    undirected, distinct, self-loops excluded.
    """
    und = _undirected_simple_edges(graph.edges)
    if k <= 0:
        return graph.vertices.select("id").join(
            und.groupBy(F.col("src").alias("id")).agg(
                F.count(F.lit(1)).alias("degree")
            ),
            on="id",
            how="left",
        ).select("id", F.coalesce("degree", F.lit(0)).alias("degree"))

    loop = ChainLoop()
    try:
        state, row = loop.advance(und)
        n_edges = row["_kgs_rows"]
        rounds = 0
        converged = n_edges == 0
        while not converged and (max_iterations is None or rounds < max_iterations):
            rounds += 1
            deg = state.groupBy("src").agg(F.count(F.lit(1)).alias("degree"))
            keep = deg.filter(F.col("degree") >= k).select(F.col("src").alias("id"))
            nxt = state.join(
                keep, state["src"] == keep["id"], "left_semi"
            ).join(keep, state["dst"] == keep["id"], "left_semi")
            state, row = loop.advance(nxt)
            # fixpoint, or the core peeled to empty (also a final answer —
            # without this a max_iterations run whose LAST allowed round
            # empties the edge set would spuriously raise)
            if row["_kgs_rows"] in (n_edges, 0):
                converged = True
            n_edges = row["_kgs_rows"]
        if not converged:
            raise RuntimeError(
                f"k_core(k={k}) did not converge in {max_iterations} peel rounds"
            )
        out = (
            state.groupBy("src")
            .agg(F.count(F.lit(1)).alias("degree"))
            .select(F.col("src").alias("id"), "degree")
            .localCheckpoint(eager=True)
        )
    finally:
        loop.release()
    return out


def core_decomposition(graph: Graph, max_k: int | None = None) -> DataFrame:
    """(id, coreness) — the largest k for which the vertex is in the k-core.

    Runs the peeling ladder k = 1, 2, ... until the core empties (the
    degeneracy is finite, so the ladder always terminates), reusing each
    k-core's edge set as the next level's input (each level only shrinks).
    O(degeneracy) levels of the k_core loop. ``max_k`` is an optional
    safety bound; if the ladder is cut off while the core is still
    non-empty a RuntimeError is raised instead of silently clamping
    coreness.
    """
    result = None
    sub = graph
    k = 0
    while True:
        k += 1
        if max_k is not None and k > max_k:
            raise RuntimeError(
                f"core_decomposition: {max_k}-core still non-empty; "
                "raise max_k (or leave it None) for graphs of higher degeneracy"
            )
        core = k_core(sub, k)
        if not core.take(1):
            break
        level = core.select("id", F.lit(k).alias("coreness"))
        result = level if result is None else result.unionByName(level)
        keep = core.select("id")
        edges = (
            sub.edges.join(keep, sub.edges["src"] == keep["id"], "left_semi")
            .join(keep, sub.edges["dst"] == keep["id"], "left_semi")
        )
        sub = Graph(core.select("id", F.lit(0).alias("value")), edges)
    if result is None:
        return graph.vertices.select("id", F.lit(0).alias("coreness")).limit(0)
    # a vertex's coreness = max level it survived
    return result.groupBy("id").agg(F.max("coreness").alias("coreness"))


def _oriented_simple_edges(edges: DataFrame) -> DataFrame:
    """Canonical undirected edge set oriented ascending: (a < b), distinct,
    self-loops dropped — the input shape for triangle-based operators."""
    return (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _edge_support(e: DataFrame) -> DataFrame:
    """(a, b, support) — triangles through each oriented edge of ``e``.

    Same E ⋈ E ⋈ E wedge-close as exact_triangle_count (streaming/
    library.py): wedges x<y<z from two ascending edges sharing y, closed
    by a left-semi probe on (x, z); every triangle lands exactly once and
    contributes to its three edges. All equi-joins on vertex ids; the
    per-edge count is a map-side-combinable groupBy.
    """
    e1 = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = e.select(F.col("a").alias("y"), F.col("b").alias("z"))
    tri = (
        e1.join(e2, on="y")
        .join(
            e.select(F.col("a").alias("x"), F.col("b").alias("z")),
            on=["x", "z"],
            how="left_semi",
        )
        .select("x", "y", "z")
    )
    sides = (
        tri.select(F.col("x").alias("a"), F.col("y").alias("b"))
        .unionByName(tri.select(F.col("y").alias("a"), F.col("z").alias("b")))
        .unionByName(tri.select(F.col("x").alias("a"), F.col("z").alias("b")))
    )
    return sides.groupBy("a", "b").agg(F.count(F.lit(1)).alias("support"))


def k_truss(graph: Graph, k: int, max_iterations: int | None = None) -> DataFrame:
    """Edges of the k-truss: (src, dst, support), src < dst, every edge in
    ≥ k−2 triangles of the kept subgraph.

    Beyond-reference operator (companion to :func:`k_core`): iteratively
    drop edges whose triangle support is < k−2 until fixpoint, then
    report each surviving edge with its support inside the truss. Each
    peel round is one triangle enumeration (three equi-joins) plus one
    left join — no collects; rounds are ChainLoop generations. k = 3 is
    provably single-pass (an edge in no triangle is in no triangle some
    other edge needs), so its result has a closed-form SQL twin; cascades
    only arise for k ≥ 4 (pytest covers the triangle-strip cascade).
    Like k_core, a ``max_iterations`` bound raises on exhaustion rather
    than returning a non-truss; peeling to empty is a converged answer.
    """
    if k < 2:
        raise ValueError("k_truss requires k >= 2")
    thresh = k - 2
    loop = ChainLoop()
    try:
        state, row = loop.advance(_oriented_simple_edges(graph.edges))
        n_edges = row["_kgs_rows"]
        rounds = 0
        converged = n_edges == 0
        while not converged and (max_iterations is None or rounds < max_iterations):
            rounds += 1
            supp = _edge_support(state)
            nxt = (
                state.join(supp, on=["a", "b"], how="left")
                .filter(F.coalesce("support", F.lit(0)) >= thresh)
                .select("a", "b")
            )
            state, row = loop.advance(nxt)
            if row["_kgs_rows"] in (n_edges, 0):
                converged = True
            n_edges = row["_kgs_rows"]
        if not converged:
            raise RuntimeError(
                f"k_truss(k={k}) did not converge in {max_iterations} peel rounds"
            )
        # report support measured inside the final truss
        out = (
            state.join(_edge_support(state), on=["a", "b"], how="left")
            .select(
                F.col("a").alias("src"),
                F.col("b").alias("dst"),
                F.coalesce("support", F.lit(0)).cast("long").alias("support"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        loop.release()
    return out


def modularity(graph: Graph, assignment: DataFrame, label_col: str = "value") -> DataFrame:
    """One row (m, n_communities, modularity) — Newman modularity Q of a
    community assignment over the undirected simple graph.

    Beyond-reference operator: the quality score for label_propagation /
    WCC / semi-clustering output. Q = Σ_c [L_c/m − (d_c/2m)²] with L_c =
    intra-community edges, d_c = degree mass of c, m = undirected edge
    count. Two equi-joins of the canonical edge set against the (id,
    label) frame plus map-side-combined sums; communities never
    materialize on the driver. Rounded to 6 dp (the cross-community sum
    is the one order-dependent accumulation).
    """
    spark = graph.vertices.sparkSession
    und = _oriented_simple_edges(graph.edges)
    m = und.count()
    if m == 0:
        return spark.createDataFrame(
            [(0, 0, 0.0)], "m long, n_communities long, modularity double"
        )
    lab = assignment.select("id", F.col(label_col).alias("_c"))
    labeled = (
        und.join(lab.select(F.col("id").alias("a"), F.col("_c").alias("_ca")), on="a")
        .join(lab.select(F.col("id").alias("b"), F.col("_c").alias("_cb")), on="b")
    )
    intra = (
        labeled.filter(F.col("_ca") == F.col("_cb"))
        .groupBy(F.col("_ca").alias("_c"))
        .agg(F.count(F.lit(1)).alias("_l"))
    )
    deg_mass = (
        labeled.select(F.col("_ca").alias("_c"))
        .unionByName(labeled.select(F.col("_cb").alias("_c")))
        .groupBy("_c")
        .agg(F.count(F.lit(1)).alias("_d"))
    )
    per_c = deg_mass.join(intra, on="_c", how="left").select(
        "_c",
        (
            F.coalesce("_l", F.lit(0)).cast("double") / F.lit(float(m))
            - (F.col("_d").cast("double") / F.lit(2.0 * m)) ** 2
        ).alias("_q"),
    )
    row = per_c.agg(
        F.count(F.lit(1)).alias("k"), F.sum("_q").alias("q")
    ).collect()[0]
    return spark.createDataFrame(
        [(m, row["k"], round(float(row["q"]), 6))],
        "m long, n_communities long, modularity double",
    )


def conductance(
    graph: Graph, assignment: DataFrame, label_col: str = "value"
) -> DataFrame:
    """(label, cut_edges, volume, conductance) — per-community conductance
    φ(S) = cut(S, S̄) / min(vol(S), 2m − vol(S)) over the undirected
    simple graph, one row per community with nonzero volume.

    Beyond-reference partition-quality metric read alongside
    :func:`modularity`: low conductance = few boundary edges relative to
    the smaller side's degree mass (the bottleneck score from the Cheeger
    inequality). cut counts undirected edges with endpoints in different
    communities (each such edge contributes to BOTH communities' cuts);
    vol(S) is the degree mass of S restricted to labeled endpoints.

    Scale shape: two equi-joins of the canonical a<b edge set against the
    (id, label) frame, then map-side-combined sums per label — the same
    plan skeleton as modularity; communities never materialize on the
    driver. One exact-integer division at the end, rounded to 6 dp;
    communities spanning the whole volume (min side 0) score 0.0.
    """
    spark = graph.vertices.sparkSession
    und = _oriented_simple_edges(graph.edges)
    lab = assignment.select("id", F.col(label_col).alias("_c"))
    labeled = (
        und.join(lab.select(F.col("id").alias("a"), F.col("_c").alias("_ca")), on="a")
        .join(lab.select(F.col("id").alias("b"), F.col("_c").alias("_cb")), on="b")
    )
    two_m = labeled.count() * 2
    if two_m == 0:
        return spark.createDataFrame(
            [], "label long, cut_edges long, volume long, conductance double"
        )
    vol = (
        labeled.select(F.col("_ca").alias("label"))
        .unionByName(labeled.select(F.col("_cb").alias("label")))
        .groupBy("label")
        .agg(F.count(F.lit(1)).cast("long").alias("volume"))
    )
    cut = (
        labeled.filter(F.col("_ca") != F.col("_cb"))
        .select(F.col("_ca").alias("label"))
        .unionByName(
            labeled.filter(F.col("_ca") != F.col("_cb")).select(
                F.col("_cb").alias("label")
            )
        )
        .groupBy("label")
        .agg(F.count(F.lit(1)).cast("long").alias("cut_edges"))
    )
    denom = F.least(F.col("volume"), F.lit(two_m) - F.col("volume"))
    return vol.join(cut, on="label", how="left").select(
        "label",
        F.coalesce("cut_edges", F.lit(0)).alias("cut_edges"),
        "volume",
        F.when(
            denom > 0,
            F.round(
                F.coalesce("cut_edges", F.lit(0)).cast("double") / denom.cast("double"),
                6,
            ),
        ).otherwise(F.lit(0.0)).alias("conductance"),
    )
