"""Streaming algorithm library: single-pass windowed graph summaries.

Reference: io/kgraph/streaming/library/{ConnectedComponents,
BipartitenessCheck,ExactTriangleCount,Spanner}.java (SURVEY.md §2.9).
Each rides the SummaryBulkAggregation fold/combine engine with the
matching summary structure; ExactTriangleCount additionally has a fully
relational batch-parity form (edge-edge-edge join) that is the idiomatic
Spark shape at scale.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_graphs_spark.streaming.aggregations import summary_bulk_aggregation
from kafka_graphs_spark.streaming.summaries import (
    AdjacencyListGraph,
    Candidates,
    DisjointSet,
)


def connected_components(
    edges: DataFrame,
    window_duration: Optional[str] = None,
    event_time: str = "event_time",
) -> DataFrame:
    """Windowed union-find components → (window_start, summary DisjointSet).

    Reference: io/kgraph/streaming/library/ConnectedComponents.java:39-115
    — per-partition DisjointSet fold, pairwise merge (smaller into larger).
    Use aggregations.collect_summaries, then DisjointSet.components().
    """

    def fold(s: DisjointSet, row) -> DisjointSet:
        s.union(row.src, row.dst)
        return s

    def combine(a: DisjointSet, b: DisjointSet) -> DisjointSet:
        # merge smaller into larger (ConnectedComponents.java:95-101)
        return b.merge(a) if len(a) < len(b) else a.merge(b)

    return summary_bulk_aggregation(
        edges.select("src", "dst", *([event_time] if window_duration else [])),
        DisjointSet,
        fold,
        combine,
        window_duration,
        event_time,
    )


def bipartiteness_check(
    edges: DataFrame,
    window_duration: Optional[str] = None,
    event_time: str = "event_time",
) -> DataFrame:
    """Windowed 2-colorability → (window_start, summary Candidates).

    Reference: io/kgraph/streaming/library/BipartitenessCheck.java:35-120.
    ``summary.success`` is False once an odd cycle is observed.
    """

    def fold(s: Candidates, row) -> Candidates:
        s.add_edge(row.src, row.dst)
        return s

    def combine(a: Candidates, b: Candidates) -> Candidates:
        return a.merge(b)

    return summary_bulk_aggregation(
        edges.select("src", "dst", *([event_time] if window_duration else [])),
        Candidates,
        fold,
        combine,
        window_duration,
        event_time,
    )


def spanner(
    edges: DataFrame,
    k: int,
    window_duration: Optional[str] = None,
    event_time: str = "event_time",
) -> DataFrame:
    """k-spanner maintenance → (window_start, summary AdjacencyListGraph).

    Reference: io/kgraph/streaming/library/Spanner.java:35-84 — fold adds
    an edge only when the current spanner distance exceeds k; merge
    replays each partial's edges with the same bound. Note the stretch
    guarantee composes per merge level: edges folded into one partial and
    skipped there are only k²-stretch-bounded after a merge (property
    test carries the witness) — matching the reference's replay
    semantics, which share this bound.
    """

    def fold(s: AdjacencyListGraph, row) -> AdjacencyListGraph:
        s.observe_edge(row.src, row.dst)
        return s

    def combine(a: AdjacencyListGraph, b: AdjacencyListGraph) -> AdjacencyListGraph:
        return a.merge(b)

    return summary_bulk_aggregation(
        edges.select("src", "dst", *([event_time] if window_duration else [])),
        lambda: AdjacencyListGraph(k),
        fold,
        combine,
        window_duration,
        event_time,
    )


def connected_components_frame(edges: DataFrame) -> DataFrame:
    """Whole-stream components as a frame: (id, value = min id of component).

    Fully distributed: routes through the batch HashMin + pointer-jumping
    WCC (library/components.py:24) over the stream's edge set — no driver
    state at all. The reference's whole-stream answer is the merged
    DisjointSet summary, which is O(V) single-process state
    (ConnectedComponents.java:39-115); a Spark-native engine should beat
    that, and does: the label table lives partitioned across executors.
    The component label is canonicalized to the minimum member id, making
    the result replay-order independent and oracle-checkable like batch
    wcc. The windowed/mergeable DisjointSet path (connected_components
    above) remains for per-window summaries, whose size is bounded by the
    window, not the stream.
    """
    from kafka_graphs_spark.graph import Graph
    from kafka_graphs_spark.library import connected_components as batch_wcc

    g = Graph.from_edges(edges.select("src", "dst"), F.lit(0))
    return batch_wcc(g)


def bipartiteness_frame(edges: DataFrame) -> DataFrame:
    """Single-row (success boolean) — is the whole stream 2-colorable?

    Fully distributed via the doubled-vertex reduction: each vertex v
    becomes two nodes 2v ("even side") and 2v+1 ("odd side"); each edge
    (u,v) connects (2u, 2v+1) and (2u+1, 2v). The graph has an odd cycle
    iff some vertex's two copies land in one WCC component — so the
    verdict is one distributed WCC plus a self-join, no driver state.
    Matches the reference Candidates verdict (BipartitenessCheck.java:
    35-120) and is replay-order independent. The mergeable Candidates
    summary path (bipartiteness_check above) remains for windowed use.

    Id domain: the doubled encoding requires |id| < 2^62 (id*2+1 must not
    overflow long) — asserted in-plan, so hashed 64-bit vertex ids fail
    loudly instead of silently mis-mapping. The copy-back uses exact
    integer division (``div``), never float division, so no precision loss
    above 2^53.
    """
    from kafka_graphs_spark.graph import Graph
    from kafka_graphs_spark.library import connected_components as batch_wcc

    lim = F.lit(1 << 62)
    in_domain = (F.abs(F.col("src")) < lim) & (F.abs(F.col("dst")) < lim)
    domain_ok = F.assert_true(
        in_domain,
        F.lit("bipartiteness_frame: |vertex id| must be < 2^62 for the doubled-vertex encoding"),
    )
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    doubled = e.select(
        # assert_true yields NULL when the predicate holds; the `when`
        # keeps the check inside the plan (column pruning can't drop it)
        F.when(domain_ok.isNull(), F.col("src") * 2).alias("src"),
        (F.col("dst") * 2 + 1).alias("dst"),
    ).unionByName(
        e.select(
            F.when(domain_ok.isNull(), F.col("src") * 2 + 1).alias("src"),
            (F.col("dst") * 2).alias("dst"),
        )
    )
    comp = batch_wcc(Graph.from_edges(doubled, F.lit(0)))
    even = comp.filter(F.pmod("id", F.lit(2)) == 0).select(
        F.expr("id div 2").alias("v"), F.col("value").alias("c_even")
    )
    odd = comp.filter(F.pmod("id", F.lit(2)) == 1).select(
        F.expr("(id - 1) div 2").alias("v"), F.col("value").alias("c_odd")
    )
    # self-loops are odd cycles of length 1
    loops = edges.filter(F.col("src") == F.col("dst")).limit(1)
    conflicts = even.join(odd, on="v").filter(F.col("c_even") == F.col("c_odd")).limit(1)
    return (
        conflicts.agg(F.count(F.lit(1)).alias("n_conflicts"))
        .crossJoin(loops.agg(F.count(F.lit(1)).alias("n_loops")))
        .select(((F.col("n_conflicts") + F.col("n_loops")) == 0).alias("success"))
    )


def spanner_frame(
    edges: DataFrame,
    k: int,
    max_summary_edges: int = 10_000_000,
    max_summary_bytes: int = 256 << 20,
) -> DataFrame:
    """Spanner edge set as a canonical (src, dst) frame (src < dst).

    The greedy spanner is inherently sequential (whether an edge enters
    depends on the spanner-so-far), so the whole-stream frame materializes
    the merged AdjacencyListGraph summary on the driver — bounded in
    principle by the spanner's O(V^(1+1/k)) edge count. Two guards keep
    that honest: ``max_summary_bytes`` is checked EXECUTOR-side (byte
    length of the pickled summary, only the scalar crosses to the driver)
    BEFORE the summary is collected, and ``max_summary_edges`` re-checks
    the exact edge count after unpickling, bounding the createDataFrame
    amplification. A summary beyond either cap raises instead of silently
    OOMing the driver; windowed use (``spanner`` above) keeps the
    mergeable per-window summaries whose size is bounded by the window.

    NOTE: a streaming spanner is replay-order dependent in general (which
    of a cycle's edges survive depends on arrival order). On forests every
    edge is always kept (its endpoints are disconnected without it), so
    the result is deterministic — the driver oracle uses a forest input.
    """
    from kafka_graphs_spark.streaming.aggregations import collect_summaries

    spark = edges.sparkSession
    result = spanner(edges, k)
    summary = collect_summaries(result, max_bytes=max_summary_bytes)[0]
    pairs = list(summary.edges())
    if len(pairs) > max_summary_edges:
        raise RuntimeError(
            f"spanner summary holds {len(pairs)} edges > cap {max_summary_edges}; "
            "use the windowed spanner() path at this scale"
        )
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def exact_triangle_count(edges: DataFrame) -> DataFrame:
    """Per-vertex + global triangle counts → (id, count) with id −1 = global.

    Reference: io/kgraph/streaming/library/ExactTriangleCount.java:44-126 —
    canonicalize each edge, snapshot both endpoint neighborhoods, +1 per
    common neighbor, counts keyed to src, dst and the global key −1.

    Batch-parity Spark shape (the reference's insertion-order state would
    pin the whole graph per executor; the relational form shuffles ids
    only): canonical undirected edge set E; triangles = E ⋈ E ⋈ E over
    (a<b<c); per-vertex count = triangles containing v.
    """
    e = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    e1 = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = e.select(F.col("a").alias("y"), F.col("b").alias("z"))
    # wedges x<y<z with edges (x,y),(y,z); close with (x,z)
    tri = (
        e1.join(e2, on="y")
        .join(
            e.select(F.col("a").alias("x"), F.col("b").alias("z")),
            on=["x", "z"],
            how="left_semi",
        )
        .select("x", "y", "z")
    )
    per_vertex = (
        tri.select(F.col("x").alias("id"))
        .unionByName(tri.select(F.col("y").alias("id")))
        .unionByName(tri.select(F.col("z").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("count"))
    )
    total = tri.groupBy().agg(F.count(F.lit(1)).alias("count")).select(
        F.lit(-1).cast("long").alias("id"), "count"
    )
    return per_vertex.unionByName(total)


def triangles_windowed(
    edges: DataFrame, window_duration: str, event_time: str = "event_time"
) -> DataFrame:
    """Per-tumbling-window exact triangle counts → (window_start, id,
    count), id −1 = the window's global count — the windowed companion to
    :func:`exact_triangle_count`, same beyond-reference pattern as
    :func:`pagerank_windowed` (VERDICT r5 #9 family).

    One distributed plan computes ALL windows: each canonical edge is
    keyed by its tumbling window start and the 3-way wedge-close join
    runs with the window key riding every equi-join — no per-window job
    submission, no driver loop. At 100 TB a month of hourly windows is
    one job; windows never co-join (the key is in every join), so AQE
    sees ordinary key skew it already handles.
    """
    ws = F.window(F.col(event_time), window_duration)["start"].alias("ws")
    e = (
        edges.select(
            ws,
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    e1 = e.select("ws", F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = e.select("ws", F.col("a").alias("y"), F.col("b").alias("z"))
    tri = (
        e1.join(e2, on=["ws", "y"])
        .join(
            e.select("ws", F.col("a").alias("x"), F.col("b").alias("z")),
            on=["ws", "x", "z"],
            how="left_semi",
        )
        .select("ws", "x", "y", "z")
    )
    per_vertex = (
        tri.select("ws", F.col("x").alias("id"))
        .unionByName(tri.select("ws", F.col("y").alias("id")))
        .unionByName(tri.select("ws", F.col("z").alias("id")))
        .groupBy("ws", "id")
        .agg(F.count(F.lit(1)).alias("count"))
    )
    total = tri.groupBy("ws").agg(F.count(F.lit(1)).alias("count")).select(
        "ws", F.lit(-1).cast("long").alias("id"), "count"
    )
    return per_vertex.unionByName(total).select(
        F.col("ws").alias("window_start"), "id", "count"
    )


def wcc_windowed(
    edges: DataFrame,
    window_duration: str,
    event_time: str = "event_time",
    max_iterations: int = 50,
) -> DataFrame:
    """Per-tumbling-window weakly connected components → (window_start,
    id, component), component = min vertex id in the window's component.

    Third member of the windowed-analytics family (:func:`pagerank_windowed`,
    :func:`triangles_windowed`): edges key into tumbling windows and ONE
    distributed HashMin run (:func:`kafka_graphs_spark.library.
    connected_components` over struct (window, id) vertex keys) resolves
    every window simultaneously — per-window subgraphs never interact
    because the window rides the vertex key through every frontier join.
    No per-window jobs; a month of hourly windows is one ChainLoop run.
    """
    from kafka_graphs_spark.graph import Graph
    from kafka_graphs_spark.library.components import connected_components

    ws = F.window(F.col(event_time), window_duration)["start"].alias("_ws")
    e = edges.select(ws, F.col("src").alias("_s"), F.col("dst").alias("_d")).select(
        F.struct(F.col("_ws"), F.col("_s").alias("vid")).alias("src"),
        F.struct(F.col("_ws"), F.col("_d").alias("vid")).alias("dst"),
        F.lit(1.0).alias("value"),
    )
    verts = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .select("id", F.lit(0.0).alias("value"))
    )
    out = connected_components(Graph(verts, e), max_iterations=max_iterations)
    return out.select(
        F.col("id._ws").alias("window_start"),
        F.col("id.vid").alias("id"),
        F.col("value")["vid"].alias("component"),
    )


def lp_windowed(
    edges: DataFrame,
    window_duration: str,
    max_iterations: int = 10,
    event_time: str = "event_time",
) -> DataFrame:
    """Per-tumbling-window label propagation → (window_start, id, label)
    — fourth member of the windowed-analytics family: one distributed
    run of the reference-semantics LP (monotone max-frequency adoption
    along OUT-edges, exactly ``max_iterations`` rounds) over struct
    (window, id) vertex keys, every window at once. Struct labels
    compare window-first, and windows never mix, so the per-window
    ordering semantics are identical to the batch run on that window's
    subgraph.
    """
    from kafka_graphs_spark.graph import Graph
    from kafka_graphs_spark.library.components import label_propagation

    ws = F.window(F.col(event_time), window_duration)["start"].alias("_ws")
    e = edges.select(ws, F.col("src").alias("_s"), F.col("dst").alias("_d")).select(
        F.struct(F.col("_ws"), F.col("_s").alias("vid")).alias("src"),
        F.struct(F.col("_ws"), F.col("_d").alias("vid")).alias("dst"),
        F.lit(1.0).alias("value"),
    )
    verts = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .select("id", F.lit(0.0).alias("value"))
    )
    out = label_propagation(Graph(verts, e), max_iterations=max_iterations)
    return out.select(
        F.col("id._ws").alias("window_start"),
        F.col("id.vid").alias("id"),
        F.col("value")["vid"].alias("label"),
    )


def pagerank_windowed(
    edges: DataFrame,
    window_duration: str,
    reset_probability: float = 0.15,
    tolerance: float = 0.0001,
    max_iterations: int = 5,
    event_time: str = "event_time",
) -> DataFrame:
    """Per-tumbling-window PageRank → (window_start timestamp, id, value,
    delta) — the first streaming centrality beside the §2.9 summaries
    (the reference's streaming tier stops at WCC/bipartiteness/spanner/
    triangles; beyond-reference surface suggested by VERDICT r5 #9).

    Spark-first shape: every edge is keyed into its tumbling window, then
    ONE distributed run of the exact batch delta recurrence
    (:func:`kafka_graphs_spark.library.pagerank`) computes ALL windows
    simultaneously — the vertex key becomes the struct (window_start, id),
    so each window's subgraph iterates independently inside the same
    ChainLoop supersteps (same plan-audited machinery, map-side-combined
    messages, lazy generational checkpoints). No per-window job
    submission, no driver loop over windows: at 100 TB a month of hourly
    windows is still one job whose keys carry the window.
    """
    from kafka_graphs_spark.graph import Graph
    from kafka_graphs_spark.library.pagerank import pagerank

    ws = F.window(F.col(event_time), window_duration)["start"].alias("_ws")
    e = edges.select(ws, F.col("src").alias("_s"), F.col("dst").alias("_d")).select(
        F.struct(F.col("_ws"), F.col("_s").alias("vid")).alias("src"),
        F.struct(F.col("_ws"), F.col("_d").alias("vid")).alias("dst"),
        F.lit(1.0).alias("value"),
    )
    verts = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .select("id", F.lit(0.0).alias("value"))
    )
    ranked = pagerank(
        Graph(verts, e),
        tolerance=tolerance,
        reset_probability=reset_probability,
        max_iterations=max_iterations,
    )
    return ranked.select(
        F.col("id._ws").alias("window_start"),
        F.col("id.vid").alias("id"),
        "value",
        "delta",
    )
