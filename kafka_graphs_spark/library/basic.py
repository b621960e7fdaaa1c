"""Basic algorithms: EdgeCount, VertexCount, ReverseEdges.

Reference: io/kgraph/library/basic/{EdgeCount,VertexCount,ReverseEdges}.java.
The first two are aggregator-only Pregel programs in the reference (one
superstep summing degrees / counting vertices) — on Spark they are single
partial-aggregated counts. ReverseEdges (superstep 0 send own edges to
targets, superstep 1 addEdge missing reverses) is a union + dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_graphs_spark.graph import Graph


def edge_count(graph: Graph) -> int:
    """Reference: EdgeCount.java:28-52 (sum of out-degrees at superstep 0)."""
    return graph.edges.count()


def vertex_count(graph: Graph) -> int:
    """Reference: VertexCount.java:28-49 (+1 per vertex at superstep 0)."""
    return graph.vertices.count()


def reverse_edges(graph: Graph) -> Graph:
    """Ensure every edge has its reverse; existing edges keep their value.

    Reference: ReverseEdges.java:28-59 — superstep 0 sends each vertex's
    out-edges to their targets; superstep 1 adds the missing reverse edges.
    Spark: original edges ∪ (reversed anti-join original keys).
    """
    e = graph.edges
    cols = e.columns
    reversed_e = e.select(
        F.col("dst").alias("src"),
        F.col("src").alias("dst"),
        *[F.col(c) for c in cols if c not in ("src", "dst")],
    )
    missing = reversed_e.join(e.select("src", "dst"), on=["src", "dst"], how="left_anti")
    return Graph(graph.vertices, e.unionByName(missing))


def graph_statistics(graph) -> "DataFrame":
    """One-row dataset card for a graph: sizes, degree stats, triangles,
    degree assortativity.

    Beyond-reference convenience (the reference exposes only
    vertex/edge counts): everything a user profiles before choosing an
    algorithm, computed in a handful of aggregates —

    - n_vertices, n_edges (directed rows), n_self_loops
    - n_undirected_edges (canonical a<b pairs), density = that over C(n,2)
    - max_degree / avg_degree of the simple undirected graph
    - n_triangles (wedge-close count, same machinery as k_truss)
    - assortativity: Pearson correlation of endpoint degrees over the
      symmetrized edge list — positive means hubs link to hubs.

    All map-side-combinable aggregates + the triangle equi-joins; no
    driver loops, one small result row.
    """
    from pyspark.sql import functions as F

    from kafka_graphs_spark.library.components import (
        _edge_support,
        _oriented_simple_edges,
    )

    e = graph.edges
    n_v = graph.vertices.count()
    n_e = e.count()
    n_loops = e.filter(F.col("src") == F.col("dst")).count()
    und = _oriented_simple_edges(e)  # a < b, distinct
    n_und = und.count()
    deg = (
        und.select(F.col("a").alias("id"))
        .unionByName(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    deg_row = deg.agg(
        F.max("d").alias("max_d"), F.avg("d").alias("avg_d")
    ).collect()[0]
    n_tri_row = _edge_support(und).agg(
        (F.sum("support") / 3).cast("long").alias("t")
    ).collect()[0]
    # assortativity over ordered symmetric pairs (each und edge twice)
    sym = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    pairs = (
        sym.join(deg.select(F.col("id").alias("a"), F.col("d").alias("da")), on="a")
        .join(deg.select(F.col("id").alias("b"), F.col("d").alias("db")), on="b")
    )
    r = pairs.agg(F.corr("da", "db").alias("r")).collect()[0]["r"]
    spark = e.sparkSession
    density = (
        float(n_und) / (n_v * (n_v - 1) / 2.0) if n_v > 1 else 0.0
    )
    return spark.createDataFrame(
        [(
            n_v, n_e, n_loops, n_und,
            round(density, 9),
            deg_row["max_d"], round(float(deg_row["avg_d"] or 0.0), 6),
            n_tri_row["t"] or 0,
            round(float(r), 6) if r is not None else None,
        )],
        "n_vertices long, n_edges long, n_self_loops long, n_undirected_edges long, "
        "density double, max_degree long, avg_degree double, n_triangles long, "
        "assortativity double",
    )


def bipartite_projection(
    graph: Graph,
    onto: str = "src",
    max_hub_degree: int | None = None,
) -> "DataFrame":
    """Weighted one-mode projection of a bipartite graph: (id_a, id_b,
    weight) with id_a < id_b, weight = number of shared neighbors on the
    other side.

    Beyond-reference operator — the co-occurrence projection every
    recommender / co-citation pipeline builds from a user-item edge set
    (the reference's CF tier consumes the bipartite graph directly but
    offers no projection). ``onto='src'`` pairs sources sharing a target
    (``'dst'`` the reverse). The self-join is an equi-join on the shared
    endpoint; output pairs per hub grow quadratically in hub degree, so
    ``max_hub_degree`` drops hubs above the cap (the standard scale
    mitigation — a target shared by 10⁶ sources contributes 5·10¹¹ pairs
    and no signal). The cap is exact-degree-based and deterministic.
    """
    if onto not in ("src", "dst"):
        raise ValueError("onto must be 'src' or 'dst'")
    other = "dst" if onto == "src" else "src"
    e = graph.edges.select(
        F.col(onto).alias("side"), F.col(other).alias("hub")
    ).distinct()
    if max_hub_degree is not None:
        ok = (
            e.groupBy("hub")
            .agg(F.count(F.lit(1)).alias("d"))
            .filter(F.col("d") <= max_hub_degree)
            .select("hub")
        )
        e = e.join(ok, on="hub", how="left_semi")
    a = e.select(F.col("side").alias("id_a"), "hub")
    b = e.select(F.col("side").alias("id_b"), "hub")
    return (
        a.join(b, on="hub")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("weight"))
    )


def diameter_double_sweep(graph: Graph) -> "DataFrame":
    """One row (lower_bound, start_id, far_id): the classic double-sweep
    diameter lower bound over the undirected graph.

    Beyond-reference operator: BFS from the smallest vertex id, then BFS
    from the farthest vertex found (max distance, min id tie-break);
    that second eccentricity lower-bounds the diameter and is exact on
    trees. Two bfs() runs (chunked frontier loops) + two tiny argmax
    collects — no driver-side graph data. Disconnected graphs measure the
    component containing the start vertex (unreached = excluded).
    """
    from kafka_graphs_spark.library._loop import MAX_LONG
    from kafka_graphs_spark.library.paths import bfs

    from kafka_graphs_spark.library.components import _undirected_simple_edges

    g = Graph(graph.vertices, _undirected_simple_edges(graph.edges))
    spark = graph.vertices.sparkSession
    row0 = graph.vertices.agg(F.min("id").alias("m")).collect()[0]
    if row0["m"] is None:
        return spark.createDataFrame(
            [], "lower_bound long, start_id long, far_id long"
        )
    start = row0["m"]

    def farthest(from_id):
        d = bfs(g, src_vertex_id=from_id, max_iterations=10_000)
        r = (
            d.filter(F.col("value") < MAX_LONG)
            .agg(
                F.max_by(
                    F.struct(F.col("value"), F.col("id")),
                    F.struct(F.col("value"), -F.col("id")),
                ).alias("far")
            )
            .collect()[0]["far"]
        )
        return r["id"], r["value"]

    u, _ = farthest(start)
    w, ecc = farthest(u)
    return spark.createDataFrame(
        [(int(ecc), int(u), int(w))], "lower_bound long, start_id long, far_id long"
    )


def ppmi(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    weight_col: str = "weight",
) -> "DataFrame":
    """Positive pointwise mutual information over symmetric co-occurrence
    pairs: (id_a, id_b, weight, ppmi = max(0, ln(w·T / (m_a·m_b)))).

    Beyond-reference operator — the classic reweighting that turns raw
    co-occurrence counts (e.g. :func:`bipartite_projection` output) into
    the association scores embedding trainers factorize (Levy &
    Goldberg 2014, public). T = total pair mass, m_x = mass of pairs
    containing x. Marginals are one map-side-combined aggregation over the
    doubled pair list; the total is a scalar broadcast into the plan. No
    UDFs — ln() stays in codegen.
    """
    from pyspark import StorageLevel

    from kafka_graphs_spark.library._loop import eager_checkpoint

    a, b, w = F.col(a_col), F.col(b_col), F.col(weight_col)
    # the pair table is scanned 4x (total, both marginal sides, output);
    # recomputing a quadratic co-occurrence join that many times is the
    # dominant cost, so persist it for the call's lifetime only: the
    # result is eagerly checkpointed while the cache is hot, then the
    # cache is released in `finally` so nothing stays pinned after the
    # call returns (the old version leaked the pair table forever).
    pairs.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        total = pairs.agg(F.sum(w).alias("t")).collect()[0]["t"]
        if not total:
            return pairs.select(a_col, b_col, weight_col).withColumn(
                "ppmi", F.lit(0.0)
            ).limit(0)
        sides = pairs.select(a.alias("x"), w.alias("w")).unionByName(
            pairs.select(b.alias("x"), w.alias("w"))
        )
        marg = sides.groupBy("x").agg(F.sum("w").alias("m"))
        out = (
            pairs.join(
                marg.select(F.col("x").alias(a_col), F.col("m").alias("_ma")), on=a_col
            )
            .join(marg.select(F.col("x").alias(b_col), F.col("m").alias("_mb")), on=b_col)
            .select(
                a_col,
                b_col,
                weight_col,
                F.greatest(
                    F.lit(0.0),
                    F.log(
                        w.cast("double") * F.lit(float(total))
                        / (F.col("_ma").cast("double") * F.col("_mb").cast("double"))
                    ),
                ).alias("ppmi"),
            )
        )
        return eager_checkpoint(out)
    finally:
        pairs.unpersist()


def triangle_motif_census(graph: Graph) -> "DataFrame":
    """(motif, n) — census of directed triangle motifs, standard triad
    names: 030C (3-cycle), 030T (transitive/feed-forward), 120 / 210 /
    300 (one / two / three reciprocated pairs).

    Beyond-reference operator — the motif profile (feed-forward loops vs
    cycles vs reciprocity) behind network-science dataset cards. One
    pair-state aggregation (fwd/rev flags per unordered pair), the same
    wedge-close enumeration as the triangle counter (three equi-joins on
    vertex ids, every triangle exactly once at x < y < z), then a
    map-side-combinable count per class. No UDFs, no driver data.
    """
    e = graph.edges.select("src", "dst").filter(F.col("src") != F.col("dst")).distinct()
    pair = (
        e.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            (F.col("src") < F.col("dst")).alias("is_fwd"),
        )
        .groupBy("a", "b")
        .agg(
            F.max(F.col("is_fwd")).alias("fwd"),
            F.max(~F.col("is_fwd")).alias("rev"),
        )
    )
    e1 = pair.select(F.col("a").alias("x"), F.col("b").alias("y"),
                     F.col("fwd").alias("fxy"), F.col("rev").alias("rxy"))
    e2 = pair.select(F.col("a").alias("y"), F.col("b").alias("z"),
                     F.col("fwd").alias("fyz"), F.col("rev").alias("ryz"))
    e3 = pair.select(F.col("a").alias("x"), F.col("b").alias("z"),
                     F.col("fwd").alias("fxz"), F.col("rev").alias("rxz"))
    tri = e1.join(e2, on="y").join(e3, on=["x", "z"])
    m = (
        (F.col("fxy") & F.col("rxy")).cast("int")
        + (F.col("fyz") & F.col("ryz")).cast("int")
        + (F.col("fxz") & F.col("rxz")).cast("int")
    )
    cyclic = (
        (F.col("fxy") & F.col("fyz") & ~F.col("fxz"))
        | (~F.col("fxy") & ~F.col("fyz") & F.col("fxz"))
    )
    motif = (
        F.when(m == 3, F.lit("300"))
        .when(m == 2, F.lit("210"))
        .when(m == 1, F.lit("120"))
        .when(cyclic, F.lit("030C"))
        .otherwise(F.lit("030T"))
    )
    return tri.select(motif.alias("motif")).groupBy("motif").agg(
        F.count(F.lit(1)).alias("n")
    )


def degree_histogram(graph: Graph, direction: str = "out") -> "DataFrame":
    """(degree, n_vertices) — the degree distribution, zero-degree
    vertices included.

    Dataset-card staple next to :func:`graph_statistics`. ``direction``:
    'out', 'in', or 'both' (undirected simple degree). Two
    map-side-combinable aggregations; nothing driver-side.
    """
    if direction == "out":
        keyed = graph.edges.select(F.col("src").alias("id"))
    elif direction == "in":
        keyed = graph.edges.select(F.col("dst").alias("id"))
    elif direction == "both":
        from kafka_graphs_spark.library.components import _undirected_simple_edges

        keyed = _undirected_simple_edges(graph.edges).select(F.col("src").alias("id"))
    else:
        raise ValueError("direction must be 'out', 'in', or 'both'")
    deg = keyed.groupBy("id").agg(F.count(F.lit(1)).alias("degree"))
    full = graph.vertices.select("id").join(deg, on="id", how="left").select(
        F.coalesce("degree", F.lit(0)).alias("degree")
    )
    return full.groupBy("degree").agg(F.count(F.lit(1)).alias("n_vertices"))


def reciprocity(graph: Graph) -> "DataFrame":
    """One row (n_directed, n_reciprocated, reciprocity) — the fraction of
    directed simple edges whose reverse also exists.

    n_directed counts distinct non-loop (src, dst); n_reciprocated counts
    those with (dst, src) present (each direction of a mutual pair counts,
    the standard definition). One self-semi-join on the edge key plus two
    counts; empty graphs score 0.0.
    """
    e = graph.edges.select("src", "dst").filter(F.col("src") != F.col("dst")).distinct()
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    stats = e.join(rev.withColumn("_m", F.lit(1)), on=["src", "dst"], how="left").agg(
        F.count(F.lit(1)).alias("n_directed"),
        F.sum(F.coalesce("_m", F.lit(0))).cast("long").alias("n_reciprocated"),
    )
    return stats.select(
        "n_directed",
        "n_reciprocated",
        F.when(
            F.col("n_directed") > 0,
            F.col("n_reciprocated").cast("double") / F.col("n_directed"),
        ).otherwise(F.lit(0.0)).alias("reciprocity"),
    )


def transitivity(graph: Graph) -> "DataFrame":
    """One row (n_triangles, n_wedges, transitivity) — the global
    clustering coefficient 3·T / W of the simple undirected graph.

    Beyond-reference companion to the per-vertex
    ``local_clustering_coefficient`` (reference
    io/kgraph/library/LocalClusteringCoefficient.java computes only the
    local form): W = Σ_v C(d_v, 2) is one map-side-combined aggregate
    over the degree frame; T is the same ascending wedge-close equi-join
    used by exact_triangle_count / k_truss. No driver loops, one small
    result row — at 100 TB both terms are shuffle-once aggregates.
    """
    from pyspark.sql import functions as F

    from kafka_graphs_spark.library.components import _oriented_simple_edges

    spark = graph.edges.sparkSession
    und = _oriented_simple_edges(graph.edges)
    deg = (
        und.select(F.col("a").alias("id"))
        .unionByName(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # Exact integer wedge count: `div` (integer division), not float `/` —
    # double division is exact only below 2^53 wedges, and a hub-heavy
    # 100 TB graph can exceed that (same fix as bipartiteness's exact div).
    # d*(d-1) is always even, so `div 2` is lossless.
    w = deg.agg(
        F.sum(F.expr("d * (d - 1L) div 2")).cast("long").alias("w")
    )
    e1 = und.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = und.select(F.col("a").alias("y"), F.col("b").alias("z"))
    tri = (
        e1.join(e2, on="y")
        .join(
            und.select(F.col("a").alias("x"), F.col("b").alias("z")),
            on=["x", "z"],
            how="left_semi",
        )
        .agg(F.count(F.lit(1)).alias("t"))
    )
    row = tri.crossJoin(w).collect()[0]
    t, wedges = row["t"] or 0, row["w"] or 0
    return spark.createDataFrame(
        [(t, wedges, (3.0 * t / wedges) if wedges else 0.0)],
        "n_triangles long, n_wedges long, transitivity double",
    )


def avg_neighbor_degree(graph: Graph) -> "DataFrame":
    """(id, degree, avg_nbr_degree) — each vertex's undirected simple
    degree and the mean degree of its neighbors (Barabási's knn(v); its
    per-degree aggregate is the degree-correlation curve read alongside
    :func:`graph_statistics`'s scalar assortativity).

    Same undirected-simple-degree semantics as :func:`degree_histogram`
    ('both') and k-core. One neighbor-pair self-join on the vertex key
    and two map-side-combinable aggregations; the mean is an exact
    integer-sum / count division, rounded to 6 dp. Isolated vertices are
    excluded (no neighbors — knn undefined).
    """
    from kafka_graphs_spark.library.components import _undirected_simple_edges

    nb = _undirected_simple_edges(graph.edges)
    deg = nb.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    return (
        nb.join(
            deg.select(F.col("id").alias("dst"), F.col("degree").alias("_dd")),
            on="dst",
        )
        .groupBy(F.col("src").alias("id"))
        .agg(
            F.count(F.lit(1)).alias("degree"),
            F.round(
                F.sum("_dd").cast("double") / F.count(F.lit(1)).cast("double"), 6
            ).alias("avg_nbr_degree"),
        )
    )


def rich_club(graph: Graph) -> "DataFrame":
    """(k, n_nodes, n_edges, phi) — the rich-club coefficient φ(k) of the
    simple undirected graph, one row per degree threshold k where the
    club changes (k ranges over the distinct degree values present).

    Beyond-reference companion to :func:`graph_statistics`'s scalar
    assortativity (Zhou & Mondragón's φ(k) = 2·E_{>k} / (N_{>k}·(N_{>k}−1)):
    the density of the subgraph induced by nodes of degree > k; a rising
    curve means hubs form a dense core).

    Scale shape: NO per-k subgraphs. An edge (a,b) belongs to every club
    with k < min(d_a, d_b), so E_{>k} is a tail sum over the edge-min
    histogram and N_{>k} a tail sum over the degree histogram — two
    shuffle-once histograms (each bounded by the distinct-degree count,
    O(√E) rows) theta-joined against the threshold list via broadcast.
    Rows with N_{>k} < 2 are omitted (φ undefined). φ rounded to 6 dp.
    """
    from kafka_graphs_spark.library.components import _oriented_simple_edges

    und = _oriented_simple_edges(graph.edges)
    deg = (
        und.select(F.col("a").alias("id"))
        .unionByName(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # histogram frames: tiny (one row per distinct degree / edge-min value)
    dh = deg.groupBy("d").agg(F.count(F.lit(1)).alias("_n"))
    eh = (
        und.join(deg.select(F.col("id").alias("a"), F.col("d").alias("_da")), on="a")
        .join(deg.select(F.col("id").alias("b"), F.col("d").alias("_db")), on="b")
        .select(F.least("_da", "_db").alias("_md"))
        .groupBy("_md")
        .agg(F.count(F.lit(1)).alias("_e"))
    )
    ks = dh.select(F.col("d").alias("k")).distinct()
    n_k = (
        ks.join(F.broadcast(dh), dh["d"] > F.col("k"))
        .groupBy("k")
        .agg(F.sum("_n").cast("long").alias("n_nodes"))
    )
    e_k = (
        ks.join(F.broadcast(eh), eh["_md"] > F.col("k"))
        .groupBy("k")
        .agg(F.sum("_e").cast("long").alias("n_edges"))
    )
    return (
        n_k.join(e_k, on="k", how="left")
        .filter(F.col("n_nodes") >= 2)
        .select(
            "k",
            "n_nodes",
            F.coalesce("n_edges", F.lit(0)).alias("n_edges"),
            F.round(
                F.lit(2.0) * F.coalesce("n_edges", F.lit(0))
                / (F.col("n_nodes") * (F.col("n_nodes") - F.lit(1))),
                6,
            ).alias("phi"),
        )
    )


def degree_assortativity(graph: Graph) -> "DataFrame":
    """One row (n_und_edges, assortativity) — Newman's degree
    assortativity coefficient r: the Pearson correlation between the
    degrees at the two ends of an edge, computed over the symmetrized
    simple edge list (both orientations, which makes the x/y marginals
    equal and the classic formula collapse to
    ``r = (n·Σxy − (Σx)²) / (n·Σxx − (Σx)²)``).

    All Σ terms are exact integer aggregations (degrees are ints), and
    every product runs in DECIMAL — the per-edge dx·dy / dx·dx terms are
    cast to DECIMAL(19,0) before the sum (on hub-heavy graphs, degree
    ~1e7 over 1e9+ edges, the long-typed inner sums would wrap past 2^63
    silently under non-ANSI mode), and the outer n·Σxy cross products in
    DECIMAL(38,0) — so the ONLY float op is the final division:
    bit-identical across engines and partitionings. Map-side combined
    degree count + one degree join per endpoint + one scalar aggregate;
    regular graphs (zero variance) score 0.0 by convention.
    """
    from kafka_graphs_spark.library.components import _undirected_simple_edges

    und = _undirected_simple_edges(graph.edges)
    deg = und.groupBy(F.col("src").alias("_v")).agg(
        F.count(F.lit(1)).cast("long").alias("_d")
    )
    pairs = (
        und.join(deg.select(F.col("_v").alias("src"), F.col("_d").alias("dx")), on="src")
        .join(deg.select(F.col("_v").alias("dst"), F.col("_d").alias("dy")), on="dst")
    )
    dec = "decimal(38,0)"
    d19 = "decimal(19,0)"
    sums = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("dx").cast("long").alias("sx"),
        F.sum(F.col("dx").cast(d19) * F.col("dx").cast(d19)).cast(dec).alias("sxx"),
        F.sum(F.col("dx").cast(d19) * F.col("dy").cast(d19)).cast(dec).alias("sxy"),
    )
    numer = (
        F.col("n").cast(dec) * F.col("sxy").cast(dec)
        - F.col("sx").cast(dec) * F.col("sx").cast(dec)
    )
    denom = (
        F.col("n").cast(dec) * F.col("sxx").cast(dec)
        - F.col("sx").cast(dec) * F.col("sx").cast(dec)
    )
    return sums.select(
        (F.col("n") / F.lit(2)).cast("long").alias("n_und_edges"),
        F.round(
            F.when(
                denom != 0, numer.cast("double") / denom.cast("double")
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("assortativity"),
    )


def powerlaw_alpha(graph: Graph, d_min: int = 2) -> "DataFrame":
    """One row (d_min, n_tail, alpha) — the continuous-MLE power-law
    exponent of the degree distribution (Clauset/Shalizi/Newman 2009,
    eq. 3.1): over vertices with degree >= d_min,

        alpha = 1 + n / Σ ln(d / (d_min − 1/2)).

    The scale-free check every large-graph report quotes (alpha in
    [2, 3] ~ scale-free; the estimate is only meaningful above a
    sensible d_min). Degrees come from the symmetrized simple edge
    list; the ln sum folds the SORTED (degree, count) histogram —
    distinct-degree sized, far smaller than the graph — so the float
    accumulation order is fixed across engines and partitionings.
    Empty tails (no vertex reaches d_min) score alpha 0.0.
    """
    from kafka_graphs_spark.library.components import _undirected_simple_edges

    und = _undirected_simple_edges(graph.edges)
    deg = und.groupBy(F.col("src").alias("_v")).agg(
        F.count(F.lit(1)).cast("long").alias("_d")
    )
    hist = (
        deg.filter(F.col("_d") >= d_min)
        .groupBy("_d")
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
    )
    packed = hist.agg(
        F.sum("_c").alias("_n"),
        F.sort_array(
            F.collect_list(F.struct(F.col("_d"), F.col("_c")))
        ).alias("_h"),
    )
    shift = float(d_min) - 0.5
    lnsum = F.aggregate(
        F.col("_h"),
        F.lit(0.0),
        lambda a, x: a
        + x["_c"].cast("double") * F.log(x["_d"].cast("double") / F.lit(shift)),
    )
    return packed.select(
        F.lit(int(d_min)).cast("long").alias("d_min"),
        F.coalesce("_n", F.lit(0).cast("long")).alias("n_tail"),
        F.round(
            F.when(
                F.coalesce("_n", F.lit(0)) > 0,
                F.lit(1.0) + F.col("_n").cast("double") / lnsum,
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("alpha"),
    )
