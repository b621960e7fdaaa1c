"""HITS (hubs & authorities) — beyond-reference link-analysis algorithm.

Kleinberg's iteration on the directed graph: per round, authority(v) =
Σ hub(u) over in-neighbors u, then hub(u) = Σ authority(v) over
out-neighbors v. With unit initial hubs and unweighted edges every
intermediate value is an exact INTEGER (the number of alternating
out/in paths of the corresponding length), so the un-normalized scores
are bit-exactly reproducible on any engine — that integer form is what
this returns, with an optional final max-normalization for ranking use.

Scale design: each half-round is one equi-join (messages ride the edge
list) into one map-side-combinable ``groupBy().sum`` — the same shuffle
shape as PageRank. The iteration count is a small constant, so the plan
is a fixed-depth chain; scores grow like Δ^k (Δ = max degree), so for
large k callers should use ``normalize=True`` (float path, rounded) —
the exact-integer contract is for the oracle-checkable small-k profile.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_graphs_spark.graph import Graph
from kafka_graphs_spark.library._loop import sized_cache


def _hits_frame(vertices: DataFrame, edges: DataFrame, iterations: int) -> DataFrame:
    """Un-materialized HITS plan — fixed-depth chain of equi-join +
    map-side-combined sums (audited by tests/test_plans.py)."""
    hub = vertices.select("id", F.lit(1).cast("long").alias("h"))
    auth = None
    for _ in range(iterations):
        # authority step: gather hub mass along in-edges
        auth = (
            edges.join(hub, edges["src"] == hub["id"])
            .groupBy("dst")
            .agg(F.sum("h").alias("a"))
            .select(F.col("dst").alias("id"), "a")
        )
        # hub step: gather authority mass along out-edges
        hub = (
            edges.join(auth, edges["dst"] == auth["id"])
            .groupBy("src")
            .agg(F.sum("a").alias("h"))
            .select(F.col("src").alias("id"), "h")
        )
        # the joins above are the only lineage and iterations is a small
        # constant, so the plan stays bounded without per-round checkpoints
    return (
        vertices.select("id")
        .join(hub, on="id", how="left")
        .join(auth, on="id", how="left")
        .select(
            "id",
            F.coalesce("h", F.lit(0)).alias("hub"),
            F.coalesce("a", F.lit(0)).alias("authority"),
        )
    )


def hits(graph: Graph, iterations: int = 3, normalize: bool = False) -> DataFrame:
    """(id, hub, authority) after ``iterations`` full HITS rounds.

    ``normalize=False`` (default): exact long path-counts.
    ``normalize=True``: both scores divided by their global max (one tiny
    scalar agg each) and rounded to 9 dp — the cross-engine-safe float
    form.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    edges, release = sized_cache(graph.edges.select("src", "dst"))
    try:
        out = _hits_frame(graph.vertices, edges, iterations)
        if normalize:
            m = out.agg(
                F.max("hub").alias("mh"), F.max("authority").alias("ma")
            ).collect()[0]
            # `or 1.0` also covers the empty graph (max over no rows = None)
            mh = float(m["mh"] or 1.0)
            ma = float(m["ma"] or 1.0)
            out = out.select(
                "id",
                F.round(F.col("hub") / F.lit(mh), 9).alias("hub"),
                F.round(F.col("authority") / F.lit(ma), 9).alias("authority"),
            )
        out = out.localCheckpoint(eager=True)
    finally:
        release()
    return out


def katz_centrality(
    graph: Graph, alpha: float = 0.125, iterations: int = 3
) -> DataFrame:
    """(id, katz) — truncated Katz centrality Σ_{k=1..K} α^k · |walks of
    length k ending at the vertex|.

    Beyond-reference companion to :func:`hits`. The walk counts are exact
    integers and α^k is exact when α is dyadic (the 0.125 default), so
    the truncated sum is a bit-reproducible double with a closed-form SQL
    twin — same oracle discipline as HITS. Each term is one equi-join of
    the previous term against the edge list into a map-side-combined sum;
    K is a small constant, so the plan is a fixed-depth chain. For the
    untruncated fixed point use a larger K (the tail is geometric in
    α·Δ); magnitudes must stay under 2^53 for exactness — same caveat as
    hits().
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    if not (0 < alpha < 1):
        raise ValueError("alpha must be in (0, 1)")
    edges, release = sized_cache(graph.edges.select("src", "dst"))
    try:
        out = _katz_frame(graph.vertices, edges, alpha, iterations).localCheckpoint(
            eager=True
        )
    finally:
        release()
    return out


def _katz_frame(
    vertices: DataFrame, edges: DataFrame, alpha: float, iterations: int
) -> DataFrame:
    """Un-materialized Katz plan — K equi-join/sum terms unioned into ONE
    final aggregation (audited by tests/test_plans.py)."""
    # walks[k](v) = number of length-k walks ending at v
    walks = vertices.select("id", F.lit(1).cast("long").alias("n"))
    terms = []
    for k in range(1, iterations + 1):
        walks = (
            edges.join(walks, edges["src"] == walks["id"])
            .groupBy("dst")
            .agg(F.sum("n").alias("n"))
            .select(F.col("dst").alias("id"), "n")
        )
        terms.append(walks.select("id", (F.col("n") * F.lit(alpha**k)).alias("t")))
    total = terms[0]
    for t in terms[1:]:
        total = total.unionByName(t)
    total = total.groupBy("id").agg(F.sum("t").alias("t"))
    return (
        vertices.select("id")
        .join(total, on="id", how="left")
        .select("id", F.coalesce("t", F.lit(0.0)).alias("katz"))
    )


def eigenvector_centrality(
    graph: Graph, iterations: int = 4, normalize: bool = True
) -> DataFrame:
    """(id, score) — power-iteration eigenvector centrality: score is the
    ``iterations``-step walk count ``(Aᵀ)^t · 1`` (mass flows src→dst),
    L2-normalized once at the end.

    Scaling commutes with the linear iteration, so a single final
    normalization equals per-step normalization EXACTLY while keeping
    every intermediate an exact integer — the same cross-engine
    bit-reproducibility discipline as :func:`hits` and
    :func:`katz_centrality` (one unrolled equi-join + map-side-combined
    sum per step; counts and the Σn² norm must stay under 2^53/2^63,
    callers with hub-heavy graphs at large ``t`` should pre-scale or
    keep ``t`` small — the standard power-iteration profile).
    ``normalize=False`` returns the raw integer walk counts.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    edges, release = sized_cache(graph.edges.select("src", "dst"))
    try:
        walks = graph.vertices.select("id", F.lit(1).cast("long").alias("n"))
        for _ in range(iterations):
            walks = (
                edges.join(walks, edges["src"] == walks["id"])
                .groupBy("dst")
                .agg(F.sum("n").alias("n"))
                .select(F.col("dst").alias("id"), "n")
            )
        out = (
            graph.vertices.select("id")
            .join(walks, on="id", how="left")
            .select("id", F.coalesce("n", F.lit(0)).cast("long").alias("n"))
        )
        if normalize:
            z = out.agg(
                F.sqrt(F.sum(F.col("n") * F.col("n")).cast("double")).alias("z")
            ).collect()[0]["z"]
            z = float(z) if z else 1.0
            out = out.select(
                "id", F.round(F.col("n") / F.lit(z), 6).alias("score")
            )
        else:
            out = out.select("id", F.col("n").cast("double").alias("score"))
        out = out.localCheckpoint(eager=True)
    finally:
        release()
    return out
