"""Centrality measures — closeness and (sampled) Brandes betweenness.

Beyond-reference operators (the reference library stops at PageRank /
SybilRank for importance ranking); both are standard centrality surface a
graph-analytics user expects.

- Closeness rides the existing MSSP runtime: one multi-landmark
  shortest-path pass, then a per-vertex harmonic reduction. Exact when
  ``landmarks`` = all vertices; with a sample it is the standard
  landmark estimate.
- Betweenness is Brandes' algorithm (forward BFS with shortest-path
  counting, backward dependency accumulation), run for ALL sources in
  one DataFrame keyed (source, vertex) — the MSSP trick applied to both
  phases. Unweighted/BFS semantics. Exact when ``sources`` covers every
  vertex; a sample gives the Brandes–Pich estimator (scaled by n/|S|).

Scale shape: state is |S|·|reached| rows (sparse — only visited pairs
exist); every round is equi-joins + map-side-combinable sums via
ChainLoop (one action per generation, bounded plans). Round count is the
graph diameter for each phase — the same bound SSSP/BFS already carry.
"""

from __future__ import annotations

from typing import Iterable, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_graphs_spark.graph import Graph
from kafka_graphs_spark.library._loop import ChainLoop, sized_cache
from kafka_graphs_spark.library.paths import mssp

# exact mode collects the full id list to the driver AND creates |V|·|V|
# state — sane for analysis-sized graphs only; big graphs must sample.
MAX_EXACT_SOURCES = 100_000


def _all_vertex_ids(graph: Graph) -> list:
    n = graph.vertices.count()
    if n > MAX_EXACT_SOURCES:
        raise ValueError(
            f"exact centrality over {n} vertices would create n^2 state; "
            "pass a sampled sources/landmarks list (estimates scale by n/|S|)"
        )
    return [r["id"] for r in graph.vertices.select("id").collect()]


def _sample_ids(graph, n: int, seed: int) -> list:
    """Deterministic id sample: the ``n`` ids with the smallest
    ``md5(id || ':' || seed)`` — a distributed top-n (only the chosen ids
    reach the driver), reproducible in any engine with md5."""
    return [
        r["id"]
        for r in graph.vertices.select("id")
        .orderBy(
            F.md5(F.concat(F.col("id").cast("string"), F.lit(f":{seed}"))),
            F.col("id"),
        )
        .limit(n)
        .collect()
    ]


def _landmark_prep(graph, landmarks, directed, n_sample=None, seed=42):
    """Shared closeness/harmonic preamble: sorted deduped landmarks (dups
    would collide in the mssp map) and — for undirected semantics — the
    deterministically symmetrized weighted graph (min weight per ordered
    pair; dropDuplicates would keep a partition-order-dependent value)."""
    if landmarks is None:
        if n_sample is not None:
            landmarks = _sample_ids(graph, n_sample, seed)
        else:
            landmarks = _all_vertex_ids(graph)
    landmarks = sorted(set(landmarks))
    g = graph
    if not directed:
        e = graph.edges.select("src", "dst", "value")
        g = Graph(
            graph.vertices,
            e.unionByName(
                e.select(
                    F.col("dst").alias("src"), F.col("src").alias("dst"), "value"
                )
            )
            .groupBy("src", "dst")
            .agg(F.min("value").alias("value")),
        )
    return g, landmarks


def closeness_centrality(
    graph: Graph,
    landmarks: Optional[Iterable] = None,
    n_sample_landmarks: Optional[int] = None,
    sample_seed: int = 42,
    max_iterations: int = 50,
    directed: bool = False,
) -> DataFrame:
    """(id, closeness) — |reached landmarks ≠ self| / Σ distance to them.

    Uses edge values as weights (pass unit weights for hop counting).
    ``landmarks=None`` uses every vertex (exact closeness; |V|² state —
    fine for moderate graphs, sample for the big ones). ``directed=False``
    (default, matching betweenness) symmetrizes the edge set first;
    ``directed=True`` gives in-closeness under the landmark distances
    d(s, v). Vertices reaching no landmark (or only themselves) get 0.0.
    """
    g, landmarks = _landmark_prep(
        graph, landmarks, directed, n_sample_landmarks, sample_seed
    )
    dists = mssp(g, landmarks, max_iterations=max_iterations)
    per = (
        dists.select("id", F.explode("value").alias("s", "d"))
        .filter(~F.col("d").eqNullSafe(F.lit(float("inf"))))
        .filter(F.col("s") != F.col("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("k"), F.sum("d").alias("total"))
    )
    return (
        graph.vertices.select("id")
        .join(per, on="id", how="left")
        .select(
            "id",
            F.when(
                F.coalesce("total", F.lit(0.0)) > 0.0,
                F.col("k").cast("double") / F.col("total"),
            )
            .otherwise(F.lit(0.0))
            .alias("closeness"),
        )
    )


def harmonic_centrality(
    graph: Graph,
    landmarks: Optional[Iterable] = None,
    n_sample_landmarks: Optional[int] = None,
    sample_seed: int = 42,
    max_iterations: int = 50,
    directed: bool = False,
) -> DataFrame:
    """(id, harmonic) — Σ 1/d(landmark, v) over reached landmarks ≠ self.

    Beyond-reference companion to :func:`closeness_centrality` (same MSSP
    runtime, same landmark sampling = the scale path): harmonic centrality
    is the disconnected-robust variant — unreachable pairs contribute 0
    instead of poisoning the mean, so it needs no per-component
    normalization (Boldi & Vigna 2014, public). Edge values are weights;
    unit weights give the hop-count form.
    """
    g, landmarks = _landmark_prep(
        graph, landmarks, directed, n_sample_landmarks, sample_seed
    )
    dists = mssp(g, landmarks, max_iterations=max_iterations)
    per = (
        dists.select("id", F.explode("value").alias("s", "d"))
        .filter(~F.col("d").eqNullSafe(F.lit(float("inf"))))
        .filter((F.col("s") != F.col("id")) & (F.col("d") > 0.0))
        .groupBy("id")
        .agg(F.sum(F.lit(1.0) / F.col("d")).alias("h"))
    )
    return (
        graph.vertices.select("id")
        .join(per, on="id", how="left")
        .select("id", F.coalesce("h", F.lit(0.0)).alias("harmonic"))
    )


def betweenness_centrality(
    graph: Graph,
    sources: Optional[Iterable] = None,
    max_iterations: int = 100,
    directed: bool = False,
    n_sample_sources: Optional[int] = None,
    sample_seed: int = 42,
) -> DataFrame:
    """(id, betweenness) — Brandes dependency accumulation, BFS semantics.

    ``sources=None`` runs from every vertex (exact). ``directed=False``
    (default) symmetrizes the edge set and halves the pair-dependency sum
    (each unordered pair is counted from both endpoints); sampled source
    sets are scaled by n/|S| (Brandes–Pich estimator), which is exactly
    1 when sources = all.

    ``n_sample_sources``: the 100 TB path — instead of erroring past
    ``MAX_EXACT_SOURCES``, draw that many sources deterministically (the
    ids with the smallest ``md5(id || ':' || seed)``, a distributed
    top-n; only the n chosen ids reach the driver) and return the scaled
    Brandes–Pich estimate. Engine-reproducible: the same md5 order is
    expressible in any SQL engine.
    """
    spark = graph.vertices.sparkSession
    e = graph.edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    if not directed:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    und, release = sized_cache(e.distinct())

    n_vertices = graph.vertices.count()
    if sources is None:
        if n_sample_sources is not None:
            sources = _sample_ids(graph, n_sample_sources, sample_seed)
        else:
            sources = _all_vertex_ids(graph)
    sources = sorted(set(sources))
    if not sources:
        raise ValueError("betweenness_centrality needs at least one source")
    scale = float(n_vertices) / len(sources)

    id_type = dict(graph.vertices.dtypes)["id"]
    init = spark.createDataFrame([(s,) for s in sources], f"s {id_type}").select(
        "s",
        F.col("s").alias("v"),
        F.lit(0).cast("long").alias("dist"),
        F.lit(1).cast("long").alias("sigma"),
        F.lit(True).alias("frontier"),
    )

    loop = ChainLoop()
    try:
        # ---- forward: BFS levels with shortest-path counting ----
        state, row = loop.advance(
            init, probes=[F.sum(F.col("frontier").cast("long")).alias("_active")]
        )
        depth = 0
        while row["_active"] and depth < max_iterations:
            depth += 1
            msgs = (
                state.filter("frontier")
                .join(und, state["v"] == und["src"])
                .select("s", F.col("dst").alias("v"), "sigma")
            )
            arrivals = msgs.groupBy("s", "v").agg(F.sum("sigma").alias("sigma"))
            fresh = arrivals.join(
                state.select("s", "v"), on=["s", "v"], how="left_anti"
            ).select(
                "s", "v", F.lit(depth).cast("long").alias("dist"), "sigma",
                F.lit(True).alias("frontier"),
            )
            nxt = state.select(
                "s", "v", "dist", "sigma", F.lit(False).alias("frontier")
            ).unionByName(fresh)
            state, row = loop.advance(
                nxt, probes=[F.sum(F.col("frontier").cast("long")).alias("_active")]
            )
        if row["_active"]:
            raise RuntimeError(
                f"betweenness forward phase did not terminate in {max_iterations} levels"
            )
        max_depth = depth - 1 if depth > 0 else 0

        # ---- backward: dependency accumulation, deepest level first ----
        state = state.select("s", "v", "dist", "sigma").withColumn(
            "delta", F.lit(0.0)
        )
        state, _ = loop.advance(state)
        for level in range(max_depth, 0, -1):
            cur = state.filter(F.col("dist") == level).select(
                "s",
                F.col("v").alias("w"),
                F.col("sigma").alias("sigma_w"),
                F.col("delta").alias("delta_w"),
            )
            # predecessors: u --edge--> w with dist(s,u) == level-1
            cand = cur.join(und, cur["w"] == und["dst"]).select(
                "s", F.col("src").alias("v"), "sigma_w", "delta_w"
            )
            contrib = (
                cand.join(
                    state.select("s", "v", "dist", F.col("sigma").alias("sigma_u")),
                    on=["s", "v"],
                )
                .filter(F.col("dist") == level - 1)
                .select(
                    "s", "v",
                    (
                        F.col("sigma_u").cast("double")
                        / F.col("sigma_w")
                        * (F.lit(1.0) + F.col("delta_w"))
                    ).alias("add"),
                )
                .groupBy("s", "v")
                .agg(F.sum("add").alias("add"))
            )
            nxt = (
                state.join(contrib, on=["s", "v"], how="left")
                .select(
                    "s", "v", "dist", "sigma",
                    (F.col("delta") + F.coalesce("add", F.lit(0.0))).alias("delta"),
                )
            )
            state, _ = loop.advance(nxt)

        pair_factor = 1.0 if directed else 2.0
        out = (
            graph.vertices.select("id")
            .join(
                state.filter(F.col("v") != F.col("s"))
                .groupBy(F.col("v").alias("id"))
                .agg(F.sum("delta").alias("_dep")),
                on="id",
                how="left",
            )
            .select(
                "id",
                (
                    F.coalesce("_dep", F.lit(0.0)) * F.lit(scale) / F.lit(pair_factor)
                ).alias("betweenness"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        loop.release()
        release()
    return out
