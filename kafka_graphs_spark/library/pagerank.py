"""PageRank / personalized PageRank — the reference's exact delta recurrence.

Reference: io/kgraph/library/PageRank.java:32-112. This is NOT the textbook
``0.15 + 0.85·Σ`` form (SURVEY.md §2.8):

- vertices start at (rank=0, delta=0); personalized source at (0, −∞)
  (PageRankTest.java:213-215).
- superstep 0: out-edge weights normalized to 1/outDegree
  (setNewEdgeValue) and the initial message is re-sent to self. Initial
  message = resetProb/(1−resetProb), personalized: 0.0
  (PageRankTest.java:96, :232).
- superstep ≥1: newRank = oldRank + (1−resetProb)·Σmessages
  (personalized source first activation: newRank = 1.0);
  delta = newRank − oldRank; send delta·edgeWeight along out-edges only
  where delta > tolerance; vote to halt.
- run(maxIterations) executes update supersteps 1..maxIterations.

Spark: message exchange = senders ⋈ normalized-edges → groupBy(dst).sum —
sum-combined (map-side partial agg). Vertices that receive no messages
keep their (rank, delta) untouched, matching vote-to-halt semantics.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_graphs_spark.graph import Graph
from kafka_graphs_spark.library._loop import INF, ChainLoop, message_loop, sized_cache


def pagerank(
    graph: Graph,
    tolerance: float = 0.0001,
    reset_probability: float = 0.15,
    src_vertex_id=None,
    max_iterations: int = 20,
    weighted: bool = False,
    src_condition=None,
) -> DataFrame:
    """Returns (id, rank double, delta double) after the delta iteration.

    ``max_iterations`` counts update supersteps like the reference's
    ``run(maxIterations)`` (supersteps 1..N after the normalization step 0).

    ``weighted=True`` (beyond-reference) makes the transition probability
    proportional to the edge value instead of uniform: the superstep-0
    normalization becomes value/Σ(out-values). Edge values must be
    positive — zero-or-negative weights would corrupt the distribution
    silently, so the caller owns that contract (documented, not probed:
    a validation pass would cost a full scan per call).
    """
    # src_condition (beyond-reference): an arbitrary boolean Column over
    # ``id`` marking the personalization source(s) — lets struct-keyed
    # callers (ppr_multi) seed per-key sources where a literal id can't
    personalized = src_vertex_id is not None or src_condition is not None
    init_msg = 0.0 if personalized else reset_probability / (1.0 - reset_probability)
    damp = 1.0 - reset_probability

    # superstep 0: normalize out-edge weights to 1/outDegree — or to
    # value/Σvalue in weighted mode (PageRank.java:63-71 via
    # cb.setNewEdgeValue)
    if weighted:
        out_w = graph.edges.groupBy("src").agg(
            F.sum(F.col("value").cast("double")).alias("_wsum")
        )
        normalized = (
            graph.edges.select("src", "dst", F.col("value").cast("double").alias("_v"))
            .join(out_w, on="src")
            .select("src", "dst", (F.col("_v") / F.col("_wsum")).alias("w"))
        )
    else:
        out_deg = graph.edges.groupBy("src").agg(F.count(F.lit(1)).alias("_deg"))
        normalized = (
            graph.edges.select("src", "dst")
            .join(out_deg, on="src")
            .select("src", "dst", (F.lit(1.0) / F.col("_deg")).alias("w"))
        )
    edges_w, release_edges = sized_cache(normalized)

    state = graph.vertices.select(
        "id",
        F.lit(0.0).alias("rank"),
        (
            F.when(
                src_condition
                if src_condition is not None
                else (F.col("id") == src_vertex_id),
                F.lit(-INF),
            ).otherwise(F.lit(0.0))
            if personalized
            else F.lit(0.0)
        ).alias("delta"),
    )
    loop = message_loop(edges_w)
    try:
        result = _pagerank_loop(
            loop, state, edges_w, init_msg, damp, tolerance, max_iterations
        )
    finally:
        loop.release()
        release_edges()
    return result


def _pagerank_loop(loop, state, edges_w, init_msg, damp, tolerance, max_iterations):
    state, _ = loop.advance(state)

    # superstep 0 re-sends the initial message to self → at superstep 1
    # every vertex receives exactly init_msg (PageRank.java:72-75).
    msgs = state.select("id", F.lit(init_msg).alias("m"))

    # sender predicate: only vertices that computed this superstep AND moved
    # by more than tolerance send (PageRank.java:99-106)
    is_sender = F.col("_recv") & (F.col("delta") > tolerance)

    it = 0
    while it < max_iterations:
        it += 1
        agg = msgs.groupBy("id").agg(F.sum("m").alias("msum"))
        new_state = state.join(agg, on="id", how="left").select(
            "id",
            F.when(F.col("msum").isNull(), F.col("rank"))
            .when(F.col("delta") == -INF, F.lit(1.0))
            .otherwise(F.col("rank") + F.lit(damp) * F.col("msum"))
            .alias("rank"),
            F.col("rank").alias("_old_rank"),
            F.col("delta").alias("_old_delta"),
            F.col("msum"),
        ).select(
            "id",
            "rank",
            # non-receivers do not compute: (rank, delta) untouched (vote-to-halt)
            F.when(F.col("msum").isNull(), F.col("_old_delta"))
            .otherwise(F.col("rank") - F.col("_old_rank"))
            .alias("delta"),
            F.col("msum").isNotNull().alias("_recv"),
        )
        # ONE action: materialize the superstep + count senders (termination)
        state, row = loop.advance(
            new_state,
            probes=[F.sum(F.when(is_sender, 1).otherwise(0)).alias("n_senders")],
        )
        if it < max_iterations and not row["n_senders"]:
            break
        senders = state.filter(is_sender)
        msgs = senders.join(edges_w, senders["id"] == edges_w["src"]).select(
            F.col("dst").alias("id"), (F.col("delta") * F.col("w")).alias("m")
        )
    return state.select("id", F.col("rank").alias("value"), "delta").localCheckpoint(
        eager=True
    )


def ppr_multi(
    graph: Graph,
    seeds,
    tolerance: float = 0.0001,
    reset_probability: float = 0.15,
    max_iterations: int = 20,
    weighted: bool = False,
) -> DataFrame:
    """(id, seed, value, delta) — personalized PageRank from EVERY seed in
    ONE distributed run (the mssp batching trick applied to PPR): the
    vertex key becomes struct(seed, vid), edges replicate per seed, and
    the single delta iteration relaxes all personalizations at once —
    no per-seed job submission, no driver loop over seeds.

    Beyond-reference (PageRank.java personalizes one source per run).
    Cost: |edges| x |seeds| message rows — batch seeds in groups sized to
    the cluster; the alternative (per-seed jobs) pays the full scheduling
    and scan cost per seed instead. Semantics per seed are IDENTICAL to
    ``pagerank(src_vertex_id=seed)`` (same recurrence, struct keys
    compare seed-first so personalizations never mix).
    """
    seeds = list(seeds)
    if not seeds:
        raise ValueError("ppr_multi needs at least one seed")
    seed_arr = F.array(*[F.lit(s) for s in seeds])
    e = graph.edges.select(
        F.explode(seed_arr).alias("_seed"), "src", "dst", "value"
    ).select(
        F.struct(F.col("_seed").alias("seed"), F.col("src").alias("vid")).alias("src"),
        F.struct(F.col("_seed").alias("seed"), F.col("dst").alias("vid")).alias("dst"),
        "value",
    )
    v = graph.vertices.select(
        F.explode(seed_arr).alias("_seed"), "id"
    ).select(
        F.struct(F.col("_seed").alias("seed"), F.col("id").alias("vid")).alias("id"),
        F.lit(0.0).alias("value"),
    )
    out = pagerank(
        Graph(v, e),
        tolerance=tolerance,
        reset_probability=reset_probability,
        max_iterations=max_iterations,
        weighted=weighted,
        src_condition=F.col("id.vid") == F.col("id.seed"),
    )
    return out.select(
        F.col("id.vid").alias("id"),
        F.col("id.seed").alias("seed"),
        "value",
        "delta",
    )
