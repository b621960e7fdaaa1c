"""Greedy ½-approximation maximum weight b-matching.

Reference: io/kgraph/library/maxbmatching/MaxBMatching.java:43-201 with
edge value MBMEdgeValue (weight, state ∈ DEFAULT|PROPOSED|REMOVED|INCLUDED,
MBMEdgeValue.java) and vertex value = remaining capacity. Per superstep,
per vertex v:

  cap == 0 → send REMOVED for (and locally drop) each DEFAULT edge, halt;
  cap  > 0 → (a) apply last round's messages: PROPOSED from u with own
    edge (v,u) already PROPOSED ⇒ INCLUDED, cap−−; REMOVED from u ⇒ drop
    edge (v,u); (b) if cap still > 0, mark the top-cap available
    (DEFAULT|PROPOSED) edges by weight PROPOSED and (re-)send proposals.

Spark re-expression: each superstep is a fixed set of joins over three
DataFrames — edge states E(src,dst,w,state), capacities C(id,cap),
messages M(to,from,kind) — the reference's per-vertex max-heap top-k
(MaxBMatching.java:86-99) becomes a row_number() window over
(weight DESC, dst) per source. Tie-break note: the reference's TreeSet
comparator compares ONLY weights, silently dropping same-weight edges
from a round's proposal set; we use the deterministic (weight, dst)
order instead — identical results whenever weights are distinct.

Loop ends at fixpoint — (E, C, M) all unchanged — or max_iterations;
the reference's vote-to-halt reaches the same state (halted vertices
recompute idempotently when re-activated by duplicate proposals).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kafka_graphs_spark.graph import Graph
from kafka_graphs_spark.library._loop import ChainLoop

DEFAULT, PROPOSED, REMOVED, INCLUDED = 0, 1, 2, 3  # MBMEdgeValue.State bytes


def _advance_digested(loop: ChainLoop, df: DataFrame):
    """Advance a generation with an order-insensitive digest riding the
    materialization action: (row count, sum of row hashes). The digest is
    the fixpoint probe — a full exceptAll per round would be a shuffle;
    this is one partial-aggregated scan in the SAME job that materializes
    the cache. Collision odds are negligible for a convergence test."""
    out, row = loop.advance(
        df,
        probes=[F.sum(F.xxhash64(*df.columns).cast("decimal(38,0)")).alias("h")],
    )
    # _kgs_rows: the count ChainLoop.advance always aggregates for tuning
    return out, (row["_kgs_rows"], row["h"])


def max_b_matching(graph: Graph, max_iterations: int = 30) -> DataFrame:
    """Returns the final edge-state table (src, dst, weight, state int).

    Input: ``graph.vertices(id, value int capacity)``, ``graph.edges(src,
    dst, value double weight)`` with BOTH directions present (the
    reference operates on undirected graphs stored as directed pairs).
    The matching = rows with state == INCLUDED (3).
    """
    E = graph.edges.select(
        "src", "dst", F.col("value").cast("double").alias("w"), F.lit(DEFAULT).alias("state")
    )
    C = graph.vertices.select("id", F.col("value").cast("int").alias("cap"))
    # message frame keyed by the graph's own id type (not hardcoded long)
    id_type = dict(graph.vertices.dtypes)["id"]
    M = E.sparkSession.createDataFrame([], f"to {id_type}, sender {id_type}, kind int")

    # one ChainLoop per live frame (each retains its own last 2
    # generations; a shared loop would free E's blocks when C and M
    # advance). Only the edge loop tunes the session — E dominates.
    loop_e = ChainLoop()
    loop_c = ChainLoop(adaptive=False)
    loop_m = ChainLoop(adaptive=False)
    try:
        out = _mbm_loop(loop_e, loop_c, loop_m, E, C, M, max_iterations)
    finally:
        loop_e.release()
        loop_c.release()
        loop_m.release()
    return out


def _mbm_loop(loop_e, loop_c, loop_m, E, C, M, max_iterations):
    E, _ = loop_e.advance(E)
    C, _ = loop_c.advance(C)
    M, _ = loop_m.advance(M)
    prev_digests = None

    for _ in range(max_iterations):
        # ---- phase a: receivers apply last round's messages ----
        ev = E.join(C, E["src"] == C["id"]).select("src", "dst", "w", "state", "cap")

        inc = (
            M.filter(F.col("kind") == PROPOSED)
            .join(
                ev.filter((F.col("state") == PROPOSED) & (F.col("cap") > 0)),
                (M["to"] == ev["src"]) & (M["sender"] == ev["dst"]),
                "inner",
            )
            .select("src", "dst")
            .distinct()
        )
        rm_in = (
            M.filter(F.col("kind") == REMOVED)
            .join(ev.filter(F.col("cap") > 0), (M["to"] == ev["src"]) & (M["sender"] == ev["dst"]))
            .select("src", "dst")
            .distinct()
        )
        # capacity-0 vertices drop their DEFAULT edges locally
        rm_zero = ev.filter((F.col("cap") == 0) & (F.col("state") == DEFAULT)).select("src", "dst")

        e1 = (
            E.join(rm_in.unionByName(rm_zero).distinct(), on=["src", "dst"], how="left_anti")
            .join(inc.withColumn("_inc", F.lit(True)), on=["src", "dst"], how="left")
            .select(
                "src",
                "dst",
                "w",
                F.when(F.col("_inc"), F.lit(INCLUDED)).otherwise(F.col("state")).alias("state"),
            )
        )
        c1 = (
            C.join(inc.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("_n")),
                   on="id", how="left")
            .select("id", (F.col("cap") - F.coalesce(F.col("_n"), F.lit(0))).alias("cap"))
        )

        # ---- phase b: senders propose top-cap available edges / removals ----
        av = (
            e1.join(c1, e1["src"] == c1["id"])
            .filter((F.col("cap") > 0) & F.col("state").isin(DEFAULT, PROPOSED))
            .select("src", "dst", "w", "cap")
        )
        rk = Window.partitionBy("src").orderBy(F.desc("w"), F.asc("dst"))
        prop = av.withColumn("_r", F.row_number().over(rk)).filter(F.col("_r") <= F.col("cap"))

        e2 = (
            e1.join(prop.select("src", "dst", F.lit(True).alias("_p")), on=["src", "dst"], how="left")
            .select(
                "src",
                "dst",
                "w",
                F.when(F.col("_p") & (F.col("state") != INCLUDED), F.lit(PROPOSED))
                .otherwise(F.col("state"))
                .alias("state"),
            )
        )
        m_prop = prop.select(
            F.col("dst").alias("to"), F.col("src").alias("sender"), F.lit(PROPOSED).alias("kind")
        )
        # removal notices from capacity-0 vertices (computed on the state
        # their receivers will see: pre-update E, zero caps of C)
        m_rm = (
            rm_zero.select(F.col("dst").alias("to"), F.col("src").alias("sender"))
            .withColumn("kind", F.lit(REMOVED))
        )
        m2 = m_prop.unionByName(m_rm)

        E, d_e = _advance_digested(loop_e, e2)
        C, d_c = _advance_digested(loop_c, c1)
        M, d_m = _advance_digested(loop_m, m2)
        digests = (d_e, d_c, d_m)
        if digests == prev_digests:
            break
        prev_digests = digests

    return E.select("src", "dst", F.col("w").alias("weight"), "state").localCheckpoint(
        eager=True
    )
