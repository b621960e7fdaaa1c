"""In-session interleaved A/B/C of the frontier-loop state-merge shape.

Arms (same relaxation semantics, different per-round merge):
  dense   — O(|V|) state, msgs LEFT-joined in (broadcastable, no state
            shuffle) — the pre-r13 shape
  sparse  — O(|reached|) state, msgs FULL-OUTER-joined (SMJ shuffle per
            round) — the r13 shape under test
  unionagg— O(|reached|) state, merge = (state ∪ raw msgs).groupBy(id)
            with map-side partial agg: ONE shuffle, NO join

Usage: python scripts/temporal_merge_ab.py [reps] [SF_DIR]
Prints one JSON line per (rep, arm): seconds, rounds (chunk probes),
result checksum — checksums must agree across arms.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from kafka_graphs_spark.graph import Graph
from kafka_graphs_spark.library._loop import MAX_LONG, message_loop, sized_cache
from kafka_graphs_spark.library import paths as P


def arrival(graph, src_vertex_id, start_time, max_iterations, arm, counter):
    edges, release_edges = sized_cache(
        graph.edges.select("src", "dst", F.col("value").cast("long").alias("t"))
    )
    if arm == "dense":
        state = graph.vertices.select(
            "id",
            F.when(F.col("id") == src_vertex_id, F.lit(int(start_time)).cast("long"))
            .otherwise(F.lit(MAX_LONG)).alias("value"),
            (F.col("id") == src_vertex_id).alias("_changed"),
        )
    else:
        state = graph.vertices.filter(F.col("id") == src_vertex_id).select(
            "id", F.lit(int(start_time)).cast("long").alias("value"),
            F.lit(True).alias("_changed"),
        )

    def msgs_of(frontier):
        return (
            frontier.join(
                edges,
                (frontier["id"] == edges["src"]) & (edges["t"] >= frontier["value"]),
            )
            .select(F.col("dst").alias("id"), "t")
        )

    def step(state, _it):
        counter[0] += 1
        frontier = state.filter(F.col("_changed")).select("id", "value")
        if arm == "unionagg":
            return (
                state.select("id", "value", F.lit(None).cast("long").alias("m"))
                .unionByName(
                    msgs_of(frontier).select(
                        "id", F.lit(None).cast("long").alias("value"),
                        F.col("t").alias("m"),
                    )
                )
                .groupBy("id")
                .agg(F.min("value").alias("_old"), F.min("m").alias("_m"))
                .select(
                    "id",
                    F.least(
                        F.coalesce(F.col("_old"), F.lit(MAX_LONG)),
                        F.coalesce(F.col("_m"), F.lit(MAX_LONG)),
                    ).alias("value"),
                    (F.col("_m") < F.coalesce(F.col("_old"), F.lit(MAX_LONG))).alias("_changed"),
                )
            )
        msgs = msgs_of(frontier).groupBy("id").agg(F.min("t").alias("t"))
        if arm == "dense":
            return state.join(msgs, on="id", how="left").select(
                "id",
                F.when(F.col("t") < F.col("value"), F.col("t"))
                .otherwise(F.col("value")).alias("value"),
                (F.col("t") < F.col("value")).alias("_changed"),
            )
        return state.join(msgs, on="id", how="full_outer").select(
            "id",
            F.least(
                F.coalesce(F.col("value"), F.lit(MAX_LONG)),
                F.coalesce(F.col("t"), F.lit(MAX_LONG)),
            ).alias("value"),
            (F.col("t") < F.coalesce(F.col("value"), F.lit(MAX_LONG))).alias("_changed"),
        )

    loop = message_loop(edges)
    try:
        state = P._frontier_loop(loop, state, step, max_iterations)
        if arm == "dense":
            result = state.select("id", "value").localCheckpoint(eager=True)
        else:
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


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .appName("temporal_merge_ab")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    vertices, sym = entry._ec_temporal(spark, sf_dir)
    vertices = vertices.persist(); vertices.count()
    sym = sym.persist(); sym.count()
    g = Graph(vertices, sym)

    arms = ["dense", "sparse", "unionagg"]
    # warm-up each arm once on a 2-row graph so JIT is out of the timers
    tiny = spark.createDataFrame([(0, 1, 5)], "src long, dst long, value long")
    tg = Graph.from_edges(tiny, F.lit(0))
    for arm in arms:
        arrival(tg, 0, 0, 5, arm, [0]).count()

    for rep in range(reps):
        for arm in arms:
            counter = [0]
            spark.sparkContext.setJobDescription(f"{arm}:{rep}")
            t0 = time.time()
            res = arrival(g, 0, 0, 500, arm, counter)
            chk = res.agg(
                F.sum(F.when(F.col("value") != MAX_LONG, F.col("value"))).alias("s"),
                F.sum(F.when(F.col("value") != MAX_LONG, 1).otherwise(0)).alias("n"),
            ).collect()[0]
            print(json.dumps({
                "rep": rep, "arm": arm, "sec": round(time.time() - t0, 2),
                "rounds": counter[0], "reached": chk["n"], "sum": str(chk["s"]),
            }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
