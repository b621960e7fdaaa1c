"""In-session interleaved A/B/C of sssp's per-round state-merge shape on
the bench event-chain graph.

Arms: dense (pre-r13 O(|V|) left join), sparse (r13 full_outer),
unionagg (sparse state, merge = union + groupBy, no join).

Usage: python scripts/sssp_merge_ab.py [reps] [SF_DIR]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from kafka_graphs_spark.library._loop import INF, message_loop, sized_cache
from kafka_graphs_spark.library import paths as P


def run_sssp(graph, src_vertex_id, max_iterations, arm, counter):
    edges, release_edges = sized_cache(
        graph.edges.select("src", "dst", F.col("value").cast("double").alias("w"))
    )
    if arm == "dense":
        state = graph.vertices.select(
            "id",
            F.when(F.col("id") == src_vertex_id, F.lit(0.0))
            .otherwise(F.lit(INF)).alias("value"),
            (F.col("id") == src_vertex_id).alias("_changed"),
        )
    else:
        state = graph.vertices.filter(F.col("id") == src_vertex_id).select(
            "id", F.lit(0.0).alias("value"), F.lit(True).alias("_changed")
        )

    def raw_msgs(frontier):
        return frontier.join(edges, frontier["id"] == edges["src"]).select(
            F.col("dst").alias("id"), (F.col("value") + F.col("w")).alias("d")
        )

    def step(state, _it):
        counter[0] += 1
        frontier = state.filter(F.col("_changed")).select("id", "value")
        if arm == "unionagg":
            return (
                state.select("id", "value", F.lit(None).cast("double").alias("d"))
                .unionByName(
                    raw_msgs(frontier).select(
                        "id", F.lit(None).cast("double").alias("value"), "d"
                    )
                )
                .groupBy("id")
                .agg(F.min("value").alias("_old"), F.min("d").alias("_d"))
                .select(
                    "id",
                    F.least(
                        F.coalesce(F.col("_old"), F.lit(INF)),
                        F.coalesce(F.col("_d"), F.lit(INF)),
                    ).alias("value"),
                    (F.col("_d") < F.coalesce(F.col("_old"), F.lit(INF))).alias("_changed"),
                )
            )
        msgs = raw_msgs(frontier).groupBy("id").agg(F.min("d").alias("d"))
        if arm == "dense":
            return state.join(msgs, on="id", how="left").select(
                "id",
                F.least(F.col("value"), F.coalesce("d", F.col("value"))).alias("value"),
                (F.coalesce("d", F.lit(INF)) < F.col("value")).alias("_changed"),
            )
        return state.join(msgs, on="id", how="full_outer").select(
            "id",
            F.least(
                F.coalesce(F.col("value"), F.lit(INF)),
                F.coalesce(F.col("d"), F.lit(INF)),
            ).alias("value"),
            (F.col("d") < F.coalesce(F.col("value"), F.lit(INF))).alias("_changed"),
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
                .select("id", F.coalesce(F.col("value"), F.lit(INF)).alias("value"))
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
        .appName("sssp_merge_ab")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from kafka_graphs_spark import datasets
    from kafka_graphs_spark.graph import Graph

    ec = datasets.event_chain_graph(spark, sf_dir)
    ec.vertices.persist().count(); ec.edges.persist().count()
    src = datasets.chain_sources(spark, sf_dir, 1)[0]

    tiny = spark.createDataFrame([(0, 1, 1.0)], "src long, dst long, value double")
    tg = Graph.from_edges(tiny, F.lit(0.0))
    for arm in ("dense", "sparse", "unionagg"):
        run_sssp(tg, 0, 5, arm, [0]).count()

    for rep in range(reps):
        for arm in ("dense", "sparse", "unionagg"):
            counter = [0]
            spark.sparkContext.setJobDescription(f"{arm}:{rep}")
            t0 = time.time()
            res = run_sssp(ec, src, 500, arm, counter)
            chk = res.agg(
                F.sum(F.when(~F.col("value").isin(INF), F.col("value"))).alias("s"),
                F.sum(F.when(F.col("value") != INF, 1).otherwise(0)).alias("n"),
            ).collect()[0]
            print(json.dumps({
                "rep": rep, "arm": arm, "sec": round(time.time() - t0, 2),
                "rounds": counter[0], "reached": chk["n"], "sum": str(chk["s"]),
            }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
