"""ALS half-step profiler at a true larger SF (r9 verdict #5).

Measures the warm per-half-step wall time of the ALS gather+solve
mapInPandas stage on the .scratch/sf1.0 ratings shape (6.0M ratings,
10k users, 200k items, dim 8) — the setup whose r9 profile attributed
~12 s/half-step steady state to nested array<array<double>> Arrow
serialization. Run before/after a representation change; same session,
3 repeats, report each (first is JIT/fork warm-up).

Usage: python scripts/als_profile.py [SF_DIR] [DIM] [REPS]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf1.0"
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("als-profile")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from kafka_graphs_spark.graph import Graph
    from kafka_graphs_spark.library import als
    from kafka_graphs_spark.library.cf import _gathered, _init_factors, _FACTORS_SCHEMA

    ratings = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy(F.col("l_suppkey").alias("src"),
                 (F.col("l_partkey") + 1000000).alias("dst"))
        .agg((F.avg("l_quantity") / 10.0).alias("value"))
    )
    edges = ratings.select("src", "dst", F.col("value").cast("double").alias("value")).persist()
    n = edges.count()
    users = edges.select(F.col("src").alias("id")).distinct()
    print(f"ratings={n} users={users.count()} "
          f"items={edges.select('dst').distinct().count()} dim={dim}")

    user_f = _init_factors(users, dim, 11).persist()
    user_f.count()
    user_f32 = _init_factors(users, dim, 11, dtype="float32").persist()
    user_f32.count()

    # isolate the gather+solve half-step (items side), warm, reps times,
    # in BOTH representations: the pre-r10 nested array<array<double>>
    # gather (reconstructed inline) and the r10 flat array<double> one.
    import kafka_graphs_spark.library.cf as cf

    def nested_gathered():
        f = F.broadcast(user_f.select(F.col("id").alias("_s"), "vec"))
        j = edges.select(
            F.col("src").alias("_s"), F.col("dst").alias("id"),
            F.col("value").cast("double").alias("_r"),
        ).join(f, on="_s")
        pairs = F.array_sort(F.collect_list(F.struct(
            F.col("_s").alias("s"), F.col("vec").alias("v"), F.col("_r").alias("r"))))
        return j.groupBy("id").agg(
            F.transform(pairs, lambda p: p["v"]).alias("vecs"),
            F.transform(pairs, lambda p: p["r"]).alias("ratings"),
        )

    def nested_solve(batches):
        import numpy as np
        import pandas as pd
        eye = np.eye(dim)
        for pdf in batches:
            n_rows = len(pdf)
            all_vecs = pdf["vecs"].to_numpy()
            all_rat = pdf["ratings"].to_numpy()
            vec_out = [None] * n_rows
            lens = np.fromiter((len(r) for r in all_rat), dtype="int64", count=n_rows)
            order = np.argsort(lens, kind="stable")
            for start in range(0, n_rows, 1024):
                idx = order[start:start + 1024]
                ns = lens[idx]
                b, n_max = len(idx), int(ns.max()) if len(idx) else 0
                P = np.zeros((b, n_max, dim))
                R = np.zeros((b, n_max, 1))
                for j, i in enumerate(idx):
                    k = ns[j]
                    P[j, :k, :] = np.asarray(list(all_vecs[i]), dtype="float64")
                    R[j, :k, 0] = np.asarray(all_rat[i], dtype="float64")
                Pt = P.transpose(0, 2, 1)
                A = Pt @ P + 0.01 * ns[:, None, None] * eye
                X = np.linalg.solve(A, Pt @ R)[:, :, 0]
                for j, i in enumerate(idx):
                    vec_out[int(i)] = X[j].tolist()
            yield pd.DataFrame({"id": pdf["id"], "vec": vec_out})

    from kafka_graphs_spark.library.cf import _factors_schema

    for i in range(reps):
        t0 = time.time()
        nested_gathered().mapInPandas(nested_solve, schema=_FACTORS_SCHEMA).count()
        tn = time.time() - t0
        t0 = time.time()
        g = _gathered(edges, user_f, max_neighbors=None, broadcast=True)
        g.mapInPandas(cf._make_solve_batch(dim, 0.01), schema=_FACTORS_SCHEMA).count()
        tf = time.time() - t0
        # r11 arm: float32-carried factors — half the Arrow bytes in the
        # flattened fvecs gather column AND the broadcast factor frame
        t0 = time.time()
        g32 = _gathered(edges, user_f32, max_neighbors=None, broadcast=True)
        g32.mapInPandas(
            cf._make_solve_batch(dim, 0.01, dtype="float32"),
            schema=_factors_schema("float32"),
        ).count()
        t32 = time.time() - t0
        print(f"half-step rep {i}: nested={tn:.2f}s flat={tf:.2f}s float32={t32:.2f}s", flush=True)

    # end-to-end 4-iteration als for the headline number
    t0 = time.time()
    als(Graph.from_edges(edges, F.lit(0.0)), dim=dim, iterations=4, seed=11).count()
    print(f"als iterations=4 end-to-end: {time.time()-t0:.2f}s")
    t0 = time.time()
    als(Graph.from_edges(edges, F.lit(0.0)), dim=dim, iterations=4, seed=11,
        dtype="float32").count()
    print(f"als iterations=4 end-to-end (float32): {time.time()-t0:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
