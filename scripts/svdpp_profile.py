"""SVD++ per-round profiler at a true larger SF (r11 verdict #4).

SVD++ moves FOUR dim-vectors per rating per round through Arrow — the
gathered (q, w) neighbor structs into the user superstep and the
(fstep, wstep) message structs into the item superstep — a different
(nested-struct) serialization shape from ALS's flat fvecs gather, so
the ALS float32 measurement (flat 2.34 -> 1.95 s warm half-step at
sf1.0, BASELINE.md round 11) does not proxy it. This measures the
end-to-end wall of svdpp() at iterations=1 and iterations=2 per dtype;
the marginal (t2 - t1) is the warm per-round cost (one user + one item
superstep) with setup/init excluded. CAVEAT (r12 measured): on a
phasey box the end-to-end walls swing 2-4x on identical code and the
marginal can come out negative — the robust protocol is the
interleaved ISOLATED user-superstep A/B recorded in BASELINE.md round
12 (gather -> user_step -> message explode/groupBy, paired reps).

Usage: python scripts/svdpp_profile.py [SF_DIR] [DIM] [REPS]
       (default: .scratch/sf1.0, dim 8, 2 reps per point)
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
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("svdpp-profile")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from kafka_graphs_spark.graph import Graph
    from kafka_graphs_spark.library import svdpp

    ratings = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy(F.col("l_suppkey").alias("src"),
                 (F.col("l_partkey") + 1000000).alias("dst"))
        .agg((F.avg("l_quantity") / 10.0).alias("value"))
    )
    edges = ratings.select(
        "src", "dst", F.col("value").cast("double").alias("value")
    ).persist()
    n = edges.count()
    print(f"ratings={n} users={edges.select('src').distinct().count()} "
          f"items={edges.select('dst').distinct().count()} dim={dim}")
    g = Graph.from_edges(edges, F.lit(0.0))

    walls = {}
    for dtype in ("float64", "float32"):
        for its in (1, 2):
            for r in range(reps):
                t = time.time()
                users, items, _ = svdpp(
                    g, dim=dim, iterations=its,
                    bias_gamma=0.1, factor_gamma=0.1, seed=3, dtype=dtype,
                )
                users.count(), items.count()
                w = time.time() - t
                walls[(dtype, its)] = min(w, walls.get((dtype, its), w))
                print(f"{dtype} iterations={its} rep={r}: {w:.2f}s", flush=True)
        t1, t2 = walls[(dtype, 1)], walls[(dtype, 2)]
        print(f"{dtype} marginal per round (t2 - t1): {t2 - t1:.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
