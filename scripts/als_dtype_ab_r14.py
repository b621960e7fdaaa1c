"""Interleaved als4 float64-vs-float32 adjudication (r14, VERDICT #6).

The two paths are IDENTICAL except the carried factor array width
(array<double> vs array<float>; the normal-equation solve is float64
in both). If the wall ratio tracks the payload ratio (~2x on the
Arrow/shuffle-bound segments) the gap is pure payload width; any
bigger residual points at an f64-specific inefficiency (spill, batch
split). Arms alternate inside one session; both run the bench's exact
als4 shape (dim 8, 4 half-steps, seed 11, lineitem ratings graph).

Also isolates the half-step segments per dtype with noop sinks:
  gather   — _gathered(edges, user_f) (the Arrow input payload)
  solve    — gather + mapInPandas solve_batch (adds Python+output)

Usage: python scripts/als_dtype_ab_r14.py [SF_DIR] [REPS]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("als-dtype-ab")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from kafka_graphs_spark.graph import Graph
    from kafka_graphs_spark.library import als
    from kafka_graphs_spark.library import cf

    def ratings_graph():
        ratings = (
            spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .groupBy(F.col("l_suppkey").alias("src"),
                     (F.col("l_partkey") + 1000000).alias("dst"))
            .agg((F.avg("l_quantity") / 10.0).alias("value"))
        )
        return Graph.from_edges(ratings, F.lit(0.0))

    # JIT warm-up both Arrow schemas
    for dt in ("float64", "float32"):
        als(ratings_graph(), dim=8, iterations=1, seed=11, dtype=dt).count()

    walls = {"f64": [], "f32": []}
    for r in range(reps):
        for label, dt in (("f64", "float64"), ("f32", "float32")):
            spark.sparkContext.setJobDescription(f"als4-{label} rep{r}")
            t = time.time()
            als(ratings_graph(), dim=8, iterations=4, seed=11, dtype=dt).count()
            walls[label].append(time.time() - t)
        print(f"rep {r}: " + " ".join(f"{k}={walls[k][-1]:.2f}s" for k in walls),
              flush=True)
    for k, v in walls.items():
        print(f"{k}: min={min(v):.2f} all=" + " ".join(f"{x:.2f}" for x in v),
              flush=True)

    # segment isolation (one half-step), interleaved
    g = ratings_graph()
    edges = g.edges.select("src", "dst",
                           F.col("value").cast("double").alias("value")).persist()
    edges.count()
    users = edges.select(F.col("src").alias("id")).distinct()
    seg = {k: [] for k in ("gather64", "solve64", "gather32", "solve32")}
    for r in range(reps):
        for dt, tag in (("float64", "64"), ("float32", "32")):
            uf = cf._init_factors(users, 8, 11, dt).persist()
            uf.count()
            gathered = cf._gathered(edges, uf, None, broadcast=True)
            spark.sparkContext.setJobDescription(f"als-gather{tag} rep{r}")
            t = time.time()
            noop(gathered)
            seg[f"gather{tag}"].append(time.time() - t)
            sb = cf._make_solve_batch(8, 0.01, dt)
            spark.sparkContext.setJobDescription(f"als-solve{tag} rep{r}")
            t = time.time()
            noop(gathered.mapInPandas(sb, schema=cf._factors_schema(dt)))
            seg[f"solve{tag}"].append(time.time() - t)
            uf.unpersist()
        print(f"seg rep {r}: " + " ".join(f"{k}={seg[k][-1]:.2f}s" for k in seg),
              flush=True)
    for k, v in seg.items():
        print(f"{k}: min={min(v):.2f} all=" + " ".join(f"{x:.2f}" for x in v),
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
