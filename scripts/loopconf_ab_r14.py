"""Interleaved loop-conf A/B at scale (VERDICT r13 #5): the iterative
tier's per-round stages under (A) AdaptiveLoopConf small-regime tuning
(AQE off, partitions sized from measured rows/bytes — the shipped code)
vs (B) tuning disabled (session AQE + coalescePartitions govern every
round). Arms alternate inside one session.

Usage: python /tmp/loopconf_ab_r14.py SF_DIR OP REPS
       OP in {wcc, lp10, pagerank5}
"""
import os, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F

sf_dir, op, reps = sys.argv[1], sys.argv[2], int(sys.argv[3])
spark = (SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "24g").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from kafka_graphs_spark import datasets
from kafka_graphs_spark.library import _loop
from kafka_graphs_spark.library import connected_components, label_propagation, pagerank

g = datasets.event_chain_graph(spark, sf_dir)
g.vertices.persist().count(); g.edges.persist().count()

RUN = {
    "wcc": lambda: connected_components(g, max_iterations=500).count(),
    "lp10": lambda: label_propagation(g, max_iterations=10).count(),
    "pagerank5": lambda: pagerank(g, max_iterations=5).count(),
}[op]

orig_tune = _loop.AdaptiveLoopConf.tune
def no_tune(self, spark_, n_rows, n_bytes=-1):
    pass

RUN()  # warm-up
walls = {"tuned": [], "aqe": []}
for r in range(reps):
    for label in ("tuned", "aqe"):
        _loop.AdaptiveLoopConf.tune = orig_tune if label == "tuned" else no_tune
        spark.sparkContext.setJobDescription(f"{op}-{label} rep{r}")
        t = time.time()
        n = RUN()
        walls[label].append(time.time() - t)
    print(f"rep {r}: tuned={walls['tuned'][-1]:.2f}s aqe={walls['aqe'][-1]:.2f}s",
          flush=True)
_loop.AdaptiveLoopConf.tune = orig_tune
for k, v in walls.items():
    print(f"{k}: min={min(v):.2f} all=" + " ".join(f"{x:.2f}" for x in v), flush=True)
spark.stop()
