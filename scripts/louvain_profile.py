"""Louvain sweep-cost split + early-exit A/B (r12 verdict item 4b).

Questions this answers at a given SF dir:

1. WHERE do the sweeps spend — per-sub-sweep wall and moved-vertex
   counts (the ``sweep_stats`` hook), showing the long tail of
   sub-percent sweeps that still cost full distributed passes.
2. Does ``min_moved_frac`` early-exit buy wall time, and what does it
   cost in modularity? Interleaved A/B (epsilon 0 vs the probe values)
   so a box phase hits both arms equally; modularity computed on the
   SAME graph for every arm.

Usage: python scripts/louvain_profile.py [SF_DIR] [REPS]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

EPSILONS = (0.0, 0.01, 0.05)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("louvain-profile")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from kafka_graphs_spark import datasets
    from kafka_graphs_spark.library.components import modularity
    from kafka_graphs_spark.library.louvain import louvain

    ec = datasets.event_chain_graph(spark, sf_dir).persist()
    ec.vertices.count(), ec.edges.count()
    # bench config: distributed level-0 moves, sequential tail
    kw = dict(max_levels=2, max_sweeps=4, local_threshold=50_000)

    # warm-up (JIT) outside timers
    louvain(ec, max_levels=1, max_sweeps=1, local_threshold=0).count()

    results = {e: [] for e in EPSILONS}
    mods = {}
    for rep in range(reps):
        for eps in EPSILONS:  # interleaved: each rep hits every arm
            stats: list = []
            t = time.time()
            out = louvain(ec, min_moved_frac=eps, sweep_stats=stats, **kw)
            out.count()
            wall = round(time.time() - t, 3)
            results[eps].append(wall)
            if eps not in mods:
                row = modularity(
                    ec, out.withColumnRenamed("community", "value")
                ).collect()[0]
                mods[eps] = round(float(row["modularity"]), 6)
            print(json.dumps({
                "rep": rep, "epsilon": eps, "wall": wall,
                "sweeps": stats,
            }))
    print(json.dumps({
        "sf_dir": sf_dir,
        "per_epsilon_min": {str(e): min(v) for e, v in results.items()},
        "per_epsilon_all": {str(e): v for e, v in results.items()},
        "modularity": {str(e): m for e, m in mods.items()},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
