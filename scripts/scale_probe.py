"""Scaling probe: top-5 headline queries + the dedup tier at true
larger SFs (gen_scale_data.py output), with OUTPUT COUNTS so dedup-tier
scaling is read under clean generative semantics (not replication
collisions). One Spark session per SF dir, run sequentially — never
overlap with another Spark job (BASELINE.md protocol).

Usage: python scripts/scale_probe.py DIR [DIR...] [--only q1,q2,...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def run_dir(sf_dir: str, only=None) -> dict:
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("scale-probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.default.parallelism", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from kafka_graphs_spark import datasets
    from kafka_graphs_spark.graph import Graph
    from kafka_graphs_spark.library import (
        als,
        connected_components,
        label_propagation,
        pagerank,
        sssp,
    )
    from kafka_graphs_spark.library.louvain import louvain
    from kafka_graphs_spark.pipeline import dedup

    ec = datasets.event_chain_graph(spark, sf_dir).persist()
    ec.vertices.count(), ec.edges.count()
    docs = datasets.load(spark, sf_dir, "documents").persist()
    docs.count()
    pagerank(ec, max_iterations=1).count()  # warm-up outside timers
    src = datasets.chain_sources(spark, sf_dir, 1)[0]

    def run_als():
        ratings = datasets.load(spark, sf_dir, "lineitem").groupBy(
            F.col("l_suppkey").alias("src"),
            (F.col("l_partkey") + 1000000).alias("dst"),
        ).agg((F.avg("l_quantity") / 10.0).alias("value"))
        return als(
            Graph.from_edges(ratings, F.lit(0.0)), dim=8, iterations=4, seed=11
        ).count()

    qs = {
        "pagerank5": lambda: pagerank(ec, max_iterations=5).count(),
        "wcc": lambda: connected_components(ec, max_iterations=500).count(),
        "sssp": lambda: sssp(ec, src_vertex_id=src, max_iterations=500).count(),
        "lp10": lambda: label_propagation(ec, max_iterations=10).count(),
        "louvain": lambda: louvain(
            ec, max_levels=2, max_sweeps=4, local_threshold=50_000
        ).count(),
        "als4": run_als,
        "minhash_lsh": lambda: dedup.minhash_lsh_candidates(
            docs, num_hashes=16, bands=4
        ).count(),
        "dedup_resolve": lambda: dedup.resolve_duplicates(
            docs, n=3, threshold=0.05
        ).count(),
        "simhash": lambda: dedup.simhash(docs, bits=16).count(),
    }
    out = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t = time.time()
        n = fn()
        out[name] = {"sec": round(time.time() - t, 2), "rows": n}
        print(f"#   {name}: {out[name]}", file=sys.stderr)
    spark.stop()
    return out


def main() -> None:
    args = sys.argv[1:]
    only = None
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        args = args[:i] + args[i + 2:]
    results = {}
    for d in args:
        print(f"# == {d} ==", file=sys.stderr)
        results[d] = run_dir(d, only=only)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
