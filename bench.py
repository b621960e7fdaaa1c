"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "queries_best_of": {name: sec},
"value_best_of": sec, "queries_series_median": {name: sec},
"value_series_median": sec, "queries_extra*": ..., "sf": ...}.

Each query runs $SPARK_GRAFT_BENCH_PASSES times (default 3) as
INTERLEAVED full loops in the same session: "queries"/"value" are the
first-pass numbers (continuity with the r1-r10 artifacts),
"queries_best_of"/"value_best_of" the per-query minimum over all
passes (best-of-2 in r11-r12, best-of-3 since r13), and
"queries_series_median" the per-query median — together the same
n=3 series protocol scripts/bench_series.py runs across sessions,
carried INSIDE the artifact. The box this runs on has documented
co-tenant phases with 2-4x run-to-run swings on identical plans
(BASELINE.md rounds 10/12); two of three rounds' headline readings
were phase artifacts decodable only against hand-recorded BASELINE
series — the in-artifact floors make each artifact self-decoding:
read "value" for series continuity, "queries_best_of" vs the prior
round's for regressions, and the min/median spread for the phase.

"queries_extra" (same three-pass treatment, EXCLUDED from every
"value" column so the r1-r12 series stays comparable) tracks the
production CF configs: als4_f32 — the reference-faithful float32
width (Als.java uses FloatMatrix throughout) — and svdpp1, one
SVD++ round at bench scale.

The mix covers every engine tier: iterative graph algorithms
(PageRank/WCC/SSSP/LP), graph algebra (degrees), dedup (MinHash-LSH,
SimHash), similarity search (cosine top-k), and text analysis — the
same workloads the correctness gate checks, at bench scale.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def build_session() -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("kafka-graphs-spark-bench")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.default.parallelism", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )


def bench_queries(spark: SparkSession, sf_dir: str) -> dict:
    from kafka_graphs_spark import EdgeDirection, datasets
    from kafka_graphs_spark.library import (
        connected_components,
        label_propagation,
        pagerank,
        sssp,
    )
    from kafka_graphs_spark.pipeline import dedup, similarity, text

    ec = datasets.event_chain_graph(spark, sf_dir).persist()
    ec.vertices.count(), ec.edges.count()  # materialize outside the timers
    sp = datasets.supplier_part_graph(spark, sf_dir)
    # documents.parquet at sf0.1 is a single ~2 MB row group, so every
    # scan stage over it runs ONE task no matter how many cores exist
    # (parquet splits at row-group granularity — maxPartitionBytes can't
    # help). Right-size the cached input once, the same thing production
    # data prep does with file sizing: the shingle explode then fans out
    # across the box (minhash_lsh 8.5 -> 2.5 s at sf0.1 on local[32]).
    docs = datasets.load(spark, sf_dir, "documents").repartition(int(CPUS)).persist()
    docs.count()
    emb = datasets.load(spark, sf_dir, "embeddings").persist()
    emb.count()
    # steady-state warm-up outside the timers: one short iteration JITs the
    # loop machinery (codegen, Arrow workers) so the first timed query
    # measures the engine, not JVM warm-up
    pagerank(ec, max_iterations=1).count()
    # ... and one 2-edge ALS iteration JITs the Arrow writer for the
    # flat array<double> factor schema (schema-specific codegen: the
    # pagerank warm-up does not touch it) — als4 then measures ALS, not
    # the first-ever Arrow serialization of that schema
    from kafka_graphs_spark.graph import Graph as _G
    from kafka_graphs_spark.library import als as _als

    _tiny = spark.createDataFrame(
        [(0, 1000000, 1.0), (1, 1000001, 2.0)], "src long, dst long, value double"
    )
    _als(_G.from_edges(_tiny, F.lit(0.0)), dim=8, iterations=1, seed=11).count()

    def src():
        return datasets.chain_sources(spark, sf_dir, 1)[0]

    from kafka_graphs_spark.library import als
    from kafka_graphs_spark.library.louvain import louvain
    from kafka_graphs_spark.streaming import exact_triangle_count

    def ratings_graph():
        from kafka_graphs_spark.graph import Graph

        ratings = datasets.load(spark, sf_dir, "lineitem").groupBy(
            F.col("l_suppkey").alias("src"), (F.col("l_partkey") + 1000000).alias("dst")
        ).agg((F.avg("l_quantity") / 10.0).alias("value"))
        return Graph.from_edges(ratings, F.lit(0.0))

    def run_als():
        return als(ratings_graph(), dim=8, iterations=4, seed=11).count()

    qs = {
        "pagerank5": lambda: pagerank(ec, max_iterations=5).count(),
        "triangles": lambda: exact_triangle_count(
            datasets.hierarchy_edges(spark, sf_dir)
        ).count(),
        "als4": run_als,
        "wcc": lambda: connected_components(ec, max_iterations=500).count(),
        "sssp": lambda: sssp(ec, src_vertex_id=src(), max_iterations=500).count(),
        "lp10": lambda: label_propagation(ec, max_iterations=10).count(),
        # local_threshold below the sf0.1 pair count so the level-0 move
        # phase runs DISTRIBUTED (the 100 TB shape: distributed first
        # levels, sequential driver tail on the contracted graph)
        "louvain": lambda: louvain(
            ec, max_levels=2, max_sweeps=4, local_threshold=50_000
        ).count(),
        "sp_degrees": lambda: sp.out_degrees().unionByName(sp.in_degrees()).count(),
        "minhash_lsh": lambda: dedup.minhash_lsh_candidates(docs, num_hashes=16, bands=4).count(),
        "simhash": lambda: dedup.simhash(docs, bits=16).count(),
        "cosine_topk": lambda: similarity.cosine_topk(
            emb, emb.filter(F.col("vec_id") < 10), k=5
        ).count(),
        "quality": lambda: text.quality_score(docs).count(),
        "tfidf": lambda: text.tfidf_keywords(docs, k=3).count(),
    }
    # production CF configs (r13): tracked as SEPARATE artifact columns
    # so the r1-r12 headline series stays comparable — als4_f32 is the
    # reference-faithful float32 factor width, svdpp1 one SVD++ round
    from kafka_graphs_spark.library import svdpp

    extras = {
        "als4_f32": lambda: als(
            ratings_graph(), dim=8, iterations=4, seed=11, dtype="float32"
        ).count(),
        "svdpp1": lambda: svdpp(
            ratings_graph(), dim=8, iterations=1, seed=11, dtype="float32"
        )[0].count(),
    }
    return qs, extras


def _series(qs: dict, passes: int) -> tuple[dict, float, dict, dict]:
    """Run ``passes`` interleaved full loops; return (first-pass times,
    first-pass loop wall, per-query min, per-query median)."""
    import statistics

    series: dict[str, list[float]] = {name: [] for name in qs}
    first_wall = 0.0
    for p in range(passes):
        t0 = time.time()
        for name, fn in qs.items():
            t = time.time()
            fn()
            series[name].append(round(time.time() - t, 3))
        if p == 0:
            first_wall = round(time.time() - t0, 3)
    for name, s in series.items():
        print(f"# {name}: " + " ".join(f"{t}s" for t in s), file=sys.stderr)
    first = {name: s[0] for name, s in series.items()}
    smin = {name: round(min(s), 3) for name, s in series.items()}
    smed = {name: round(statistics.median(s), 3) for name, s in series.items()}
    return first, first_wall, smin, smed


def main() -> None:
    passes = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3")))
    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")
    qs, extras = bench_queries(spark, SF_DIR)
    t0 = time.time()
    # pass 1's LOOP WALL (incl. inter-query overhead) is the r1-r10
    # "value" definition, so the series stays comparable
    # artifact-to-artifact; passes 2..n are instrumentation only —
    # the same n=3 interleaved protocol as scripts/bench_series.py,
    # carried inside the artifact so a phase-inflated first pass is
    # self-decoding (min = quiet floor, median = session phase)
    times, first_wall, best, med = _series(qs, passes)
    xtimes, _, xbest, xmed = _series(extras, passes)
    total = round(time.time() - t0, 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                # first-pass LOOP WALL — same definition as the r1-r10
                # artifacts (includes inter-query overhead)
                "value": first_wall,
                "unit": "sec",
                "queries": times,
                # per-query min over the same-session passes — the
                # noise-robust floor (read THIS against BASELINE.md);
                # best-of-2 in r11-r12, best-of-3 since r13
                "queries_best_of": best,
                "value_best_of": round(sum(best.values()), 3),
                # per-query median over the passes — with the min, the
                # artifact carries its own phase evidence
                "queries_series_median": med,
                "value_series_median": round(sum(med.values()), 3),
                "series_passes": passes,
                # production CF configs — separate columns, excluded
                # from every "value" aggregate (series continuity)
                "queries_extra": xtimes,
                "queries_extra_best_of": xbest,
                "queries_extra_series_median": xmed,
                # all passes end-to-end, NOT comparable to "value"
                "wall_total": total,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
