"""sssp chunk-size probe — the r10 verdict's action-count experiment.

The iterative queries' noise sensitivity is per-superstep driver
scheduling round-trips (scan queries sit at their floors during
co-tenant phases). sssp at sf0.1 runs ~30 generations through
ChainLoop with a probe every ``_CHUNK=8`` chained rounds; this probe
measures sssp wall time for CHUNK in {4, 8, 16, 32} at a given SF dir,
round-robin interleaved (so a box phase hits every config equally),
reporting per-config min/median.

Trade-offs at larger CHUNK (see ChainLoop.chain): up to CHUNK-1 no-op
tail rounds after the frontier dies, and the lazy-checkpoint size
ESTIMATE doubles per chained round between measured probes — CHUNK=32
can push Catalyst's BigInteger stats arithmetic into the visible-cost
regime on join-heavy steps, which is exactly what this probe exists to
measure rather than guess.

Usage: python scripts/sssp_chunk_probe.py [SF_DIR] [REPS] [MAX_ITER]
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    max_iter = int(sys.argv[3]) if len(sys.argv) > 3 else 500
    chunks = (4, 8, 16, 32)

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("sssp-chunk-probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from kafka_graphs_spark import datasets
    from kafka_graphs_spark.library import pagerank, sssp
    import kafka_graphs_spark.library.paths as paths

    ec = datasets.event_chain_graph(spark, sf_dir).persist()
    ec.vertices.count(), ec.edges.count()
    src = datasets.chain_sources(spark, sf_dir, 1)[0]
    pagerank(ec, max_iterations=1).count()  # JIT warm-up outside timers
    sssp(ec, src_vertex_id=src, max_iterations=max_iter).count()  # warm path

    times = {c: [] for c in chunks}
    results = {}
    for rep in range(reps):
        for c in chunks:
            paths._CHUNK = c
            t0 = time.time()
            n = sssp(ec, src_vertex_id=src, max_iterations=max_iter).filter(
                F.col("value") != float("inf")
            ).count()
            dt = time.time() - t0
            times[c].append(dt)
            results.setdefault(c, n)
            print(f"rep {rep} CHUNK={c}: {dt:.2f}s (reached={n})", flush=True)
    paths._CHUNK = 8
    assert len(set(results.values())) == 1, f"results diverged: {results}"
    for c in chunks:
        print(
            f"CHUNK={c}: min={min(times[c]):.2f}s "
            f"median={statistics.median(times[c]):.2f}s"
        )
    spark.stop()


if __name__ == "__main__":
    main()
