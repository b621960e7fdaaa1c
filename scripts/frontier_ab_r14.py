"""Interleaved old-vs-new frontier-family A/B (r14 literal rounds).

Arms, alternating inside one session (the protocol for this box's
2-50x phase noise):
  old   — r13 paths.py (chunked join rounds only), loaded from a
          worktree via importlib
  new   — r14 paths.py (literal rounds when the frontier is ≤64 rows)
  newB  — r14 over a BUCKETED-BY-SRC catalog table graph
          (sources/bucketed.py) — literal rounds prune the parquet scan

Prints per-rep walls, floors, a result-equality line per arm pair, and
the literal-round physical plan of the bucketed arm (expect
``SelectedBucketsCount: 1 out of N`` and PushedFilters on src).

Usage: python scripts/frontier_ab_r14.py [SF_DIR] [REPS] [OP]
       OP in {sssp, bfs, arrival} (default sssp)
"""

import contextlib
import importlib.util
import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def load_old(old_repo):
    spec = importlib.util.spec_from_file_location(
        "old_paths", os.path.join(old_repo, "kafka_graphs_spark/library/paths.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    op = sys.argv[3] if len(sys.argv) > 3 else "sssp"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("frontier-ab-r14")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.warehouse.dir", "/tmp/frontier_ab_warehouse")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from kafka_graphs_spark import datasets
    from kafka_graphs_spark.library import paths as new_paths
    from kafka_graphs_spark.sources import bucketed

    old_paths = load_old("/tmp/r13head")

    g = datasets.event_chain_graph(spark, sf_dir)
    g.vertices.persist().count()
    g.edges.persist().count()
    src = datasets.chain_sources(spark, sf_dir, 1)[0]
    print(f"graph: |V|={g.vertices.count()} |E|={g.edges.count()} src={src}",
          flush=True)

    # bucketed variant — write once (outside all timers), load as tables
    n_edges = g.edges.count()
    n_buckets = max(int(cpus), n_edges // 250_000 + 1)
    bucketed.save_bucketed(g, "ab_ec", n_buckets, path="/tmp/frontier_ab_bucketed")
    gb = bucketed.load_bucketed(spark, "ab_ec")
    print(f"bucketed: {n_buckets} buckets", flush=True)

    def run(mod, graph):
        fn = {"sssp": "sssp", "bfs": "bfs",
              "arrival": "temporal_earliest_arrival"}[op]
        return getattr(mod, fn)(graph, src, max_iterations=500)

    arms = {"old": (old_paths, g), "new": (new_paths, g), "newB": (new_paths, gb)}
    walls = {k: [] for k in arms}
    for r in range(reps):
        for label, (mod, graph) in arms.items():
            spark.sparkContext.setJobDescription(f"{op}-{label} rep{r}")
            t = time.time()
            run(mod, graph).count()
            walls[label].append(time.time() - t)
        print(f"rep {r}: " + " ".join(f"{k}={walls[k][-1]:.2f}s" for k in arms),
              flush=True)
    for k, v in walls.items():
        print(f"{k}: min={min(v):.2f} all=" + " ".join(f"{x:.2f}" for x in v),
              flush=True)

    # result equality across all arms
    base = {r["id"]: r["value"] for r in run(old_paths, g).collect()}
    for label, (mod, graph) in arms.items():
        got = {r["id"]: r["value"] for r in run(mod, graph).collect()}
        ok = got == base
        print(f"equality {label}: {'OK' if ok else 'MISMATCH'} ({len(got)} rows)",
              flush=True)
        assert ok

    # literal-round plan on the bucketed arm: capture via the loop hook
    captured = {}
    orig = new_paths._frontier_loop

    def hook(loop, state, step, max_iterations, literal_step=None, **kw):
        if literal_step is not None and "plan" not in captured:
            rows = [{"id": src, "value": 0.0 if op == "sssp" else 0}]
            frame = literal_step(state, rows, 1)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                frame.explain("formatted")
            captured["plan"] = buf.getvalue()
        return orig(loop, state, step, max_iterations,
                    literal_step=literal_step, **kw)

    new_paths._frontier_loop = hook
    run(new_paths, gb).count()
    new_paths._frontier_loop = orig
    print("=== literal round plan (bucketed arm) ===", flush=True)
    print(captured.get("plan", "NOT CAPTURED"), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
