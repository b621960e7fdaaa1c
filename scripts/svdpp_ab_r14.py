"""Interleaved old-vs-new svdpp A/B + bitwise result equality (r14).

Loads the r13 cf.py (per-row user/item supersteps) from a worktree as a
separate module and runs svdpp1 — the bench's exact extra-query shape:
``svdpp(ratings_graph, dim=8, iterations=1, seed=11, dtype='float32')``
— ALTERNATING old/new inside one session (the protocol for this box's
2-50x phase noise). After the timed reps, collects both factor sets once
and compares them EXACTLY (same rows, same float32 bits) — the r14
vectorized rewrite claims bit-identity with the r13 per-row code.

Usage: python scripts/svdpp_ab_r14.py [SF_DIR] [REPS] [OLD_REPO]
"""

import importlib.util
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def load_old_cf(old_repo: str):
    spec = importlib.util.spec_from_file_location(
        "old_cf", os.path.join(old_repo, "kafka_graphs_spark/library/cf.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    old_repo = sys.argv[3] if len(sys.argv) > 3 else "/tmp/r13head"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("svdpp-ab-r14")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from kafka_graphs_spark.graph import Graph
    from kafka_graphs_spark.library import svdpp as new_svdpp

    old_svdpp = load_old_cf(old_repo).svdpp

    def ratings_graph():
        ratings = (
            spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .groupBy(F.col("l_suppkey").alias("src"),
                     (F.col("l_partkey") + 1000000).alias("dst"))
            .agg((F.avg("l_quantity") / 10.0).alias("value"))
        )
        return Graph.from_edges(ratings, F.lit(0.0))

    # JIT warm-up (the bench does the same outside its timers)
    u, i, _ = new_svdpp(ratings_graph(), dim=8, iterations=1, seed=11,
                        dtype="float32")
    u.count(), i.count()

    walls = {"old": [], "new": []}
    for r in range(reps):
        for label, fn in (("old", old_svdpp), ("new", new_svdpp)):
            spark.sparkContext.setJobDescription(f"svdpp1-{label} rep{r}")
            t = time.time()
            uu, ii, _ = fn(ratings_graph(), dim=8, iterations=1, seed=11,
                           dtype="float32")
            uu.count(), ii.count()
            walls[label].append(time.time() - t)
        print(f"rep {r}: old={walls['old'][-1]:.2f}s new={walls['new'][-1]:.2f}s",
              flush=True)
    for k, v in walls.items():
        if v:
            print(f"{k}: min={min(v):.2f} all=" + " ".join(f"{x:.2f}" for x in v),
                  flush=True)

    # bitwise equality (2 iterations to exercise the loop re-entry too);
    # users are (id, b, p), items are (id, b, q, y)
    def canon(users, items):
        rows = {}
        for tag, df in (("u", users), ("i", items)):
            for row in df.collect():
                d = row.asDict()
                rows[(tag, d["id"])] = (
                    d["b"],
                    tuple(d["p"] if tag == "u" else d["q"]),
                    tuple(d.get("y") or ()),
                )
        return rows

    ou, oi, om = old_svdpp(ratings_graph(), dim=8, iterations=2, seed=11,
                           dtype="float32")
    nu, ni, nm = new_svdpp(ratings_graph(), dim=8, iterations=2, seed=11,
                           dtype="float32")
    a, b = canon(ou, oi), canon(nu, ni)
    assert om == nm, (om, nm)
    assert set(a) == set(b), "vertex id sets differ"
    diff = [k for k in a if a[k] != b[k]]
    print(f"bitwise check: {len(a)} vertices, {len(diff)} differing "
          f"({'OK — bit-identical' if not diff else 'MISMATCH: ' + repr(diff[:3])})",
          flush=True)
    assert not diff
    spark.stop()


if __name__ == "__main__":
    main()
