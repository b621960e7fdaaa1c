"""One timed rep of the ec_temporal_* pair at a given SF dir.

Usage: python scripts/temporal_ab.py <label> [SF_DIR]

Runs ec_temporal_arrival and ec_temporal_departure through the entry
registry (warm-up pass at sf0.001 first so JIT/codegen is out of the
timer), counts the result, prints one JSON line per query. The A/B
driver alternates PYTHONPATH between the dense-state worktree and the
sparse-state repo.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main():
    label = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.default.parallelism", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .appName(f"temporal_ab_{label}")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    qs = entry.queries()
    # warm-up: JIT the loop machinery on the tiny SF
    for name in ("ec_temporal_arrival", "ec_temporal_departure"):
        qs[name](spark, "/root/testdata/sf0.001").count()
    for name in ("ec_temporal_arrival", "ec_temporal_departure"):
        spark.sparkContext.setJobDescription(f"{label}:{name}")
        t0 = time.time()
        n = qs[name](spark, sf_dir).count()
        print(json.dumps({"label": label, "query": name,
                          "sec": round(time.time() - t0, 2), "rows": n}))
    spark.stop()


if __name__ == "__main__":
    main()
