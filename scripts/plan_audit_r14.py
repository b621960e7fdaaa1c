"""Round-14 plan-shape audit over EVERY declared query.

Builds each queries() entry at sf0.001 and scans its executed plan for
the guide's red flags: row-at-a-time Python (BatchEvalPython), cartesian
products / broadcast nested-loop joins, and counts Exchange and Python
nodes. Iterative queries return localCheckpoint leaves, so their audit
coverage is the loop internals exercised DURING the build (plan-asserted
separately in tests/test_plans.py); for everything else the full plan is
visible here.

Usage: python scripts/plan_audit_r14.py [SF_DIR] [out.json]
"""

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/plan_audit_r14.json"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "12g")
        .config("spark.ui.enabled", "false")
        .appName("plan_audit_r14")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    qs = entry.queries()
    report = {}
    for name, fn in qs.items():
        t0 = time.time()
        row = {}
        try:
            spark.sparkContext.setJobDescription(f"audit:{name}")
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            row = {
                "sec": round(time.time() - t0, 2),
                "exchanges": plan.count("Exchange"),
                "batch_eval_python": plan.count("BatchEvalPython"),
                "arrow_eval_python": plan.count("ArrowEvalPython"),
                "map_in_pandas": plan.count("MapInPandas") + plan.count("MapInArrow")
                + plan.count("FlatMapGroupsInPandas"),
                "cartesian": plan.count("CartesianProduct"),
                "bnl_join": plan.count("BroadcastNestedLoopJoin"),
                "leaf_only": "LocalTableScan" in plan.splitlines()[0]
                or "Scan ExistingRDD" in plan,
            }
        except Exception as e:
            row = {"error": f"{type(e).__name__}: {e}", "sec": round(time.time() - t0, 2)}
            traceback.print_exc(limit=1)
        report[name] = row
        print(json.dumps({"q": name, **row}), flush=True)
    flags = {
        n: r for n, r in report.items()
        if r.get("batch_eval_python") or r.get("cartesian") or r.get("error")
    }
    with open(out_path, "w") as f:
        json.dump({"queries": report, "flags": flags}, f, indent=1)
    print(f"# wrote {out_path}; flagged: {sorted(flags)}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
