"""Capture .explain('formatted') evidence for plans/r13/.

Usage: python scripts/capture_plans.py <out_suffix> <query,query,...> [SF_DIR]

For each named entry query this writes plans/r13/<query>_<out_suffix>.txt
containing (a) the physical plan of ONE loop round (the per-round state
merge — where the dense->sparse state rewrite shows) for the frontier-loop
queries, captured by wrapping paths._frontier_loop, and (b) the final
result frame's plan. Run from the repo whose code should be measured
(PYTHONPATH selects before/after); plans always land in the MAIN repo's
plans/r13/.
"""

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

OUT_DIR = "/root/repo/plans/r13"


def explain_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main():
    suffix = sys.argv[1]
    names = sys.argv[2].split(",")
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"
    os.makedirs(OUT_DIR, exist_ok=True)

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "12g")
        .config("spark.ui.enabled", "false")
        .appName("capture_plans")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    # wrap the frontier loop so the FIRST round's lazy plan is captured —
    # the final result frame is a localCheckpoint leaf, so the per-round
    # merge plan is the informative one
    import kafka_graphs_spark.library.paths as paths_mod

    captured = {}
    orig_loop = paths_mod._frontier_loop

    def capturing_loop(loop, state, step, max_iterations, **kw):
        captured.setdefault("round1", explain_str(step(state, 1)))
        return orig_loop(loop, state, step, max_iterations, **kw)

    paths_mod._frontier_loop = capturing_loop

    qs = entry.queries()
    for name in names:
        captured.clear()
        spark.sparkContext.setJobDescription(f"capture:{name}")
        df = qs[name](spark, sf_dir)
        final = explain_str(df)
        out = [f"# {name} — {suffix} (sf_dir={sf_dir})\n"]
        if "round1" in captured:
            out.append("## one loop round (state merge plan)\n")
            out.append(captured["round1"])
        out.append("## final result frame\n")
        out.append(final)
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write("\n".join(out))
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
