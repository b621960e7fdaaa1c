"""Capture .explain('formatted') evidence for plans/r14/.

Usage: PYTHONPATH=<repo-to-measure> python scripts/capture_plans_r14.py \
           <out_suffix> <query,query,...> [SF_DIR]

Like scripts/capture_plans.py (r13) but r14-output and it additionally
captures the per-round frames of ChainLoop-driven operators (svdpp):
the final factor frames are localCheckpoint leaves, so the informative
plan is the frame handed to ``loop.advance`` each superstep. The first
TWO advance plans per query are recorded (user step, item step).
Plans always land in the MAIN repo's plans/r14/; the measured code is
whichever repo PYTHONPATH selects.
"""

import contextlib
import io
import os
import sys

if "PYTHONPATH" not in os.environ:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

OUT_DIR = "/root/repo/plans/r14"
MAX_ADVANCE_PLANS = 4


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
        .appName("capture_plans_r14")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry
    import kafka_graphs_spark.library.paths as paths_mod
    from kafka_graphs_spark.library import _loop as loop_mod

    captured = {}

    orig_floop = paths_mod._frontier_loop

    def capturing_floop(loop, state, step, max_iterations, **kw):
        captured.setdefault("round1", explain_str(step(state, 1)))
        return orig_floop(loop, state, step, max_iterations, **kw)

    paths_mod._frontier_loop = capturing_floop

    orig_advance = loop_mod.ChainLoop.advance

    def capturing_advance(self, df, *a, **kw):
        n = sum(1 for k in captured if k.startswith("advance"))
        if n < MAX_ADVANCE_PLANS:
            captured[f"advance{n}"] = explain_str(df)
        return orig_advance(self, df, *a, **kw)

    loop_mod.ChainLoop.advance = capturing_advance

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
        for k in sorted(k for k in captured if k.startswith("advance")):
            out.append(f"## loop {k} frame (pre-checkpoint plan)\n")
            out.append(captured[k])
        out.append("## final result frame\n")
        out.append(final)
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write("\n".join(out))
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
