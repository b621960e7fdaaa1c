"""Capture frontier-family round plans for plans/r14/.

For each of the four frontier operators' declared queries this dumps
BOTH round shapes at the same tree state:
  - the chunked JOIN round (``step``) — the only shape r13 had, and the
    shape the sf0.1 bench still runs (|E| = 98.5k is under the
    KGS_LITERAL_MIN_EDGES = 1e6 gate), and
  - the r14 LITERAL round (``literal_step``) — what every small-frontier
    round runs at production scale (gate forced open here via
    paths._LITERAL_MIN_EDGES = 0).

The declared ec_* graphs derive their edges through a Window (lag over
the per-user event chain), so ``prunable_source`` correctly refuses them
and the literal round filters the CACHED edge frame (in-memory batch
pruning). The parquet/bucket-pruned variant of the same round is dumped
separately in ec_sssp_literal_round_bucketed_sf01.txt.

Usage: python scripts/capture_frontier_plans_r14.py <suffix> [SF_DIR]
"""

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

OUT_DIR = "/root/repo/plans/r14"
QUERIES = ["ec_bfs", "ec_sssp", "ec_temporal_arrival", "ec_temporal_departure"]


def explain_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main():
    suffix = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    os.makedirs(OUT_DIR, exist_ok=True)

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "12g")
        .config("spark.ui.enabled", "false")
        .appName("capture_frontier_plans_r14")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry
    import kafka_graphs_spark.library.paths as paths_mod

    paths_mod._LITERAL_MIN_EDGES = 0  # force the literal path on tiny SF
    captured = {}
    orig = paths_mod._frontier_loop

    def capturing(loop, state, step, max_iterations, literal_step=None, **kw):
        captured["join_round"] = explain_str(step(state, 1))
        if literal_step is not None:
            rows = state.filter("_changed").select("id", "value").collect()
            captured["literal_round"] = explain_str(literal_step(state, rows, 1))
        return orig(loop, state, step, max_iterations,
                    literal_step=literal_step, **kw)

    paths_mod._frontier_loop = capturing
    qs = entry.queries()
    try:
        for name in QUERIES:
            captured.clear()
            spark.sparkContext.setJobDescription(f"capture:{name}")
            df = qs[name](spark, sf_dir)
            final = explain_str(df)
            out = [f"# {name} — {suffix} (sf_dir={sf_dir})\n"]
            out.append("## chunked JOIN round (r13 shape; what the sf0.1 "
                       "bench still runs — |E| under the literal gate)\n")
            out.append(captured.get("join_round", "(not captured)\n"))
            if "literal_round" in captured:
                out.append("## LITERAL round (r14; every frontier<=64 round "
                           "at production scale — no join, no broadcast; "
                           "src IN (...) filter prunes the scan)\n")
                out.append(captured["literal_round"])
            out.append("## final result frame\n")
            out.append(final)
            path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
            with open(path, "w") as f:
                f.write("\n".join(out))
            print(f"wrote {path}", flush=True)
    finally:
        paths_mod._frontier_loop = orig
    spark.stop()


if __name__ == "__main__":
    main()
