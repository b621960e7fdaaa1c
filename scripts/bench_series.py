"""Sequential bench series — the measurement protocol behind BASELINE.md.

Runs ``bench.py`` N times back-to-back (never overlapping — co-tenant
phases on this box inflate ITERATIVE queries 2-4x while scan-bound
queries sit at their floors, so a single reading is meaningless) and
prints per-run JSON plus a summary: min / median total, min / median
of the comparable set (total minus louvain and tfidf, the two queries
absent from the r01 baseline), and the per-query minima (the best
quiet-floor estimate the series supports).

Usage: python scripts/bench_series.py [N]   (default 5)
"""

import json
import os
import statistics
import subprocess
import sys

COMPARABLE_EXCLUDES = ("louvain", "tfidf")


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    runs = []
    for i in range(n):
        out = subprocess.run(
            [sys.executable, os.path.join(here, "bench.py")],
            capture_output=True, text=True, check=False,
        )
        line = next(
            (ln for ln in out.stdout.splitlines() if ln.startswith('{"metric"')),
            None,
        )
        if line is None:
            print(f"run {i + 1}: FAILED\n{out.stderr[-500:]}", file=sys.stderr)
            continue
        d = json.loads(line)
        runs.append(d)
        comp = d["value"] - sum(
            d["queries"].get(q, 0.0) for q in COMPARABLE_EXCLUDES
        )
        print(json.dumps({"run": i + 1, "total": d["value"],
                          "comparable": round(comp, 3)}))
        print(line)
    if not runs:
        return 1
    totals = [d["value"] for d in runs]
    comps = [
        d["value"] - sum(d["queries"].get(q, 0.0) for q in COMPARABLE_EXCLUDES)
        for d in runs
    ]
    # per-query floor: min over runs of min(first-pass, best-of) —
    # bench.py emits queries_best_of since r11 (best-of-2 in r11-r12,
    # best-of-3 since r13; the in-artifact series now carries medians
    # too, so this cross-session script is the long-horizon check)
    def _q(d, q):
        return min(d["queries"][q], d.get("queries_best_of", {}).get(q, d["queries"][q]))

    per_query_min = {
        q: round(min(_q(d, q) for d in runs if q in d["queries"]), 3)
        for q in runs[0]["queries"]
    }
    print(json.dumps({
        "n": len(runs),
        "total_min": round(min(totals), 3),
        "total_median": round(statistics.median(totals), 3),
        "comparable_min": round(min(comps), 3),
        "comparable_median": round(statistics.median(comps), 3),
        "per_query_min": per_query_min,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
