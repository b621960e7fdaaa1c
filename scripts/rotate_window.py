"""Window-rotation planner for the driver's 50-slot correctness gate.

The driver scores only the FIRST 50 entries of ``queries()`` each round
(CORRECTNESS_r{N}.json), while the registry keeps growing — so which 50
run is the top recurring source of evidence debt. This script replaces
the hand-curated rotation: it reads every committed CORRECTNESS_r*.json,
derives each query's scoring history, and emits the ordering

    1. queries whose LATEST score was not green (red or errored,
       registry order) — a fixed bug is worthless until re-scored, so
       these outrank everything (round-9 lesson: ``doc_blocklist`` was
       fixed but ranked as "freshly scored" and escaped re-scoring),
    2. never-scored queries (registry order) — first in line for a row,
    3. scored-green queries, stalest round first (ties: registry order),
    4. the permanent no-oracle tail (seeded numerics whose correctness
       evidence is their invariant/loss twins inside the window —
       rotating them in would burn slots on rows the driver can only
       mark ``no_oracle``).

Usage:
    python scripts/rotate_window.py            # print the full ordering
    python scripts/rotate_window.py --check    # assert queries() already
                                               # starts with the computed
                                               # 50-slot window (CI gate)
    python scripts/rotate_window.py --write-asof  # record the current max
                                               # round in scripts/WINDOW_ASOF

After generating, reorder the ``queries()`` dict to match, run
``--write-asof``, and re-run ``scripts/check_window.py`` — the rotation
plan is fixed when the round starts; queries added mid-round go AFTER
slot 50 for the next rotation.

``--check`` computes the expected window from artifacts up to the round
recorded in ``scripts/WINDOW_ASOF`` (written when the rotation was
applied), so committing the CURRENT round's CORRECTNESS artifact
mid-cycle does not retroactively invalidate the ordering fixed at round
start.
"""

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: permanently-tail queries: seeded/approximate numerics with no oracle,
#: whose correctness evidence is the invariant/loss/recall twins that DO
#: rotate through the window.
PERMANENT_TAIL = [
    "sp_als_factors",
    "sp_sgd_factors",
    "hier_semiclusters",
    "emb_ivfpq_topk",
    "sp_svdpp_factors",
    # r13: ec_maxbmatching, emb_lsh_topk, emb_ivf_topk, emb_kmeans,
    # emb_near_dup_lsh, emb_semantic_dedup and doc_bpe_segments left
    # this tail — constructed fixtures made their outputs provably
    # unique, so they are oracle-backed now. The remaining five are
    # genuinely closed-form-free: seeded factor numerics and the
    # Pregel semi-clustering score chain (evidence = their loss /
    # invariant twins) and the lossy-PQ top-k (emb_ivfpq_recall).
]


def scoring_history(
    repo_root: str, asof: int | None = None
) -> tuple[dict[str, int], dict[str, bool]]:
    """(query -> latest scored round, query -> latest score was green).

    Green = ``hash_match is True`` for oracle-backed rows, or a non-None
    ``spark_rows`` for rows-only checks. A query's green status is taken
    from its LATEST artifact row — an old red superseded by a newer
    green row stays green.

    ``asof`` caps the rounds considered — ``--check`` passes the round
    recorded when the current window ordering was applied, so artifacts
    committed later in the cycle don't move the goalposts.
    """
    last: dict[str, int] = {}
    green: dict[str, bool] = {}
    for path in glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        if asof is not None and rnd > asof:
            continue
        with open(path) as f:
            for name, row in json.load(f).items():
                if rnd >= last.get(name, 0):
                    last[name] = rnd
                    if isinstance(row, dict):
                        green[name] = (
                            row.get("hash_match") is True
                            or (
                                row.get("hash_match") is None
                                and row.get("spark_rows") is not None
                                and not row.get("err")
                            )
                        )
                    else:
                        green[name] = False
    return last, green


def _asof_path(repo_root: str) -> str:
    return os.path.join(repo_root, "scripts", "WINDOW_ASOF")


def read_asof(repo_root: str) -> int | None:
    try:
        with open(_asof_path(repo_root)) as f:
            return int(f.read().strip())
    except (OSError, ValueError):
        return None


def compute_order(
    registry: list[str], last: dict[str, int], green: dict[str, bool]
) -> list[str]:
    tail = [q for q in PERMANENT_TAIL if q in registry]
    body = [q for q in registry if q not in tail]
    red = [q for q in body if q in last and not green.get(q, False)]
    never = [q for q in body if q not in last]
    scored = sorted(
        (q for q in body if q in last and green.get(q, False)),
        key=lambda q: (last[q], registry.index(q)),
    )
    return red + never + scored + tail


def main() -> int:
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entry_mod

    registry = list(entry_mod.queries().keys())
    oracles = entry_mod.oracle_sql()

    if "--write-asof" in sys.argv:
        rounds = [
            int(m.group(1))
            for p in glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))
            if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
        ]
        asof = max(rounds) if rounds else 0
        with open(_asof_path(repo_root), "w") as f:
            f.write(f"{asof}\n")
        print(f"wrote WINDOW_ASOF = {asof}")
        return 0

    asof = read_asof(repo_root) if "--check" in sys.argv else None
    last, green = scoring_history(repo_root, asof=asof)
    order = compute_order(registry, last, green)

    if "--check" in sys.argv:
        # invariant: a query whose LATEST score was red/errored must be
        # inside the window — a fixed bug is worthless until re-scored
        # (round-9 lesson: doc_blocklist escaped re-scoring this way).
        window = set(registry[:50])
        stranded_red = [
            q for q in registry
            if q in last and not green.get(q, False)
            and q not in PERMANENT_TAIL and q not in window
        ]
        if stranded_red:
            print(f"RED OUTSIDE WINDOW: {stranded_red} — these queries' "
                  "latest score was not green; re-rotate them into the "
                  "first 50 slots so the driver re-scores them")
            return 1
        # mid-round additions are registered AFTER slot 50 and wait for
        # the next rotation (the window is fixed when the round starts),
        # so never-scored queries beyond slot 50 are excluded before
        # comparing — they'd otherwise jump the queue retroactively.
        mid_round = {q for q in registry[50:] if q not in last}
        order = compute_order(
            [q for q in registry if q not in mid_round], last, green
        )
        want, got = order[:50], registry[:50]
        if want == got:
            print("OK: queries() starts with the computed 50-slot window")
            return 0
        for i, (w, g) in enumerate(zip(want, got), 1):
            if w != g:
                print(f"slot {i}: want {w!r}, got {g!r}")
        print("MISMATCH: reorder queries() to match `rotate_window.py`")
        return 1

    print(f"# registry: {len(registry)} queries; "
          f"{sum(1 for q in registry if q not in last)} never scored; "
          f"{sum(1 for q in registry if q in last and not green.get(q, False) and q not in PERMANENT_TAIL)} latest-red; "
          f"window = first 50 below")
    for i, q in enumerate(order, 1):
        mark = "" if q in oracles else "  [rows-only]"
        if q in last:
            status = "" if green.get(q, False) else "  ** LATEST NOT GREEN **"
            hist = f"last r{last[q]}{status}"
        else:
            hist = "NEVER SCORED"
        bar = "  <-- window ends" if i == 50 else ""
        print(f"{i:3d}. {q:40s} {hist}{mark}{bar}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
