"""HyperANF — approximate neighborhood function via HyperLogLog counters.

Boldi, Rosa & Vigna, "HyperANF: Approximating the Neighbourhood Function
of Very Large Graphs on a Budget" (WWW 2011): per vertex, a HyperLogLog
register set approximates |{u : dist(v→u) ≤ t}|; each round element-wise
max-merges every vertex's counter with its out-neighbors' counters, so
round t's estimate is the t-ball size. Summing over vertices yields the
neighborhood function N(t) — the distance distribution, effective
diameter, and centrality-by-reachability all read off it. This is THE
web-scale distance algorithm: exact all-pairs is O(V·E) and infeasible
at 100 TB, while HyperANF is max_t rounds of one equi-join + one
map-side-combinable max-aggregation each, with 2^p small ints per
vertex.

Determinism: registers derive from ``xxhash64`` and the rank is computed
with exact integer/string ops (``conv`` base-2 length, no float log), so
results are identical under any partitioning or cluster size — the
estimate's only error is the HLL ±1.04/√m standard error, which the
oracle twin bounds explicitly.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_graphs_spark.graph import Graph


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def _init_registers(id_col, p: int):
    """HLL register array for the singleton set {id}: one register set to
    the rank (leading-zero count + 1) of the hash's upper bits — exact
    integer path: rank = (64 - p) - bitlength(w) + 1 with bitlength taken
    from the base-2 string (no float log, engine-stable)."""
    m = 1 << p
    h = F.xxhash64(id_col)
    idx = F.pmod(h, F.lit(m)).cast("int")
    w = F.shiftrightunsigned(h, p)
    rank = F.when(
        w == 0, F.lit(64 - p + 1)
    ).otherwise(F.lit(64 - p) - F.length(F.conv(w, 10, 2)) + 1).cast("int")
    return F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda i: F.when(i == idx, rank).otherwise(F.lit(0)),
    )


def _estimate(regs, m: int):
    """Standard HLL estimate with the small-range (linear counting)
    correction — computed per vertex from its register array."""
    alpha = _alpha(m)
    raw = F.lit(alpha * m * m) / F.aggregate(
        regs, F.lit(0.0), lambda acc, r: acc + F.pow(F.lit(2.0), -r.cast("double"))
    )
    zeros = F.aggregate(
        regs, F.lit(0), lambda acc, r: acc + F.when(r == 0, 1).otherwise(0)
    )
    return F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)


def hyperanf(
    graph: Graph,
    p: int = 6,
    max_iterations: int = 16,
    rel_tolerance: float = 0.001,
) -> DataFrame:
    """(t, n_pairs_est) — the neighborhood function: estimated number of
    ordered pairs (v, u) with ``dist(v→u) <= t``, for t = 0.. until the
    estimate stabilizes (relative change < ``rel_tolerance``) or
    ``max_iterations``. ``p`` sets 2^p registers per vertex (relative
    standard error ≈ 1.04/√(2^p); p=6 → ±13%).

    Each round: out-neighbor counters gather along edges (one equi-join),
    registers explode to (vertex, register, value) scalar rows, and a
    map-side-combinable MAX per (vertex, register) rebuilds the merged
    counter — the same bounded-reassembly shape as neighborhood feature
    aggregation (list length = 2^p, a constant). One scalar collect per
    round reads the global estimate; the loop is driver-paced like every
    iterative algorithm here, with an eager local checkpoint per round
    keeping lineage constant.
    """
    m = 1 << p
    verts = graph.vertices.select("id")
    edges = graph.edges.select("src", "dst").filter(F.col("src") != F.col("dst")).distinct()
    cur = verts.select("id", _init_registers(F.col("id"), p).alias("regs")
                       ).localCheckpoint(eager=True)

    results = []
    prev_total: Optional[float] = None
    for t in range(max_iterations + 1):
        total = float(
            cur.select(_estimate(F.col("regs"), m).alias("e"))
            .agg(F.sum("e").alias("s"))
            .collect()[0]["s"]
        )
        results.append((t, total))
        if prev_total is not None and prev_total > 0:
            if abs(total - prev_total) / prev_total < rel_tolerance:
                break
        prev_total = total
        if t == max_iterations:
            break
        # gather out-neighbor registers: v absorbs what its successors reach
        # (fresh column names on both sides — cur's lineage reaches the
        # same scan as edges in from_edges graphs, so an `on="dst"` join
        # would hit ambiguous-attribute resolution)
        nbr = (
            edges.select(F.col("src").alias("_gs"), F.col("dst").alias("_gd"))
            .join(
                cur.select(F.col("id").alias("_cid"), F.col("regs").alias("_nr")),
                F.col("_gd") == F.col("_cid"),
            )
            .select(F.col("_gs").alias("id"), F.col("_nr").alias("regs"))
        )
        merged = (
            cur.unionByName(nbr)
            .select("id", F.posexplode("regs").alias("j", "r"))
            .groupBy("id", "j")
            .agg(F.max("r").alias("r"))
            .groupBy("id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("j", "r"))),
                    lambda s: s["r"],
                ).alias("regs")
            )
        )
        prev, cur = cur, merged.localCheckpoint(eager=True)
        prev.unpersist()  # superseded generation — release its blocks

    spark = graph.vertices.sparkSession
    return spark.createDataFrame(
        [(t, round(v, 4)) for t, v in results], "t int, n_pairs_est double"
    )


def effective_diameter(
    graph: Graph,
    q: float = 0.9,
    p: int = 6,
    max_iterations: int = 32,
) -> float:
    """The q-effective diameter read off :func:`hyperanf`'s neighborhood
    function: the smallest t whose estimated pair count reaches a
    fraction ``q`` of the final (stabilized) count, with the standard
    linear interpolation between t−1 and t (Palmer/Faloutsos ANF
    convention). Driver-side arithmetic over the max_iterations-row
    neighborhood function — the graph work is hyperanf's."""
    if not (0.0 < q <= 1.0):
        raise ValueError("q must be in (0, 1]")
    nf = sorted(
        (r["t"], r["n_pairs_est"])
        for r in hyperanf(graph, p=p, max_iterations=max_iterations).collect()
    )
    if not nf:
        return 0.0
    target = q * nf[-1][1]
    prev_t, prev_v = nf[0]
    if prev_v >= target:
        return float(prev_t)
    for t, v in nf[1:]:
        if v >= target:
            if v == prev_v:
                return float(t)
            return prev_t + (target - prev_v) / (v - prev_v) * (t - prev_t)
        prev_t, prev_v = t, v
    return float(nf[-1][0])
