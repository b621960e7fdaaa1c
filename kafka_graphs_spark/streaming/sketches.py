"""Mergeable frequency sketches — distributed Misra-Gries heavy
hitters.

Beyond-reference streaming-summary operator (the reference's §2.9 tier
keeps single-pass graph summaries; heavy hitters is the classic
single-pass FREQUENCY summary every event pipeline wants at 100 TB,
where an exact groupBy on a hot key column is wasteful and the consumer
only needs the head of the distribution).

The summary is the Misra-Gries / Frequent(k) sketch, computed the
mergeable-summaries way (Agarwal et al., PODS 2012): each partition
builds its own k-counter summary in one pass (vectorized per Arrow
batch: exact ``value_counts`` merged into the counter dict, then one
decrement round when the dict exceeds k — identical semantics to
per-item MG, far fewer Python ops), the per-partition summaries are
summed item-wise (one tiny shuffle over <= k x partitions rows), and
the (k+1)-th largest summed estimate is subtracted from every item
(clip at 0) — after which at most k items survive.

Guarantees (n = stream length):

- ``est_count(i) <= true_count(i)`` for every item (never overestimates);
- ``true_count(i) - est_count(i) <= 2n/(k+1)`` for every item,
  reported or not (in-partition decrements spend a GLOBAL budget of
  n/(k+1) rounds; the final clip subtracts at most another n/(k+1));
- every item with ``true_count > 2n/(k+1)`` is reported.

Estimates depend on partition/batch boundaries (any MG does), but the
guarantees above do not — verification and the driver twin check the
guarantees, not the raw estimates.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def misra_gries(df: DataFrame, item_col: str, k: int) -> DataFrame:
    """(item, est_count) — at most ``k`` rows; see module docstring.

    ``item_col`` must be integer-typed (cast strings to a surrogate id
    upstream — the sketch itself is type-agnostic, the fixed Arrow
    schema here is not). NULL items (e.g. a failed cast) are excluded
    from the stream up front — pandas ``value_counts`` silently drops
    NaN, so without the explicit filter the sketch would lose NULL mass
    while an exact count kept it, breaking the n-based guarantees.
    """
    if k < 1:
        raise ValueError("k must be >= 1")

    def summarize(batches: Iterator):
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            for item, c in pdf["item"].value_counts().items():
                counters[item] = counters.get(item, 0) + int(c)
            if len(counters) > k:
                off = sorted(counters.values(), reverse=True)[k]
                counters = {
                    i: c - off for i, c in counters.items() if c - off > 0
                }
        yield pd.DataFrame(
            {
                "item": list(counters.keys()),
                "est_count": list(counters.values()),
            }
        )

    parts = (
        df.select(F.col(item_col).cast("long").alias("item"))
        .filter(F.col("item").isNotNull())
        .mapInPandas(summarize, schema="item long, est_count long")
    )
    summed = parts.groupBy("item").agg(F.sum("est_count").alias("est_count"))
    # final clip via an unpartitioned window over the ALREADY-summed
    # frame (<= k x partitions rows — one task, no corpus re-scan; a
    # broadcast-scalar formulation would re-execute the sketch subplan)
    w = Window.orderBy(F.desc("est_count"), F.asc("item"))
    ranked = summed.withColumn("_rn", F.row_number().over(w))
    off = F.max(
        F.when(F.col("_rn") == k + 1, F.col("est_count"))
    ).over(Window.partitionBy())
    return (
        ranked.select(
            "item",
            (F.col("est_count") - F.coalesce(off, F.lit(0))).alias(
                "est_count"
            ),
        )
        .filter(F.col("est_count") > 0)
    )


def heavy_hitters_check(df: DataFrame, item_col: str, k: int) -> DataFrame:
    """One-row guarantee audit of :func:`misra_gries` against the exact
    counts: (k, n_events, underest_violations, error_violations,
    n_heavy, heavy_missing, top1_id, top1_true).

    All three violation counters must be 0 by the sketch guarantees;
    ``n_heavy`` (items with ``true > 2n/(k+1)``) and the exact top-1 are
    data-derived, so the row is not vacuous. Arithmetic stays in exact
    integers: the bound test is ``(true - est) * (k+1) > 2 * n``.

    ``top1_id``/``top1_true`` come from the EXACT side over ALL items
    (argmax of true counts, min-item tie-break) — deriving them from
    reported items only would coincide with the true top-1 only when it
    is heavy, flipping the audit red on mild skew for a non-bug. NULL
    items are excluded, mirroring :func:`misra_gries`.
    """
    items = df.select(F.col(item_col).cast("long").alias("item")).filter(
        F.col("item").isNotNull()
    )
    mg = misra_gries(items, "item", k)
    exact = items.groupBy("item").agg(
        F.count(F.lit(1)).cast("long").alias("true_count")
    )
    n = F.sum("true_count").over(Window.partitionBy())
    j = (
        exact.withColumn("_n", n)
        .join(mg, on="item", how="left")
        .select(
            "item",
            "true_count",
            "_n",
            F.coalesce("est_count", F.lit(0)).alias("est"),
            F.col("est_count").isNotNull().alias("reported"),
        )
    )
    heavy = (F.col("true_count") * (k + 1)) > (2 * F.col("_n"))
    return j.agg(
        F.lit(k).cast("long").alias("k"),
        F.max("_n").alias("n_events"),
        F.sum(
            F.when(F.col("est") > F.col("true_count"), 1).otherwise(0)
        ).cast("long").alias("underest_violations"),
        F.sum(
            F.when(
                (F.col("true_count") - F.col("est")) * (k + 1)
                > 2 * F.col("_n"),
                1,
            ).otherwise(0)
        ).cast("long").alias("error_violations"),
        F.sum(F.when(heavy, 1).otherwise(0)).cast("long").alias("n_heavy"),
        F.sum(
            F.when(heavy & ~F.col("reported"), 1).otherwise(0)
        ).cast("long").alias("heavy_missing"),
        F.max(
            F.struct("true_count", (-F.col("item")).alias("_ni"))
        )["_ni"].cast("long").alias("_neg_top1"),
        F.max("true_count").alias("top1_true"),
    ).select(
        "k",
        "n_events",
        "underest_violations",
        "error_violations",
        "n_heavy",
        "heavy_missing",
        (-F.col("_neg_top1")).alias("top1_id"),
        "top1_true",
    )
