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


def quantile_summary(df: DataFrame, value_col: str, k: int) -> DataFrame:
    """(value, weight, err) — a deterministic MERGEABLE quantile summary
    (the block-max summary of Manku-Rajagopalan-Lindsay-style
    deterministic sketches, one level, mergeable-summaries style like
    :func:`misra_gries`).

    Each partition sorts its ``n_p`` values once and emits one entry
    per block of ``b_p = ceil(n_p/k)`` consecutive values: the block
    MAX with the block size as ``weight``. For any query value ``x``,
    the weight-sum of entries with ``value <= x`` UNDER-estimates the
    true ``count(<= x)`` by at most ``b_p - 1`` per partition (only the
    one straddling block can hide values ``<= x`` behind a larger
    block max); that per-partition slack is carried in ``err`` (on one
    row per partition, 0 elsewhere), so the merged summary's total
    rank slack is exactly ``sum(err)`` — summaries merge by plain
    UNION, the mergeable-summaries property.

    Scale shape: one in-memory sort per partition (the partition
    already fits an executor by construction), output <= (k+1) rows
    per partition, NO shuffle here at all — callers aggregate the tiny
    merged frame. NULLs are excluded (same contract as
    :func:`misra_gries`).
    """
    if k < 1:
        raise ValueError("k must be >= 1")

    def summarize(batches):
        import numpy as np
        import pandas as pd

        chunks = [pdf["x"].to_numpy(dtype="float64") for pdf in batches]
        if not chunks:
            return
        v = np.sort(np.concatenate(chunks))
        n_p = len(v)
        if n_p == 0:
            return
        b = -(-n_p // k)  # ceil(n_p / k)
        idx = np.arange(b - 1, n_p, b)
        if idx[-1] != n_p - 1:  # short final block keeps the global max
            idx = np.append(idx, n_p - 1)
        weights = np.diff(np.append(np.int64(-1), idx))
        out = pd.DataFrame(
            {"value": v[idx], "weight": weights, "err": np.int64(0)}
        )
        out.loc[0, "err"] = b - 1
        yield out

    return (
        df.select(F.col(value_col).cast("double").alias("x"))
        .filter(F.col("x").isNotNull())
        .mapInPandas(summarize, schema="value double, weight long, err long")
    )


def quantile_estimates(
    df: DataFrame, value_col: str, k: int, probes
) -> DataFrame:
    """(q, est) — lower-quantile estimates from :func:`quantile_summary`:
    ``est(q)`` is the smallest summary value whose cumulative weight
    reaches ``ceil(q * n)``. The estimate's true rank satisfies
    ``ceil(q*n) <= count(<= est) <= ceil(q*n) + max_weight + sum(err)``
    (see :func:`quantile_sketch_check`, which verifies exactly that).

    The cumulative-weight window runs over the ALREADY-summarized frame
    (<= (k+1) x partitions rows — one task, no re-scan; the same shape
    as :func:`misra_gries`'s final clip).
    """
    parts = quantile_summary(df, value_col, k)
    n = F.sum("weight").over(Window.partitionBy())
    cum = F.sum("weight").over(
        Window.orderBy(F.asc("value")).rowsBetween(
            Window.unboundedPreceding, 0
        )
    )
    ranked = parts.select(
        "value", cum.alias("_cum"), n.alias("_n")
    )
    spark = df.sparkSession
    pf = spark.createDataFrame(
        [(float(q),) for q in probes], "q double"
    )
    return (
        ranked.join(F.broadcast(pf))
        .filter(F.col("_cum") >= F.ceil(F.col("q") * F.col("_n")))
        .groupBy("q")
        .agg(F.min("value").alias("est"))
    )


def quantile_sketch_check(
    df: DataFrame, value_col: str, k: int, probes
) -> DataFrame:
    """Per-probe guarantee audit of the quantile summary against the
    exact order statistics: (q, target_rank, n_values, true_value,
    within_bound).

    ``true_value`` is the EXACT lower q-quantile (the value at sorted
    rank ``ceil(q*n)``) and ``target_rank``/``n_values`` are exact —
    all data-derived, so the row is never vacuous. ``within_bound``
    verifies the sketch contract on the estimate's true rank:
    ``target_rank <= count(<= est) <= target_rank + max_weight +
    sum(err)``; it must be true for every probe on any input and any
    partitioning (the estimates themselves are partition-dependent —
    any deterministic summary's are — so they are checked, not
    emitted). The exact side is one global sort of the value column —
    the audit's cost, exactly like :func:`heavy_hitters_check`'s exact
    groupBy.
    """
    vals = (
        df.select(F.col(value_col).cast("double").alias("x"))
        .filter(F.col("x").isNotNull())
    )
    parts = quantile_summary(df, value_col, k)
    slack = parts.agg(
        (F.max("weight") + F.sum("err")).cast("long").alias("_slack")
    )

    est = quantile_estimates(df, value_col, k, probes)

    # exact side: rank every value once, join each probe to its target
    rn = F.row_number().over(Window.orderBy(F.asc("x")))
    n = F.count(F.lit(1)).over(Window.partitionBy())
    ranked = vals.select("x", rn.alias("_rn"), n.alias("_n"))
    spark = df.sparkSession
    pf = spark.createDataFrame([(float(q),) for q in probes], "q double")
    exact = (
        ranked.join(F.broadcast(pf))
        .filter(
            F.col("_rn") == F.ceil(F.col("q") * F.col("_n")).cast("long")
        )
        .select(
            "q",
            F.col("_rn").alias("target_rank"),
            F.col("_n").cast("long").alias("n_values"),
            F.col("x").alias("true_value"),
        )
    )
    # true rank of each estimate, in one conditional aggregate pass
    c_est = (
        vals.join(F.broadcast(est))
        .groupBy("q", "est")
        .agg(
            F.sum(F.when(F.col("x") <= F.col("est"), 1).otherwise(0))
            .cast("long")
            .alias("_c_est")
        )
    )
    return (
        exact.join(c_est, on="q", how="left")
        .join(F.broadcast(slack))
        .select(
            "q",
            "target_rank",
            "n_values",
            "true_value",
            (
                (F.col("_c_est") >= F.col("target_rank"))
                & (
                    F.col("_c_est")
                    <= F.col("target_rank") + F.col("_slack")
                )
            ).alias("within_bound"),
        )
    )


def streaming_hot_keys(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    window_duration: str,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Per-window running key counts over a watermarked stream —
    the streaming stage of the online skew monitor (the online twin of
    the batch :func:`~kafka_graphs_spark.pipeline.datasheet.hot_keys`
    audit: watch a would-be join/aggregation key for emerging hot
    values WHILE the data arrives, instead of discovering the skew in
    a post-mortem).

    Returns an update-mode streaming frame ``(window_start, key,
    n_rows)`` — epoch-aligned tumbling windows over ``ts_col``, ONE
    windowed stateful aggregation (map-side combinable count), state
    bounded by (active windows × distinct keys per window) with closed
    windows evicted by the watermark. NULL keys count as a key (NULL
    skew is the most common real case). Feed the emissions to
    :func:`finalize_hot_keys` for the per-window top-k report (counts
    are monotone across re-emissions, so the finalizer takes the
    per-key max — the incremental-tier recipe).

    Scale ceiling, stated honestly: per-window state is the DISTINCT
    key count, which for an adversarial key column (e.g. a UUID) is
    the window's row count. When that bound is unacceptable, compose
    with the Misra-Gries sketch instead of this exact count: run
    :func:`misra_gries` per window inside a ``foreachBatch`` sink and
    sum the per-batch summaries by (window, key) — MG partials are
    mergeable (module docstring), so the summed estimates undercount
    by at most ``2·n_w/(k+1)`` per window and every key heavier than
    that still surfaces. The exact operator here is the right default:
    real join keys (user ids, URLs, domains) have per-window
    cardinalities that fit state comfortably, and the report is exact.
    """
    win = F.window(F.col(ts_col), window_duration)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(win.alias("_w"), F.col(key_col).alias("key"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        .select(
            F.col("_w.start").cast("long").alias("window_start"),
            "key",
            "n_rows",
        )
    )


def finalize_hot_keys(emissions: DataFrame, k: int = 10) -> DataFrame:
    """(window_start, key, n_rows, share, rank) — per-window top-k from
    :func:`streaming_hot_keys` update-mode emissions.

    Counts are monotone across re-emissions of the same (window, key),
    so the per-key MAX is the final count; the ranking window then runs
    over the AGGREGATED per-(window,key) frame only (never the event
    stream), partitioned by window — the same one-small-shuffle shape
    as the batch ``hot_keys`` audit, per window.
    """
    agg = emissions.groupBy("window_start", "key").agg(
        F.max("n_rows").alias("n_rows")
    )
    total = F.sum("n_rows").over(Window.partitionBy("window_start"))
    w = Window.partitionBy("window_start").orderBy(
        F.desc("n_rows"), F.asc_nulls_first("key")
    )
    return (
        agg.withColumn("share", F.round(F.col("n_rows") / total, 6))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )
