"""Semi-structured event processing: JSON property extraction, funnel
conversion, retention cohorts.

Beyond-reference pipeline tier — event/clickstream tables carry a JSON
payload column (the ``events.props`` testdata shape); extracting typed
fields and profiling them is the first step of every log-derived
training-data or feature pipeline. Extraction uses Spark's JVM-side
``get_json_object`` path expressions (codegen'd, no Python), so the
parse runs at scan speed and the per-group rollup is one
map-side-combined aggregation.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["json_props", "json_props_stats", "funnel", "retention_cohorts", "event_transitions", "event_path_ngrams"]


def json_props(
    events: DataFrame,
    keys: Sequence[str] = ("k",),
    props_col: str = "props",
    cast: str = "double",
) -> DataFrame:
    """All input columns plus one typed column per JSON key extracted
    from ``props_col`` (``$.key`` path; unparseable/missing → NULL).

    ``try_cast`` (not ``cast``) so a malformed value like ``{"k":"abc"}``
    yields NULL under Spark 4's default ANSI mode instead of raising
    CAST_INVALID_INPUT — matching TRY_CAST-to-NULL oracle semantics.
    """
    out = events
    for k in keys:
        out = out.withColumn(
            k, F.get_json_object(F.col(props_col), f"$.{k}").try_cast(cast)
        )
    return out


def json_props_stats(
    events: DataFrame,
    keys: Sequence[str] = ("k",),
    props_col: str = "props",
    group_col: str = "event_type",
) -> DataFrame:
    """Per-``group_col`` profile of JSON-extracted numeric properties:
    (group, n, and per key: <k>_nonnull, <k>_sum, <k>_min, <k>_max,
    <k>_avg). Integer-valued payloads make every statistic exact and
    engine-portable (avg = exact-int sum / exact count)."""
    typed = json_props(events, keys, props_col, cast="double")
    aggs = [F.count(F.lit(1)).alias("n")]
    for k in keys:
        c = F.col(k)
        aggs += [
            F.count(c).alias(f"{k}_nonnull"),
            F.sum(c).alias(f"{k}_sum"),
            F.min(c).alias(f"{k}_min"),
            F.max(c).alias(f"{k}_max"),
            F.avg(c).alias(f"{k}_avg"),
        ]
    return typed.groupBy(F.col(group_col).alias("group")).agg(*aggs)


def _epoch_seconds(events: DataFrame, ts_col: str):
    """Exact tz-free epoch seconds for either events-ts encoding: long ns
    (parquet TIMESTAMP(NANOS) under nanosAsLong) or TIMESTAMP_NTZ —
    both floor to the second DuckDB's floor(epoch(ts)) yields."""
    if dict(events.dtypes)[ts_col] == "bigint":
        return F.expr(f"{ts_col} div 1000000000")
    c = F.col(ts_col)
    return (
        F.datediff(c.cast("date"), F.lit("1970-01-01").cast("date")).cast("long")
        * F.lit(86400)
        + (F.hour(c) * 3600 + F.minute(c) * 60 + F.second(c)).cast("long")
    )


def funnel(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """(step, event_type, n_users) — strict ordered funnel conversion.

    A user completes step i at the EARLIEST type-i event at or after
    their step-(i−1) completion time (step 1 at their earliest type-1
    event); ``n_users`` counts users completing each step, so the
    sequence is non-increasing. The classic product-analytics funnel,
    expressed as len(steps) chained min-aggregations + semi-join-shaped
    equi-joins on the user key — each step is one shuffle on ``user_col``
    with a map-side-combined ``min``; no window over the full event
    stream, no Python. Timestamps are only compared, never emitted, so
    any orderable ts encoding works.

    Repeated step types (e.g. ``['view', 'view']``) gate on STRICTLY
    later timestamps: with ``>=`` throughout, the single event that
    completed the earlier occurrence of the type would satisfy the later
    occurrence too and repeated-step funnels would overcount. The strict
    gate means same-type events must carry distinct timestamps to chain.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    cur = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("_t"))
    )
    out = [(1, steps[0], cur)]
    for i, step_type in enumerate(steps[1:], start=2):
        # strict > when this type already completed an earlier step, so
        # one event can never satisfy two occurrences of its type
        gate = (
            (F.col(ts_col) > F.col("_prev"))
            if step_type in steps[: i - 1]
            else (F.col(ts_col) >= F.col("_prev"))
        )
        nxt = (
            events.filter(F.col(type_col) == step_type)
            .join(cur.select(user_col, F.col("_t").alias("_prev")), on=user_col)
            .filter(gate)
            .groupBy(user_col)
            .agg(F.min(ts_col).alias("_t"))
        )
        out.append((i, step_type, nxt))
        cur = nxt
    counts = None
    for i, step_type, df in out:
        c = df.agg(F.count(F.lit(1)).cast("long").alias("n_users")).select(
            F.lit(i).cast("long").alias("step"),
            F.lit(step_type).alias("event_type"),
            "n_users",
        )
        counts = c if counts is None else counts.unionByName(c)
    return counts


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_seconds: int = 604800,
) -> DataFrame:
    """(cohort, period, n_users) — classic retention triangle: users
    grouped by the period of their first event (``cohort`` = absolute
    period index, floor(first epoch-seconds / period_seconds)) and
    counted in every later period they were active (``period`` = offset
    from their cohort period; 0 = the cohort period itself).

    Two shuffles on the user key (first-period min, then distinct
    (user, period) activity) and one small final count — all
    map-side-combinable exact-integer arithmetic.
    """
    es = events.select(
        F.col(user_col).alias("_u"),
        _epoch_seconds(events, ts_col).alias("_s"),
    ).select("_u", F.expr(f"_s div {int(period_seconds)}").alias("_w"))
    first = es.groupBy("_u").agg(F.min("_w").alias("_cw"))
    act = es.distinct().join(first, on="_u")
    return (
        act.groupBy(
            F.col("_cw").alias("cohort"),
            (F.col("_w") - F.col("_cw")).alias("period"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """(prev_type, next_type, n, p) — first-order Markov transition
    profile of the event stream: for every ordered pair of consecutive
    events of the same user (time order, id tie-break), the transition
    count and the conditional probability p(next | prev) = n / Σ_next n.

    The standard "what do users do next" analysis (Markov-chain
    attribution, anomaly baselining, journey mining). One window pass
    partitioned by user (each user's history sorts within its partition)
    feeding a map-side-combined count; ``p`` is a single exact-integer
    division per output row, so both engines produce bit-identical
    doubles. Output is |event-type|²-bounded — tiny at any corpus scale.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    pairs = events.select(
        F.col(type_col).alias("prev_type"),
        F.lead(type_col).over(w).alias("next_type"),
    ).filter(F.col("next_type").isNotNull())
    agg = pairs.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    wp = Window.partitionBy("prev_type")
    return agg.select(
        "prev_type",
        "next_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(wp)).alias("p"),
    )


def event_path_ngrams(
    events: DataFrame,
    n: int = 3,
    k: int = 20,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """(path, n_occurrences, rank) — the ``k`` most frequent length-``n``
    event-type sequences across all user histories (journey mining /
    funnel discovery: :func:`funnel` checks a KNOWN sequence, this finds
    the candidates).

    One window pass per offset builds the n-gram via ``lead`` (time
    order, id tie-break), then a map-side-combined count. The ranked
    output is |event-types|^n-bounded — tiny regardless of corpus size —
    so the final ordering window is safe; ties break on the path string
    for determinism.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    cols = [F.col(type_col)] + [
        F.lead(type_col, i).over(w) for i in range(1, int(n))
    ]
    paths = events.select(
        F.concat_ws(" > ", *cols).alias("path"),
        cols[-1].isNotNull().alias("_full"),
    ).filter(F.col("_full"))
    agg = paths.groupBy("path").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences")
    )
    rk = Window.orderBy(F.desc("n_occurrences"), F.asc("path"))
    return (
        agg.withColumn("rank", F.row_number().over(rk).cast("long"))
        .filter(F.col("rank") <= k)
    )
