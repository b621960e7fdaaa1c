"""Event sessionization — gap-based per-user sessions over the events
table.

Beyond-reference pipeline operator (the reference's streaming tier has
session windows only implicitly via Kafka Streams windowing; a training-
data pipeline needs batch sessionization for behavioral features and
sequence construction). Pure window functions — lag + a running sum of
session-break flags — so the whole plan is JVM-side whole-stage codegen:
one shuffle on the user key, no UDFs, no driver data. The per-user sort
inside each hash partition is the same work a 1000-executor cluster
does per partition; skewed power-users are bounded by the per-user event
count, not the table size.

Timestamps are compared in exact integer microseconds (unix_micros /
epoch_us) — float epoch seconds would make the gap predicate
engine-dependent at microsecond resolution.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _micros(events: DataFrame, ts_col: str) -> Column:
    """Exact integer epoch microseconds of a timestamp column.

    TIMESTAMP (ltz): unix_micros directly. TIMESTAMP_NTZ (the parquet
    testdata): unix_micros refuses NTZ, and a cast to ltz would inject the
    session timezone — instead derive tz-free epoch micros by date
    arithmetic (days·86400 + hh·3600 + mm·60 plus DECIMAL(8,6) seconds,
    all exact), matching DuckDB's naive epoch_us semantics.
    """
    col = F.col(ts_col)
    dtype = events.schema[ts_col].dataType
    if isinstance(dtype, T.TimestampNTZType):
        days = F.datediff(
            col.cast("date"), F.lit("1970-01-01").cast("date")
        ).cast("long")
        whole = (
            days * 86400
            + F.hour(col).cast("long") * 3600
            + F.minute(col).cast("long") * 60
        )
        frac = F.date_part(F.lit("SECOND"), col)  # decimal(8,6), exact
        return (whole * 1_000_000 + (frac * 1_000_000).cast("long")).alias(
            f"_{ts_col}_us"
        )
    return F.unix_micros(col)


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Assign each event a per-user session number.

    A new session starts when the gap to the previous event of the same
    user strictly exceeds ``gap_minutes``. Events are ordered by
    (timestamp, ``order_tiebreak``) so simultaneous events sessionize
    deterministically. Returns the input columns plus ``session``
    (0-based per user, dense).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    us = _micros(events, ts_col)
    gap_us = int(gap_minutes) * 60 * 1_000_000
    brk = F.when(
        us - F.lag(us).over(w) > F.lit(gap_us), F.lit(1)
    ).otherwise(F.lit(0))
    return events.withColumn(
        "session", F.sum(brk).over(w).cast("long")
    )


def session_stats(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """One row per (user, session): event count, span, and value total.

    (user_id, session, n_events, start_us, end_us, duration_us,
    total_value) — timestamps as exact unix microseconds so the result is
    engine-portable. The aggregation is a map-side-combinable groupBy on
    (user, session) reusing the sessionize shuffle's partitioning.
    """
    s = sessionize(events, gap_minutes, user_col, ts_col)
    us = _micros(events, ts_col)
    return (
        s.groupBy(user_col, "session")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(us).alias("start_us"),
            F.max(us).alias("end_us"),
            F.round(F.sum(value_col), 6).alias("total_value"),
        )
        .withColumn("duration_us", F.col("end_us") - F.col("start_us"))
    )


def session_funnel(
    events: DataFrame,
    steps=("signup", "view", "purchase"),
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(step, event_type, n_sessions) — strict ordered funnel scoped to
    sessions: every step must happen in the SAME session, at or after
    the previous step's first occurrence. The session-scoped variant of
    :func:`~kafka_graphs_spark.pipeline.events.funnel` (which scopes to
    the whole user history) — "did the user convert within one visit".

    Shape: sessionize (one shuffle on the user key), then one chained
    min-aggregation per step on the (user, session) key — map-side
    combined, exact integer microseconds throughout.
    """
    s = sessionize(events, gap_minutes, user_col, ts_col)
    us = _micros(s, ts_col)
    base = s.select(
        F.col(user_col).alias("_u"), F.col("session").alias("_s"),
        F.col(type_col).alias("_t"), us.alias("_us"),
    )
    out = None
    prev = None
    for i, step_type in enumerate(steps, start=1):
        cur = base.filter(F.col("_t") == step_type)
        if prev is not None:
            cur = cur.join(prev, on=["_u", "_s"]).filter(
                F.col("_us") >= F.col("_pt")
            )
        reached = cur.groupBy("_u", "_s").agg(F.min("_us").alias("_pt"))
        c = reached.agg(F.count(F.lit(1)).cast("long").alias("n_sessions")).select(
            F.lit(i).cast("long").alias("step"),
            F.lit(step_type).alias("event_type"),
            "n_sessions",
        )
        out = c if out is None else out.unionByName(c)
        prev = reached
    return out


def session_stats_stream(
    events_stream: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "1 hour",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Streaming session statistics via Spark's NATIVE session windows:
    (user_id, session_start, session_end, n_events, total_value), one
    row per closed session, emitted once its watermark passes.

    The idiomatic Structured Streaming twin of :func:`session_stats` —
    ``F.session_window`` lets the engine merge in-gap events and manage
    session state (vs :func:`~kafka_graphs_spark.streaming.stateful.stateful_sessions`,
    which hand-rolls the same state for update-mode running emissions;
    this variant trades emission latency for engine-managed state and
    append-mode exactly-once sinks). Boundary semantics: the native
    window closes at a gap >= gap_minutes, while the batch
    :func:`sessionize` splits only when the gap STRICTLY exceeds it —
    events landing exactly on the boundary differ; at sub-second event
    resolutions this never binds. Watermarks require a TIMESTAMP event
    time (Spark rejects TIMESTAMP_NTZ) — cast NTZ sources first; gap
    semantics are offset-invariant so the cast only shifts the reported
    window bounds, never the grouping.
    """
    gap = f"{int(gap_minutes)} minutes"
    s = events_stream.withWatermark(ts_col, watermark)
    return (
        s.groupBy(
            F.session_window(F.col(ts_col), gap).alias("_w"),
            F.col(user_col).alias("user_id"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum(F.col(value_col).cast("double")), 6).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("_w.start").alias("session_start"),
            F.col("_w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
