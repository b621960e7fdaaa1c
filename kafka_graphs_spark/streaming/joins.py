"""Stream-stream interval joins — the watermarked two-stream join
Structured Streaming executes with bounded state.

Beyond-reference streaming surface (the reference's Kafka Streams tier
has KStream-KStream windowed joins; this is the Spark-native analogue):
the canonical click-to-purchase attribution shape, expressed so the
engine can GARBAGE-COLLECT join state — both sides carry a watermark
and the join condition bounds the event-time distance, which is exactly
what Spark requires to avoid unbounded state at scale.

Semantics: INNER interval joins emit a pair as soon as both sides have
arrived (no watermark wait — the watermark only bounds how long a row
is retained for future matches), so results are exact whenever the
watermark delay covers the stream's disorder. At 100 TB the state per
key is bounded by (interval width + watermark delay) x arrival rate —
the knob production pipelines actually tune.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_seconds: int = 0,
    upper_seconds: int = 1800,
    watermark: str = "1 hour",
) -> DataFrame:
    """Join two watermarked streams on ``key`` where the right event's
    time lies in ``[left_ts - upper_seconds, left_ts - lower_seconds]``
    (defaults: right happens AT OR BEFORE left, within 30 minutes — the
    attribution shape "the click that preceded this purchase").

    Returns the joined frame with both sides' columns; the caller
    projects. Both inputs get ``withWatermark`` (required for
    stream-stream state cleanup); the range predicate must reference
    the event-time columns directly so Spark derives the state bound.
    Works identically on batch frames (withWatermark is a no-op there),
    so batch backfill uses the same code path.
    """
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    lt, rt = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (rt >= lt - F.expr(f"INTERVAL {int(upper_seconds)} SECONDS"))
        & (rt <= lt - F.expr(f"INTERVAL {int(lower_seconds)} SECONDS"))
    )
    return l.join(r, cond, "inner")
