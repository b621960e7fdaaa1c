"""Semi-structured event processing: JSON property extraction.

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

__all__ = ["json_props", "json_props_stats"]


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
