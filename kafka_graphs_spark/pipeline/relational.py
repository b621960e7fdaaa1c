"""Relational operators Spark's DataFrame API lacks: as-of join, bucketized range join.

Beyond-reference tier. An as-of join matches each left row to the
single most recent right row at or before it (per key) — pandas'
``merge_asof``, kdb's ``aj``, DuckDB's ``ASOF JOIN``. Spark has no
built-in; the naive formulations are a range theta-join (quadratic
blow-up per key) or a per-key ``applyInPandas`` (Python in the hot
path). This implementation is the union+window trick:

1. tag right rows (carrying their payload as one struct) and left rows,
2. union them on (key, time),
3. one window per key ordered by (time, side, tie-break) takes
   ``last(payload, ignorenulls=True)`` over the unbounded-preceding
   frame — each left row picks up the latest right payload at or
   before it,
4. keep the left rows.

Cost: ONE shuffle on the key (the window sort), no Python, no
row-multiplication — the 100 TB shape. Right rows sort before left
rows at equal timestamps, so the match is inclusive (t_right ≤ t_left);
equal-timestamp right duplicates are resolved deterministically by the
highest tie-break value.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "interval_join", "range_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_cols: Sequence[str],
    tolerance: Optional[int] = None,
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join: every ``left`` row plus, for each name in
    ``right_cols``, the value from the most recent ``right`` row with
    ``right.ts <= left.ts`` and the same ``key`` (NULL when none).

    ``tolerance`` (same units as ``ts``, which must then be numeric)
    discards matches older than ``left.ts - tolerance``. Columns from
    ``right`` keep their names unless they collide with ``left``'s, in
    which case ``suffix`` is appended. Equal-``ts`` right rows are
    resolved deterministically: the row with the greatest first
    ``right_cols`` value wins.
    """
    if key in right_cols or ts in right_cols:
        raise ValueError("right_cols must not include the key/ts columns")
    payload = F.struct(*[F.col(c) for c in right_cols])
    r = right.select(
        F.col(key).alias("_k"),
        F.col(ts).alias("_t"),
        F.lit(0).alias("_side"),
        payload.alias("_rv"),
    )
    l = left.select(
        F.col(key).alias("_k"),
        F.col(ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_rv"].dataType).alias("_rv"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lv"),
    )
    u = r.select("_k", "_t", "_side", "_rv", F.lit(None).cast(l.schema["_lv"].dataType).alias("_lv")).unionByName(l)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t"), F.col("_side"), F.col("_rv"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.select(
        "_side",
        "_t",
        "_lv",
        F.last("_rv", ignorenulls=True).over(w).alias("_m"),
        F.last(F.when(F.col("_side") == 0, F.col("_t")), ignorenulls=True)
        .over(w)
        .alias("_mt"),
    ).filter(F.col("_side") == 1)
    if tolerance is not None:
        matched = matched.withColumn(
            "_m",
            F.when(
                F.col("_mt") >= F.col("_t") - F.lit(tolerance), F.col("_m")
            ),
        )
    out_cols = [F.col(f"_lv.{c}").alias(c) for c in left.columns]
    lcols = set(left.columns)
    for c in right_cols:
        name = c + suffix if c in lcols else c
        out_cols.append(F.col(f"_m.{c}").alias(name))
    return matched.select(*out_cols)


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    ts: str,
    start: str,
    end: str,
    bucket_width: int,
) -> DataFrame:
    """Every (interval, point) pair with ``start <= point.ts <= end`` —
    the point-in-interval range join, bucketized so it NEVER plans as a
    nested-loop/cartesian join.

    Spark compiles a bare ``start <= ts AND ts <= end`` condition to
    BroadcastNestedLoopJoin (every point against every interval). This
    implementation buckets time instead: each point lands in bucket
    ``ts div bucket_width``; each interval explodes to the buckets it
    covers (``sequence(start div W, end div W)``); the join is then an
    equi-join on the bucket key with the exact range predicate as a
    post-join filter. Cost: each interval replicates to
    ``len/W + 1`` bucket rows — pick ``bucket_width`` near the typical
    interval length so replication is a small constant — and the join
    shuffles on the bucket key. ``ts``/``start``/``end`` must be
    non-negative integers in the same unit (``div`` floors toward zero,
    so negative values would bucket incorrectly).

    Inner join semantics (unmatched intervals drop; for the left flavor
    semi-join the result back against the interval keys). Output: all
    interval columns, then all point columns (collisions suffixed
    ``_point``).
    """
    if bucket_width < 1:
        raise ValueError(f"bucket_width must be >= 1, got {bucket_width}")
    icols = set(intervals.columns)
    p = points.select(
        F.expr(f"{ts} div {int(bucket_width)}").alias("_b"),
        F.col(ts).alias("_pt"),
        F.struct(*[F.col(c) for c in points.columns]).alias("_pv"),
    )
    i = intervals.select(
        "*",
        F.explode(
            F.sequence(
                F.expr(f"{start} div {int(bucket_width)}"),
                F.expr(f"{end} div {int(bucket_width)}"),
            )
        ).alias("_b"),
    )
    j = i.join(p, on="_b").filter(
        (F.col("_pt") >= F.col(start)) & (F.col("_pt") <= F.col(end))
    )
    out_cols = [F.col(c) for c in intervals.columns]
    for c in points.columns:
        name = c + "_point" if c in icols else c
        out_cols.append(F.col(f"_pv.{c}").alias(name))
    return j.select(*out_cols)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_width: int,
) -> DataFrame:
    """Every (left, right) pair whose CLOSED intervals overlap
    (``l_start <= r_end AND r_start <= l_end``) — the interval-interval
    join, bucketized like :func:`range_join` so it never plans as a
    nested-loop join.

    Both sides explode to the time buckets their interval covers and
    equi-join on the bucket key. A pair sharing k buckets would join k
    times, so the join keeps exactly one copy with the canonical-bucket
    trick: emit only in the FIRST bucket both intervals occupy,
    ``_b == greatest(l_start div W, r_start div W)`` — every overlapping
    pair shares that bucket (the later-starting interval's first bucket),
    and only that one. No post-hoc distinct, so the plan stays one
    shuffle on the bucket key plus a post-join filter.

    Replication cost is ``len/W + 1`` rows per interval per side — pick
    ``bucket_width`` near the typical interval length. Endpoints must be
    non-negative integers in one unit (``div`` floors toward zero).
    Output: all left columns, then right columns (collisions suffixed
    ``_right``).
    """
    if bucket_width < 1:
        raise ValueError(f"bucket_width must be >= 1, got {bucket_width}")
    w = int(bucket_width)
    lcols = set(left.columns)
    l = left.select(
        F.struct(*[F.col(c) for c in left.columns]).alias("_lv"),
        F.col(l_start).alias("_ls"),
        F.col(l_end).alias("_le"),
        F.explode(
            F.sequence(F.expr(f"{l_start} div {w}"), F.expr(f"{l_end} div {w}"))
        ).alias("_b"),
    )
    r = right.select(
        F.struct(*[F.col(c) for c in right.columns]).alias("_rv"),
        F.col(r_start).alias("_rs"),
        F.col(r_end).alias("_re"),
        F.explode(
            F.sequence(F.expr(f"{r_start} div {w}"), F.expr(f"{r_end} div {w}"))
        ).alias("_b"),
    )
    j = l.join(r, on="_b").filter(
        (F.col("_ls") <= F.col("_re"))
        & (F.col("_rs") <= F.col("_le"))
        & (
            F.col("_b")
            == F.greatest(F.expr(f"_ls div {w}"), F.expr(f"_rs div {w}"))
        )
    )
    out = [F.col(f"_lv.{c}").alias(c) for c in left.columns]
    for c in right.columns:
        out.append(F.col(f"_rv.{c}").alias(c + "_right" if c in lcols else c))
    return j.select(*out)
