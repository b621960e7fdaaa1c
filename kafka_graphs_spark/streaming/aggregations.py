"""SummaryBulkAggregation — two-level fold/combine over windowed edges.

Reference: io/kgraph/streaming/SummaryBulkAggregation.java:71-100 (and the
base contract SummaryAggregation.java:35-71): per-partition windowed fold
of edges into a summary S, then a global windowed reduce (combine) of the
partial summaries, then an optional transform S → T.

Spark re-expression: ``groupBy(window, spark_partition_id) →
applyInPandas(fold)`` produces one pickled partial per (window,
partition); ``groupBy(window) → applyInPandas(combine)`` tree-reduces
them. Summaries travel as pickled binary columns — opaque to Catalyst but
tiny (they are SKETCHES; the whole point is |S| ≪ |window|). At 100 TB
the fold pass is embarrassingly parallel and the combine pass moves only
num_partitions sketches per window.

Batch and streaming: on a batch frame this runs as-is. On a streaming
frame use ``run_streaming`` — foreachBatch folds each micro-batch and
merges into a per-window accumulator via the same combine, the idiomatic
Structured Streaming shape for custom mergeable state.
"""

from __future__ import annotations

import pickle
from typing import Callable, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

FoldFn = Callable[[object, object], object]  # (summary, row) -> summary
CombineFn = Callable[[object, object], object]  # (summary, summary) -> summary


def summary_bulk_aggregation(
    edges: DataFrame,
    initial: Callable[[], object],
    fold: FoldFn,
    combine: CombineFn,
    window_duration: Optional[str] = None,
    event_time: str = "event_time",
    transform: Optional[Callable[[object], object]] = None,
):
    """Fold each (window, partition) slice, combine partials per window.

    Returns a DataFrame ``(window struct|null, summary binary)`` — one row
    per window with the pickled combined summary. Use :func:`collect_summaries`
    to get Python objects back.
    """
    import pandas as pd

    if window_duration is not None:
        win = F.window(F.col(event_time), window_duration).alias("window")
        keyed = edges.withColumn("_w", win["start"].cast("long"))
    else:
        keyed = edges.withColumn("_w", F.lit(0).cast("long"))
    keyed = keyed.withColumn("_p", F.spark_partition_id())

    data_cols = [c for c in edges.columns if c != event_time]

    def fold_partition(pdf: "pd.DataFrame") -> "pd.DataFrame":
        s = initial()
        for row in pdf[data_cols].itertuples(index=False):
            s = fold(s, row)
        return pd.DataFrame({"_w": [pdf["_w"].iloc[0]], "summary": [pickle.dumps(s)]})

    partials = keyed.groupBy("_w", "_p").applyInPandas(
        fold_partition, schema="_w long, summary binary"
    )

    def combine_window(pdf: "pd.DataFrame") -> "pd.DataFrame":
        acc = None
        for blob in pdf["summary"]:
            s = pickle.loads(bytes(blob))
            acc = s if acc is None else combine(acc, s)
        if transform is not None:
            acc = transform(acc)
        return pd.DataFrame({"_w": [pdf["_w"].iloc[0]], "summary": [pickle.dumps(acc)]})

    return partials.groupBy("_w").applyInPandas(
        combine_window, schema="_w long, summary binary"
    ).withColumnRenamed("_w", "window_start")


def collect_summaries(result: DataFrame, max_bytes: Optional[int] = 1 << 30) -> dict:
    """{window_start (epoch sec or 0): summary object} from the result frame.

    Summaries are window-bounded SKETCHES by design, but the collect is
    still a driver ingestion point, so it is size-guarded: the pickled
    byte length of the largest summary is measured EXECUTOR-side first
    (one scalar agg; only the number crosses to the driver) and a summary
    beyond ``max_bytes`` raises with a pointer to the windowed path
    instead of OOMing the driver. Pass ``max_bytes=None`` to skip the
    guard (e.g. per-micro-batch use where the extra action matters).
    """
    def _collect() -> dict:
        return {
            r["window_start"]: pickle.loads(bytes(r["summary"]))
            for r in result.collect()
        }

    if max_bytes is None:
        return _collect()
    # cache so the guard agg and the collect run the (expensive)
    # fold/combine pipeline once, not twice — but never clobber a cache
    # the CALLER manages on this frame (unpersist is not ref-counted)
    ours = result.storageLevel == StorageLevel.NONE
    if ours:
        result.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        biggest = result.agg(F.max(F.length("summary")).alias("b")).collect()[0]["b"]
        if biggest is not None and biggest > max_bytes:
            raise RuntimeError(
                f"summary of {biggest} bytes exceeds collect_summaries cap "
                f"{max_bytes}; narrow the window (summary size is window-"
                "bounded) or raise max_bytes explicitly"
            )
        return _collect()
    finally:
        if ours:
            result.unpersist()


def run_streaming(
    edges_stream: DataFrame,
    initial: Callable[[], object],
    fold: FoldFn,
    combine: CombineFn,
    window_duration: Optional[str],
    on_update: Callable[[dict], None],
    event_time: str = "event_time",
    checkpoint_dir: Optional[str] = None,
    trigger_available_now: bool = True,
):
    """Streaming driver: fold each micro-batch, merge into running
    per-window summaries, report via ``on_update({window: summary})``.

    The micro-batch fold reuses :func:`summary_bulk_aggregation`; the
    cross-batch merge is the same ``combine`` — exactly the reference's
    incremental windowed aggregation, with Spark supplying the batching.
    """
    state: dict = {}

    def process_batch(batch_df: DataFrame, _batch_id: int):
        if batch_df.isEmpty():
            return
        res = summary_bulk_aggregation(
            batch_df, initial, fold, combine, window_duration, event_time
        )
        # guard stays ON for the unattended streaming path: user folds are
        # not forced to be sketch-sized, and with the cache inside
        # collect_summaries the guard is one cached scan, not a recompute
        for w, s in collect_summaries(res).items():
            state[w] = combine(state[w], s) if w in state else s
        on_update(dict(state))

    writer = edges_stream.writeStream.foreachBatch(process_batch).outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    return query
