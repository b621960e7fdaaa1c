"""Shared iteration plumbing for DataFrame-native algorithm loops.

Every iterative algorithm must (a) truncate lineage each round —
unbounded lineage is the classic iterative-Spark OOM (SURVEY.md §4.1
"state") — and (b) keep its state hash-partitioned on the vertex id so
the per-round join with messages reuses one Exchange.

``localCheckpoint`` materializes into the block manager and CUTS lineage,
so a checkpointed frame can only be freed once nothing lazy still reads
it: LoopState frees generation N-1 when generation N+1 is created.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame

MAX_LONG = (1 << 63) - 1  # reference UNVISITED (BreadthFirstSearch.java:37)
INF = float("inf")


class LoopState:
    """Double-buffered localCheckpoint tracker for iterative loops.

    checkpoint(df) returns an eagerly-materialized, lineage-free frame.
    The previous generation is kept alive for one more round (lazy plans
    built this round may still reference it), then unpersisted.
    """

    def __init__(self):
        self._prev: List[DataFrame] = []
        self._cur: List[DataFrame] = []

    def checkpoint(self, *dfs: DataFrame) -> DataFrame:
        outs = [df.localCheckpoint(eager=True) for df in dfs]
        for old in self._prev:
            old.unpersist()
        self._prev = self._cur
        self._cur = outs
        return outs[0] if len(outs) == 1 else tuple(outs)

    def release(self) -> None:
        for old in self._prev + self._cur:
            old.unpersist()
        self._prev = []
        self._cur = []
