"""Shared iteration plumbing for DataFrame-native algorithm loops.

Every iterative algorithm must (a) truncate lineage each round —
unbounded lineage is the classic iterative-Spark OOM (SURVEY.md §4.1
"state") — and (b) keep its state hash-partitioned on the vertex id so
the per-round join with messages reuses one Exchange.

``localCheckpoint`` materializes into the block manager and CUTS lineage,
so a checkpointed frame can only be freed once nothing lazy still reads
it: LoopState frees generation N-1 when generation N+1 is created.

Stats hygiene (critical): ``Dataset.localCheckpoint`` copies the ORIGIN
plan's sizeInBytes estimate onto the resulting LogicalRDD, and join/union
estimates are PRODUCTS of their inputs. In an iterative loop those
products compound — the BigInteger byte-count estimate grows
exponentially in bit-length (measured: 80 → 474 → 2.8k → 17k decimal
digits in 4 rounds of a 5-join loop) until Catalyst spends minutes
multiplying million-digit numbers inside stats estimation. The fix:
materialize each generation through a persisted cache first, so the
checkpoint inherits the MEASURED InMemoryRelation size, then drop the
temporary cache entry.
"""

from __future__ import annotations

from typing import List

from pyspark import StorageLevel
from pyspark.sql import DataFrame

MAX_LONG = (1 << 63) - 1  # reference UNVISITED (BreadthFirstSearch.java:37)
INF = float("inf")


def checkpoint_with_real_stats(df: DataFrame) -> DataFrame:
    """localCheckpoint via a temporary cache so stats are measured, not
    the exponentially-compounding product estimate (see module docstring)."""
    df.persist(StorageLevel.MEMORY_AND_DISK)
    df.count()  # materialize the cache so InMemoryRelation has real stats
    out = df.localCheckpoint(eager=True)
    df.unpersist()
    return out


class LoopState:
    """Double-buffered localCheckpoint tracker for iterative loops.

    checkpoint(df) returns an eagerly-materialized, lineage-free frame
    with measured size stats. The previous generation is kept alive for
    one more round (lazy plans built this round may still reference it),
    then unpersisted.
    """

    def __init__(self):
        self._prev: List[DataFrame] = []
        self._cur: List[DataFrame] = []

    def checkpoint(self, *dfs: DataFrame) -> DataFrame:
        outs = [checkpoint_with_real_stats(df) for df in dfs]
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
