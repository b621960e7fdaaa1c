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

from typing import List, Optional, Sequence, Tuple

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame, Row
from pyspark.sql import functions as F

MAX_LONG = (1 << 63) - 1  # reference UNVISITED (BreadthFirstSearch.java:37)
INF = float("inf")


def _persistent_rdd_ids(sc) -> set:
    return {int(i) for i in sc._jsc.getPersistentRDDs().keySet()}


def _tag_ckpt_ids(out: DataFrame) -> DataFrame:
    """Tag a localCheckpoint output with ITS OWN checkpoint RDD id.

    The id is read off the frame's LogicalRDD plan directly — precise and
    thread-safe. The r13 implementation set-diffed ``getPersistentRDDs()``
    around the checkpoint call, which under concurrent query threads
    (the r14 parity sweep, guide §2.6) captured OTHER threads' freshly
    persisted RDDs and let ``free_df`` drop blocks a live loop still
    needed (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND).
    """
    try:
        rid = int(out._jdf.queryExecution().analyzed().rdd().id())
        out._kgs_ckpt_ids = [rid]
    except Exception:
        out._kgs_ckpt_ids = []  # blocks then fall to GC/ContextCleaner
    return out


def lazy_checkpoint(df: DataFrame) -> DataFrame:
    """``localCheckpoint(eager=False)`` with the created RDD's block ids
    tagged for explicit release (``free_df``). The checkpoint RDD is
    registered as persisted at mark time; its blocks materialize on the
    first action that computes through the returned frame."""
    return _tag_ckpt_ids(df.localCheckpoint(eager=False))


def eager_checkpoint(df: DataFrame, count: bool = False) -> DataFrame:
    """``localCheckpoint(eager=True)`` that records which block-manager RDDs
    the checkpoint created (tagged on the frame as ``_kgs_ckpt_ids``).

    ``DataFrame.unpersist()`` is a CacheManager call and a NO-OP for
    checkpointed frames (their LogicalRDD never registers there), so without
    the tag the blocks are reclaimed only by GC/ContextCleaner and long
    loops accumulate dead generations in the block manager. ``free_df``
    drops the tagged blocks explicitly. Returns (optionally) the row count
    alongside when ``count=True`` callers need it for free.
    """
    return _tag_ckpt_ids(df.localCheckpoint(eager=True))


def free_df(df: DataFrame) -> None:
    """Release a frame produced by persist() OR eager_checkpoint().

    Only call once nothing lazy still reads the frame — dropped checkpoint
    blocks cannot be recomputed (lineage is truncated).
    """
    try:
        df.unpersist()  # frees CacheManager entries (persisted frames)
    except Exception:
        pass
    ids = getattr(df, "_kgs_ckpt_ids", None)
    if ids:
        try:
            sc = df.sparkSession.sparkContext
            jmap = sc._jsc.getPersistentRDDs()
            for i in ids:
                jrdd = jmap.get(i)
                if jrdd is not None:
                    jrdd.unpersist(False)
        except Exception:
            pass
        df._kgs_ckpt_ids = []


def sized_cache(df: DataFrame, rows_per_partition: int = 250_000):
    """Persist a frame scanned once per loop round, with a partition count
    sized to its MEASURED row count.

    A cached leaf keeps its creation-time partition count, and every round
    re-scans it with one task per partition — at small sizes the fixed
    task overhead dominates the loop (measured: sssp sf0.1 30.8 s → 21.1 s
    just from right-sizing the cached edge frame). ``coalesce`` on the
    cached frame is a narrow op: tasks read multiple cached blocks, no
    shuffle, and the cache itself is untouched. At 100 TB the measured
    count keeps thousands of partitions — nothing is serialized.

    Returns ``(scan_df, release)`` — call ``release()`` (not
    ``scan_df.unpersist()``: the coalesced plan is not the cached plan)
    when the loop is done.
    """
    df.persist(StorageLevel.MEMORY_AND_DISK)
    n = df.count()
    target = max(1, -(-n // rows_per_partition))
    out = df
    if target < df.rdd.getNumPartitions():
        out = df.coalesce(target)
    return out, df.unpersist


#: logical-plan node names whose presence means re-deriving the frame
#: per loop round would repeat real work (a shuffle, an aggregation, a
#: window) instead of re-running a storage scan with pushed filters
_NONTRIVIAL_PLAN_NODES = (
    "Join", "Aggregate", "Window", "Generate", "Sort", "Repartition",
    "Rebalance", "Union", "Limit", "Deduplicate", "Expand",
)


def prunable_source(df: DataFrame) -> Optional[DataFrame]:
    """Return ``df`` when re-scanning it once per loop round is as cheap
    as a filtered storage scan — its optimized plan is scan/project/
    filter only — so per-round LITERAL frontier filters reach the source
    (parquet ``PushedFilters``, bucket pruning / ``SelectedBucketsCount``
    on bucketed tables, guide §6). Returns ``None`` when the frame
    derives through a shuffle-bearing op (its plan string mentions a
    Join/Aggregate/Window/…, including inside an ``InMemoryRelation``'s
    cached plan) — callers then fall back to their cached frame, where
    the literal filter still prunes in-memory batches by column stats."""
    try:
        plan = df._jdf.queryExecution().optimizedPlan().toString()
    except Exception:
        return None
    if any(n in plan for n in _NONTRIVIAL_PLAN_NODES):
        return None
    return df


def message_loop(edges_df: DataFrame, bytes_per_row: int = 32) -> "ChainLoop":
    """A :class:`ChainLoop` floored by the per-round MESSAGE volume.

    Message-propagation loops (HashMin, frontier relax, rank push)
    shuffle up to one message per edge per round, while the probe
    measures only the per-vertex state — on a hub-heavy graph
    (|E| >> |V|) state-sized tuning funnels the message shuffle into
    too few partitions (the r12 CF finding, generalized). ``edges_df``
    should be the ``sized_cache``'d frame, so the extra ``count()``
    here is a cheap cached scan. ``bytes_per_row`` sizes the message
    width (32 B for narrow (id, value) messages; pass more for fat
    payloads like SemiClustering's cluster lists). On |E| ~ |V| graphs
    (the benched event chains) the floors match the state sizing and
    behavior is unchanged.
    """
    n = edges_df.count()
    return ChainLoop(body_rows=n, body_bytes=n * bytes_per_row)


def checkpoint_with_real_stats(df: DataFrame) -> DataFrame:
    """localCheckpoint via a temporary cache so stats are measured, not
    the exponentially-compounding product estimate (see module docstring)."""
    df.persist(StorageLevel.MEMORY_AND_DISK)
    df.count()  # materialize the cache so InMemoryRelation has real stats
    out = eager_checkpoint(df)
    df.unpersist()
    return out


class LoopState:
    """Double-buffered localCheckpoint tracker for iterative loops.

    checkpoint(df) returns an eagerly-materialized, lineage-free frame
    with measured size stats. The previous generation is kept alive for
    one more round (lazy plans built this round may still reference it),
    then its blocks are dropped explicitly (``free_df`` — plain unpersist
    is a no-op on checkpointed frames).
    """

    def __init__(self):
        self._prev: List[DataFrame] = []
        self._cur: List[DataFrame] = []

    def checkpoint(self, *dfs: DataFrame) -> DataFrame:
        outs = [checkpoint_with_real_stats(df) for df in dfs]
        for old in self._prev:
            free_df(old)
        self._prev = self._cur
        self._cur = outs
        return outs[0] if len(outs) == 1 else tuple(outs)

    def release(self, keep: DataFrame = None) -> None:
        """Free all retained generations. Pass ``keep`` to protect a frame
        (e.g. the final checkpointed result) from block dropping."""
        for old in self._prev + self._cur:
            if keep is not None and old is keep:
                continue
            free_df(old)
        self._prev = []
        self._cur = []


def measured_size_bytes(df: DataFrame) -> int:
    """Optimized-plan sizeInBytes of a frame — for a materialized cached
    frame this is the MEASURED InMemoryRelation accumulator, not an
    estimate. Returns -1 when unavailable (e.g. no JVM plan access)."""
    try:
        size = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        # py4j maps java.math.BigInteger to a Python int already; keep a
        # toString fallback for any boxed representation
        return int(size) if isinstance(size, int) else int(size.toString())
    except Exception:
        return -1


class AdaptiveLoopConf:
    """Loop-scoped session tuning from MEASURED per-round sizes.

    Small regime (≤ SMALL_GEN_ROWS measured rows AND ≤ SMALL_GEN_BYTES
    measured bytes): shuffle partitions sized from measurement (min 1),
    AQE off — the partition count is already right-sized, so AQE's
    per-stage re-planning is pure driver latency (measured: sssp sf0.1
    local[32] 49.7 s with AQE → 30.1 s without, same plans). The
    partition count is the MAX of the row-based and byte-based targets,
    so wide-value loops (MSSP distance maps, SemiClustering arrays) are
    partitioned by their real byte weight, not an optimistic row count
    (bytes unmeasurable → row-based sizing alone, the pre-byte behavior).
    Large regime (either measure over threshold): the session's own
    configuration is restored untouched (AQE skew/coalesce handling is the right tool
    once rounds are scan-bound — the 100 TB regime). Call ``restore``
    when the loop ends (idempotent; safe in finally blocks).
    """

    SMALL_GEN_ROWS = 50_000_000
    SMALL_GEN_BYTES = 8 << 30  # ≈ rows threshold × a ~170 B/row state row
    ROWS_PER_PARTITION = 250_000
    BYTES_PER_PARTITION = 64 << 20

    def __init__(self):
        self._saved: Optional[dict] = None

    def tune(self, spark, n_rows: int, n_bytes: int = -1) -> None:
        conf = spark.conf
        if self._saved is None:
            self._saved = {
                "spark.sql.shuffle.partitions": conf.get("spark.sql.shuffle.partitions"),
                "spark.sql.adaptive.enabled": conf.get("spark.sql.adaptive.enabled"),
            }
        small = n_rows <= self.SMALL_GEN_ROWS and (
            n_bytes < 0 or n_bytes <= self.SMALL_GEN_BYTES
        )
        if small:
            saved = int(self._saved["spark.sql.shuffle.partitions"])
            by_rows = -(-n_rows // self.ROWS_PER_PARTITION)
            by_bytes = -(-n_bytes // self.BYTES_PER_PARTITION) if n_bytes >= 0 else 1
            parts = min(max(1, by_rows, by_bytes), max(saved, 1))
            conf.set("spark.sql.shuffle.partitions", str(parts))
            conf.set("spark.sql.adaptive.enabled", "false")
        else:
            self.restore(spark)

    def restore(self, spark) -> None:
        if self._saved is not None:
            for k, v in self._saved.items():
                spark.conf.set(k, v)


class ChainLoop:
    """Loop-state tracker with ONE Spark action per iteration.

    The localCheckpoint-per-round discipline (LoopState) costs 2 driver
    actions per round (count + eager checkpoint) plus any termination probe
    — 3 jobs per iteration, dominated by job-launch overhead when the
    per-round data is small. Chaining rounds lazily instead is exponential:
    each round references the previous state 2-3×, so k lazy rounds
    reference the base subplan 2^k-3^k times — measured: driver OOM in
    Catalyst before round 10 of the 3-reference WCC loop.

    ``advance`` does three things in one job:
      1. ``persist`` the new generation and materialize it with a single
         ``agg`` that doubles as the termination probe (returned Row);
      2. wrap it in a NON-EAGER ``localCheckpoint`` — the returned frame is
         a LogicalRDD LEAF, so the next round's plan is bounded (no lineage
         growth, no estimate compounding: the leaf copies the MEASURED
         InMemoryRelation stats);
      3. the checkpoint's blocks materialize lazily during the NEXT round's
         probe action (first computation through the leaf) — the lineage
         truncation job rides an action we were paying anyway.

    Generation bookkeeping: round k's probe materializes round k-1's
    checkpoint blocks, after which round k-1's cache and round k-2's
    checkpoint blocks are both dead; they are freed one round later
    (double-buffered) to stay clear of any lazy reader.
    """

    def __init__(
        self,
        adaptive: bool = True,
        body_rows: int = 0,
        body_bytes: int = 0,
    ):
        # [(cache_df, ckpt_df)] of recent rounds, oldest first (≤2 kept)
        self._gens: List[Tuple[DataFrame, DataFrame]] = []
        self._conf = AdaptiveLoopConf() if adaptive else None
        self._spark = None
        # Floors for the per-round shuffle sizing. The probe measures the
        # checkpointed STATE, but loops whose round BODY shuffles far more
        # than the state (CF: the per-edge gather/message payload is
        # 100-1000x the factor frame) must size partitions by the body —
        # 10k factor rows otherwise tune the 6M-rating gather to ONE
        # partition with AQE off (r12 finding: a single ShuffleMapTask
        # wrote the whole ~1 GB SVD++ gather at sf1.0). Callers pass the
        # known per-round volumes (e.g. n_ratings and its serialized
        # estimate); state-sized loops (WCC/SSSP frontiers) pass nothing
        # and keep the measured-state behavior.
        self._body_rows = body_rows
        self._body_bytes = body_bytes

    def _tune(self, n_rows: int, n_bytes: int = -1) -> None:
        if self._conf is not None and self._spark is not None:
            self._conf.tune(
                self._spark,
                max(n_rows, self._body_rows),
                max(n_bytes, self._body_bytes) if n_bytes >= 0 or self._body_bytes > 0
                else n_bytes,
            )

    def _restore_conf(self) -> None:
        if self._conf is not None and self._spark is not None:
            self._conf.restore(self._spark)

    def chain(self, df: DataFrame) -> DataFrame:
        """Lazy-checkpoint a round WITHOUT a Spark action (chunked loops).

        The returned frame is a LogicalRDD LEAF, so chaining K rounds
        between ``advance`` probes keeps every plan bounded (each round
        references the previous round's leaf, never its expanded lineage —
        the naive chain is exponential, see class docstring). The
        checkpoint blocks materialize during the next ``advance`` probe:
        one driver action then pays for the whole chunk.

        Stats caveat: a lazy checkpoint copies the ORIGIN plan's size
        estimate, and join estimates are products, so within a chunk the
        estimate bit-length doubles per round from the last MEASURED
        probe. Chunks of ≤8 rounds keep that a few thousand digits —
        cheap; unbounded chunks would hit the BigInteger stats wall.
        """
        out = lazy_checkpoint(df)
        self._gens.append((None, out))
        return out

    def advance(
        self, df: DataFrame, probes: Sequence[Column] = ()
    ) -> Tuple[DataFrame, Row]:
        """Materialize the next generation; return (leaf frame, probe row).

        ``probes``: aggregate columns evaluated in the same job that
        materializes the cache (e.g. ``F.sum(F.when(F.col('_changed'), 1)
        .otherwise(0)).alias('n')``) — the termination test rides the
        materialization action for free.
        """
        self._spark = df.sparkSession
        df.persist(StorageLevel.MEMORY_AND_DISK)
        aggs = list(probes) + [F.count(F.lit(1)).alias("_kgs_rows")]
        row = df.agg(*aggs).collect()[0]
        # the probe materialized the cache, so the optimized plan now
        # carries the MEASURED InMemoryRelation byte size — size shuffle
        # partitions by real bytes, not just rows (wide-value states)
        self._tune(row["_kgs_rows"], measured_size_bytes(df))
        out = lazy_checkpoint(df)
        self._gens.append((df, out))
        # Everything older than the previous probed generation was
        # materialized by the collect above (the probe computes through any
        # chained rounds) and has no remaining reader — free it now.
        while len(self._gens) > 2:
            old_cache, old_ckpt = self._gens.pop(0)
            if old_cache is not None:
                old_cache.unpersist()  # lineage-safe cache release
            free_df(old_ckpt)          # blocks superseded ≥2 generations ago
        return out, row

    def release(self, keep: Optional[DataFrame] = None) -> None:
        """Free retained caches and checkpoint blocks. Call only after the
        loop's final result has been materialized elsewhere."""
        for cache, ckpt in self._gens:
            if cache is not None and cache is not keep:
                cache.unpersist()
            if ckpt is not keep:
                free_df(ckpt)
        self._gens = []
        self._restore_conf()
