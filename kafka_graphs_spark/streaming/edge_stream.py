"""EdgeStream — the graph-streaming transformation surface.

Reference: io/kgraph/streaming/EdgeStream.java:54-494 (edge-only stream;
vertices derived from endpoints) and KGraphWindowedStream.java:41-105.

Spark re-expression: one class over EITHER a batch DataFrame or a
Structured Streaming DataFrame of edge events ``(src, dst, value[,
event_time])`` — every transformation below is identical DataFrame
algebra in both modes, which is precisely the Structured Streaming
promise. Running aggregates (degrees, counts) are plain streaming
aggregations the caller runs in update/complete output mode; the
reference's per-partition HashMap state (EdgeStream.java:325-338) is
replaced by the fault-tolerant state store for free.

Windows: the reference supports tumbling processing-time windows only
(SummaryBulkAggregation.java:73-80); ``slice`` takes any Spark window
duration and gets sliding/session windows for free if wanted.
"""

from __future__ import annotations

from typing import Callable, Optional, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_graphs_spark.graph import DST, SRC, VALUE, EdgeDirection

ColumnLike = Union[Column, str]


class EdgeStream:
    """Edge-only graph stream (reference: EdgeStream.java:54-87)."""

    def __init__(self, edges: DataFrame, event_time: str = "event_time"):
        if SRC not in edges.columns or DST not in edges.columns:
            raise ValueError(f"edge stream needs '{SRC}' and '{DST}', got {edges.columns}")
        self.edges = edges
        self.event_time = event_time

    # ---- projections (EdgeStream.java:73-87) ----

    def vertices(self) -> DataFrame:
        """Distinct endpoint stream (EdgeStream.java:82-90 re-keys by vertex)."""
        return (
            self.edges.select(F.col(SRC).alias("id"))
            .unionByName(self.edges.select(F.col(DST).alias("id")))
            .distinct()
        )

    # ---- per-edge transformations ----

    def map_edges(self, mapper: Union[Column, Callable[[Column], Column]]) -> "EdgeStream":
        """Reference: EdgeStream.java:108-122."""
        col = mapper(F.col(VALUE)) if callable(mapper) else mapper
        out = self.edges.withColumn(VALUE, col)
        return EdgeStream(out, self.event_time)

    def filter_edges(self, predicate: ColumnLike) -> "EdgeStream":
        """Reference: EdgeStream.java:126-135."""
        return EdgeStream(self.edges.filter(predicate), self.event_time)

    def filter_vertices(self, predicate: Callable[[Column], Column]) -> "EdgeStream":
        """Keep edges where BOTH endpoints pass (EdgeStream.java:139-162
        applies the vertex predicate to source and target)."""
        return EdgeStream(
            self.edges.filter(predicate(F.col(SRC)) & predicate(F.col(DST))),
            self.event_time,
        )

    def with_watermark(self, delay: str) -> "EdgeStream":
        """Bound event-time lateness (Spark-native extension).

        The reference has no event-time or late-data handling anywhere
        (processing-time only — SURVEY §2.9); Structured Streaming's
        watermark gives the streaming tier bounded state and append-mode
        windowed aggregations: events older than max(event_time) − delay
        are dropped and their window state evicted.
        """
        return EdgeStream(
            self.edges.withWatermark(self.event_time, delay), self.event_time
        )

    def reverse(self) -> "EdgeStream":
        """Reference: EdgeStream.java:252-261."""
        others = [c for c in self.edges.columns if c not in (SRC, DST)]
        return EdgeStream(
            self.edges.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST), *others),
            self.event_time,
        )

    def undirected(self) -> "EdgeStream":
        """Emit both directions of every edge (EdgeStream.java:243-246)."""
        return EdgeStream(self.edges.unionByName(self.reverse().edges), self.event_time)

    def distinct(self) -> "EdgeStream":
        """Drop duplicate (src,dst) pairs (EdgeStream.java:215-237 keeps a
        stateful per-vertex neighbor set; Structured Streaming's
        dropDuplicates state store is the same mechanism, fault-tolerant)."""
        return EdgeStream(self.edges.dropDuplicates([SRC, DST]), self.event_time)

    def union(self, other: "EdgeStream") -> "EdgeStream":
        """Reference: EdgeStream.java:345-347."""
        return EdgeStream(self.edges.unionByName(other.edges), self.event_time)

    # ---- running aggregates (update/complete output mode) ----

    def number_of_edges(self) -> DataFrame:
        """Running edge count (EdgeStream.java:166-183)."""
        return self.edges.groupBy().agg(F.count(F.lit(1)).alias("count"))

    def number_of_vertices(self) -> DataFrame:
        """Continuously-improving distinct-vertex count (EdgeStream.java:189-207)."""
        return self.vertices().groupBy().agg(F.count(F.lit(1)).alias("count"))

    def degrees(self) -> DataFrame:
        """Running total degree per vertex (EdgeStream.java:269-295)."""
        ends = self.edges.select(F.col(SRC).alias("id")).unionByName(
            self.edges.select(F.col(DST).alias("id"))
        )
        return ends.groupBy("id").agg(F.count(F.lit(1)).alias("degree"))

    def in_degrees(self) -> DataFrame:
        """Reference: EdgeStream.java:307-318."""
        return self.edges.groupBy(F.col(DST).alias("id")).agg(
            F.count(F.lit(1)).alias("degree")
        )

    def out_degrees(self) -> DataFrame:
        """Reference: EdgeStream.java:299-303."""
        return self.edges.groupBy(F.col(SRC).alias("id")).agg(
            F.count(F.lit(1)).alias("degree")
        )

    # ---- aggregates over mapped vertex streams ----

    def aggregate(
        self,
        edge_to_rows: Callable[[DataFrame], DataFrame],
        agg: Column,
    ) -> DataFrame:
        """Edge stream → (id, contribution) rows → per-vertex aggregate.

        Reference: EdgeStream.java:359-365 (flatMap + groupByKey +
        stateful aggregate). ``edge_to_rows`` maps the edge frame to an
        (id, ...) frame; ``agg`` is the per-id aggregate expression.
        """
        return edge_to_rows(self.edges).groupBy("id").agg(agg)

    def global_aggregate(
        self, edge_to_rows: Callable[[DataFrame], DataFrame], agg: Column
    ) -> DataFrame:
        """Same to a single global key (EdgeStream.java:377-407)."""
        return edge_to_rows(self.edges).groupBy().agg(agg)

    def build_neighborhood(self, directed: bool = False) -> DataFrame:
        """Per edge, attach the source vertex's neighbor set →
        ``(src, dst, neighborhood array)``.

        Reference: EdgeStream.java:417-438 — the adjacency snapshot fed to
        ExactTriangleCount (undirected when ``directed`` is False). The
        batch form materializes the full adjacency (the streaming form's
        per-record prefix snapshot is an artifact of single-pass
        processing, not of the result semantics).
        """
        base = self.edges if directed else self.undirected().edges
        adj = base.groupBy(SRC).agg(F.collect_set(DST).alias("neighborhood"))
        return self.edges.select(SRC, DST).join(adj, on=SRC, how="left")

    # ---- windowing (slice → KGraphWindowedStream) ----

    def slice(
        self,
        window_duration: str,
        direction: EdgeDirection = EdgeDirection.OUT,
        slide: Optional[str] = None,
        session_gap: Optional[str] = None,
    ) -> "WindowedEdgeStream":
        """Key edges by vertex into time windows.

        Reference: EdgeStream.java:453-494 — IN keys by target, OUT by
        source, BOTH emits both keyings (via undirected()). The reference
        supports tumbling windows only; ``slide`` (hopping windows — each
        event lands in duration/slide windows) and ``session_gap``
        (per-vertex session windows, closing after a gap of inactivity)
        are the Spark-native extensions — the same groupBy plan shape,
        so they cost nothing extra at scale.
        """
        if slide is not None and session_gap is not None:
            raise ValueError("slide and session_gap are mutually exclusive")
        if direction == EdgeDirection.IN:
            keyed = self.edges.select(F.col(DST).alias("id"), SRC, DST, VALUE, self.event_time)
        elif direction == EdgeDirection.OUT:
            keyed = self.edges.select(F.col(SRC).alias("id"), SRC, DST, VALUE, self.event_time)
        else:
            keyed = self.undirected().edges.select(
                F.col(SRC).alias("id"), SRC, DST, VALUE, self.event_time
            )
        return WindowedEdgeStream(keyed, window_duration, self.event_time, slide, session_gap)


class WindowedEdgeStream:
    """Per-vertex, per-window neighborhood view (KGraphWindowedStream.java:41-47)."""

    def __init__(
        self,
        keyed: DataFrame,
        window_duration: str,
        event_time: str,
        slide: Optional[str] = None,
        session_gap: Optional[str] = None,
    ):
        self.keyed = keyed
        self.window_duration = window_duration
        self.event_time = event_time
        self.slide = slide
        self.session_gap = session_gap

    def _window(self):
        ts = F.col(self.event_time)
        if self.session_gap is not None:
            return F.session_window(ts, self.session_gap).alias("window")
        if self.slide is not None:
            return F.window(ts, self.window_duration, self.slide).alias("window")
        return F.window(ts, self.window_duration).alias("window")

    def _grouped(self):
        return self.keyed.groupBy(self._window(), F.col("id"))

    def reduce_on_edges(self, reducer: str) -> DataFrame:
        """Windowed per-vertex reduce of edge values
        (KGraphWindowedStream.java:87-105). reducer: min|max|sum|avg|count."""
        return self._grouped().agg(getattr(F, reducer)(F.col(VALUE)).alias(VALUE))

    def fold_neighbors(self, initial: Column, fold: Callable[[Column, Column], Column]) -> DataFrame:
        """Windowed per-vertex fold over neighborhood edges
        (KGraphWindowedStream.java:56-74). ``fold(acc, edge_struct)`` is a
        JVM-side expression applied via F.aggregate over the collected
        neighborhood (order is the collection order, as in the reference's
        per-record fold)."""
        return self._grouped().agg(
            F.aggregate(
                F.collect_list(F.struct(SRC, DST, VALUE)), initial, fold
            ).alias(VALUE)
        )
