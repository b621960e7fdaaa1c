"""Core property-graph abstraction: two DataFrames + Gelly-style algebra.

Reference parity: io/kgraph/KGraph.java (kafka-graphs). The reference keeps
vertices/edges as Kafka-Streams KTables keyed by id / (src,dst); we keep two
DataFrames with last-write-wins primary-key semantics enforced at
construction. Every operator below is pure DataFrame algebra so Catalyst
gets predicate pushdown / column pruning / join planning for free — the
reference has no optimizer at all (SURVEY.md §4.1).

Scale notes (100 TB mindset):
- all joins are equi-joins on id / (src,dst); small sides (e.g. vertex
  tables vs huge edge tables in filterOnVertices) stay eligible for
  broadcast via AQE; we never collect to the driver.
- degree/reduce aggregations are partial-aggregatable (map-side combine).
- ``partition_by_id`` co-partitions vertices & edges for iterative use so
  per-superstep joins reuse one Exchange.
"""

from __future__ import annotations

from enum import Enum
from typing import Callable, Iterable, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ColumnLike = Union[Column, str]


class EdgeDirection(Enum):
    """Edge direction selector (reference: io/kgraph/EdgeDirection.java:21-25)."""

    IN = "in"
    OUT = "out"
    BOTH = "both"


# Canonical column names. The reference is generic over K/VV/EV via serdes
# (io/kgraph/GraphSerialized.java); here every instantiation is an explicit
# Spark schema with these fixed column names.
ID = "id"
VALUE = "value"
SRC = "src"
DST = "dst"


def _as_column(f: Union[Column, Callable[[Column], Column]], *args: Column) -> Column:
    return f(*args) if callable(f) else f


class Graph:
    """A property graph = vertex DataFrame + edge DataFrame.

    vertices: ``(id, value, ...)`` — primary key ``id``
    edges:    ``(src, dst, value, ...)`` — primary key ``(src, dst)``

    Reference: io/kgraph/KGraph.java:52-65 (KGraph = vertices KTable +
    edges KTable + serdes). Value columns may be any Spark type including
    structs/arrays/maps (the reference's Kryo-opaque composites become
    typed nested columns, SURVEY.md §1.2).
    """

    def __init__(self, vertices: DataFrame, edges: DataFrame, *, check: bool = False):
        if ID not in vertices.columns:
            raise ValueError(f"vertices must have an '{ID}' column, got {vertices.columns}")
        if SRC not in edges.columns or DST not in edges.columns:
            raise ValueError(f"edges must have '{SRC}' and '{DST}' columns, got {edges.columns}")
        self.vertices = vertices
        self.edges = edges
        if check:
            # Optional eager PK check — expensive at scale, for tests only.
            vdup = vertices.groupBy(ID).count().filter("count > 1").count()
            edup = edges.groupBy(SRC, DST).count().filter("count > 1").count()
            if vdup or edup:
                raise ValueError(f"duplicate keys: {vdup} vertex ids, {edup} (src,dst) pairs")

    # ------------------------------------------------------------------
    # construction (reference: KGraph.fromEdges, KGraph.fromCollection)
    # ------------------------------------------------------------------

    @staticmethod
    def from_edges(
        edges: DataFrame,
        vertex_value_initializer: Union[Column, Callable[[Column], Column], None] = None,
    ) -> "Graph":
        """Derive the vertex table from edge endpoints.

        Reference: io/kgraph/KGraph.java:143-174 (fromEdges + EmitSrcAndTarget:
        flatMap each edge into 2 candidate vertices, initializer maps id →
        initial value). Spark: union of endpoint projections + distinct —
        a single shuffle, map-side combinable.
        """
        ids = (
            edges.select(F.col(SRC).alias(ID))
            .unionByName(edges.select(F.col(DST).alias(ID)))
            .distinct()
        )
        init = vertex_value_initializer
        if init is None:
            init = F.col(ID)
        vertices = ids.select(F.col(ID), _as_column(init, F.col(ID)).alias(VALUE))
        return Graph(vertices, edges)

    @staticmethod
    def from_collection(
        spark: SparkSession,
        vertices: Iterable[tuple],
        edges: Iterable[tuple],
        vertex_schema: Union[str, T.StructType] = f"{ID} long, {VALUE} long",
        edge_schema: Union[str, T.StructType] = f"{SRC} long, {DST} long, {VALUE} long",
    ) -> "Graph":
        """Test/bootstrap source (reference: io/kgraph/utils/StreamUtils.java:51-112)."""
        v = spark.createDataFrame(list(vertices), schema=vertex_schema)
        e = spark.createDataFrame(list(edges), schema=edge_schema)
        return Graph(v, e)

    # ------------------------------------------------------------------
    # projections / map / filter (reference: KGraph.java §2.2 of SURVEY)
    # ------------------------------------------------------------------

    def map_vertices(self, mapper: Union[Column, Callable[[Column, Column], Column]]) -> "Graph":
        """Transform vertex values, key-preserving.

        Reference: io/kgraph/KGraph.java:176-181. ``mapper`` is a Column or
        ``f(id_col, value_col) -> Column`` (stays JVM-side; no Python UDF).
        """
        col = _as_column(mapper, F.col(ID), F.col(VALUE))
        extra = [c for c in self.vertices.columns if c not in (ID, VALUE)]
        v = self.vertices.select(F.col(ID), col.alias(VALUE), *extra)
        return Graph(v, self.edges)

    def map_edges(self, mapper: Union[Column, Callable[[Column, Column, Column], Column]]) -> "Graph":
        """Transform edge values (reference: io/kgraph/KGraph.java:183-188)."""
        col = _as_column(mapper, F.col(SRC), F.col(DST), F.col(VALUE))
        extra = [c for c in self.edges.columns if c not in (SRC, DST, VALUE)]
        e = self.edges.select(F.col(SRC), F.col(DST), col.alias(VALUE), *extra)
        return Graph(self.vertices, e)

    def filter_on_vertices(self, predicate: ColumnLike) -> "Graph":
        """Keep vertices passing ``predicate`` and edges whose BOTH endpoints survive.

        Reference: io/kgraph/KGraph.java:342-354 — two stream-table inner
        joins against the filtered vertex table. Spark: two left-semi joins;
        the (small) filtered vertex projection broadcasts under AQE.
        """
        v = self.vertices.filter(predicate)
        vids = v.select(F.col(ID))
        e = (
            self.edges.join(vids.withColumnRenamed(ID, SRC), on=SRC, how="left_semi")
            .join(vids.withColumnRenamed(ID, DST), on=DST, how="left_semi")
            .select(self.edges.columns)
        )
        return Graph(v, e)

    def filter_on_edges(self, predicate: ColumnLike) -> "Graph":
        """Keep edges passing ``predicate``; vertices untouched.

        Reference: io/kgraph/KGraph.java:356-361.
        """
        return Graph(self.vertices, self.edges.filter(predicate))

    def subgraph(self, vertex_predicate: ColumnLike, edge_predicate: ColumnLike) -> "Graph":
        """filterOnVertices then filterOnEdges (reference: KGraph.java:325-340)."""
        return self.filter_on_vertices(vertex_predicate).filter_on_edges(edge_predicate)

    def undirected(self) -> "Graph":
        """Add the reverse of every edge, (src,dst)-deduped.

        Reference: io/kgraph/KGraph.java:388-410 — flatMap e → {e, e.reverse}
        then last-wins reduce per key. Where both an edge and its mirror
        exist we deterministically keep the ORIGINAL edge's value (the
        reference's "last write" is racy; original-wins is the stable
        choice and matches its test goldens, GraphOperationsITCase.java:112-148).
        """
        cols = self.edges.columns
        fwd = self.edges.withColumn("_orig", F.lit(1))
        rev = self.edges.select(
            F.col(DST).alias(SRC),
            F.col(SRC).alias(DST),
            *[F.col(c) for c in cols if c not in (SRC, DST)],
        ).withColumn("_orig", F.lit(0))
        value_cols = [c for c in cols if c not in (SRC, DST)]
        merged = (
            fwd.unionByName(rev)
            .groupBy(SRC, DST)
            .agg(*[F.max_by(c, "_orig").alias(c) for c in value_cols + ["_orig"]])
            .select(*cols)
        )
        return Graph(self.vertices, merged)

    # ------------------------------------------------------------------
    # re-keyed / grouped edge views (reference: KGraph.java:91-127)
    # ------------------------------------------------------------------

    def edges_by_source(self) -> DataFrame:
        """Edges re-keyed by source id: ``(id=src, src, dst, value, ...)``.

        Reference: io/kgraph/KGraph.java:91-97 (edgesBySource — one keyed
        record per edge; the KTable re-key becomes a plain projection).
        """
        return self.edges.select(
            F.col(SRC).alias(ID), *[F.col(c) for c in self.edges.columns]
        )

    def edges_by_target(self) -> DataFrame:
        """Edges re-keyed by target id: ``(id=dst, src, dst, value, ...)``.

        Reference: io/kgraph/KGraph.java:99-103 (edgesByTarget).
        """
        return self.edges.select(
            F.col(DST).alias(ID), *[F.col(c) for c in self.edges.columns]
        )

    def edges_grouped_by_source(self) -> DataFrame:
        """``(id, edges: array<struct<dst,value,...>>)`` out-adjacency.

        Reference: io/kgraph/KGraph.java:105-115 (edgesGroupedBySource).
        """
        value_cols = [c for c in self.edges.columns if c != SRC]
        return self.edges.groupBy(F.col(SRC).alias(ID)).agg(
            F.collect_list(F.struct(*[F.col(c) for c in value_cols])).alias("edges")
        )

    def edges_grouped_by_target(self) -> DataFrame:
        """``(id, edges: array<struct<src,value,...>>)`` in-adjacency.

        Reference: io/kgraph/KGraph.java:117-127 (edgesGroupedByTarget).
        """
        value_cols = [c for c in self.edges.columns if c != DST]
        return self.edges.groupBy(F.col(DST).alias(ID)).agg(
            F.collect_list(F.struct(*[F.col(c) for c in value_cols])).alias("edges")
        )

    # ------------------------------------------------------------------
    # joins (reference: KGraph.java:190-294)
    # ------------------------------------------------------------------

    def join_with_vertices(
        self, table: DataFrame, join_fn: Callable[[Column, Column], Column]
    ) -> "Graph":
        """Left-join vertices with ``table(id, value)``; apply ``join_fn(old, new)``
        only when both sides are non-null, else keep the old value.

        Reference: io/kgraph/KGraph.java:190-219 (ApplyLeftJoinToVertexValues:
        null input ⇒ keep old value).
        """
        t = table.select(F.col(ID), F.col(VALUE).alias("_input"))
        v = (
            self.vertices.join(t, on=ID, how="left")
            .withColumn(
                VALUE,
                F.when(
                    F.col(VALUE).isNotNull() & F.col("_input").isNotNull(),
                    join_fn(F.col(VALUE), F.col("_input")),
                ).otherwise(F.col(VALUE)),
            )
            .drop("_input")
        )
        return Graph(v, self.edges)

    def join_with_edges(
        self, table: DataFrame, join_fn: Callable[[Column, Column], Column]
    ) -> "Graph":
        """Left-join edges with ``table(src, dst, value)`` on the edge key.

        Reference: io/kgraph/KGraph.java:221-250.
        """
        t = table.select(F.col(SRC), F.col(DST), F.col(VALUE).alias("_input"))
        e = self._left_join_edges(t, [SRC, DST], join_fn)
        return Graph(self.vertices, e)

    def join_with_edges_on_source(
        self, table: DataFrame, join_fn: Callable[[Column, Column], Column]
    ) -> "Graph":
        """Left-join each edge with per-vertex ``table(id, value)`` keyed by src.

        Reference: io/kgraph/KGraph.java:252-272.
        """
        t = table.select(F.col(ID).alias(SRC), F.col(VALUE).alias("_input"))
        e = self._left_join_edges(t, [SRC], join_fn)
        return Graph(self.vertices, e)

    def join_with_edges_on_target(
        self, table: DataFrame, join_fn: Callable[[Column, Column], Column]
    ) -> "Graph":
        """Left-join each edge with per-vertex ``table(id, value)`` keyed by dst.

        Reference: io/kgraph/KGraph.java:274-294.
        """
        t = table.select(F.col(ID).alias(DST), F.col(VALUE).alias("_input"))
        e = self._left_join_edges(t, [DST], join_fn)
        return Graph(self.vertices, e)

    def _left_join_edges(
        self, table: DataFrame, on: Sequence[str], join_fn: Callable[[Column, Column], Column]
    ) -> DataFrame:
        return (
            self.edges.join(table, on=list(on), how="left")
            .withColumn(
                VALUE,
                F.when(
                    F.col(VALUE).isNotNull() & F.col("_input").isNotNull(),
                    join_fn(F.col(VALUE), F.col("_input")),
                ).otherwise(F.col(VALUE)),
            )
            .drop("_input")
            .select(self.edges.columns)
        )

    # ------------------------------------------------------------------
    # degrees & neighborhood aggregations (reference: KGraph.java:363-608)
    # ------------------------------------------------------------------

    def out_degrees(self) -> DataFrame:
        """``(id, value: long)`` out-degree per vertex, 0 if none.

        Reference: io/kgraph/KGraph.java:363-366 (left join + count).
        Spark: partial-aggregatable count + left join; no adjacency
        materialization (that is a Kafka-Streams co-partitioning artifact).
        """
        return self._degrees(SRC)

    def in_degrees(self) -> DataFrame:
        """``(id, value: long)`` in-degree per vertex, 0 if none.

        Reference: io/kgraph/KGraph.java:368-386.
        """
        return self._degrees(DST)

    def degrees(self) -> DataFrame:
        """``(id, value: long)`` total degree (in + out)."""
        ends = self.edges.select(F.col(SRC).alias(ID)).unionByName(
            self.edges.select(F.col(DST).alias(ID))
        )
        counts = ends.groupBy(ID).agg(F.count(F.lit(1)).alias("_deg"))
        return (
            self.vertices.select(ID)
            .join(counts, on=ID, how="left")
            .select(F.col(ID), F.coalesce(F.col("_deg"), F.lit(0)).alias(VALUE))
        )

    def _degrees(self, key: str) -> DataFrame:
        counts = self.edges.groupBy(F.col(key).alias(ID)).agg(F.count(F.lit(1)).alias("_deg"))
        return (
            self.vertices.select(ID)
            .join(counts, on=ID, how="left")
            .select(F.col(ID), F.coalesce(F.col("_deg"), F.lit(0)).alias(VALUE))
        )

    def reduce_on_edges(self, reducer: str, direction: EdgeDirection) -> DataFrame:
        """Per-vertex reduce of adjacent edge VALUES → ``(id, value)``.

        Only vertices with ≥1 adjacent edge appear (the reference maps over
        the grouped-edges table, not a vertex left-join: KGraph.java:475-503).
        ``reducer`` is an aggregate name: 'min'|'max'|'sum'|'avg'|'count'.
        BOTH is unsupported, matching the reference (throws).
        """
        if direction == EdgeDirection.BOTH:
            raise NotImplementedError("BOTH is unsupported (reference KGraph.java:497 throws)")
        key = DST if direction == EdgeDirection.IN else SRC
        agg = getattr(F, reducer)(F.col(VALUE)).alias(VALUE)
        return self.edges.groupBy(F.col(key).alias(ID)).agg(agg)

    def reduce_on_neighbors(self, reducer: str, direction: EdgeDirection) -> DataFrame:
        """Per-vertex reduce of NEIGHBOR vertex values → ``(id, value)``.

        IN: reduce over in-neighbors (edge sources), grouped by dst.
        OUT: reduce over out-neighbors (edge targets), grouped by src.
        Only vertices with ≥1 neighbor appear. Reference:
        io/kgraph/KGraph.java:505-551. BOTH unsupported (reference throws).
        """
        if direction == EdgeDirection.BOTH:
            raise NotImplementedError("BOTH is unsupported (reference KGraph.java:545 throws)")
        if direction == EdgeDirection.IN:
            neighbor, group = SRC, DST
        else:
            neighbor, group = DST, SRC
        nv = self.vertices.select(F.col(ID).alias(neighbor), F.col(VALUE).alias("_nv"))
        joined = self.edges.select(SRC, DST).join(nv, on=neighbor, how="inner")
        agg = getattr(F, reducer)(F.col("_nv")).alias(VALUE)
        return joined.groupBy(F.col(group).alias(ID)).agg(agg)

    def group_reduce_on_edges(
        self,
        fn: Callable[[Column, Column], Column],
        direction: EdgeDirection,
    ) -> DataFrame:
        """Per-vertex arbitrary function over (vertex value, collected edges).

        ``fn(value_col, edges_array_col) -> Column`` evaluated JVM-side (use
        F.aggregate/F.transform/F.filter on the array). All vertices appear;
        the edges array is null for vertices with no adjacent edges
        (reference left-join semantics, KGraph.java:412-429).
        """
        if direction == EdgeDirection.BOTH:
            raise NotImplementedError("BOTH is unsupported (reference KGraph.java:424 throws)")
        grouped = (
            self.edges_grouped_by_target()
            if direction == EdgeDirection.IN
            else self.edges_grouped_by_source()
        )
        return (
            self.vertices.join(grouped, on=ID, how="left")
            .select(F.col(ID), fn(F.col(VALUE), F.col("edges")).alias(VALUE))
        )

    def group_reduce_on_neighbors(
        self,
        fn: Callable[[Column, Column], Column],
        direction: EdgeDirection,
    ) -> DataFrame:
        """Per-vertex arbitrary function over (vertex value, array<struct(edge, neighbor value)>).

        Reference: io/kgraph/KGraph.java:431-473 — join edges with neighbor
        vertex state, group by the other endpoint, left-join onto vertices.
        The array column holds struct(src, dst, value, nvalue).
        """
        if direction == EdgeDirection.BOTH:
            raise NotImplementedError("BOTH is unsupported (reference KGraph.java:466 throws)")
        if direction == EdgeDirection.IN:
            neighbor, group = SRC, DST
        else:
            neighbor, group = DST, SRC
        nv = self.vertices.select(F.col(ID).alias(neighbor), F.col(VALUE).alias("nvalue"))
        edge_cols = [c for c in self.edges.columns]
        joined = self.edges.join(nv, on=neighbor, how="inner")
        grouped = joined.groupBy(F.col(group).alias(ID)).agg(
            F.collect_list(F.struct(*[F.col(c) for c in edge_cols], F.col("nvalue"))).alias(
                "neighbors"
            )
        )
        return (
            self.vertices.join(grouped, on=ID, how="left")
            .select(F.col(ID), fn(F.col(VALUE), F.col("neighbors")).alias(VALUE))
        )

    # ------------------------------------------------------------------
    # counts & utilities
    # ------------------------------------------------------------------

    def num_vertices(self) -> int:
        """Reference: io/kgraph/library/basic/VertexCount.java (aggregator-only algo)."""
        return self.vertices.count()

    def num_edges(self) -> int:
        """Reference: io/kgraph/library/basic/EdgeCount.java (aggregator-only algo)."""
        return self.edges.count()

    def find(self, pattern: str) -> DataFrame:
        """Motif finding: match a GraphFrames-style edge pattern.

        ``g.find("(a)-[e]->(b); (b)-[]->(c); !(a)-[]->(c)")`` — one row per
        assignment, one struct column per named element. Beyond-reference
        query surface; see kafka_graphs_spark/library/motif.py for the
        grammar and the join plan it compiles to.
        """
        from kafka_graphs_spark.library.motif import find as _find

        return _find(self, pattern)

    def reverse(self) -> "Graph":
        """Reverse every edge (streaming reverse(): io/kgraph/streaming/EdgeStream.java:252-261)."""
        cols = self.edges.columns
        e = self.edges.select(
            F.col(DST).alias(SRC),
            F.col(SRC).alias(DST),
            *[F.col(c) for c in cols if c not in (SRC, DST)],
        )
        return Graph(self.vertices, e)

    def partition_by_id(self, num_partitions: Optional[int] = None) -> "Graph":
        """Co-partition vertices by id and edges by src for iterative workloads.

        Reference analogue: GraphUtils.groupEdgesBySourceAndRepartition
        (io/kgraph/utils/GraphUtils.java:153-249) — Kafka-Streams needs
        explicit co-partitioned topics; Spark needs one Exchange that
        subsequent per-superstep joins then reuse (Catalyst recognizes the
        hash partitioning and elides the shuffle).
        """
        if num_partitions:
            v = self.vertices.repartition(num_partitions, F.col(ID))
            e = self.edges.repartition(num_partitions, F.col(SRC))
        else:
            v = self.vertices.repartition(F.col(ID))
            e = self.edges.repartition(F.col(SRC))
        return Graph(v, e)

    def persist(self, level=None) -> "Graph":
        from pyspark import StorageLevel

        level = level or StorageLevel.MEMORY_AND_DISK
        self.vertices.persist(level)
        self.edges.persist(level)
        return self

    def unpersist(self) -> "Graph":
        self.vertices.unpersist()
        self.edges.unpersist()
        return self
