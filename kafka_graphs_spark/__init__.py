"""kafka_graphs_spark — a PySpark-native property-graph analytics engine.

Re-creates the query & data-processing capabilities of rayokota/kafka-graphs
(a Kafka-Streams graph library) on idiomatic Spark:

- ``Graph``: Gelly-style graph transformation algebra over two DataFrames
  (reference: kafka-graphs-core/src/main/java/io/kgraph/KGraph.java).
- ``pregel``: BSP vertex-centric iteration as a driver loop of Spark jobs
  (reference: io/kgraph/pregel/PregelComputation.java — the ZooKeeper
  barrier machinery disappears; Spark's synchronous job model IS the barrier).
- ``library``: the reference's 17-algorithm library (BFS, WCC, PageRank, ...)
  re-expressed as DataFrame-native superstep recurrences.
- ``streaming``: the single-pass graph-summary tier on Structured Streaming
  (reference: io/kgraph/streaming/).
- ``pipeline``: large-scale training-data operators (dedup, similarity
  search, text analysis, multimodal plumbing) beyond the reference surface.
"""

from kafka_graphs_spark.graph import EdgeDirection, Graph

__all__ = ["Graph", "EdgeDirection"]
__version__ = "0.1.0"
