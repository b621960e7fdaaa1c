"""Pregel (BSP, vertex-centric) runtime on Spark DataFrames.

Reference: io/kgraph/pregel/{PregelComputation,PregelGraphAlgorithm,
ComputeFunction}.java. The reference coordinates supersteps with a
ZooKeeper two-phase barrier, Kafka work-set/solution-set topics, and
RocksDB stores (~1,500 LoC of machinery, SURVEY.md §3.1). On Spark the
driver's sequential loop IS the barrier: one Spark job per superstep over
immutable DataFrames — the whole coordination layer disappears.
"""

from kafka_graphs_spark.pregel.aggregators import AGGREGATOR_OPS, Aggregator
from kafka_graphs_spark.pregel.runtime import PregelResult, pregel

__all__ = ["pregel", "PregelResult", "Aggregator", "AGGREGATOR_OPS"]
