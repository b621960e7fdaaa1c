"""Graph-streaming tier: EdgeStream transformations, windowed folds, and
single-pass summaries over Structured Streaming or batch DataFrames.

Reference: io/kgraph/streaming/ (SURVEY.md §2.9).
"""

from kafka_graphs_spark.streaming.aggregations import (
    collect_summaries,
    run_streaming,
    summary_bulk_aggregation,
)
from kafka_graphs_spark.streaming.edge_stream import EdgeStream, WindowedEdgeStream
from kafka_graphs_spark.streaming.library import (
    bipartiteness_check,
    bipartiteness_frame,
    connected_components,
    connected_components_frame,
    exact_triangle_count,
    lp_windowed,
    pagerank_windowed,
    triangles_windowed,
    wcc_windowed,
    spanner,
    spanner_frame,
)
from kafka_graphs_spark.streaming.joins import stream_interval_join
from kafka_graphs_spark.streaming.sketches import (
    heavy_hitters_check,
    finalize_hot_keys,
    misra_gries,
    quantile_estimates,
    quantile_sketch_check,
    quantile_summary,
    streaming_hot_keys,
)
from kafka_graphs_spark.streaming.incremental import (
    lp_windowed_incremental,
    pagerank_windowed_incremental,
    triangles_windowed_incremental,
    wcc_windowed_incremental,
)
from kafka_graphs_spark.streaming.stateful import (
    stateful_degrees,
    stateful_distinct_degrees,
)
from kafka_graphs_spark.streaming.summaries import (
    AdjacencyListGraph,
    Candidates,
    DisjointSet,
)

__all__ = [
    "EdgeStream",
    "WindowedEdgeStream",
    "summary_bulk_aggregation",
    "collect_summaries",
    "run_streaming",
    "connected_components",
    "connected_components_frame",
    "bipartiteness_check",
    "bipartiteness_frame",
    "exact_triangle_count",
    "lp_windowed",
    "pagerank_windowed",
    "triangles_windowed",
    "lp_windowed_incremental",
    "pagerank_windowed_incremental",
    "triangles_windowed_incremental",
    "wcc_windowed",
    "wcc_windowed_incremental",
    "spanner",
    "spanner_frame",
    "DisjointSet",
    "Candidates",
    "AdjacencyListGraph",
    "stream_interval_join",
    "misra_gries",
    "streaming_hot_keys",
    "finalize_hot_keys",
    "heavy_hitters_check",
    "quantile_summary",
    "quantile_estimates",
    "quantile_sketch_check",
    "stateful_degrees",
    "stateful_distinct_degrees",
]
