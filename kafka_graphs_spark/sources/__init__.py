"""Graph sources & sinks (reference: io/kgraph/utils/{GraphUtils,Parsers,GraphGenerators}.java)."""

from kafka_graphs_spark.sources.bucketed import drop_bucketed, load_bucketed, save_bucketed
from kafka_graphs_spark.sources.generators import complete_graph, grid_graph, random_graph, star_graph
from kafka_graphs_spark.sources.readers import (
    read_documents_jsonl,
    read_edges_parquet,
    read_edges_text,
    read_vertices_text,
    write_documents_jsonl,
    write_vertices_text,
)

__all__ = [
    "complete_graph",
    "grid_graph",
    "star_graph",
    "random_graph",
    "read_edges_text",
    "read_vertices_text",
    "read_edges_parquet",
    "write_vertices_text",
    "read_documents_jsonl",
    "write_documents_jsonl",
    "save_bucketed",
    "load_bucketed",
    "drop_bucketed",
]
