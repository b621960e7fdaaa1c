"""Graph importer CLI — the reference's GraphImporter re-expressed for Spark.

Reference: kafka-graphs-rest-app tools/importer/GraphImporter.java:40-150 —
``graph-import <bootstrapServers> -vf file -vt topic -ef file -et topic
[-vp parser] [-ep parser] [-np numPartitions]`` parses whitespace text
files and produces keyed records into Kafka topics.

Spark mapping: the "topic" becomes a parquet dataset under an output root
(the graph store a KGraph/Graph then reads), and Kafka's key-hash
partitioning becomes ``repartition(num_partitions, key)`` — the same
co-location contract (all records of one vertex id land in one partition).
Parsers map to column types (the reference's Long/Double/String parser
matrix) instead of class names.

Usage::

    python -m kafka_graphs_spark.importer OUTPUT_ROOT \
        [-vf vertices.txt] [-vt vertices] [-ef edges.txt] [-et edges] \
        [--vertex-value-type long] [--edge-value-type double] [-np 50]
"""

from __future__ import annotations

import argparse
from typing import Optional, Sequence

_VALUE_TYPES = ("long", "double", "string")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m kafka_graphs_spark.importer",
        description="Imports a graph from text files into partitioned parquet "
        "(GraphImporter.java parity).",
    )
    p.add_argument("output_root", help="Graph store root directory (stands in for "
                   "the reference's Kafka bootstrap servers).")
    p.add_argument("-vf", "--vertices-file", help="The vertices file (id value lines).")
    p.add_argument("-et", "--edges-topic", default="edges",
                   help="The edges dataset name (default: edges).")
    p.add_argument("-vt", "--vertices-topic", default="vertices",
                   help="The vertices dataset name (default: vertices).")
    p.add_argument("-ef", "--edges-file", help="The edges file (src dst value lines).")
    p.add_argument("--vertex-value-type", default="long", choices=_VALUE_TYPES,
                   help="Vertex value column type (the reference's vertex parser).")
    p.add_argument("--edge-value-type", default="long", choices=_VALUE_TYPES,
                   help="Edge value column type (the reference's edge parser).")
    p.add_argument("-np", "--num-partitions", type=int, default=50,
                   help="Partitions per dataset (the reference's topic partitions).")
    p.add_argument("-df", "--documents-file",
                   help="JSONL documents corpus (one JSON object per line) to "
                        "import as a parquet dataset — beyond-reference "
                        "pipeline ingestion.")
    p.add_argument("-dt", "--documents-topic", default="documents",
                   help="The documents dataset name (default: documents).")
    p.add_argument("--documents-schema",
                   default="doc_id long, source string, text string",
                   help="Explicit JSONL read schema (no inference pass).")
    p.add_argument("--master", default="local[*]", help="Spark master.")
    return p


def run(argv: Optional[Sequence[str]] = None, spark=None) -> int:
    from pyspark.sql import SparkSession

    args = build_parser().parse_args(argv)
    if (args.vertices_file is None and args.edges_file is None
            and args.documents_file is None):
        raise SystemExit("nothing to import: pass -vf, -ef and/or -df")

    own_session = spark is None
    if own_session:
        spark = (
            SparkSession.builder.master(args.master)
            .appName("kafka-graphs-spark-import")
            .getOrCreate()
        )
    from kafka_graphs_spark.sources.readers import read_edges_text, read_vertices_text

    try:
        if args.vertices_file is not None:
            v = read_vertices_text(spark, args.vertices_file, args.vertex_value_type)
            # key-hash partitioning, like the keyed topic produce
            # (GraphImporter.java:117-126 verticesToTopic)
            v.repartition(args.num_partitions, "id").write.mode("overwrite").parquet(
                f"{args.output_root}/{args.vertices_topic}"
            )
        if args.edges_file is not None:
            e = read_edges_text(spark, args.edges_file, args.edge_value_type)
            # edges keyed by source vertex (GraphImporter.java:128-143
            # edgesToTopic produces under the edge's source key)
            e.repartition(args.num_partitions, "src").write.mode("overwrite").parquet(
                f"{args.output_root}/{args.edges_topic}"
            )
        if args.documents_file is not None:
            from kafka_graphs_spark.sources.readers import read_documents_jsonl

            d = read_documents_jsonl(
                spark, args.documents_file, args.documents_schema
            )
            # documents keyed by doc_id — the same co-location contract
            d.repartition(args.num_partitions, "doc_id").write.mode(
                "overwrite"
            ).parquet(f"{args.output_root}/{args.documents_topic}")
    finally:
        if own_session:
            spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(run())
