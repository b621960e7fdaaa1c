"""Text / parquet graph IO.

Reference: io/kgraph/utils/GraphUtils.java:66-151 (verticesToTopic,
edgesToTopic, verticesToFile) and io/kgraph/utils/Parsers.java:26-94
(whitespace-separated ``id value`` / ``src dst value`` lines, trailing value
optional → null). Spark: schema'd CSV reads — pushdown-friendly, splittable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_vertices_text(
    spark: SparkSession, path: str, value_type: str = "long"
) -> DataFrame:
    """Parse ``id value`` lines → ``(id, value)``; missing value → null.

    Reference: GraphUtils.verticesToTopic + Parsers.VertexParser
    (GraphUtils.java:66-105, Parsers.java:60-74).
    """
    return (
        spark.read.csv(path, sep=" ", schema=f"id long, value {value_type}")
        .select("id", "value")
    )


def read_edges_text(spark: SparkSession, path: str, value_type: str = "long") -> DataFrame:
    """Parse ``src dst value`` lines → ``(src, dst, value)``; missing value → null.

    Reference: GraphUtils.edgesToTopic + Parsers.EdgeParser
    (GraphUtils.java:107-145, Parsers.java:76-94).
    """
    return (
        spark.read.csv(path, sep=" ", schema=f"src long, dst long, value {value_type}")
        .select("src", "dst", "value")
    )


def read_edges_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Columnar edge source — the scale path (partition pruning + pushdown)."""
    return spark.read.parquet(path)


def write_vertices_text(df: DataFrame, path: str) -> None:
    """Dump result vertices as ``id value`` text (GraphUtils.verticesToFile:147-151)."""
    cols = [F.col(c).cast("string") for c in df.columns]
    df.select(F.concat_ws(" ", *cols).alias("value")).write.mode("overwrite").text(path)
