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


def read_documents_jsonl(
    spark: SparkSession,
    path: str,
    schema: str = "doc_id long, source string, text string",
) -> DataFrame:
    """Read a JSON-Lines document corpus (one JSON object per line) — the
    standard interchange format for LLM training corpora (and the shape
    of public sets like C4/Dolma/RedPajama dumps).

    An explicit schema is REQUIRED at scale: without one Spark runs a
    full inference pass over the data before the real read (twice the
    IO at 100 TB) and nullable drift between files can flip column
    types mid-corpus. JSONL is line-splittable, so the read
    parallelizes per HDFS/S3 block like text; prefer compressed
    ``.jsonl.gz`` per-file sizes near the block size (gzip is NOT
    splittable — one task per file).
    """
    return spark.read.schema(schema).json(path)


def write_documents_jsonl(df: DataFrame, path: str, compression: str = "none") -> None:
    """Write a document DataFrame as JSON-Lines, one object per line.

    ``compression='gzip'`` trades splittability for size (fine for
    hand-off artifacts; keep 'none'/'zstd-via-parquet' for re-read
    paths). Column order follows the DataFrame schema.
    """
    df.write.mode("overwrite").option("compression", compression).json(path)
