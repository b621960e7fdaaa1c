"""Canonical graphs & tables derived from the driver test data.

The driver provides TPC-H-ish parquet (TESTDATA.md). Graph workloads are
derived deterministically so every graph query has a DuckDB-expressible
oracle:

- event-chain graph: per-user chains of consecutive events ordered by
  (ts, event_id) — disjoint directed paths: WCC/BFS/SSSP/PageRank results
  have closed-form SQL oracles (window functions).
- supplier→part graph: bipartite edges from lineitem, value = sum qty —
  the relational-operator workbench.
- hierarchy graph: customer→nation→region with shortcut edges — contains
  triangles, exercising clustering-coefficient logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kafka_graphs_spark.graph import Graph

# Vertex-id offsets keep derived id spaces disjoint.
PART_OFFSET = 1_000_000
NATION_OFFSET = 2_000_000
REGION_OFFSET = 3_000_000


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # the driver's events.parquet carries TIMESTAMP(NANOS); Spark reads it
    # as long (ns since epoch) with this flag — ordering semantics unchanged
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def event_chain_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, dst, value) — consecutive events per user by (ts, event_id).

    Edge weight = |value of the destination event| (deterministic, ≥0).
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            "event_id",
            F.lag("event_id").over(w).alias("prev_id"),
            F.abs(F.col("value")).alias("w"),
        )
        .filter(F.col("prev_id").isNotNull())
        .select(F.col("prev_id").alias("src"), F.col("event_id").alias("dst"), F.col("w").alias("value"))
    )


def event_chain_graph(spark: SparkSession, sf_dir: str) -> Graph:
    edges = event_chain_edges(spark, sf_dir)
    ev = load(spark, sf_dir, "events").select(F.col("event_id").alias("id"))
    vertices = ev.select("id", F.col("id").alias("value"))
    return Graph(vertices, edges)


def chain_sources(spark: SparkSession, sf_dir: str, n_users: int = 1) -> list:
    """First event_id (by ts, event_id) of the ``n_users`` smallest user ids."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    firsts = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .orderBy("user_id")
        .limit(n_users)
        .select("event_id")
        .collect()
    )
    return [r["event_id"] for r in firsts]


def supplier_part_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src=suppkey, dst=partkey+OFFSET, value=sum quantity) from lineitem."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            F.col("l_suppkey").alias("src"),
            (F.col("l_partkey") + PART_OFFSET).alias("dst"),
        )
        .agg(F.sum("l_quantity").alias("value"))
    )


def supplier_part_graph(spark: SparkSession, sf_dir: str) -> Graph:
    edges = supplier_part_edges(spark, sf_dir)
    return Graph.from_edges(edges, F.col("id"))


def hierarchy_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer→nation, nation→region, customer→region (triangle per customer)."""
    cust = load(spark, sf_dir, "customer")
    nat = load(spark, sf_dir, "nation")
    c_n = cust.select(
        F.col("c_custkey").cast("long").alias("src"),
        (F.col("c_nationkey") + NATION_OFFSET).cast("long").alias("dst"),
        F.lit(1.0).alias("value"),
    )
    n_r = nat.select(
        (F.col("n_nationkey") + NATION_OFFSET).cast("long").alias("src"),
        (F.col("n_regionkey") + REGION_OFFSET).cast("long").alias("dst"),
        F.lit(1.0).alias("value"),
    )
    c_r = (
        cust.join(nat, cust["c_nationkey"] == nat["n_nationkey"])
        .select(
            F.col("c_custkey").cast("long").alias("src"),
            (F.col("n_regionkey") + REGION_OFFSET).cast("long").alias("dst"),
            F.lit(1.0).alias("value"),
        )
    )
    return c_n.unionByName(n_r).unionByName(c_r)


def hierarchy_graph(spark: SparkSession, sf_dir: str) -> Graph:
    return Graph.from_edges(hierarchy_edges(spark, sf_dir), F.col("id"))
