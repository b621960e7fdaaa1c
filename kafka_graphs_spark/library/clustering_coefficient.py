"""Local clustering coefficient.

Reference: io/kgraph/library/LocalClusteringCoefficient.java:34-135 — a
4-superstep message protocol:
  0: send own id to out-neighbors;
  1: N(v) = out-targets ∪ (in-sources ≠ v); value = |N(v)|; send the
     neighbor list to every neighbor (only if |N(v)| ≥ 2);
  2: each neighbor u replies with |out(u) ∩ N(v)|;
  3: lcc = Σmatches / (d·(d−1)), 0 when d < 2.

Batch-native equivalence (SURVEY.md §2.8 "triangle counting via edge-edge
join is far more idiomatic"): matches(v) counts directed edges (u→w) with
u,w ∈ N(v). That is a 3-way equi-join — neighborhood ⋈ edges ⋈
neighborhood — entirely JVM-side, partial-aggregated, no N(v) broadcast
(the reference ships whole adjacency lists as messages; at 100 TB the
join formulation shuffles ids only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_graphs_spark.graph import Graph


def local_clustering_coefficient(graph: Graph) -> DataFrame:
    """Returns (id, value double) — the reference's exact LCC definition."""
    e = graph.edges.select("src", "dst")

    # N(v): out-targets unconditionally, in-sources except self
    # (LocalClusteringCoefficient.java neighbors():69-83)
    nbrs = (
        e.select(F.col("src").alias("v"), F.col("dst").alias("u"))
        .unionByName(
            e.filter(F.col("src") != F.col("dst")).select(
                F.col("dst").alias("v"), F.col("src").alias("u")
            )
        )
        .distinct()
        .persist()
    )

    deg = nbrs.groupBy("v").agg(F.count(F.lit(1)).alias("d"))

    # matches(v) = |{(u,w) ∈ N(v)×N(v) : u→w ∈ E}|
    # (inquiry/reply supersteps 1-2 collapse into one 3-way join)
    vu = nbrs.select(F.col("v"), F.col("u"))
    vw = nbrs.select(F.col("v").alias("v2"), F.col("u").alias("w"))
    matches = (
        vu.join(e, vu["u"] == e["src"])
        .join(vw, (F.col("dst") == F.col("w")) & (F.col("v") == F.col("v2")), "left_semi")
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("matches"))
    )

    result = (
        graph.vertices.select("id")
        .join(deg.withColumnRenamed("v", "id"), on="id", how="left")
        .join(matches.withColumnRenamed("v", "id"), on="id", how="left")
        .select(
            "id",
            F.when(
                F.coalesce(F.col("d"), F.lit(0)) >= 2,
                F.coalesce(F.col("matches"), F.lit(0)).cast("double")
                / (F.col("d") * (F.col("d") - 1)),
            )
            .otherwise(F.lit(0.0))
            .alias("value"),
        )
    )
    out = result.localCheckpoint(eager=True)
    nbrs.unpersist()
    return out


def local_clustering_coefficient_pregel(graph: Graph) -> DataFrame:
    """The reference's 4-superstep inquiry/reply protocol, verbatim, on the
    generic ``pregel()`` runtime — the parity twin of the relational form
    above (LocalClusteringCoefficient.java:34-135):

      0: send own id to out-neighbors;
      1: N(v) = out-targets ∪ (in-sources ≠ v); value = |N(v)|; inquiry
         (v, N(v)) to every neighbor when |N(v)| ≥ 2;
      2: reply |edge_list ∩ out(u)| to each inquirer;
      3: lcc = Σ match_count / (d·(d−1)), 0 when d < 2; vote to halt.

    Exercises multi-phase behavior switching and the union-typed
    LCCMessage (source | edge_list | match_count) as a nullable struct
    message. This is the protocol-parity path — step 1 ships whole
    neighbor lists as messages (O(Σd²) volume), exactly like the
    reference; ``local_clustering_coefficient`` above is the 100 TB shape.
    """
    from kafka_graphs_spark.pregel import pregel

    def compute(step, vid, value, messages, out_edges, ctx):
        if step == 0:
            msg = {"source": vid, "edge_list": None, "match_count": None}
            for e in out_edges:
                ctx.send_message_to(e["dst"], msg)
        elif step == 1:
            nbrs = {e["dst"] for e in out_edges}
            nbrs.update(m["source"] for m in messages if m["source"] != vid)
            if len(nbrs) > 1:
                inquiry = {
                    "source": vid,
                    "edge_list": sorted(nbrs),
                    "match_count": None,
                }
                for u in nbrs:
                    ctx.send_message_to(u, inquiry)
            ctx.set_new_vertex_value(float(len(nbrs)))
        elif step == 2:
            out_set = {e["dst"] for e in out_edges}
            for m in messages:
                match = sum(1 for x in (m["edge_list"] or []) if x in out_set)
                ctx.send_message_to(
                    m["source"],
                    {"source": None, "edge_list": None, "match_count": match},
                )
        elif step == 3:
            d = value if value is not None else 0.0
            if d < 2:
                ctx.set_new_vertex_value(0.0)
            else:
                total = sum(m["match_count"] or 0 for m in messages)
                ctx.set_new_vertex_value(total / d / (d - 1))
            ctx.vote_to_halt()

    g = graph.map_vertices(lambda _id, _v: F.lit(0.0))
    res = pregel(
        g,
        compute,
        vertex_value_type="double",
        message_type="struct<source:bigint,edge_list:array<bigint>,match_count:int>",
        max_iterations=5,
    )
    # Step-0 messages to dangling edge targets create phantom work-set
    # vertices in the runtime's full-outer join; the relational form
    # inner-joins on graph.vertices, so restrict to the declared vertex
    # set for exact parity. (Phantom vertices still REPLY at step 2 —
    # their out-edges exist in the edge table — so other vertices'
    # coefficients are unaffected by this filter.)
    return res.vertices.join(graph.vertices.select("id"), on="id", how="left_semi")
