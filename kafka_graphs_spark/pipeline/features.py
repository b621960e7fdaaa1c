"""Graph-aware feature engineering over embedding columns.

The bridge between the graph tier and the embedding pipeline: aggregate
per-vertex feature vectors over graph neighborhoods (the message-passing
primitive GNN pipelines run outside the trainer — e.g. GraphSAGE-style
mean aggregation as a preprocessing pass, feature smoothing before
clustering, or label/feature propagation features for downstream models).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def neighborhood_features(
    edges: DataFrame,
    features: DataFrame,
    agg: str = "mean",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    src_col: str = "src",
    dst_col: str = "dst",
    hops: int = 1,
) -> DataFrame:
    """(id, n_neighbors, feat) — element-wise ``mean``/``sum``/``max`` of
    the feature vectors of each vertex's out-neighbors (``src`` gathers
    from its ``dst``s; pass reversed edges for in-neighborhoods, or a
    symmetrized list for undirected).

    One-hop GraphSAGE-style aggregation as a relational plan: the feature
    table joins the edge list on the neighbor key, positions explode to
    (vertex, dim, value) rows, and a map-side-combinable groupBy per
    (vertex, dim) reduces before the vectors reassemble with a bounded
    ``collect_list`` (list length = feature dim, a constant — never a
    neighbor list). Shuffle volume is |E|·dim scalar rows — the honest
    cost of dense aggregation; at 100 TB pre-filter the edge list to the
    vertices you need and let AQE handle hub skew. Values are rounded to
    6 dp (repo precedent for order-dependent float accumulation).
    """
    if agg not in ("mean", "sum", "max"):
        raise ValueError("agg must be one of mean/sum/max")
    if hops < 1:
        raise ValueError("hops must be >= 1")

    def one_hop(feat_df, fid, fvec):
        f = feat_df.select(
            F.col(fid).alias("_nid"), F.col(fvec).cast("array<double>").alias("_fv")
        )
        ex = (
            edges.select(src_col, dst_col)
            .join(f, F.col(dst_col) == F.col("_nid"))
            .select(F.col(src_col).alias("id"), F.posexplode("_fv").alias("pos", "v"))
        )
        per_dim = ex.groupBy("id", "pos").agg(
            F.sum("v").alias("s"), F.max("v").alias("mx"), F.count(F.lit(1)).alias("n")
        )
        val = {
            "mean": F.col("s") / F.col("n").cast("double"),
            "sum": F.col("s"),
            "max": F.col("mx"),
        }[agg]
        return (
            per_dim.select("id", "pos", "n", F.round(val, 6).alias("val"))
            .groupBy("id")
            .agg(
                F.max("n").cast("long").alias("n_neighbors"),
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "val"))),
                    lambda s: s["val"],
                ).alias("feat"),
            )
        )

    # hop 1 reads the raw feature table; hop h > 1 stacks over hop h-1's
    # aggregated features (GraphSAGE layer composition without the
    # nonlinearity) — each hop is one more |E|·dim shuffle, checkpointed
    # so the plan depth stays constant
    out = one_hop(features, id_col, vec_col)
    for _ in range(hops - 1):
        out = one_hop(out.localCheckpoint(eager=True), "id", "feat")
    return out
