"""Training-shard packing — assign documents to fixed-token-budget
output shards, the layout every large-scale training run reads.

Beyond-reference pipeline tier. A 100 TB corpus ships as millions of
size-bounded shard files (so the data loader can shuffle/stripe them);
the assignment must be DETERMINISTIC (re-runs produce the same shards)
and computable without funnelling a whole source through one task.

``assign_shards`` packs greedily in (group, doc_id) order: a document's
shard index is ``floor(tokens_before_it / tokens_per_shard)`` — shards
overflow rather than split documents, matching how text shards are
actually written (a doc never spans files; a shard closes once its
budget is met or exceeded).

Scale note: the naive formulation is one window cumsum partitioned by
source — which puts an entire source in ONE task (TBs for a big crawl
source). This implementation is the standard two-level exact cumsum:
documents are bucketed by ``doc_id div bucket_size``; per-bucket token
totals (tiny — one row per bucket) get a running offset via a window
over the bucket table, and the per-document cumsum runs WITHIN each
bucket only, shifted by its bucket offset. Identical result, bounded
partition sizes, two map-side-combinable shuffles.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def assign_shards(
    docs: DataFrame,
    tokens_per_shard: int,
    group_col: str = "source",
    text_col: str = "text",
    bucket_size: int = 100_000,
) -> DataFrame:
    """(doc_id, <group_col>, n_tokens, shard) — deterministic
    fixed-budget shard assignment per group (see module docstring).

    ``shard`` is 0-based within its group. Exact integer arithmetic
    end-to-end; ties are impossible (doc_id is the total order).
    """
    from kafka_graphs_spark.pipeline.text import tokens

    per = docs.select(
        "doc_id",
        F.col(group_col).alias("_g"),
        F.size(tokens(F.col(text_col))).cast("long").alias("n_tokens"),
        # `div` = integer division on longs — double arithmetic would
        # silently misassign once values pass 2^53
        F.expr(f"cast(doc_id as long) div {int(bucket_size)}").alias("_b"),
    )
    # level 1: one row per (group, bucket) — running offset over the
    # tiny bucket table (the unpartitioned-per-group window touches
    # #buckets rows, never #docs)
    bucket_w = (
        Window.partitionBy("_g")
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        per.groupBy("_g", "_b")
        .agg(F.sum("n_tokens").alias("_bt"))
        .select(
            "_g",
            "_b",
            F.coalesce(F.sum("_bt").over(bucket_w), F.lit(0)).alias("_off"),
        )
    )
    # level 2: per-document cumsum WITHIN the bucket, shifted by the
    # bucket offset — partitions are bounded by bucket_size docs
    doc_w = (
        Window.partitionBy("_g", "_b")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        per.join(offsets, on=["_g", "_b"])
        .select(
            "doc_id",
            F.col("_g").alias(group_col),
            "n_tokens",
            (
                F.col("_off")
                + F.coalesce(F.sum("n_tokens").over(doc_w), F.lit(0))
            )
            .cast("long")
            .alias("_cum"),
        )
        # integer `div`, not double `/` + cast: exact past 2^53 tokens
        .withColumn(
            "shard", F.expr(f"_cum div {int(tokens_per_shard)}")
        )
        .drop("_cum")
    )


def shard_manifest(assigned: DataFrame, group_col: str = "source") -> DataFrame:
    """(<group_col>, shard, n_docs, n_tokens, first_doc_id, last_doc_id)
    — the shard-level manifest a writer job would emit next to the
    files. One map-side-combinable groupBy on the (group, shard) key."""
    return assigned.groupBy(group_col, "shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.min("doc_id").alias("first_doc_id"),
        F.max("doc_id").alias("last_doc_id"),
    )


def mixture_plan(
    docs: DataFrame,
    weights: dict,
    budget_tokens: int,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """(source, available_tokens, weight, target_tokens, epochs,
    oversampled) — the mixture table every training run publishes:
    given target mixture ``weights`` (source -> fraction of the token
    budget) and the measured per-source availability, how many tokens
    each source contributes and how many epochs (passes) that implies.

    ``epochs > 1`` means the source must be upsampled (flagged
    ``oversampled`` — the datasheet-level warning for low-resource
    sources). Sources absent from ``weights`` get weight 0. One
    map-side-combinable aggregate over the corpus; the plan itself is
    one row per source.
    """
    from kafka_graphs_spark.pipeline.text import tokens

    avail = (
        docs.select(
            F.col(group_col).alias("source"),
            F.size(tokens(F.col(text_col))).cast("long").alias("_t"),
        )
        .groupBy("source")
        .agg(F.sum("_t").alias("available_tokens"))
    )
    w = F.lit(0.0)
    for src, frac in sorted(weights.items()):
        w = F.when(F.col("source") == src, F.lit(float(frac))).otherwise(w)
    target = F.floor(w * F.lit(int(budget_tokens))).cast("long")
    epochs = F.round(
        target.cast("double") / F.col("available_tokens"), 6
    )
    return avail.select(
        "source",
        "available_tokens",
        F.round(w, 6).alias("weight"),
        target.alias("target_tokens"),
        epochs.alias("epochs"),
        (epochs > 1.0).alias("oversampled"),
    )


def write_shards(
    assigned: DataFrame,
    path: str,
    group_col: str = "source",
    mode: str = "overwrite",
) -> DataFrame:
    """Materialize a shard assignment as the on-disk layout a data
    loader reads: ``<path>/data`` partitioned by (group, shard) — one
    directory per shard, prunable by partition filters — plus the
    :func:`shard_manifest` at ``<path>/_manifest``. Returns the
    manifest RECOMPUTED from the re-read DATA files (partition columns
    included), so the caller's checks cover what the data files
    actually carry — not just the manifest artifact, and not the
    in-memory plan (r11 ADVICE fix: the previous manifest-only
    roundtrip verified the artifact, not the data).

    Rows are repartitioned BY the partition keys before the write, so
    each shard's documents land co-located and each partition
    directory holds one file per writing task that owns it (without
    this, ``partitionBy`` fans every input task across every shard
    directory — tasks × shards tiny files, the classic small-files
    failure at scale). At 100 TB pair this with
    ``spark.sql.files.maxRecordsPerFile`` to bound single-file size.
    """
    (
        assigned.repartition(F.col(group_col), F.col("shard"))
        .write.mode(mode)
        .partitionBy(group_col, "shard")
        .parquet(f"{path}/data")
    )
    shard_manifest(assigned, group_col=group_col).write.mode(mode).parquet(
        f"{path}/_manifest"
    )
    # verification path: re-read the partitioned DATA and rebuild the
    # manifest from it, declaring the INPUT's schema explicitly so
    # partition-column values are parsed straight from the directory
    # names into the input dtypes. The previous infer-then-cast-back
    # round trip silently canonicalized numeric-looking group strings
    # ('0123' -> inferred int 123 -> cast '123'), so the observed
    # manifest diverged from the written artifact (r12 ADVICE).
    from pyspark.sql.types import StructType

    part_cols = (group_col, "shard")
    schema = StructType(
        [f for f in assigned.schema.fields if f.name not in part_cols]
        + [assigned.schema[c] for c in part_cols]
    )
    data = assigned.sparkSession.read.schema(schema).parquet(f"{path}/data")
    return shard_manifest(data, group_col=group_col)


def shard_datasheet(
    docs: DataFrame,
    tokens_per_shard: int,
    group_col: str = "source",
    text_col: str = "text",
    lang_col: str = "lang",
    langs: Sequence[str] = ("en", "de", "es", "fr"),
) -> DataFrame:
    """(<group_col>, shard, n_docs, n_tokens, n_<lang>..., n_other_lang,
    mean_quality, min_quality) — the per-shard DATA CARD a loader wants
    next to the manifest: what mixture of languages and what quality
    band each physical shard actually carries, so a training run can
    stripe/weight shards without re-scanning their contents.

    Joins the deterministic shard assignment (:func:`assign_shards`)
    with the per-document language label and heuristic quality score,
    then ONE map-side-combinable groupBy on the (group, shard) key —
    the same key the manifest aggregates on, so at 100 TB this is one
    extra keyed shuffle over rows already in flight in the writer job.
    Language columns are a FLAT fixed set (``langs`` + ``n_other_lang``)
    rather than a map, so the card is engine-portable and directly
    queryable; extend ``langs`` to the corpus's label set.

    Exactness note: the quality bands sum to a deci-score in
    {0,3,4,6,7,10}; the card aggregates the INTEGER deci-scores and
    divides once at the end, so the mean is a single exact-int/double
    division — no float-summation-order dependence, bit-identical in
    any engine.
    """
    from kafka_graphs_spark.pipeline.text import quality_score

    assigned = assign_shards(
        docs, tokens_per_shard, group_col=group_col, text_col=text_col
    )
    # score ∈ sums of {0.4, 0.3, 0.3} — ×10 rounds to the exact band sum
    deci = F.round(F.col("score") * 10).cast("long")
    base = assigned.join(docs.select("doc_id", lang_col), on="doc_id").join(
        quality_score(docs, text_col=text_col).select(
            "doc_id", deci.alias("_q10")
        ),
        on="doc_id",
    )
    lang_counts = [
        F.sum(F.when(F.col(lang_col) == lang, 1).otherwise(0))
        .cast("long")
        .alias(f"n_{lang}")
        for lang in langs
    ]
    other = (
        F.sum(
            F.when(~F.col(lang_col).isin(list(langs)), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_other_lang")
    )
    return base.groupBy(group_col, "shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        *lang_counts,
        other,
        F.round(
            F.sum("_q10") / (F.count(F.lit(1)) * F.lit(10.0)), 6
        ).alias("mean_quality"),
        F.round(F.min("_q10") / F.lit(10.0), 6).alias("min_quality"),
    )
