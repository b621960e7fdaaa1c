"""Distributed quality-classifier training: full-batch logistic regression
over the in-engine document features.

The missing half of :func:`kafka_graphs_spark.pipeline.text.quality_score_linear`
(which scores with FIXED weights): fastText/CCNet-style curation pipelines
train a small linear model on "does this look like the target domain?"
labels and gate documents on its probability. Training here is plain
full-batch gradient descent where each iteration is ONE map-side-combined
aggregation over the featurized corpus — the textbook distributed-LR shape
that holds at any corpus size (gradient state is 4 doubles; nothing about
the model grows with the data).

Determinism contract: each gradient component is an ``avg`` over the
corpus (order-dependent float sum) ROUNDED to 6 dp before the weight
update, so the learned weights are bit-identical across engines,
partitionings, and runs — the driver oracle replays the whole training
loop in chained SQL CTEs. The rounding perturbs each step by <1e-6, which
is noise relative to the learning rate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["featurize", "train_quality_classifier"]

#: feature order is part of the contract (the oracle replays it)
FEATURES = ["intercept", "stop_ratio", "mean_token_len", "log_n_tokens"]


def featurize(docs: DataFrame, target: Column, text_col: str = "text") -> DataFrame:
    """(doc_id, y, intercept, stop_ratio, mean_token_len, log_n_tokens) —
    the exact feature set :func:`text.quality_score_linear` scores with,
    plus the 0/1 label from the ``target`` predicate. All features are
    exact-integer ratios / ln of exact ints — bit-identical across
    engines."""
    from kafka_graphs_spark.pipeline.text import STOPWORDS, tokens

    toks = tokens(F.col(text_col))
    n = F.size(toks)
    en = STOPWORDS["en"]
    n_stop = F.size(F.filter(toks, lambda t: t.isin(en)))
    stop_ratio = F.when(n > 0, n_stop.cast("double") / n).otherwise(F.lit(0.0))
    mean_len = F.when(
        n > 0,
        F.aggregate(toks, F.lit(0).cast("double"), lambda a, t: a + F.length(t)) / n,
    ).otherwise(F.lit(0.0))
    return docs.select(
        "doc_id",
        target.cast("int").cast("double").alias("y"),
        F.lit(1.0).alias("intercept"),
        stop_ratio.alias("stop_ratio"),
        mean_len.alias("mean_token_len"),
        F.log1p(n.cast("double")).alias("log_n_tokens"),
    )


def train_quality_classifier(
    docs: DataFrame,
    target: Column,
    n_iterations: int = 8,
    lr: float = 0.05,
    text_col: str = "text",
    sample_fraction: float = None,
) -> DataFrame:
    """(feature, weight, final_loss) — logistic-regression weights trained
    by ``n_iterations`` of full-batch gradient descent from w = 0:

        w ← w − lr · round₆( mean( (σ(w·x) − y) · x ) )

    Returns one row per feature (in :data:`FEATURES` order) carrying the
    trained weight; every row repeats the final mean log-loss (rounded
    6 dp) so callers can assert convergence without a second pass.

    Scale shape: the featurized frame is persisted once (narrow: 6
    doubles per doc) and each iteration is one aggregation job producing
    5 scalars — gradient traffic is O(features), never O(corpus). The
    loop is driver-sequenced like every iterative trainer here, bounded
    by ``n_iterations``, not data size.

    Features are unnormalized (mean_token_len ≈ 5, log_n_tokens ≈ 4 on
    prose), so keep ``lr`` small — the 0.05 default descends on every
    corpus tried; 0.5 visibly diverges. Standardize upstream if you need
    aggressive rates.

    ``sample_fraction`` (None = full batch, the oracle-replayed default):
    when set in (0, 1), each gradient step averages over a DETERMINISTIC
    md5-hash minibatch of the featurized corpus — a fresh per-step salt
    rotates the sample, so no document is systematically excluded. This
    is the 100 TB refinement: the default full-batch loop reads the
    (persisted) corpus ``n_iterations + 1`` times for 4 weights; with
    e.g. ``sample_fraction=0.1`` each step scans the same cached frame
    but averages a tenth of it — same O(features) gradient state, same
    determinism contract (the hash sample and the 6-dp rounding are both
    engine- and partitioning-independent), noisier but unbiased steps.
    The final reported loss is always full-corpus.
    """
    if sample_fraction is not None and not (0.0 < sample_fraction < 1.0):
        raise ValueError("sample_fraction must be in (0, 1) or None")
    feats = featurize(docs, target, text_col).persist()
    try:
        w = {f: 0.0 for f in FEATURES}

        def _p():
            z = sum(F.col(f) * F.lit(w[f]) for f in FEATURES)
            return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))

        for step in range(int(n_iterations)):
            p = _p()
            batch = feats
            if sample_fraction is not None:
                from kafka_graphs_spark.pipeline.sample import hash_fraction

                batch = feats.filter(
                    hash_fraction(F.col("doc_id"), f"gd{step}")
                    < F.lit(float(sample_fraction))
                )
            row = batch.agg(
                *[
                    F.round(F.avg((p - F.col("y")) * F.col(f)), 6).alias(f"g_{f}")
                    for f in FEATURES
                ]
            ).collect()[0]
            if row[f"g_{FEATURES[0]}"] is None:
                continue  # empty minibatch (tiny corpus × small fraction)
            for f in FEATURES:
                w[f] = w[f] - lr * row[f"g_{f}"]
        # clamp p away from exactly 0/1: a saturated probability makes
        # F.log return NULL and F.avg silently drop the row, understating
        # the reported loss on confidently-classified documents
        p = F.greatest(
            F.lit(1e-12), F.least(_p(), F.lit(1.0) - F.lit(1e-12))
        )
        loss = feats.agg(
            F.round(
                F.avg(
                    -F.col("y") * F.log(p)
                    - (F.lit(1.0) - F.col("y")) * F.log(F.lit(1.0) - p)
                ),
                6,
            ).alias("loss")
        ).collect()[0]["loss"]
    finally:
        feats.unpersist()
    spark = docs.sparkSession
    return spark.createDataFrame(
        [(f, float(w[f]), float(loss)) for f in FEATURES],
        "feature string, weight double, final_loss double",
    )


def calibration_report(
    docs: DataFrame,
    target: Column,
    n_iterations: int = 8,
    lr: float = 0.05,
    bins: int = 10,
    text_col: str = "text",
) -> DataFrame:
    """(bin, n, mean_prob, label_rate, gap) — reliability table for the
    trained quality classifier: train (same deterministic GD loop as
    :func:`train_quality_classifier`), score every document, bin the
    6-dp-rounded probability into ``bins`` equal-width bins (the last
    bin is closed, so p=1.0 lands in bin ``bins-1``), and compare the
    mean predicted probability against the observed label rate per bin.

    The model-quality artifact every classifier-gated curation pipeline
    publishes next to its datasheet: a well-calibrated gate has
    ``gap ≈ 0`` everywhere; systematic over/under-confidence shows as
    signed structure across bins (here reported as the absolute gap of
    the two 6-dp-rounded quantities, so the column is engine-portable).

    Scale: training is the O(features)-state loop documented on the
    trainer; scoring + binning is one scan + ONE map-side-combinable
    groupBy on the ≤``bins`` key space. Label sums are exact integers;
    the only float aggregate (mean_prob) averages 6-dp-rounded values
    and is itself rounded to 6 dp (repo float-sum convention).
    """
    from kafka_graphs_spark.pipeline.text import quality_score_linear

    trained = {
        r["feature"]: r["weight"]
        for r in train_quality_classifier(
            docs, target, n_iterations=n_iterations, lr=lr, text_col=text_col
        ).collect()
    }
    scored = quality_score_linear(docs, weights=trained, text_col=text_col)
    labeled = docs.select(
        "doc_id", target.cast("int").alias("_y")
    ).join(scored.select("doc_id", F.round("prob", 6).alias("_p6")), on="doc_id")
    b = F.least(
        F.floor(F.col("_p6") * bins), F.lit(bins - 1)
    ).cast("long")
    agg = labeled.select(b.alias("bin"), "_p6", "_y").groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.avg("_p6"), 6).alias("mean_prob"),
        F.round(
            F.sum("_y").cast("double") / F.count(F.lit(1)), 6
        ).alias("label_rate"),
    )
    return agg.select(
        "bin", "n", "mean_prob", "label_rate",
        F.round(F.abs(F.col("mean_prob") - F.col("label_rate")), 6).alias("gap"),
    )
