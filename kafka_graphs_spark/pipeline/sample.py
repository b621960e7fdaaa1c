"""Deterministic sampling & dataset mixing for training-data pipelines.

Beyond-reference operators (the reference has no curation tier): seeded,
reproducible document sampling and source-weighted mixture construction —
the step between "deduplicated corpus" and "training mix".

Design for 100 TB:

- Sampling is a pure per-row filter on an md5-derived uniform fraction —
  no shuffle, no sort, no driver state; it pushes down next to the scan
  and composes with column pruning. md5 is used because it is the one
  hash Spark and DuckDB compute identically, which makes every operator
  here bit-exactly oracle-checkable (and, more importantly, makes the
  sample itself portable: re-running on any engine keeps the same rows).
- Mixture rates derive from one tiny per-stratum count aggregate (rows =
  number of strata, collected to the driver — bounded) and are applied as
  the same per-row filter via a broadcast-joined rates table.
- Sequence packing is a per-group prefix-sum window: one shuffle on the
  group key, no global sort. Groups (source, language, shard …) bound
  window state; the explicit contract is that order is only defined
  WITHIN a group, which is exactly what a sharded 100 TB corpus gives.
"""

from __future__ import annotations

from typing import Mapping, Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 16^8 — the md5-prefix fraction denominator shared with the oracles.
_HEX8 = float(1 << 32)


def hash_fraction(key: Column, salt: str = "") -> Column:
    """Uniform [0, 1) fraction from md5 of the row key (+ optional salt).

    The first 8 hex chars of ``md5(key || salt)`` parsed as an integer,
    divided by 16^8. Deterministic, engine-portable (DuckDB twin:
    ``('0x' || substr(md5(key || salt), 1, 8))::BIGINT / 4294967296.0``),
    and independent draws per salt — use distinct salts for independent
    sampling stages so a row's fate in one stage doesn't correlate with
    the next.
    """
    s = F.concat(key.cast("string"), F.lit(salt))
    return (
        F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long") / F.lit(_HEX8)
    )


def hash_fraction_sql(key: str, salt: str = "") -> str:
    """DuckDB twin of :func:`hash_fraction` (oracle)."""
    k = f"({key})::VARCHAR || '{salt}'" if salt else f"({key})::VARCHAR"
    return f"(('0x' || substr(md5({k}), 1, 8))::BIGINT / 4294967296.0)"


def hash_sample(
    df: DataFrame, key_col: str, rate: float, salt: str = ""
) -> DataFrame:
    """Keep each row iff its :func:`hash_fraction` < ``rate``.

    A seeded Bernoulli sample that is reproducible across runs, engines,
    partitionings, and cluster sizes (unlike ``df.sample``, whose draw
    depends on partition layout). Pure narrow filter — scales linearly.
    """
    if rate >= 1.0:
        return df
    if rate <= 0.0:
        return df.limit(0)
    return df.filter(hash_fraction(F.col(key_col), salt) < F.lit(float(rate)))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: Mapping[str, float],
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum seeded Bernoulli sample.

    ``rates`` maps stratum value -> keep probability; strata absent from
    the map use ``default_rate``. The rates table is broadcast-joined
    (|rates| rows — tiny), then the same narrow md5 filter applies; no
    extra shuffle of the data side.
    """
    spark = df.sparkSession
    rate_rows = [(str(k), float(v)) for k, v in sorted(rates.items())]
    rdf = spark.createDataFrame(rate_rows, f"{strata_col} string, _kgs_rate double")
    joined = df.join(F.broadcast(rdf), on=strata_col, how="left")
    eff = F.coalesce(F.col("_kgs_rate"), F.lit(float(default_rate)))
    return (
        joined.filter(hash_fraction(F.col(key_col), salt) < eff)
        .drop("_kgs_rate")
        .select(*df.columns)
    )


def mixture_rates(
    df: DataFrame,
    strata_col: str,
    weights: Mapping[str, float],
) -> dict:
    """Per-stratum sampling rates realizing target mixture ``weights``.

    Given observed per-stratum counts c_s and target weights w_s
    (normalized internally), picks the largest total T such that every
    stratum can meet its share without oversampling: rate_s =
    w_s * T / c_s with T = min_s(c_s / w_s). Strata with weight 0 (or
    absent from ``weights``) get rate 0. One COUNT aggregate collected to
    the driver — rows bounded by the number of strata.
    """
    counts = {
        r[strata_col]: r["_kgs_n"]
        for r in df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("_kgs_n")).collect()
    }
    w_total = sum(w for w in weights.values() if w > 0)
    if w_total <= 0:
        return {s: 0.0 for s in counts}
    norm = {s: w / w_total for s, w in weights.items() if w > 0}
    if not any(s in counts and counts[s] > 0 for s in norm):
        # no positively-weighted stratum present in the data
        return {s: 0.0 for s in counts}
    # the binding stratum fixes the achievable total
    t = min(counts[s] / w for s, w in norm.items() if s in counts and counts[s] > 0)
    return {
        s: (min(1.0, norm[s] * t / counts[s]) if s in norm and counts[s] > 0 else 0.0)
        for s in counts
    }


def pack_sequences(
    docs: DataFrame,
    budget: int,
    length_col: str,
    group_col: str,
    order_col: str = "doc_id",
) -> DataFrame:
    """Concat-and-chunk packing: assign documents to fixed-budget sequences.

    GPT-style training packing: within each ``group_col`` partition,
    documents are laid end-to-end in ``order_col`` order and cut into
    sequences of ``budget`` length units; each document is reported with
    the sequence its FIRST unit lands in and its offset inside that
    sequence (documents may straddle a boundary — that is the
    concat-and-chunk contract, not an error).

    Returns (order_col, group_col, length_col, seq_id, begin_offset).
    One shuffle on the group key; the window is a plain running sum, so
    state per task is O(1). Order is only defined within a group — the
    global corpus order of a sharded 100 TB dataset is a fiction anyway;
    pick ``group_col`` = shard/source.
    """
    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = F.coalesce(F.sum(length_col).over(w), F.lit(0))
    return docs.select(
        order_col,
        group_col,
        length_col,
        F.floor(prefix / F.lit(int(budget))).cast("long").alias("seq_id"),
        (prefix % F.lit(int(budget))).cast("long").alias("begin_offset"),
    )


def split_train_eval(
    df: DataFrame,
    key_col: str,
    eval_fraction: float,
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/eval split: adds a ``split`` column.

    The complement property is exact: every row lands in exactly one
    split, and the assignment is stable under reruns, repartitioning, and
    engine changes — the property that matters for decontamination
    bookkeeping (an eval doc must never drift into train between runs).
    """
    frac = hash_fraction(F.col(key_col), salt)
    return df.withColumn(
        "split",
        F.when(frac < F.lit(float(eval_fraction)), F.lit("eval")).otherwise(
            F.lit("train")
        ),
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    n: int,
    key_col: str,
    salt: str = "cap",
) -> DataFrame:
    """At most ``n`` rows per group, chosen by deterministic hash order.

    The per-source cap of a mixture recipe ("no more than n docs from any
    one domain"), reproducible across runs and engines: rows rank by
    :func:`hash_fraction` (ties broken by key) within their group, and
    ranks > n drop. One shuffle on the group key; the window carries a
    rank only, so state per task is O(1).
    """
    w = Window.partitionBy(group_col).orderBy(
        hash_fraction(F.col(key_col), salt).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("_kgs_rank", F.row_number().over(w))
        .filter(F.col("_kgs_rank") <= n)
        .drop("_kgs_rank")
    )


def temperature_weights(
    df: DataFrame, strata_col: str, alpha: float = 0.3
) -> dict:
    """Per-stratum mixture weights ``w_s ∝ c_s^α`` — the multilingual-LM
    temperature rule (mT5 §3.1 / XLM-R: sample language s with
    probability ∝ |D_s|^α, α<1 upsampling low-resource strata). One
    COUNT aggregate collected (rows = |strata|)."""
    if not (0.0 < alpha <= 1.0):
        raise ValueError("alpha must be in (0, 1]")
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("_kgs_n")).collect()
    return {r[strata_col]: float(r["_kgs_n"]) ** alpha for r in counts}


def temperature_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    alpha: float = 0.3,
    salt: str = "",
) -> DataFrame:
    """Seeded Bernoulli sample realizing the α-temperature mixture:
    :func:`temperature_weights` → :func:`mixture_rates` →
    :func:`stratified_sample`. Two scalar COUNT passes (weights + rates)
    then one narrow md5 filter — reproducible across runs, engines, and
    partitionings like every sampler here."""
    w = temperature_weights(df, strata_col, alpha)
    rates = mixture_rates(df, strata_col, w)
    return stratified_sample(df, key_col, strata_col, rates, 0.0, salt)


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    n: int,
    salt: str = "",
) -> DataFrame:
    """Seeded weighted sample WITHOUT replacement of ``n`` rows:
    Efraimidis–Spirakis A-ES keys — each row draws u = md5-uniform and
    scores ``u^(1/w)``; the top-``n`` scores are exactly a weighted
    draw without replacement. Deterministic across runs/engines/
    partitionings like every sampler here; rows with weight <= 0 are
    excluded (their inclusion probability is 0).

    The global top-n runs in two stages so no single task ever sorts
    the table: a per-bucket top-n over 64 hash buckets (parallel
    windows), then the final exact window over at most 64·n surviving
    rows — identical output to a direct global rank, since the global
    top-n is a subset of every bucket's top-n.
    """
    if n <= 0:
        return df.limit(0)
    from pyspark.sql.window import Window

    scored = df.filter(F.col(weight_col) > 0).withColumn(
        "_kgs_score",
        F.pow(
            hash_fraction(F.col(key_col), salt),
            F.lit(1.0) / F.col(weight_col).cast("double"),
        ),
    )
    _BUCKETS = 64
    scored = scored.withColumn(
        "_kgs_b", F.pmod(F.xxhash64(F.col(key_col)), F.lit(_BUCKETS))
    )
    wb = Window.partitionBy("_kgs_b").orderBy(F.desc("_kgs_score"), F.asc(key_col))
    survivors = (
        scored.withColumn("_kgs_rank", F.row_number().over(wb))
        .filter(F.col("_kgs_rank") <= n)
        .drop("_kgs_rank")
    )
    w = Window.orderBy(F.desc("_kgs_score"), F.asc(key_col))
    return (
        survivors.withColumn("_kgs_rank", F.row_number().over(w))
        .filter(F.col("_kgs_rank") <= n)
        .drop("_kgs_score", "_kgs_rank", "_kgs_b")
    )


def negative_samples(
    pairs: DataFrame,
    n_items: int,
    k: int = 4,
    query_col: str = "query_id",
    pos_col: str = "pos_id",
    seed: int = 42,
    max_attempts: int = 8,
) -> DataFrame:
    """(query_id, slot, neg_id) — ``k`` deterministic negative draws per
    query for contrastive training (word2vec / dual-encoder negatives):
    slot j's candidate chain is ``md5(seed:q:j:attempt) mod n_items``,
    and the first attempt that hits neither the query's positives nor
    the query itself wins. Requires dense item ids 0..n_items-1 (map
    through a vocabulary table first otherwise).

    Deterministic across engines/partitionings (md5 + integer mod — the
    corpus-independent draw lets the oracle replay it in SQL). Cost is
    O(|pairs|·k·attempts) narrow rows plus one left-anti on the positive
    set — no corpus join at all. A query whose positives cover every
    candidate in the chain yields fewer than k rows (bounded retries,
    documented rather than silent resampling).
    """
    q = pairs.select(query_col).distinct()
    slots = q.select(
        query_col,
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("slot"),
    ).select(
        query_col,
        "slot",
        F.explode(F.sequence(F.lit(0), F.lit(max_attempts - 1))).alias("attempt"),
    )
    cand = slots.withColumn(
        "neg_id",
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":",
                            F.lit(str(seed)),
                            F.col(query_col),
                            F.col("slot"),
                            F.col("attempt"),
                        )
                    ),
                    1, 8,
                ),
                16, 10,
            ).cast("long"),
            F.lit(n_items),
        ),
    ).filter(F.col("neg_id") != F.col(query_col))
    ok = cand.join(
        pairs.select(
            F.col(query_col), F.col(pos_col).alias("neg_id")
        ).distinct(),
        on=[query_col, "neg_id"],
        how="left_anti",
    )
    first = ok.groupBy(query_col, "slot").agg(
        F.min_by("neg_id", "attempt").alias("neg_id")
    )
    return first.select(query_col, "slot", "neg_id")


def _dsir_features(docs: DataFrame, n_buckets: int, text_col: str) -> DataFrame:
    """(doc_id, bucket, cnt) — hashed unigram+bigram bag per document.

    The DSIR feature map (Xie et al. 2023 §3): every unigram and bigram
    hashed into ``n_buckets`` buckets via the engine-portable md5 prefix
    (same family as :func:`hash_fraction`), counted with multiplicity.
    One explode + map-side-combined groupBy; output is min(corpus tokens,
    |docs|·buckets)-bounded.
    """
    from kafka_graphs_spark.pipeline.text import tokens

    toks = tokens(F.col(text_col))
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = docs.select(
        "doc_id", F.explode(F.concat(toks, bigrams)).alias("_f")
    ).select(
        "doc_id",
        F.pmod(
            F.conv(F.substring(F.md5(F.col("_f")), 1, 8), 16, 10).cast("long"),
            F.lit(n_buckets),
        ).alias("bucket"),
    )
    return feats.groupBy("doc_id", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )


def dsir_weights(
    docs: DataFrame,
    target,
    n_buckets: int = 8192,
    k_smooth: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_feats, weight) — DSIR importance weights (Xie et al.
    2023, "Data Selection for Language Models via Importance
    Resampling"): score every document by how much more likely its
    hashed-n-gram profile is under the target-domain distribution than
    under the raw-corpus distribution,

        weight(d) = Σ_b c_d(b) · [ ln p̂_tgt(b) − ln p̂_raw(b) ],

    with add-k smoothed bucket estimates p̂(b) = (c(b)+k)/(C+k·B).
    ``target`` is either a boolean Column over ``docs`` marking the
    target-domain subset (e.g. ``F.col("lang") == "en"`` or a
    quality-classifier verdict) or a separate DataFrame — the paper's
    actual setup, where the target distribution comes from an EXTERNAL
    high-quality corpus (Wikipedia/books) rather than a slice of the
    corpus being scored. A DataFrame target needs the same
    (doc_id, text) shape; its documents are never scored, only counted.

    Scale shape: the bucket log-ratio model is B-bounded (broadcast
    join); raw/target counts are one map-side-combined aggregation over
    the hashed-feature table; totals ride the plan as a broadcast
    one-row frame (no eager collect). The per-document sum is
    order-dependent float — rounded to 6 dp (repo precedent), ties in
    downstream selection break on doc_id.
    """
    doc_feats = _dsir_features(docs, n_buckets, text_col)
    if isinstance(target, DataFrame):
        raw_b = doc_feats.groupBy("bucket").agg(F.sum("cnt").alias("c_raw"))
        tgt_b = _dsir_features(target, n_buckets, text_col).groupBy("bucket").agg(
            F.sum("cnt").alias("c_tgt")
        )
        # scoring only needs buckets that occur in the scored corpus
        # (left join); totals must still cover ALL target mass, so they
        # aggregate each side before the join
        per_bucket = raw_b.join(tgt_b, on="bucket", how="left").select(
            "bucket", "c_raw", F.coalesce("c_tgt", F.lit(0).cast("long")).alias("c_tgt")
        )
        totals = raw_b.agg(F.sum("c_raw").alias("_C_raw")).crossJoin(
            tgt_b.agg(F.sum("c_tgt").alias("_C_tgt"))
        )
    else:
        flagged = doc_feats.join(
            docs.select("doc_id", target.alias("_tgt")), on="doc_id"
        )
        per_bucket = flagged.groupBy("bucket").agg(
            F.sum("cnt").alias("c_raw"),
            F.sum(
                F.when(F.col("_tgt"), F.col("cnt")).otherwise(F.lit(0))
            ).alias("c_tgt"),
        )
        totals = per_bucket.agg(
            F.sum("c_raw").alias("_C_raw"), F.sum("c_tgt").alias("_C_tgt")
        )
    kB = float(k_smooth) * n_buckets
    model = per_bucket.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log((F.col("c_tgt") + F.lit(float(k_smooth))) / (F.col("_C_tgt") + F.lit(kB)))
            - F.log((F.col("c_raw") + F.lit(float(k_smooth))) / (F.col("_C_raw") + F.lit(kB)))
        ).alias("_lr"),
    )
    scored = (
        doc_feats.join(F.broadcast(model), on="bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_feats"),
            F.round(F.sum(F.col("cnt") * F.col("_lr")), 6).alias("weight"),
        )
    )
    return docs.select("doc_id").join(scored, on="doc_id", how="left").select(
        "doc_id",
        F.coalesce("n_feats", F.lit(0).cast("long")).alias("n_feats"),
        F.coalesce("weight", F.lit(0.0)).alias("weight"),
    )


def dsir_select(
    docs: DataFrame,
    target,
    n: int,
    n_buckets: int = 8192,
    k_smooth: float = 0.5,
    text_col: str = "text",
    salt: str = "",
) -> DataFrame:
    """(doc_id, weight, key) — DSIR importance RESAMPLING: draw ``n``
    documents without replacement with probability ∝ exp(weight) via the
    Gumbel-top-n trick: key = weight + Gumbel(md5-uniform), take the n
    largest keys (Xie et al. 2023 §3 sample step). Deterministic across
    runs, engines, and partitionings — the Gumbel draw is a pure
    function of (doc_id, salt).

    The global top-n reuses the two-stage shape of
    :func:`weighted_sample`: per-bucket top-n over 64 hash buckets,
    then one exact window over ≤ 64·n survivors — no global sort.
    """
    if n <= 0:
        return docs.select("doc_id").limit(0).select(
            "doc_id", F.lit(0.0).alias("weight"), F.lit(0.0).alias("key")
        )
    w = dsir_weights(docs, target, n_buckets, k_smooth, text_col)
    # u strictly in (0, 1): (h + 0.5)/2^32 — keeps both ln calls finite
    # (Spark log(<=0) is NULL while DuckDB ln(0) is -inf; never hit either)
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(salt))), 1, 8),
            16, 10,
        ).cast("long")
        + F.lit(0.5)
    ) / F.lit(_HEX8)
    scored = w.select(
        "doc_id",
        "weight",
        F.round(F.col("weight") - F.log(-F.log(u)), 6).alias("key"),
    )
    _BUCKETS = 64
    b = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(_BUCKETS))
    wb = Window.partitionBy(b).orderBy(F.desc("key"), F.asc("doc_id"))
    survivors = (
        scored.withColumn("_r", F.row_number().over(wb))
        .filter(F.col("_r") <= n)
        .drop("_r")
    )
    wg = Window.orderBy(F.desc("key"), F.asc("doc_id"))
    return (
        survivors.withColumn("_r", F.row_number().over(wg))
        .filter(F.col("_r") <= n)
        .drop("_r")
    )


def token_budget_sample(
    docs: DataFrame,
    budget: int,
    length_col: str,
    strata_col: str,
    key_col: str = "doc_id",
    salt: str = "budget",
) -> DataFrame:
    """Keep a deterministic subset of each stratum totalling at most
    ``budget`` length units (tokens) — the TOKEN-budgeted mixture draw
    (pretraining mixes are specified in tokens per source, not document
    counts; a doc-count sample over-weights strata with long documents).

    Within each stratum, documents are laid out in md5-shuffled order
    (seeded by ``salt`` — a stable, engine-portable permutation) and kept
    while the exclusive prefix sum of ``length_col`` stays under
    ``budget``: the first document of a stratum is always kept, and the
    kept set is a prefix of the shuffled order, so re-running with a
    LARGER budget strictly extends the sample (monotone — the property
    that makes budget sweeps reproducible).

    One shuffle on the stratum key; the window is a running sum (O(1)
    state per task). Ties in the md5 draw break on ``key_col``.
    """
    order_frac = hash_fraction(F.col(key_col), salt)
    w = (
        Window.partitionBy(strata_col)
        .orderBy(order_frac, F.col(key_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = F.coalesce(F.sum(length_col).over(w), F.lit(0))
    return (
        docs.withColumn("_kgs_prefix", prefix)
        .filter(F.col("_kgs_prefix") < F.lit(int(budget)))
        .select(*docs.columns)
    )
