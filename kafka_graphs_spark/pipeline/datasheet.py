"""Corpus datasheet — the data-card rollup every training-data pipeline
publishes (datasheet-for-datasets / Dolma-style corpus reports):
language mix, source mix, quality-score histogram, and overall totals,
all computed in ONE corpus pass.

Beyond-reference pipeline tier. The whole artifact is a single
GROUPING SETS aggregate over one projection of the corpus — per-row
expressions compute (lang, source, quality band, token count) once, and
Spark's partial aggregation map-side-combines every grouping set in the
same shuffle. At 100 TB that is one scan + one shuffle keyed by the
tiny (section, key) space; the alternative (a union of one groupBy per
section) would re-scan the corpus per section.

Values stay exact integers until the two final share divisions —
int/int division is IEEE-exact, so the output is engine-portable
without rounding tricks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corpus_datasheet(
    docs: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    source_col: str = "source",
) -> DataFrame:
    """(section, key, n_docs, n_tokens, doc_share, token_share) — the
    corpus data card in long form.

    Sections: ``overall`` (key ``all``), ``language`` (key = lang),
    ``source`` (key = source), ``quality_band`` (key = the heuristic
    quality score ×10 as an integer string — ``0``/``3``/``4``/``7``/
    ``10``). Shares are within-section (each section sums to 1), from
    the already-aggregated rows via an unpartitioned window — one row
    per section/key, never a second corpus scan.
    """
    from kafka_graphs_spark.pipeline.text import quality_exprs

    from pyspark.sql.window import Window

    n_tokens, _, _, score = quality_exprs(text_col)
    band = F.round(score * 10).cast("int").cast("string")
    per = docs.select(
        F.col(lang_col).alias("lang"),
        F.col(source_col).alias("source"),
        band.alias("band"),
        n_tokens.cast("long").alias("_t"),
    )
    gs = per.groupingSets(
        [[], [F.col("lang")], [F.col("source")], [F.col("band")]],
        "lang", "source", "band",
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_t").cast("long").alias("n_tokens"),
        # grouping() flags inside the agg (Spark requires them here)
        F.grouping("lang").alias("_gl"),
        F.grouping("source").alias("_gs"),
        F.grouping("band").alias("_gb"),
    )
    section = (
        F.when(F.col("_gl") == 0, F.lit("language"))
        .when(F.col("_gs") == 0, F.lit("source"))
        .when(F.col("_gb") == 0, F.lit("quality_band"))
        .otherwise(F.lit("overall"))
    )
    key = F.coalesce("lang", "source", "band", F.lit("all"))
    w = Window.partitionBy("section")
    return (
        gs.select(
            section.alias("section"),
            key.alias("key"),
            "n_docs",
            "n_tokens",
        )
        .withColumn(
            "doc_share",
            F.round(
                F.col("n_docs").cast("double") / F.sum("n_docs").over(w), 6
            ),
        )
        .withColumn(
            "token_share",
            F.round(
                F.col("n_tokens").cast("double") / F.sum("n_tokens").over(w),
                6,
            ),
        )
    )


def corpus_datasheet_stream(
    docs_stream: DataFrame,
    window_duration: str,
    event_time: str = "event_time",
    watermark: str | None = None,
    text_col: str = "text",
    lang_col: str = "lang",
    source_col: str = "source",
) -> DataFrame:
    """(window_start, section, key, n_docs, n_tokens) — the data card of
    :func:`corpus_datasheet` maintained continuously over a document
    STREAM, one card per tumbling event-time window (the "what is the
    crawler feeding us this hour" dashboard; late documents update only
    their own window's card).

    Streaming aggregation cannot GROUPING SETS, so each document
    explodes into its four (section, key) rows up front — the same
    Expand-shape Catalyst compiles GROUPING SETS to — and ONE windowed
    ``groupBy(window, section, key)`` with map-side partial aggregation
    does the rest. State is one counter row per (window, section, key):
    bounded by the tiny section/key space per window, not by corpus
    size, and a ``watermark`` bound evicts closed windows. Counts are
    exact integers; re-emissions in update mode are monotone
    non-decreasing, so "final card" = max per key (shares, being two
    divisions over ≤ a few dozen rows per card, are display-time work —
    exactly as the batch datasheet computes them from already-aggregated
    rows).

    Works identically on a batch frame (one "micro-batch") — the oracle
    twin's recipe, as with every incremental-tier operator.
    """
    from kafka_graphs_spark.pipeline.text import quality_exprs

    n_tokens, _, _, score = quality_exprs(text_col)
    band = F.round(score * 10).cast("int").cast("string")
    if watermark:
        docs_stream = docs_stream.withWatermark(event_time, watermark)
    pairs = F.array(
        F.struct(
            F.lit("overall").alias("section"), F.lit("all").alias("key")
        ),
        F.struct(
            F.lit("language").alias("section"),
            F.col(lang_col).cast("string").alias("key"),
        ),
        F.struct(
            F.lit("source").alias("section"),
            F.col(source_col).cast("string").alias("key"),
        ),
        F.struct(
            F.lit("quality_band").alias("section"), band.alias("key")
        ),
    )
    per = docs_stream.select(
        F.col(event_time).alias("_et"),
        F.explode(pairs).alias("_sk"),
        n_tokens.cast("long").alias("_t"),
    )
    # group by the full window struct (the streaming-planner-supported
    # shape for watermark tracking); project start afterwards
    return (
        per.groupBy(
            F.window("_et", window_duration).alias("_w"),
            F.col("_sk.section").alias("section"),
            F.col("_sk.key").alias("key"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("_t").cast("long").alias("n_tokens"),
        )
        .select(
            F.col("_w.start").alias("window_start"),
            "section",
            "key",
            "n_docs",
            "n_tokens",
        )
    )


def hot_keys(df: DataFrame, key_col: str, k: int = 10) -> DataFrame:
    """(key, n_rows, share, rank) — the ``k`` heaviest values of a
    would-be join/aggregation key, with their share of all rows: the
    skew audit run BEFORE keying a 100 TB shuffle on a column (a key
    holding >1% of a petabyte funnels through one task; this report is
    how you find out in advance and decide to salt or broadcast).

    One map-side-combinable groupBy on the key; the ranking window runs
    over the AGGREGATED per-key frame (|distinct keys| rows, never the
    corpus), and the share division uses the window total — one scan,
    one shuffle. NULL keys count as a key (NULL skew is the most common
    real-world case).
    """
    from pyspark.sql.window import Window

    agg = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    )
    total = F.sum("n_rows").over(Window.partitionBy())
    w = Window.orderBy(F.desc("n_rows"), F.asc_nulls_first("key"))
    return (
        agg.withColumn("share", F.round(F.col("n_rows") / total, 6))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )
