"""Bloom-filter n-gram contamination gate.

At 100 TB the eval-decontamination gate (:func:`..dedup.ngram_contamination`)
carries the benchmark's distinct-shingle set as a broadcast ~exact set
(a left-semi hash join). Benchmark suites grow: a few hundred million
distinct shingles as strings is tens of GB — past any broadcast budget —
while the information needed is one bit per shingle. The classic fix is
a FIXED-SIZE Bloom filter (Bloom, CACM 1970; the same trade C4/Gopher
-style pipelines make for URL and benchmark blocklists): ``m`` bits and
``k`` hashes give a false-positive rate of ``(1 - e^{-kn/m})^k`` and
ZERO false negatives, so the gate may over-flag a bounded fraction of
clean shingles but can never let a contaminated one through.

Spark-first construction — the filter is built distributed and applied
as pure Catalyst expressions, no Python UDFs anywhere:

1. benchmark shingles → ``k`` positions each (``xxhash64(shingle, seed)
   mod m``) → ``groupBy(word index) agg(bit_or(bit))`` — a map-side-
   combinable aggregate over at most ``m/64`` output rows;
2. the ≤ ``m/64``-long word array is collected (a SIZE-GATED handoff:
   the filter is fixed-size by design, independent of corpus scale —
   collecting it is the point) and re-broadcast as a one-row frame;
3. the train side probes membership with ``element_at`` + bit shifts
   per seed — codegen'd expressions at scan speed, ANDed across seeds.

Reference semantics matched: the exact gate's output contract
(doc_id, contaminated, total, rate) — the Bloom variant over-approximates
``contaminated`` within the published bound and is audited against the
exact gate by :func:`bloom_contamination_check`.
"""

from __future__ import annotations

import math
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_graphs_spark.pipeline.dedup import shingles

#: hard cap on filter words collected to the driver (8 MB of longs) —
#: the size gate for the driver handoff; raise deliberately at real scale.
MAX_FILTER_WORDS = 1 << 20


def _positions(col: Column, num_hashes: int, m_bits: int) -> list[Column]:
    """k filter-bit positions for a shingle — xxhash64 with the seed as
    a second hashed column (cross-partition deterministic)."""
    return [
        F.pmod(F.xxhash64(col, F.lit(i)), F.lit(m_bits))
        for i in range(num_hashes)
    ]


def bloom_parameters(n_keys: int, bits_per_key: int = 10) -> tuple[int, int]:
    """(m_bits, k_hashes) for ``n_keys`` expected insertions.

    ``m`` rounds up to a multiple of 64 (whole words); ``k`` is the
    optimum ``ln 2 · m/n`` clamped to [1, 16]. At the default 10
    bits/key the false-positive rate is ~0.8%.
    """
    if n_keys < 1:
        n_keys = 1
    m_bits = ((n_keys * bits_per_key + 63) // 64) * 64
    k = max(1, min(16, round(0.6931471805599453 * m_bits / n_keys)))
    return m_bits, k


def build_bloom_filter(
    keys: DataFrame, key_col: str, bits_per_key: int = 10
) -> tuple[DataFrame, int, int, int]:
    """(filter frame, m_bits, k_hashes, n_keys) — a one-row frame with
    column ``bloom array<long>`` of ``m_bits/64`` words.

    Distributed build: explode keys to bit positions, OR per word with a
    map-side-combinable ``bit_or``. The dense word array is assembled
    driver-side from the sparse (word, bits) rows — bounded by
    :data:`MAX_FILTER_WORDS` (the filter is fixed-size regardless of
    corpus size; that bound IS the broadcast budget).
    """
    distinct = keys.select(F.col(key_col).alias("_k")).distinct()
    n_keys = distinct.count()
    m_bits, k = bloom_parameters(n_keys, bits_per_key)
    if m_bits // 64 > MAX_FILTER_WORDS:
        raise ValueError(
            f"bloom filter of {m_bits // 64} words exceeds MAX_FILTER_WORDS="
            f"{MAX_FILTER_WORDS}; lower bits_per_key or raise the cap"
        )
    pos = F.explode(F.array(*_positions(F.col("_k"), k, m_bits))).alias("p")
    sparse = (
        distinct.select(pos)
        .select(
            F.expr("p div 64").alias("w"),
            # F.shiftleft's numBits is a Python int; the per-row shift
            # needs the SQL function, which takes a column
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("p") % 64).cast("int")
            ).alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("bits"))
        .collect()
    )
    words = [0] * (m_bits // 64)
    for row in sparse:
        words[int(row["w"])] = int(row["bits"])
    spark = keys.sparkSession
    filt = spark.createDataFrame([(words,)], "bloom array<long>")
    return filt, m_bits, k, n_keys


def bloom_probe(col: Column, m_bits: int, k: int, bloom_col: Column) -> Column:
    """Boolean membership probe — true iff all k bits are set.

    Pure codegen'd expressions (xxhash64 + shifts); ``m_bits/64`` fits
    an int (capped by :data:`MAX_FILTER_WORDS`), so the word index
    arithmetic is exact.
    """

    def test(seed: int) -> Column:
        p = F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(m_bits))
        word = F.floor(p / 64).cast("int") + 1  # element_at is 1-based
        bit = (p % 64).cast("int")
        # per-row shift amount is a column → SQL shiftright via
        # call_function (F.shiftright only takes a Python int). The
        # shift is ARITHMETIC: a word with its sign bit set shifts to a
        # negative value, whose `% 2` is -1 — mask with `& 1` instead.
        return (
            F.call_function("shiftright", F.element_at(bloom_col, word), bit)
            .bitwiseAND(F.lit(1))
            == 1
        )

    return reduce(lambda a, b: a & b, [test(i) for i in range(k)])


def bloom_contamination(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    text_col: str = "text",
    bits_per_key: int = 10,
) -> DataFrame:
    """(doc_id, flagged, total, rate) — Bloom-filter variant of
    :func:`..dedup.ngram_contamination`.

    ``flagged >= contaminated`` always (no false negatives); the
    over-count is bounded by the filter's false-positive rate times the
    clean-shingle count. Use exactly like the exact gate, trading a
    bounded over-flag rate for a fixed-size broadcast.
    """
    tr = shingles(train, n=n, text_col=text_col)
    bench = shingles(benchmark, n=n, text_col=text_col)
    filt, m_bits, k, _ = build_bloom_filter(bench, "shingle", bits_per_key)
    probed = tr.join(F.broadcast(filt)).select(
        "doc_id",
        bloom_probe(F.col("shingle"), m_bits, k, F.col("bloom")).alias("_hit"),
    )
    return probed.groupBy("doc_id").agg(
        F.sum(F.when(F.col("_hit"), 1).otherwise(0)).cast("long").alias("flagged"),
        F.count(F.lit(1)).cast("long").alias("total"),
    ).select(
        "doc_id",
        "flagged",
        "total",
        (F.col("flagged").cast("double") / F.col("total")).alias("rate"),
    )


def bloom_contamination_check(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    text_col: str = "text",
    bits_per_key: int = 10,
) -> DataFrame:
    """One-row audit of the Bloom gate against the exact gate:
    (n_docs, n_bench_shingles, contaminated_exact, false_neg_violations,
    fp_within_bound).

    - ``false_neg_violations`` — train (doc, shingle) rows that the
      exact gate hits but the Bloom probe misses; MUST be 0 (a Bloom
      filter has no false negatives, structurally).
    - ``fp_within_bound`` — the observed false-positive count over the
      CLEAN shingle rows stays within 3x the analytic rate
      ``(1 - e^{-kn/m})^k`` (slack for the fixture being finite); the
      exact-side numbers (``n_docs``, ``n_bench_shingles``,
      ``contaminated_exact``) are data-derived and oracle-checkable, so
      the row is never vacuous.
    """
    from kafka_graphs_spark.pipeline.dedup import ngram_contamination

    tr = shingles(train, n=n, text_col=text_col)
    bench = shingles(benchmark, n=n, text_col=text_col)
    filt, m_bits, k, n_keys = build_bloom_filter(bench, "shingle", bits_per_key)
    fp_rate = (1.0 - math.exp(-k * n_keys / m_bits)) ** k

    exact_hit = bench.select("shingle").distinct().withColumn("_e", F.lit(True))
    probed = (
        tr.join(F.broadcast(filt))
        .select(
            "doc_id",
            "shingle",
            bloom_probe(F.col("shingle"), m_bits, k, F.col("bloom")).alias("_b"),
        )
        .join(exact_hit, on="shingle", how="left")
        .select(
            "doc_id",
            "_b",
            F.coalesce("_e", F.lit(False)).alias("_e"),
        )
    )
    agg = probed.agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.sum(F.when(F.col("_e") & ~F.col("_b"), 1).otherwise(0))
        .cast("long")
        .alias("false_neg_violations"),
        F.sum(F.when(F.col("_e"), 1).otherwise(0)).cast("long").alias("_hits"),
        F.sum(F.when(F.col("_b") & ~F.col("_e"), 1).otherwise(0))
        .cast("long")
        .alias("_fp"),
        F.sum(F.when(~F.col("_e"), 1).otherwise(0)).cast("long").alias("_clean"),
    )
    return agg.select(
        "n_docs",
        F.lit(n_keys).cast("long").alias("n_bench_shingles"),
        F.col("_hits").alias("contaminated_exact"),
        "false_neg_violations",
        (
            F.col("_fp").cast("double")
            <= F.lit(3.0 * fp_rate) * F.col("_clean").cast("double") + F.lit(8.0)
        ).alias("fp_within_bound"),
    )


def build_url_filter(
    corpus: DataFrame,
    url_col: str = "url",
    bits_per_key: int = 10,
    extra_params=None,
) -> tuple[DataFrame, int, int, int]:
    """(filter frame, m_bits, k, n_keys) over the corpus's distinct
    canonical URLs — the PERSISTED crawl state between snapshots.

    Cross-snapshot incremental ingest never re-reads the old corpus: the
    fixed-size filter (one ``array<long>`` row; ~10 bits per distinct
    URL) IS the "have I crawled this page" state a new snapshot probes
    — 1.25 GB of filter covers a billion URLs where the exact key set
    would be terabytes. Host-less rows (canonical key ``''``) are
    excluded: an unparseable URL is no evidence of identity (the same
    policy as :func:`~kafka_graphs_spark.pipeline.domains.url_dedup`).
    """
    from kafka_graphs_spark.pipeline.domains import canonicalize_urls

    canon = canonicalize_urls(corpus, url_col, extra_params).filter(
        F.col("canonical_url") != ""
    )
    return build_bloom_filter(canon, "canonical_url", bits_per_key)


def bloom_url_dedup(
    new_docs: DataFrame,
    url_filter: DataFrame,
    m_bits: int,
    k: int,
    url_col: str = "url",
    extra_params=None,
) -> DataFrame:
    """(doc_id, canonical_url, seen, keep) — cross-snapshot incremental
    URL dedup: probe each new document's canonical URL against the
    previous snapshots' filter (:func:`build_url_filter`), then resolve
    WITHIN-snapshot duplicates exactly among the unseen documents.

    Guarantees carried from the filter: a URL present in the corpus is
    ALWAYS flagged ``seen`` (zero false negatives — no corpus duplicate
    ever re-enters); a genuinely new URL is over-dropped at the analytic
    false-positive rate (bounded by construction; ~0.8% at 10 bits/key).
    ``keep`` = unseen AND within-snapshot winner (min doc_id per
    canonical key — same tie-break as ``url_dedup``); host-less rows
    bypass both gates and keep themselves.

    One broadcast of the fixed-size filter + one min-agg shuffle over
    the UNSEEN subset only — the state between crawls never grows with
    corpus size, which is the point at 100 TB. To roll the state
    forward, build a same-parameter filter over the kept URLs and OR it
    in (:func:`merge_bloom_filters`).
    """
    from kafka_graphs_spark.pipeline.domains import canonicalize_urls

    canon = canonicalize_urls(new_docs, url_col, extra_params)
    probed = canon.join(F.broadcast(url_filter)).select(
        "doc_id",
        "canonical_url",
        F.when(F.col("canonical_url") == "", F.lit(False))
        .otherwise(
            bloom_probe(F.col("canonical_url"), m_bits, k, F.col("bloom"))
        )
        .alias("seen"),
    )
    winners = (
        probed.filter(~F.col("seen") & (F.col("canonical_url") != ""))
        .groupBy("canonical_url")
        .agg(F.min("doc_id").alias("_keep_id"))
    )
    return probed.join(winners, on="canonical_url", how="left").select(
        "doc_id",
        "canonical_url",
        "seen",
        (
            ~F.col("seen")
            & (
                F.col("_keep_id").isNull()  # host-less: keeps itself
                | (F.col("doc_id") == F.col("_keep_id"))
            )
        ).alias("keep"),
    )


def merge_bloom_filters(a: DataFrame, b: DataFrame) -> DataFrame:
    """Word-wise OR of two same-parameter filters — the state rollover
    after an ingest (old corpus filter ∪ newly-kept URLs). Both inputs
    must share (m_bits, k); the caller owns that invariant (parameters
    travel alongside the frame), but a word-count mismatch is checked
    here and raises — zip_with would otherwise NULL-pad past the
    shorter array and every probe into those words would return NULL
    seen/keep (silent corruption, not a loud failure). One-row frames:
    the zip is driver-side trivial but expressed as a plan so the
    result composes lazily."""
    wa = a.select(F.col("bloom").alias("_a"))
    wb = b.select(F.col("bloom").alias("_b"))
    return wa.join(wb).select(
        F.when(
            F.size("_a") == F.size("_b"),
            F.zip_with("_a", "_b", lambda x, y: x.bitwiseOR(y)),
        )
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("merge_bloom_filters: word-count mismatch ("),
                    F.size("_a").cast("string"),
                    F.lit(" vs "),
                    F.size("_b").cast("string"),
                    F.lit(") — filters built with different m_bits"),
                )
            )
        )
        .alias("bloom")
    )


def bloom_url_dedup_check(
    new_docs: DataFrame,
    corpus: DataFrame,
    url_col: str = "url",
    bits_per_key: int = 10,
    extra_params=None,
) -> DataFrame:
    """One-row audit of the cross-snapshot Bloom URL gate against the
    exact gate: (n_new, n_corpus_urls, seen_exact, false_neg_violations,
    fp_within_bound, kept_exact, no_extra_keeps).

    - ``false_neg_violations``: new docs whose canonical URL IS in the
      corpus but the probe missed — MUST be 0 (structural);
    - ``fp_within_bound``: observed false positives over the truly-new
      URL rows within 3× the analytic rate plus an additive +8
      small-sample slack (same bound as ``bloom_contamination_check``);
    - ``kept_exact``: the keep count the EXACT gate produces (corpus
      membership by equi-join, then min-per-key + host-less bypass) —
      closed-form oracle-checkable;
    - ``no_extra_keeps``: the Bloom gate's keep set is a SUBSET of the
      exact gate's (FPs only ever over-drop) — must be true.
    """
    from kafka_graphs_spark.pipeline.domains import canonicalize_urls

    filt, m_bits, k, n_keys = build_url_filter(
        corpus, url_col, bits_per_key, extra_params
    )
    fp_rate = (1.0 - math.exp(-k * n_keys / m_bits)) ** k

    corpus_urls = (
        canonicalize_urls(corpus, url_col, extra_params)
        .filter(F.col("canonical_url") != "")
        .select("canonical_url")
        .distinct()
        .withColumn("_in_corpus", F.lit(True))
    )
    bloomed = bloom_url_dedup(
        new_docs, filt, m_bits, k, url_col, extra_params
    ).join(corpus_urls, on="canonical_url", how="left").select(
        "doc_id",
        "canonical_url",
        "seen",
        "keep",
        F.coalesce("_in_corpus", F.lit(False)).alias("_e"),
    )
    # the exact gate's keep decision, computed over the same frame:
    # unseen-exactly AND (host-less OR min doc_id among exact-unseen)
    exact_winners = (
        bloomed.filter(~F.col("_e") & (F.col("canonical_url") != ""))
        .groupBy("canonical_url")
        .agg(F.min("doc_id").alias("_keep_id"))
    )
    both = bloomed.join(exact_winners, on="canonical_url", how="left").select(
        "seen",
        "keep",
        "_e",
        (
            ~F.col("_e")
            & (
                F.col("_keep_id").isNull()
                | (F.col("doc_id") == F.col("_keep_id"))
            )
        ).alias("_keep_exact"),
    )
    agg = both.agg(
        F.count(F.lit(1)).cast("long").alias("n_new"),
        F.sum(F.when(F.col("_e"), 1).otherwise(0)).cast("long").alias("seen_exact"),
        F.sum(F.when(F.col("_e") & ~F.col("seen"), 1).otherwise(0))
        .cast("long")
        .alias("false_neg_violations"),
        F.sum(F.when(F.col("seen") & ~F.col("_e"), 1).otherwise(0))
        .cast("long")
        .alias("_fp"),
        F.sum(F.when(~F.col("_e"), 1).otherwise(0)).cast("long").alias("_clean"),
        F.sum(F.when(F.col("_keep_exact"), 1).otherwise(0))
        .cast("long")
        .alias("kept_exact"),
        F.sum(F.when(F.col("keep") & ~F.col("_keep_exact"), 1).otherwise(0))
        .cast("long")
        .alias("_extra"),
    )
    return agg.select(
        "n_new",
        F.lit(n_keys).cast("long").alias("n_corpus_urls"),
        "seen_exact",
        "false_neg_violations",
        (
            # same additive small-sample slack as bloom_contamination_check:
            # on tiny truly-new counts a couple of hash collisions must not
            # flag a healthy filter (multiplicative-only bounds are fragile
            # for new callers on small snapshots)
            F.col("_fp").cast("double")
            <= F.lit(3.0 * fp_rate) * F.col("_clean").cast("double") + F.lit(8.0)
        ).alias("fp_within_bound"),
        "kept_exact",
        (F.col("_extra") == 0).alias("no_extra_keeps"),
    )
