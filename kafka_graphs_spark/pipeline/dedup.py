"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
span-level exact-substring (detect + remove), cluster resolution,
contamination, cross-source signals, per-source rates, streaming ingest.

Scale design (100 TB mindset):
- exact dedup is one hash-groupBy (partial-aggregated; the md5 runs
  map-side, only 16-byte digests shuffle).
- n-gram Jaccard is the EXACT pairwise path: shingle-inverted-index
  self-join. Quadratic in the worst case — gate it behind MinHash+LSH
  candidate generation at scale (``minhash_lsh_candidates`` produces the
  candidate pairs; ``ngram_jaccard_pairs`` can verify just those).
- MinHash signatures use md5(shingle + seed) as the hash family — md5 is
  reproducible across engines (DuckDB oracle) and stable across runs;
  the min is taken over the hex string (order-isomorphic to the integer).
- SimHash packs per-token md5 bits into a small signature; near-dups =
  signatures at small Hamming distance.

All JVM-side expressions (explode / groupBy / join); no Python UDFs.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_graphs_spark.pipeline.text import tokens


def exact_duplicates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(fp, keep_id, n_dups) per content hash — keep_id = min doc_id.

    The classic exact-dedup reduction: md5 map-side, one partial-agg
    groupBy. Survivor selection is deterministic (min id).
    """
    return (
        docs.select("doc_id", F.md5(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
    )


def shingles(docs: DataFrame, n: int = 3, text_col: str = "text") -> DataFrame:
    """(doc_id, shingle) — distinct word n-grams joined by single spaces.

    Parallelism floor: the explode fans each document out ~|tokens|×,
    and parquet splits at row-group granularity — a corpus written as a
    few large row groups would run the whole shingle stage on a few
    tasks no matter how many cores exist (measured at the 10× scale
    probe: the 2-row-group documents file pinned minhash signatures at
    ~41 s on local[32]; the same aggregation at 32 partitions is
    ~0.6 s — the hash family was irrelevant, the layout was
    everything). When the input has fewer partitions than the session's
    default parallelism, repartition by doc_id BEFORE the explode —
    at real scale (many splits) the condition is false and this is a
    no-op; results are identical either way (everything downstream is
    keyed aggregation).
    """
    return _exploded_shingles(docs, n, text_col).distinct()


def _exploded_shingles(docs: DataFrame, n: int, text_col: str) -> DataFrame:
    """(doc_id, shingle) WITH per-document duplicates — the raw explode
    behind :func:`shingles`, exposed for duplicate-insensitive consumers
    (``min`` aggregation in :func:`minhash_signatures`) that can skip the
    distinct's full shuffle of raw shingle strings (guide §2.4)."""
    target = docs.sparkSession.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < target:
        docs = docs.repartition(target, "doc_id")
    toks = tokens(F.col(text_col))
    # n-gram i..i+n-1 for i in 0..len-n (empty when len < n)
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return docs.select("doc_id", F.explode(grams).alias("shingle"))


def ngram_jaccard_pairs(
    docs: DataFrame, n: int = 3, threshold: float = 0.8, text_col: str = "text"
) -> DataFrame:
    """(doc_a, doc_b, jaccard) for pairs with n-gram Jaccard ≥ threshold.

    Inverted-index self-join: |A∩B| from the shingle join, |A∪B| =
    |A|+|B|−|A∩B|. doc_a < doc_b canonical order.
    """
    sh = shingles(docs, n=n, text_col=text_col).persist()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, on="shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), on="doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), on="doc_b")
        .select(
            "doc_a",
            "doc_b",
            # raw double: int/int division is bit-identical across engines,
            # so no rounding (rounding itself is the cross-engine hazard)
            (F.col("inter").cast("double") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))).alias(
                "jaccard"
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    result = out.localCheckpoint(eager=True)
    sh.unpersist()
    return result


def minhash_signatures(
    docs: DataFrame, num_hashes: int = 16, n: int = 3, text_col: str = "text"
) -> DataFrame:
    """(doc_id, sig array<string>) — per-seed min of md5(shingle || ':' || seed).

    md5-hex min is order-isomorphic to the integer min, and both Spark and
    DuckDB produce identical digests — the cross-engine-reproducible hash
    family. Documents with no shingles get an empty signature row.

    Raw shingle strings never cross a shuffle (r14, guide §2.3/§2.4):
    ``min`` is duplicate-insensitive, so the per-seed minima are computed
    over the raw shingle explode — the ``distinct()`` exchange (the only
    shuffle whose bytes outgrow the input: shingles ≈ 8× doc bytes) is
    dropped outright, and the one remaining exchange carries just the
    map-side-combined per-(partition, doc) digest minima. Bit-identical:
    min over a multiset equals min over its support.
    """
    sh = _exploded_shingles(docs, n, text_col)
    # all per-seed minima in ONE map-side-combined aggregation: the seeded
    # digests are parallel column expressions over each shingle row (no
    # num_hashes-way explode, no second shuffle on (doc_id, seed))
    mins = [
        F.min(
            F.md5(F.concat_ws(":", F.col("shingle"), F.lit(str(i))))
        ).alias(f"_mh{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy("doc_id").agg(*mins).select(
        "doc_id",
        F.array(*[F.col(f"_mh{i}") for i in range(num_hashes)]).alias("sig"),
    )


def minhash_lsh_candidates(
    docs: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """(doc_a, doc_b) candidate near-dup pairs sharing ≥1 LSH band bucket.

    Banding: the signature splits into ``bands`` bands of
    ``num_hashes/bands`` rows; band key = concat of its min-hashes. Pairs
    colliding in any band become candidates — the standard
    shingle→minhash→band→bucket-join pipeline. At scale this is the
    candidate generator in front of exact Jaccard verification.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(docs, num_hashes=num_hashes, n=n, text_col=text_col)
    banded = sig.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"),
        F.col("sig"),
    ).select(
        "doc_id",
        "band",
        F.array_join(F.slice("sig", F.col("band") * rows_per_band + 1, rows_per_band), "|").alias(
            "bucket"
        ),
    )
    a = banded.select(F.col("doc_id").alias("doc_a"), "band", "bucket")
    b = banded.select(F.col("doc_id").alias("doc_b"), "band", "bucket")
    return (
        a.join(b, on=["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def simhash(docs: DataFrame, bits: int = 16, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash long) — ``bits``-bit SimHash over distinct tokens.

    Each token votes ±1 per bit position using bits of
    md5-derived integers; the signature bit is 1 where the vote sum > 0.
    Near-duplicates are signatures within small Hamming distance
    (pair them with ``simhash_near_pairs``).
    """
    toks = docs.select("doc_id", F.explode(tokens(F.col(text_col))).alias("t")).distinct()
    # token hash: first 15 hex chars of md5 → bigint (fits in 60 bits)
    hashed = toks.select(
        "doc_id", F.conv(F.substring(F.md5("t"), 1, 15), 16, 10).cast("long").alias("h")
    )
    votes = hashed.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("b"),
        F.col("h"),
    ).select(
        "doc_id",
        "b",
        # shiftright with a column shift amount needs the SQL form
        F.when(F.expr("shiftright(h, b) & 1") == 1, F.lit(1)).otherwise(F.lit(-1)).alias("v"),
    )
    bitsum = votes.groupBy("doc_id", "b").agg(F.sum("v").alias("s"))
    return bitsum.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("shiftleft(cast(1 as bigint), b)")).otherwise(F.lit(0))
        ).alias("simhash")
    )


def simhash_near_pairs(docs: DataFrame, bits: int = 16, max_hamming: int = 2,
                       text_col: str = "text") -> DataFrame:
    """(doc_a, doc_b, hamming) pairs within ``max_hamming`` bit flips.

    Scale path: block on signature halves (a pair within distance d must
    agree exactly on at least one of d+1 blocks), join per block, verify
    with popcount — avoids the full cross join.
    """
    sig = simhash(docs, bits=bits, text_col=text_col)
    blocks = max_hamming + 1
    block_bits = bits // blocks
    # per-block banded view; the shift distance is a per-block literal
    # (shiftright requires a literal count), so the bands stack by union
    banded = None
    for blk in range(blocks):
        part = sig.select(
            "doc_id",
            "simhash",
            F.lit(blk).alias("blk"),
            F.shiftright(F.col("simhash"), blk * block_bits)
            .bitwiseAND(F.lit((1 << block_bits) - 1))
            .alias("key"),
        )
        banded = part if banded is None else banded.unionByName(part)
    a = banded.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sig_a"), "blk", "key")
    b = banded.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sig_b"), "blk", "key")
    pairs = (
        a.join(b, on=["blk", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", F.col("sig_a").bitwiseXOR(F.col("sig_b")).alias("x"))
        .distinct()
    )
    hamming = F.bit_count(F.col("x"))
    return pairs.select("doc_a", "doc_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


def resolve_duplicates(
    docs: DataFrame,
    pairs: DataFrame = None,
    n: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    max_iterations: int = 50,
) -> DataFrame:
    """(doc_id, keep_id) — canonical survivor per transitive duplicate group.

    The KEEP LIST a training-data pipeline actually applies: duplicate
    candidate ``pairs`` (default: :func:`ngram_jaccard_pairs` at
    ``threshold``) form a graph whose connected components are the
    duplicate clusters; every document maps to the MINIMUM doc_id of its
    cluster (itself when unique). Filtering a corpus is then
    ``WHERE doc_id = keep_id``.

    Transitive closure runs on the distributed WCC from the algorithm
    library (log-diameter pointer jumping) — pairs-at-scale come from the
    LSH/banding generators, never an all-pairs join, and the component
    step shuffles only the candidate-pair graph, which is tiny relative
    to the corpus.
    """
    from kafka_graphs_spark.graph import Graph
    from kafka_graphs_spark.library.components import connected_components

    if pairs is None:
        pairs = ngram_jaccard_pairs(docs, n=n, threshold=threshold, text_col=text_col)
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"), F.lit(1.0).alias("value")
    )
    comp = connected_components(
        Graph.from_edges(edges, F.col("id")), max_iterations=max_iterations
    )
    return (
        docs.select("doc_id")
        .join(comp.withColumnRenamed("id", "doc_id"), on="doc_id", how="left")
        .select("doc_id", F.coalesce(F.col("value"), F.col("doc_id")).alias("keep_id"))
    )


def ngram_contamination(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, contaminated, total, rate) — benchmark-overlap decontamination.

    The standard eval-decontamination check for training corpora: for each
    training document, the fraction of its distinct word n-grams that also
    occur in ANY benchmark document. Inverted-index equi-join on the
    shingle (the benchmark's distinct-shingle side is typically small
    enough to broadcast); never an all-pairs document join. Filter
    ``rate >= cutoff`` downstream to drop contaminated documents.
    """
    tr = shingles(train, n=n, text_col=text_col)
    bench = (
        shingles(benchmark, n=n, text_col=text_col)
        .select("shingle")
        .distinct()
    )
    hits = (
        tr.join(F.broadcast(bench), on="shingle", how="left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("contaminated"))
    )
    totals = tr.groupBy("doc_id").agg(F.count(F.lit(1)).alias("total"))
    return (
        totals.join(hits, on="doc_id", how="left")
        .select(
            "doc_id",
            F.coalesce("contaminated", F.lit(0)).alias("contaminated"),
            "total",
            # int/int division: bit-identical across engines, no rounding
            (F.coalesce("contaminated", F.lit(0)).cast("double") / F.col("total")).alias("rate"),
        )
    )


def _contains_map(dtype) -> bool:
    """True if the type (recursively) contains a MapType — not orderable."""
    from pyspark.sql import types as T

    if isinstance(dtype, T.MapType):
        return True
    if isinstance(dtype, T.ArrayType):
        return _contains_map(dtype.elementType)
    if isinstance(dtype, T.StructType):
        return any(_contains_map(f.dataType) for f in dtype.fields)
    return False


def streaming_exact_dedup(
    docs: DataFrame,
    text_col: str = "text",
    time_col: Optional[str] = None,
    watermark: Optional[str] = None,
) -> DataFrame:
    """First-seen-wins exact dedup that works on BATCH and STREAMING frames.

    Adds ``fp`` = md5 of the normalized token stream (same canonical form
    as :func:`kafka_graphs_spark.pipeline.text.fingerprint`, so trivial
    whitespace/case variants collapse too) and keeps the first document
    per fingerprint. On a streaming frame this is Structured Streaming's
    stateful ``dropDuplicates``: the seen-fingerprint set lives in the
    checkpointed state store, sharded by fp across executors.

    State at 100 TB: an UNBOUNDED seen-set is the semantics of global
    ingestion dedup and grows with the corpus (fp + overhead per doc);
    pass ``time_col`` + ``watermark`` (e.g. "24 hours") to switch to
    ``dropDuplicatesWithinWatermark``, which bounds state to the
    watermark horizon — the right contract when re-crawls arrive within a
    known window.

    On BATCH frames "first" is defined by ``time_col`` when given (min
    time per fingerprint, ties broken by the full row — deterministic
    across partitionings); without a time column a batch frame has no
    arrival order, so ONE representative per fingerprint is kept but
    which one is partition-dependent.
    """
    fp = F.md5(F.array_join(tokens(F.col(text_col)), " "))
    with_fp = docs.withColumn("fp", fp)
    if docs.isStreaming:
        if watermark is not None:
            if time_col is None:
                raise ValueError("watermark-bounded dedup needs time_col")
            return with_fp.withWatermark(
                time_col, watermark
            ).dropDuplicatesWithinWatermark(["fp"])
        return with_fp.dropDuplicates(["fp"])
    if time_col is not None:
        # deterministic batch first-wins: min_by keeps the whole row (the
        # VALUE side needs no ordering, so map-typed columns are fine)
        # under an ordering key of (time NULLS LAST, orderable columns) —
        # a NULL timestamp must lose to any real one, and the orderable
        # tail makes timestamp ties deterministic
        cols = with_fp.columns
        orderable = [
            f.name
            for f in with_fp.schema.fields
            if not _contains_map(f.dataType) and f.name != "fp"
        ]
        key = F.struct(
            F.col(time_col).isNull().alias("_null"),
            F.col(time_col).alias("_t"),
            *[F.col(c) for c in orderable],
        )
        return (
            with_fp.groupBy("fp")
            .agg(F.min_by(F.struct(*[F.col(c) for c in cols]), key).alias("_m"))
            .select(*[F.col(f"_m.{c}").alias(c) for c in cols])
        )
    return with_fp.dropDuplicates(["fp"])


def cross_source_duplicates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(fp, n_docs, n_sources, keep_doc_id) — canonical fingerprints that
    appear in MORE THAN ONE source, with the deterministic keeper
    (min doc_id).

    Cross-source duplication is the syndication/mirror signal a curation
    pipeline treats differently from in-source duplication (mirrors are
    usually bulk-droppable). Composition of text.fingerprint with one
    map-side-combinable aggregation — digest-only shuffle, scales like
    exact dedup.
    """
    from kafka_graphs_spark.pipeline.text import fingerprint

    fp = fingerprint(docs, text_col).join(
        docs.select("doc_id", "source"), on="doc_id"
    )
    return (
        fp.groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .filter(F.col("n_sources") > 1)
    )


def cross_source_near_duplicate_profile(
    docs: DataFrame, bits: int = 16, max_hamming: int = 2, text_col: str = "text"
) -> DataFrame:
    """(source_a, source_b, n_pairs) — SimHash near-duplicate pairs that
    CROSS source boundaries, aggregated per source pair (source_a <
    source_b lexicographically).

    The mirror-detection rollup: a source pair with many cross near-dups
    is a syndication/mirror relationship worth bulk action, invisible to
    per-pair review. Rides :func:`simhash_near_pairs` (banded equi-join,
    never all-pairs) plus two broadcast-sized joins on doc_id and one
    map-side-combinable count.
    """
    pairs = simhash_near_pairs(docs, bits=bits, max_hamming=max_hamming,
                               text_col=text_col)
    src = docs.select("doc_id", "source")
    labeled = (
        pairs.join(
            src.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("_sa")),
            on="doc_a",
        )
        .join(
            src.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("_sb")),
            on="doc_b",
        )
        .filter(F.col("_sa") != F.col("_sb"))
    )
    return (
        labeled.select(
            F.least("_sa", "_sb").alias("source_a"),
            F.greatest("_sa", "_sb").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


def duplicated_spans(
    docs: DataFrame, w: int = 8, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_windows, n_dup_windows, dup_fraction) — per-document
    fraction of ``w``-token windows whose exact token sequence occurs
    anywhere else in the corpus (another document OR another position of
    the same document).

    Span-level exact-substring duplication (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better", arXiv:2107.06499): unlike
    whole-document dedup, this catches boilerplate headers, license
    blocks, and templated passages embedded in otherwise-unique documents
    — the signal ExactSubstr removes at span granularity. This operator
    reports the per-doc duplicated fraction; a curation gate drops or
    trims docs past a threshold.

    100 TB shape: one narrow explode to (doc, window-md5) rows — |tokens|
    rows per doc, the honest cost of span granularity — then a map-side-
    combinable count per digest and one equi-join back on the digest
    (AQE handles digest skew from pathological boilerplate). Only md5
    digests shuffle, never window text. No Python anywhere.
    """
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != ""
    )
    base = docs.select(F.col(id_col), toks.alias("_t"))
    win = base.select(
        id_col,
        F.explode(
            F.when(
                F.size("_t") >= w,
                F.transform(
                    F.sequence(F.lit(1), F.size("_t") - F.lit(w - 1)),
                    lambda i: F.md5(F.concat_ws(" ", F.slice(F.col("_t"), i, w))),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("h"),
    )
    cnt = win.groupBy("h").agg(F.count(F.lit(1)).alias("_c"))
    per = (
        win.join(cnt, on="h")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum(F.when(F.col("_c") >= 2, 1).otherwise(0)).alias("n_dup_windows"),
        )
        .withColumn(
            "dup_fraction",
            F.round(
                F.col("n_dup_windows").cast("double")
                / F.col("n_windows").cast("double"),
                6,
            ),
        )
    )
    return (
        docs.select(id_col)
        .join(per, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce("n_windows", F.lit(0)).cast("long").alias("n_windows"),
            F.coalesce("n_dup_windows", F.lit(0)).cast("long").alias("n_dup_windows"),
            F.coalesce("dup_fraction", F.lit(0.0)).alias("dup_fraction"),
        )
    )


def dedup_rate_per_source(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(source, n_docs, n_removed, dedup_rate) — per-source share of
    documents that exact keep-min-id dedup would REMOVE (their content
    hash has a smaller-id twin anywhere in the corpus).

    The dataset-card rollup read next to :func:`cross_source_duplicates`:
    a source with a high removal rate is mostly mirrored/boilerplate
    content and a candidate for bulk action before any pairwise review.
    Rides :func:`exact_duplicates`' digest aggregation plus one digest
    equi-join back and a per-source count — digests shuffle, text never.
    """
    fp = docs.select("doc_id", "source", F.md5(F.col(text_col)).alias("fp"))
    keep = fp.groupBy("fp").agg(F.min("doc_id").alias("keep_id"))
    return (
        fp.join(keep, on="fp")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(F.col("doc_id") != F.col("keep_id"), 1).otherwise(0)
            ).cast("long").alias("n_removed"),
        )
        .withColumn(
            "dedup_rate",
            F.round(
                F.col("n_removed").cast("double") / F.col("n_docs").cast("double"), 6
            ),
        )
    )


def remove_duplicated_spans(
    docs: DataFrame, w: int = 8, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, clean_text, n_tokens, n_tokens_removed) — the removal
    stage of span-level dedup: every token covered by ANY duplicated
    ``w``-token window (same corpus-wide recurrence rule as
    :func:`duplicated_spans`) is cut, and the survivors rejoin in
    original order. This is ExactSubstr's edit applied at window
    granularity; whitespace normalizes to single spaces in the output.

    Same plan spine as detection — explode to (doc, window-digest),
    map-side digest count, digest equi-join — plus a covered-position
    explode (w rows per duplicated window) and one distinct before the
    keep-filter; only digests and integer positions shuffle.
    """
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != ""
    )
    base = docs.select(F.col(id_col), toks.alias("_t"))
    win = base.select(
        id_col,
        F.posexplode(
            F.when(
                F.size("_t") >= w,
                F.transform(
                    F.sequence(F.lit(1), F.size("_t") - F.lit(w - 1)),
                    lambda i: F.md5(F.concat_ws(" ", F.slice(F.col("_t"), i, w))),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("i0", "h"),
    )
    cnt = win.groupBy("h").agg(F.count(F.lit(1)).alias("_c"))
    # positions covered by duplicated windows (i0 is 0-based window start)
    covered = (
        win.join(cnt.filter(F.col("_c") >= 2), on="h")
        .select(
            id_col,
            F.explode(
                F.sequence(F.col("i0") + 1, F.col("i0") + w)
            ).alias("pos"),
        )
        .distinct()
    )
    pos = base.select(
        id_col, F.posexplode("_t").alias("p0", "tok")
    ).select(id_col, (F.col("p0") + 1).alias("pos"), "tok")
    kept = pos.join(covered, on=[id_col, "pos"], how="left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("_kept"),
    )
    return (
        base.select(id_col, F.size("_t").alias("n_tokens"))
        .join(rebuilt, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            (F.col("n_tokens") - F.coalesce(F.col("_kept"), F.lit(0)))
            .cast("long")
            .alias("n_tokens_removed"),
        )
    )


def minhash_jaccard_estimate(
    docs: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """(doc_a, doc_b, est_jaccard) — LSH candidate pairs with the
    MinHash ESTIMATE of their Jaccard similarity: the fraction of
    signature components on which the two documents agree (an unbiased
    estimator of J with variance J(1−J)/num_hashes).

    The scale substitute for exact verification: at 100 TB the exact
    n-gram Jaccard join re-shingles both sides of every candidate pair,
    while the estimate reads two already-computed fixed-width signatures
    — candidates join on the band bucket exactly like
    :func:`minhash_lsh_candidates`, then one zip_with/aggregate per pair
    scores agreement. Use the exact verify only for pairs near the
    decision threshold.
    """
    sig = minhash_signatures(docs, num_hashes=num_hashes, n=n, text_col=text_col)
    cand = minhash_lsh_candidates(
        docs, num_hashes=num_hashes, bands=bands, n=n, text_col=text_col
    )
    agree = F.aggregate(
        F.zip_with(
            F.col("_sa"), F.col("_sb"),
            lambda a, b: F.when(a == b, 1).otherwise(0),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return (
        cand.join(
            sig.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("_sa")),
            on="doc_a",
        )
        .join(
            sig.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("_sb")),
            on="doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            (agree.cast("double") / F.lit(float(num_hashes))).alias("est_jaccard"),
        )
    )


def containment_pairs(
    docs: DataFrame, n: int = 3, threshold: float = 0.8, text_col: str = "text"
) -> DataFrame:
    """(doc_inner, doc_outer, containment) — ASYMMETRIC near-duplication:
    pairs where the fraction of doc_inner's n-gram shingles that also
    appear in doc_outer is >= threshold (Broder's containment,
    |A∩B|/|A|). Catches what symmetric Jaccard structurally cannot: a
    short document quoted or excerpted inside a much longer one scores
    containment ~1 while its Jaccard stays near |A|/|B| ~ 0 — the
    quote/mirror/boilerplate-inclusion case in corpus dedup.

    Same inverted-index self-join shape as :func:`ngram_jaccard_pairs`
    (shingle equi-join, never all-pairs); both directions of every
    intersecting pair are evaluated and only the qualifying direction(s)
    emit. The score is one exact-integer division — bit-identical across
    engines, no rounding.
    """
    sh = shingles(docs, n=n, text_col=text_col).persist()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("doc_id").alias("doc_inner"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_outer"), "shingle")
    inter = (
        a.join(b, on="shingle")
        .filter(F.col("doc_inner") != F.col("doc_outer"))
        .groupBy("doc_inner", "doc_outer")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(
            sizes.withColumnRenamed("doc_id", "doc_inner").withColumnRenamed("sz", "sz_in"),
            on="doc_inner",
        )
        .select(
            "doc_inner",
            "doc_outer",
            (F.col("inter").cast("double") / F.col("sz_in")).alias("containment"),
        )
        .filter(F.col("containment") >= threshold)
    )
    result = out.localCheckpoint(eager=True)
    sh.unpersist()
    return result


def _jaccard_pairs_between(
    sh_a: DataFrame,
    sh_b: DataFrame,
    threshold: float,
    candidates: DataFrame = None,
) -> DataFrame:
    """(doc_a, doc_b, jaccard) across two DISTINCT shingle frames
    ``(doc_a, shingle)`` / ``(doc_b, shingle)`` — the cross-corpus form
    of :func:`ngram_jaccard_pairs`'s inverted-index join. When
    ``candidates`` (doc_a, doc_b) is given, only those pairs are
    verified (the LSH scale path: the shingle join still computes
    intersections shingle-keyed, then a semi-join keeps candidate rows
    before sizes attach)."""
    sizes_a = sh_a.groupBy("doc_a").agg(F.count(F.lit(1)).alias("_sza"))
    sizes_b = sh_b.groupBy("doc_b").agg(F.count(F.lit(1)).alias("_szb"))
    inter = (
        sh_a.join(sh_b, on="shingle")
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("_i"))
    )
    if candidates is not None:
        inter = inter.join(candidates, on=["doc_a", "doc_b"], how="left_semi")
    return (
        inter.join(sizes_a, on="doc_a")
        .join(sizes_b, on="doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("_i").cast("double")
                / (F.col("_sza") + F.col("_szb") - F.col("_i"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def incremental_dedup(
    new_docs: DataFrame,
    corpus: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    method: str = "exact",
    num_hashes: int = 16,
    bands: int = 4,
    max_iterations: int = 50,
) -> DataFrame:
    """(doc_id, dup_of_corpus, keep) for every NEW document — the
    daily-ingest shape: a crawl increment deduplicates against the
    already-curated CORPUS first, then within itself.

    - ``dup_of_corpus``: the new document's n-gram Jaccard against some
      corpus document reaches ``threshold`` — it adds nothing, drop it.
    - ``keep``: not a corpus duplicate AND the canonical (min doc_id)
      member of its near-dup cluster among the corpus-surviving new
      documents (resolution runs on survivors only, so a corpus-dup
      never bridges two otherwise-distinct new clusters).

    ``method="exact"`` generates pairs with the inverted-index shingle
    join (the oracle path); ``method="lsh"`` generates candidates with
    the banded MinHash join on BOTH sides — verification is exact
    Jaccard either way, so LSH can only MISS pairs, never invent them.
    At 100 TB the increment is small and the corpus huge: every join
    here is keyed by shingle / band bucket (never all-pairs), the
    corpus side reduces to its shingle or signature projection (which a
    production pipeline persists between ingests), and the resolution
    WCC touches only the increment's candidate-pair graph.
    """
    if method not in ("exact", "lsh"):
        raise ValueError(f"method must be 'exact' or 'lsh', got {method!r}")
    from kafka_graphs_spark.graph import Graph
    from kafka_graphs_spark.library.components import connected_components

    sh_new = shingles(new_docs, n=n, text_col=text_col)
    sh_old = shingles(corpus, n=n, text_col=text_col)
    a_new = sh_new.select(F.col("doc_id").alias("doc_a"), "shingle")
    b_old = sh_old.select(F.col("doc_id").alias("doc_b"), "shingle")

    cand_cross = cand_new = None
    if method == "lsh":
        rows_per_band = num_hashes // bands

        def banded(docs_df):
            sig = minhash_signatures(
                docs_df, num_hashes=num_hashes, n=n, text_col=text_col
            )
            return sig.select(
                "doc_id",
                F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"),
                F.array_join(
                    F.slice(
                        "sig", F.col("band") * rows_per_band + 1, rows_per_band
                    ),
                    "|",
                ).alias("bucket"),
            )

        bn, bo = banded(new_docs), banded(corpus)
        cand_cross = (
            bn.select(F.col("doc_id").alias("doc_a"), "band", "bucket")
            .join(
                bo.select(F.col("doc_id").alias("doc_b"), "band", "bucket"),
                on=["band", "bucket"],
            )
            .select("doc_a", "doc_b")
            .distinct()
        )
        cand_new = minhash_lsh_candidates(
            new_docs, num_hashes=num_hashes, bands=bands, n=n, text_col=text_col
        )

    dup_ids = (
        _jaccard_pairs_between(a_new, b_old, threshold, cand_cross)
        .select(F.col("doc_a").alias("doc_id"))
        .distinct()
    )
    surv_sh = sh_new.join(dup_ids, on="doc_id", how="left_anti")
    new_pairs = _jaccard_pairs_between(
        surv_sh.select(F.col("doc_id").alias("doc_a"), "shingle"),
        surv_sh.select(F.col("doc_id").alias("doc_b"), "shingle"),
        threshold,
        cand_new,
    ).filter(F.col("doc_a") < F.col("doc_b"))
    comp = connected_components(
        Graph.from_edges(
            new_pairs.select(
                F.col("doc_a").alias("src"),
                F.col("doc_b").alias("dst"),
                F.lit(1.0).alias("value"),
            ),
            F.col("id"),
        ),
        max_iterations=max_iterations,
    )
    return (
        new_docs.select("doc_id")
        .join(dup_ids.withColumn("_dup", F.lit(True)), on="doc_id", how="left")
        .join(comp.withColumnRenamed("id", "doc_id"), on="doc_id", how="left")
        .select(
            "doc_id",
            F.coalesce("_dup", F.lit(False)).alias("dup_of_corpus"),
            (
                ~F.coalesce("_dup", F.lit(False))
                & (
                    F.coalesce(F.col("value"), F.col("doc_id"))
                    == F.col("doc_id")
                )
            ).alias("keep"),
        )
    )
