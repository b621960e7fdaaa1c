"""Text analysis operators: tokenize, language-ID, quality, fingerprint.

All pure ``pyspark.sql.functions`` expressions — whole-stage-codegen'd
JVM-side, no Python in the hot path. Each op has a DuckDB-SQL twin
(``*_SQL`` helpers) used as the correctness oracle; keep both sides in
lock-step when editing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Deterministic tokenizer shared by every text op: lowercase, split on
# non-alphanumeric runs, drop empties.
TOKEN_SPLIT_RE = "[^a-z0-9]+"


def tokens(col: Column) -> Column:
    return F.filter(F.split(F.lower(col), TOKEN_SPLIT_RE), lambda x: x != "")


def tokens_sql(col: str) -> str:
    """DuckDB twin of ``tokens`` (oracle)."""
    return (
        f"list_filter(regexp_split_to_array(lower({col}), '{TOKEN_SPLIT_RE}'), x -> x <> '')"
    )


# Small fixed stopword sets per language for the lang-ID heuristic.
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it", "that", "for", "on", "as", "with"],
    "de": ["der", "die", "das", "und", "ist", "von", "zu", "mit", "den", "im", "ein", "eine"],
    "fr": ["le", "la", "les", "et", "des", "un", "une", "est", "dans", "pour", "sur", "que"],
    "es": ["el", "los", "las", "y", "que", "en", "un", "una", "es", "por", "con", "para"],
}


def token_count(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens) — whitespace/punct tokenization count."""
    return docs.select("doc_id", F.size(tokens(F.col(text_col))).alias("n_tokens"))


# BPE-ish subword pattern: letter runs, digit runs, single other glyphs —
# a simplified GPT-2-style pre-tokenization (no lookaheads, so the Java
# and RE2 regex dialects agree and the DuckDB oracle is exact).
SUBWORD_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def subword_count(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_subwords) — BPE-style pre-token count.

    Counts the units a byte-pair tokenizer starts from (letter runs,
    digit runs, individual punctuation glyphs) — the standard cheap proxy
    for LLM token cost when the real tokenizer is unavailable. Pure JVM
    regexp count; no Python.
    """
    return docs.select(
        "doc_id",
        F.regexp_count(F.lower(F.col(text_col)), F.lit(SUBWORD_RE)).alias("n_subwords"),
    )


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, lang_pred) — stopword-hit argmax heuristic.

    Scores each language by the number of tokens in its stopword set;
    predicts the argmax (ties broken toward the lexicographically greatest
    language code), 'und' when no stopword hits at all. Deterministic;
    mirrored 1:1 by the oracle SQL in __spark_entry__.
    """
    toks = tokens(F.col(text_col))

    def _score(lang):
        words = STOPWORDS[lang]
        return F.size(F.filter(toks, lambda t: t.isin(words))).alias(f"s_{lang}")

    scores = [_score(lang) for lang in sorted(STOPWORDS)]
    scored = docs.select("doc_id", *scores)
    # argmax by (score, lang) — struct comparison is lexicographic
    pairs = F.array(
        *[F.struct(F.col(f"s_{lang}").alias("s"), F.lit(lang).alias("l")) for lang in sorted(STOPWORDS)]
    )
    best = F.array_max(pairs)
    return scored.select(
        "doc_id",
        F.when(best.s > 0, best.l).otherwise(F.lit("und")).alias("lang_pred"),
    )


def quality_exprs(text_col: str = "text"):
    """(n_tokens, stop_ratio, mean_token_len, score) as COLUMN
    expressions — the building blocks of :func:`quality_score`, exposed
    so compositions (e.g. per-domain quality profiles) can compute the
    score in the SAME single pass as their other per-row columns instead
    of joining two projections of the corpus."""
    toks = tokens(F.col(text_col))
    en = STOPWORDS["en"]
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(en)))
    mean_len = F.when(
        n_tokens > 0,
        F.aggregate(toks, F.lit(0).cast("double"), lambda acc, t: acc + F.length(t)) / n_tokens,
    ).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, n_stop.cast("double") / n_tokens).otherwise(F.lit(0.0))
    score = (
        F.when((stop_ratio >= 0.01) & (stop_ratio <= 0.5), F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when((mean_len >= 3.0) & (mean_len <= 10.0), F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when((n_tokens >= 10) & (n_tokens <= 100000), F.lit(0.3)).otherwise(F.lit(0.0))
    )
    return n_tokens, stop_ratio, mean_len, score


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, stop_ratio, mean_token_len, score).

    score = 0.4·stopword-ratio-band + 0.3·token-length-band + 0.3·size-band —
    a deterministic heuristic in the spirit of C4/Gopher quality rules.
    """
    n_tokens, stop_ratio, mean_len, score = quality_exprs(text_col)
    # raw doubles: ratios of exact ints are bit-identical across engines
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        stop_ratio.alias("stop_ratio"),
        mean_len.alias("mean_token_len"),
        score.alias("score"),
    )


def normalize_text(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, norm_text) — canonical text form.

    Lowercase, punctuation/whitespace runs collapsed to single spaces,
    edges trimmed — the normalization every downstream op (dedup,
    fingerprint, vocab) implicitly keys on, exposed as its own transform.
    """
    return docs.select(
        "doc_id", F.array_join(tokens(F.col(text_col)), " ").alias("norm_text")
    )


def vocabulary(docs: DataFrame, min_count: int = 1, text_col: str = "text") -> DataFrame:
    """(token, freq, doc_freq, token_id) — corpus vocabulary with ranked ids.

    token_id ranks by (freq desc, token asc) — the standard frequency-
    ordered vocab a tokenizer trainer starts from. The explode/groupBy is
    map-side combined; the final ranking window runs over the AGGREGATED
    vocab (distinct tokens — sublinear in corpus size), so the unpartitioned
    window is bounded, not corpus-scale.
    """
    from pyspark.sql.window import Window

    tok = docs.select("doc_id", F.explode(tokens(F.col(text_col))).alias("token"))
    agg = tok.groupBy("token").agg(
        F.count(F.lit(1)).alias("freq"),
        F.count_distinct("doc_id").alias("doc_freq"),
    )
    w = Window.orderBy(F.desc("freq"), F.asc("token"))
    return (
        agg.filter(F.col("freq") >= min_count)
        .withColumn("token_id", F.row_number().over(w).cast("long"))
    )


def tfidf_keywords(docs: DataFrame, k: int = 3, text_col: str = "text") -> DataFrame:
    """(doc_id, token, score, rank) — top-k keywords per document.

    score = tf · (N/df): term frequency weighted by inverse document
    frequency in RATIONAL form (no log), so both engines evaluate the
    identical sequence of exactly-rounded IEEE ops and the oracle is
    bit-exact. Ranking ties break by token asc. All shuffles key on
    doc_id/token with map-side partial aggregation.
    """
    from pyspark.sql.window import Window

    tok = docs.select("doc_id", F.explode(tokens(F.col(text_col))).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tok.groupBy("token").agg(F.count_distinct("doc_id").alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    scored = (
        tf.join(F.broadcast(df_), "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            (
                F.col("tf").cast("double")
                * (F.col("n").cast("double") / F.col("df").cast("double"))
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def bigram_counts(docs: DataFrame, min_count: int = 2, text_col: str = "text") -> DataFrame:
    """(bigram, freq) — corpus-wide adjacent-token pair counts.

    Phrase mining / tokenizer-merge statistics. Bigrams are built
    JVM-side by zipping the token array with its own tail — no Python,
    no self-join; the groupBy partial-aggregates map-side.
    """
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    pairs = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select(F.explode(pairs).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") >= min_count)
    )


def repetition_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, dup_unigram_frac, dup_bigram_frac,
    dup_trigram_frac, top_bigram_frac) — within-document repetition
    signals in the spirit of the Gopher repetition rules (machine-
    generated and boilerplate text shows high duplicate-n-gram mass).

    dup_k_frac = 1 − distinct(k-grams)/total(k-grams) (0 when none);
    top_bigram_frac = occurrences of the most frequent bigram / total
    bigrams. The n-gram arrays and distinct counts are per-row JVM
    expressions (linear per document); the bigram mode is an explode +
    doc-keyed groupBy — map-side combined, shuffles ids and counts only.
    """
    toks = tokens(F.col(text_col))
    n = F.size(toks)

    def ngrams(k: int) -> Column:
        return F.when(
            n >= k,
            F.transform(
                F.sequence(F.lit(1), n - (k - 1)),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(toks, i + j) for j in range(k)]
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    def dup_frac(arr: Column) -> Column:
        sz = F.size(arr)
        return F.when(
            sz > 0,
            F.lit(1.0) - F.size(F.array_distinct(arr)).cast("double") / sz,
        ).otherwise(F.lit(0.0))

    bg = ngrams(2)
    base = docs.select(
        "doc_id",
        n.alias("n_tokens"),
        dup_frac(toks).alias("dup_unigram_frac"),
        dup_frac(bg).alias("dup_bigram_frac"),
        dup_frac(ngrams(3)).alias("dup_trigram_frac"),
        F.size(bg).alias("_n_bigrams"),
    )
    top = (
        docs.select("doc_id", F.explode(bg).alias("b"))
        .groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("_m"))
    )
    return (
        base.join(top, on="doc_id", how="left")
        .select(
            "doc_id",
            "n_tokens",
            "dup_unigram_frac",
            "dup_bigram_frac",
            "dup_trigram_frac",
            F.when(
                F.col("_n_bigrams") > 0,
                F.coalesce(F.col("_m"), F.lit(0)).cast("double") / F.col("_n_bigrams"),
            )
            .otherwise(F.lit(0.0))
            .alias("top_bigram_frac"),
        )
    )


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, fp) — md5 of the normalized token stream.

    Canonical document fingerprint: tokenize, re-join with single spaces —
    robust to whitespace/punctuation/case variance.
    """
    normalized = F.array_join(tokens(F.col(text_col)), " ")
    return docs.select("doc_id", F.md5(normalized).alias("fp"))


# PII patterns — lookaround-free so the Java (Spark) and RE2 (DuckDB
# oracle) dialects agree character-for-character. Conservative by design:
# pattern-based PII detection is a coverage floor, not a guarantee.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+\d[\d() -]{7,14}\d",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
}


def pii_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_email, n_ipv4, n_phone, n_ssn, n_pii) — per-doc PII hits.

    Pure JVM ``regexp_count`` per pattern — codegen'd, no Python, narrow
    (no shuffle); the counts feed curation policy (drop or redact docs
    above a PII threshold).
    """
    cols = [
        F.regexp_count(F.col(text_col), F.lit(p)).alias(f"n_{name}")
        for name, p in PII_PATTERNS.items()
    ]
    out = docs.select("doc_id", *cols)
    total = None
    for name in PII_PATTERNS:
        c = F.col(f"n_{name}")
        total = c if total is None else total + c
    return out.withColumn("n_pii", total)


def pii_redact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, redacted) — text with each PII class replaced by a tag.

    Chained ``regexp_replace`` (one pass per class, all JVM-side).
    Email runs FIRST so the phone pattern cannot eat digit runs inside
    addresses; order is part of the contract and mirrored in the oracle.
    """
    col = F.col(text_col)
    for name, p in PII_PATTERNS.items():
        col = F.regexp_replace(col, F.lit(p), F.lit(f"<{name.upper()}>"))
    return docs.select("doc_id", col.alias("redacted"))


def source_profile(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-source corpus profile: doc count, token sum/mean, exact median.

    One map-side-combinable aggregate for the counts/sums plus Spark's
    exact interpolated ``median`` for the token-length distribution
    (matches DuckDB ``median`` bit-for-bit on integer inputs). Output is
    |sources| rows — the dataset-card table for a training mix.
    """
    n = F.size(tokens(F.col(text_col)))
    return (
        docs.select("source", n.alias("_n"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_n").alias("total_tokens"),
            F.round(F.avg("_n"), 6).alias("mean_tokens"),
            F.median("_n").alias("median_tokens"),
        )
    )


def sketch_profile(docs: DataFrame, text_col: str = "text", rsd: float = 0.05) -> DataFrame:
    """Per-source sketch profile: approximate distinct vocabulary +
    approximate token-length quantiles.

    The 100 TB counterpart of :func:`source_profile`: exact
    ``count(DISTINCT token)`` needs a full shuffle of every token, and
    exact medians need a sort — at corpus scale both are replaced by
    one-pass mergeable sketches (HyperLogLog++ via
    ``approx_count_distinct``, KLL via ``percentile_approx``), which
    partial-aggregate map-side and merge in O(sketch size). Accuracy is
    pinned by the driver invariant query (``doc_sketch_inv``): approx
    within the advertised rsd band of exact on the test corpus.

    Returns (source, n_docs, approx_vocab, approx_median_tokens,
    approx_p90_tokens).
    """
    vocab = (
        docs.select("source", F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("source")
        .agg(F.approx_count_distinct("token", rsd).alias("approx_vocab"))
    )
    lengths = (
        docs.select("source", F.size(tokens(F.col(text_col))).alias("n"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.percentile_approx("n", 0.5, 10000).alias("approx_median_tokens"),
            F.percentile_approx("n", 0.9, 10000).alias("approx_p90_tokens"),
        )
    )
    return lengths.join(vocab, on="source").select(
        "source", "n_docs", "approx_vocab", "approx_median_tokens", "approx_p90_tokens"
    )


def chunk_text(
    docs: DataFrame,
    size: int,
    overlap: int = 0,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, chunk_id, chunk) — fixed-size character windows with
    overlap, the RAG/embedding chunking step.

    Chunks start every ``size − overlap`` characters; the last chunk may
    be short; empty/null texts produce no rows. Pure JVM expressions
    (sequence → transform → posexplode → substring): narrow, no shuffle,
    codegen'd — a 100 TB corpus chunks at scan speed. Deterministic, so
    chunk ids are stable join keys for downstream embeddings.
    """
    if size <= 0 or overlap < 0 or overlap >= size:
        raise ValueError("need size > 0 and 0 <= overlap < size")
    stride = size - overlap
    n = F.length(F.col(text_col))
    starts = F.sequence(
        F.lit(1), F.greatest(n - F.lit(size) + F.lit(stride), F.lit(1)), F.lit(stride)
    )
    return (
        docs.filter(n > 0)
        .select(
            "doc_id",
            F.posexplode(starts).alias("chunk_id", "_start"),
            F.col(text_col).alias("_t"),
        )
        .select(
            "doc_id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.substring(F.col("_t"), F.col("_start"), size).alias("chunk"),
        )
    )


def unigram_logprob(
    docs: DataFrame, text_col: str = "text", broadcast_vocab: bool = True
) -> DataFrame:
    """(doc_id, n_tokens, avg_neg_logprob) — corpus-unigram surprisal per
    document: mean of −ln(count(token)/total) over the document's tokens.

    The classic perplexity proxy for quality filtering (a real LM is a
    model artifact; the unigram bound is computable in-engine and ranks
    gibberish/boilerplate the same direction). Two aggregations: the
    unigram table (map-side combined) and the per-document mean.
    Everything stays in codegen — no UDFs. Empty documents score NULL.

    ``broadcast_vocab`` (default True) broadcasts the frequency table
    into the scoring join — right whenever the vocabulary fits an
    executor (the usual case). A web-scale raw vocabulary (every typo is
    a token) can reach 10⁸+ rows: pass False to fall back to a shuffled
    equi-join on the token key and let AQE pick the strategy.
    """
    toks = docs.select(
        "doc_id", F.explode(tokens(F.col(text_col))).alias("tok")
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    # The corpus-total token count rides the plan as a broadcast one-row
    # cross join instead of an eager collect + persist: the whole function
    # stays lazy, Spark's ReuseExchange computes the freq aggregation once
    # for both the total and the scoring join, and no cache outlives the
    # call (the old persist() pinned the vocabulary table forever).
    total = freq.agg(
        F.greatest(F.sum("c"), F.lit(1).cast("long")).alias("_t")
    )
    freq_side = F.broadcast(freq) if broadcast_vocab else freq
    scored = toks.join(freq_side, on="tok").crossJoin(F.broadcast(total)).select(
        "doc_id",
        (-F.log(F.col("c").cast("double") / F.col("_t").cast("double"))).alias("nlp"),
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.avg("nlp").alias("avg_neg_logprob"),
    )
    return docs.select("doc_id").join(per_doc, on="doc_id", how="left").select(
        "doc_id",
        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        "avg_neg_logprob",
    )


def line_dedup(
    docs: DataFrame,
    min_docs: int = 2,
    sep: str = "\n",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, text, n_kept, n_removed) — global line-level deduplication:
    drop every line that occurs (verbatim) in ≥ ``min_docs`` distinct
    documents, preserving the order of the surviving lines.

    The C4/RefinedWeb boilerplate-removal staple (nav bars, cookie
    banners, license headers repeat across pages; their mass corrupts LM
    training). ``sep`` is a literal separator (default newline; pass
    ``" "`` for token-granularity stop-token removal on single-line
    corpora).

    Scale shape: one posexplode, a map-side-combined distinct-doc count
    per line, a left_anti equi-join on the line text, and one groupBy
    back onto the document key — no broadcast of the frequent set (it can
    be huge at corpus scale), no driver materialization.
    """
    import re as _re

    parts = F.split(F.col(text_col), _re.escape(sep), -1)
    lines = docs.select(
        "doc_id", F.posexplode(parts).alias("pos", "line")
    )
    frequent = (
        lines.groupBy("line")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("line")
    )
    kept = lines.join(frequent, on="line", how="left_anti")
    reassembled = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            sep,
        ).alias("_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    totals = lines.groupBy("doc_id").agg(F.count(F.lit(1)).alias("_total"))
    return (
        docs.select("doc_id")
        .join(totals, on="doc_id", how="left")
        .join(reassembled, on="doc_id", how="left")
        .select(
            "doc_id",
            F.coalesce("_text", F.lit("")).alias("text"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            (
                F.coalesce("_total", F.lit(0)) - F.coalesce("n_kept", F.lit(0))
            ).alias("n_removed"),
        )
    )


def bigram_logprob(
    docs: DataFrame,
    k_smooth: float = 1.0,
    text_col: str = "text",
    broadcast_model: bool = True,
) -> DataFrame:
    """(doc_id, n_bigrams, avg_neg_logprob) — add-k-smoothed corpus-bigram
    surprisal per document: mean of −ln p(w_i | w_{i−1}) with
    p(w2|w1) = (c(w1,w2) + k) / (c(w1,·) + k·V).

    The next step up from :func:`unigram_logprob` as an in-engine
    perplexity proxy: order-sensitive, so shuffled/boilerplate text
    scores worse than fluent text with the same unigram profile. The
    bigram model is two map-side-combined aggregations (pair counts,
    prefix marginals); scoring is one equi-join on the pair key.
    Documents with < 2 tokens score NULL. ``broadcast_model`` as in
    :func:`unigram_logprob` (the bigram table is vocabulary²-bounded but
    Zipf-sparse; pass False at web scale).
    """
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    pairs = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    big = docs.select(
        "doc_id", F.explode(pairs).alias("bg")
    ).select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))

    c2 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    # Vocabulary size rides the plan as a broadcast one-row cross join
    # (lazy, leak-free) instead of the old eager collect + c2.persist()
    # that pinned the full corpus bigram table after the call returned;
    # ReuseExchange computes the c2 aggregation once for c1 and the join.
    vocab = docs.select(F.explode(toks).alias("tok")).agg(
        F.greatest(F.countDistinct("tok"), F.lit(1).cast("long")).alias("_v")
    )
    model = c2.join(c1, on="w1").crossJoin(F.broadcast(vocab)).select(
        "w1",
        "w2",
        (
            -F.log(
                (F.col("c2") + F.lit(k_smooth))
                / (F.col("c1") + F.lit(k_smooth) * F.col("_v"))
            )
        ).alias("nlp"),
    )
    model_side = F.broadcast(model) if broadcast_model else model
    per_doc = (
        big.join(model_side, on=["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.avg("nlp").alias("avg_neg_logprob"),
        )
    )
    return docs.select("doc_id").join(per_doc, on="doc_id", how="left").select(
        "doc_id",
        F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
        "avg_neg_logprob",
    )


#: default weights for :func:`quality_score_linear` — hand-set to agree in
#: direction with the band heuristic in :func:`quality_score` (positive
#: stopword mass, mid-range token length, log-size)
QUALITY_LINEAR_WEIGHTS = {
    "intercept": -3.0,
    "stop_ratio": 6.0,
    "mean_token_len": 0.25,
    "log_n_tokens": 0.5,
}


def quality_score_linear(
    docs: DataFrame,
    weights: dict | None = None,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, logit, prob) — model-based quality scoring: a linear
    classifier over the in-engine feature set (stopword ratio, mean token
    length, log token count) squashed through a sigmoid.

    The plumbing layer for fastText/LR-style quality classifiers (the
    standard curation gate beside heuristics): weights are data, the
    featurize→dot→sigmoid pipeline is pure codegen'd expressions — swap
    in trained coefficients and the same plan scores 100 TB at scan
    speed. Default weights mimic the :func:`quality_score` band
    heuristic's direction.
    """
    w = dict(QUALITY_LINEAR_WEIGHTS)
    if weights:
        w.update(weights)
    toks = tokens(F.col(text_col))
    n_tokens = F.size(toks)
    en = STOPWORDS["en"]
    n_stop = F.size(F.filter(toks, lambda t: t.isin(en)))
    stop_ratio = F.when(
        n_tokens > 0, n_stop.cast("double") / n_tokens
    ).otherwise(F.lit(0.0))
    mean_len = F.when(
        n_tokens > 0,
        F.aggregate(toks, F.lit(0).cast("double"), lambda acc, t: acc + F.length(t))
        / n_tokens,
    ).otherwise(F.lit(0.0))
    logit = (
        F.lit(float(w["intercept"]))
        + F.lit(float(w["stop_ratio"])) * stop_ratio
        + F.lit(float(w["mean_token_len"])) * mean_len
        + F.lit(float(w["log_n_tokens"])) * F.log1p(n_tokens.cast("double"))
    )
    return docs.select(
        "doc_id",
        logit.alias("logit"),
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))).alias("prob"),
    )


def source_divergence(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(source, n_tokens, vocab_size, kl) — KL divergence of each source's
    unigram token distribution from the whole-corpus distribution:
    ``KL(P_s ‖ P) = Σ_t P_s(t)·ln(P_s(t)/P(t))``.

    The distribution-drift signal a mixture designer reads before setting
    sampling rates: a source far from the corpus center (high KL) is
    stylistically distinct — over- or under-sampling it shifts the blend
    most. Every token of a source exists in the corpus, so no zero-mass
    terms arise and the sum is finite.

    100 TB shape: one explode to (source, token) rows, then two map-side-
    combinable counts (per source×token, per token) and an equi-join on
    the token key — counts shuffle, text does not. The KL sum is a float
    accumulation, rounded to 6 dp per repo precedent for order-dependent
    sums. All codegen, no Python.
    """
    tok = docs.select("source", F.explode(tokens(F.col(text_col))).alias("t"))
    sc = tok.groupBy("source", "t").agg(F.count(F.lit(1)).alias("c"))
    st = sc.groupBy("source").agg(F.sum("c").alias("n"))
    ct = sc.groupBy("t").agg(F.sum("c").alias("ctot"))
    n_total = sc.agg(F.sum("c").alias("grand"))
    ps = F.col("c").cast("double") / F.col("n").cast("double")
    p = F.col("ctot").cast("double") / F.col("grand").cast("double")
    return (
        sc.join(st, on="source")
        .join(ct, on="t")
        .crossJoin(F.broadcast(n_total))
        .groupBy("source")
        .agg(
            F.max("n").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).alias("vocab_size"),
            F.round(F.sum(ps * F.log(ps / p)), 6).alias("kl"),
        )
    )


def zipf_fit(docs: DataFrame, min_count: int = 1, text_col: str = "text") -> DataFrame:
    """One row (n_types, slope, intercept, r2) — least-squares fit of
    ``ln(freq) ~ ln(rank)`` over the corpus vocabulary (Zipf's law has
    slope ≈ −1 for natural language).

    The corpus-health card metric next to :func:`source_profile`: a
    slope far from −1 or a poor fit flags synthetic, templated, or
    truncated-vocabulary text. Closed-form regression over the
    AGGREGATED vocabulary (sums of ln terms — sublinear in corpus
    size), rounded to 6 dp per the order-dependent-sum precedent.
    """
    v = vocabulary(docs, min_count=min_count, text_col=text_col).select(
        F.log(F.col("token_id").cast("double")).alias("x"),
        F.log(F.col("freq").cast("double")).alias("y"),
    )
    agg = v.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    slope = num / den
    return agg.select(
        F.col("n").cast("long").alias("n_types"),
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias(
            "intercept"
        ),
        F.round((num * num) / (den * deny), 6).alias("r2"),
    )


def tfidf_cosine_pairs(
    docs: DataFrame, threshold: float = 0.5, text_col: str = "text"
) -> DataFrame:
    """(doc_a, doc_b, cos) — document pairs whose TF-IDF vectors have
    cosine ≥ threshold (doc_a < doc_b). The sparse-vector dual of the
    embedding near-dup path: retrieval-grade textual similarity with no
    embedding model, using the same rational ``tf · N/df`` weights as
    :func:`tfidf_keywords`.

    100 TB shape: candidate pairs come from the TOKEN inverted index
    (equi-join on token — only docs sharing a term ever pair, never
    all-pairs), partial dot products combine map-side per pair, and the
    norm table joins once per side. Stopword-ish high-df terms dominate
    the index; at web scale prune them first (drop df > x·N) — the same
    knob every sparse retrieval system exposes. Cosine is rounded to 6 dp
    (order-dependent float sums).
    """
    tok = docs.select("doc_id", F.explode(tokens(F.col(text_col))).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tok.groupBy("token").agg(F.count_distinct("doc_id").alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    w = (
        tf.join(df_, "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            (
                F.col("tf").cast("double")
                * (F.col("n").cast("double") / F.col("df").cast("double"))
            ).alias("w"),
        )
    )
    norms = w.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm")
    )
    a = w.select(F.col("doc_id").alias("doc_a"), "token", F.col("w").alias("wa"))
    b = w.select(F.col("doc_id").alias("doc_b"), "token", F.col("w").alias("wb"))
    dots = (
        a.join(b, on="token")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    return (
        dots.join(
            norms.select(F.col("doc_id").alias("doc_a"), F.col("nrm").alias("na")),
            on="doc_a",
        )
        .join(
            norms.select(F.col("doc_id").alias("doc_b"), F.col("nrm").alias("nb")),
            on="doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def bm25_scores(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
) -> DataFrame:
    """(query_id, doc_id, score, rank) — top-``k`` documents per query
    under Okapi BM25 (Robertson/Spärck Jones):

    ``score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·len/avglen))``
    with ``idf = ln(1 + (N−df+0.5)/(df+0.5))``.

    The retrieval layer over the sparse stack (tfidf vectors / cosine
    pairs): candidates come from the token inverted index (docs sharing
    a query term — an equi-join, never a corpus scan per query), the
    per-(query, doc) partial sums combine map-side, and the final top-k
    is a per-query window over candidates only. Query side is tiny and
    broadcast. Scores round to 6 dp.
    """
    from pyspark.sql.window import Window

    tok = docs.select("doc_id", F.explode(tokens(F.col(text_col))).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tok.groupBy("token").agg(F.count_distinct("doc_id").alias("df"))
    lens = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = docs.agg(F.count(F.lit(1)).alias("n")).crossJoin(
        lens.agg(F.avg("dl").alias("avgdl"))
    )
    qt = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(tokens(F.col(query_text_col))).alias("token"),
    ).distinct()
    idf = F.log(
        F.lit(1.0)
        + (F.col("n").cast("double") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    norm_tf = (
        F.col("tf").cast("double") * (k1 + 1.0)
    ) / (
        F.col("tf").cast("double")
        + k1 * (1.0 - b + b * F.col("dl").cast("double") / F.col("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(qt), on="token")
        .join(F.broadcast(df_.join(F.broadcast(qt), on="token").select("token", "df").distinct()), on="token")
        .join(lens, on="doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(idf * norm_tf), 6).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


#: the eight high-frequency English words the Gopher quality rules test
#: for (Rae et al. 2021, "Scaling Language Models", §A1.1 rule 8)
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_filter(
    docs: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_ratio: float = 0.8,
    min_stopwords: int = 2,
    max_dup_bigram_frac: float = 0.2,
    max_dup_trigram_frac: float = 0.18,
    stopwords: list | None = None,
) -> DataFrame:
    """(doc_id, n_tokens, flag_word_count, flag_word_length,
    flag_symbol_ratio, flag_alpha_ratio, flag_stopwords,
    flag_repetition, keep) — the document-level Gopher quality rules
    (Rae et al. 2021, §A1.1) as one boolean profile per document:

    - word count within [min_words, max_words];
    - mean word length within [min_mean_word_len, max_mean_word_len];
    - symbol-to-word ratio ('#' and '...' / '…' marks) <= max_symbol_ratio;
    - fraction of words containing an alphabetic character >= min_alpha_ratio;
    - at least ``min_stopwords`` distinct stopwords present (default set
      is Gopher's eight; pass ``stopwords`` to match the corpus language
      — the rule is a proxy for "reads like natural language", so the
      set must come from the corpus's actual function words);
    - duplicate bi-/tri-gram mass under the repetition thresholds
      (the within-document subset of the Gopher repetition rules —
      the line-level rules need multi-line documents; see
      :func:`line_dedup` for the corpus-level line treatment).

    ``keep`` is the conjunction. Every signal is a per-row array/string
    expression — zero shuffles, so the filter runs at scan speed on any
    corpus size; all ratios are exact-integer divisions (bit-identical
    across engines). Rows are never dropped: emit flags, let callers
    filter, so rejected documents stay auditable.
    """
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    nd = n.cast("double")
    mean_len = F.when(
        n > 0,
        F.aggregate(toks, F.lit(0).cast("double"), lambda a, t: a + F.length(t)) / nd,
    ).otherwise(F.lit(0.0))
    txt = F.col(text_col)
    n_hash = F.length(txt) - F.length(F.replace(txt, F.lit("#"), F.lit("")))
    n_ell = (
        (F.length(txt) - F.length(F.replace(txt, F.lit("..."), F.lit("")))) / F.lit(3)
        + F.length(txt) - F.length(F.replace(txt, F.lit("…"), F.lit("")))
    )
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
    stop_set = GOPHER_STOPWORDS if stopwords is None else list(stopwords)
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(toks),
            F.array(*[F.lit(w) for w in stop_set]),
        )
    )

    def _ngrams(k: int):
        return F.when(
            n >= k,
            F.transform(
                F.sequence(F.lit(1), n - (k - 1)),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(toks, i + j) for j in range(k)]
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    def _dup_frac(arr):
        sz = F.size(arr)
        return F.when(
            sz > 0, F.lit(1.0) - F.size(F.array_distinct(arr)).cast("double") / sz
        ).otherwise(F.lit(0.0))

    f_words = (n >= min_words) & (n <= max_words)
    f_len = (mean_len >= min_mean_word_len) & (mean_len <= max_mean_word_len)
    f_sym = F.when(
        n > 0, (n_hash + n_ell) / nd <= F.lit(max_symbol_ratio)
    ).otherwise(F.lit(False))
    f_alpha = F.when(
        n > 0, n_alpha.cast("double") / nd >= F.lit(min_alpha_ratio)
    ).otherwise(F.lit(False))
    f_stop = n_stop >= F.lit(min_stopwords)
    f_rep = (_dup_frac(_ngrams(2)) <= F.lit(max_dup_bigram_frac)) & (
        _dup_frac(_ngrams(3)) <= F.lit(max_dup_trigram_frac)
    )
    return docs.select(
        "doc_id",
        n.alias("n_tokens"),
        f_words.alias("flag_word_count"),
        f_len.alias("flag_word_length"),
        f_sym.alias("flag_symbol_ratio"),
        f_alpha.alias("flag_alpha_ratio"),
        f_stop.alias("flag_stopwords"),
        f_rep.alias("flag_repetition"),
        (f_words & f_len & f_sym & f_alpha & f_stop & f_rep).alias("keep"),
    )


def perplexity_buckets(
    docs: DataFrame,
    n_buckets: int = 3,
    group_col: str = "source",
    text_col: str = "text",
    k_smooth: float = 1.0,
) -> DataFrame:
    """(doc_id, <group_col>, surprisal, bucket, band) — CCNet-style
    perplexity bucketing (Wenzek et al. 2020): rank every document
    within its group by in-engine LM surprisal (:func:`bigram_logprob`)
    and split each group into ``n_buckets`` equal-frequency buckets —
    band 'head' (most fluent) / 'middle' / 'tail'. Downstream pipelines
    keep head+middle or reweight by band.

    Surprisal is rounded to 6 dp before ranking (order-dependent float
    sum; repo precedent) and ties break on doc_id, so the bucketing is
    deterministic across engines and partitionings. Documents too short
    to score (< 2 tokens, NULL surprisal) sort last — always 'tail'.
    The ntile window partitions by group: each group's rank is
    independent, so the widest window is the largest single group, not
    the corpus.
    """
    from pyspark.sql.window import Window

    lm = bigram_logprob(docs, k_smooth=k_smooth, text_col=text_col)
    scored = (
        docs.select("doc_id", group_col)
        .join(lm, on="doc_id")
        .select(
            "doc_id",
            group_col,
            F.round(F.col("avg_neg_logprob"), 6).alias("surprisal"),
        )
    )
    w = Window.partitionBy(group_col).orderBy(
        F.asc_nulls_last("surprisal"), F.asc("doc_id")
    )
    b = F.ntile(n_buckets).over(w).cast("long")
    return scored.select(
        "doc_id",
        group_col,
        "surprisal",
        b.alias("bucket"),
        F.when(b == 1, F.lit("head"))
        .when(b == n_buckets, F.lit("tail"))
        .otherwise(F.lit("middle"))
        .alias("band"),
    )


#: ln(2) literal shared with the SQL oracles — nDCG discounts are
#: expressed as ln(2)/ln(rank+1) with this exact constant on both engines
LN2 = 0.6931471805599453


def retrieval_metrics(
    ranked: DataFrame,
    rels: DataFrame,
    k: int = 10,
) -> DataFrame:
    """(query_id, n_rel, hits, recall, dcg, idcg, ndcg) — the standard
    retrieval evaluation harness over any ranked run (``ranked``:
    query_id, doc_id, rank; ``rels``: query_id, doc_id — binary
    relevance): recall@k, DCG@k with the 1/log2(rank+1) discount, ideal
    DCG over min(k, n_rel) positions, and their ratio nDCG@k.

    Evaluates the retrieval stack's own output (BM25 / TF-IDF / RRF) —
    the loop a retrieval pipeline tunes against. Determinism: both DCG
    sums fold SORTED rank arrays left-to-right (per-query k-bounded), so
    the float accumulation order is fixed across engines and
    partitionings; queries absent from ``rels`` drop (no relevant
    documents means the metric is undefined, not zero), while queries
    WITH relevant documents that retrieved nothing in the top-k run
    keep a row scoring hits/recall/dcg/ndcg 0 — dropping them would
    inflate every macro-averaged metric.
    """
    r = ranked.filter(F.col("rank") <= k)
    flags = rels.select("query_id", "doc_id", F.lit(True).alias("_rel"))
    per_q = (
        r.join(flags, on=["query_id", "doc_id"], how="left")
        .groupBy("query_id")
        .agg(
            F.sort_array(
                F.collect_list(F.when(F.col("_rel"), F.col("rank")))
            ).alias("_rr"),
            F.sum(F.when(F.col("_rel"), 1).otherwise(0)).cast("long").alias("hits"),
        )
    )
    n_rel = rels.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_rel")
    )

    def _fold(arr):
        return F.aggregate(
            arr,
            F.lit(0.0),
            lambda a, x: a + F.lit(LN2) / F.log(x.cast("double") + F.lit(1.0)),
        )

    ideal_n = F.least(F.col("n_rel"), F.lit(int(k)))
    ideal_ranks = F.when(
        ideal_n > 0, F.sequence(F.lit(1).cast("long"), ideal_n)
    ).otherwise(F.array().cast("array<long>"))
    dcg = _fold(F.coalesce(F.col("_rr"), F.array().cast("array<long>")))
    idcg = _fold(ideal_ranks)
    return (
        n_rel.join(per_q, on="query_id", how="left")
        .withColumn("hits", F.coalesce(F.col("hits"), F.lit(0).cast("long")))
        .select(
            "query_id",
            "n_rel",
            "hits",
            F.round(F.col("hits").cast("double") / F.col("n_rel"), 6).alias("recall"),
            F.round(dcg, 6).alias("dcg"),
            F.round(idcg, 6).alias("idcg"),
            F.round(
                F.when(idcg > 0, dcg / idcg).otherwise(F.lit(0.0)), 6
            ).alias("ndcg"),
        )
    )


def blocklist_filter(
    docs: DataFrame,
    phrases,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_blocked, blocked_terms, keep) — C4-style blocklist
    gate: count occurrences of each blocklist entry (matched on the
    normalized token stream, so punctuation/case never hides a hit),
    list the distinct terms that hit, and flag ``keep`` = no hits.

    Single-word entries match tokens; multi-word entries match
    consecutive token runs (overlapping occurrences all count — exact
    n-gram equality, no substring tricks). Pure per-row array
    expressions — zero shuffles, scan-speed like :func:`gopher_filter`;
    the blocklist is compiled into the plan (fine for the typical
    hundreds-of-terms list; for very large lists join a broadcast table
    instead). Rows are never dropped — emit flags, keep rejects
    auditable. An empty blocklist is the identity gate: every row keeps
    with n_blocked 0 and an empty hit list.
    """
    phrases = list(phrases)
    if not phrases:
        return docs.select(
            "doc_id",
            F.lit(0).cast("long").alias("n_blocked"),
            F.array().cast("array<string>").alias("blocked_terms"),
            F.lit(True).alias("keep"),
        )
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    counts = []
    for p in phrases:
        norm = " ".join(str(p).lower().split())
        words = norm.split()
        k = len(words)
        if k == 1:
            c = F.size(F.filter(toks, lambda x: x == F.lit(norm)))
        else:
            ngr = F.when(
                n >= k,
                F.transform(
                    F.sequence(F.lit(1), n - (k - 1)),
                    lambda i: F.concat_ws(
                        " ", *[F.element_at(toks, i + j) for j in range(k)]
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
            c = F.size(F.filter(ngr, lambda x: x == F.lit(norm)))
        counts.append((norm, c.cast("long")))
    total = None
    for _, c in counts:
        total = c if total is None else total + c
    hit_terms = F.filter(
        F.array(*[
            F.when(c > 0, F.lit(norm)).otherwise(F.lit(None))
            for norm, c in counts
        ]),
        lambda x: x.isNotNull(),
    )
    return docs.select(
        "doc_id",
        F.coalesce(total, F.lit(0).cast("long")).alias("n_blocked"),
        hit_terms.alias("blocked_terms"),
        (F.coalesce(total, F.lit(0).cast("long")) == 0).alias("keep"),
    )


def language_mix(docs: DataFrame, min_hits: int = 2, text_col: str = "text") -> DataFrame:
    """(doc_id, hits_de, hits_en, hits_es, hits_fr, n_langs, mixed) —
    code-switch detection: per-language stopword hit counts (the
    :func:`language_id` evidence, exposed instead of argmax'd), how many
    languages clear ``min_hits``, and a mixed flag when two or more do.
    Mixed-language documents poison monolingual training mixes and LM
    perplexity scores — the standard practice is to flag them for
    splitting or exclusion rather than trust the single-label argmax.

    Pure per-row array expressions (zero shuffles), exact integers only.
    """
    toks = tokens(F.col(text_col))
    hit_cols = []
    for lang in sorted(STOPWORDS):
        words = STOPWORDS[lang]
        hit_cols.append(
            F.size(F.filter(toks, lambda t: t.isin(words))).cast("long").alias(f"hits_{lang}")
        )
    out = docs.select("doc_id", *hit_cols)
    n_langs = None
    for lang in sorted(STOPWORDS):
        c = F.when(F.col(f"hits_{lang}") >= min_hits, 1).otherwise(0)
        n_langs = c if n_langs is None else n_langs + c
    return out.select(
        "doc_id",
        *[f"hits_{lang}" for lang in sorted(STOPWORDS)],
        n_langs.cast("long").alias("n_langs"),
        (n_langs >= 2).alias("mixed"),
    )


def rank_correlation(
    run_a: DataFrame,
    run_b: DataFrame,
    k: int = 10,
) -> DataFrame:
    """(query_id, n_common, concordant, discordant, tau) — Kendall rank
    correlation between two ranked runs (query_id, doc_id, rank),
    restricted to documents both runs retrieved in their top-``k``:
    the standard "did my ranking change" check when tuning retrieval
    hyperparameters (BM25 k1/b, fusion weights, rerankers).

    Ranks within a run are distinct (row_number), so there are no ties
    and tau = (C − D) / (n(n−1)/2) over the common documents — every
    count an exact integer, ONE float division per query (bit-identical
    across engines). The pair join is per-query and k-bounded (≤ k²/2
    pairs per query), never corpus-scale; queries with < 2 common
    documents score 0.0 by convention.
    """
    a = run_a.filter(F.col("rank") <= k).select(
        "query_id", "doc_id", F.col("rank").alias("_ra")
    )
    b = run_b.filter(F.col("rank") <= k).select(
        "query_id", "doc_id", F.col("rank").alias("_rb")
    )
    c = a.join(b, on=["query_id", "doc_id"])
    x = c.select("query_id", F.col("doc_id").alias("_d1"),
                 F.col("_ra").alias("_ra1"), F.col("_rb").alias("_rb1"))
    y = c.select("query_id", F.col("doc_id").alias("_d2"),
                 F.col("_ra").alias("_ra2"), F.col("_rb").alias("_rb2"))
    pairs = x.join(y, on="query_id").filter(F.col("_d1") < F.col("_d2"))
    sgn = (F.col("_ra1") - F.col("_ra2")) * (F.col("_rb1") - F.col("_rb2"))
    agg = pairs.groupBy("query_id").agg(
        F.sum(F.when(sgn > 0, 1).otherwise(0)).cast("long").alias("concordant"),
        F.sum(F.when(sgn < 0, 1).otherwise(0)).cast("long").alias("discordant"),
    )
    n_common = c.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_common")
    )
    npairs = (F.col("n_common") * (F.col("n_common") - 1) / F.lit(2)).cast("long")
    return (
        n_common.join(agg, on="query_id", how="left")
        .select(
            "query_id",
            "n_common",
            F.coalesce("concordant", F.lit(0).cast("long")).alias("concordant"),
            F.coalesce("discordant", F.lit(0).cast("long")).alias("discordant"),
            F.when(
                F.col("n_common") >= 2,
                (F.coalesce("concordant", F.lit(0)) - F.coalesce("discordant", F.lit(0)))
                .cast("double") / npairs,
            ).otherwise(F.lit(0.0)).alias("tau"),
        )
    )


#: mojibake repair table — UTF-8 bytes read as Windows-1252/Latin-1 and
#: re-encoded (the single most common crawl corruption: ftfy's core
#: case). Longest-first application order prevents partial matches.
MOJIBAKE_FIXES = [
    ("\u00e2\u20ac\u2122", "'"),    # garbled right single quote
    ("\u00e2\u20ac\u0153", '"'),    # garbled left double quote
    ("\u00e2\u20ac\u009d", '"'),    # garbled right double quote
    ("\u00e2\u20ac\u201c", "-"),    # garbled en dash
    ("\u00e2\u20ac\u201d", "-"),    # garbled em dash
    ("\u00e2\u20ac\u00a6", "..."),  # garbled ellipsis
    ("\u00c3\u00a9", "\u00e9"),     # garbled e-acute
    ("\u00c3\u00a8", "\u00e8"),     # garbled e-grave
    ("\u00c3\u00bc", "\u00fc"),     # garbled u-umlaut
    ("\u00c3\u00b1", "\u00f1"),     # garbled n-tilde
]

#: unicode punctuation folded to its ASCII workalike
PUNCT_FOLDS = [
    ("\u2018", "'"), ("\u2019", "'"),   # curly single quotes
    ("\u201c", '"'), ("\u201d", '"'),   # curly double quotes
    ("\u2013", "-"), ("\u2014", "-"),   # en/em dash
    ("\u2026", "..."),                   # ellipsis
    ("\u00a0", " "),                     # NBSP
]

#: zero-width / soft-hyphen / BOM characters deleted outright
ZERO_WIDTH = "\u200b\u200c\u200d\u2060\ufeff\u00ad"


def fix_text_expr(col: Column) -> Column:
    """Encoding-artifact repair as ONE chain of codegen'd expressions
    (ftfy-lite): mojibake sequences un-garbled (longest first), unicode
    punctuation folded to ASCII, zero-width characters deleted,
    whitespace runs collapsed, edges trimmed. Every step is a literal
    ``replace``/``translate``/``regexp_replace`` — identical semantics
    in any engine, scan speed at 100 TB (no dictionary, no Python)."""
    out = col
    for bad, good in MOJIBAKE_FIXES + PUNCT_FOLDS:
        out = F.replace(out, F.lit(bad), F.lit(good))
    out = F.translate(out, ZERO_WIDTH, "")
    out = F.regexp_replace(out, r"\s+", " ")
    return F.trim(out)


def fix_text(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, fixed_text) — :func:`fix_text_expr` over a corpus: the
    cleanup pass crawl pipelines run BEFORE tokenization/dedup, so
    encoding garbage neither pollutes the vocabulary nor splits
    near-duplicates that differ only in corruption."""
    return docs.select(
        "doc_id", fix_text_expr(F.col(text_col)).alias("fixed_text")
    )


def strip_markup_expr(col: Column) -> Column:
    """HTML/XML residue removal as codegen'd expressions (the C4
    boilerplate step): tags deleted (``<...>`` — including attributes),
    the five predefined character entities + numeric entities decoded
    to their glyphs (or a space for ``&nbsp;``), whitespace collapsed,
    edges trimmed. Tag NAMES would otherwise tokenize ("p", "div",
    "href") and pollute every vocabulary, fingerprint, and n-gram
    downstream — run this before tokenization-keyed ops on crawl text.

    Regex dialect note: no lookarounds, so Java (Spark) and RE2-ish
    engines agree and the oracle is exact.

    Decoding order matters: ``&amp;`` is decoded LAST (the standard
    entity-decoding order), so escaped entities stay literal — crawl
    HTML commonly carries ``&amp;lt;`` (code samples, query strings),
    which must become the literal text ``&lt;``, not ``<``.
    """
    out = F.regexp_replace(col, r"<[^>]*>", " ")
    for ent, rep in [
        ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&"),
    ]:
        out = F.replace(out, F.lit(ent), F.lit(rep))
    out = F.regexp_replace(out, r"\s+", " ")
    return F.trim(out)


def strip_markup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, stripped_text) — :func:`strip_markup_expr` over a corpus."""
    return docs.select(
        "doc_id", strip_markup_expr(F.col(text_col)).alias("stripped_text")
    )
