"""End-to-end corpus curation: quality gate → duplicate resolution → keep set.

The composition a training-data pipeline actually ships: heuristic
quality filtering (C4/Gopher-style bands), then transitive near-duplicate
resolution over the SURVIVING documents, then the final keep list. Every
stage is the already-oracle-checked operator — the composition itself is
oracle-checked end to end (``pipeline_curate``).

Scale shape: the quality gate is a codegen'd filter (no shuffle); pair
generation runs only on the filtered corpus; resolution shuffles only the
candidate-pair graph. Nothing materializes on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from typing import Optional

from kafka_graphs_spark.pipeline.dedup import ngram_contamination, resolve_duplicates
from kafka_graphs_spark.pipeline.text import pii_stats, quality_score, repetition_stats


def curate(
    docs: DataFrame,
    min_score: float = 0.6,
    n: int = 3,
    jaccard_threshold: float = 0.3,
    text_col: str = "text",
    benchmark: Optional[DataFrame] = None,
    max_contamination: float = 0.5,
    contamination_gate: str = "exact",
    max_pii: Optional[int] = None,
    max_dup_trigram_frac: Optional[float] = None,
    max_dup_span_frac: Optional[float] = None,
    span_window: int = 8,
    model_target=None,
    model_keep_frac: float = 0.5,
    model_iterations: int = 8,
    model_lr: float = 0.05,
    blocklist=None,
    blocked_domains=None,
    url_dedup_first: bool = False,
    url_col: str = "url",
    max_docs_per_domain: Optional[int] = None,
    max_tokens_per_domain: Optional[int] = None,
    respect_robots: bool = False,
    license_allow=None,
    require_license: bool = False,
) -> DataFrame:
    """(doc_id) — documents that pass the quality gate, are not
    benchmark-contaminated (when ``benchmark`` is given), pass the
    optional PII and repetition gates, AND survive duplicate resolution
    (the canonical member of each near-dup cluster).

    ``max_pii``: drop documents with more than this many pattern-PII hits
    (None = gate off). ``max_dup_trigram_frac``: drop documents whose
    Gopher-style duplicate-trigram mass exceeds the bound (None = off).
    ``max_dup_span_frac``: drop documents whose corpus-wide duplicated
    ``span_window``-token fraction (ExactSubstr-style, see
    ``dedup.duplicated_spans``) exceeds the bound (None = off) — the
    boilerplate/mirror gate. All gates are pre-dedup: they shrink the
    pair-generation input, so adding them makes the expensive stage
    cheaper, never slower.

    ``blocklist``: when given (a list of words/phrases), documents with
    ANY blocklist hit (:func:`~kafka_graphs_spark.pipeline.text.blocklist_filter`)
    are dropped before dedup — the C4 badwords gate, applied pre-dedup
    like every other gate so it shrinks pair generation.

    ``blocked_domains``: when given (a list of registered domains),
    documents whose ``url_col`` host is one of them or a subdomain
    thereof (:func:`~kafka_graphs_spark.pipeline.domains.domain_blocklist`)
    are dropped pre-dedup — the C4 domain blocklist, same label-boundary
    semantics. Requires a URL column.

    ``contamination_gate``: ``"exact"`` (default — broadcast the
    benchmark's distinct-shingle set) or ``"bloom"`` (fixed-size Bloom
    filter, :mod:`~kafka_graphs_spark.pipeline.bloom`): zero false
    negatives either way; the Bloom gate may over-drop a bounded
    fraction of clean documents in exchange for a broadcast that stays
    fixed-size no matter how large the benchmark suite grows.

    ``max_docs_per_domain`` / ``max_tokens_per_domain``: RefinedWeb-style
    per-registered-domain budgets, applied to the quality/blocklist
    survivors BEFORE the expensive pair stage (like every other gate,
    they shrink pair generation). The doc cap keeps a deterministic
    hash-ordered top-n per domain
    (:func:`~kafka_graphs_spark.pipeline.sample.cap_per_group` keyed by
    eTLD+1); the token budget keeps hash-ordered documents while the
    preceding kept-candidates' token mass stays under the budget
    (:func:`~kafka_graphs_spark.pipeline.domains.domain_token_budget`).
    When both are given the doc cap runs first (it is the cheaper gate)
    and the token budget sees only cap survivors. Host-less documents
    (registered domain ``''``) pass both budgets unconditionally. Both
    require a URL column.

    ``respect_robots`` / ``license_allow`` / ``require_license``: the
    reuse-policy gate (:func:`~kafka_graphs_spark.pipeline.licenses.license_gate`):
    honor robots meta opt-outs (noindex/noarchive/none), enforce a
    CC-license allowlist on license-carrying documents, or keep only
    affirmatively-licensed documents. Pre-dedup, zero shuffles.

    ``url_dedup_first``: when True, URL-level deduplication
    (:func:`~kafka_graphs_spark.pipeline.domains.url_dedup` — one
    survivor per canonical URL) runs FIRST, before every other gate:
    at crawl scale it removes the bulk of duplicates at a fraction of
    shingle-dedup's cost, so everything downstream — including the
    expensive pair generation — sees a smaller corpus. Requires a URL
    column.

    ``model_target``: when given (a boolean Column over ``docs``), the
    heuristic band gate is REPLACED by a model gate — a quality
    classifier is trained in-engine against the target labels
    (:func:`~kafka_graphs_spark.pipeline.classifier.train_quality_classifier`)
    and the top ``model_keep_frac`` of documents by model probability
    survive (CCNet's "keep the head of the score distribution", rank
    cutoff rather than absolute threshold so the gate is calibration-
    free). Rank ties break on (rounded prob, doc_id), so the keep set is
    deterministic across engines. The exact-rank cutoff sorts the
    (doc_id, prob) projection — 16 bytes/doc; at extreme corpus sizes
    swap in an approximate-quantile cutoff and gate on the score instead.

    Filtering a corpus is ``docs.join(curate(docs), "doc_id", "left_semi")``.
    """
    if url_dedup_first:
        from kafka_graphs_spark.pipeline.domains import url_dedup

        url_survivors = url_dedup(docs, url_col=url_col).filter(
            F.col("keep")
        ).select("doc_id")
        docs = docs.join(url_survivors, on="doc_id", how="left_semi")
    if model_target is not None:
        from pyspark.sql.window import Window

        from kafka_graphs_spark.pipeline.classifier import train_quality_classifier
        from kafka_graphs_spark.pipeline.text import quality_score_linear

        trained = {
            r["feature"]: r["weight"]
            for r in train_quality_classifier(
                docs, model_target, n_iterations=model_iterations, lr=model_lr,
                text_col=text_col,
            ).collect()
        }
        scored = quality_score_linear(docs, weights=trained, text_col=text_col).select(
            "doc_id", F.round("prob", 6).alias("_p6")
        )
        rank_w = Window.orderBy(F.desc("_p6"), F.asc("doc_id"))
        all_w = Window.partitionBy()
        passed = (
            scored.withColumn("_rn", F.row_number().over(rank_w))
            .withColumn("_n", F.count(F.lit(1)).over(all_w))
            .filter(
                F.col("_rn")
                <= F.floor(F.col("_n") * F.lit(float(model_keep_frac)))
            )
            .select("doc_id")
        )
    else:
        passed = quality_score(docs, text_col=text_col).filter(
            F.col("score") >= min_score
        ).select("doc_id")
    kept = docs.join(passed, on="doc_id", how="left_semi")
    if blocklist:
        from kafka_graphs_spark.pipeline.text import blocklist_filter

        blocked = blocklist_filter(kept, blocklist, text_col=text_col).filter(
            ~F.col("keep")
        ).select("doc_id")
        kept = kept.join(blocked, on="doc_id", how="left_anti")
    if respect_robots or license_allow is not None or require_license:
        # reuse-policy gate (r11 — the C4 licence-filter shape): robots
        # meta opt-outs honored, CC-license allowlist enforced,
        # optionally only affirmatively-licensed documents kept. A
        # zero-shuffle per-row expression gate, so like every narrow
        # gate it runs pre-dedup and shrinks pair generation.
        from kafka_graphs_spark.pipeline.licenses import license_gate

        licensed = license_gate(
            kept,
            text_col=text_col,
            respect_robots=respect_robots,
            license_allow=license_allow,
            require_license=require_license,
        ).filter(F.col("keep")).select("doc_id")
        kept = kept.join(licensed, on="doc_id", how="left_semi")
    if blocked_domains:
        from kafka_graphs_spark.pipeline.domains import domain_blocklist

        # keep = NULL marks a host-less URL the gate could not check —
        # a safety filter drops what it cannot clear, so NULL is blocked
        bad_dom = domain_blocklist(kept, blocked_domains, url_col=url_col).filter(
            ~F.coalesce(F.col("keep"), F.lit(False))
        ).select("doc_id")
        kept = kept.join(bad_dom, on="doc_id", how="left_anti")
    if max_docs_per_domain is not None:
        from kafka_graphs_spark.pipeline.domains import extract_domains
        from kafka_graphs_spark.pipeline.sample import cap_per_group

        doms = extract_domains(kept, url_col=url_col).select(
            "doc_id", "domain"
        )
        # host-less rows (domain '') are not attributable to a domain —
        # they bypass the cap, mirroring domain_token_budget's policy
        capped = cap_per_group(
            doms.filter(F.col("domain") != ""),
            "domain",
            max_docs_per_domain,
            "doc_id",
        ).select("doc_id").union(
            doms.filter(F.col("domain") == "").select("doc_id")
        )
        kept = kept.join(capped, on="doc_id", how="left_semi")
    if max_tokens_per_domain is not None:
        from kafka_graphs_spark.pipeline.domains import domain_token_budget

        in_budget = domain_token_budget(
            kept, max_tokens_per_domain, url_col=url_col, text_col=text_col
        ).filter(F.col("keep")).select("doc_id")
        kept = kept.join(in_budget, on="doc_id", how="left_semi")
    if max_pii is not None:
        noisy = pii_stats(kept, text_col=text_col).filter(
            F.col("n_pii") > max_pii
        ).select("doc_id")
        kept = kept.join(noisy, on="doc_id", how="left_anti")
    if max_dup_trigram_frac is not None:
        repetitive = repetition_stats(kept, text_col=text_col).filter(
            F.col("dup_trigram_frac") > max_dup_trigram_frac
        ).select("doc_id")
        kept = kept.join(repetitive, on="doc_id", how="left_anti")
    if max_dup_span_frac is not None:
        from kafka_graphs_spark.pipeline.dedup import duplicated_spans

        spanny = duplicated_spans(kept, w=span_window, text_col=text_col).filter(
            F.col("dup_fraction") > max_dup_span_frac
        ).select("doc_id")
        kept = kept.join(spanny, on="doc_id", how="left_anti")
    if benchmark is not None:
        # "bloom": the fixed-size-filter gate (pipeline.bloom) — same
        # (doc_id, rate) contract, bounded over-flagging, no false
        # negatives; the 100 TB form when the benchmark's distinct-
        # shingle set outgrows a broadcast. "exact" joins the exact set.
        if contamination_gate == "bloom":
            from kafka_graphs_spark.pipeline.bloom import bloom_contamination

            scored = bloom_contamination(
                kept, benchmark, n=n, text_col=text_col
            ).withColumnRenamed("flagged", "contaminated")
        elif contamination_gate == "exact":
            scored = ngram_contamination(kept, benchmark, n=n, text_col=text_col)
        else:
            raise ValueError(
                f"contamination_gate must be 'exact' or 'bloom', got"
                f" {contamination_gate!r}"
            )
        dirty = scored.filter(
            F.col("rate") > max_contamination
        ).select("doc_id")
        kept = kept.join(dirty, on="doc_id", how="left_anti")
    resolved = resolve_duplicates(
        kept, n=n, threshold=jaccard_threshold, text_col=text_col
    )
    return resolved.filter(F.col("doc_id") == F.col("keep_id")).select("doc_id")


def curate_report(
    docs: DataFrame,
    min_score: float = 0.6,
    n: int = 3,
    jaccard_threshold: float = 0.3,
    text_col: str = "text",
    blocklist=None,
    max_pii=None,
    max_dup_trigram_frac=None,
    respect_robots: bool = False,
    license_allow=None,
    require_license: bool = False,
) -> DataFrame:
    """(stage_idx, stage, n_in, n_dropped, n_out) — the gate-by-gate
    funnel of a :func:`curate` run: how many documents each gate
    received, dropped, and passed on, in the exact order curate applies
    them (quality → blocklist → license → pii → repetition → dedup
    resolution). The accounting artifact every production curation job
    publishes next to its keep list — "which gate is eating my corpus".

    Same gate semantics as :func:`curate` (each stage filters the
    previous stage's survivors). All stage counts evaluate in ONE
    action as a union of one-row aggregates; shared chain prefixes may
    recompute across branches — this is the audit artifact, run it at
    report time, not per batch.
    """
    from kafka_graphs_spark.pipeline.text import (
        blocklist_filter,
        pii_stats,
        quality_score,
        repetition_stats,
    )

    stages = [("input", docs)]
    passed = quality_score(docs, text_col=text_col).filter(
        F.col("score") >= min_score
    ).select("doc_id")
    cur = docs.join(passed, on="doc_id", how="left_semi")
    stages.append(("quality_gate", cur))
    if blocklist:
        blocked = blocklist_filter(cur, blocklist, text_col=text_col).filter(
            ~F.col("keep")
        ).select("doc_id")
        cur = cur.join(blocked, on="doc_id", how="left_anti")
        stages.append(("blocklist", cur))
    if respect_robots or license_allow is not None or require_license:
        from kafka_graphs_spark.pipeline.licenses import license_gate

        licensed = license_gate(
            cur,
            text_col=text_col,
            respect_robots=respect_robots,
            license_allow=license_allow,
            require_license=require_license,
        ).filter(F.col("keep")).select("doc_id")
        cur = cur.join(licensed, on="doc_id", how="left_semi")
        stages.append(("license_gate", cur))
    if max_pii is not None:
        noisy = pii_stats(cur, text_col=text_col).filter(
            F.col("n_pii") > max_pii
        ).select("doc_id")
        cur = cur.join(noisy, on="doc_id", how="left_anti")
        stages.append(("pii_gate", cur))
    if max_dup_trigram_frac is not None:
        repetitive = repetition_stats(cur, text_col=text_col).filter(
            F.col("dup_trigram_frac") > max_dup_trigram_frac
        ).select("doc_id")
        cur = cur.join(repetitive, on="doc_id", how="left_anti")
        stages.append(("repetition_gate", cur))
    resolved = resolve_duplicates(
        cur, n=n, threshold=jaccard_threshold, text_col=text_col
    )
    final = cur.join(
        resolved.filter(F.col("doc_id") == F.col("keep_id")).select("doc_id"),
        on="doc_id",
        how="left_semi",
    )
    stages.append(("dedup_resolve", final))

    from pyspark.sql.window import Window

    counts = None
    for idx, (name, frame) in enumerate(stages):
        one = frame.agg(F.count(F.lit(1)).cast("long").alias("n")).select(
            F.lit(idx).alias("_i"), F.lit(name).alias("stage"), "n"
        )
        counts = one if counts is None else counts.unionByName(one)
    w = Window.orderBy("_i")
    return (
        counts.withColumn("n_in", F.lag("n").over(w))
        .filter(F.col("_i") > 0)
        .select(
            F.col("_i").cast("long").alias("stage_idx"),
            "stage",
            F.col("n_in").alias("n_in"),
            (F.col("n_in") - F.col("n")).alias("n_dropped"),
            F.col("n").alias("n_out"),
        )
    )
