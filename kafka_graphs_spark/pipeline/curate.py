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
    max_pii: Optional[int] = None,
    max_dup_trigram_frac: Optional[float] = None,
    max_dup_span_frac: Optional[float] = None,
    span_window: int = 8,
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

    Filtering a corpus is ``docs.join(curate(docs), "doc_id", "left_semi")``.
    """
    passed = quality_score(docs, text_col=text_col).filter(
        F.col("score") >= min_score
    ).select("doc_id")
    kept = docs.join(passed, on="doc_id", how="left_semi")
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
        dirty = ngram_contamination(
            kept, benchmark, n=n, text_col=text_col
        ).filter(F.col("rate") > max_contamination).select("doc_id")
        kept = kept.join(dirty, on="doc_id", how="left_anti")
    resolved = resolve_duplicates(
        kept, n=n, threshold=jaccard_threshold, text_col=text_col
    )
    return resolved.filter(F.col("doc_id") == F.col("keep_id")).select("doc_id")
