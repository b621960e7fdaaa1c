"""Large-scale training-data pipeline operators (beyond the reference surface).

First-class engine components for the 100 TB data-curation path:

- ``text``: tokenization, language-ID, quality scoring, token counting,
  document fingerprinting — pure JVM-side expressions (no Python UDFs).
- ``dedup``: exact (hash-groupBy), n-gram Jaccard, MinHash+LSH, SimHash.
- ``similarity``: brute-force cosine top-k (baseline) and an LSH-bucketed
  approximate variant (the scale path).
- ``multimodal``: opaque binary columns + typed metadata; Arrow-batched
  decode/feature plumbing with stubbed codecs.

Every operator is deterministic and (where SQL-expressible) ships with a
DuckDB oracle in ``__spark_entry__.py``; hashing primitives are md5-based
because md5 is the one hash both engines compute identically.
"""

from kafka_graphs_spark.pipeline import (
    bpe,
    curate,
    dedup,
    events,
    features,
    multimodal,
    sample,
    sessions,
    similarity,
    text,
)

__all__ = ["text", "dedup", "similarity", "multimodal", "curate", "sample", "sessions", "events", "bpe", "features"]
