"""Large-scale training-data pipeline operators (beyond the reference surface).

First-class engine components for the 100 TB data-curation path:

- ``text``: tokenization, language-ID, quality scoring, token counting,
  fingerprinting, LM surprisal, PII, chunking — pure JVM-side expressions.
- ``dedup``: exact, n-gram Jaccard, MinHash+LSH, SimHash, span-level
  exact-substring detect/remove, resolution, contamination, rates.
- ``similarity``: exact cosine baseline + RP-LSH / IVF / PQ-ADC / IVFADC
  (all recall-pinned), SemDeDup, kNN graphs, quantization, JL projection.
- ``bpe``: distributed BPE tokenizer training on frequency-weighted types.
- ``features``: GraphSAGE-style multi-hop neighborhood feature aggregation.
- ``sample``: seeded Bernoulli/stratified/temperature/weighted sampling,
  splits, sequence packing. ``sessions``/``events``: sessionization, JSON
  property extraction, funnel conversion, retention cohorts.
- ``relational``: as-of join (union+window, one shuffle — no range
  theta-join, no Python).
- ``domains``: URL host / registered-domain (eTLD+1) extraction,
  per-domain rollups, domain blocklist gates — the C4/RefinedWeb web-
  curation key space; pure per-row expressions.
- ``multimodal``: opaque binary columns + typed metadata; Arrow-batched
  decode/feature plumbing with stubbed codecs.
- ``classifier``: distributed trained quality classifier (bit-exact
  full-batch logistic regression) + reliability-table calibration.
- ``bloom``: fixed-size Bloom-filter decontamination gate (distributed
  bit_or build, codegen'd probes, zero false negatives).
- ``datasheet``: corpus data card in ONE GROUPING SETS pass, plus the
  streaming per-window form.
- ``shards``: deterministic fixed-token-budget shard packing (two-level
  exact cumsum), manifests, mixture plans, and the partitioned writer.

Every operator is deterministic and (where SQL-expressible) ships with a
DuckDB oracle in ``__spark_entry__.py``; hashing primitives are md5-based
because md5 is the one hash both engines compute identically.
"""

from kafka_graphs_spark.pipeline import (
    bloom,
    bpe,
    classifier,
    curate,
    datasheet,
    dedup,
    domains,
    events,
    features,
    licenses,
    multimodal,
    relational,
    sample,
    sessions,
    shards,
    similarity,
    text,
)

__all__ = ["text", "dedup", "domains", "similarity", "multimodal", "curate", "sample", "sessions", "events", "bpe", "features", "relational", "datasheet", "shards", "classifier", "bloom", "licenses"]
