"""Distributed BPE (byte-pair-encoding) tokenizer training.

Sennrich et al. 2016 (arXiv:1508.07909): iteratively merge the most
frequent adjacent symbol pair. The scale insight every distributed
trainer uses: train on word TYPES weighted by corpus frequency, not on
corpus tokens — pair counts over the type table are identical to counts
over the raw corpus (words never span each other), and the type table is
sublinear in corpus size (|vocab| vs |tokens|). Each merge round is one
map-side-combinable pair-count aggregation over the type table plus one
scalar argmax collect; the merge application is a pure-codegen
``F.aggregate`` left fold (no Python, no UDF). At 100 TB the type table
still fits the cluster trivially and the driver holds only the merge
list (n_merges rows).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# split between every pair of characters (lookahead keeps no separators);
# Spark's split emits a trailing "" at the end-of-string position — drop it
def _char_symbols(col):
    return F.filter(F.split(col, "(?!^)"), lambda x: x != "")


def _apply_merge(symbols, left: str, right: str):
    """Greedy leftmost-first merge of adjacent (left, right) into one
    symbol — a codegen'd left fold: append each symbol unless it closes
    the pair with the accumulator's tail (overlaps resolve leftmost-first
    exactly like the reference algorithm: after [a,a,a] merges positions
    1-2, the third ``a`` stands alone)."""
    merged = left + right
    return F.aggregate(
        symbols,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1),
                F.array(F.lit(merged)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _local_bpe(
    type_rows: List[Tuple[str, int]],
    n_merges: int,
    min_pair_count: int,
) -> Tuple[List[Tuple[int, str, str, int]], List[Tuple[str, int, List[str]]]]:
    """Sennrich-style incremental merge loop on a collected word-type
    table: pair stats plus a pair -> word index are maintained
    incrementally (only words CONTAINING the merged pair are re-segmented
    per round), so a 32k-merge vocabulary costs seconds, not one Spark
    job per merge. Scoring and application are bit-compatible with the
    distributed rounds: exact integer counts, argmax tie-break
    (count desc, left asc, right asc), greedy leftmost-first
    non-overlapping merge application, ``min_pair_count`` early stop.
    """
    words = [(list(t), f) for t, f in type_rows]
    stats: dict = {}
    index: dict = {}  # pair -> set of word idx
    for i, (syms, f) in enumerate(words):
        for a, b in zip(syms, syms[1:]):
            stats[(a, b)] = stats.get((a, b), 0) + f
            index.setdefault((a, b), set()).add(i)

    merges: List[Tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        if not stats:
            break
        (l, r), c = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < min_pair_count:
            break
        merges.append((rank, l, r, int(c)))
        merged = l + r
        for i in sorted(index.get((l, r), ())):
            syms, f = words[i]
            # remove the word's current pair contributions
            for a, b in zip(syms, syms[1:]):
                stats[(a, b)] -= f
                if stats[(a, b)] <= 0:
                    del stats[(a, b)]
                idx = index.get((a, b))
                if idx is not None:
                    idx.discard(i)
                    if not idx:
                        del index[(a, b)]
            # greedy leftmost-first non-overlapping merge (fold twin)
            out: List[str] = []
            for x in syms:
                if out and out[-1] == l and x == r:
                    out[-1] = merged
                else:
                    out.append(x)
            words[i] = (out, f)
            for a, b in zip(out, out[1:]):
                stats[(a, b)] = stats.get((a, b), 0) + f
                index.setdefault((a, b), set()).add(i)
    # original token text rides along (join of symbols == token by construction)
    segmented = [
        (t, f, syms) for (t, f), (syms, _f2) in zip(type_rows, words)
    ]
    return merges, segmented


def train_bpe(
    docs: DataFrame,
    n_merges: int = 50,
    min_pair_count: int = 2,
    text_col: str = "text",
    local_threshold: int = 200_000,
) -> Tuple[List[Tuple[int, str, str, int]], DataFrame]:
    """Train BPE merges on a document corpus.

    Returns ``(merges, segmented)``:

    - ``merges``: list of ``(rank, left, right, pair_count)`` in merge
      order — the tokenizer artifact (driver-side, n_merges entries).
    - ``segmented``: DataFrame ``(token, freq, symbols array<string>,
      n_symbols)`` — every word type's final segmentation, which IS the
      application table for the training corpus (segmenting a known word
      is a broadcast/equi-join against it; unknown words fall back to
      character symbols + :func:`apply_bpe`).

    Hybrid execution (VERDICT r6 "Next round" #5 — the Louvain
    ``local_threshold`` pattern): the word-type fold is always
    distributed (that's the corpus-size-bound pass), but the merge loop
    itself only touches the VOCABULARY-bounded type table, so when that
    table has ≤ ``local_threshold`` rows it is collected once and the
    merges run as the classic incremental Sennrich loop on the driver —
    a production 32k–50k-merge vocabulary costs seconds instead of one
    driver-sequenced Spark job per merge. Above the guard (or with
    ``local_threshold=0``) every round stays distributed: one
    map-side-combinable pair-count aggregation + scalar argmax collect
    per merge. Both tiers score and apply merges identically (exact
    integer counts, (count desc, left, right) tie-break, leftmost-first
    fold), so the trained artifact is the same on either side of the
    knob.

    Deterministic under any partitioning: pair counts are exact integer
    sums and the argmax tie-breaks on (count desc, left, right).
    Training stops early when no pair reaches ``min_pair_count``.
    """
    from kafka_graphs_spark.pipeline.text import tokens

    spark = docs.sparkSession
    words = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    cur = words.select(
        "token", "freq", _char_symbols(F.col("token")).alias("symbols")
    ).localCheckpoint(eager=True)

    if local_threshold > 0 and cur.count() <= local_threshold:
        type_rows = [
            (r["token"], int(r["freq"]))
            for r in cur.select("token", "freq").orderBy("token").collect()
        ]
        merges, seg_rows = _local_bpe(type_rows, n_merges, min_pair_count)
        segmented = spark.createDataFrame(
            seg_rows, "token string, freq long, symbols array<string>"
        ).withColumn("n_symbols", F.size("symbols"))
        return merges, segmented

    merges: List[Tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        pairs = cur.select(
            "freq",
            F.explode(
                F.when(
                    F.size("symbols") >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size("symbols") - 1),
                        lambda i: F.struct(
                            F.element_at("symbols", i).alias("l"),
                            F.element_at("symbols", i + 1).alias("r"),
                        ),
                    ),
                ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
            ).alias("p"),
        )
        best = (
            pairs.groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("c"))
            .orderBy(F.desc("c"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["c"] < min_pair_count:
            break
        l, r, c = best[0]["l"], best[0]["r"], int(best[0]["c"])
        merges.append((rank, l, r, c))
        # one checkpoint job per round keeps the plan depth constant;
        # the superseded generation's blocks are released immediately
        prev, cur = cur, cur.withColumn(
            "symbols", _apply_merge(F.col("symbols"), l, r)
        ).localCheckpoint(eager=True)
        prev.unpersist()

    segmented = cur.withColumn("n_symbols", F.size("symbols"))
    return merges, segmented


def apply_bpe(
    words: DataFrame,
    merges: List[Tuple[int, str, str, int]],
    token_col: str = "token",
    checkpoint_every: int = 16,
) -> DataFrame:
    """Segment arbitrary word types with a trained merge list — replay
    the merges in rank order (the exact BPE inference rule). Each merge
    is one codegen'd fold; a periodic local checkpoint keeps the
    expression tree bounded for long merge lists. For corpus-scale
    segmentation prefer joining against ``train_bpe``'s ``segmented``
    table and routing only unseen types here.
    """
    out = words.withColumn("symbols", _char_symbols(F.col(token_col)))
    for i, (_, l, r, _c) in enumerate(sorted(merges)):
        out = out.withColumn("symbols", _apply_merge(F.col("symbols"), l, r))
        if (i + 1) % checkpoint_every == 0:
            out = out.localCheckpoint(eager=True)
    return out.withColumn("n_symbols", F.size("symbols"))
