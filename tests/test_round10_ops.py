"""Round-10 additions: Bloom contamination gate, per-domain curate
budgets, sketch NULL handling, shard integer arithmetic."""

import pytest
from pyspark.sql import functions as F


def docs_frame(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


class TestBloomFilter:
    """pipeline/bloom.py — fixed-size-filter contamination gate."""

    def test_parameters(self):
        from kafka_graphs_spark.pipeline.bloom import bloom_parameters

        m, k = bloom_parameters(1000, bits_per_key=10)
        assert m % 64 == 0 and m >= 10_000
        assert 1 <= k <= 16 and k == 7  # ln2 * 10 ≈ 6.93 → 7
        # degenerate inputs stay sane
        m0, k0 = bloom_parameters(0)
        assert m0 >= 64 and k0 >= 1

    def test_no_false_negatives(self, spark):
        from kafka_graphs_spark.pipeline.bloom import (
            bloom_probe,
            build_bloom_filter,
        )

        keys = spark.createDataFrame(
            [(f"key-{i}",) for i in range(500)], "k string"
        )
        filt, m, k, n = build_bloom_filter(keys, "k")
        assert n == 500
        hits = (
            keys.join(F.broadcast(filt))
            .select(bloom_probe(F.col("k"), m, k, F.col("bloom")).alias("h"))
            .agg(F.sum(F.when(F.col("h"), 1).otherwise(0)).alias("s"))
            .collect()[0]["s"]
        )
        assert hits == 500  # every inserted key MUST probe true

    def test_false_positive_rate_bounded(self, spark):
        import math

        from kafka_graphs_spark.pipeline.bloom import (
            bloom_probe,
            build_bloom_filter,
        )

        keys = spark.createDataFrame(
            [(f"in-{i}",) for i in range(2000)], "k string"
        )
        other = spark.createDataFrame(
            [(f"out-{i}",) for i in range(2000)], "k string"
        )
        filt, m, k, n = build_bloom_filter(keys, "k", bits_per_key=10)
        fp = (
            other.join(F.broadcast(filt))
            .select(bloom_probe(F.col("k"), m, k, F.col("bloom")).alias("h"))
            .agg(F.sum(F.when(F.col("h"), 1).otherwise(0)).alias("s"))
            .collect()[0]["s"]
        )
        bound = (1.0 - math.exp(-k * n / m)) ** k
        assert fp <= 3 * bound * 2000 + 8  # ~0.8% nominal at 10 bits/key

    def test_contamination_over_approximates_exact(self, spark):
        from kafka_graphs_spark.pipeline.bloom import bloom_contamination
        from kafka_graphs_spark.pipeline.dedup import ngram_contamination

        bench = docs_frame(
            spark, [(1, "b", "the quick brown fox jumps over the lazy dog")]
        )
        train = docs_frame(
            spark,
            [
                (10, "t", "the quick brown fox jumps high today"),
                (11, "t", "completely different words entirely here now"),
                (12, "t", "the quick brown fox jumps over the lazy dog"),
            ],
        )
        bl = {
            r["doc_id"]: r
            for r in bloom_contamination(train, bench, n=3).collect()
        }
        ex = {
            r["doc_id"]: r
            for r in ngram_contamination(train, bench, n=3).collect()
        }
        assert set(bl) == set(ex)
        for d in ex:
            assert bl[d]["total"] == ex[d]["total"]
            assert bl[d]["flagged"] >= ex[d]["contaminated"]  # no false negs
        assert ex[12]["rate"] == 1.0 and bl[12]["rate"] == 1.0
        assert ex[11]["contaminated"] == 0

    def test_check_row_invariants(self, spark):
        from kafka_graphs_spark.pipeline.bloom import bloom_contamination_check

        bench = docs_frame(
            spark,
            [(i, "b", f"shared phrase number {i} with common tail words")
             for i in range(5)],
        )
        train = docs_frame(
            spark,
            [(100 + i, "t",
              f"shared phrase number {i} with common tail words")
             for i in range(3)]
            + [(200, "t", "nothing in common with the benchmark at all"),],
        )
        row = bloom_contamination_check(train, bench, n=3).collect()[0]
        assert row["n_docs"] == 4
        assert row["false_neg_violations"] == 0
        assert row["fp_within_bound"] is True
        assert row["contaminated_exact"] > 0  # data-derived, not vacuous

    def test_filter_size_gate(self, spark):
        from kafka_graphs_spark.pipeline import bloom

        keys = spark.createDataFrame([("a",)], "k string")
        old = bloom.MAX_FILTER_WORDS
        bloom.MAX_FILTER_WORDS = 0
        try:
            with pytest.raises(ValueError, match="MAX_FILTER_WORDS"):
                bloom.build_bloom_filter(keys, "k")
        finally:
            bloom.MAX_FILTER_WORDS = old


class TestSketchNulls:
    """r9 ADVICE: NULL items excluded from BOTH sketch and exact sides."""

    def test_null_items_excluded(self, spark):
        from kafka_graphs_spark.streaming.sketches import misra_gries

        df = spark.createDataFrame(
            [(None,)] * 50 + [(7,)] * 30 + [(1,), (2,), (3,)],
            "item long",
        )
        out = {r["item"]: r["est_count"] for r in misra_gries(df, "item", 5).collect()}
        assert None not in out
        assert out.get(7, 0) <= 30  # never overestimates

    def test_check_counts_nonnull_universe(self, spark):
        from kafka_graphs_spark.streaming.sketches import heavy_hitters_check

        df = spark.createDataFrame(
            [(None,)] * 40 + [(7,)] * 30 + [(i,) for i in range(10)],
            "item long",
        )
        row = heavy_hitters_check(df, "item", 8).collect()[0]
        assert row["n_events"] == 40  # 30 + 10 non-null
        assert row["underest_violations"] == 0
        assert row["error_violations"] == 0
        assert row["heavy_missing"] == 0
        # top1 comes from the EXACT side over all items
        assert row["top1_id"] == 7 and row["top1_true"] == 30

    def test_top1_from_exact_side_even_when_not_reported(self, spark):
        from kafka_graphs_spark.streaming.sketches import heavy_hitters_check

        # k=1 on a mild distribution: the sketch may report nothing
        # useful, but top1 must still be the exact argmax
        df = spark.createDataFrame(
            [(i % 7,) for i in range(70)] + [(3,)] * 2, "item long"
        )
        row = heavy_hitters_check(df, "item", 1).collect()[0]
        assert row["top1_id"] == 3 and row["top1_true"] == 12


class TestShardIntegerArithmetic:
    def test_shard_matches_integer_cumsum(self, spark):
        from kafka_graphs_spark.pipeline.shards import assign_shards

        rows = [
            (i, "s" + str(i % 3), " ".join(["w"] * (7 + i % 13)))
            for i in range(300)
        ]
        out = assign_shards(
            docs_frame(spark, rows), tokens_per_shard=100, bucket_size=37
        ).collect()
        cum = {}
        for r in sorted(out, key=lambda r: (r["source"], r["doc_id"])):
            expect = cum.get(r["source"], 0) // 100
            assert r["shard"] == expect, r
            cum[r["source"]] = cum.get(r["source"], 0) + r["n_tokens"]
