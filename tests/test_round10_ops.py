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
        # top1 comes from the EXACT side over all items (item 7 counts
        # 30 from the hot block + 1 from the range(10) tail = 31)
        assert row["top1_id"] == 7 and row["top1_true"] == 31

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


class TestDomainTokenBudget:
    """pipeline/domains.py — per-registered-domain token budget."""

    def urls_frame(self, spark, rows):
        return spark.createDataFrame(
            rows, "doc_id long, url string, text string"
        )

    def test_budget_keeps_prefix_of_hash_order(self, spark):
        from kafka_graphs_spark.pipeline.domains import domain_token_budget
        from kafka_graphs_spark.pipeline.sample import hash_fraction

        # one domain, 6 docs x 10 tokens; budget 30 -> exactly the first
        # 3 docs of the hash order survive (exclusive cumsum < 30)
        rows = [
            (i, "https://a.example.com/x", " ".join(["tok"] * 10))
            for i in range(6)
        ]
        out = domain_token_budget(
            self.urls_frame(spark, rows), max_tokens=30
        ).collect()
        assert all(r["domain"] == "example.com" for r in out)
        kept = sorted(r["doc_id"] for r in out if r["keep"])
        order = [
            r["doc_id"]
            for r in spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
            .select("doc_id", hash_fraction(F.col("doc_id"), "dombudget").alias("h"))
            .orderBy("h", "doc_id")
            .collect()
        ]
        assert kept == sorted(order[:3])
        # cum_before is the exclusive cumsum in hash order
        by_id = {r["doc_id"]: r for r in out}
        assert [by_id[d]["cum_before"] for d in order] == [0, 10, 20, 30, 40, 50]

    def test_every_domain_keeps_at_least_one(self, spark):
        from kafka_graphs_spark.pipeline.domains import domain_token_budget

        # every doc alone blows the budget, but the exclusive cumsum
        # always admits the first doc of each domain
        rows = [
            (i, f"https://site{i % 3}.net/p", " ".join(["w"] * 50))
            for i in range(9)
        ]
        out = domain_token_budget(
            self.urls_frame(spark, rows), max_tokens=10
        ).collect()
        kept_by_domain = {}
        for r in out:
            kept_by_domain.setdefault(r["domain"], 0)
            kept_by_domain[r["domain"]] += int(r["keep"])
        assert set(kept_by_domain) == {"site0.net", "site1.net", "site2.net"}
        assert all(v == 1 for v in kept_by_domain.values())

    def test_hostless_rows_bypass_budget(self, spark):
        from kafka_graphs_spark.pipeline.domains import domain_token_budget

        rows = [(1, "", "a b c"), (2, "", "d e f"), (3, "http://x.org/p", "g h")]
        out = {r["doc_id"]: r for r in domain_token_budget(
            self.urls_frame(spark, rows), max_tokens=1
        ).collect()}
        assert out[1]["keep"] and out[2]["keep"]  # '' domain: unconditional
        assert out[3]["keep"]  # first (only) doc of x.org

    def test_rejects_bad_budget(self, spark):
        from kafka_graphs_spark.pipeline.domains import domain_token_budget

        with pytest.raises(ValueError):
            domain_token_budget(self.urls_frame(spark, []), max_tokens=0)


class TestCurateDomainBudgets:
    """curate() with max_docs_per_domain / max_tokens_per_domain."""

    def corpus(self, spark):
        # 3 domains x 8 good docs, unique texts (no near-dups), all pass
        # the heuristic quality gate (stopwords + mid-length tokens)
        rows = []
        for d in range(3):
            for i in range(8):
                doc_id = d * 8 + i
                text = (
                    f"the quick brown fox jumps over the lazy dog number{doc_id} "
                    f"and the story continues with details part{doc_id} here"
                )
                rows.append((doc_id, f"https://host{d}.com/p{i}", text))
        return spark.createDataFrame(
            rows, "doc_id long, url string, text string"
        )

    def test_doc_cap_matches_cap_per_group(self, spark):
        from kafka_graphs_spark.pipeline.curate import curate
        from kafka_graphs_spark.pipeline.domains import extract_domains
        from kafka_graphs_spark.pipeline.sample import cap_per_group

        docs = self.corpus(spark)
        out = sorted(
            r["doc_id"]
            for r in curate(
                docs, min_score=0.6, jaccard_threshold=0.9,
                max_docs_per_domain=3,
            ).collect()
        )
        expected = sorted(
            r["doc_id"]
            for r in cap_per_group(
                extract_domains(docs).select("doc_id", "domain"),
                "domain", 3, "doc_id",
            ).collect()
        )
        assert out == expected and len(out) == 9

    def test_token_budget_composes_after_cap(self, spark):
        from kafka_graphs_spark.pipeline.curate import curate
        from kafka_graphs_spark.pipeline.domains import (
            domain_token_budget,
            extract_domains,
        )
        from kafka_graphs_spark.pipeline.sample import cap_per_group

        docs = self.corpus(spark)
        out = sorted(
            r["doc_id"]
            for r in curate(
                docs, min_score=0.6, jaccard_threshold=0.9,
                max_docs_per_domain=4, max_tokens_per_domain=40,
            ).collect()
        )
        capped = cap_per_group(
            extract_domains(docs).select("doc_id", "domain"),
            "domain", 4, "doc_id",
        ).select("doc_id")
        survivors = docs.join(capped, "doc_id", "left_semi")
        expected = sorted(
            r["doc_id"]
            for r in domain_token_budget(survivors, 40)
            .filter(F.col("keep")).collect()
        )
        assert out == expected
        # 19-token docs, budget 40 -> cumsum admits 3 docs per domain
        assert len(out) == 9

    def test_hostless_docs_survive_budgets(self, spark):
        from kafka_graphs_spark.pipeline.curate import curate

        rows = [
            (i, "", (
                "the quick brown fox jumps over the lazy dog "
                f"unique{i} words fill the rest of this line out"
            ))
            for i in range(5)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, url string, text string")
        out = curate(
            docs, min_score=0.6, jaccard_threshold=0.9,
            max_docs_per_domain=1, max_tokens_per_domain=1,
        ).collect()
        assert len(out) == 5


class TestDatasheetStream:
    """pipeline/datasheet.py — windowed streaming data card."""

    def docs(self, spark):
        rows = []
        for i in range(40):
            lang = ["en", "de", "fr"][i % 3]
            source = ["web", "books"][i % 2]
            text = "the quick brown fox jumps over the lazy dog " + " ".join(
                f"w{i}x{j}" for j in range(i % 5)
            )
            rows.append((i, text, lang, source))
        return spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string"
        )

    def with_time(self, df):
        # one doc per minute -> '1 hour' windows of 60 docs
        return df.withColumn(
            "event_time", F.timestamp_micros(F.col("doc_id") * 60_000_000)
        )

    def batch_expected(self, spark, df):
        from kafka_graphs_spark.pipeline.datasheet import corpus_datasheet

        out = {}
        for ws in [r["w"] for r in df.select(
            ((F.col("doc_id") / 60).cast("long") * 3600).alias("w")
        ).distinct().collect()]:
            sub = df.filter(
                ((F.col("doc_id") / 60).cast("long") * 3600) == ws
            )
            for r in corpus_datasheet(sub).collect():
                out[(ws, r["section"], r["key"])] = (r["n_docs"], r["n_tokens"])
        return out

    def test_batch_frame_matches_grouping_sets(self, spark):
        from kafka_graphs_spark.pipeline.datasheet import corpus_datasheet_stream

        df = self.docs(spark)
        got = {
            (int(r["window_start"].timestamp()), r["section"], r["key"]):
                (r["n_docs"], r["n_tokens"])
            for r in corpus_datasheet_stream(
                self.with_time(df), "1 hour"
            ).collect()
        }
        assert got == self.batch_expected(spark, df)
        # every section present
        assert {k[1] for k in got} == {
            "overall", "language", "source", "quality_band"
        }

    def test_real_stream_multi_batch(self, spark, tmp_path):
        from kafka_graphs_spark.pipeline.datasheet import corpus_datasheet_stream

        df = self.with_time(self.docs(spark))
        src_dir = str(tmp_path / "src")
        ckpt = str(tmp_path / "ckpt")
        df.repartition(3).write.parquet(src_dir)
        stream = (
            spark.readStream.schema(
                "doc_id long, text string, lang string, source string,"
                " event_time timestamp"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        card = corpus_datasheet_stream(
            stream, "1 hour", watermark="3650 days"
        ).select(
            F.col("window_start").cast("long").alias("ws"),
            "section", "key", "n_docs", "n_tokens",
        )
        rows = []

        def sink(batch_df, _bid):
            rows.extend(batch_df.collect())

        q = (
            card.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)
        # update mode re-emits a key whenever a later batch grows it:
        # counts are monotone, final card = max per key
        final = {}
        for r in rows:
            k = (r["ws"], r["section"], r["key"])
            v = (r["n_docs"], r["n_tokens"])
            if k not in final or v > final[k]:
                final[k] = v
        assert final == self.batch_expected(spark, self.docs(spark))
        # multi-batch actually happened (3 files -> >= 2 emissions of
        # some key, so raw rows exceed the final card)
        assert len(rows) > len(final)


class TestQuantileSketch:
    """streaming/sketches.py — deterministic mergeable quantile summary."""

    PROBES = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]

    def test_summary_weights_cover_stream(self, spark):
        from kafka_graphs_spark.streaming import quantile_summary

        df = spark.range(0, 1000, 1, 8).select(
            ((F.col("id") * 7919) % 997).alias("v")
        )
        parts = quantile_summary(df, "v", k=16).collect()
        assert sum(r["weight"] for r in parts) == 1000
        # <= k+1 entries per partition, err set once per partition
        assert sum(1 for r in parts if r["err"] > 0) <= 8
        assert all(r["weight"] >= 1 for r in parts)

    def test_estimates_within_bound_multiple_layouts(self, spark):
        from kafka_graphs_spark.streaming import quantile_sketch_check

        for n_parts in (1, 4, 32):
            df = spark.range(0, 2000, 1, n_parts).select(
                ((F.col("id") * 48271) % 10007).alias("v")
            )
            rows = quantile_sketch_check(
                df, "v", k=32, probes=self.PROBES
            ).collect()
            assert len(rows) == len(self.PROBES)
            assert all(r["within_bound"] for r in rows), (n_parts, rows)
            assert all(r["n_values"] == 2000 for r in rows)

    def test_exact_when_k_exceeds_n(self, spark):
        from kafka_graphs_spark.streaming import quantile_estimates

        df = spark.range(0, 50, 1, 2).select(F.col("id").alias("v"))
        est = {
            r["q"]: r["est"]
            for r in quantile_estimates(
                df, "v", k=64, probes=[0.5, 0.9]
            ).collect()
        }
        # every block is a single value -> estimates are exact lower
        # quantiles: rank ceil(0.5*50)=25 -> value 24 (0-based ids)
        assert est[0.5] == 24.0
        assert est[0.9] == 44.0

    def test_true_value_is_exact_order_statistic(self, spark):
        from kafka_graphs_spark.streaming import quantile_sketch_check
        import math

        vals = [(i, float((i * 31) % 101)) for i in range(200)]
        df = spark.createDataFrame(vals, "id long, v double")
        rows = {
            r["q"]: r
            for r in quantile_sketch_check(
                df, "v", k=8, probes=[0.25, 0.75]
            ).collect()
        }
        s = sorted(v for _, v in vals)
        for q in (0.25, 0.75):
            target = math.ceil(q * 200)
            assert rows[q]["target_rank"] == target
            assert rows[q]["true_value"] == s[target - 1]

    def test_nulls_excluded(self, spark):
        from kafka_graphs_spark.streaming import quantile_sketch_check

        df = spark.createDataFrame(
            [(float(i),) for i in range(100)] + [(None,)] * 20, "v double"
        )
        rows = quantile_sketch_check(df, "v", k=10, probes=[0.5]).collect()
        assert rows[0]["n_values"] == 100
        assert rows[0]["within_bound"]

    def test_rejects_bad_k(self, spark):
        from kafka_graphs_spark.streaming import quantile_summary

        with pytest.raises(ValueError):
            quantile_summary(spark.range(5), "id", 0)


class TestCurateBloomGate:
    """curate(contamination_gate='bloom') — fixed-size decontamination."""

    def test_bloom_gate_drops_superset_of_exact(self, spark):
        from kafka_graphs_spark.pipeline.curate import curate

        # 10 clean docs + 5 docs copying the benchmark text verbatim
        bench_text = (
            "the secret benchmark question about ancient rivers flows here"
        )
        rows = [
            (i, (
                "the quick brown fox jumps over the lazy dog "
                f"unique{i} filler words to pass the quality gate fine"
            ))
            for i in range(10)
        ] + [(10 + j, bench_text + f" trailer{j}") for j in range(5)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        bench = spark.createDataFrame([(0, bench_text)], "doc_id long, text string")
        kw = dict(
            min_score=0.6, n=3, jaccard_threshold=0.9,
            benchmark=bench, max_contamination=0.3,
        )
        exact = {r["doc_id"] for r in curate(docs, **kw).collect()}
        bloom = {r["doc_id"] for r in curate(
            docs, contamination_gate="bloom", **kw
        ).collect()}
        # contaminated docs are gone under BOTH gates (no false negatives)
        assert not ({10, 11, 12, 13, 14} & exact)
        assert not ({10, 11, 12, 13, 14} & bloom)
        # bloom survivors are a subset of exact survivors (over-flag only)
        assert bloom <= exact

    def test_rejects_unknown_gate(self, spark):
        from kafka_graphs_spark.pipeline.curate import curate

        docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        with pytest.raises(ValueError):
            curate(docs, benchmark=docs, contamination_gate="bogus").collect()


class TestIncrementalDedup:
    """dedup.incremental_dedup — crawl-increment vs curated-corpus."""

    def frames(self, spark):
        base = "the quick brown fox jumps over the lazy dog and keeps going"
        corpus = spark.createDataFrame(
            [
                (0, base + " corpus zero original text body"),
                (1, "completely different corpus material about rivers and "
                    "mountains with many unique terms"),
            ],
            "doc_id long, text string",
        )
        new = spark.createDataFrame(
            [
                # 10: near-copy of corpus doc 0 -> dup_of_corpus
                (10, base + " corpus zero original text body extra"),
                # 11 & 12: near-copies of each other, unseen in corpus
                (11, "fresh new material about galaxies stars and nebulae "
                     "spinning in the deep void tonight"),
                (12, "fresh new material about galaxies stars and nebulae "
                     "spinning in the deep void today"),
                # 13: unique
                (13, "entirely unrelated text regarding cooking pasta with "
                     "garlic butter and fresh basil leaves"),
            ],
            "doc_id long, text string",
        )
        return new, corpus

    def test_exact_semantics(self, spark):
        from kafka_graphs_spark.pipeline.dedup import incremental_dedup

        new, corpus = self.frames(spark)
        out = {
            r["doc_id"]: r
            for r in incremental_dedup(
                new, corpus, n=3, threshold=0.5
            ).collect()
        }
        assert set(out) == {10, 11, 12, 13}
        assert out[10]["dup_of_corpus"] and not out[10]["keep"]
        assert not out[11]["dup_of_corpus"] and out[11]["keep"]  # cluster min
        assert not out[12]["dup_of_corpus"] and not out[12]["keep"]
        assert not out[13]["dup_of_corpus"] and out[13]["keep"]

    def test_lsh_verification_is_exact(self, spark):
        from kafka_graphs_spark.pipeline.dedup import incremental_dedup

        new, corpus = self.frames(spark)
        exact = {
            (r["doc_id"], r["dup_of_corpus"], r["keep"])
            for r in incremental_dedup(new, corpus, n=3, threshold=0.5).collect()
        }
        lsh = {
            (r["doc_id"], r["dup_of_corpus"], r["keep"])
            for r in incremental_dedup(
                new, corpus, n=3, threshold=0.5, method="lsh",
                num_hashes=16, bands=8,
            ).collect()
        }
        # LSH can only miss pairs; on this fixture (high-sim dups) it
        # finds them all, so the outputs agree exactly
        assert lsh == exact

    def test_corpus_dup_never_bridges_new_clusters(self, spark):
        from kafka_graphs_spark.pipeline.dedup import incremental_dedup

        # A = K+L+R dups the corpus doc K+X via segment K (J=10/34);
        # B = L+U and C = R+V each near-dup A via segments the corpus
        # LACKS (J=8/38 each) and share nothing with each other or the
        # corpus. At threshold 0.2 only A is a corpus dup. If
        # resolution ran on ALL new docs, B~A~C would be one cluster
        # and one of B/C would lose; survivors-only resolution keeps
        # both.
        K = "kernel alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"
        X = "plus corpus trailing bits"
        L = "left wing segment portal quartz ember violet marble canyon drift"
        R = "right branch harbor falcon meadow copper lantern breeze summit glacier"
        UB = "bravo pencil ocean ladder trumpet willow saffron comet"
        UC = "charlie anchor engine pebble nimbus forest tundra quill"
        corpus = spark.createDataFrame(
            [(0, f"{K} {X}")], "doc_id long, text string"
        )
        new = spark.createDataFrame(
            [(20, f"{K} {L} {R}"), (21, f"{L} {UB}"), (22, f"{R} {UC}")],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: r
            for r in incremental_dedup(new, corpus, n=3, threshold=0.2).collect()
        }
        assert out[20]["dup_of_corpus"] and not out[20]["keep"]
        assert out[21]["keep"] and out[22]["keep"], out
        assert not out[21]["dup_of_corpus"] and not out[22]["dup_of_corpus"]

    def test_rejects_unknown_method(self, spark):
        from kafka_graphs_spark.pipeline.dedup import incremental_dedup

        new, corpus = self.frames(spark)
        with pytest.raises(ValueError):
            incremental_dedup(new, corpus, method="fuzzy")


class TestIncrementalEmbeddingDedup:
    """similarity.incremental_embedding_dedup — SemDeDup at ingest."""

    def frames(self, spark):
        import math

        def unit(theta):
            return [math.cos(theta), math.sin(theta), 0.0, 0.0]

        corpus = spark.createDataFrame(
            [(0, unit(0.0)), (1, unit(1.2)), (2, unit(2.4))],
            "vec_id long, embedding array<double>",
        )
        new = spark.createDataFrame(
            [
                # 10: ~copy of corpus 0 (cos ~0.9995)
                (10, unit(0.03)),
                # 11 & 12: a tight new cluster far from every corpus vec
                (11, unit(4.0)),
                (12, unit(4.03)),
                # 13: singleton far from everything
                (13, unit(5.5)),
            ],
            "vec_id long, embedding array<double>",
        )
        return new, corpus

    def test_exact_semantics(self, spark):
        from kafka_graphs_spark.pipeline.similarity import (
            incremental_embedding_dedup,
        )

        new, corpus = self.frames(spark)
        out = {
            r["id"]: r
            for r in incremental_embedding_dedup(
                new, corpus, threshold=0.99
            ).collect()
        }
        assert set(out) == {10, 11, 12, 13}
        assert out[10]["dup_of_corpus"] and not out[10]["keep"]
        assert not out[11]["dup_of_corpus"] and out[11]["keep"]
        assert not out[12]["dup_of_corpus"] and not out[12]["keep"]
        assert out[13]["keep"]

    def test_lsh_agrees_on_tight_dups(self, spark):
        from kafka_graphs_spark.pipeline.similarity import (
            incremental_embedding_dedup,
        )

        new, corpus = self.frames(spark)
        exact = {
            (r["id"], r["dup_of_corpus"], r["keep"])
            for r in incremental_embedding_dedup(
                new, corpus, threshold=0.99
            ).collect()
        }
        lsh = {
            (r["id"], r["dup_of_corpus"], r["keep"])
            for r in incremental_embedding_dedup(
                new, corpus, threshold=0.99, method="lsh",
                n_planes=4, n_tables=8, dim=4,
            ).collect()
        }
        assert lsh == exact

    def test_rejects_unknown_method(self, spark):
        from kafka_graphs_spark.pipeline.similarity import (
            incremental_embedding_dedup,
        )

        new, corpus = self.frames(spark)
        with pytest.raises(ValueError):
            incremental_embedding_dedup(new, corpus, method="cosine-ish")


class TestWriteShards:
    """shards.write_shards — on-disk shard layout + manifest roundtrip."""

    def test_roundtrip_and_pruning(self, spark, tmp_path):
        from kafka_graphs_spark.pipeline.shards import (
            assign_shards,
            shard_manifest,
            write_shards,
        )

        rows = [
            (i, "s" + str(i % 2), " ".join(["w"] * (5 + i % 7)))
            for i in range(200)
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, source string, text string"
        )
        assigned = assign_shards(docs, tokens_per_shard=120, bucket_size=50)
        out = str(tmp_path / "shards")
        manifest = write_shards(assigned, out)
        # manifest on disk == manifest recomputed
        got = {
            (r["source"], r["shard"]): (r["n_docs"], r["n_tokens"])
            for r in manifest.collect()
        }
        want = {
            (r["source"], r["shard"]): (r["n_docs"], r["n_tokens"])
            for r in shard_manifest(assigned).collect()
        }
        assert got == want and len(got) >= 4
        # data roundtrip: every doc lands in its assigned shard dir
        data = spark.read.parquet(f"{out}/data")
        back = {
            r["doc_id"]: (r["source"], r["shard"]) for r in data.collect()
        }
        for r in assigned.collect():
            assert back[r["doc_id"]] == (r["source"], r["shard"])
        # partition pruning reaches the scan when filtering one shard
        plan = (
            data.filter((F.col("source") == "s0") & (F.col("shard") == 0))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "PartitionFilters: [" in plan and "source" in plan.split(
            "PartitionFilters"
        )[1][:200]


class TestFixText:
    """text.fix_text — encoding-artifact repair (ftfy-lite)."""

    def test_mojibake_and_punct_folds(self, spark):
        from kafka_graphs_spark.pipeline.text import fix_text

        docs = spark.createDataFrame(
            [
                (1, "it\u00e2\u20ac\u2122s a \u00e2\u20ac\u0153test\u00e2\u20ac\u009d"),
                (2, "caf\u00c3\u00a9 \u00e2\u20ac\u201c nice"),
                (3, "\u2018quoted\u2019 \u201cand\u201d \u2013 dashed \u2026"),
                (4, "plain ascii stays put"),
            ],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r["fixed_text"] for r in fix_text(docs).collect()}
        assert out[1] == "it\'s a \"test\""
        assert out[2] == "caf\u00e9 - nice"
        assert out[3] == "\'quoted\' \"and\" - dashed ..."
        assert out[4] == "plain ascii stays put"

    def test_zero_width_and_whitespace(self, spark):
        from kafka_graphs_spark.pipeline.text import fix_text

        docs = spark.createDataFrame(
            [(1, "zero\u200bwidth\u00adgone"),
             (2, "  runs \t of\n whitespace  ")],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r["fixed_text"] for r in fix_text(docs).collect()}
        assert out[1] == "zerowidthgone"
        assert out[2] == "runs of whitespace"

    def test_idempotent(self, spark):
        from kafka_graphs_spark.pipeline.text import fix_text

        docs = spark.createDataFrame(
            [(1, "it\u00e2\u20ac\u2122s   fixed\u2026")],
            "doc_id long, text string",
        )
        once = fix_text(docs).withColumnRenamed("fixed_text", "text")
        twice = {r["doc_id"]: r["fixed_text"] for r in fix_text(once).collect()}
        assert twice[1] == "it\'s fixed..."

    def test_plan_is_pure_codegen(self, spark):
        from kafka_graphs_spark.pipeline.text import fix_text

        docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        plan = fix_text(docs)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan


class TestStripMarkup:
    """text.strip_markup — HTML residue removal."""

    def test_tags_entities_whitespace(self, spark):
        from kafka_graphs_spark.pipeline.text import strip_markup

        docs = spark.createDataFrame(
            [
                (1, "<p>hello <b>world</b></p>"),
                (2, 'x <a href="u?a=1&amp;b=2">link</a> y'),
                (3, "tom &amp; jerry &lt;3 &quot;quoted&quot; &#39;s"),
                (4, "a&nbsp;b"),
                (5, "no markup at all"),
            ],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r["stripped_text"] for r in strip_markup(docs).collect()}
        assert out[1] == "hello world"
        assert out[2] == "x link y"
        assert out[3] == 'tom & jerry <3 "quoted" \'s'
        assert out[4] == "a b"
        assert out[5] == "no markup at all"

    def test_escaped_entities_stay_literal(self, spark):
        # r11 ADVICE fix: '&amp;' decodes LAST, so escaped entities
        # ('&amp;lt;' etc. — common in crawl HTML code samples / query
        # strings) become the literal entity text, never double-decode.
        from kafka_graphs_spark.pipeline.text import strip_markup

        docs = spark.createDataFrame(
            [
                (1, "a &amp;lt; b"),
                (2, "x &amp;gt; y &amp;quot;z&amp;quot;"),
                (3, "&amp;amp; stays one level"),
                (4, "url?a=1&amp;amp;b=2"),
            ],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r["stripped_text"] for r in strip_markup(docs).collect()}
        assert out[1] == "a &lt; b"
        assert out[2] == "x &gt; y &quot;z&quot;"
        assert out[3] == "&amp; stays one level"
        assert out[4] == "url?a=1&amp;b=2"

    def test_tokens_change_after_strip(self, spark):
        from kafka_graphs_spark.pipeline.text import strip_markup, tokens

        docs = spark.createDataFrame(
            [(1, "<div class=main>body text</div>")],
            "doc_id long, text string",
        )
        raw = docs.select(tokens(F.col("text")).alias("t")).collect()[0]["t"]
        stripped = strip_markup(docs).select(
            tokens(F.col("stripped_text")).alias("t")
        ).collect()[0]["t"]
        assert "div" in raw and "class" in raw  # tags pollute raw tokens
        assert stripped == ["body", "text"]

    def test_plan_is_pure_codegen(self, spark):
        from kafka_graphs_spark.pipeline.text import strip_markup

        docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        plan = strip_markup(docs)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan


class TestHotKeys:
    """datasheet.hot_keys — join-key skew audit."""

    def test_topk_shares_and_null_key(self, spark):
        from kafka_graphs_spark.pipeline.datasheet import hot_keys

        rows = [(7,)] * 50 + [(None,)] * 30 + [(1,)] * 15 + [(2,)] * 5
        df = spark.createDataFrame(rows, "k int")
        out = {r["rank"]: r for r in hot_keys(df, "k", k=3).collect()}
        assert len(out) == 3
        assert out[1]["key"] == 7 and out[1]["n_rows"] == 50
        assert out[1]["share"] == 0.5
        assert out[2]["key"] is None and out[2]["n_rows"] == 30
        assert out[3]["key"] == 1 and out[3]["n_rows"] == 15

    def test_single_shuffle_plan(self, spark):
        from kafka_graphs_spark.pipeline.datasheet import hot_keys

        df = spark.range(0, 1000, 1, 8).select((F.col("id") % 37).alias("k"))
        plan = hot_keys(df, "k")._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 1
        assert "BatchEvalPython" not in plan


class TestCurateReport:
    """curate.curate_report — gate-by-gate funnel accounting."""

    def corpus(self, spark):
        rows = []
        import random

        rng = random.Random(7)
        for i in range(12):
            # 0-9 pass quality with mostly-distinct bodies; 10-11 are
            # too short (score < 0.7)
            if i < 10:
                body = " ".join(
                    f"w{i}x{rng.randrange(10000)}" for _ in range(12)
                )
                text = f"the quick brown fox number{i} " + body
            else:
                text = "tiny"
            rows.append((i, text))
        # 20/21: blocklisted word; 30/31: exact near-dups of each other
        rows += [
            (20, "the quick brown fox says badword and the rest is fine "
                 "with unique20 filler tokens all around here"),
            (21, "the quick brown fox says badword too but differently "
                 "with unique21 filler tokens all around here"),
            (30, "identical near duplicate content block shared by this "
                 "pair of documents exactly and completely"),
            (31, "identical near duplicate content block shared by this "
                 "pair of documents exactly and completely"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_funnel_accounting(self, spark):
        from kafka_graphs_spark.pipeline.curate import curate, curate_report

        docs = self.corpus(spark)
        rep = {
            r["stage"]: r
            for r in curate_report(
                docs, min_score=0.7, jaccard_threshold=0.6,
                blocklist=["badword"],
            ).collect()
        }
        assert list(rep) == ["quality_gate", "blocklist", "dedup_resolve"]
        q = rep["quality_gate"]
        assert q["n_in"] == 16 and q["n_dropped"] == 2 and q["n_out"] == 14
        b = rep["blocklist"]
        assert b["n_in"] == 14 and b["n_dropped"] == 2 and b["n_out"] == 12
        d = rep["dedup_resolve"]
        assert d["n_in"] == 12 and d["n_dropped"] == 1 and d["n_out"] == 11
        # funnel output count == curate() keep-set size, same config
        kept = curate(
            docs, min_score=0.7, jaccard_threshold=0.6, blocklist=["badword"]
        ).count()
        assert kept == d["n_out"]

    def test_inactive_gates_absent(self, spark):
        from kafka_graphs_spark.pipeline.curate import curate_report

        docs = self.corpus(spark)
        stages = [
            r["stage"] for r in curate_report(docs, min_score=0.7).collect()
        ]
        assert stages == ["quality_gate", "dedup_resolve"]
