"""Unit tests for pipeline operators on deterministic micro-fixtures.

The driver-contract parity harness (test_entry_contract) oracle-checks
these against DuckDB at data scale; here we pin SEMANTIC properties on
hand-built inputs: transitivity of duplicate resolution, subset/recall
relations between approximate and exact paths, determinism under reruns.
"""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # 1-2-3 form a transitive near-dup chain (1~2 and 2~3 share
        # shingles; 1 and 3 share fewer), 4 is a distant paraphrase,
        # 5-6 are exact duplicates, 7 is unique.
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy cat today"),
        (3, "a quick brown fox jumps over the lazy cat today"),
        (4, "the fast brown fox leaped over a sleepy dog yesterday"),
        (5, "entirely different content about spark engines"),
        (6, "entirely different content about spark engines"),
        (7, "unrelated text concerning database query optimizers"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def vectors(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    base = rng.standard_normal((20, 16))
    # vec 20 = near-duplicate of vec 0; vec 21 = near-duplicate of vec 1
    rows = [(i, [float(x) for x in base[i]]) for i in range(20)]
    rows.append((20, [float(x) for x in base[0] + 0.01 * rng.standard_normal(16)]))
    rows.append((21, [float(x) for x in base[1] + 0.01 * rng.standard_normal(16)]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


class TestResolveDuplicates:
    def test_transitive_chain_collapses_to_min(self, spark, docs):
        from kafka_graphs_spark.pipeline import dedup

        out = dedup.resolve_duplicates(docs, n=3, threshold=0.3)
        keep = {r["doc_id"]: r["keep_id"] for r in out.collect()}
        assert len(keep) == 7
        # the 1-2-3 chain resolves to 1 even if (1,3) alone is below
        # threshold — transitivity through 2
        assert keep[1] == 1 and keep[2] == 1 and keep[3] == 1
        # exact dups resolve to the smaller id; unique docs keep themselves
        assert keep[5] == 5 and keep[6] == 5
        assert keep[4] == 4 and keep[7] == 7

    def test_explicit_pairs_override(self, spark, docs):
        from kafka_graphs_spark.pipeline import dedup

        pairs = spark.createDataFrame([(7, 4)], "doc_a long, doc_b long")
        out = dedup.resolve_duplicates(docs, pairs=pairs)
        keep = {r["doc_id"]: r["keep_id"] for r in out.collect()}
        assert keep[7] == 4 and keep[4] == 4
        assert keep[1] == 1  # untouched without candidate pairs

    def test_survivor_filter_is_closed(self, docs):
        from kafka_graphs_spark.pipeline import dedup

        out = dedup.resolve_duplicates(docs, n=3, threshold=0.3)
        survivors = out.filter(F.col("doc_id") == F.col("keep_id"))
        # every keep_id is itself a survivor (no dangling references)
        dangling = out.join(
            survivors.select(F.col("doc_id").alias("keep_id")), on="keep_id", how="left_anti"
        )
        assert dangling.count() == 0


class TestIvfTopk:
    def test_full_probe_equals_exact(self, vectors):
        from kafka_graphs_spark.pipeline import similarity

        q = vectors.filter(F.col("vec_id") < 3)
        exact = similarity.cosine_topk(vectors, q, k=3)
        # probing every cell makes IVF exhaustive — must equal brute force
        ivf = similarity.ivf_topk(
            vectors, q, k=3, n_cells=4, n_probe=4, dim=16, seed=3
        )
        ex = {(r.query_id, r.rank): r.neighbor_id for r in exact.collect()}
        iv = {(r.query_id, r.rank): r.neighbor_id for r in ivf.collect()}
        assert ex == iv

    def test_near_duplicate_found_in_probed_cells(self, vectors):
        from kafka_graphs_spark.pipeline import similarity

        q = vectors.filter(F.col("vec_id").isin(0, 1))
        ivf = similarity.ivf_topk(
            vectors, q, k=1, n_cells=4, n_probe=2, dim=16, seed=3
        )
        top1 = {r.query_id: r.neighbor_id for r in ivf.collect()}
        # a 1%-perturbed copy lands in the same Voronoi cell as the
        # original, so even a partial probe finds it at rank 1
        assert top1[0] == 20 and top1[1] == 21


class TestNearDupLsh:
    def test_lsh_subset_of_exact_and_finds_true_dups(self, vectors):
        from kafka_graphs_spark.pipeline import similarity

        exact = similarity.embedding_near_duplicates(vectors, threshold=0.9)
        lsh = similarity.embedding_near_duplicates(
            vectors, threshold=0.9, method="lsh", n_planes=4, n_tables=8, dim=16
        )
        ex = {(r.id_a, r.id_b) for r in exact.collect()}
        ls = {(r.id_a, r.id_b) for r in lsh.collect()}
        assert ls <= ex
        # the planted high-cosine pairs collide in some band
        assert (0, 20) in ls and (1, 21) in ls

    def test_unknown_method_raises(self, vectors):
        from kafka_graphs_spark.pipeline import similarity

        with pytest.raises(ValueError):
            similarity.embedding_near_duplicates(vectors, method="nope").collect()


class TestTextCorpusOps:
    def test_normalize_text(self, spark):
        from kafka_graphs_spark.pipeline import text

        docs = spark.createDataFrame(
            [(1, "  Hello,   WORLD!! 42 "), (2, ""), (3, "---")],
            "doc_id long, text string",
        )
        out = {r.doc_id: r.norm_text for r in text.normalize_text(docs).collect()}
        assert out == {1: "hello world 42", 2: "", 3: ""}

    def test_vocabulary_ranks_by_freq_then_token(self, spark):
        from kafka_graphs_spark.pipeline import text

        docs = spark.createDataFrame(
            [(1, "b a a"), (2, "a b c")], "doc_id long, text string"
        )
        rows = {r.token: r for r in text.vocabulary(docs, min_count=1).collect()}
        assert rows["a"].freq == 3 and rows["a"].token_id == 1
        assert rows["a"].doc_freq == 2
        # freq tie between b(2)... b=2, c=1: order a(3), b(2), c(1)
        assert rows["b"].token_id == 2 and rows["c"].token_id == 3
        # min_count filters the tail
        assert text.vocabulary(docs, min_count=2).count() == 2

    def test_tfidf_keywords_prefers_rare_terms(self, spark):
        from kafka_graphs_spark.pipeline import text

        docs = spark.createDataFrame(
            [(1, "common rare common"), (2, "common other"), (3, "common third")],
            "doc_id long, text string",
        )
        top1 = {
            r.doc_id: r.token
            for r in text.tfidf_keywords(docs, k=1).collect()
        }
        # 'common' appears in every doc (idf=1); doc-unique terms win
        assert top1 == {1: "rare", 2: "other", 3: "third"}

    def test_bigram_counts(self, spark):
        from kafka_graphs_spark.pipeline import text

        docs = spark.createDataFrame(
            [(1, "new york city"), (2, "new york state"), (3, "one")],
            "doc_id long, text string",
        )
        out = {r.bigram: r.freq for r in text.bigram_counts(docs, min_count=2).collect()}
        assert out == {"new york": 2}
        all_bg = {
            r.bigram: r.freq for r in text.bigram_counts(docs, min_count=1).collect()
        }
        # single-token and empty docs contribute no bigrams
        assert all_bg == {"new york": 2, "york city": 1, "york state": 1}


class TestTextOpsVsPythonModel:
    """Randomized-corpus cross-check vs an independent pure-Python model."""

    @pytest.fixture(scope="class")
    def corpus(self, spark):
        import random

        rng = random.Random(1234)
        vocab = [f"w{i}" for i in range(30)]
        rows = [
            (i, " ".join(rng.choices(vocab, k=rng.randint(0, 40))))
            for i in range(60)
        ]
        return rows, spark.createDataFrame(rows, "doc_id long, text string")

    def test_vocabulary_matches_model(self, corpus):
        from collections import Counter

        from kafka_graphs_spark.pipeline import text

        rows, docs = corpus
        freq, dfreq = Counter(), Counter()
        for _, t in rows:
            toks = t.split()
            freq.update(toks)
            dfreq.update(set(toks))
        got = {r.token: (r.freq, r.doc_freq) for r in text.vocabulary(docs).collect()}
        assert got == {w: (freq[w], dfreq[w]) for w in freq}
        # ids are a permutation of 1..|vocab| honoring (freq desc, token asc)
        ids = sorted(
            (r.token_id, -r.freq, r.token)
            for r in text.vocabulary(docs).collect()
        )
        assert [i for i, _, _ in ids] == list(range(1, len(freq) + 1))
        assert ids == sorted(ids, key=lambda x: (x[1], x[2]))

    def test_bigrams_match_model(self, corpus):
        from collections import Counter

        from kafka_graphs_spark.pipeline import text

        rows, docs = corpus
        model = Counter()
        for _, t in rows:
            toks = t.split()
            model.update(f"{a} {b}" for a, b in zip(toks, toks[1:]))
        got = {r.bigram: r.freq for r in text.bigram_counts(docs, min_count=1).collect()}
        assert got == dict(model)

    def test_tfidf_topk_matches_model(self, corpus):
        from collections import Counter

        from kafka_graphs_spark.pipeline import text

        rows, docs = corpus
        n = len(rows)
        dfreq = Counter()
        for _, t in rows:
            dfreq.update(set(t.split()))
        expect = {}
        for doc_id, t in rows:
            tf = Counter(t.split())
            scored = sorted(
                ((c * (n / dfreq[w]), w) for w, c in tf.items()),
                key=lambda x: (-x[0], x[1]),
            )
            for rank, (s, w) in enumerate(scored[:3], 1):
                expect[(doc_id, w)] = (s, rank)
        got = {
            (r.doc_id, r.token): (r.score, r.rank)
            for r in text.tfidf_keywords(docs, k=3).collect()
        }
        assert got == expect


class TestContamination:
    def test_rate_bounds_and_exact_overlap(self, spark):
        from kafka_graphs_spark.pipeline import dedup

        bench = spark.createDataFrame(
            [(100, "alpha beta gamma delta")], "doc_id long, text string"
        )
        train = spark.createDataFrame(
            [
                (1, "alpha beta gamma delta"),        # fully contaminated
                (2, "alpha beta gamma epsilon zeta"), # 1 of 3 shingles hit
                (3, "one two three four"),            # clean
                (4, "xy"),                            # too short: no shingles
            ],
            "doc_id long, text string",
        )
        out = {
            r.doc_id: (r.contaminated, r.total, r.rate)
            for r in dedup.ngram_contamination(train, bench, n=3).collect()
        }
        assert out[1] == (2, 2, 1.0)
        assert out[2] == (1, 3, 1.0 / 3.0)
        assert out[3] == (0, 2, 0.0)
        assert 4 not in out  # no shingles → no row (nothing to measure)

    def test_curate_with_benchmark_gate(self, spark):
        from kafka_graphs_spark.pipeline.curate import curate

        base = "the quick brown fox jumps over the lazy dog and cat daily"
        docs = spark.createDataFrame(
            [
                (1, base),                                   # = benchmark: dropped
                (2, "completely original text about engines and pipelines here today"),
                (3, "completely original text about engines and pipelines here today"),
            ],
            "doc_id long, text string",
        )
        bench = spark.createDataFrame([(100, base)], "doc_id long, text string")
        kept = {r.doc_id for r in curate(
            docs, min_score=0.0, jaccard_threshold=0.5,
            benchmark=bench, max_contamination=0.5,
        ).collect()}
        # 1 is contamination-dropped; 2/3 are exact dups → canonical 2 kept
        assert kept == {2, 3} - {3}
        # without the gate, 1 survives
        no_gate = {r.doc_id for r in curate(
            docs, min_score=0.0, jaccard_threshold=0.5
        ).collect()}
        assert no_gate == {1, 2}


class TestRepetitionStats:
    def test_known_fractions(self, spark):
        from kafka_graphs_spark.pipeline import text

        rows = [
            # "a b a b a": unigrams 5 (2 distinct), bigrams 4 ("a b" x2,
            # "b a" x2 -> 2 distinct), trigrams 3 ("a b a" x2, "b a b" -> 2
            # distinct), top bigram 2/4
            (1, "a b a b a"),
            # all distinct tokens: zero duplicate mass everywhere
            (2, "one two three four"),
            # single token: no bigrams/trigrams -> 0.0, not null
            (3, "solo"),
            (4, ""),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: r for r in text.repetition_stats(docs).collect()}
        r1 = got[1]
        assert r1["n_tokens"] == 5
        assert r1["dup_unigram_frac"] == pytest.approx(1 - 2 / 5)
        assert r1["dup_bigram_frac"] == pytest.approx(1 - 2 / 4)
        assert r1["dup_trigram_frac"] == pytest.approx(1 - 2 / 3)
        assert r1["top_bigram_frac"] == pytest.approx(2 / 4)
        r2 = got[2]
        assert (
            r2["dup_unigram_frac"] == 0.0
            and r2["dup_bigram_frac"] == 0.0
            and r2["top_bigram_frac"] == pytest.approx(1 / 3)
        )
        r3 = got[3]
        assert r3["n_tokens"] == 1 and r3["dup_bigram_frac"] == 0.0
        assert r3["top_bigram_frac"] == 0.0 and r3["dup_trigram_frac"] == 0.0
        r4 = got[4]
        assert r4["n_tokens"] == 0 and r4["dup_unigram_frac"] == 0.0

    def test_repeated_boilerplate_scores_high(self, spark):
        from kafka_graphs_spark.pipeline import text

        docs = spark.createDataFrame(
            [(1, "click here to subscribe " * 20), (2, "diverse natural prose with many distinct words written once")],
            "doc_id long, text string",
        )
        got = {r["doc_id"]: r for r in text.repetition_stats(docs).collect()}
        assert got[1]["dup_trigram_frac"] > 0.9 > got[2]["dup_trigram_frac"]
        assert got[1]["top_bigram_frac"] > 0.2


class TestHashSampling:
    @pytest.fixture(scope="class")
    def corpus_docs(self, spark):
        rows = [
            (i, f"document number {i} with some text", ["web", "books", "code"][i % 3])
            for i in range(300)
        ]
        return spark.createDataFrame(rows, "doc_id long, text string, source string")

    def test_rate_and_determinism(self, corpus_docs):
        from kafka_graphs_spark.pipeline import sample

        a = sorted(r.doc_id for r in sample.hash_sample(corpus_docs, "doc_id", 0.5).collect())
        b = sorted(
            r.doc_id
            for r in sample.hash_sample(
                corpus_docs.repartition(7), "doc_id", 0.5
            ).collect()
        )
        assert a == b  # stable under repartitioning (unlike df.sample)
        assert 0.35 * 300 < len(a) < 0.65 * 300
        # monotone in rate: the 0.5 sample contains the 0.2 sample
        c = {r.doc_id for r in sample.hash_sample(corpus_docs, "doc_id", 0.2).collect()}
        assert c <= set(a)

    def test_edge_rates(self, corpus_docs):
        from kafka_graphs_spark.pipeline import sample

        assert sample.hash_sample(corpus_docs, "doc_id", 1.0).count() == 300
        assert sample.hash_sample(corpus_docs, "doc_id", 0.0).count() == 0

    def test_salt_gives_independent_draw(self, corpus_docs):
        from kafka_graphs_spark.pipeline import sample

        a = {r.doc_id for r in sample.hash_sample(corpus_docs, "doc_id", 0.5, salt="x").collect()}
        b = {r.doc_id for r in sample.hash_sample(corpus_docs, "doc_id", 0.5, salt="y").collect()}
        assert a != b

    def test_stratified_rates(self, corpus_docs):
        from kafka_graphs_spark.pipeline import sample

        out = sample.stratified_sample(
            corpus_docs, "doc_id", "source", {"web": 1.0, "books": 0.0}, default_rate=0.5
        )
        per = {r["source"]: r["n"] for r in out.groupBy("source").agg(
            F.count(F.lit(1)).alias("n")).collect()}
        assert per.get("web") == 100
        assert "books" not in per
        assert 25 < per.get("code", 0) < 75
        assert out.columns == corpus_docs.columns

    def test_mixture_rates_realize_weights(self, corpus_docs):
        from kafka_graphs_spark.pipeline import sample

        # equal thirds in the data; ask for 2:1:1 -> web binds at rate 1.0,
        # books/code each at 50 docs expected
        rates = sample.mixture_rates(corpus_docs, "source", {"web": 2, "books": 1, "code": 1})
        assert rates["web"] == 1.0
        assert abs(rates["books"] - 0.5) < 1e-12 and abs(rates["code"] - 0.5) < 1e-12
        # zero/absent weight -> rate 0
        rates2 = sample.mixture_rates(corpus_docs, "source", {"web": 1})
        assert rates2["books"] == 0.0 and rates2["code"] == 0.0

    def test_split_is_exact_partition(self, corpus_docs):
        from kafka_graphs_spark.pipeline import sample

        out = sample.split_train_eval(corpus_docs, "doc_id", 0.25)
        n = out.count()
        assert n == 300
        per = {r["split"]: r["n"] for r in out.groupBy("split").agg(
            F.count(F.lit(1)).alias("n")).collect()}
        assert per["eval"] + per["train"] == 300
        assert 0.1 * 300 < per["eval"] < 0.4 * 300


class TestPackSequences:
    def test_known_layout(self, spark):
        from kafka_graphs_spark.pipeline import sample

        rows = [(1, "s", 5), (2, "s", 7), (3, "s", 2), (4, "s", 9), (5, "t", 11)]
        df = spark.createDataFrame(rows, "doc_id long, source string, n long")
        out = {
            r.doc_id: (r.seq_id, r.begin_offset)
            for r in sample.pack_sequences(df, budget=10, length_col="n", group_col="source").collect()
        }
        # prefix sums within 's': 0, 5, 12, 14 -> seqs 0,0,1,1
        assert out[1] == (0, 0)
        assert out[2] == (0, 5)
        assert out[3] == (1, 2)
        assert out[4] == (1, 4)
        assert out[5] == (0, 0)  # independent group

    def test_conservation(self, spark):
        """Total packed length is conserved: last doc's prefix+len == sum."""
        from kafka_graphs_spark.pipeline import sample

        rows = [(i, "g", (i * 37) % 13 + 1) for i in range(200)]
        df = spark.createDataFrame(rows, "doc_id long, source string, n long")
        out = sample.pack_sequences(df, budget=64, length_col="n", group_col="source")
        last = out.orderBy(F.desc("doc_id")).first()
        total = df.agg(F.sum("n")).first()[0]
        assert last.seq_id * 64 + last.begin_offset + last.n == total


class TestPii:
    @pytest.fixture(scope="class")
    def pii_docs(self, spark):
        rows = [
            (1, "contact alice@example.com or bob.smith@corp.co.uk today"),
            (2, "server at 192.168.0.1 and 10.0.0.255 responded"),
            (3, "call +1 (555) 123-4567 now"),
            (4, "ssn 123-45-6789 leaked"),
            (5, "nothing sensitive here"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_counts(self, pii_docs):
        from kafka_graphs_spark.pipeline import text as t

        got = {r.doc_id: r for r in t.pii_stats(pii_docs).collect()}
        assert got[1].n_email == 2 and got[1].n_pii == 2
        assert got[2].n_ipv4 == 2
        assert got[3].n_phone == 1
        assert got[4].n_ssn == 1
        assert got[5].n_pii == 0

    def test_redact(self, pii_docs):
        from kafka_graphs_spark.pipeline import text as t

        got = {r.doc_id: r.redacted for r in t.pii_redact(pii_docs).collect()}
        assert got[1] == "contact <EMAIL> or <EMAIL> today"
        assert got[2] == "server at <IPV4> and <IPV4> responded"
        assert "<PHONE>" in got[3]
        assert got[4] == "ssn <SSN> leaked"
        assert got[5] == "nothing sensitive here"


class TestSourceProfile:
    def test_profile(self, spark):
        from kafka_graphs_spark.pipeline import text as t

        rows = [
            (1, "one two three", "a"),
            (2, "one two three four five", "a"),
            (3, "one", "b"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string, source string")
        got = {r.source: r for r in t.source_profile(df).collect()}
        assert got["a"].n_docs == 2 and got["a"].total_tokens == 8
        assert got["a"].median_tokens == 4.0 and got["a"].mean_tokens == 4.0
        assert got["b"].median_tokens == 1.0


class TestSketchProfile:
    def test_sketch_tracks_exact_on_small_corpus(self, spark):
        from kafka_graphs_spark.pipeline import text as t

        rows = [(i, " ".join(f"w{j}" for j in range(i % 7 + 3)), "a" if i < 40 else "b")
                for i in range(80)]
        df = spark.createDataFrame(rows, "doc_id long, text string, source string")
        got = {r.source: r for r in t.sketch_profile(df).collect()}
        assert got["a"].n_docs == 40 and got["b"].n_docs == 40
        # exact vocab is 9 (w0..w8); HLL at rsd=0.05 is exact at this scale
        assert abs(got["a"].approx_vocab - 9) <= 1
        for r in got.values():
            assert 3 <= r.approx_median_tokens <= 9
            assert r.approx_p90_tokens >= r.approx_median_tokens


class TestCurateGates:
    def test_pii_gate_drops_heavy_docs(self, spark):
        from kafka_graphs_spark.pipeline.curate import curate

        base = "the quick brown fox jumps over the lazy dog and runs far away today"
        rows = [
            (1, base),
            (2, base + " contact a@b.com and c@d.org and e@f.net"),  # 3 PII hits
            (3, base.replace("fox", "cat")),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        kept_open = {r.doc_id for r in curate(docs, min_score=0.0, jaccard_threshold=0.9).collect()}
        kept_gated = {r.doc_id for r in curate(
            docs, min_score=0.0, jaccard_threshold=0.9, max_pii=2
        ).collect()}
        assert 2 in kept_open
        assert kept_gated == kept_open - {2}

    def test_repetition_gate_drops_boilerplate(self, spark):
        from kafka_graphs_spark.pipeline.curate import curate

        rows = [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (2, "spam ham eggs " * 30),  # massive duplicate-trigram mass
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        kept = {r.doc_id for r in curate(
            docs, min_score=0.0, jaccard_threshold=0.9, max_dup_trigram_frac=0.5
        ).collect()}
        assert kept == {1}


class TestHashFractionModel:
    def test_matches_hashlib_reference(self, spark):
        """Pin hash_fraction to the spec: first 8 hex chars of
        md5(str(key)+salt) / 16^8 — guards the conv/substring plumbing."""
        import hashlib

        from kafka_graphs_spark.pipeline import sample

        keys = list(range(0, 2000, 7)) + [0, 1, 2**31, 2**62]
        df = spark.createDataFrame([(k,) for k in keys], "k long")
        got = {
            r.k: r.f
            for r in df.select(
                "k", sample.hash_fraction(F.col("k"), salt="s").alias("f")
            ).collect()
        }
        for k in keys:
            expect = int(hashlib.md5(f"{k}s".encode()).hexdigest()[:8], 16) / 2**32
            assert got[k] == expect, k


class TestEmbeddingDecontamination:
    def test_exact_finds_planted_leak_and_lsh_agrees(self, spark, vectors):
        from kafka_graphs_spark.pipeline import similarity

        # vec 20 is a planted near-duplicate of vec 0: treat 0,1 as the
        # benchmark and the rest as train — 20 must be flagged against 0
        train = vectors.filter(F.col("vec_id") >= 2)
        bench = vectors.filter(F.col("vec_id") < 2)
        out = {r.id: (r.bench_id, r.cos) for r in similarity.embedding_decontamination(
            train, bench, threshold=0.9
        ).collect()}
        assert 20 in out and out[20][0] == 0 and out[20][1] > 0.99
        assert 21 in out and out[21][0] == 1
        # the LSH path finds the same true near-dups (high-cos pairs
        # collide in some table with overwhelming probability)
        lsh = {r.id for r in similarity.embedding_decontamination(
            train, bench, threshold=0.9, method="lsh", n_planes=4, n_tables=4, dim=16
        ).collect()}
        assert {20, 21} <= lsh

    def test_clean_train_passes(self, spark, vectors):
        from kafka_graphs_spark.pipeline import similarity

        train = vectors.filter((F.col("vec_id") >= 2) & (F.col("vec_id") < 20))
        bench = vectors.filter(F.col("vec_id") < 2)
        out = similarity.embedding_decontamination(train, bench, threshold=0.95)
        assert out.count() == 0


class TestCapPerGroup:
    def test_cap_and_determinism(self, spark):
        from kafka_graphs_spark.pipeline import sample

        rows = [(i, ["a", "b"][i % 2]) for i in range(100)]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        out = sample.cap_per_group(df, "source", 7, "doc_id")
        per = {r[0]: r[1] for r in out.groupBy("source").count().collect()}
        assert per == {"a": 7, "b": 7}
        again = sample.cap_per_group(df.repartition(13), "source", 7, "doc_id")
        assert sorted(r.doc_id for r in out.collect()) == sorted(
            r.doc_id for r in again.collect()
        )
        # groups under the cap pass through whole
        small = sample.cap_per_group(df.filter(F.col("doc_id") < 5), "source", 7, "doc_id")
        assert small.count() == 5


class TestReviewRegressions:
    def test_mixture_rates_absent_weighted_stratum(self, spark):
        from kafka_graphs_spark.pipeline import sample

        df = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, source string")
        rates = sample.mixture_rates(df, "source", {"zzz": 1.0})
        assert rates == {"a": 0.0, "b": 0.0}

    def test_batch_dedup_first_wins_with_time_col(self, spark):
        import datetime

        from kafka_graphs_spark.pipeline.dedup import streaming_exact_dedup

        t0, t1 = datetime.datetime(2026, 1, 1), datetime.datetime(2026, 1, 2)
        df = spark.createDataFrame(
            [(7, "x y z", t1), (3, "x  Y z!", t0), (9, "other", t1)],
            "doc_id long, text string, ts timestamp",
        )
        for d in (df, df.repartition(5)):
            out = streaming_exact_dedup(d, time_col="ts")
            kept = sorted(r.doc_id for r in out.collect())
            assert kept == [3, 9]  # earliest wins deterministically


class TestChunkText:
    def test_known_windows(self, spark):
        from kafka_graphs_spark.pipeline import text as t

        df = spark.createDataFrame([(1, "abcdefghijk"), (2, "xy"), (3, "")],
                                   "doc_id long, text string")
        out = {(r.doc_id, r.chunk_id): r.chunk for r in t.chunk_text(df, size=4, overlap=1).collect()}
        # doc 1 (n=11, stride 3): starts 1,4,7,10 -> abcd, defg, ghij, jk
        assert out == {
            (1, 0): "abcd", (1, 1): "defg", (1, 2): "ghij", (1, 3): "jk",
            (2, 0): "xy",
        }

    def test_no_overlap_partitions_text(self, spark):
        from kafka_graphs_spark.pipeline import text as t

        df = spark.createDataFrame([(1, "a" * 1000 + "b" * 23)], "doc_id long, text string")
        out = t.chunk_text(df, size=100)
        rows = sorted((r.chunk_id, r.chunk) for r in out.collect())
        assert len(rows) == 11
        assert "".join(c for _, c in rows) == "a" * 1000 + "b" * 23

    def test_bad_params(self, spark):
        from kafka_graphs_spark.pipeline import text as t

        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        for kw in ({"size": 0}, {"size": 4, "overlap": 4}, {"size": 4, "overlap": -1}):
            with pytest.raises(ValueError):
                t.chunk_text(df, **kw)


class TestReviewRegressions2:
    def test_null_time_loses_to_real_time(self, spark):
        import datetime

        from kafka_graphs_spark.pipeline.dedup import streaming_exact_dedup

        t = datetime.datetime(2026, 1, 1)
        df = spark.createDataFrame(
            [(7, "x y z", None), (3, "x  Y z!", t)],
            "doc_id long, text string, ts timestamp",
        )
        kept = [r.doc_id for r in streaming_exact_dedup(df, time_col="ts").collect()]
        assert kept == [3]

    def test_map_columns_survive_batch_dedup(self, spark):
        import datetime

        from kafka_graphs_spark.pipeline.dedup import streaming_exact_dedup

        t0, t1 = datetime.datetime(2026, 1, 1), datetime.datetime(2026, 1, 2)
        df = spark.createDataFrame(
            [(1, "a b", t1, {"k": "late"}), (2, "a  b", t0, {"k": "early"}), (3, "c", t0, {})],
            "doc_id long, text string, ts timestamp, meta map<string,string>",
        )
        out = {r.doc_id: r.meta for r in streaming_exact_dedup(df, time_col="ts").collect()}
        assert set(out) == {2, 3} and out[2] == {"k": "early"}

    def test_collect_summaries_respects_caller_cache(self, spark):
        import pickle

        from pyspark.storagelevel import StorageLevel

        from kafka_graphs_spark.streaming.aggregations import collect_summaries

        df = spark.createDataFrame(
            [(0, pickle.dumps({"x": 1}))], "window_start long, summary binary"
        ).persist(StorageLevel.MEMORY_ONLY)
        df.count()
        got = collect_summaries(df)
        assert got == {0: {"x": 1}}
        assert df.storageLevel != StorageLevel.NONE  # caller's cache intact
        df.unpersist()


class TestCrossSourceDedup:
    def test_exact_cross_source(self, spark):
        from kafka_graphs_spark.pipeline.dedup import cross_source_duplicates

        docs = spark.createDataFrame(
            [
                (1, "Hello   world", "a"),
                (2, "hello world!", "b"),    # same fp, other source
                (3, "hello world", "a"),     # same fp, same source as 1
                (4, "something else", "a"),
            ],
            "doc_id long, text string, source string",
        )
        out = cross_source_duplicates(docs).collect()
        assert len(out) == 1
        r = out[0]
        assert (r["n_docs"], r["n_sources"], r["keep_doc_id"]) == (3, 2, 1)

    def test_same_source_dups_excluded(self, spark):
        from kafka_graphs_spark.pipeline.dedup import cross_source_duplicates

        docs = spark.createDataFrame(
            [(1, "dup text", "a"), (2, "dup text", "a")],
            "doc_id long, text string, source string",
        )
        assert cross_source_duplicates(docs).count() == 0

    def test_near_dup_profile(self, spark):
        from kafka_graphs_spark.pipeline.dedup import (
            cross_source_near_duplicate_profile,
        )

        # identical token streams -> simhash distance 0 -> near pair
        docs = spark.createDataFrame(
            [
                (1, "alpha beta gamma delta", "a"),
                (2, "alpha beta gamma delta", "b"),
                (3, "completely different words here entirely", "c"),
            ],
            "doc_id long, text string, source string",
        )
        out = cross_source_near_duplicate_profile(docs).collect()
        assert [(r["source_a"], r["source_b"], r["n_pairs"]) for r in out] == [
            ("a", "b", 1)
        ]


class TestUnigramLogprob:
    def test_hand_computed(self, spark):
        import math

        from kafka_graphs_spark.pipeline.text import unigram_logprob

        docs = spark.createDataFrame(
            [(1, "a a b"), (2, "b c"), (3, "")],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in unigram_logprob(docs).collect()}
        # counts: a=2, b=2, c=1, T=5
        nl = lambda c: -math.log(c / 5)
        assert out[1]["n_tokens"] == 3
        assert out[1]["avg_neg_logprob"] == pytest.approx((2 * nl(2) + nl(2)) / 3)
        assert out[2]["avg_neg_logprob"] == pytest.approx((nl(2) + nl(1)) / 2)
        assert out[3]["n_tokens"] == 0 and out[3]["avg_neg_logprob"] is None

    def test_rare_tokens_score_higher(self, spark):
        from kafka_graphs_spark.pipeline.text import unigram_logprob

        docs = spark.createDataFrame(
            [(1, "common common common common"), (2, "zxqv")],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r["avg_neg_logprob"] for r in unigram_logprob(docs).collect()}
        assert out[2] > out[1]


class TestScalarQuantization:
    def test_roundtrip_error_bound(self, spark):
        from kafka_graphs_spark.pipeline.similarity import dequantize, scalar_quantize

        vecs = spark.createDataFrame(
            [(1, [0.0, 1.0, 0.5, -1.0]), (2, [3.0, 3.0, 3.0]), (3, [2.5])],
            "vec_id long, embedding array<float>",
        )
        q = scalar_quantize(vecs, levels=256)
        d = {r["vec_id"]: r["embedding"] for r in dequantize(q, levels=256).collect()}
        orig = {r["vec_id"]: r["embedding"] for r in vecs.collect()}
        for vid, v in orig.items():
            lo, hi = min(v), max(v)
            bound = (hi - lo) / (2 * 255) + 1e-9
            for a, b in zip(v, d[vid]):
                assert abs(a - b) <= bound
        # constant vector reconstructs exactly at lo
        assert d[2] == [3.0, 3.0, 3.0]
        assert d[3] == [2.5]

    def test_codes_in_range(self, spark):
        from kafka_graphs_spark.pipeline.similarity import scalar_quantize

        vecs = spark.createDataFrame(
            [(1, [float(i) for i in range(10)])], "vec_id long, embedding array<float>"
        )
        codes = scalar_quantize(vecs, levels=4).collect()[0]["codes"]
        assert min(codes) == 0 and max(codes) == 3

    def test_param_guard(self, spark):
        from kafka_graphs_spark.pipeline.similarity import scalar_quantize

        vecs = spark.createDataFrame([(1, [1.0])], "vec_id long, embedding array<float>")
        with pytest.raises(ValueError):
            scalar_quantize(vecs, levels=1)


class TestKnnGraph:
    @pytest.fixture
    def vecs(self, spark):
        rows = [
            (1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0]), (4, [0.1, 0.9]),
        ]
        return spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def test_exact_k1(self, vecs):
        from kafka_graphs_spark.pipeline.similarity import knn_graph

        got = {(r["src"], r["dst"]) for r in knn_graph(vecs, k=1).collect()}
        assert got == {(1, 2), (2, 1), (3, 4), (4, 3)}

    def test_mutual_filters_one_way_edges(self, spark):
        from kafka_graphs_spark.pipeline.similarity import knn_graph

        rows = [
            (1, [1.0, 0.0]), (2, [0.9, 0.1]),
            (3, [0.6, 0.45]),  # 3's nearest is 2, but 2's nearest is 1
        ]
        vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        allk = {(r["src"], r["dst"]) for r in knn_graph(vecs, k=1).collect()}
        mut = {(r["src"], r["dst"]) for r in knn_graph(vecs, k=1, mutual=True).collect()}
        assert (3, 2) in allk and (2, 3) not in allk
        assert mut == {(1, 2), (2, 1)}

    def test_param_guard(self, vecs):
        from kafka_graphs_spark.pipeline.similarity import knn_graph

        with pytest.raises(ValueError):
            knn_graph(vecs, method="hnsw")
