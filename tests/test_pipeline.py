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
