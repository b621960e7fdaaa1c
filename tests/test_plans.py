"""Physical-plan audits — the scale disciplines as executable assertions.

Each test inspects the EXECUTED plan of a representative operator and pins
the property that makes it 100 TB-credible: filters reach the parquet scan,
hot paths stay JVM-side (no row-at-a-time Python), aggregations are
partial (map-side combine), and candidate generation never degenerates to
a cartesian/nested-loop join.
"""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


class TestPushdownAndPruning:
    def test_filter_reaches_parquet_scan(self, spark):
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        q = li.filter(F.col("l_quantity") > 40).select("l_suppkey")
        plan = executed_plan(q)
        assert "PushedFilters: [" in plan and "GreaterThan(l_quantity" in plan

    def test_column_pruning_in_scan(self, spark):
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        q = li.select("l_suppkey", "l_partkey")
        plan = executed_plan(q)
        # ReadSchema carries only the projected columns
        read = plan.split("ReadSchema:")[1].splitlines()[0]
        assert "l_suppkey" in read and "l_partkey" in read
        assert "l_comment" not in read and "l_quantity" not in read


class TestJvmSideHotPaths:
    def test_text_pipeline_has_no_python(self, docs):
        from kafka_graphs_spark.pipeline import text

        # note: higher-order array lambdas (transform/filter/aggregate) run
        # JVM-side but outside whole-stage codegen, so the pinned property
        # is "no Python", not "codegen everywhere"
        for op in (text.token_count, text.language_id, text.quality_score,
                   text.fingerprint):
            plan = executed_plan(op(docs))
            assert "BatchEvalPython" not in plan, op.__name__

    def test_dedup_pipeline_has_no_python(self, docs):
        from kafka_graphs_spark.pipeline import dedup

        for df in (
            dedup.exact_duplicates(docs),
            dedup.minhash_lsh_candidates(docs, num_hashes=8, bands=2),
            dedup.simhash(docs, bits=16),
        ):
            plan = executed_plan(df)
            assert "BatchEvalPython" not in plan

    def test_graph_algebra_has_no_python(self, spark):
        from kafka_graphs_spark import datasets

        g = datasets.supplier_part_graph(spark, SF)
        plan = executed_plan(g.out_degrees())
        assert "BatchEvalPython" not in plan


class TestPartialAggregation:
    def test_degrees_combine_map_side(self, spark):
        from kafka_graphs_spark import datasets

        g = datasets.supplier_part_graph(spark, SF)
        plan = executed_plan(g.out_degrees())
        # partial + final HashAggregate pair around the exchange
        assert plan.count("HashAggregate") >= 2

    def test_minhash_min_combines_map_side(self, docs):
        from kafka_graphs_spark.pipeline import dedup

        plan = executed_plan(dedup.minhash_signatures(docs, num_hashes=8))
        # string mins fall back to SortAggregate (variable-width buffers
        # aren't hash-aggregable); the pinned property is the map-side
        # partial_min BEFORE the exchange, whatever the aggregate impl
        assert "partial_min" in plan
        assert plan.count("SortAggregate") + plan.count("HashAggregate") >= 2


class TestNoAllPairsJoins:
    def test_lsh_near_dup_is_equi_join(self, emb):
        from kafka_graphs_spark.pipeline import similarity

        df = similarity.embedding_near_duplicates(
            emb, threshold=0.8, method="lsh", n_planes=4, n_tables=2, dim=64
        )
        plan = executed_plan(df)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_minhash_lsh_candidates_equi_join(self, docs):
        from kafka_graphs_spark.pipeline import dedup

        plan = executed_plan(dedup.minhash_lsh_candidates(docs, num_hashes=8, bands=2))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_ivf_candidates_equi_join(self, emb):
        from kafka_graphs_spark.pipeline import similarity

        df = similarity.ivf_topk(
            emb, emb.filter(F.col("vec_id") < 3), k=3, n_cells=4, n_probe=2, dim=64
        )
        plan = executed_plan(df)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_triangles_use_semi_join_closure(self, spark):
        from kafka_graphs_spark import datasets
        from kafka_graphs_spark.streaming import exact_triangle_count

        plan = executed_plan(exact_triangle_count(datasets.hierarchy_edges(spark, SF)))
        assert "CartesianProduct" not in plan
        assert "LeftSemi" in plan


class TestCorpusTextOpPlans:
    def test_corpus_ops_stay_jvm_side(self, docs):
        from kafka_graphs_spark.pipeline import text

        for df in (
            text.normalize_text(docs),
            text.vocabulary(docs),
            text.tfidf_keywords(docs, k=3),
            text.bigram_counts(docs),
        ):
            assert "BatchEvalPython" not in executed_plan(df)

    def test_vocab_and_bigrams_combine_map_side(self, docs):
        from kafka_graphs_spark.pipeline import text

        # explode → groupBy count must partial-aggregate before the
        # exchange: the shuffle carries (token, count), not raw tokens
        assert executed_plan(text.vocabulary(docs)).count("HashAggregate") >= 2
        assert executed_plan(text.bigram_counts(docs)).count("HashAggregate") >= 2

    def test_corpus_ops_prune_document_columns(self, docs):
        from kafka_graphs_spark.pipeline import text

        plan = executed_plan(text.vocabulary(docs))
        read = plan.split("ReadSchema:")[1].splitlines()[0]
        # only doc_id + text reach the scan; lang/source/n_chars pruned
        assert "text" in read
        assert "lang" not in read and "source" not in read and "n_chars" not in read

    def test_tfidf_broadcasts_the_small_sides(self, docs):
        from kafka_graphs_spark.pipeline import text

        # df (vocab-sized) and N (1 row) are broadcast — the tf side
        # (corpus-sized) never shuffles for the join
        plan = executed_plan(text.tfidf_keywords(docs, k=3))
        assert plan.count("BroadcastExchange") >= 2
        assert "CartesianProduct" not in plan


class TestWindowedStreamPlans:
    def test_windowed_reduce_partial_aggregates(self, spark):
        from kafka_graphs_spark.streaming import EdgeStream

        df = spark.createDataFrame(
            [(1, 2, 1.0, "2026-01-01 00:00:05")],
            "src long, dst long, value double, event_time string",
        ).withColumn("event_time", F.to_timestamp("event_time"))
        for kw in ({}, {"slide": "30 minutes"}):
            out = EdgeStream(df).slice("1 hour", **kw).reduce_on_edges("sum")
            plan = executed_plan(out)
            assert "BatchEvalPython" not in plan
            assert plan.count("HashAggregate") >= 2


class TestSamplingTierPlans:
    def test_hash_sample_is_narrow_and_pruned(self, docs):
        from kafka_graphs_spark.pipeline import sample

        q = sample.hash_sample(docs, "doc_id", 0.5).select("doc_id")
        plan = executed_plan(q)
        assert "BatchEvalPython" not in plan
        assert "Exchange" not in plan  # pure filter: no shuffle at all
        read = plan.split("ReadSchema:")[1].splitlines()[0]
        assert "text" not in read  # only doc_id scanned

    def test_stratified_sample_broadcasts_rates(self, docs):
        from kafka_graphs_spark.pipeline import sample

        q = sample.stratified_sample(
            docs, "doc_id", "source", {"src0": 0.5, "src1": 0.2}
        )
        plan = executed_plan(q)
        assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
        assert "SortMergeJoin" not in plan
        assert "BatchEvalPython" not in plan

    def test_pack_sequences_single_shuffle_on_group_key(self, docs):
        from kafka_graphs_spark.pipeline import sample

        q = sample.pack_sequences(
            docs, budget=2048, length_col="n_chars", group_col="source"
        )
        plan = executed_plan(q)
        assert "BatchEvalPython" not in plan
        # one hash-partitioning exchange for the window, nothing else
        assert plan.count("Exchange hashpartitioning") == 1
        read = plan.split("ReadSchema:")[1].splitlines()[0]
        assert "text" not in read

    def test_pii_ops_stay_jvm_side(self, docs):
        from kafka_graphs_spark.pipeline import text

        for op in (text.pii_stats, text.pii_redact):
            plan = executed_plan(op(docs))
            assert "BatchEvalPython" not in plan
            assert "Exchange" not in plan  # narrow per-row regexp work

    def test_source_profile_combines_map_side(self, docs):
        from kafka_graphs_spark.pipeline import text

        plan = executed_plan(text.source_profile(docs))
        assert "BatchEvalPython" not in plan
        # partial (map-side) aggregation before the exchange
        assert plan.count("HashAggregate") >= 2 or "ObjectHashAggregate" in plan


class TestHitsPlan:
    def test_hits_joins_are_equi_and_sums_combine(self, spark):
        from kafka_graphs_spark import datasets
        from kafka_graphs_spark.library.hits import _hits_frame

        g = datasets.supplier_part_graph(spark, SF)
        # audit the pre-checkpoint plan (hits() materializes its result)
        plan = executed_plan(
            _hits_frame(g.vertices, g.edges.select("src", "dst"), iterations=2)
        )
        assert "BatchEvalPython" not in plan
        assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
        # every gather is a partial (map-side) sum before its exchange
        assert plan.count("HashAggregate") >= 8  # 2 per gather × 4 gathers

    def test_sketch_profile_partial_aggregates_no_python(self, docs):
        from kafka_graphs_spark.pipeline import text

        plan = executed_plan(text.sketch_profile(docs))
        assert "BatchEvalPython" not in plan
        # HLL + KLL are ObjectHashAggregate sketches with a partial phase
        assert "ObjectHashAggregate" in plan
        assert "partial_approx_count_distinct" in plan or "partial" in plan.lower()


class TestWalkAndKatzPlans:
    def test_katz_terms_are_equi_joins_with_partial_sums(self, spark):
        from kafka_graphs_spark import datasets
        from kafka_graphs_spark.library.hits import _katz_frame

        g = datasets.supplier_part_graph(spark, SF)
        # audit the PRE-checkpoint plan (katz_centrality materializes)
        plan = executed_plan(
            _katz_frame(g.vertices, g.edges.select("src", "dst"), 0.125, 3)
        )
        assert "BatchEvalPython" not in plan
        assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
        # per-term sums partial-aggregate; the final total is ONE aggregation
        assert plan.count("HashAggregate") >= 6

    def test_walk_step_is_equi_join_no_cartesian(self, spark):
        from pyspark.sql.window import Window

        from kafka_graphs_spark import datasets

        # reproduce one walk step's plan shape (the operators materialize
        # their outputs, so build the step expression directly)
        g = datasets.supplier_part_graph(spark, SF)
        e = g.edges.select("src", "dst").distinct()
        ranked = e.withColumn(
            "_idx", F.row_number().over(Window.partitionBy("src").orderBy("dst")) - 1
        )
        degs = e.groupBy("src").agg(F.count(F.lit(1)).alias("_deg"))
        frontier = g.vertices.select(
            F.col("id").cast("string").alias("walk_id"),
            F.col("id").alias("start"), F.col("id").alias("vertex"),
        )
        draw = F.conv(F.substring(F.md5(F.col("walk_id")), 1, 8), 16, 10).cast("long")
        step = (
            frontier.join(degs, frontier["vertex"] == degs["src"])
            .select("walk_id", "start", "vertex", (draw % F.col("_deg")).alias("_i"))
            .join(ranked, on=[F.col("vertex") == ranked["src"], F.col("_i") == ranked["_idx"]])
            .select("walk_id", "start", F.col("dst").alias("vertex"))
        )
        plan = executed_plan(step)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "BatchEvalPython" not in plan


class TestRound4OperatorPlans:
    def test_projection_and_motifs_no_python_no_cartesian(self, spark):
        from kafka_graphs_spark import datasets
        from kafka_graphs_spark.library import (
            bipartite_projection,
            ppmi,
            triangle_motif_census,
        )

        g = datasets.supplier_part_graph(spark, SF)
        proj = bipartite_projection(g, onto="src")
        for df in (proj, ppmi(proj), triangle_motif_census(g)):
            plan = executed_plan(df)
            assert "BatchEvalPython" not in plan
            assert "CartesianProduct" not in plan
            assert "BroadcastNestedLoopJoin" not in plan

    def test_projection_count_combines_map_side(self, spark):
        from kafka_graphs_spark import datasets
        from kafka_graphs_spark.library import bipartite_projection

        g = datasets.supplier_part_graph(spark, SF)
        plan = executed_plan(bipartite_projection(g, onto="src"))
        assert plan.count("HashAggregate") >= 2

    def test_sessionize_single_user_shuffle(self, spark):
        from kafka_graphs_spark.pipeline.sessions import session_stats

        ev = spark.read.parquet(f"{SF}/events.parquet")
        df = session_stats(ev, gap_minutes=30)
        plan = executed_plan(df)
        assert "BatchEvalPython" not in plan
        # ONE exchange on user_id: the window sort and the per-session
        # aggregation reuse the same hash partitioning
        assert plan.count("Exchange hashpartitioning(user_id") == 1

    def test_quantize_no_python(self, emb):
        from kafka_graphs_spark.pipeline.similarity import dequantize, scalar_quantize

        q = scalar_quantize(emb)
        for df in (q, dequantize(q)):
            assert "BatchEvalPython" not in executed_plan(df)

    def test_unigram_logprob_broadcasts_freq_table(self, docs):
        from kafka_graphs_spark.pipeline.text import unigram_logprob

        plan = executed_plan(unigram_logprob(docs))
        assert "BatchEvalPython" not in plan
        assert "BroadcastHashJoin" in plan


class TestRound6Plans:
    def test_ivfpq_no_python_and_broadcast_query_side(self, spark, emb):
        from kafka_graphs_spark.pipeline.similarity import ivfpq_topk

        df = ivfpq_topk(
            emb, emb.filter(F.col("vec_id") < 3),
            k=3, n_cells=8, n_probe=3, m=8, n_centroids=16, dim=64, rerank=20,
        )
        plan = executed_plan(df)
        assert "BatchEvalPython" not in plan and "PythonUDF" not in plan
        assert "BroadcastHashJoin" in plan        # query tables broadcast
        assert "CartesianProduct" not in plan

    def test_duplicated_spans_partial_count_digest_join(self, spark, docs):
        from kafka_graphs_spark.pipeline.dedup import duplicated_spans

        plan = executed_plan(duplicated_spans(docs, w=8))
        assert "BatchEvalPython" not in plan
        # digest count combines map-side before the shuffle
        assert "partial_count" in plan or "partial count" in plan.lower()
        assert "CartesianProduct" not in plan

    def test_neighborhood_features_partial_sum_per_dim(self, spark, emb):
        from kafka_graphs_spark.pipeline.features import neighborhood_features
        from kafka_graphs_spark.pipeline.similarity import knn_graph

        knn = knn_graph(emb, k=3, method="exact").select("src", "dst")
        plan = executed_plan(neighborhood_features(knn, emb))
        assert "BatchEvalPython" not in plan
        assert "partial_sum" in plan or "partial sum" in plan.lower()

    def test_semantic_dedup_pairs_only_within_clusters(self, spark, emb):
        from kafka_graphs_spark.pipeline.similarity import semantic_dedup

        plan = executed_plan(semantic_dedup(emb, 0.5, n_clusters=8, dim=64))
        # the pair stage is an equi-join on the cluster key, never all-pairs
        assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
        assert "BatchEvalPython" not in plan

    def test_windowed_triangles_window_key_in_joins(self, spark):
        import datetime

        from kafka_graphs_spark.streaming import triangles_windowed

        t0 = datetime.datetime(2024, 1, 1, 0, 30)
        edges = spark.createDataFrame(
            [(1, 2, t0), (2, 3, t0), (1, 3, t0)],
            "src long, dst long, event_time timestamp",
        )
        plan = executed_plan(triangles_windowed(edges, "1 hour"))
        # wedge-close joins carry the window key (ws appears in join keys),
        # and nothing degenerates to a cartesian
        assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan

    def test_hyperanf_round_partial_max_no_python(self, spark):
        from kafka_graphs_spark.graph import Graph
        from kafka_graphs_spark.library import hyperanf

        edges = spark.createDataFrame(
            [(0, 1, 1.0), (1, 2, 1.0)], "src long, dst long, value double"
        )
        # run one round; the merged-counter plan is checkpointed per round,
        # so audit the register-merge aggregation shape on a fresh build
        df = hyperanf(Graph.from_edges(edges, F.lit(0.0)), p=5, max_iterations=1)
        assert df.count() >= 1  # materialized without error
        # audit the merge shape directly
        from kafka_graphs_spark.library.hyperanf import _init_registers

        cur = edges.select(F.col("src").alias("id"),
                           _init_registers(F.col("src"), 5).alias("regs"))
        merged = (
            cur.select("id", F.posexplode("regs").alias("j", "r"))
            .groupBy("id", "j")
            .agg(F.max("r").alias("r"))
        )
        plan = executed_plan(merged)
        assert "BatchEvalPython" not in plan
        assert "partial_max" in plan or "partial max" in plan.lower()

    def test_bpe_pair_count_partial_no_python(self, spark, docs):
        from kafka_graphs_spark.pipeline.bpe import _char_symbols

        cur = docs.select(F.col("text"), _char_symbols(F.col("text")).alias("symbols"))
        pairs = cur.select(
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
            ).alias("p")
        ).groupBy("p.l", "p.r").agg(F.count(F.lit(1)).alias("c"))
        plan = executed_plan(pairs)
        assert "BatchEvalPython" not in plan
        assert "partial_count" in plan or "partial count" in plan.lower()

    def test_weighted_sample_two_stage_topn(self, spark, docs):
        from kafka_graphs_spark.pipeline.sample import weighted_sample

        df = docs.withColumn("w", F.length("text").cast("double"))
        plan = executed_plan(weighted_sample(df, "doc_id", "w", 10))
        # stage 1 ranks inside 64 hash buckets (partitioned window),
        # stage 2's global window sees only the bounded survivors
        assert plan.count("Window") >= 2
        assert "_kgs_b" in plan  # bucket key partitions the first window
        assert "BatchEvalPython" not in plan


class TestGraphStatsPlans:
    def _hier(self, spark):
        from kafka_graphs_spark.datasets import hierarchy_graph

        return hierarchy_graph(spark, "/root/testdata/sf0.001")

    def test_rich_club_histograms_partial_agg_no_python(self, spark):
        from kafka_graphs_spark.library import rich_club

        plan = executed_plan(rich_club(self._hier(spark)))
        # histogram aggregations are partial (map-side combined) and the
        # threshold theta-joins ride broadcast of the tiny histograms —
        # no sort-merge over the full edge set against the k list
        assert "HashAggregate" in plan
        assert "BroadcastNestedLoopJoin" in plan
        assert "BatchEvalPython" not in plan

    def test_conductance_equi_joins_no_python(self, spark):
        from kafka_graphs_spark.library import conductance
        from pyspark.sql import functions as F

        g = self._hier(spark)
        lab = g.vertices.select("id", (F.col("id") % 4).alias("value"))
        plan = executed_plan(conductance(g, lab))
        assert "HashAggregate" in plan
        assert "BatchEvalPython" not in plan
        assert "CartesianProduct" not in plan


class TestTemporalPathPlans:
    def test_earliest_arrival_equi_join_no_python(self, spark):
        from kafka_graphs_spark import Graph
        from kafka_graphs_spark.library import temporal_earliest_arrival
        from pyspark.sql import functions as F

        e = spark.createDataFrame(
            [(1, 2, 10), (2, 3, 20), (3, 4, 30)], "src long, dst long, value long"
        )
        out = temporal_earliest_arrival(Graph.from_edges(e, F.lit(0)), 1)
        plan = executed_plan(out)
        # the temporal gate (t >= arrival) must ride the src equi-join as
        # a post-join filter, not degrade it to a nested-loop join
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "BatchEvalPython" not in plan

    def test_latest_departure_equi_join_no_python(self, spark):
        from kafka_graphs_spark import Graph
        from kafka_graphs_spark.library import temporal_latest_departure
        from pyspark.sql import functions as F

        e = spark.createDataFrame(
            [(1, 2, 10), (2, 3, 20), (3, 4, 30)], "src long, dst long, value long"
        )
        out = temporal_latest_departure(Graph.from_edges(e, F.lit(0)), 4, 100)
        plan = executed_plan(out)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "BatchEvalPython" not in plan


class TestRound7AdditionPlans:
    """Scale disciplines of the round-7 curation/event/retrieval tier."""

    def test_ppl_buckets_window_partitioned_by_source(self, spark, docs):
        from kafka_graphs_spark.pipeline.text import perplexity_buckets

        plan = executed_plan(perplexity_buckets(docs))
        # the ntile window must partition by source (widest window = one
        # group, never the corpus) and stay Python-free
        assert "windowspecdefinition(source" in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_token_budget_window_partitioned_by_stratum(self, spark, docs):
        from kafka_graphs_spark.pipeline.sample import token_budget_sample
        from kafka_graphs_spark.pipeline.text import token_count

        sized = docs.join(token_count(docs), on="doc_id")
        plan = executed_plan(
            token_budget_sample(sized, 600, "n_tokens", "source")
        )
        assert "windowspecdefinition(source" in plan
        assert "BatchEvalPython" not in plan

    def test_event_transitions_single_user_shuffle(self, spark):
        from kafka_graphs_spark.pipeline.events import event_transitions

        ev = spark.read.parquet(f"{SF}/events.parquet")
        plan = executed_plan(event_transitions(ev))
        # one shuffle keys the lead() window on user_id; the pair count
        # combines map-side (partial_count before the exchange)
        assert plan.count("Exchange hashpartitioning(user_id") == 1
        assert "partial_count" in plan
        assert "BatchEvalPython" not in plan

    def test_session_funnel_no_nested_loops(self, spark):
        from kafka_graphs_spark.pipeline.sessions import session_funnel

        ev = spark.read.parquet(f"{SF}/events.parquet")
        plan = executed_plan(session_funnel(ev, gap_minutes=720))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "BatchEvalPython" not in plan

    def test_retrieval_metrics_kbounded_no_python(self, spark, docs):
        from kafka_graphs_spark.pipeline.text import bm25_scores, retrieval_metrics

        q = spark.createDataFrame(
            [(0, "hash join shuffle")], "query_id long, query_text string"
        )
        ranked = bm25_scores(docs, q, k=10)
        rels = docs.select(F.lit(0).cast("long").alias("query_id"), "doc_id")
        plan = executed_plan(retrieval_metrics(ranked, rels, k=10))
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_domain_extraction_zero_shuffle(self, docs):
        from kafka_graphs_spark.pipeline.domains import (
            domain_blocklist,
            extract_domains,
        )

        urls = docs.select(
            "doc_id",
            F.concat(F.lit("https://www.site"), F.col("doc_id") % 7,
                     F.lit(".co.uk/p")).alias("url"),
            "text",
        )
        # pure per-row exprs: no Exchange, no Python anywhere
        for df in (
            extract_domains(urls),
            domain_blocklist(urls, ["site1.co.uk", "site2.co.uk"]),
        ):
            plan = executed_plan(df)
            assert "Exchange" not in plan
            assert "BatchEvalPython" not in plan
            assert "ArrowEvalPython" not in plan

    def test_domain_stats_single_shuffle_partial_agg(self, docs):
        from kafka_graphs_spark.pipeline.domains import domain_stats

        urls = docs.select(
            "doc_id",
            F.concat(F.lit("https://www.site"), F.col("doc_id") % 7,
                     F.lit(".co.uk/p")).alias("url"),
            "text",
        )
        plan = executed_plan(domain_stats(urls))
        # one shuffle on the domain key (plus the broadcast'd scalar);
        # map-side partial aggregation before it
        assert plan.count("Exchange hashpartitioning") == 1
        assert "partial_count" in plan or "HashAggregate" in plan
        assert "BatchEvalPython" not in plan

    def test_domain_quality_profile_one_pass(self, docs):
        from kafka_graphs_spark.pipeline.domains import domain_quality_profile

        urls = docs.select(
            "doc_id",
            F.concat(F.lit("https://www.site"), F.col("doc_id") % 7,
                     F.lit(".co.uk/p")).alias("url"),
            "text",
        )
        plan = executed_plan(domain_quality_profile(urls))
        # single corpus pass: exactly one agg shuffle, no join at all
        assert plan.count("Exchange hashpartitioning") == 1
        assert "Join" not in plan
        assert "BatchEvalPython" not in plan


class TestRound10Plans:
    """Plan audits for the round-10 operators."""

    def test_domain_token_budget_single_shuffle(self, docs):
        from kafka_graphs_spark.pipeline.domains import domain_token_budget

        d = docs.withColumn(
            "url",
            F.concat(F.lit("https://s"), (F.col("doc_id") % 5).cast("string"),
                     F.lit(".com/p")),
        )
        plan = executed_plan(domain_token_budget(d, 500))
        # exactly one exchange: the window partitioning on the domain key
        assert plan.count("Exchange hashpartitioning") == 1
        assert "BatchEvalPython" not in plan

    def test_quantile_summary_no_shuffle(self, docs):
        from kafka_graphs_spark.streaming import quantile_summary

        plan = executed_plan(quantile_summary(docs, "n_chars", 16))
        assert "Exchange" not in plan  # per-partition summaries only

    def test_bloom_probe_stays_jvm_side(self, spark, docs):
        from kafka_graphs_spark.pipeline.bloom import bloom_contamination

        out = bloom_contamination(
            docs.filter(F.col("doc_id") >= 50),
            docs.filter(F.col("doc_id") < 50),
        )
        plan = executed_plan(out)
        assert "BatchEvalPython" not in plan
        assert "xxhash64" in plan.lower()  # the codegen'd probe hashes

    def test_incremental_dedup_joins_are_keyed(self, docs):
        from kafka_graphs_spark.pipeline.dedup import incremental_dedup

        out = incremental_dedup(
            docs.filter(F.col("doc_id") >= 400),
            docs.filter(F.col("doc_id") < 400),
            threshold=0.05,
        )
        plan = executed_plan(out)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_fix_text_is_scan_speed(self, docs):
        from kafka_graphs_spark.pipeline.text import fix_text, strip_markup

        for op in (fix_text, strip_markup):
            plan = executed_plan(op(docs))
            assert "Exchange" not in plan and "BatchEvalPython" not in plan

    def test_datasheet_stream_partial_aggregation(self, docs):
        from kafka_graphs_spark.pipeline.datasheet import (
            corpus_datasheet_stream,
        )

        d = docs.withColumn(
            "event_time", F.timestamp_micros(F.col("doc_id") * 60_000_000)
        )
        plan = executed_plan(corpus_datasheet_stream(d, "1 hour"))
        # two HashAggregates around one exchange = map-side combine
        assert plan.count("Exchange hashpartitioning") == 1
        assert plan.count("HashAggregate") >= 2
