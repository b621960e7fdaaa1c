"""Round-5 operator goldens: transitivity and friends."""

import itertools

import pytest
from pyspark.sql import functions as F

from kafka_graphs_spark import Graph
from kafka_graphs_spark.library import transitivity


def make_graph(spark, edges):
    e = spark.createDataFrame(edges, "src long, dst long, value double")
    return Graph.from_edges(e, F.lit(0.0))


def one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


def test_transitivity_triangle(spark):
    r = one(transitivity(make_graph(spark, [(0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0)])))
    assert (r["n_triangles"], r["n_wedges"], r["transitivity"]) == (1, 3, 1.0)


def test_transitivity_k4(spark):
    edges = [(i, j, 1.0) for i, j in itertools.combinations(range(4), 2)]
    r = one(transitivity(make_graph(spark, edges)))
    assert (r["n_triangles"], r["n_wedges"], r["transitivity"]) == (4, 12, 1.0)


def test_transitivity_path_and_star(spark):
    r = one(transitivity(make_graph(spark, [(0, 1, 1.0), (1, 2, 1.0)])))
    assert (r["n_triangles"], r["n_wedges"], r["transitivity"]) == (0, 1, 0.0)
    star = [(0, i, 1.0) for i in range(1, 6)]
    r = one(transitivity(make_graph(spark, star)))
    assert r["n_triangles"] == 0 and r["n_wedges"] == 10 and r["transitivity"] == 0.0


def test_transitivity_ignores_direction_loops_and_multiplicity(spark):
    # duplicate edges, reverse edges and self-loops collapse to the
    # simple undirected triangle
    edges = [
        (0, 1, 1.0), (1, 0, 1.0), (0, 1, 2.0),
        (1, 2, 1.0), (2, 0, 1.0), (2, 2, 9.0),
    ]
    r = one(transitivity(make_graph(spark, edges)))
    assert (r["n_triangles"], r["n_wedges"], r["transitivity"]) == (1, 3, 1.0)


def test_transitivity_empty(spark):
    e = spark.createDataFrame([], "src long, dst long, value double")
    v = spark.createDataFrame([(1, 0.0)], "id long, value double")
    r = one(transitivity(Graph(v, e)))
    assert (r["n_triangles"], r["n_wedges"], r["transitivity"]) == (0, 0, 0.0)


# ---------------------------------------------------------------------------
# line-level dedup
# ---------------------------------------------------------------------------

def docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_line_dedup_removes_shared_lines_preserving_order(spark):
    from kafka_graphs_spark.pipeline.text import line_dedup

    d = docs_df(spark, [
        (1, "keep me\ncookie banner\nunique one"),
        (2, "cookie banner\nother text"),
        (3, "solo document"),
    ])
    got = {r["doc_id"]: r for r in line_dedup(d, min_docs=2).collect()}
    assert got[1]["text"] == "keep me\nunique one"
    assert (got[1]["n_kept"], got[1]["n_removed"]) == (2, 1)
    assert got[2]["text"] == "other text"
    assert got[3]["text"] == "solo document"
    assert got[3]["n_removed"] == 0


def test_line_dedup_within_doc_repeat_not_removed(spark):
    from kafka_graphs_spark.pipeline.text import line_dedup

    # the count is DISTINCT docs: a line repeated in one doc survives
    d = docs_df(spark, [(1, "dup\ndup\nx"), (2, "y")])
    got = {r["doc_id"]: r for r in line_dedup(d, min_docs=2).collect()}
    assert got[1]["text"] == "dup\ndup\nx"


def test_line_dedup_fully_removed_doc_and_custom_sep(spark):
    from kafka_graphs_spark.pipeline.text import line_dedup

    d = docs_df(spark, [(1, "a b"), (2, "a c"), (3, "a")])
    got = {r["doc_id"]: r for r in line_dedup(d, min_docs=3, sep=" ").collect()}
    assert got[3]["text"] == "" and got[3]["n_kept"] == 0 and got[3]["n_removed"] == 1
    assert got[1]["text"] == "b"


# ---------------------------------------------------------------------------
# bigram LM surprisal
# ---------------------------------------------------------------------------

def test_bigram_logprob_exact_values(spark):
    import math

    from kafka_graphs_spark.pipeline.text import bigram_logprob

    # corpus: "a b a b", "a c", "solo" → bigrams: (a,b)x2, (b,a)x1, (a,c)x1
    # V = 4 (a,b,c,solo); prefix marginals c1(a)=3, c1(b)=1; k=1:
    #   p(b|a) = (2+1)/(3+4) = 3/7 ; p(a|b) = (1+1)/(1+4) = 2/5
    #   p(c|a) = (1+1)/(3+4) = 2/7
    d = docs_df(spark, [(1, "a b a b"), (2, "a c"), (3, "solo")])
    got = {r["doc_id"]: r for r in bigram_logprob(d).collect()}
    assert got[1]["n_bigrams"] == 3
    expect1 = (2 * -math.log(3 / 7) + -math.log(2 / 5)) / 3
    assert got[1]["avg_neg_logprob"] == pytest.approx(expect1, rel=1e-12)
    assert got[2]["n_bigrams"] == 1
    assert got[2]["avg_neg_logprob"] == pytest.approx(-math.log(2 / 7), rel=1e-12)
    assert got[3]["n_bigrams"] == 0 and got[3]["avg_neg_logprob"] is None


def test_bigram_logprob_orders_scrambled_below_fluent(spark):
    from kafka_graphs_spark.pipeline.text import bigram_logprob

    fluent = " ".join(["the cat sat on the mat"] * 10)
    scrambled = "cat the mat sat the on"  # word-shuffled variant of the fluent sentence
    base = [(i, fluent) for i in range(10)]
    d = docs_df(spark, base + [(100, fluent), (101, scrambled)])
    got = {r["doc_id"]: r["avg_neg_logprob"] for r in bigram_logprob(d).collect()}
    assert got[100] < got[101]


# ---------------------------------------------------------------------------
# JSON props
# ---------------------------------------------------------------------------

def test_json_props_stats(spark):
    from kafka_graphs_spark.pipeline.events import json_props, json_props_stats

    rows = [
        (1, "click", '{"k": 10}'),
        (2, "click", '{"k": 20}'),
        (3, "view", '{"k": 5}'),
        (4, "view", "not json"),
        (5, "view", '{"other": 1}'),
    ]
    ev = spark.createDataFrame(rows, "event_id long, event_type string, props string")
    typed = json_props(ev, keys=("k",))
    assert typed.filter(F.col("k").isNull()).count() == 2
    got = {r["group"]: r for r in json_props_stats(ev, keys=("k",)).collect()}
    assert got["click"]["n"] == 2 and got["click"]["k_sum"] == 30.0
    assert got["click"]["k_avg"] == 15.0
    assert got["view"]["k_nonnull"] == 1 and got["view"]["k_min"] == 5.0


# ---------------------------------------------------------------------------
# linear quality classifier
# ---------------------------------------------------------------------------

def test_quality_score_linear_monotone_in_stopword_mass(spark):
    import math

    from kafka_graphs_spark.pipeline.text import (
        QUALITY_LINEAR_WEIGHTS,
        quality_score_linear,
    )

    d = docs_df(spark, [
        (1, "the cat is on the mat and it is warm"),   # stopword-rich
        (2, "zxqv kjht qwpl mnbd zxqv kjht qwpl mnbd"),  # gibberish
        (3, ""),
    ])
    got = {r["doc_id"]: r for r in quality_score_linear(d).collect()}
    assert got[1]["prob"] > got[2]["prob"]
    # empty doc: all features zero → sigmoid(intercept)
    w0 = QUALITY_LINEAR_WEIGHTS["intercept"]
    assert got[3]["prob"] == pytest.approx(1.0 / (1.0 + math.exp(-w0)), rel=1e-12)
    # prob is sigmoid(logit) row-wise
    for r in got.values():
        assert r["prob"] == pytest.approx(1.0 / (1.0 + math.exp(-r["logit"])), rel=1e-12)


def test_quality_score_linear_custom_weights(spark):
    from kafka_graphs_spark.pipeline.text import quality_score_linear

    d = docs_df(spark, [(1, "the the the")])
    r = quality_score_linear(
        d, weights={"intercept": 0.0, "stop_ratio": 0.0,
                    "mean_token_len": 0.0, "log_n_tokens": 0.0}
    ).collect()[0]
    assert r["logit"] == 0.0 and r["prob"] == 0.5


# ---------------------------------------------------------------------------
# product quantization
# ---------------------------------------------------------------------------

def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def test_pq_codes_shape_and_range(spark):
    import random

    from kafka_graphs_spark.pipeline.similarity import (
        product_quantize,
        train_pq_codebooks,
    )

    rng = random.Random(7)
    vecs = [[rng.uniform(-1, 1) for _ in range(16)] for _ in range(40)]
    emb = _emb_df(spark, vecs)
    cb = train_pq_codebooks(emb, m=4, k=8, dim=16)
    assert len(cb) == 4 and len(cb[0]) == 8 and len(cb[0][0]) == 4
    codes = product_quantize(emb, cb).collect()
    assert len(codes) == 40
    for r in codes:
        assert len(r["codes"]) == 4
        assert all(0 <= c < 8 for c in r["codes"])


def test_pq_dim_not_divisible_raises(spark):
    from kafka_graphs_spark.pipeline.similarity import train_pq_codebooks

    emb = _emb_df(spark, [[1.0] * 10])
    with pytest.raises(ValueError):
        train_pq_codebooks(emb, m=4, k=2, dim=10)


def test_pq_topk_rerank_finds_planted_duplicate(spark):
    import random

    from kafka_graphs_spark.pipeline.similarity import pq_topk

    rng = random.Random(3)
    base = [[rng.uniform(-1, 1) for _ in range(16)] for _ in range(50)]
    # vec 42 := exact duplicate of vec 0 (scaled — cosine-identical)
    base[42] = [2.0 * x for x in base[0]]
    emb = _emb_df(spark, base)
    q = emb.filter(F.col("vec_id") == 0)
    res = pq_topk(emb, q, k=3, m=4, n_centroids=8, dim=16, rerank=20).collect()
    top = [r for r in res if r["rank"] == 1][0]
    assert top["neighbor_id"] == 42
    assert top["cos"] == pytest.approx(1.0, abs=1e-6)


def test_pq_topk_adc_deterministic(spark):
    import random

    from kafka_graphs_spark.pipeline.similarity import pq_topk

    rng = random.Random(11)
    vecs = [[rng.uniform(-1, 1) for _ in range(16)] for _ in range(30)]
    emb = _emb_df(spark, vecs)
    q = emb.filter(F.col("vec_id") < 3)
    a = sorted(map(tuple, pq_topk(emb, q, k=4, m=4, n_centroids=8, dim=16).collect()))
    b = sorted(map(tuple, pq_topk(
        emb.repartition(7), q, k=4, m=4, n_centroids=8, dim=16
    ).collect()))
    assert a == b
