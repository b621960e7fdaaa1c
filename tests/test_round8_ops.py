"""Round-8 additions: URL/domain curation tier + this round's advice
fixes (funnel repeated steps, empty blocklist, retrieval-metrics zero
rows, classifier loss clamp, assortativity decimal sums)."""

import pytest
from pyspark.sql import functions as F

from kafka_graphs_spark.pipeline.domains import (
    domain_blocklist,
    domain_stats,
    extract_domains,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, url string, text string")


class TestRegisteredDomain:
    def test_extraction_cases(self, spark):
        rows = [
            (1, "https://www.example.com/a/b", "x"),
            (2, "http://news.co.uk/path", "x"),            # multi-label suffix, bare
            (3, "https://cdn.assets.news.co.uk/p?q=1", "x"),  # deep subdomain
            (4, "https://user:pw@blog.org:8443/x", "x"),   # userinfo + port
            (5, "ftp://archive.example.com.au/f", "x"),    # scheme variety + com.au
            (6, "https://10.0.0.1/admin", "x"),            # IPv4 literal
            (7, "https://localhost/dev", "x"),             # single label
            (8, "https://Example.COM./trailing", "x"),     # case + trailing dot
        ]
        out = {r["doc_id"]: r for r in extract_domains(_docs(spark, rows)).collect()}
        assert out[1]["host"] == "www.example.com"
        assert out[1]["domain"] == "example.com"
        assert out[2]["domain"] == "news.co.uk"
        assert out[3]["host"] == "cdn.assets.news.co.uk"
        assert out[3]["domain"] == "news.co.uk"
        assert out[4]["host"] == "blog.org"           # userinfo+port stripped
        assert out[4]["domain"] == "blog.org"
        assert out[5]["domain"] == "example.com.au"
        assert out[6]["domain"] == "10.0.0.1"
        assert out[7]["domain"] == "localhost"
        assert out[8]["host"] == "example.com"
        assert out[8]["domain"] == "example.com"

    def test_extra_suffixes(self, spark):
        rows = [(1, "https://a.b.example.custom.tld/x", "x")]
        out = extract_domains(
            _docs(spark, rows), extra_suffixes=["custom.tld"]
        ).collect()[0]
        assert out["domain"] == "example.custom.tld"

    def test_stats(self, spark):
        rows = [
            (1, "https://www.example.com/", "one two three"),
            (2, "https://cdn.example.com/", "four five"),
            (3, "https://news.co.uk/", "six"),
        ]
        out = {r["domain"]: r for r in domain_stats(_docs(spark, rows)).collect()}
        assert out["example.com"]["n_docs"] == 2
        assert out["example.com"]["n_tokens"] == 5
        assert out["example.com"]["doc_share"] == pytest.approx(2 / 3, abs=1e-6)
        assert out["news.co.uk"]["n_docs"] == 1

    def test_blocklist_label_boundary_and_specificity(self, spark):
        rows = [
            (1, "https://shop.com/x", "x"),
            (2, "https://www.shop.com/x", "x"),       # subdomain blocked
            (3, "https://fakeshop.com/x", "x"),       # NOT blocked (boundary)
            (4, "https://cdn.assets.data.org/x", "x"),
            (5, "https://data.org/x", "x"),           # parent NOT blocked
        ]
        out = {
            r["doc_id"]: r
            for r in domain_blocklist(
                _docs(spark, rows), ["shop.com", "assets.data.org"]
            ).collect()
        }
        assert out[1]["keep"] is False and out[1]["matched_domain"] == "shop.com"
        assert out[2]["keep"] is False
        assert out[3]["keep"] is True and out[3]["matched_domain"] is None
        assert out[4]["keep"] is False and out[4]["matched_domain"] == "assets.data.org"
        assert out[5]["keep"] is True

    def test_blocklist_most_specific_wins(self, spark):
        rows = [(1, "https://a.sub.site.com/x", "x")]
        out = domain_blocklist(
            _docs(spark, rows), ["site.com", "sub.site.com"]
        ).collect()[0]
        assert out["matched_domain"] == "sub.site.com"

    def test_blocklist_empty(self, spark):
        rows = [(1, "https://anything.com/x", "x")]
        out = domain_blocklist(_docs(spark, rows), []).collect()[0]
        assert out["keep"] is True and out["matched_domain"] is None


class TestAdviceFixes:
    def test_funnel_repeated_step_needs_two_events(self, spark):
        from kafka_graphs_spark.pipeline.events import funnel

        ev = spark.createDataFrame(
            [
                (1, 10, "view", 100),   # user 10: ONE view
                (2, 20, "view", 100),   # user 20: two views, distinct ts
                (3, 20, "view", 200),
                (4, 30, "view", 100),   # user 30: two views, SAME ts
                (5, 30, "view", 100),
            ],
            "event_id long, user_id long, event_type string, ts long",
        )
        out = {r["step"]: r["n_users"] for r in funnel(ev, ["view", "view"]).collect()}
        # strict >: one event (or two same-ts events) cannot complete both steps
        assert out == {1: 3, 2: 1}

    def test_funnel_distinct_steps_keep_at_or_after(self, spark):
        from kafka_graphs_spark.pipeline.events import funnel

        ev = spark.createDataFrame(
            [(1, 10, "a", 100), (2, 10, "b", 100)],  # same-ts a->b still converts
            "event_id long, user_id long, event_type string, ts long",
        )
        out = {r["step"]: r["n_users"] for r in funnel(ev, ["a", "b"]).collect()}
        assert out == {1: 1, 2: 1}

    def test_blocklist_filter_empty_phrases(self, spark):
        from kafka_graphs_spark.pipeline.text import blocklist_filter

        docs = spark.createDataFrame(
            [(1, "anything at all")], "doc_id long, text string"
        )
        out = blocklist_filter(docs, []).collect()[0]
        assert out["keep"] is True
        assert out["n_blocked"] == 0
        assert out["blocked_terms"] == []

    def test_retrieval_metrics_query_with_no_ranked_rows(self, spark):
        from kafka_graphs_spark.pipeline.text import retrieval_metrics

        ranked = spark.createDataFrame(
            [(1, 10, 1)], "query_id long, doc_id long, rank long"
        )
        rels = spark.createDataFrame(
            [(1, 10), (2, 98), (2, 99)], "query_id long, doc_id long"
        )
        out = {r["query_id"]: r for r in retrieval_metrics(ranked, rels, k=10).collect()}
        assert set(out) == {1, 2}
        z = out[2]
        assert (z["hits"], z["recall"], z["dcg"], z["ndcg"]) == (0, 0.0, 0.0, 0.0)
        assert z["n_rel"] == 2 and z["idcg"] > 0

    def test_classifier_loss_not_null_on_saturation(self, spark):
        from kafka_graphs_spark.pipeline.classifier import train_quality_classifier

        docs = spark.createDataFrame(
            [(i, ("word " * (5 + i)).strip()) for i in range(20)],
            "doc_id long, text string",
        )
        m = train_quality_classifier(
            docs, (F.col("doc_id") % 2 == 0).cast("double"), n_iterations=2, lr=80.0
        )
        loss = m.collect()[0]["final_loss"]
        assert loss is not None and loss == loss  # finite, not NULL/NaN

    def test_assortativity_decimal_matches_long_path(self, spark):
        from kafka_graphs_spark import Graph
        from kafka_graphs_spark.library.basic import degree_assortativity

        edges = spark.createDataFrame(
            [(1, 2, 1.0), (2, 3, 1.0), (3, 4, 1.0), (4, 1, 1.0), (1, 3, 1.0)],
            "src long, dst long, value double",
        )
        g = Graph.from_edges(edges, F.lit(0.0))
        row = degree_assortativity(g).collect()[0]
        # C4 + one chord: hand-computable, and unchanged by the decimal move
        assert row["n_und_edges"] == 5
        assert row["assortativity"] == pytest.approx(-0.666667, abs=1e-6)


class TestRotateWindow:
    def test_compute_order_properties(self):
        import sys, os
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        from scripts.rotate_window import PERMANENT_TAIL, compute_order

        registry = ["q_new", "q_old_r1", "q_tail", "q_new2", "q_old_r5"]
        tail_name = PERMANENT_TAIL[0]
        registry.append(tail_name)
        last = {"q_old_r1": 1, "q_old_r5": 5, "q_tail": 3}
        green = {"q_old_r1": True, "q_old_r5": True, "q_tail": True}
        order = compute_order(registry, last, green)
        assert order[:2] == ["q_new", "q_new2"]          # never-scored first
        assert order[2:5] == ["q_old_r1", "q_tail", "q_old_r5"]  # stalest first
        assert order[-1] == tail_name                     # permanent tail last
        # red-aware (r9 verdict #1): a scored-but-not-green query
        # outranks everything, including never-scored
        green["q_tail"] = False
        order = compute_order(registry, last, green)
        assert order[0] == "q_tail"
        assert order[1:3] == ["q_new", "q_new2"]


class TestCurateDomainGate:
    def test_blocked_domains_dropped_pre_dedup(self, spark):
        from kafka_graphs_spark.pipeline.curate import curate

        rows = [
            # good quality text (varied words, reasonable length)
            (i,
             "the quick brown fox jumps over a lazy dog near the river bank "
             + f"unique{i} token{i} more{i} words{i} here{i}",
             f"https://{'bad' if i % 3 == 0 else 'good'}.example.com/{i}")
            for i in range(12)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string, url string")
        base = {r["doc_id"] for r in curate(docs, min_score=0.0,
                                            jaccard_threshold=0.99).collect()}
        gated = {
            r["doc_id"]
            for r in curate(
                docs, min_score=0.0, jaccard_threshold=0.99,
                blocked_domains=["bad.example.com"],
            ).collect()
        }
        assert gated == {i for i in base if i % 3 != 0}
        assert any(i % 3 == 0 for i in base)  # the gate actually removed rows


class TestClassifierMinibatch:
    def _docs(self, spark):
        from pyspark.sql import functions as F
        rows = [
            (i,
             ("the a and of to in is it that for " * 3 if i % 2 == 0
              else "zxq wvu tsr qpo nml kji hgf " * 4).strip())
            for i in range(200)
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_minibatch_deterministic_and_descends(self, spark):
        from kafka_graphs_spark.pipeline.classifier import train_quality_classifier

        docs = self._docs(spark)
        tgt = (F.col("doc_id") % 2 == 0).cast("double")
        a = train_quality_classifier(docs, tgt, n_iterations=4,
                                     sample_fraction=0.3).collect()
        b = train_quality_classifier(docs, tgt, n_iterations=4,
                                     sample_fraction=0.3).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]  # same hash batches
        loss_mb = a[0]["final_loss"]
        # descends from the w=0 loss ln(2)=0.6931
        assert loss_mb < 0.6931
        # and the full-batch path is untouched by the new parameter
        full = train_quality_classifier(docs, tgt, n_iterations=4).collect()
        assert full[0]["final_loss"] < 0.6931
        assert [r["feature"] for r in full] == [
            "intercept", "stop_ratio", "mean_token_len", "log_n_tokens"]

    def test_minibatch_rejects_bad_fraction(self, spark):
        from kafka_graphs_spark.pipeline.classifier import train_quality_classifier

        with pytest.raises(ValueError):
            train_quality_classifier(
                self._docs(spark), F.lit(True).cast("double"),
                sample_fraction=1.5,
            )


class TestStreamIntervalJoin:
    def test_batch_path_same_code(self, spark):
        # withWatermark is a no-op on batch frames, so the operator
        # doubles as the backfill path — verify the range semantics
        import datetime as dt

        from kafka_graphs_spark.streaming import stream_interval_join

        t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

        def ts(mins):
            return t0 + dt.timedelta(minutes=mins)

        purchases = spark.createDataFrame(
            [(1, 7, ts(60)), (2, 7, ts(120)), (3, 8, ts(60))],
            "purchase_id long, user_id long, ts timestamp",
        )
        clicks = spark.createDataFrame(
            [
                (10, 7, ts(40)),    # 20 min before p1 -> match
                (11, 7, ts(29)),    # 31 min before p1 -> NO (outside)
                (12, 7, ts(60)),    # exactly at p1 -> match (lower bound 0)
                (13, 7, ts(61)),    # after p1, 59 min before p2 -> NO
                (14, 9, ts(55)),    # other user -> NO
            ],
            "click_id long, user_id long, ts timestamp",
        )
        out = stream_interval_join(
            purchases, clicks, key="user_id",
            lower_seconds=0, upper_seconds=1800,
        ).select("l.purchase_id", "r.click_id")
        got = sorted(tuple(r) for r in out.collect())
        assert got == [(1, 10), (1, 12)]
