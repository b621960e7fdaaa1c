"""Round-9 additions: advice fixes — scheme-less URL host fallback,
auditable empty-host blocklist rows, byte-budget ALS broadcast gate —
plus the driver-canonicalizer list-column contract."""

import pytest
from pyspark.sql import functions as F

from kafka_graphs_spark.pipeline.domains import (
    domain_blocklist,
    extract_domains,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, url string, text string")


class TestSchemelessHosts:
    def test_schemeless_url_parses_as_bare_host(self, spark):
        rows = [
            (1, "www.example.com/x", "x"),            # scheme-less + path
            (2, "news.co.uk", "x"),                   # bare host only
            (3, "user@blog.org/x", "x"),              # scheme-less userinfo
            (4, "localhost:8080/dev", "x"),           # scheme-less port
            (5, "/just/a/path", "x"),                 # truly host-less
            (6, "://broken.example.com/x", "x"),      # malformed scheme
        ]
        out = {r["doc_id"]: r for r in extract_domains(_docs(spark, rows)).collect()}
        assert out[1]["host"] == "www.example.com"
        assert out[1]["domain"] == "example.com"
        assert out[2]["domain"] == "news.co.uk"
        assert out[3]["host"] == "blog.org"
        assert out[4]["host"] == "localhost"
        assert out[5]["host"] == ""
        assert out[6]["host"] == ""

    def test_blocklist_flags_hostless_rows_as_null(self, spark):
        rows = [
            (1, "www.shop.com/x", "x"),     # scheme-less subdomain: blocked
            (2, "/no/host/here", "x"),      # host-less: keep must be NULL
            (3, "https://data.org/x", "x"),
        ]
        out = {
            r["doc_id"]: r
            for r in domain_blocklist(_docs(spark, rows), ["shop.com"]).collect()
        }
        assert out[1]["keep"] is False
        assert out[1]["matched_domain"] == "shop.com"
        assert out[2]["keep"] is None            # auditable, not silently kept
        assert out[3]["keep"] is True

    def test_curate_drops_hostless_rows_under_domain_gate(self, spark):
        from kafka_graphs_spark.pipeline.curate import curate

        rows = [
            (1, "https://good.org/x", "some perfectly fine text here ok"),
            (2, "/no/host", "some perfectly fine text here ok"),
            (3, "https://bad.com/x", "some perfectly fine text here ok"),
        ]
        kept = curate(
            _docs(spark, rows),
            min_score=0.0,
            blocked_domains=["bad.com"],
        )
        ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
        # the gate cannot clear a host-less URL -> it is dropped, not passed
        assert ids == {1}


class TestUrlCanonicalization:
    def test_mirror_forms_collapse(self, spark):
        from kafka_graphs_spark.pipeline.domains import canonicalize_urls

        rows = [
            (1, "https://www.Example.com:443/a/b/index.html?utm_source=x&b=2&a=1#frag", "t"),
            (2, "http://example.com/a/b?a=1&b=2", "t"),
            (3, "https://example.com/a/b/?fbclid=zzz&a=1&b=2", "t"),
            (4, "example.com/a/b?a=1&b=2", "t"),          # scheme-less
            (5, "https://example.com/a/b?a=1&b=3", "t"),  # different value
            (6, "/no/host?x=1", "t"),                     # host-less
            (7, "https://news.co.uk//double//slash/", "t"),
            (8, "https://shop.io/Case/Sensitive/Path", "t"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, url string, text string")
        out = {r["doc_id"]: r["canonical_url"] for r in canonicalize_urls(docs).collect()}
        assert out[1] == out[2] == out[3] == out[4] == "example.com/a/b?a=1&b=2"
        assert out[5] == "example.com/a/b?a=1&b=3"
        assert out[6] == ""
        assert out[7] == "news.co.uk/double/slash"
        assert out[8] == "shop.io/Case/Sensitive/Path"  # path case preserved

    def test_url_dedup_min_doc_id_wins_and_hostless_never_merge(self, spark):
        from kafka_graphs_spark.pipeline.domains import url_dedup

        rows = [
            (10, "https://example.com/x", "t"),
            (3, "http://www.example.com/x/", "t"),   # same page, lower id
            (7, "/broken", "t"),                     # host-less
            (8, "/also-broken", "t"),                # host-less
        ]
        docs = spark.createDataFrame(rows, "doc_id long, url string, text string")
        out = {r["doc_id"]: r["keep"] for r in url_dedup(docs).collect()}
        assert out == {3: True, 10: False, 7: True, 8: True}

    def test_extra_params_stripped(self, spark):
        from kafka_graphs_spark.pipeline.domains import canonicalize_urls

        rows = [(1, "https://a.com/x?session=9&id=1", "t")]
        docs = spark.createDataFrame(rows, "doc_id long, url string, text string")
        out = canonicalize_urls(docs, extra_params=["session"]).collect()[0]
        assert out["canonical_url"] == "a.com/x?id=1"


class TestCorpusDatasheet:
    def test_sections_and_single_pass(self, spark):
        from kafka_graphs_spark.pipeline.datasheet import corpus_datasheet

        rows = [
            (i, "the quick brown fox jumps over the lazy dog again",
             ["en", "de"][i % 2], f"src{i % 3}")
            for i in range(12)
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string"
        )
        out = corpus_datasheet(docs)
        rows_out = out.collect()
        by_sec = {}
        for r in rows_out:
            by_sec.setdefault(r["section"], []).append(r)
        assert set(by_sec) == {"overall", "language", "source", "quality_band"}
        assert by_sec["overall"][0]["n_docs"] == 12
        assert by_sec["overall"][0]["doc_share"] == 1.0
        for sec, recs in by_sec.items():
            assert sum(r["doc_share"] for r in recs) == pytest.approx(1.0, abs=1e-5)
        # ONE corpus pass: grouping sets compile to a single Expand over
        # one scan — the plan must not contain a Union of scans
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Expand" in plan and "Union" not in plan


class TestBroadcastGateBytes:
    def test_gate_scales_with_dim(self):
        from kafka_graphs_spark.library.cf import (
            BROADCAST_FACTOR_BYTES,
            _fits_broadcast,
        )

        rows_at_dim8 = BROADCAST_FACTOR_BYTES // (8 * 8)
        assert _fits_broadcast(rows_at_dim8, 8)
        assert not _fits_broadcast(rows_at_dim8 + 1, 8)
        # at the als() default dim=50 the same row count is ~6x the
        # budget — the r8 gate would have broadcast ~400 MB here
        assert not _fits_broadcast(rows_at_dim8, 50)
        assert _fits_broadcast(BROADCAST_FACTOR_BYTES // (50 * 8), 50)


class TestShardPacking:
    def _docs(self, spark, n=60, sources=3):
        rows = [
            (i, " ".join(f"tok{j}" for j in range((i % 7) + 2)), f"s{i % sources}")
            for i in range(n)
        ]
        return spark.createDataFrame(rows, "doc_id long, text string, source string")

    def test_two_level_cumsum_equals_naive(self, spark):
        from pyspark.sql.window import Window

        from kafka_graphs_spark.pipeline.shards import assign_shards
        from kafka_graphs_spark.pipeline.text import tokens

        docs = self._docs(spark)
        # tiny bucket_size forces many buckets -> exercises level 1
        got = {
            r["doc_id"]: r["shard"]
            for r in assign_shards(
                docs, tokens_per_shard=10, bucket_size=4
            ).collect()
        }
        w = (
            Window.partitionBy("source").orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        naive = {
            r["doc_id"]: r["shard"]
            for r in docs.select(
                "doc_id",
                F.floor(
                    F.coalesce(
                        F.sum(F.size(tokens(F.col("text")))).over(w), F.lit(0)
                    ) / 10
                ).alias("shard"),
            ).collect()
        }
        assert got == naive

    def test_shards_never_split_docs_and_manifest_sums(self, spark):
        from kafka_graphs_spark.pipeline.shards import assign_shards, shard_manifest

        docs = self._docs(spark)
        a = assign_shards(docs, tokens_per_shard=10, bucket_size=4)
        m = shard_manifest(a).collect()
        # every doc in exactly one shard; manifest totals reconcile
        assert sum(r["n_docs"] for r in m) == 60
        assert sum(r["n_tokens"] for r in m) == sum(
            r["n_tokens"] for r in a.collect()
        )
        # shard indices are contiguous from 0 within each source
        per_src = {}
        for r in m:
            per_src.setdefault(r["source"], set()).add(r["shard"])
        for shards in per_src.values():
            assert shards == set(range(len(shards)))

    def test_mixture_plan_flags(self, spark):
        from kafka_graphs_spark.pipeline.shards import mixture_plan

        docs = self._docs(spark)
        out = {
            r["source"]: r
            for r in mixture_plan(
                docs, weights={"s0": 0.9, "s1": 0.1}, budget_tokens=200
            ).collect()
        }
        assert out["s0"]["target_tokens"] == 180
        assert out["s0"]["oversampled"] is True      # 180 > ~110 available
        assert out["s1"]["oversampled"] is False
        assert out["s2"]["weight"] == 0.0 and out["s2"]["target_tokens"] == 0


class TestMisraGries:
    def test_exact_when_items_fit(self, spark):
        from kafka_graphs_spark.streaming import misra_gries

        rows = [(i % 5,) for i in range(100)]
        df = spark.createDataFrame(rows, "item long")
        out = {r["item"]: r["est_count"] for r in misra_gries(df, "item", 10).collect()}
        assert out == {i: 20 for i in range(5)}  # <= k items: exact

    def test_guarantees_on_skewed_stream(self, spark):
        from kafka_graphs_spark.streaming import misra_gries

        # heavy item 0 with half the mass + a long uniform tail
        rows = [(0,) for _ in range(500)] + [(1000 + i % 200,) for i in range(500)]
        df = spark.createDataFrame(rows, "item long").repartition(8)
        k = 10
        mg = {r["item"]: r["est_count"] for r in misra_gries(df, "item", k).collect()}
        assert len(mg) <= k
        true = {0: 500}
        for i in range(200):
            true[1000 + i] = true.get(1000 + i, 0) + (3 if i < 100 else 2)
        n = 1000
        bound = 2 * n / (k + 1)
        for item, est in mg.items():
            assert est <= true[item]                       # never overestimates
            assert true[item] - est <= bound
        # every heavy item reported
        for item, t in true.items():
            if t > bound:
                assert item in mg
        assert 0 in mg  # the one genuinely heavy item

    def test_check_frame_clean(self, spark):
        from kafka_graphs_spark.streaming import heavy_hitters_check

        rows = [(0 if i % 2 == 0 else 100 + i,) for i in range(300)]
        df = spark.createDataFrame(rows, "item long")
        # item 0 holds half the mass (150 > bound 2n/(k+1) = 100)
        row = heavy_hitters_check(df, "item", k=5).collect()[0]
        assert row["underest_violations"] == 0
        assert row["error_violations"] == 0
        assert row["heavy_missing"] == 0
        assert row["n_heavy"] == 1
        assert row["top1_id"] == 0 and row["top1_true"] == 150


class TestNoComplexTopLevelColumns:
    """The driver hashes oracle-backed outputs through pandas
    sort_values, which crashes on list/dict cells (r8 doc_blocklist).
    Spot-check the contract on the query that broke plus the schema
    helper itself; the full 227-entry sweep enforces it in
    test_entry_contract.test_query_parity."""

    def test_doc_blocklist_emits_flat_columns(self, spark):
        import __spark_entry__ as entry_mod
        from pyspark.sql.types import ArrayType, MapType, StructType

        df = entry_mod.queries()["doc_blocklist"](
            spark, "/root/testdata/sf0.001"
        )
        bad = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        assert not bad
        row = df.filter(F.col("n_blocked") > 0).first()
        assert row is not None and isinstance(row["blocked_terms"], str)
