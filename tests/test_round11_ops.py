"""Round-11 operator tests — online skew monitor (streaming_hot_keys +
finalize_hot_keys, the streaming twin of the batch hot_keys audit) and
the robots/license reuse-policy tier (pipeline.licenses), and the
cross-snapshot Bloom URL dedup gate (pipeline.bloom)."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F


def _replay(spark, base, schema, transform, mode="update"):
    """Write base as 3 files, replay as a multi-batch stream, collect
    every update-mode emission."""
    dirs, rows = [], []
    try:
        d = tempfile.mkdtemp(prefix="kgs_t11_src_")
        dirs.append(d)
        base.repartition(3).write.mode("overwrite").parquet(d)
        ckpt = tempfile.mkdtemp(prefix="kgs_t11_ckpt_")
        dirs.append(ckpt)
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
        )
        out = transform(stream)

        def sink(batch_df, _bid):
            rows.extend(batch_df.collect())

        q = (
            out.writeStream.foreachBatch(sink)
            .outputMode(mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300), "stream did not finish"
    finally:
        for p in dirs:
            shutil.rmtree(p, ignore_errors=True)
    return rows


class TestStreamingHotKeys:
    def _events(self, spark, n=600):
        # skewed keys: 7 on every 3rd row, 11 on every 5th, uniform tail;
        # event times span 3 one-hour windows
        return spark.createDataFrame(
            [
                (
                    i,
                    7 if i % 3 == 0 else (11 if i % 5 == 0 else 100 + i % 40),
                )
                for i in range(n)
            ],
            "event_id long, item long",
        ).select(
            "item",
            F.timestamp_seconds(
                F.lit(1_700_000_000 - 1_700_000_000 % 3600)
                + (F.col("event_id") % 3) * 3600
                + F.col("event_id")  # within-window jitter (< 600 s)
            ).alias("ts"),
        )

    def test_multi_batch_parity_with_batch_audit(self, spark):
        from kafka_graphs_spark.pipeline.datasheet import hot_keys
        from kafka_graphs_spark.streaming import (
            finalize_hot_keys,
            streaming_hot_keys,
        )

        base = self._events(spark)
        rows = _replay(
            spark,
            base,
            "item long, ts timestamp",
            lambda s: streaming_hot_keys(
                s, "item", "ts", "1 hour", watermark="365 days"
            ),
        )
        assert len({r["window_start"] for r in rows}) == 3
        emissions = spark.createDataFrame(
            [(r["window_start"], r["key"], r["n_rows"]) for r in rows],
            "window_start long, key long, n_rows long",
        )
        got = {
            (r["window_start"], r["rank"]): (r["key"], r["n_rows"], r["share"])
            for r in finalize_hot_keys(emissions, k=4).collect()
        }
        # batch parity per window: the same hot_keys audit on that
        # window's slice must agree rank-for-rank
        for ws in {r["window_start"] for r in rows}:
            sliced = base.filter(
                (F.col("ts").cast("long") >= ws)
                & (F.col("ts").cast("long") < ws + 3600)
            )
            want = {
                r["rank"]: (r["key"], r["n_rows"], r["share"])
                for r in hot_keys(sliced.select("item"), "item", k=4).collect()
            }
            for rank, v in want.items():
                assert got[(ws, rank)] == v, (ws, rank)

    def test_emissions_monotone_and_final_max(self, spark):
        from kafka_graphs_spark.streaming import streaming_hot_keys

        base = self._events(spark)
        rows = _replay(
            spark,
            base,
            "item long, ts timestamp",
            lambda s: streaming_hot_keys(
                s, "item", "ts", "1 hour", watermark="365 days"
            ),
        )
        # update-mode re-emissions of the same (window, key) never shrink
        seen: dict = {}
        for r in rows:  # foreachBatch collected in batch order
            k = (r["window_start"], r["key"])
            assert r["n_rows"] >= seen.get(k, 0)
            seen[k] = r["n_rows"]
        # per-key max equals the exact batch count
        exact = {
            (r["ws"], r["item"]): r["n"]
            for r in base.select(
                (F.col("ts").cast("long") - F.col("ts").cast("long") % 3600).alias("ws"),
                "item",
            )
            .groupBy("ws", "item")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert seen == exact

    def test_null_keys_counted(self, spark):
        from kafka_graphs_spark.streaming import (
            finalize_hot_keys,
            streaming_hot_keys,
        )

        base = spark.createDataFrame(
            [(None, 1_700_000_000 + i) for i in range(20)]
            + [(5, 1_700_000_000 + i) for i in range(10)],
            "item long, epoch long",
        ).select("item", F.timestamp_seconds("epoch").alias("ts"))
        rows = _replay(
            spark,
            base,
            "item long, ts timestamp",
            lambda s: streaming_hot_keys(
                s, "item", "ts", "1 hour", watermark="365 days"
            ),
        )
        emissions = spark.createDataFrame(
            [(r["window_start"], r["key"], r["n_rows"]) for r in rows],
            "window_start long, key long, n_rows long",
        )
        out = finalize_hot_keys(emissions, k=2).collect()
        by_rank = {r["rank"]: (r["key"], r["n_rows"]) for r in out}
        assert by_rank[1] == (None, 20)  # NULL skew surfaces, rank 1
        assert by_rank[2] == (5, 10)

    def test_finalizer_windows_over_aggregated_frame_only(self, spark):
        # plan shape: the ranking window's input is the (window,key)
        # aggregate, never the emission stream — one small shuffle
        from kafka_graphs_spark.streaming import finalize_hot_keys

        emissions = spark.createDataFrame(
            [(0, 1, 5), (0, 1, 7), (0, 2, 3)],
            "window_start long, key long, n_rows long",
        )
        plan = (
            finalize_hot_keys(emissions, k=2)
            ._jdf.queryExecution().optimizedPlan().toString()
        )
        agg_pos = plan.find("Aggregate")
        win_pos = plan.find("Window")
        assert agg_pos != -1 and win_pos != -1
        # optimizedPlan prints top-down: Window must sit ABOVE (before)
        # the Aggregate it consumes
        assert win_pos < agg_pos


class TestLicenseSignals:
    """pipeline.licenses — reuse-signal extraction + the policy gate."""

    def _docs(self, spark):
        return spark.createDataFrame(
            [
                (1, '<meta name="robots" content="noindex, follow"> body text'),
                (2, '<meta name="robots" content="index, follow"> body text'),
                (3, '<meta name="robots" content="noindexing"> body text'),
                (4, "see https://creativecommons.org/licenses/by-nc-sa/4.0/ terms"),
                (5, "dedicated https://creativecommons.org/publicdomain/zero/1.0/"),
                (6, "code under SPDX-License-Identifier: Apache-2.0 here"),
                (7, "Copyright 2024. All Rights Reserved."),
                (8, "plain text with no signals at all"),
                (9, '<meta name="robots" content="NONE"> shouty opt-out'),
            ],
            "doc_id long, text string",
        )

    def test_signal_extraction(self, spark):
        from kafka_graphs_spark.pipeline.licenses import license_signals

        out = {r["doc_id"]: r.asDict() for r in license_signals(self._docs(spark)).collect()}
        assert out[1]["robots"] == "noindex, follow" and out[1]["opted_out"]
        assert out[2]["robots"] == "index, follow" and not out[2]["opted_out"]
        # whole-token: 'noindexing' must NOT opt out
        assert out[3]["robots"] == "noindexing" and not out[3]["opted_out"]
        assert out[4]["cc_license"] == "by-nc-sa"
        assert out[5]["cc_license"] == "zero"
        assert out[6]["spdx"] == "Apache-2.0"
        assert out[7]["rights_reserved"] and not out[8]["rights_reserved"]
        assert out[8]["robots"] == "" and out[8]["cc_license"] == "" and out[8]["spdx"] == ""
        # robots content is lowercased before matching: NONE opts out
        assert out[9]["opted_out"]

    def test_gate_semantics(self, spark):
        from kafka_graphs_spark.pipeline.licenses import (
            PERMISSIVE_CC,
            license_gate,
        )

        docs = self._docs(spark)
        keep = lambda df: {r["doc_id"] for r in df.filter(F.col("keep")).collect()}
        # default: only robots opt-outs drop
        assert keep(license_gate(docs)) == {2, 3, 4, 5, 6, 7, 8}
        # allowlist: carrying a non-permissive CC license drops; no
        # license stays (allow-by-default)
        out = keep(license_gate(docs, license_allow=list(PERMISSIVE_CC)))
        assert 4 not in out and {5, 6, 7, 8} <= out
        # require_license: only affirmatively-licensed docs stay
        out = keep(license_gate(docs, require_license=True))
        assert out == {4, 5, 6}
        # strict rights_reserved
        out = keep(license_gate(docs, drop_rights_reserved=True))
        assert 7 not in out and 8 in out

    def test_plan_is_pure_codegen(self, spark):
        from kafka_graphs_spark.pipeline.licenses import (
            license_gate,
            license_signals,
        )

        docs = self._docs(spark)
        for df in (license_signals(docs), license_gate(docs)):
            plan = df._jdf.queryExecution().executedPlan().toString()
            assert "BatchEvalPython" not in plan and "Exchange" not in plan

    def test_curate_composition(self, spark):
        # the gate composes pre-dedup: licensed curate keeps a strict
        # subset of the ungated curate
        from kafka_graphs_spark.pipeline.curate import curate
        from kafka_graphs_spark.pipeline.licenses import PERMISSIVE_CC

        docs = self._docs(spark).withColumn(
            "text", F.concat(F.col("text"), F.lit(" filler words to pass the "
            "quality gate with enough real tokens in the document body "
            "for the stopword and length bands to be satisfied here")),
        )
        base = {r["doc_id"] for r in curate(docs, min_score=0.6, jaccard_threshold=0.99).collect()}
        gated = {
            r["doc_id"]
            for r in curate(
                docs, min_score=0.6, jaccard_threshold=0.99,
                respect_robots=True, license_allow=list(PERMISSIVE_CC),
                require_license=False,
            ).collect()
        }
        assert gated < base and 1 not in gated and 4 not in gated


class TestBloomUrlDedup:
    """pipeline.bloom cross-snapshot URL gate — the persisted crawl
    state between snapshots."""

    def _snap(self, spark, ids_urls):
        return spark.createDataFrame(ids_urls, "doc_id long, url string")

    def test_seen_dropped_unseen_resolved(self, spark):
        from kafka_graphs_spark.pipeline.bloom import (
            bloom_url_dedup,
            build_url_filter,
        )

        corpus = self._snap(spark, [
            (1, "https://a.com/x"), (2, "https://b.com/y"),
        ])
        new = self._snap(spark, [
            (10, "http://www.a.com/x/"),        # canonical dup of corpus
            (11, "https://c.com/z?utm_source=f"),  # new page, 2 mirrors
            (12, "https://www.c.com/z"),
            (13, ""),                           # host-less: keeps itself
        ])
        filt, m, k, n = build_url_filter(corpus)
        assert n == 2
        out = {r["doc_id"]: (r["seen"], r["keep"])
               for r in bloom_url_dedup(new, filt, m, k).collect()}
        assert out[10] == (True, False)   # zero false negatives
        assert out[11] == (False, True)   # min doc_id wins the new page
        assert out[12] == (False, False)
        assert out[13] == (False, True)   # host-less bypass

    def test_merge_filters_rolls_state_forward(self, spark):
        from kafka_graphs_spark.pipeline.bloom import (
            bloom_parameters,
            bloom_probe,
            build_bloom_filter,
            merge_bloom_filters,
        )

        a = spark.createDataFrame([("u1",), ("u2",)], "k string")
        b = spark.createDataFrame([("v1",), ("v2",)], "k string")
        # same parameters on both sides (the caller-owned invariant)
        m, k = bloom_parameters(2)
        fa, ma, ka, _ = build_bloom_filter(a, "k")
        fb, mb, kb, _ = build_bloom_filter(b, "k")
        assert (ma, ka) == (mb, kb) == (m, k)
        merged = merge_bloom_filters(fa, fb)
        probe = spark.createDataFrame(
            [("u1",), ("v2",), ("w9",)], "k string"
        ).join(F.broadcast(merged)).select(
            "k", bloom_probe(F.col("k"), m, k, F.col("bloom")).alias("hit")
        )
        hits = {r["k"]: r["hit"] for r in probe.collect()}
        assert hits["u1"] and hits["v2"]  # members of either side hit

    def test_check_guarantees(self, spark):
        from kafka_graphs_spark.pipeline.bloom import bloom_url_dedup_check

        corpus = self._snap(
            spark, [(i, f"https://s{i % 7}.com/p/{i % 20}") for i in range(60)]
        )
        new = self._snap(
            spark,
            [(100 + i, f"https://s{i % 7}.com/p/{i % 20}") for i in range(10)]
            + [(200 + i, f"https://fresh.org/n/{i}") for i in range(10)],
        )
        row = bloom_url_dedup_check(new, corpus).collect()[0]
        assert row["false_neg_violations"] == 0
        assert row["no_extra_keeps"] and row["fp_within_bound"]
        assert row["seen_exact"] == 10 and row["kept_exact"] == 10
        assert row["n_new"] == 20

    def test_probe_stays_jvm_side(self, spark):
        from kafka_graphs_spark.pipeline.bloom import (
            bloom_url_dedup,
            build_url_filter,
        )

        corpus = self._snap(spark, [(1, "https://a.com/x")])
        new = self._snap(spark, [(2, "https://a.com/x"), (3, "https://b.io/y")])
        filt, m, k, _ = build_url_filter(corpus)
        plan = (
            bloom_url_dedup(new, filt, m, k)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BatchEvalPython" not in plan
        assert "CartesianProduct" not in plan  # broadcast of the one-row filter


class TestShardDatasheet:
    """shards.shard_datasheet — the per-shard data card."""

    def test_card_reconciles(self, spark):
        from kafka_graphs_spark.pipeline.shards import (
            assign_shards,
            shard_datasheet,
            shard_manifest,
        )

        rows = [
            (i, "s" + str(i % 2), ["en", "de", "zh"][i % 3],
             " ".join(["word"] * (8 + i % 5)))
            for i in range(120)
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, source string, lang string, text string"
        )
        card = shard_datasheet(docs, tokens_per_shard=100).collect()
        manifest = {
            (r["source"], r["shard"]): (r["n_docs"], r["n_tokens"])
            for r in shard_manifest(assign_shards(docs, 100)).collect()
        }
        assert len(card) == len(manifest) >= 4
        for r in card:
            # doc/token totals match the manifest exactly
            assert manifest[(r["source"], r["shard"])] == (
                r["n_docs"], r["n_tokens"],
            )
            # language columns partition the shard's docs
            assert (
                r["n_en"] + r["n_de"] + r["n_es"] + r["n_fr"]
                + r["n_other_lang"] == r["n_docs"]
            )
            assert r["n_other_lang"] > 0 or r["n_docs"] < 3  # zh present
            assert 0.0 <= r["min_quality"] <= r["mean_quality"] <= 1.0

    def test_quality_is_exact_integer_arithmetic(self, spark):
        # one shard, known scores: all docs pass all three bands
        # (score 1.0) except one that fails the size band (score 0.7,
        # 5 tokens < 10) — mean is exact
        from kafka_graphs_spark.pipeline.shards import shard_datasheet

        docs = spark.createDataFrame(
            [(1, "s", "en", "the quick brown fox jumps over the lazy dog ten"),
             (2, "s", "en", "the quick brown fox jumps over the lazy dog ten"),
             (3, "s", "en", "the tiny doc here now")],
            "doc_id long, source string, lang string, text string",
        )
        card = shard_datasheet(docs, tokens_per_shard=10_000).collect()
        assert len(card) == 1
        r = card[0]
        assert r["min_quality"] == 0.7
        assert r["mean_quality"] == 0.9  # (10+10+7)/30


class TestCurateReportLicenseStage:
    def test_funnel_includes_license_gate_and_reconciles(self, spark):
        from kafka_graphs_spark.pipeline.curate import curate, curate_report
        from kafka_graphs_spark.pipeline.licenses import PERMISSIVE_CC

        filler = (
            " the quick brown fox jumps over the lazy dog and it is a"
            " reasonable document for the quality bands to accept today"
        )
        docs = spark.createDataFrame(
            [
                (1, '<meta name="robots" content="noindex"> opted out' + filler),
                (2, "cc https://creativecommons.org/licenses/by-nd/4.0/" + filler),
                (3, "cc https://creativecommons.org/licenses/by/4.0/" + filler),
                (4, "no signals here at all" + filler),
            ],
            "doc_id long, text string",
        )
        report = {
            r["stage"]: (r["n_in"], r["n_dropped"], r["n_out"])
            for r in curate_report(
                docs, min_score=0.6, jaccard_threshold=0.99,
                respect_robots=True, license_allow=list(PERMISSIVE_CC),
            ).collect()
        }
        assert "license_gate" in report
        n_in, dropped, out = report["license_gate"]
        assert dropped == 2 and out == n_in - 2  # noindex + by-nd
        # funnel chains: each stage's n_in is the previous n_out
        kept = curate(
            docs, min_score=0.6, jaccard_threshold=0.99,
            respect_robots=True, license_allow=list(PERMISSIVE_CC),
        ).count()
        assert report["dedup_resolve"][2] == kept

    def test_defaults_unchanged(self, spark):
        # no license params -> no license stage, byte-identical funnel
        from kafka_graphs_spark.pipeline.curate import curate_report

        docs = spark.createDataFrame(
            [(i, "the quick brown fox jumps over a lazy dog again " * 3)
             for i in range(6)],
            "doc_id long, text string",
        )
        stages = [r["stage"] for r in curate_report(docs).collect()]
        assert stages == ["quality_gate", "dedup_resolve"]
