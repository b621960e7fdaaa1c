"""applyInPandasWithState operators: cross-batch AND cross-restart state.

Drives a real file-source stream in two availableNow runs sharing one
checkpoint — the second run proves the keyed state survives a query
restart (the durability the reference's in-memory mapper state lacks).
"""

import pytest
from pyspark.sql import functions as F

SCHEMA = "src long, dst long, value double"


def run_stream(spark, op, src_dir, ckpt, _table):
    # foreachBatch sink: supports update output AND checkpoint recovery
    # (the memory sink cannot restart from a checkpoint)
    rows = []

    def sink(batch_df, _batch_id):
        rows.extend(batch_df.collect())

    stream = spark.readStream.schema(SCHEMA).parquet(src_dir)
    q = (
        op(stream)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return rows


def write_batch(spark, rows, path):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


class TestStatefulDegrees:
    def test_state_survives_batches_and_restart(self, spark, tmp_path):
        from kafka_graphs_spark.streaming.stateful import stateful_degrees

        src = str(tmp_path / "edges")
        ckpt = str(tmp_path / "ckpt")
        write_batch(spark, [(1, 2, 1.0), (2, 3, 1.0)], src)

        out1 = run_stream(spark, stateful_degrees, src, ckpt, "deg1")
        got1 = {r["id"]: r["degree"] for r in out1}
        assert got1 == {1: 1, 2: 2, 3: 1}

        # second run, SAME checkpoint: the new batch's counts accumulate
        # onto restored state (2 gains another edge; 4 appears fresh)
        write_batch(spark, [(2, 4, 1.0)], src)
        out2 = run_stream(spark, stateful_degrees, src, ckpt, "deg2")
        got2 = {r["id"]: r["degree"] for r in out2}
        assert got2 == {2: 3, 4: 1}

    def test_matches_batch_twin(self, spark, tmp_path):
        from kafka_graphs_spark.streaming import EdgeStream
        from kafka_graphs_spark.streaming.stateful import stateful_degrees

        rows = [(1, 2, 1.0), (1, 3, 1.0), (3, 2, 1.0), (2, 1, 1.0)]
        src = str(tmp_path / "edges_b")
        write_batch(spark, rows, src)
        out = run_stream(
            spark, stateful_degrees, src, str(tmp_path / "ckpt_b"), "deg_twin"
        )
        got = {r["id"]: r["degree"] for r in out}
        batch = {
            r["id"]: r["degree"]
            for r in EdgeStream(spark.createDataFrame(rows, SCHEMA)).degrees().collect()
        }
        assert got == batch


class TestStatefulDistinctDegrees:
    def test_duplicate_edges_counted_once(self, spark, tmp_path):
        from kafka_graphs_spark.streaming.stateful import stateful_distinct_degrees

        src = str(tmp_path / "edges_d")
        ckpt = str(tmp_path / "ckpt_d")
        write_batch(spark, [(1, 2, 1.0), (1, 2, 2.0), (1, 3, 1.0)], src)
        out1 = run_stream(spark, stateful_distinct_degrees, src, ckpt, "dd1")
        got1 = {r["id"]: r["degree"] for r in out1}
        assert got1 == {1: 2, 2: 1, 3: 1}

        # re-sent edge across a restart still deduplicates via state
        write_batch(spark, [(2, 1, 3.0), (1, 4, 1.0)], src)
        out2 = run_stream(spark, stateful_distinct_degrees, src, ckpt, "dd2")
        got2 = {r["id"]: r["degree"] for r in out2}
        # (2,1) mirrors the already-seen (1,2): both endpoint sets unchanged
        # by it; (1,4) adds 4 to vertex 1 and creates vertex 4
        assert got2 == {1: 3, 2: 1, 4: 1}


class TestWatermarkedWindows:
    """Event-time watermark: append-mode windowed aggregation with
    late-data drop — beyond the reference (processing-time only)."""

    SCHEMA_T = "src long, dst long, value double, event_time timestamp"

    def _write(self, spark, rows, path):
        df = spark.createDataFrame(
            [(s, d, v, t) for s, d, v, t in rows],
            "src long, dst long, value double, event_time string",
        ).withColumn("event_time", F.to_timestamp("event_time"))
        df.coalesce(1).write.mode("append").parquet(path)

    def _run(self, spark, src, ckpt):
        from kafka_graphs_spark.streaming import EdgeStream

        rows = []

        def sink(batch_df, _batch_id):
            rows.extend(batch_df.collect())

        stream = spark.readStream.schema(self.SCHEMA_T).parquet(src)
        out = (
            EdgeStream(stream)
            .with_watermark("10 minutes")
            .slice("1 hour")
            .reduce_on_edges("sum")
        )
        q = (
            out.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return rows

    def test_append_mode_emits_closed_windows_and_drops_late(self, spark, tmp_path):
        src, ckpt = str(tmp_path / "edges"), str(tmp_path / "ckpt")
        # window A [00:00,01:00): two edges; window B advances the watermark
        self._write(
            spark,
            [
                (1, 2, 5.0, "2026-01-01 00:10:00"),
                (1, 3, 7.0, "2026-01-01 00:20:00"),
                (9, 9, 1.0, "2026-01-01 03:00:00"),
            ],
            src,
        )
        out1 = self._run(spark, src, ckpt)
        got1 = {
            (r["window"]["start"].hour, r["id"]): r["value"] for r in out1
        }
        # availableNow flushes a trailing batch after the watermark
        # advances to 02:50 — window A closes and is emitted; window B
        # ([03:00,04:00), at the watermark frontier) stays open
        assert got1 == {(0, 1): 12.0}

        # a LATE edge for window A (watermark 02:50 ≫ window end) must be
        # dropped — its evicted window NEVER re-emits
        self._write(spark, [(1, 4, 100.0, "2026-01-01 00:30:00")], src)
        out2 = self._run(spark, src, ckpt)
        hours = {r["window"]["start"].hour for r in out2}
        assert 0 not in hours


class TestStreamingExactDedup:
    DOC_SCHEMA = "doc_id long, text string, ts timestamp"

    def _write(self, spark, rows, path):
        spark.createDataFrame(rows, self.DOC_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(path)

    def _run(self, spark, src, ckpt, **kw):
        from kafka_graphs_spark.pipeline.dedup import streaming_exact_dedup

        rows = []

        def sink(batch_df, _bid):
            rows.extend(batch_df.collect())

        stream = spark.readStream.schema(self.DOC_SCHEMA).parquet(src)
        q = (
            streaming_exact_dedup(stream, **kw)
            .writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return rows

    def test_seen_set_survives_restart(self, spark, tmp_path):
        import datetime

        t = datetime.datetime(2026, 1, 1)
        src, ckpt = str(tmp_path / "docs"), str(tmp_path / "ckpt")
        self._write(spark, [(1, "alpha beta", t), (2, "Alpha  BETA!", t)], src)
        out1 = self._run(spark, src, ckpt)
        # normalization collapses case/punct variants to one fingerprint
        assert sorted(r.doc_id for r in out1) in ([1], [2])

        # second run, same checkpoint: the duplicate arriving later is
        # dropped against RESTORED state; only the new text passes
        self._write(spark, [(3, "ALPHA beta?", t), (4, "gamma delta", t)], src)
        out2 = self._run(spark, src, ckpt)
        assert sorted(r.doc_id for r in out2) == [4]

    def test_batch_frame_first_wins(self, spark):
        import datetime

        from kafka_graphs_spark.pipeline.dedup import streaming_exact_dedup

        t = datetime.datetime(2026, 1, 1)
        df = spark.createDataFrame(
            [(1, "x y z", t), (2, "x  y z", t), (3, "unique here", t)],
            self.DOC_SCHEMA,
        )
        out = streaming_exact_dedup(df)
        assert out.count() == 2

    def test_watermark_requires_time_col(self, spark, tmp_path):
        import datetime

        t = datetime.datetime(2026, 1, 1)
        src, ckpt = str(tmp_path / "docs_w"), str(tmp_path / "ckpt_w")
        self._write(spark, [(1, "a b c", t)], src)
        with pytest.raises(ValueError, match="time_col"):
            self._run(spark, src, ckpt, watermark="1 hour")

    def test_watermark_bounded_dedup_runs(self, spark, tmp_path):
        import datetime

        t = datetime.datetime(2026, 1, 1)
        src, ckpt = str(tmp_path / "docs_wb"), str(tmp_path / "ckpt_wb")
        self._write(
            spark,
            [(1, "p q r", t), (2, "p  q R.", t), (3, "s t u", t)],
            src,
        )
        out = self._run(spark, src, ckpt, time_col="ts", watermark="1 hour")
        assert sorted({r.doc_id for r in out} & {3}) == [3]
        assert len({r.text for r in out}) == 2  # one of the p-q-r pair + s t u


class TestHeavyVertices:
    def test_threshold_fires_once_across_restart(self, spark, tmp_path):
        from kafka_graphs_spark.streaming.stateful import stateful_heavy_vertices

        src, ckpt = str(tmp_path / "hv"), str(tmp_path / "hv_ck")
        # batch 1: vertex 2 touches twice, 1/3 once
        write_batch(spark, [(1, 2, 1.0), (2, 3, 1.0)], src)
        out1 = run_stream(
            spark, lambda s: stateful_heavy_vertices(s, min_degree=3), src, ckpt, "hv1"
        )
        assert out1 == []  # nobody at 3 yet

        # batch 2 (same checkpoint): 2 reaches 3 -> fires once, exactly
        write_batch(spark, [(2, 4, 1.0)], src)
        out2 = run_stream(
            spark, lambda s: stateful_heavy_vertices(s, min_degree=3), src, ckpt, "hv2"
        )
        assert [(r["id"], r["degree"]) for r in out2] == [(2, 3)]

        # batch 3: more touches on 2 do NOT re-emit; 4 reaches 3 and fires
        write_batch(spark, [(2, 4, 1.0), (4, 5, 1.0), (4, 6, 1.0)], src)
        out3 = run_stream(
            spark, lambda s: stateful_heavy_vertices(s, min_degree=3), src, ckpt, "hv3"
        )
        got = sorted((r["id"], r["degree"]) for r in out3)
        assert got == [(4, 4)]

    def test_param_guard(self, spark):
        from kafka_graphs_spark.streaming.stateful import stateful_heavy_vertices

        df = spark.createDataFrame([(1, 2, 1.0)], SCHEMA)
        with pytest.raises(ValueError):
            stateful_heavy_vertices(df, min_degree=0)


EV_SCHEMA = "event_id long, ts timestamp_ntz, user_id long, value double"


class TestStatefulSessions:
    def _write(self, spark, rows, path):
        df = spark.createDataFrame(
            [(i, r[0], r[1], r[2]) for i, r in enumerate(rows)],
            "event_id long, ts string, user_id long, value double",
        ).select(
            "event_id",
            F.to_timestamp("ts").cast("timestamp_ntz").alias("ts"),
            "user_id",
            "value",
        )
        df.coalesce(1).write.mode("append").parquet(path)

    def _run(self, spark, src, ckpt):
        from kafka_graphs_spark.streaming.stateful import stateful_sessions

        rows = []

        def sink(batch_df, _batch_id):
            rows.extend(batch_df.collect())

        stream = spark.readStream.schema(EV_SCHEMA).parquet(src)
        q = (
            stateful_sessions(stream, gap_minutes=30)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return rows

    def test_sessions_across_batches_and_restart(self, spark, tmp_path):
        src, ckpt = str(tmp_path / "ev"), str(tmp_path / "ev_ck")
        self._write(
            spark,
            [
                ("2024-01-01 00:00:00", 1, 1.0),
                ("2024-01-01 00:10:00", 1, 2.0),
                ("2024-01-01 00:05:00", 2, 5.0),
            ],
            src,
        )
        out1 = {(r["user_id"], r["session"]): r for r in self._run(spark, src, ckpt)}
        assert out1[(1, 0)]["n_events"] == 2
        assert out1[(1, 0)]["total_value"] == 3.0
        assert out1[(2, 0)]["n_events"] == 1

        # second run, same checkpoint: user 1's next event is 50 min after
        # the restored last_us -> NEW session; user 2 extends session 0
        self._write(
            spark,
            [
                ("2024-01-01 01:00:00", 1, 7.0),
                ("2024-01-01 00:20:00", 2, 1.0),
            ],
            src,
        )
        out2 = {(r["user_id"], r["session"]): r for r in self._run(spark, src, ckpt)}
        assert out2[(1, 1)]["n_events"] == 1
        assert out2[(1, 1)]["total_value"] == 7.0
        assert out2[(2, 0)]["n_events"] == 2
        assert out2[(2, 0)]["total_value"] == 6.0

    def test_matches_batch_twin(self, spark, tmp_path):
        from kafka_graphs_spark.pipeline.sessions import session_stats

        rows = [
            ("2024-01-01 00:00:00", 1, 1.0),
            ("2024-01-01 00:10:00", 1, 2.0),
            ("2024-01-01 00:55:00", 1, 3.0),
            ("2024-01-01 01:00:00", 2, 1.5),
            ("2024-01-01 01:30:00", 2, 2.5),
        ]
        src = str(tmp_path / "ev_b")
        self._write(spark, rows, src)
        out = self._run(spark, src, str(tmp_path / "ev_b_ck"))
        # final state per (user, session) from the stream
        got = {}
        for r in out:
            got[(r["user_id"], r["session"])] = (
                r["n_events"], r["start_us"], r["end_us"], r["total_value"]
            )
        batch_df = spark.read.parquet(src)
        twin = {
            (r["user_id"], r["session"]): (
                r["n_events"], r["start_us"], r["end_us"], r["total_value"]
            )
            for r in session_stats(batch_df, gap_minutes=30).collect()
        }
        assert got == twin
