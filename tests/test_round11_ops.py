"""Round-11 operator tests — online skew monitor (streaming_hot_keys +
finalize_hot_keys), the streaming twin of the batch hot_keys audit."""

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
