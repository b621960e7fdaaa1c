"""Scale probe for the round-11 operators at true larger SFs.

Measures wall time of each round-11 addition at 1x (driver sf0.1), 5x
(.scratch/sf0.5), and 10x (.scratch/sf1.0) synthetic data — the "would
this hold at 1000x" check the plan-audit tests assert structurally,
verified here by measurement:

- license_signals + license_gate: pure scan expressions — must scale
  ~linearly with bytes;
- bloom_url_dedup_check: fixed-size filter build (one bit_or shuffle
  over corpus URLs) + scan-speed probes + one min-agg over the unseen
  subset — ~linear;
- shard_datasheet: two bounded window cumsums + two keyed joins + one
  groupBy — ~linear;
- streaming hot keys: full 3-file replay + windowed stateful agg +
  batch finalize over events — ~linear in events.

Usage: python scripts/r11_scale_probe.py
Requires .scratch/sf0.5 and .scratch/sf1.0 (scripts/gen_scale_data.py).
"""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def t(fn):
    t0 = time.time()
    n = fn()
    return time.time() - t0, n


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("r11-scale-probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from __spark_entry__ import _doc_urls_messy
    from kafka_graphs_spark import datasets
    from kafka_graphs_spark.pipeline.bloom import bloom_url_dedup_check
    from kafka_graphs_spark.pipeline.licenses import (
        PERMISSIVE_CC,
        license_gate,
        license_signals,
    )
    from kafka_graphs_spark.pipeline.shards import shard_datasheet
    from kafka_graphs_spark.streaming import (
        finalize_hot_keys,
        streaming_hot_keys,
    )

    dirs = [
        ("1x", "/root/testdata/sf0.1"),
        ("5x", ".scratch/sf0.5"),
        ("10x", ".scratch/sf1.0"),
    ]
    # warm-up outside timers
    license_signals(datasets.load(spark, dirs[0][1], "documents")).count()

    for label, d in dirs:
        docs = datasets.load(spark, d, "documents")
        n_docs = docs.count()

        dt_sig, _ = t(lambda: license_signals(docs).count())
        dt_gate, _ = t(
            lambda: license_gate(
                docs, respect_robots=True, license_allow=list(PERMISSIVE_CC)
            ).filter(F.col("keep")).count()
        )

        messy = _doc_urls_messy(spark, d)
        dt_bloom, _ = t(
            lambda: bloom_url_dedup_check(
                messy.filter(F.col("doc_id") % 3 == 2),
                messy.filter(F.col("doc_id") % 3 < 2),
            ).count()
        )

        dt_card, n_shards = t(
            lambda: shard_datasheet(docs, tokens_per_shard=500).count()
        )

        # streaming hot keys: full replay over the events table
        ev = datasets.load(spark, d, "events")
        n_ev = ev.count()
        item = (
            F.when(F.col("event_id") % 3 == 0, F.lit(7))
            .when(F.col("event_id") % 5 == 0, F.lit(11))
            .otherwise(F.col("user_id") + 1000)
        )
        base = ev.select(item.cast("long").alias("item"), "ts")

        def run_stream():
            tmp, rows = [], []
            try:
                src = tempfile.mkdtemp(prefix="kgs_sp_src_")
                tmp.append(src)
                base.repartition(3).write.mode("overwrite").parquet(src)
                ckpt = tempfile.mkdtemp(prefix="kgs_sp_ckpt_")
                tmp.append(ckpt)
                stream = (
                    spark.readStream.schema("item long, ts timestamp")
                    .option("maxFilesPerTrigger", 1)
                    .parquet(src)
                )
                counts = streaming_hot_keys(
                    stream, "item", "ts", "7 days", watermark="3650 days"
                )
                q = (
                    counts.writeStream.foreachBatch(
                        lambda b, _i: rows.extend(b.collect())
                    )
                    .outputMode("update")
                    .option("checkpointLocation", ckpt)
                    .trigger(availableNow=True)
                    .start()
                )
                assert q.awaitTermination(600)
            finally:
                for p in tmp:
                    shutil.rmtree(p, ignore_errors=True)
            emissions = spark.createDataFrame(
                [(r["window_start"], r["key"], r["n_rows"]) for r in rows],
                "window_start long, key long, n_rows long",
            )
            return finalize_hot_keys(emissions, k=5).count()

        dt_stream, n_hot = t(run_stream)

        print(
            f"{label}: docs={n_docs} events={n_ev} | "
            f"license_signals={dt_sig:.2f}s gate={dt_gate:.2f}s "
            f"bloom_url_check={dt_bloom:.2f}s "
            f"shard_card={dt_card:.2f}s ({n_shards} shards) "
            f"hot_keys_stream={dt_stream:.2f}s ({n_hot} rows)",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
