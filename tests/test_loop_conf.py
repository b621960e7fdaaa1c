"""AdaptiveLoopConf sizing from measured rows AND bytes (_loop.py)."""

import pytest
from pyspark import StorageLevel
from pyspark.sql import functions as F

from kafka_graphs_spark.library._loop import AdaptiveLoopConf, measured_size_bytes


class TestMeasuredBytes:
    def test_cached_frame_reports_real_bytes(self, spark):
        df = spark.range(1000).withColumn(
            "payload",
            F.transform(
                F.sequence(F.lit(1), F.lit(20)),
                lambda i: F.sha2(F.concat(F.col("id").cast("string"), i.cast("string")), 256),
            ),
        )
        df.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            df.count()
            b = measured_size_bytes(df)
            # ~1000 rows x 20 x 64-char digests: well over 200 KB even columnar
            assert b > 200_000
        finally:
            df.unpersist()


class TestAdaptiveConfBytes:
    def test_wide_rows_size_by_bytes_not_rows(self, spark):
        conf = AdaptiveLoopConf()
        saved = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            # 1000 rows would give 1 partition by rows alone; 300 MiB of
            # state must win (capped at the session's own setting)
            conf.tune(spark, n_rows=1000, n_bytes=300 << 20)
            assert int(spark.conf.get("spark.sql.shuffle.partitions")) == min(
                5, max(int(saved), 1)
            )
            # narrow state: row-based sizing unchanged
            conf.tune(spark, n_rows=1000, n_bytes=1 << 20)
            assert spark.conf.get("spark.sql.shuffle.partitions") == "1"
            # bytes unmeasurable: pre-byte behavior (rows alone)
            conf.tune(spark, n_rows=1000, n_bytes=-1)
            assert spark.conf.get("spark.sql.shuffle.partitions") == "1"
            # over the byte threshold: restore the session config (AQE regime)
            conf.tune(spark, n_rows=1000, n_bytes=(8 << 30) + 1)
            assert spark.conf.get("spark.sql.shuffle.partitions") == saved
        finally:
            conf.restore(spark)
        assert spark.conf.get("spark.sql.shuffle.partitions") == saved
