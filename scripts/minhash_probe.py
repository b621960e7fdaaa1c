"""Minhash signature-representation probe at a true larger SF (r9
verdict #6): min over 32-hex-char md5 strings (current) vs min over the
int64 of the first 15 hex chars (8-byte agg buffers, long comparisons).

Both forms run the SAME md5 per (shingle, seed); the int64 form adds a
conv+cast per digest but aggregates longs. DuckDB mirrors the int64
form exactly via ('0x' || substr(md5(...), 1, 15))::BIGINT, so oracle
parity survives the switch (min ties only if two digests share their
first 60 bits: P ~ 2^-60 per pair).

Usage: python scripts/minhash_probe.py [SF_DIR] [REPS]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf1.0"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("minhash-probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from kafka_graphs_spark.pipeline.dedup import shingles

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").persist()
    print("docs:", docs.count())
    sh = shingles(docs, n=3)
    print("shingle rows:", sh.count())

    NH = 16

    def str_form():
        mins = [
            F.min(F.md5(F.concat_ws(":", F.col("shingle"), F.lit(str(i))))).alias(f"_m{i}")
            for i in range(NH)
        ]
        return sh.groupBy("doc_id").agg(*mins)

    def int_form():
        mins = [
            F.min(
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws(":", F.col("shingle"), F.lit(str(i)))), 1, 15
                    ),
                    16, 10,
                ).cast("long")
            ).alias(f"_m{i}")
            for i in range(NH)
        ]
        return sh.groupBy("doc_id").agg(*mins)

    def km_form(frame):
        # ONE md5 per shingle; the 16 per-seed hashes are derived from
        # the digest's two 58-bit halves by Kirsch-Mitzenmacher double
        # hashing g_i = h1 + i*h2 (exact int64 arithmetic, no overflow:
        # h1 + 15*h2 <= 16*2^58 = 2^62). DuckDB mirrors every step.
        d = F.md5(F.col("shingle"))
        h1 = F.conv(F.substring(d, 1, 14), 16, 10).cast("long") % F.lit(1 << 58)
        h2 = F.conv(F.substring(d, 17, 14), 16, 10).cast("long") % F.lit(1 << 58)
        base = frame.select("doc_id", h1.alias("_h1"), h2.alias("_h2"))
        mins = [
            F.min(F.col("_h1") + F.lit(i) * F.col("_h2")).alias(f"_m{i}")
            for i in range(NH)
        ]
        return base.groupBy("doc_id").agg(*mins)

    sh32 = sh.repartition(32).persist()
    sh32.count()
    for r in range(reps):
        t0 = time.time(); str_form().count(); ts = time.time() - t0
        t0 = time.time(); int_form().count(); ti = time.time() - t0
        t0 = time.time(); km_form(sh).count(); tk = time.time() - t0
        t0 = time.time()
        mins = [F.min(F.md5(F.concat_ws(":", F.col("shingle"), F.lit(str(i))))).alias(f"_m{i}") for i in range(NH)]
        sh32.groupBy("doc_id").agg(*mins).count()
        ts32 = time.time() - t0
        t0 = time.time(); km_form(sh32).count(); tk32 = time.time() - t0
        print(f"rep {r}: str={ts:.2f}s int64={ti:.2f}s km={tk:.2f}s "
              f"str@32part={ts32:.2f}s km@32part={tk32:.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
