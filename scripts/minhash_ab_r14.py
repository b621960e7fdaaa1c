"""Interleaved A/B: minhash signatures over distinct vs raw shingles (r14).

The r13 ``minhash_signatures`` computed per-seed minima over
``shingles()`` = explode + ``distinct()`` — the distinct's Exchange is
the only shuffle in the repo whose bytes outgrow its input (raw shingle
strings ≈ 8x doc bytes, VERDICT r13 #4). ``min`` is duplicate-
insensitive, so the r14 code aggregates over the raw explode and drops
the distinct outright; the remaining single Exchange carries only the
map-side-combined per-(partition, doc) digest minima.

This probe times the bench's exact headline shape
(``minhash_lsh_candidates(docs, num_hashes=16, bands=4).count()``)
with both shingle feeds ALTERNATING in one session, then compares the
two signature tables exactly (min over a multiset == min over its
support — the results must be identical, not just close).

Usage: python scripts/minhash_ab_r14.py [SF_DIR] [REPS]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("minhash-ab-r14")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from kafka_graphs_spark.pipeline import dedup

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .repartition(int(cpus)).persist()
    )
    print("docs:", docs.count(), flush=True)

    NH, BANDS, N = 16, 4, 3

    def signatures(sh):
        # exact clone of minhash_signatures' aggregation (md5-hex string
        # minima) over a given shingle feed
        mins = [
            F.min(
                F.md5(F.concat_ws(":", F.col("shingle"), F.lit(str(i))))
            ).alias(f"_m{i}")
            for i in range(NH)
        ]
        agg = sh.groupBy("doc_id").agg(*mins)
        return agg.select(
            "doc_id", F.array(*[F.col(f"_m{i}") for i in range(NH)]).alias("signature")
        )

    def lsh_count(sh):
        # exact clone of minhash_lsh_candidates' banding over a given feed
        sig = signatures(sh)
        rows_per_band = NH // BANDS
        banded = sig.select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(BANDS - 1))).alias("band"),
            F.col("signature"),
        ).select(
            "doc_id", "band",
            F.array_join(
                F.slice("signature", F.col("band") * rows_per_band + 1, rows_per_band),
                "|",
            ).alias("bucket"),
        )
        a = banded.select(F.col("doc_id").alias("doc_a"), "band", "bucket")
        b = banded.select(F.col("doc_id").alias("doc_b"), "band", "bucket")
        return (
            a.join(b, on=["band", "bucket"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b").distinct().count()
        )

    feeds = {
        "distinct": lambda: dedup.shingles(docs, n=N),
        "raw": lambda: dedup._exploded_shingles(docs, N, "text"),
    }
    # warm-up
    signatures(feeds["raw"]()).count()

    walls = {k: [] for k in feeds}
    for r in range(reps):
        for label, feed in feeds.items():
            spark.sparkContext.setJobDescription(f"minhash-lsh-{label} rep{r}")
            t = time.time()
            n = lsh_count(feed())
            walls[label].append(time.time() - t)
        print(f"rep {r}: " + " ".join(f"{k}={walls[k][-1]:.2f}s" for k in feeds)
              + f" (candidates={n})", flush=True)
    for k, v in walls.items():
        print(f"{k}: min={min(v):.2f} all=" + " ".join(f"{x:.2f}" for x in v),
              flush=True)

    # exact signature equality
    a = {r["doc_id"]: tuple(r["signature"]) for r in signatures(feeds["distinct"]()).collect()}
    b = {r["doc_id"]: tuple(r["signature"]) for r in signatures(feeds["raw"]()).collect()}
    diff = {k for k in a.keys() | b.keys() if a.get(k) != b.get(k)}
    print(f"signature equality: {len(a)} docs, {len(diff)} differing "
          f"({'OK — identical' if not diff else 'MISMATCH'})", flush=True)
    assert not diff
    spark.stop()


if __name__ == "__main__":
    main()
