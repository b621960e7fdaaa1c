"""Break ONE svdpp iteration into stage segments (r14, guide §1.4).

svdpp1 is the most expensive benched path (41-64 s/iteration at sf0.1,
VERDICT r13 #3). Before touching it, split the round into its three
segments and time each with a noop sink, interleaved reps:

  A. gather        — edges ⋈ item_f → groupBy(user).collect_list (+ own join)
  B. + user_step   — A plus the mapInPandas user superstep
  C. full round    — B plus message explode → groupBy(item) → item_step

(B−A) isolates the user-superstep Arrow+Python cost; (C−B) the item
side. Each segment is evaluated via noop write so every column is
computed (count would prune the wide msgs column).

Usage: python scripts/svdpp_break.py [SF_DIR] [DIM] [REPS]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("svdpp-break")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from kafka_graphs_spark.library import svdpp
    from kafka_graphs_spark.library.cf import _factors_schema  # noqa: F401
    from kafka_graphs_spark.graph import Graph

    ratings = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy(F.col("l_suppkey").alias("src"),
                 (F.col("l_partkey") + 1000000).alias("dst"))
        .agg((F.avg("l_quantity") / 10.0).alias("value"))
    )
    edges = ratings.select("src", "dst",
                           F.col("value").cast("double").alias("value")).persist()
    n = edges.count()
    users = edges.select(F.col("src").alias("id")).distinct().count()
    items = edges.select(F.col("dst").alias("id")).distinct().count()
    print(f"ratings={n} users={users} items={items} dim={dim}", flush=True)
    g = Graph.from_edges(edges, F.lit(0.0))

    # segment timers ride a monkey-patched ChainLoop.advance: we time the
    # full svdpp(iterations=1) call per rep and, separately, the pieces
    # below built from the same internals the operator uses.
    import numpy as np  # noqa: F401
    from kafka_graphs_spark.library import _loop
    from kafka_graphs_spark.library.cf import svdpp as svdpp_fn  # noqa: F401

    walls = {k: [] for k in ("full", "init", "gatherA", "userB", "itemC")}
    for r in range(reps):
        # full operator wall
        spark.sparkContext.setJobDescription("svdpp-break: full")
        t = time.time()
        u, i, _ = svdpp(g, dim=dim, iterations=1, bias_gamma=0.1,
                        factor_gamma=0.1, seed=3, dtype="float32")
        u.count(), i.count()
        walls["full"].append(time.time() - t)

        # piecewise: replicate the round frames via the module internals
        import kafka_graphs_spark.library.cf as cf
        arr = "array<float>"
        edges_c, release_edges = _loop.sized_cache(
            g.edges.select("src", "dst", F.col("value").cast("double").alias("value")))
        us_df = edges_c.select(F.col("src").alias("id")).distinct()
        it_df = edges_c.select(F.col("dst").alias("id")).distinct()
        t = time.time()
        # init factors (same code path as svdpp's init_side via private fn)
        user_f = cf._init_factors(us_df, dim, 3, "float32").withColumn("b", F.lit(0.5))
        item_f = (cf._init_factors(it_df, dim, 3, "float32")
                  .withColumn("b", F.lit(0.5))
                  .withColumn("w", F.col("vec")))
        user_f.persist().count(); item_f.persist().count()
        walls["init"].append(time.time() - t)

        spark.sparkContext.setJobDescription("svdpp-break: A gather")
        gathered = (
            edges_c.select(F.col("src").alias("id"), F.col("dst").alias("_i"),
                           F.col("value").alias("_r"))
            .join(item_f.select(F.col("id").alias("_i"), F.col("b").alias("_bi"),
                                F.col("vec").alias("_q"), F.col("w").alias("_w")),
                  on="_i")
            .groupBy("id")
            .agg(F.collect_list(F.struct(
                F.col("_i").alias("i"), F.col("_q").alias("q"), F.col("_w").alias("w"),
                F.col("_bi").alias("bi"), F.col("_r").alias("r"))).alias("nbrs"))
            .join(user_f.select("id", "b", "vec"), on="id")
        )
        t = time.time()
        noop(gathered)
        walls["gatherA"].append(time.time() - t)

        spark.sparkContext.setJobDescription("svdpp-break: B user_step")
        # user_step clone (same math as cf.svdpp's nested fn)
        import math as _math
        mean = 2.5
        bias_gamma = factor_gamma = 0.1
        bias_lambda = factor_lambda = 0.005
        min_rating, max_rating = 0.0, 5.0

        msg_schema = (
            f"id long, b double, vec {arr}, rmse double, "
            f"msgs array<struct<item: long, fstep: {arr}, wstep: {arr}, bstep: double>>"
        )

        def user_step(batches):
            import numpy as np
            import pandas as pd
            for pdf in batches:
                rows = []
                for uid, bu, p, nbrs in zip(pdf["id"], pdf["b"], pdf["vec"], pdf["nbrs"]):
                    p = np.asarray(p, dtype="float64").copy()
                    bu = float(bu)
                    nbrs = sorted(nbrs, key=lambda t: t["i"])
                    nn = len(nbrs)
                    sum_w = np.zeros(dim)
                    for tt in nbrs:
                        sum_w += np.asarray(tt["w"], dtype="float64")
                    imp = sum_w / _math.sqrt(nn)
                    w_step = np.zeros(dim)
                    for tt in nbrs:
                        q = np.asarray(tt["q"], dtype="float64")
                        pred = min(max(mean + bu + tt["bi"] + float(q @ (p + imp)), min_rating), max_rating)
                        err = tt["r"] - pred
                        bu = bu + bias_gamma * (err - bias_lambda * bu)
                        p += -factor_lambda * factor_gamma * p + factor_gamma * err * q
                        w_step += err * q
                    w_step *= factor_gamma / _math.sqrt(nn)
                    msgs, rmse = [], 0.0
                    for tt in nbrs:
                        q = np.asarray(tt["q"], dtype="float64")
                        pred = min(max(mean + bu + tt["bi"] + float(q @ (p + imp)), min_rating), max_rating)
                        err = tt["r"] - pred
                        f_step = (imp + p) * (factor_gamma * err)
                        rmse += err * err
                        msgs.append((int(tt["i"]), f_step.astype("float32").tolist(),
                                     w_step.astype("float32").tolist(), bias_gamma * err))
                    rows.append((int(uid), bu, p.astype("float32").tolist(), rmse, msgs))
                yield pd.DataFrame(rows, columns=["id", "b", "vec", "rmse", "msgs"])

        ures = gathered.mapInPandas(user_step, schema=msg_schema)
        t = time.time()
        noop(ures)
        walls["userB"].append(time.time() - t)

        spark.sparkContext.setJobDescription("svdpp-break: C item side")
        ures_p = ures.persist()
        ures_p.count()
        steps = (
            ures_p.select(F.col("id").alias("u"), F.explode("msgs").alias("m"))
            .select(F.col("m.item").alias("id"), F.struct(
                F.col("u").alias("u"), F.col("m.fstep").alias("fstep"),
                F.col("m.wstep").alias("wstep"), F.col("m.bstep").alias("bstep")).alias("s"))
            .groupBy("id")
            .agg(F.collect_list("s").alias("steps"))
        )

        def item_step(batches):
            import numpy as np
            import pandas as pd
            for pdf in batches:
                rows = []
                for iid, bi, q, y, st in zip(pdf["id"], pdf["b"], pdf["vec"], pdf["w"], pdf["steps"]):
                    q = np.asarray(q, dtype="float64").copy()
                    y = np.asarray(y, dtype="float64").copy()
                    bi = float(bi)
                    for s in sorted(st, key=lambda t: t["u"]):
                        bi = bi + s["bstep"] - bias_gamma * bias_lambda * bi
                        q += np.asarray(s["fstep"], dtype="float64") - factor_gamma * factor_lambda * q
                        y += np.asarray(s["wstep"], dtype="float64") - factor_gamma * factor_lambda * y
                    rows.append((int(iid), bi, q.astype("float32").tolist(), y.astype("float32").tolist()))
                yield pd.DataFrame(rows, columns=["id", "b", "vec", "w"])

        it2 = (item_f.join(steps, on="id", how="left")
               .withColumn("steps", F.coalesce(F.col("steps"), F.array()))
               .mapInPandas(item_step, schema=f"id long, b double, vec {arr}, w {arr}"))
        t = time.time()
        noop(it2)
        walls["itemC"].append(time.time() - t)
        ures_p.unpersist(); user_f.unpersist(); item_f.unpersist(); release_edges()
        print(f"rep {r}: " + " ".join(f"{k}={walls[k][-1]:.2f}s" for k in walls), flush=True)

    for k, v in walls.items():
        print(f"{k}: min={min(v):.2f} all=" + " ".join(f"{x:.2f}" for x in v), flush=True)
    print("userB-gatherA (user Arrow+Python, floor): "
          f"{min(walls['userB']) - min(walls['gatherA']):.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
