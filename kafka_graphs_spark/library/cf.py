"""Collaborative filtering: ALS and SGD matrix factorization on the
bipartite user→item ratings graph.

Reference:
- io/kgraph/library/cf/Als.java:36-302 — per-vertex normal-equation solve
  ``(M·Mᵀ + λ·N·I)·u = M·R`` (updateValue :166-180, jblas Solve.solve);
  superstep 1 inits user factors to 0.01·rand(dim), superstep 2 adds the
  reverse edges and solves the items, then sides alternate; RMSE
  aggregator halts when below target.
- io/kgraph/library/cf/Sgd.java:34-359 — per-message in-place update
  ``v ← v − γ(λv + err·u)`` with the prediction clamped to
  [min_rating, max_rating] (updateValue :222-237); both sides update
  every superstep from the factors of the previous one.

Spark re-expression: the per-vertex linear algebra runs in numpy inside
``mapInPandas`` over rows of ``(id, [neighbor factors], [ratings])``
built with one join + ``collect_list`` — an Arrow-batched vectorized
path, never a row-at-a-time Python UDF. Message order (which the
reference's SGD result depends on) is pinned by sorting neighbors by
sender id, making results deterministic under any partitioning.
Randomness: factor init uses ``RandomState(seed + id)`` per vertex —
deterministic and partition-independent (the reference seeds one PRNG
per JVM, which is NOT deterministic across partition assignments; we pin
our own goldens, SURVEY.md §7 watch-list).

Scale notes: state is one (id, vec) row per vertex; each half-step is
join → map-side-combinable collect_list → Arrow batch solve. Hub items
with millions of ratings make |M| huge — cap with ``max_neighbors``
(uniform deterministic sample) the way production ALS implementations
block their least squares.

A ``pyspark.ml.recommendation.ALS`` fast path (:func:`als_ml`) is
exposed for capability parity at cluster scale.
"""

from __future__ import annotations

import math
from typing import Iterator, Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_graphs_spark.graph import Graph
from kafka_graphs_spark.library._loop import ChainLoop, sized_cache

_FACTORS_SCHEMA = "id long, vec array<double>"


#: element budget per padded (chunk × n_max × dim) svdpp work array —
#: bounds each task's Python RSS regardless of hub degree. Chunk
#: boundaries never change results (lanes are independent; pinned by
#: tests/test_round14_ops.py), so this is purely a memory knob.
_PAD_BUDGET = 2_000_000


def _factors_schema(dtype: str) -> str:
    """Factor-frame schema for the carried representation.

    ``float32`` halves the bytes of everything that moves per
    half-step — the broadcast/shuffled factor frame AND the flattened
    ``fvecs`` gather column through Arrow (the dominant ALS cost in the
    sf1.0 profile, BASELINE.md round 9). The normal-equation solve
    still runs in float64 inside numpy either way; only the carried
    factors are rounded once per half-step.
    """
    if dtype == "float64":
        return _FACTORS_SCHEMA
    if dtype == "float32":
        return "id long, vec array<float>"
    raise ValueError(f"dtype must be 'float64' or 'float32', got {dtype!r}")


def _init_factors(
    vertices: DataFrame, dim: int, seed: int, dtype: str = "float64"
) -> DataFrame:
    """0.01·uniform(dim) per vertex, deterministic per (seed, id).

    Reference: Als.java InitUsersComputation (0.01f * rand float).
    """
    schema = _factors_schema(dtype)

    def gen(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            vecs = [
                (0.01 * np.random.RandomState((seed + int(i)) & 0x7FFFFFFF).rand(dim))
                .astype(dtype)
                .tolist()
                for i in pdf["id"]
            ]
            yield pd.DataFrame({"id": pdf["id"], "vec": vecs})

    return vertices.select("id").mapInPandas(gen, schema=schema)


def _effective_cap(edges: DataFrame, max_neighbors: Optional[int]) -> Optional[int]:
    """The hub cap to actually apply: None when no gather key (dst) exceeds
    ``max_neighbors``, so the per-iteration row_number sort in _gathered is
    skipped whenever it provably cannot bind. One map-side-combined degree
    agg per als/sgd/svdpp call (not per iteration) buys the skip; results
    are identical either way (the cap only drops rows above the bound)."""
    if not max_neighbors:
        return None
    row = (
        edges.groupBy("dst")
        .agg(F.count(F.lit(1)).alias("_d"))
        .agg(F.max("_d").alias("m"))
        .collect()[0]
    )
    return None if (row["m"] or 0) <= max_neighbors else max_neighbors


#: per-side factor-frame BYTE budget under which the gather join
#: broadcasts the factors — sized from the actual vector width
#: (rows × dim × 8 bytes, the payload that actually ships to every
#: executor), not a row count: at the ``als`` default dim=50 a 1M-row
#: side is ~400 MB, far past any sane broadcast. Above the budget the
#: join stays a shuffle join, the only shape that holds at 100 TB.
BROADCAST_FACTOR_BYTES = 64 * 1024 * 1024


def _fits_broadcast(n_rows: int, dim: int, bytes_per: int = 8) -> bool:
    return n_rows * dim * bytes_per <= BROADCAST_FACTOR_BYTES


def _gathered(
    edges: DataFrame,
    factors: DataFrame,
    max_neighbors: Optional[int],
    broadcast: bool = False,
) -> DataFrame:
    """(id=dst, fvecs array<double>, ratings array<double>) sorted by sender.

    ``fvecs`` is the neighbor factor matrix FLATTENED row-major (k
    neighbors × dim — consumers reshape with the dim they already
    know). The r9 sf1.0 profile attributed the ~12 s steady-state
    half-step cost to Arrow serialization of the nested
    ``array<array<double>>`` gather column (~48M doubles); one flat
    ``array<double>`` per row carries the same doubles through one less
    list layer JVM-side and lands in pandas as ONE contiguous numpy
    array per row instead of k small ones (bit-identical values —
    flatten preserves the sender-sorted order, reshape restores it).

    ``max_neighbors`` caps hub vertices BEFORE the collect_list: a
    row_number window partitioned on the SAME key as the groupBy (the
    exchange is reused — no extra shuffle) keeps a deterministic
    pseudo-uniform sample (ordered by xxhash64 of the pair) of at most
    ``max_neighbors`` ratings per vertex, so both the aggregation buffer
    and the solver row are bounded on hubs. Vertices at or under the cap
    are untouched (the final per-vertex order is always sender-id sort).
    """
    from pyspark.sql.window import Window

    f = factors.select(F.col("id").alias("_s"), "vec")
    if broadcast:
        # mapInPandas output has no size stats, so without the hint this
        # join plans as a 2-shuffle SMJ and only AQE sometimes rescues
        # it; the caller gates the hint on the actual vertex count (an
        # unconditional hint would OOM on billion-vertex factor sides).
        # Results are bit-identical either way (array_sort pins order).
        f = F.broadcast(f)
    j = (
        edges.select(F.col("src").alias("_s"), F.col("dst").alias("id"),
                     F.col("value").cast("double").alias("_r"))
        .join(f, on="_s")
    )
    if max_neighbors:
        w = Window.partitionBy("id").orderBy(F.xxhash64("_s", "id"), "_s")
        j = (
            j.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= max_neighbors)
            .drop("_rn")
        )
    pairs = F.array_sort(
        F.collect_list(F.struct(F.col("_s").alias("s"), F.col("vec").alias("v"), F.col("_r").alias("r")))
    )
    return j.groupBy("id").agg(
        F.flatten(F.transform(pairs, lambda p: p["v"])).alias("fvecs"),
        F.transform(pairs, lambda p: p["r"]).alias("ratings"),
    )


def _make_solve_batch(dim: int, lambda_: float, dtype: str = "float64"):
    """mapInPandas fn over :func:`_gathered` rows solving the ALS
    normal equations ``(MᵀM + λ·N·I)·x = MᵀR`` per vertex.

    Batched: rows are sorted by rating count and padded into ~1k-row
    chunks so A = Σ v·vᵀ and the dim×dim solves run as ONE LAPACK call
    per chunk instead of a per-vertex Python loop (measured
    ~240 µs/solve → the sf1.0 profile showed the per-row loop was ~90%
    of ALS runtime). Zero padding contributes nothing to the sums;
    sorting keeps hub rows in their own chunks so padding waste stays
    small. Deterministic: same chunking and summation every run.
    """

    def solve_batch(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        eye = np.eye(dim)
        for pdf in batches:
            n_rows = len(pdf)
            all_vecs = pdf["fvecs"].to_numpy()
            all_rat = pdf["ratings"].to_numpy()
            vec_out: list = [None] * n_rows
            lens = np.fromiter(
                (len(r) for r in all_rat), dtype="int64", count=n_rows
            )
            order = np.argsort(lens, kind="stable")
            CHUNK = 1024
            for start in range(0, n_rows, CHUNK):
                idx = order[start:start + CHUNK]
                ns = lens[idx]
                b, n_max = len(idx), int(ns.max()) if len(idx) else 0
                P = np.zeros((b, n_max, dim))
                R = np.zeros((b, n_max, 1))
                for j, i in enumerate(idx):
                    k = ns[j]
                    # flat gather: one contiguous reshape per row, no
                    # per-neighbor list conversion
                    P[j, :k, :] = np.asarray(
                        all_vecs[i], dtype="float64"
                    ).reshape(k, dim)
                    R[j, :k, 0] = np.asarray(all_rat[i], dtype="float64")
                Pt = P.transpose(0, 2, 1)
                A = Pt @ P + lambda_ * ns[:, None, None] * eye
                V = Pt @ R  # (b, dim, 1) — explicit matrix RHS so the
                # batched solve is unambiguous under NumPy 1.x AND 2.x
                # (solve(A, V) with V of shape (b, dim) is the 1.x-only
                # stack-of-vectors form; it errors or mis-broadcasts on 2.x)
                X = np.linalg.solve(A, V)[:, :, 0]
                if dtype != "float64":
                    # round ONCE per half-step to the carried width; the
                    # solve above stayed float64
                    X = X.astype(dtype)
                for j, i in enumerate(idx):
                    vec_out[int(i)] = X[j].tolist()
            yield pd.DataFrame({"id": pdf["id"], "vec": vec_out})

    return solve_batch


def als(
    graph: Graph,
    dim: int = 50,
    lambda_: float = 0.01,
    iterations: int = 10,
    rmse_target: Optional[float] = None,
    seed: int = 42,
    max_neighbors: Optional[int] = 1000,
    dtype: str = "float64",
) -> DataFrame:
    """Alternating least squares → (id, vec array<double|float>) for
    users ∪ items.

    ``graph.edges``: (src=user, dst=item, value=rating); id spaces must be
    disjoint (the reference's CfLongId type byte becomes an id-space
    convention). ``iterations`` counts half-steps (one side updated per
    step, items first), matching the reference's superstep alternation.

    ``dtype='float32'`` carries the factor frames as ``array<float>`` —
    half the bytes through every per-half-step Arrow transfer and
    factor shuffle/broadcast, the dominant ALS cost at scale (sf1.0
    profile, BASELINE.md rounds 9–11). The normal-equation solve stays
    float64 inside numpy; factors are rounded once per half-step.
    Reference parity note: the reference's jblas ``FloatMatrix``
    factors ARE float32 (Als.java:36 uses FloatMatrix throughout), so
    float32 is the reference-faithful width; float64 stays the default
    for byte-stability of the existing goldens/loss twins.
    """
    factors_schema = _factors_schema(dtype)
    bytes_per = 4 if dtype == "float32" else 8
    edges, release_edges = sized_cache(
        graph.edges.select("src", "dst", F.col("value").cast("double").alias("value"))
    )
    rev = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), "value"
    )  # Als.java InitItemsComputation cb.addEdge reverse
    users = edges.select(F.col("src").alias("id")).distinct()
    items = edges.select(F.col("dst").alias("id")).distinct()
    n_ratings = edges.count()
    # once per call (not per iteration): gate the gather join's broadcast
    # hint on the actual per-side factor-frame size in BYTES (rows × dim)
    bc_users = _fits_broadcast(users.count(), dim, bytes_per)
    bc_items = _fits_broadcast(items.count(), dim, bytes_per)

    solve_batch = _make_solve_batch(dim, lambda_, dtype)

    # the round body shuffles one dim-vector per RATING through the
    # gather groupBy — size the loop's partitions by that volume, not by
    # the (tiny) factor-frame state the probe measures
    loop = ChainLoop(
        body_rows=n_ratings,
        body_bytes=n_ratings * (dim * bytes_per + 24),
    )
    try:
        user_f, _ = loop.advance(_init_factors(users, dim, seed, dtype))
        item_f = None

        dot = F.aggregate(
            F.zip_with(F.col("uv"), F.col("iv"), lambda a, b: a * b),
            F.lit(0.0), lambda acc, x: acc + x,
        )

        cap_items = _effective_cap(edges, max_neighbors)
        cap_users = _effective_cap(rev, max_neighbors)
        for step in range(iterations):
            if step % 2 == 0:  # update items from user factors (original direction)
                item_f, _ = loop.advance(
                    _gathered(edges, user_f, cap_items, broadcast=bc_users).mapInPandas(
                        solve_batch, schema=factors_schema
                    )
                )
            else:  # update users from item factors (reverse direction)
                user_f, _ = loop.advance(
                    _gathered(rev, item_f, cap_users, broadcast=bc_items).mapInPandas(
                        solve_batch, schema=factors_schema
                    )
                )
            if rmse_target is not None and item_f is not None:
                sq = (
                    edges.join(
                        user_f.select(F.col("id").alias("src"), F.col("vec").alias("uv")),
                        on="src",
                    )
                    .join(
                        item_f.select(F.col("id").alias("dst"), F.col("vec").alias("iv")),
                        on="dst",
                    )
                    .select(((dot - F.col("value")) ** 2).alias("e2"))
                    .agg(F.sum("e2").alias("s"))
                    .collect()[0]["s"]
                )
                if math.sqrt(sq / n_ratings) < rmse_target:
                    break

        result = user_f.unionByName(item_f if item_f is not None else user_f.limit(0))
        out = result.localCheckpoint(eager=True)
    finally:
        loop.release()
        release_edges()
    return out


def sgd(
    graph: Graph,
    dim: int = 50,
    lambda_: float = 0.01,
    gamma: float = 0.005,
    iterations: int = 10,
    rmse_target: Optional[float] = None,
    min_rating: float = 0.0,
    max_rating: float = 5.0,
    seed: int = 42,
    max_neighbors: Optional[int] = 1000,
    dtype: str = "float64",
) -> DataFrame:
    """Stochastic gradient descent MF → (id, vec array<double|float>).

    Both sides update every superstep from the previous superstep's
    factors; per-vertex message order is pinned (sorted by sender id) so
    the sequential in-place update chain (Sgd.java:222-237) is
    deterministic.

    ``dtype='float32'`` carries factors as ``array<float>`` — the same
    per-superstep Arrow/shuffle-byte halving as ``als(dtype=...)``
    (sgd rides the identical flat ``fvecs`` gather column); the update
    arithmetic stays float64, factors round once per superstep. The
    reference's jblas FloatMatrix is float32. Default float64 keeps the
    goldens and the ``sp_sgd_loss`` twin byte-stable.
    """
    factors_schema = _factors_schema(dtype)
    edges, release_edges = sized_cache(
        graph.edges.select("src", "dst", F.col("value").cast("double").alias("value"))
    )
    und, release_und = sized_cache(
        edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "value")
        )
    )
    all_v = und.select(F.col("src").alias("id")).distinct()
    n_ratings = edges.count()

    def update_batch(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = []
            for own, fvecs, ratings in zip(pdf["own"], pdf["fvecs"], pdf["ratings"]):
                v = np.asarray(own, dtype="float64").copy()
                nbrs = np.asarray(fvecs, dtype="float64").reshape(-1, dim)
                for u, r in zip(nbrs, ratings):
                    pred = min(max(float(v @ u), min_rating), max_rating)
                    err = pred - r
                    v -= gamma * (lambda_ * v + err * u)
                if dtype != "float64":
                    v = v.astype(dtype)  # round once per superstep
                out.append(v.tolist())
            yield pd.DataFrame({"id": pdf["id"], "vec": out})

    # und doubles the edges, and each carries one dim-vector through the
    # gather — size the loop by the body volume, not the factor state
    bytes_per = 4 if dtype == "float32" else 8
    loop = ChainLoop(
        body_rows=2 * n_ratings,
        body_bytes=2 * n_ratings * (dim * bytes_per + 24),
    )
    try:
        factors, _ = loop.advance(_init_factors(all_v, dim, seed, dtype))

        dot = F.aggregate(
            F.zip_with(F.col("uv"), F.col("iv"), lambda a, b: a * b),
            F.lit(0.0), lambda acc, x: acc + x,
        )

        cap_und = _effective_cap(und, max_neighbors)
        for _ in range(iterations):
            gathered = _gathered(und, factors, cap_und).join(
                factors.select("id", F.col("vec").alias("own")), on="id"
            )
            factors, _ = loop.advance(
                gathered.mapInPandas(update_batch, schema=factors_schema)
            )
            if rmse_target is not None:
                sq = (
                    edges.join(
                        factors.select(F.col("id").alias("src"), F.col("vec").alias("uv")),
                        on="src",
                    )
                    .join(
                        factors.select(F.col("id").alias("dst"), F.col("vec").alias("iv")),
                        on="dst",
                    )
                    .select(
                        (
                            (
                                F.least(F.greatest(dot, F.lit(min_rating)), F.lit(max_rating))
                                - F.col("value")
                            )
                            ** 2
                        ).alias("e2")
                    )
                    .agg(F.sum("e2").alias("s"))
                    .collect()[0]["s"]
                )
                if math.sqrt(sq / n_ratings) < rmse_target:
                    break

        out = factors.localCheckpoint(eager=True)
    finally:
        loop.release()
        release_edges()
        release_und()
    return out


def predict(factors: DataFrame, pairs: DataFrame) -> DataFrame:
    """Predicted rating per (src, dst) pair = dot(user vec, item vec)."""
    dot = F.aggregate(
        F.zip_with(F.col("uv"), F.col("iv"), lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    return (
        pairs.select("src", "dst")
        .join(factors.select(F.col("id").alias("src"), F.col("vec").alias("uv")), on="src")
        .join(factors.select(F.col("id").alias("dst"), F.col("vec").alias("iv")), on="dst")
        .select("src", "dst", dot.alias("prediction"))
    )


def als_ml(
    graph: Graph,
    dim: int = 50,
    lambda_: float = 0.01,
    iterations: int = 10,
    seed: int = 42,
):
    """Cluster-scale fast path: pyspark.ml ALS on the same ratings edges.

    Returns the fitted ALSModel (blocked, JVM-native normal equations —
    the right tool at 100 TB; the Pregel-parity :func:`als` exists for
    reference-semantics tests).
    """
    from pyspark.ml.recommendation import ALS as MLALS

    ratings = graph.edges.select(
        F.col("src").cast("int").alias("user"),
        F.col("dst").cast("int").alias("item"),
        F.col("value").cast("float").alias("rating"),
    )
    return MLALS(
        rank=dim, regParam=lambda_, maxIter=iterations, seed=seed,
        userCol="user", itemCol="item", ratingCol="rating",
    ).fit(ratings)


def svdpp(
    graph: Graph,
    dim: int = 10,
    bias_lambda: float = 0.005,
    bias_gamma: float = 0.01,
    factor_lambda: float = 0.005,
    factor_gamma: float = 0.01,
    iterations: int = 10,
    rmse_target: Optional[float] = None,
    min_rating: float = 0.0,
    max_rating: float = 5.0,
    seed: int = 42,
    dtype: str = "float64",
) -> Tuple[DataFrame, DataFrame, float]:
    """Koren SVD++ → (users(id, b, p), items(id, b, q, y), mean_rating).

    Reference: io/kgraph/library/cf/Svdpp.java:35-630 — prediction
    ``clamp(mean + bu + bi + q·(p + Σy/√N))`` (:156-170); user supersteps
    (odd) run the sequential per-message baseline/factor updates
    (:410-500) and emit item steps; item supersteps (even) apply them via
    ``v += step − γλv`` (:204-228). ``mean`` reproduces the reference's
    ``Σr / (2·|E|)`` (:405-406). One ``iterations`` round = one user +
    one item superstep; message order is pinned by sorting on the
    counterpart id. RMSE (aggregated on user supersteps) halts early when
    below ``rmse_target``.

    ``dtype='float32'`` carries every per-edge vector that moves through
    Arrow — the gathered (q, w) neighbor structs AND the (fstep, wstep)
    message structs, four dim-vectors per rating per round — plus the
    factor frames as ``array<float>``; all arithmetic stays float64
    inside numpy and values are rounded once per superstep on emit, the
    same contract as ``als(dtype=...)``/``sgd(dtype=...)``. The
    reference's jblas FloatMatrix IS float32 (Svdpp.java:36), so this is
    the reference-faithful width; float64 stays the default so goldens
    are byte-stable.
    """
    if dtype not in ("float64", "float32"):
        raise ValueError(f"dtype must be 'float64' or 'float32', got {dtype!r}")
    arr = "array<float>" if dtype == "float32" else "array<double>"
    edges, release_edges = sized_cache(
        graph.edges.select("src", "dst", F.col("value").cast("double").alias("value"))
    )
    users = edges.select(F.col("src").alias("id")).distinct()
    items = edges.select(F.col("dst").alias("id")).distinct()
    n_ratings = edges.count()
    mean = edges.agg(F.sum("value")).collect()[0][0] / (2.0 * n_ratings)

    def init_side(vertices: DataFrame, with_weights: bool) -> DataFrame:
        def gen(batches: Iterator) -> Iterator:
            import numpy as np
            import pandas as pd

            for pdf in batches:
                rows = []
                for i in pdf["id"]:
                    rs = np.random.RandomState((seed + int(i)) & 0x7FFFFFFF)
                    p = (0.01 * rs.rand(dim)).tolist()
                    b = float(rs.rand())
                    if with_weights:
                        y = (0.01 * rs.rand(dim)).tolist()
                        rows.append((int(i), b, p, y))
                    else:
                        rows.append((int(i), b, p))
                cols = ["id", "b", "vec"] + (["w"] if with_weights else [])
                yield pd.DataFrame(rows, columns=cols)

        schema = f"id long, b double, vec {arr}" + (
            f", w {arr}" if with_weights else ""
        )
        return vertices.mapInPandas(gen, schema=schema)

    # each rating carries FOUR dim-vectors per round through the gather
    # and message shuffles — size the loop by that body volume, not the
    # (tiny) factor-frame state (r12: state-sized tuning ran the whole
    # ~1 GB sf1.0 gather through ONE ShuffleMapTask)
    bytes_per = 4 if dtype == "float32" else 8
    loop = ChainLoop(
        body_rows=n_ratings,
        body_bytes=2 * n_ratings * (dim * bytes_per + 32),
    )
    try:
        user_f, _ = loop.advance(init_side(users, False))
        item_f, _ = loop.advance(init_side(items, True))

        # r14 rewrite of both supersteps (guide §4.2 — vectorize inside the
        # Python boundary, shrink what crosses it). Three changes, all
        # BIT-IDENTICAL to the r13 per-row code (oracle + goldens pinned):
        #   1. the gather sorts/flattens in SQL (array_sort = the Python
        #      ``sorted(key=i)``, flat fvecs like ALS) and pre-aggregates
        #      the y-vector sum as a SORTED SQL fold — the per-rating w
        #      vector no longer crosses Arrow into the user step at all
        #      (it only ever entered Σw), cutting the gather's Arrow
        #      payload nearly in half (VERDICT r13 #3);
        #   2. wstep — ONE vector per user, identical across its messages
        #      — crosses Arrow once per user and is re-attached JVM-side
        #      before the item shuffle, halving the user step's Arrow
        #      output;
        #   3. both steps run the sequential per-message recurrences
        #      VECTORIZED ACROSS VERTICES (padded length-sorted chunks,
        #      masked updates — the ALS batching pattern): each vertex's
        #      own op sequence is unchanged, lanes are independent, and
        #      the per-message dot uses np.matmul((b,1,dim),(b,dim,1)),
        #      measured bitwise-equal to the per-row BLAS ddot the r13
        #      code called (scripts/svdpp_break.py session); rmse uses
        #      cumsum (sequential-order guarantee) with exact +0.0 pads.
        vec_sum = F.aggregate(
            F.col("pairs"),
            F.array_repeat(F.lit(0.0), dim),
            lambda acc, p: F.zip_with(acc, p["w"], lambda a, b: a + b),
        )
        msg_schema = (
            f"id long, b double, vec {arr}, rmse double, wstep {arr}, "
            f"msg_items array<long>, msg_fflat {arr}, msg_bsteps array<double>"
        )
        pad_budget = _PAD_BUDGET

        def _chunks(order, lens):
            """Greedy length-sorted chunks with bounded padded size."""
            start = 0
            while start < len(order):
                end = start + 1
                while (
                    end < len(order)
                    and (end + 1 - start) * max(1, int(lens[order[end]])) * dim
                    <= pad_budget
                ):
                    end += 1
                yield order[start:end]
                start = end

        def user_step(batches: Iterator) -> Iterator:
            import numpy as np
            import pandas as pd

            c_pf = -factor_lambda * factor_gamma
            for pdf in batches:
                n_rows = len(pdf)
                a_items = pdf["items"].to_numpy()
                a_qflat = pdf["qflat"].to_numpy()
                a_bis = pdf["bis"].to_numpy()
                a_rs = pdf["rs"].to_numpy()
                a_sw = pdf["sum_w"].to_numpy()
                a_own = pdf["vec"].to_numpy()
                a_bu = pdf["b"].to_numpy()
                lens = np.fromiter((len(r) for r in a_rs), dtype="int64", count=n_rows)
                order = np.argsort(lens, kind="stable")
                o_b = np.empty(n_rows, dtype="float64")
                o_vec: list = [None] * n_rows
                o_rmse = np.empty(n_rows, dtype="float64")
                o_wstep: list = [None] * n_rows
                o_fflat: list = [None] * n_rows
                o_bsteps: list = [None] * n_rows
                for idx in _chunks(order, lens):
                    ns = lens[idx]
                    b, n_max = len(idx), int(ns.max()) if len(idx) else 0
                    Q = np.zeros((b, n_max, dim))
                    BI = np.zeros((b, n_max))
                    R = np.zeros((b, n_max))
                    P = np.empty((b, dim))
                    SW = np.empty((b, dim))
                    BU = np.empty(b)
                    for j, i in enumerate(idx):
                        k = ns[j]
                        Q[j, :k, :] = np.asarray(a_qflat[i], dtype="float64").reshape(k, dim)
                        BI[j, :k] = np.asarray(a_bis[i], dtype="float64")
                        R[j, :k] = np.asarray(a_rs[i], dtype="float64")
                        P[j] = np.asarray(a_own[i], dtype="float64")
                        SW[j] = np.asarray(a_sw[i], dtype="float64")
                        BU[j] = float(a_bu[i])
                    IMP = SW / np.sqrt(ns)[:, None]
                    W = np.zeros((b, dim))
                    # pass 1 — the sequential per-message recurrence, lanes
                    # independent across users, masked past each user's n.
                    # NOTE: standard Koren'08 sign (err = observed − predicted).
                    # The reference's UserComputation.updateValue (Svdpp.java
                    # :388-393, :184-190) ADDS the (predicted − observed)
                    # gradient — an ascent step that diverges; its own Sgd.java
                    # :222-237 subtracts. We use descent and pin our goldens.
                    for k in range(n_max):
                        act = ns > k
                        qk = Q[:, k, :]
                        d = np.matmul(qk[:, None, :], (P + IMP)[:, :, None])[:, 0, 0]
                        pred = np.minimum(
                            np.maximum(mean + BU + BI[:, k] + d, min_rating), max_rating
                        )
                        err = R[:, k] - pred
                        BU = np.where(act, BU + bias_gamma * (err - bias_lambda * BU), BU)
                        P = np.where(
                            act[:, None],
                            P + (c_pf * P + (factor_gamma * err)[:, None] * qk),
                            P,
                        )
                        W = np.where(act[:, None], W + err[:, None] * qk, W)
                    W *= (factor_gamma / np.sqrt(ns))[:, None]
                    # pass 2 — messages from the settled (bu, p)
                    V = P + IMP
                    FS = np.zeros((b, n_max, dim))
                    ERR = np.zeros((b, n_max))
                    for k in range(n_max):
                        act = ns > k
                        d = np.matmul(Q[:, k, :][:, None, :], V[:, :, None])[:, 0, 0]
                        pred = np.minimum(
                            np.maximum(mean + BU + BI[:, k] + d, min_rating), max_rating
                        )
                        err = np.where(act, R[:, k] - pred, 0.0)
                        ERR[:, k] = err
                        FS[:, k, :] = V * (factor_gamma * err)[:, None]
                    rmse = (
                        np.cumsum(ERR * ERR, axis=1)[:, -1] if n_max else np.zeros(b)
                    )
                    if dtype != "float64":
                        P_out, W_out, FS_out = (
                            P.astype(dtype), W.astype(dtype), FS.astype(dtype)
                        )
                    else:
                        P_out, W_out, FS_out = P, W, FS
                    BSTEP = bias_gamma * ERR
                    for j, i in enumerate(idx):
                        k = ns[j]
                        o_b[i] = BU[j]
                        o_vec[i] = P_out[j]
                        o_rmse[i] = rmse[j]
                        o_wstep[i] = W_out[j]
                        o_fflat[i] = FS_out[j, :k, :].ravel()
                        o_bsteps[i] = BSTEP[j, :k]
                    del Q, BI, R, FS, ERR
                yield pd.DataFrame(
                    {
                        "id": pdf["id"], "b": o_b, "vec": o_vec, "rmse": o_rmse,
                        "wstep": o_wstep, "msg_items": a_items,
                        "msg_fflat": o_fflat, "msg_bsteps": o_bsteps,
                    }
                )

        def item_step(batches: Iterator) -> Iterator:
            import numpy as np
            import pandas as pd

            c_b = bias_gamma * bias_lambda
            c_f = factor_gamma * factor_lambda
            for pdf in batches:
                n_rows = len(pdf)
                a_ff = pdf["fflat"].to_numpy()
                a_wf = pdf["wflat"].to_numpy()
                a_bs = pdf["bsteps"].to_numpy()
                a_q = pdf["vec"].to_numpy()
                a_y = pdf["w"].to_numpy()
                a_bi = pdf["b"].to_numpy()
                lens = np.fromiter((len(s) for s in a_bs), dtype="int64", count=n_rows)
                order = np.argsort(lens, kind="stable")
                o_b = np.empty(n_rows, dtype="float64")
                o_q: list = [None] * n_rows
                o_y: list = [None] * n_rows
                for idx in _chunks(order, lens):
                    ns = lens[idx]
                    b, n_max = len(idx), int(ns.max()) if len(idx) else 0
                    FS = np.zeros((b, n_max, dim))
                    WS = np.zeros((b, n_max, dim))
                    BS = np.zeros((b, n_max))
                    Q = np.empty((b, dim))
                    Y = np.empty((b, dim))
                    BI = np.empty(b)
                    for j, i in enumerate(idx):
                        k = ns[j]
                        if k:
                            FS[j, :k, :] = np.asarray(a_ff[i], dtype="float64").reshape(k, dim)
                            WS[j, :k, :] = np.asarray(a_wf[i], dtype="float64").reshape(k, dim)
                            BS[j, :k] = np.asarray(a_bs[i], dtype="float64")
                        Q[j] = np.asarray(a_q[i], dtype="float64")
                        Y[j] = np.asarray(a_y[i], dtype="float64")
                        BI[j] = float(a_bi[i])
                    for k in range(n_max):
                        act = ns > k
                        BI = np.where(act, BI + BS[:, k] - c_b * BI, BI)
                        Q = np.where(act[:, None], Q + (FS[:, k, :] - c_f * Q), Q)
                        Y = np.where(act[:, None], Y + (WS[:, k, :] - c_f * Y), Y)
                    if dtype != "float64":
                        Q_out, Y_out = Q.astype(dtype), Y.astype(dtype)
                    else:
                        Q_out, Y_out = Q, Y
                    for j, i in enumerate(idx):
                        o_b[i] = BI[j]
                        o_q[i] = Q_out[j]
                        o_y[i] = Y_out[j]
                    del FS, WS, BS
                yield pd.DataFrame({"id": pdf["id"], "b": o_b, "vec": o_q, "w": o_y})

        empty_arr = F.array().cast(arr)
        for _ in range(iterations):
            gathered = (
                edges.select(F.col("src").alias("id"), F.col("dst").alias("_i"),
                             F.col("value").alias("_r"))
                .join(
                    item_f.select(F.col("id").alias("_i"), F.col("b").alias("_bi"),
                                  F.col("vec").alias("_q"), F.col("w").alias("_w")),
                    on="_i",
                )
                .groupBy("id")
                # one sorted struct list (TreeMap order, Svdpp.java:428-431),
                # projected to flat columns so the Arrow transfer carries one
                # contiguous array per user — and w only as its sorted SUM
                .agg(F.array_sort(F.collect_list(F.struct(
                    F.col("_i").alias("i"), F.col("_q").alias("q"), F.col("_w").alias("w"),
                    F.col("_bi").alias("bi"), F.col("_r").alias("r")))).alias("pairs"))
                .select(
                    "id",
                    F.transform("pairs", lambda p: p["i"]).alias("items"),
                    F.flatten(F.transform("pairs", lambda p: p["q"])).alias("qflat"),
                    F.transform("pairs", lambda p: p["bi"]).alias("bis"),
                    F.transform("pairs", lambda p: p["r"]).alias("rs"),
                    vec_sum.alias("sum_w"),
                )
                .join(user_f.select("id", "b", "vec"), on="id")
            )
            ures, _ = loop.advance(gathered.mapInPandas(user_step, schema=msg_schema))
            user_f = ures.select("id", "b", "vec")

            if rmse_target is not None:
                sq = ures.agg(F.sum("rmse")).collect()[0][0] or 0.0
                if math.sqrt(sq / n_ratings) < rmse_target:
                    break

            steps = (
                ures.select(
                    F.col("id").alias("u"), "wstep", "msg_fflat", "msg_bsteps",
                    F.posexplode("msg_items").alias("pos", "item"),
                )
                .select(F.col("item").alias("id"), F.struct(
                    F.col("u").alias("u"),
                    F.slice(
                        "msg_fflat", F.col("pos") * dim + F.lit(1), F.lit(dim)
                    ).alias("fstep"),
                    F.col("wstep").alias("wstep"),
                    F.element_at("msg_bsteps", F.col("pos") + 1).alias("bstep")).alias("s"))
                .groupBy("id")
                # array_sort orders by the struct's leading field u (unique
                # per item) — the Python ``sorted(key=u)`` moved JVM-side
                .agg(F.array_sort(F.collect_list("s")).alias("pairs"))
                .select(
                    "id",
                    F.flatten(F.transform("pairs", lambda p: p["fstep"])).alias("fflat"),
                    F.flatten(F.transform("pairs", lambda p: p["wstep"])).alias("wflat"),
                    F.transform("pairs", lambda p: p["bstep"]).alias("bsteps"),
                )
            )
            item_f, _ = loop.advance(
                item_f.join(steps, on="id", how="left")
                .withColumn("fflat", F.coalesce(F.col("fflat"), empty_arr))
                .withColumn("wflat", F.coalesce(F.col("wflat"), empty_arr))
                .withColumn(
                    "bsteps", F.coalesce(F.col("bsteps"), F.array().cast("array<double>"))
                )
                .mapInPandas(item_step, schema=f"id long, b double, vec {arr}, w {arr}")
            )

        users_out = user_f.select("id", "b", F.col("vec").alias("p")).localCheckpoint(eager=True)
        items_out = item_f.select("id", "b", F.col("vec").alias("q"), F.col("w").alias("y")
                                  ).localCheckpoint(eager=True)
    finally:
        loop.release()
        release_edges()
    return users_out, items_out, mean


def svdpp_predict(
    users: DataFrame,
    items: DataFrame,
    pairs: DataFrame,
    ratings: DataFrame,
    mean: float,
    min_rating: float = 0.0,
    max_rating: float = 5.0,
) -> DataFrame:
    """clamp(mean + bu + bi + q·(p + Σy_j/√N)) per (src, dst) pair.

    Reference predictor: rest-app tools SvdppPredictor.java:77-131.
    ``ratings`` supplies each user's rated-item set for the implicit term.
    """
    imp = (
        ratings.select(F.col("src").alias("uid"), F.col("dst").alias("_i"))
        .join(items.select(F.col("id").alias("_i"), F.col("y")), on="_i")
        .groupBy("uid")
        .agg(
            F.aggregate(
                F.collect_list("y"),
                F.array_repeat(F.lit(0.0), F.size(F.first("y"))),
                lambda acc, y: F.zip_with(acc, y, lambda a, b: a + b),
            ).alias("sumy"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    dot = F.aggregate(
        F.zip_with(
            F.col("q"),
            F.zip_with(F.col("p"), F.col("impvec"), lambda a, b: a + b),
            lambda a, b: a * b,
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        pairs.select("src", "dst")
        .join(users.select(F.col("id").alias("src"), F.col("b").alias("bu"), "p"), on="src")
        .join(items.select(F.col("id").alias("dst"), F.col("b").alias("bi"), "q"), on="dst")
        .join(imp.withColumnRenamed("uid", "src"), on="src")
        .withColumn("impvec", F.transform(F.col("sumy"), lambda x: x / F.sqrt(F.col("n"))))
        .select(
            "src",
            "dst",
            F.least(
                F.greatest(F.lit(mean) + F.col("bu") + F.col("bi") + dot, F.lit(min_rating)),
                F.lit(max_rating),
            ).alias("prediction"),
        )
    )
