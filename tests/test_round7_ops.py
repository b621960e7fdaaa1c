"""Round-7 additions: BPE bounded driver handoff, stateful driver twins,
IVFADC skew-safe prune."""

import time

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def sf_dir_small():
    return "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


# ---- BPE hybrid handoff ---------------------------------------------------

def test_bpe_local_tier_matches_distributed_tier(spark):
    from kafka_graphs_spark.pipeline.bpe import train_bpe

    docs = _docs(spark, [
        (0, "a", "low low low low low lowest lowest newer newer wider"),
        (1, "b", "new new newest widest lower lowly lowish"),
    ])
    m_local, s_local = train_bpe(docs, n_merges=8)  # under the guard
    m_dist, s_dist = train_bpe(docs, n_merges=8, local_threshold=0)
    assert m_local == m_dist
    got_l = {r["token"]: (r["freq"], r["symbols"], r["n_symbols"])
             for r in s_local.collect()}
    got_d = {r["token"]: (r["freq"], r["symbols"], r["n_symbols"])
             for r in s_dist.collect()}
    assert got_l == got_d
    # schemas must agree too (the segmented table is a join target)
    assert dict(s_local.dtypes) == dict(s_dist.dtypes)


def test_bpe_large_vocab_trains_in_seconds(spark):
    # the VERDICT r6 #5 acceptance: >= 1,000 merges in seconds, not one
    # driver-sequenced Spark job per merge
    import random

    from kafka_graphs_spark.pipeline.bpe import train_bpe

    rng = random.Random(13)
    words = ["".join(rng.choice("abcdefgh") for _ in range(rng.randint(4, 10)))
             for _ in range(3000)]
    # every type twice so all its pairs clear min_pair_count=2
    text = " ".join(words + words)
    docs = _docs(spark, [(i, "s", text[i * 2000:(i + 1) * 2000 + 20])
                         for i in range(len(text) // 2000 + 1)])
    t0 = time.time()
    merges, seg = train_bpe(docs, n_merges=1200, min_pair_count=2)
    elapsed = time.time() - t0
    assert len(merges) >= 1000, f"only {len(merges)} merges learned"
    assert elapsed < 90, f"{elapsed:.1f}s — handoff not engaging?"
    # reconstruction invariant holds for every type
    bad = seg.filter(
        F.concat_ws("", F.col("symbols")) != F.col("token")
    ).count()
    assert bad == 0


def test_bpe_segmented_consistent_with_apply(spark):
    from kafka_graphs_spark.pipeline.bpe import apply_bpe, train_bpe

    docs = _docs(spark, [(0, "s", "banana bandana ban anna nab banana ban")])
    merges, seg = train_bpe(docs, n_merges=6)
    applied = {r["token"]: r["symbols"]
               for r in apply_bpe(seg.select("token"), merges).collect()}
    trained = {r["token"]: r["symbols"] for r in seg.collect()}
    assert applied == trained


# ---- IVFADC skew-safe prune ----------------------------------------------

def test_ivfpq_prune_guard_is_superset_under_forced_prune(spark, sf_dir_small):
    # force the prune path (tiny corpus, so the per-group safety valve
    # must keep EVERY candidate — the pruned result must equal unpruned)
    import kafka_graphs_spark.pipeline.similarity as sim
    from kafka_graphs_spark import datasets

    emb = datasets.load(spark, sf_dir_small, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    base = sim.ivfpq_topk(emb, q, k=5)
    rows_base = sorted(tuple(r) for r in base.collect())
    # the guard math must yield a top-N superset for any group that the
    # filter actually prunes: g*p_q - g/ACC >= N at g = g_safe, and the
    # balanced estimate is always on the safe side of its own threshold
    N, ACC = 50, 10_000
    import math
    prev = None
    for g_est in (200_000, 400_000, 1_000_000, 10_000_000):
        p_q = min(1.0, (N + g_est / ACC + 1.0) / max(1, g_est - 1))
        assert p_q > 1.0 / ACC
        g_safe = math.ceil(N / (p_q - 1.0 / ACC))
        # any group >= g_safe satisfies g*p_q - g/ACC >= N (superset bound)
        assert g_safe * p_q - g_safe / ACC >= N - 1e-6
        if prev is not None:
            assert g_safe <= g_est  # the estimate itself is always safe
        prev = g_safe
    assert rows_base  # and the unpruned path returned results


# ---- stateful driver twins ------------------------------------------------

def test_stateful_degrees_entry_query_matches_batch(spark, sf_dir_small):
    import __spark_entry__ as entry

    qs = entry.queries()
    out = {r["id"]: r["degree"]
           for r in qs["ec_stateful_degrees"](spark, sf_dir_small).collect()}
    from kafka_graphs_spark import datasets
    from kafka_graphs_spark.streaming import EdgeStream

    batch = {r["id"]: r["degree"]
             for r in EdgeStream(
                 datasets.event_chain_edges(spark, sf_dir_small)
             ).degrees().collect()}
    assert out == batch


# ---- incremental windowed analytics ---------------------------------------

def _run_incr(spark, op, src, ckpt, schema):
    rows = []

    def sink(batch_df, _bid):
        rows.extend(batch_df.collect())

    stream = spark.readStream.schema(schema).parquet(src)
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


EDGE_T_SCHEMA = "src long, dst long, event_time timestamp"


def _write_edges_t(spark, rows, path):
    df = spark.createDataFrame(
        rows, "src long, dst long, event_time string"
    ).withColumn("event_time", F.to_timestamp("event_time"))
    df.coalesce(1).write.mode("append").parquet(path)


class TestIncrementalWindowedWcc:
    def test_late_edge_updates_only_its_window_in_place(self, spark, tmp_path):
        from kafka_graphs_spark.streaming import wcc_windowed_incremental

        src, ckpt = str(tmp_path / "e"), str(tmp_path / "ck")
        # window 0h: two separate components; window 1h: one edge
        _write_edges_t(spark, [
            (1, 2, "2026-01-01 00:05:00"),
            (3, 4, "2026-01-01 00:10:00"),
            (7, 8, "2026-01-01 01:10:00"),
        ], src)
        op = lambda s: wcc_windowed_incremental(s, "1 hour")
        out1 = _run_incr(spark, op, src, ckpt, EDGE_T_SCHEMA)
        got1 = {(r["window_start"].hour, r["id"]): r["component"] for r in out1}
        assert got1[(0, 1)] == got1[(0, 2)] == 1
        assert got1[(0, 3)] == got1[(0, 4)] == 3
        assert got1[(1, 7)] == 7

        # LATE edge bridging window 0's components: same checkpoint, the
        # restored DSU merges in place — and ONLY window 0 re-emits
        _write_edges_t(spark, [(2, 3, "2026-01-01 00:20:00")], src)
        out2 = _run_incr(spark, op, src, ckpt, EDGE_T_SCHEMA)
        hours = {r["window_start"].hour for r in out2}
        assert hours == {0}
        got2 = {r["id"]: r["component"] for r in out2}
        assert got2 == {1: 1, 2: 1, 3: 1, 4: 1}

    def test_matches_batch_windowed_wcc(self, spark, tmp_path):
        from kafka_graphs_spark.streaming import wcc_windowed, wcc_windowed_incremental

        rows = [
            (1, 2, "2026-01-01 00:05:00"),
            (2, 3, "2026-01-01 00:10:00"),
            (5, 6, "2026-01-01 00:20:00"),
            (1, 9, "2026-01-01 01:05:00"),
            (9, 5, "2026-01-01 01:30:00"),
        ]
        src = str(tmp_path / "eb")
        _write_edges_t(spark, rows, src)
        out = _run_incr(
            spark,
            lambda s: wcc_windowed_incremental(s, "1 hour"),
            src, str(tmp_path / "ckb"), EDGE_T_SCHEMA,
        )
        # final emission per (window, id) — monotone merge makes last = final
        got = {}
        for r in out:
            got[(r["window_start"], r["id"])] = r["component"]
        batch = {
            (r["window_start"], r["id"]): r["component"]
            for r in wcc_windowed(
                spark.read.parquet(src), "1 hour", max_iterations=50
            ).collect()
        }
        assert got == batch


class TestIncrementalWindowedTriangles:
    def test_running_totals_match_batch_prefixes(self, spark, tmp_path):
        from kafka_graphs_spark.streaming import (
            triangles_windowed,
            triangles_windowed_incremental,
        )

        src, ckpt = str(tmp_path / "t"), str(tmp_path / "tck")
        # batch 1: a triangle in window 0, a wedge in window 1
        _write_edges_t(spark, [
            (1, 2, "2026-01-01 00:01:00"),
            (2, 3, "2026-01-01 00:02:00"),
            (3, 1, "2026-01-01 00:03:00"),
            (1, 2, "2026-01-01 01:01:00"),
            (2, 3, "2026-01-01 01:02:00"),
        ], src)
        op = lambda s: triangles_windowed_incremental(s, "1 hour")
        out1 = _run_incr(spark, op, src, ckpt, EDGE_T_SCHEMA)
        got1 = {r["window_start"].hour: r["n_triangles"] for r in out1}
        assert got1 == {0: 1, 1: 0}

        # batch 2 (same checkpoint): closing edge arrives LATE for window 1;
        # a duplicate edge in window 0 must not recount
        _write_edges_t(spark, [
            (3, 1, "2026-01-01 01:03:00"),
            (1, 2, "2026-01-01 00:30:00"),
        ], src)
        out2 = _run_incr(spark, op, src, ckpt, EDGE_T_SCHEMA)
        got2 = {r["window_start"].hour: r["n_triangles"] for r in out2}
        assert got2 == {0: 1, 1: 1}

        # final totals equal the batch twin's global rows over ALL edges
        batch = {
            r["window_start"].hour: r["count"]
            for r in triangles_windowed(
                spark.read.parquet(src), "1 hour"
            ).filter(F.col("id") == -1).collect()
        }
        assert batch == {0: 1, 1: 1}


# ---- rich_club / conductance ----------------------------------------------


def _graph(spark, edges):
    from kafka_graphs_spark import Graph

    e = spark.createDataFrame(edges, "src long, dst long, value double")
    return Graph.from_edges(e, F.lit(0.0))


class TestRichClub:
    def test_k4_plus_pendant(self, spark):
        # K4 on {1..4} + pendant 5-1: degrees 1->4, {2,3,4}->3, 5->1
        from kafka_graphs_spark.library import rich_club

        edges = [(a, b, 1.0) for a in range(1, 5) for b in range(1, 5) if a < b]
        edges.append((5, 1, 1.0))
        rows = {r["k"]: r for r in rich_club(_graph(spark, edges)).collect()}
        # k=1: club {1,2,3,4} (all of K4) -> phi = 1.0; k=3/k=4 clubs have
        # <2 members and are omitted
        assert set(rows) == {1}
        r = rows[1]
        assert (r["n_nodes"], r["n_edges"], r["phi"]) == (4, 6, 1.0)

    def test_direction_and_multiplicity_ignored(self, spark):
        from kafka_graphs_spark.library import rich_club

        # same K4+pendant but with duplicated and reversed rows + a loop
        edges = [(a, b, 1.0) for a in range(1, 5) for b in range(1, 5) if a != b]
        edges += [(5, 1, 1.0), (1, 5, 2.0), (3, 3, 9.0)]
        rows = {r["k"]: tuple(r) for r in rich_club(_graph(spark, edges)).collect()}
        assert rows == {1: (1, 4, 6, 1.0)}

    def test_star_has_no_club(self, spark):
        from kafka_graphs_spark.library import rich_club

        star = [(0, i, 1.0) for i in range(1, 6)]
        rows = rich_club(_graph(spark, star)).collect()
        # distinct degrees {1, 5}: k=1 club = {0} (one node, omitted);
        # k=5 club empty -> no rows at all
        assert rows == []


class TestConductance:
    def test_k4_pendant_parity_partition(self, spark):
        from kafka_graphs_spark.library import conductance

        edges = [(a, b, 1.0) for a in range(1, 5) for b in range(1, 5) if a < b]
        edges.append((5, 1, 1.0))
        g = _graph(spark, edges)
        lab = g.vertices.select("id", (F.col("id") % 2).alias("value"))
        rows = {r["label"]: tuple(r) for r in conductance(g, lab).collect()}
        # 7 undirected edges, 2m=14; odd={1,3,5} vol 8, even={2,4} vol 6;
        # cut edges (1,2),(1,4),(2,3),(3,4) -> 4; phi = 4/min-side-6 both
        assert rows == {0: (0, 4, 6, 0.666667), 1: (1, 4, 8, 0.666667)}

    def test_disconnected_partition_scores_zero(self, spark):
        from kafka_graphs_spark.library import conductance

        # two disjoint triangles, labeled by component -> cut 0, phi 0
        edges = [(0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0),
                 (10, 11, 1.0), (11, 12, 1.0), (12, 10, 1.0)]
        g = _graph(spark, edges)
        lab = g.vertices.select("id", (F.col("id") >= 10).cast("long").alias("value"))
        rows = {r["label"]: tuple(r) for r in conductance(g, lab).collect()}
        assert rows == {0: (0, 0, 6, 0.0), 1: (1, 0, 6, 0.0)}

    def test_single_community_min_side_zero(self, spark):
        from kafka_graphs_spark.library import conductance

        edges = [(0, 1, 1.0), (1, 2, 1.0)]
        g = _graph(spark, edges)
        lab = g.vertices.select("id", F.lit(7).alias("value"))
        rows = conductance(g, lab).collect()
        assert len(rows) == 1
        r = rows[0]
        # whole graph in one community: vol = 2m, min side 0 -> 0.0
        assert (r["label"], r["cut_edges"], r["volume"], r["conductance"]) == (7, 0, 4, 0.0)


# ---- temporal earliest arrival --------------------------------------------


class TestTemporalEarliestArrival:
    MAX = 9223372036854775807

    def _run(self, spark, edges, src, **kw):
        from kafka_graphs_spark import Graph
        from kafka_graphs_spark.library import temporal_earliest_arrival

        e = spark.createDataFrame(edges, "src long, dst long, value long")
        g = Graph.from_edges(e, F.lit(0))
        return {
            r["id"]: r["value"]
            for r in temporal_earliest_arrival(g, src, **kw).collect()
        }

    def test_departed_connection_blocks(self, spark):
        # 1 -t10-> 2 -t5-> 3: the 2->3 edge departed (t=5) before arrival
        # at 2 (t=10) -> 3 unreachable despite static connectivity
        out = self._run(spark, [(1, 2, 10), (2, 3, 5), (2, 4, 20), (4, 5, 15), (4, 5, 25)], 1)
        assert out == {1: 0, 2: 10, 3: self.MAX, 4: 20, 5: 25}

    def test_label_correcting_rerelaxation(self, spark):
        # direct 1->2 at t=100, but detour 1->6->2 arrives at t=4; the
        # improved arrival must re-open 2's t=5 edge (label correction)
        out = self._run(spark, [(1, 2, 100), (1, 6, 3), (6, 2, 4), (2, 7, 50), (2, 8, 5)], 1)
        assert out == {1: 0, 2: 4, 6: 3, 7: 50, 8: 5}

    def test_start_time_gates_first_hop(self, spark):
        # start_time later than the only outgoing edge -> nothing reached
        out = self._run(spark, [(1, 2, 10)], 1, start_time=11)
        assert out == {1: 11, 2: self.MAX}


class TestTemporalLatestDeparture:
    MIN = -9223372036854775808

    def _run(self, spark, edges, dst, deadline):
        from kafka_graphs_spark import Graph
        from kafka_graphs_spark.library import temporal_latest_departure

        e = spark.createDataFrame(edges, "src long, dst long, value long")
        g = Graph.from_edges(e, F.lit(0))
        return {
            r["id"]: r["value"]
            for r in temporal_latest_departure(g, dst, deadline).collect()
        }

    def test_deadline_and_max_choice(self, spark):
        # two 4->5 connections: the later (t=25) wins; 3->5 at t=40 is
        # past the deadline 30 -> 3 has no valid departure
        out = self._run(
            spark, [(1, 2, 10), (2, 4, 20), (4, 5, 15), (4, 5, 25), (3, 5, 40)], 5, 30
        )
        assert out == {1: 10, 2: 20, 3: self.MIN, 4: 25, 5: 30}

    def test_label_correcting_rerelaxation(self, spark):
        # dep(4) improves 15 -> 18 via the 4->6->5 detour, re-opening the
        # t=17 in-edge from 2
        out = self._run(spark, [(4, 5, 15), (4, 6, 18), (6, 5, 20), (2, 4, 17)], 5, 100)
        assert out == {5: 100, 6: 20, 4: 18, 2: 17}


# ---- funnel / retention ----------------------------------------------------


class TestFunnel:
    def _events(self, spark, rows):
        return spark.createDataFrame(
            rows, "event_id long, user_id long, event_type string, ts long"
        )

    def test_strict_ordering(self, spark):
        from kafka_graphs_spark.pipeline.events import funnel

        ev = self._events(spark, [
            # u1: full ordered funnel
            (1, 1, "signup", 10), (2, 1, "view", 20), (3, 1, "purchase", 30),
            # u2: purchase BEFORE view -> drops at step 3
            (4, 2, "signup", 10), (5, 2, "purchase", 15), (6, 2, "view", 20),
            # u3: never signed up -> counted nowhere despite view+purchase
            (7, 3, "view", 5), (8, 3, "purchase", 6),
            # u4: view at the exact signup instant counts (>=)
            (9, 4, "signup", 40), (10, 4, "view", 40), (11, 4, "purchase", 39),
        ])
        out = {r["step"]: (r["event_type"], r["n_users"])
               for r in funnel(ev, ["signup", "view", "purchase"]).collect()}
        assert out == {1: ("signup", 3), 2: ("view", 3), 3: ("purchase", 1)}

    def test_single_step_and_empty(self, spark):
        from kafka_graphs_spark.pipeline.events import funnel
        import pytest as _pytest

        ev = self._events(spark, [(1, 1, "signup", 10)])
        out = funnel(ev, ["signup"]).collect()
        assert [(r["step"], r["n_users"]) for r in out] == [(1, 1)]
        with _pytest.raises(ValueError):
            funnel(ev, [])


class TestRetentionCohorts:
    def test_weekly_triangle(self, spark):
        from kafka_graphs_spark.pipeline.events import retention_cohorts

        W = 604800 * 1_000_000_000  # one week of ns
        rows = [
            # u1 first week 0, active weeks 0 and 2
            (1, 1, "x", 100), (2, 1, "x", 2 * W + 5),
            # u2 first week 1, active week 1 only (two events, one count)
            (3, 2, "x", W + 1), (4, 2, "x", W + 2),
        ]
        ev = spark.createDataFrame(
            rows, "event_id long, user_id long, event_type string, ts long"
        )
        out = {(r["cohort"], r["period"]): r["n_users"]
               for r in retention_cohorts(ev).collect()}
        assert out == {(0, 0): 1, (0, 2): 1, (1, 0): 1}


# ---- as-of join ------------------------------------------------------------


class TestAsofJoin:
    def _frames(self, spark):
        left = spark.createDataFrame(
            [(1, 1, 10), (2, 1, 5), (3, 1, 30), (4, 2, 7), (5, 3, 100)],
            "lid long, k long, t long",
        )
        right = spark.createDataFrame(
            [(101, 1, 10), (102, 1, 20), (103, 1, 1), (104, 2, 8), (105, 1, 10)],
            "rid long, k long, t long",
        ).select("k", "t", "rid")
        return left, right

    def test_backward_inclusive_with_ties(self, spark):
        from kafka_graphs_spark.pipeline.relational import asof_join

        left, right = self._frames(spark)
        rows = {r["lid"]: r["rid"]
                for r in asof_join(left, right, "k", "t", ["rid"]).collect()}
        # t=10 ties (101 vs 105) resolve to the greater rid; t=8 right is
        # AFTER the t=7 left -> no match; key 3 has no right rows
        assert rows == {1: 105, 2: 103, 3: 102, 4: None, 5: None}

    def test_tolerance_discards_stale_matches(self, spark):
        from kafka_graphs_spark.pipeline.relational import asof_join

        left, right = self._frames(spark)
        rows = {r["lid"]: r["rid"]
                for r in asof_join(left, right, "k", "t", ["rid"],
                                   tolerance=5).collect()}
        # lid3's match at t=20 is 10 old (> 5) -> dropped; lid2's at lag 4 kept
        assert rows == {1: 105, 2: 103, 3: None, 4: None, 5: None}

    def test_name_collision_gets_suffix(self, spark):
        from kafka_graphs_spark.pipeline.relational import asof_join

        left, _ = self._frames(spark)
        right = left.select("k", "t", F.col("lid"))
        out = asof_join(left, right, "k", "t", ["lid"])
        assert "lid_right" in out.columns

    def test_one_shuffle_no_python(self, spark):
        from kafka_graphs_spark.pipeline.relational import asof_join

        left, right = self._frames(spark)
        plan = (asof_join(left, right, "k", "t", ["rid"])
                ._jdf.queryExecution().executedPlan().toString())
        assert plan.count("Exchange") == 1, plan
        assert "BatchEvalPython" not in plan
        assert "CartesianProduct" not in plan


class TestRangeJoin:
    def test_point_in_interval_semantics(self, spark):
        from kafka_graphs_spark.pipeline.relational import range_join

        pts = spark.createDataFrame(
            [(1, 5), (2, 10), (3, 15), (4, 25), (5, 100)], "pid long, t long"
        )
        iv = spark.createDataFrame(
            [(10, 0, 10), (20, 12, 30), (30, 50, 60)],
            "iid long, lo long, hi long",
        )
        out = range_join(pts, iv, ts="t", start="lo", end="hi", bucket_width=7)
        got = sorted((r["iid"], r["pid"]) for r in out.collect())
        # interval 10=[0,10] gets points at 5,10 (inclusive ends);
        # 20=[12,30] gets 15,25; 30=[50,60] matches nothing
        assert got == [(10, 1), (10, 2), (20, 3), (20, 4)]

    def test_no_duplicate_pairs_across_buckets(self, spark):
        from kafka_graphs_spark.pipeline.relational import range_join

        # interval spans many buckets; each matching point pairs ONCE
        pts = spark.createDataFrame([(1, 50)], "pid long, t long")
        iv = spark.createDataFrame([(9, 0, 100)], "iid long, lo long, hi long")
        out = range_join(pts, iv, ts="t", start="lo", end="hi", bucket_width=3)
        assert out.count() == 1

    def test_plan_is_equi_join_not_bnl(self, spark):
        from kafka_graphs_spark.pipeline.relational import range_join

        pts = spark.createDataFrame([(1, 5)], "pid long, t long")
        iv = spark.createDataFrame([(10, 0, 10)], "iid long, lo long, hi long")
        plan = (range_join(pts, iv, ts="t", start="lo", end="hi", bucket_width=10)
                ._jdf.queryExecution().executedPlan().toString())
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan


# ---- event transitions (Markov profile) ------------------------------------

class TestEventTransitions:
    def _events(self, spark):
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1)
        rows = []
        # u1: a -> b -> a ; u2: a -> b
        seq = [(1, "a", 0), (1, "b", 1), (1, "a", 2), (2, "a", 0), (2, "b", 1)]
        for i, (u, ty, off) in enumerate(seq):
            rows.append((i, u, ty, t0 + dt.timedelta(minutes=off)))
        return spark.createDataFrame(
            rows, "event_id long, user_id long, event_type string, ts timestamp"
        )

    def test_counts_and_probabilities(self, spark):
        from kafka_graphs_spark.pipeline.events import event_transitions

        got = {
            (r["prev_type"], r["next_type"]): (r["n"], r["p"])
            for r in event_transitions(self._events(spark)).collect()
        }
        assert got == {("a", "b"): (2, 1.0), ("b", "a"): (1, 1.0)}

    def test_probabilities_sum_to_one_per_prev(self, spark):
        from kafka_graphs_spark.pipeline.events import event_transitions

        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        sums = (
            event_transitions(ev)
            .groupBy("prev_type")
            .agg(F.sum("p").alias("s"))
            .collect()
        )
        assert sums and all(abs(r["s"] - 1.0) < 1e-9 for r in sums)


# ---- Gopher quality rules ---------------------------------------------------

class TestGopherFilter:
    def _flags(self, spark, text, **kw):
        from kafka_graphs_spark.pipeline.text import gopher_filter

        docs = _docs(spark, [(0, "s", text)])
        return gopher_filter(docs, **kw).collect()[0]

    def test_each_rule_fires(self, spark):
        # 60 distinct words (no repeated n-grams), stopwords present
        base = "the fox and dog have fun with cats " + " ".join(
            f"word{i}x" for i in range(52)
        )
        ok = self._flags(spark, base)
        assert ok["keep"] and ok["flag_word_count"] and ok["flag_stopwords"]
        # too short
        short = self._flags(spark, "the and of that have with be to")
        assert not short["flag_word_count"] and not short["keep"]
        # symbol-heavy
        sym = self._flags(spark, base + " " + "# " * 20)
        assert not sym["flag_symbol_ratio"]
        # numeric tokens fail the alpha rule
        num = self._flags(spark, " ".join(str(i) for i in range(60)))
        assert not num["flag_alpha_ratio"] and not num["flag_stopwords"]
        # repetition: one bigram repeated everywhere
        rep = self._flags(spark, " ".join(["lorem ipsum"] * 40))
        assert not rep["flag_repetition"]

    def test_zero_shuffle_plan(self, spark):
        from kafka_graphs_spark.pipeline.text import gopher_filter

        def executed_plan(df):
            return df._jdf.queryExecution().executedPlan().toString()

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        plan = executed_plan(gopher_filter(docs))
        assert "Exchange" not in plan  # per-row flags run at scan speed
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---- CCNet perplexity buckets ----------------------------------------------

class TestPerplexityBuckets:
    def test_bands_and_null_tail(self, spark):
        from kafka_graphs_spark.pipeline.text import perplexity_buckets

        rows = [
            # src a: 5 scoreable docs + 1 too-short (NULL surprisal)
            (0, "a", "alpha beta gamma delta epsilon zeta"),
            (1, "a", "alpha beta gamma delta epsilon eta"),
            (2, "a", "alpha beta gamma delta theta iota"),
            (3, "a", "kappa lam mu nu xi omicron"),
            (4, "a", "pi rho sigma tau upsilon phi"),
            (5, "a", "word"),
        ]
        out = perplexity_buckets(_docs(spark, rows)).collect()
        by_id = {r["doc_id"]: r for r in out}
        assert len(out) == 6
        # the short doc has NULL surprisal and lands in the last bucket
        assert by_id[5]["surprisal"] is None
        assert by_id[5]["band"] == "tail" and by_id[5]["bucket"] == 3
        # ntile(3) over 6 rows: buckets of size 2 each
        from collections import Counter

        sizes = Counter(r["bucket"] for r in out)
        assert sizes == {1: 2, 2: 2, 3: 2}
        # more-predictable docs (shared prefix bigrams) rank ahead of the
        # one-off token soup
        assert by_id[0]["band"] == "head"
        assert by_id[4]["bucket"] >= 2

    def test_deterministic_across_runs(self, spark):
        from kafka_graphs_spark.pipeline.text import perplexity_buckets

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        a = sorted(map(tuple, perplexity_buckets(docs).collect()))
        b = sorted(map(tuple, perplexity_buckets(docs).collect()))
        assert a == b


# ---- DSIR -------------------------------------------------------------------

class TestDsir:
    def _corpus(self, spark):
        rows = [
            (0, "tgt", "the cat sat on the mat with the hat"),
            (1, "tgt", "the cat ran to the mat and the hat"),
            (2, "tgt", "a cat and a mat and a hat together"),
            (3, "raw", "quantum flux capacitors emit tachyon bursts"),
            (4, "raw", "tachyon bursts destabilize quantum flux fields"),
            (5, "raw", "the cat sat near quantum flux machines"),
        ]
        return _docs(spark, rows)

    def test_on_domain_scores_higher(self, spark):
        from kafka_graphs_spark.pipeline.sample import dsir_weights

        w = {
            r["doc_id"]: r["weight"]
            for r in dsir_weights(
                self._corpus(spark), F.col("source") == "tgt"
            ).collect()
        }
        # every target-domain doc outranks every off-domain doc; the
        # mixed doc (5) sits between the pure off-domain ones and target
        assert min(w[0], w[1], w[2]) > max(w[3], w[4], w[5])
        assert w[5] > min(w[3], w[4])

    def test_n_feats_is_unigrams_plus_bigrams(self, spark):
        from kafka_graphs_spark.pipeline.sample import dsir_weights

        docs = _docs(spark, [(0, "s", "a b c"), (1, "s", "solo")])
        got = {
            r["doc_id"]: r["n_feats"]
            for r in dsir_weights(docs, F.lit(True)).collect()
        }
        assert got == {0: 5, 1: 1}  # 3 uni + 2 bi; 1 uni + 0 bi

    def test_select_is_deterministic_topn(self, spark):
        from kafka_graphs_spark.pipeline.sample import dsir_select, dsir_weights

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        tgt = F.col("lang") == "en"
        sel = dsir_select(docs, tgt, 50)
        rows = sel.collect()
        assert len(rows) == 50
        again = {r["doc_id"] for r in dsir_select(docs, tgt, 50).collect()}
        assert {r["doc_id"] for r in rows} == again
        # the returned keys are exactly the 50 largest over the corpus
        all_keys = dsir_select(docs, tgt, 10_000).collect()
        top = sorted(
            all_keys, key=lambda r: (-r["key"], r["doc_id"])
        )[:50]
        assert {r["doc_id"] for r in top} == {r["doc_id"] for r in rows}

    def test_model_join_is_broadcast(self, spark):
        from kafka_graphs_spark.pipeline.sample import dsir_weights

        def executed_plan(df):
            return df._jdf.queryExecution().executedPlan().toString()

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        plan = executed_plan(dsir_weights(docs, F.col("lang") == "en"))
        # the B-bounded log-ratio model reaches the scoring join as a
        # broadcast side; per-doc scoring never shuffles the corpus twice
        assert "BroadcastExchange" in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---- trained quality classifier ----------------------------------------------

class TestTrainQualityClassifier:
    def test_loss_decreases_from_uniform(self, spark):
        from kafka_graphs_spark.pipeline.classifier import train_quality_classifier

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        out = train_quality_classifier(docs, F.col("lang") == "en").collect()
        assert len(out) == 4
        # ln(2) = loss at w = 0; eight descent steps must improve on it
        assert out[0]["final_loss"] < 0.693147

    def test_learns_separable_signal(self, spark):
        from kafka_graphs_spark.pipeline.classifier import (
            featurize,
            train_quality_classifier,
        )

        # positives are long documents, negatives short — log_n_tokens
        # separates them perfectly
        rows = [(i, "pos", " ".join(f"w{i}a{j}" for j in range(80)))
                for i in range(10)] + \
               [(100 + i, "neg", f"tiny w{i}") for i in range(10)]
        docs = _docs(spark, rows)
        tgt = F.col("source") == "pos"
        w = {
            r["feature"]: r["weight"]
            for r in train_quality_classifier(
                docs, tgt, n_iterations=40, lr=0.2
            ).collect()
        }
        assert w["log_n_tokens"] > 0
        # trained weights rank every positive above every negative
        from kafka_graphs_spark.pipeline.text import quality_score_linear

        probs = {
            r["doc_id"]: r["prob"]
            for r in quality_score_linear(docs, weights=w).collect()
        }
        assert min(probs[i] for i in range(10)) > max(
            probs[100 + i] for i in range(10)
        )

    def test_deterministic(self, spark):
        from kafka_graphs_spark.pipeline.classifier import train_quality_classifier

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        tgt = F.col("lang") == "en"
        a = sorted(map(tuple, train_quality_classifier(docs, tgt).collect()))
        b = sorted(map(tuple, train_quality_classifier(docs, tgt).collect()))
        assert a == b


# ---- interval-interval overlap join -----------------------------------------

class TestIntervalJoin:
    def _run(self, spark, lrows, rrows, w):
        from kafka_graphs_spark.pipeline.relational import interval_join

        l = spark.createDataFrame(lrows, "lid long, ls long, le long")
        r = spark.createDataFrame(rrows, "rid long, rs long, re long")
        out = interval_join(l, r, "ls", "le", "rs", "re", bucket_width=w)
        return sorted((x["lid"], x["rid"]) for x in out.collect())

    def test_overlap_semantics_exact(self, spark):
        l = [(1, 0, 10), (2, 20, 30), (3, 5, 25)]
        r = [(10, 8, 12), (20, 28, 40), (30, 100, 110)]
        # brute-force truth over closed intervals
        want = sorted(
            (a, b)
            for (a, s1, e1) in l
            for (b, s2, e2) in r
            if s1 <= e2 and s2 <= e1
        )
        assert self._run(spark, l, r, 7) == want

    def test_multi_bucket_pairs_emit_once(self, spark):
        # both intervals span many buckets; without the canonical-bucket
        # filter this pair would join in every shared bucket
        got = self._run(spark, [(1, 0, 100)], [(2, 0, 100)], 5)
        assert got == [(1, 2)]

    def test_plan_is_equi_join_not_bnl(self, spark):
        from kafka_graphs_spark.pipeline.relational import interval_join

        l = spark.range(100).select(
            F.col("id").alias("lid"),
            (F.col("id") * 10).alias("ls"),
            (F.col("id") * 10 + 15).alias("le"),
        )
        r = spark.range(100).select(
            F.col("id").alias("rid"),
            (F.col("id") * 7).alias("rs"),
            (F.col("id") * 7 + 9).alias("re"),
        )
        out = interval_join(l, r, "ls", "le", "rs", "re", bucket_width=10)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "NestedLoop" not in plan and "CartesianProduct" not in plan


class TestIncrementalWindowedPagerank:
    def test_matches_batch_windowed_pagerank(self, spark, tmp_path):
        from kafka_graphs_spark.streaming import (
            pagerank_windowed,
            pagerank_windowed_incremental,
        )

        rows = [
            (1, 2, "2026-01-01 00:05:00"),
            (2, 3, "2026-01-01 00:10:00"),
            (3, 1, "2026-01-01 00:20:00"),
            (1, 3, "2026-01-01 00:25:00"),
            (5, 6, "2026-01-01 01:05:00"),
            (6, 7, "2026-01-01 01:30:00"),
        ]
        src = str(tmp_path / "pr")
        _write_edges_t(spark, rows, src)
        out = _run_incr(
            spark,
            lambda s: pagerank_windowed_incremental(s, "1 hour"),
            src,
            str(tmp_path / "ckpr"),
            EDGE_T_SCHEMA,
        )
        # final emission per (window, id): value is monotone -> max
        final = {}
        for r in out:
            k = (r["window_start"].hour, r["id"])
            final[k] = max(final.get(k, 0.0), r["value"])
        edges = spark.createDataFrame(
            rows, "src long, dst long, event_time string"
        ).withColumn("event_time", F.to_timestamp("event_time"))
        batch = {
            (r["window_start"].hour, r["id"]): r["value"]
            for r in pagerank_windowed(edges, "1 hour").collect()
        }
        assert set(final) == set(batch)
        for k in batch:
            assert abs(final[k] - batch[k]) < 1e-9, (k, final[k], batch[k])

    def test_late_edge_reruns_only_its_window(self, spark, tmp_path):
        from kafka_graphs_spark.streaming import pagerank_windowed_incremental

        src, ckpt = str(tmp_path / "e"), str(tmp_path / "ck")
        _write_edges_t(spark, [
            (1, 2, "2026-01-01 00:05:00"),
            (7, 8, "2026-01-01 01:10:00"),
        ], src)
        op = lambda s: pagerank_windowed_incremental(s, "1 hour")
        out1 = _run_incr(spark, op, src, ckpt, EDGE_T_SCHEMA)
        v1 = {(r["window_start"].hour, r["id"]): r["value"] for r in out1}
        assert (0, 2) in v1 and (1, 8) in v1
        # rank(2) with one in-edge after 5 iters > rank(1) (source only)
        assert v1[(0, 2)] > v1[(0, 1)]

        # late edge into window 0: only window 0 re-emits, with 3's rank
        # now fed by 2's chain
        _write_edges_t(spark, [(2, 3, "2026-01-01 00:20:00")], src)
        out2 = _run_incr(spark, op, src, ckpt, EDGE_T_SCHEMA)
        assert {r["window_start"].hour for r in out2} == {0}
        v2 = {r["id"]: r["value"] for r in out2}
        assert v2[3] > v2[2] > v2[1]
        # untouched ids keep their old value exactly (state was restored)
        assert v2[1] == v1[(0, 1)] and v2[2] == v1[(0, 2)]


class TestCurateModelGate:
    def test_model_gate_keeps_top_fraction_and_dedups(self, spark):
        from kafka_graphs_spark.pipeline.curate import curate

        # 6 long separable docs + 2 near-duplicates + 2 short docs
        long_docs = [
            (i, "s", " ".join(f"tok{i}x{j}" for j in range(60)) + " the and of")
            for i in range(6)
        ]
        dups = [
            (10, "s", "alpha beta gamma delta epsilon zeta eta theta " * 5),
            (11, "s", "alpha beta gamma delta epsilon zeta eta theta " * 5 + "iota"),
        ]
        shorts = [(20, "s", "tiny one"), (21, "s", "tiny two")]
        docs = _docs(spark, long_docs + dups + shorts)
        kept = {
            r["doc_id"]
            for r in curate(
                docs,
                model_target=F.size(F.split("text", " ")) > 30,
                model_keep_frac=0.8,
                model_iterations=30,
                model_lr=0.2,
            ).collect()
        }
        # rank gate keeps floor(10*0.8)=8 docs: the shorts (lowest model
        # prob — length feature separates) fall out
        assert 20 not in kept and 21 not in kept
        # near-dup pair resolved to its min id
        assert 10 in kept and 11 not in kept
        # all separable longs survive
        assert all(i in kept for i in range(6))

    def test_without_model_gate_unchanged(self, spark):
        from kafka_graphs_spark.pipeline.curate import curate

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        a = sorted(r["doc_id"] for r in curate(docs).collect())
        assert a  # heuristic path still functional after the refactor


class TestStreamingCurationGates:
    def test_gopher_and_model_gates_run_on_streams(self, spark, tmp_path):
        # the curation gates are narrow (zero-shuffle) expressions, so
        # they apply unchanged to a readStream — the production shape:
        # train the model in batch, score the firehose in streaming
        from kafka_graphs_spark.pipeline.classifier import train_quality_classifier
        from kafka_graphs_spark.pipeline.text import gopher_filter, quality_score_linear

        rows = [
            (i, "s", ("the and of that have with it be to " * 8 + f"u{i}"))
            for i in range(6)
        ] + [(10 + i, "s", f"tiny w{i}") for i in range(4)]
        docs = spark.createDataFrame(
            rows, "doc_id long, source string, text string"
        )
        src = str(tmp_path / "docs")
        docs.coalesce(2).write.parquet(src)
        w = {
            r["feature"]: r["weight"]
            for r in train_quality_classifier(
                docs, F.length("text") > 50, n_iterations=20, lr=0.2
            ).collect()
        }

        stream = spark.readStream.schema(
            "doc_id long, source string, text string"
        ).parquet(src)
        got_flags: list = []
        got_scores: list = []
        q1 = (
            gopher_filter(stream)
            .writeStream.foreachBatch(lambda df, _b: got_flags.extend(df.collect()))
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck1"))
            .trigger(availableNow=True)
            .start()
        )
        q1.awaitTermination(120)
        q2 = (
            quality_score_linear(stream, weights=w)
            .writeStream.foreachBatch(lambda df, _b: got_scores.extend(df.collect()))
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck2"))
            .trigger(availableNow=True)
            .start()
        )
        q2.awaitTermination(120)
        batch_flags = {(r["doc_id"], r["keep"]) for r in gopher_filter(docs).collect()}
        assert {(r["doc_id"], r["keep"]) for r in got_flags} == batch_flags
        batch_scores = {
            (r["doc_id"], r["prob"])
            for r in quality_score_linear(docs, weights=w).collect()
        }
        assert {(r["doc_id"], r["prob"]) for r in got_scores} == batch_scores


class TestHardNegatives:
    def test_nearest_wrong_label_only(self, spark):
        from kafka_graphs_spark.pipeline.similarity import hard_negatives

        # label 0 cluster near the x-axis, label 1 cluster near y-axis,
        # one label-1 vector sitting INSIDE the label-0 cluster: it must
        # be every label-0 query's #1 hard negative
        rows = [
            (0, [1.0, 0.0], 0),
            (1, [0.99, 0.1], 0),
            (2, [0.98, 0.15], 0),
            (3, [0.0, 1.0], 1),
            (4, [0.1, 0.99], 1),
            (5, [0.97, 0.2], 1),  # the infiltrator
        ]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )
        out = hard_negatives(emb, emb.filter(F.col("vec_id") < 3), k=2)
        got = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in out.collect()}
        assert got[(0, 1)] == 5 and got[(1, 1)] == 5 and got[(2, 1)] == 5
        # and never a same-label neighbor
        labels = {i: l for (i, _, l) in rows}
        for (q, _), n in got.items():
            assert labels[q] != labels[n]

    def test_broadcast_no_corpus_shuffle(self, spark):
        from kafka_graphs_spark.pipeline.similarity import hard_negatives

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        out = hard_negatives(emb, emb.filter(F.col("vec_id") < 5), k=3)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastExchange" in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestDsirExternalTarget:
    def test_subset_frame_equals_column_predicate(self, spark):
        # when the external target frame IS the predicate subset, both
        # paths must produce identical weights (same counts, same model)
        from kafka_graphs_spark.pipeline.sample import dsir_weights

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        via_col = sorted(
            map(tuple, dsir_weights(docs, F.col("lang") == "en").collect())
        )
        via_frame = sorted(
            map(
                tuple,
                dsir_weights(docs, docs.filter(F.col("lang") == "en")).collect(),
            )
        )
        assert via_col == via_frame


class TestEventPathsAndSessionFunnel:
    def test_path_ngrams_exact(self, spark):
        import datetime as dt

        from kafka_graphs_spark.pipeline.events import event_path_ngrams

        t0 = dt.datetime(2024, 1, 1)
        seq = [(1, "a"), (1, "b"), (1, "c"), (1, "a"), (1, "b"), (1, "c"),
               (2, "a"), (2, "b"), (2, "c")]
        rows = [(i, u, ty, t0 + dt.timedelta(minutes=i)) for i, (u, ty) in enumerate(seq)]
        ev = spark.createDataFrame(
            rows, "event_id long, user_id long, event_type string, ts timestamp"
        )
        got = {r["path"]: (r["n_occurrences"], r["rank"])
               for r in event_path_ngrams(ev, n=3, k=10).collect()}
        # 'a > b > c' occurs 3x (twice for u1, once for u2), the shifted
        # windows once each
        assert got["a > b > c"] == (3, 1)
        assert got["b > c > a"][0] == 1 and got["c > a > b"][0] == 1
        assert len(got) == 3

    def test_session_funnel_scopes_to_visits(self, spark):
        import datetime as dt

        from kafka_graphs_spark.pipeline.sessions import session_funnel

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            # u1 session 0: full conversion within the session
            (0, 1, "signup", t0),
            (1, 1, "view", t0 + dt.timedelta(minutes=5)),
            (2, 1, "purchase", t0 + dt.timedelta(minutes=10)),
            # u2: signup, then view only after a 2h gap (NEW session) —
            # converts across the user history but not within a visit
            (3, 2, "signup", t0),
            (4, 2, "view", t0 + dt.timedelta(hours=2)),
        ]
        ev = spark.createDataFrame(
            rows, "event_id long, user_id long, event_type string, ts timestamp"
        )
        got = {r["step"]: r["n_sessions"]
               for r in session_funnel(ev, gap_minutes=30).collect()}
        assert got == {1: 2, 2: 1, 3: 1}


class TestTokenBudgetSample:
    def test_budget_binds_and_is_monotone(self, spark):
        from kafka_graphs_spark.pipeline.sample import token_budget_sample

        rows = [(i, f"s{i % 2}", "text") for i in range(20)]
        docs = spark.createDataFrame(
            rows, "doc_id long, source string, text string"
        ).withColumn("n_tokens", F.lit(10))
        small = {r["doc_id"] for r in token_budget_sample(
            docs, 35, "n_tokens", "source").collect()}
        big = {r["doc_id"] for r in token_budget_sample(
            docs, 75, "n_tokens", "source").collect()}
        # exclusive-prefix < budget: 4 docs of 10 tokens per stratum at 35
        assert len(small) == 8 and len(big) == 16
        # larger budget strictly extends the sample (same md5 order)
        assert small < big

    def test_first_doc_always_kept(self, spark):
        from kafka_graphs_spark.pipeline.sample import token_budget_sample

        docs = spark.createDataFrame(
            [(1, "a", 1000), (2, "a", 1000)],
            "doc_id long, source string, n_tokens int",
        )
        kept = token_budget_sample(docs, 5, "n_tokens", "source").collect()
        assert len(kept) == 1  # exclusive prefix 0 < 5 keeps exactly one


class TestIncrementalWindowedLp:
    def test_bit_exact_batch_parity_on_general_graph(self, spark, tmp_path):
        from kafka_graphs_spark.streaming import lp_windowed, lp_windowed_incremental

        rows = [
            (1, 2, "2026-01-01 00:05:00"),
            (2, 3, "2026-01-01 00:10:00"),
            (3, 1, "2026-01-01 00:20:00"),  # cycle
            (9, 2, "2026-01-01 00:25:00"),  # high label feeding in
            (5, 6, "2026-01-01 01:05:00"),
        ]
        src = str(tmp_path / "lp")
        _write_edges_t(spark, rows, src)
        out = _run_incr(
            spark,
            lambda s: lp_windowed_incremental(s, "1 hour", max_iterations=10),
            src,
            str(tmp_path / "cklp"),
            EDGE_T_SCHEMA,
        )
        final = {}
        for r in out:  # labels only move up -> final = max
            k = (r["window_start"].hour, r["id"])
            final[k] = max(final.get(k, -1), r["label"])
        edges = spark.createDataFrame(
            rows, "src long, dst long, event_time string"
        ).withColumn("event_time", F.to_timestamp("event_time"))
        batch = {
            (r["window_start"].hour, r["id"]): r["label"]
            for r in lp_windowed(edges, "1 hour", max_iterations=10).collect()
        }
        assert final == batch  # exact integers: == not approx

    def test_late_edge_relabels_only_its_window(self, spark, tmp_path):
        from kafka_graphs_spark.streaming import lp_windowed_incremental

        src, ckpt = str(tmp_path / "e"), str(tmp_path / "ck")
        _write_edges_t(spark, [
            (1, 2, "2026-01-01 00:05:00"),
            (7, 8, "2026-01-01 01:10:00"),
        ], src)
        op = lambda s: lp_windowed_incremental(s, "1 hour")
        out1 = _run_incr(spark, op, src, ckpt, EDGE_T_SCHEMA)
        v1 = {(r["window_start"].hour, r["id"]): r["label"] for r in out1}
        assert v1[(0, 2)] == 2  # 1->2: label 1 not > 2, keeps own id
        # late high-label source into window 0
        _write_edges_t(spark, [(9, 1, "2026-01-01 00:20:00")], src)
        out2 = _run_incr(spark, op, src, ckpt, EDGE_T_SCHEMA)
        assert {r["window_start"].hour for r in out2} == {0}
        v2 = {r["id"]: r["label"] for r in out2}
        assert v2[1] == 9 and v2[2] == 9 and v2[9] == 9


class TestRetrievalMetrics:
    def test_hand_computed_ndcg(self, spark):
        import math

        from kafka_graphs_spark.pipeline.text import retrieval_metrics

        ranked = spark.createDataFrame(
            [(1, 10, 1), (1, 11, 2), (1, 12, 3), (2, 10, 1)],
            "query_id long, doc_id long, rank long",
        )
        rels = spark.createDataFrame(
            [(1, 10), (1, 12), (1, 99), (2, 50)],
            "query_id long, doc_id long",
        )
        got = {r["query_id"]: r for r in retrieval_metrics(ranked, rels, k=3).collect()}
        r1 = got[1]
        assert r1["n_rel"] == 3 and r1["hits"] == 2
        dcg = 1 / math.log2(2) + 1 / math.log2(4)  # relevant at ranks 1, 3
        idcg = 1 / math.log2(2) + 1 / math.log2(3) + 1 / math.log2(4)
        assert abs(r1["dcg"] - dcg) < 1e-6
        assert abs(r1["idcg"] - idcg) < 1e-6
        assert abs(r1["ndcg"] - dcg / idcg) < 1e-6
        assert abs(r1["recall"] - 2 / 3) < 1e-6
        # query 2: no relevant retrieved
        r2 = got[2]
        assert r2["hits"] == 0 and r2["dcg"] == 0.0 and r2["ndcg"] == 0.0


class TestBlocklistFilter:
    def test_exact_counts_including_overlaps(self, spark):
        from kafka_graphs_spark.pipeline.text import blocklist_filter

        docs = _docs(spark, [
            (0, "s", "bad Bad, bad-thing good"),       # token 'bad' x3
            (1, "s", "very bad thing bad thing here"), # 'bad thing' x2
            (2, "s", "all clean words only"),
        ])
        got = {r["doc_id"]: r for r in blocklist_filter(
            docs, ["bad", "bad thing"]).collect()}
        # doc 0: 'bad' 3x ('bad-thing' tokenizes to bad, thing -> also a
        # 'bad thing' bigram!) -> 3 + 1
        assert got[0]["n_blocked"] == 4
        assert got[0]["blocked_terms"] == ["bad", "bad thing"]
        assert not got[0]["keep"]
        assert got[1]["n_blocked"] == 2 + 2  # 'bad' twice, bigram twice
        assert got[2]["keep"] and got[2]["n_blocked"] == 0
        assert got[2]["blocked_terms"] == []

    def test_zero_shuffle_plan(self, spark):
        from kafka_graphs_spark.pipeline.text import blocklist_filter

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        plan = blocklist_filter(docs, ["slow", "table scan"])._jdf \
            .queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_curate_blocklist_gate(spark):
    from kafka_graphs_spark.pipeline.curate import curate

    good = " ".join(
        f"the alpha{i} bravo{i} charlie{i} delta{i} echo{i}" for i in range(8)
    )
    rows = [
        (0, "s", good),
        (1, "s", good + " forbidden term here"),
        (2, "s", good.replace("alpha0", "alpha99")),
    ]
    docs = _docs(spark, rows)
    base = {r["doc_id"] for r in curate(docs, jaccard_threshold=0.99).collect()}
    gated = {
        r["doc_id"]
        for r in curate(
            docs, jaccard_threshold=0.99, blocklist=["forbidden term"]
        ).collect()
    }
    assert 1 in base and 1 not in gated
    assert gated == base - {1}


class TestPprMulti:
    def test_each_seed_matches_single_source_run(self, spark):
        from kafka_graphs_spark import Graph
        from kafka_graphs_spark.library import pagerank, ppr_multi

        e = spark.createDataFrame(
            [(1, 2, 1.0), (2, 3, 1.0), (3, 1, 1.0), (2, 4, 1.0), (4, 5, 1.0)],
            "src long, dst long, value double",
        )
        g = Graph.from_edges(e, F.lit(0.0))
        multi = ppr_multi(g, [1, 4], max_iterations=6)
        for seed in (1, 4):
            got = {
                r["id"]: r["value"]
                for r in multi.filter(F.col("seed") == seed).collect()
            }
            want = {
                r["id"]: r["value"]
                for r in pagerank(
                    g, src_vertex_id=seed, max_iterations=6
                ).collect()
            }
            assert got == want  # identical recurrence -> exact equality


class TestAssortativity:
    def test_star_is_maximally_disassortative(self, spark):
        from kafka_graphs_spark import Graph
        from kafka_graphs_spark.library import degree_assortativity

        e = spark.createDataFrame(
            [(0, i, 1.0) for i in range(1, 6)], "src long, dst long, value double"
        )
        row = degree_assortativity(Graph.from_edges(e, F.lit(0.0))).collect()[0]
        assert row["n_und_edges"] == 5
        assert row["assortativity"] == -1.0  # hub-leaf only: perfect anticorrelation

    def test_regular_graph_zero_by_convention(self, spark):
        from kafka_graphs_spark import Graph
        from kafka_graphs_spark.library import degree_assortativity

        # 4-cycle: every degree 2 -> zero variance -> convention 0.0
        e = spark.createDataFrame(
            [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0), (3, 0, 1.0)],
            "src long, dst long, value double",
        )
        row = degree_assortativity(Graph.from_edges(e, F.lit(0.0))).collect()[0]
        assert row["assortativity"] == 0.0

    def test_matches_networkx_formula_by_hand(self, spark):
        from kafka_graphs_spark import Graph
        from kafka_graphs_spark.library import degree_assortativity

        # path graph 0-1-2-3: degrees 1,2,2,1
        e = spark.createDataFrame(
            [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0)],
            "src long, dst long, value double",
        )
        row = degree_assortativity(Graph.from_edges(e, F.lit(0.0))).collect()[0]
        # directed pairs (dx,dy): (1,2),(2,1),(2,2),(2,2),(2,1),(1,2)
        # n=6 sx=10 sxx=18 sxy=16 -> r=(96-100)/(108-100)=-0.5
        assert row["assortativity"] == -0.5


class TestContainmentPairs:
    def test_excerpt_scores_containment_not_jaccard(self, spark):
        from kafka_graphs_spark.pipeline.dedup import (
            containment_pairs,
            ngram_jaccard_pairs,
        )

        long_text = " ".join(f"w{i}" for i in range(100))
        excerpt = " ".join(f"w{i}" for i in range(20, 30))  # inside long
        docs = _docs(spark, [(0, "s", long_text), (1, "s", excerpt),
                             (2, "s", "totally different words here now")])
        cont = {(r["doc_inner"], r["doc_outer"]): r["containment"]
                for r in containment_pairs(docs, threshold=0.9).collect()}
        # the excerpt is fully contained in the long doc...
        assert cont[(1, 0)] == 1.0
        # ...but not vice versa, and Jaccard misses it entirely
        assert (0, 1) not in cont
        jac = ngram_jaccard_pairs(docs, threshold=0.5).collect()
        assert not [r for r in jac if {r["doc_a"], r["doc_b"]} == {0, 1}]


def test_language_mix_flags_code_switched_text(spark):
    from kafka_graphs_spark.pipeline.text import language_mix

    docs = _docs(spark, [
        (0, "s", "the cat and the dog of it all"),            # en only
        (1, "s", "der hund und die katze the cat and dog"),   # de + en
        (2, "s", "xyzzy plugh quux"),                         # none
    ])
    got = {r["doc_id"]: r for r in language_mix(docs).collect()}
    assert not got[0]["mixed"] and got[0]["n_langs"] == 1
    assert got[1]["mixed"] and got[1]["hits_de"] >= 2 and got[1]["hits_en"] >= 2
    assert got[2]["n_langs"] == 0 and not got[2]["mixed"]


class TestNativeSessionWindows:
    def test_sessions_emit_after_watermark(self, spark, tmp_path):
        from kafka_graphs_spark.pipeline.sessions import session_stats_stream

        src = str(tmp_path / "ev")
        rows = [
            (1, "2026-01-01 00:00:00", 1.0),
            (1, "2026-01-01 00:05:00", 2.0),   # same session (5m < 30m)
            (1, "2026-01-01 02:00:00", 4.0),   # new session
            # fence: far-future event advances the watermark so every
            # session above closes and emits in append mode
            (99, "2026-01-03 00:00:00", 0.0),
        ]
        df = spark.createDataFrame(
            rows, "user_id long, ts string, value double"
        ).withColumn("ts", F.to_timestamp("ts"))
        df.coalesce(1).write.parquet(src)

        stream = spark.readStream.schema(
            "user_id long, ts timestamp, value double"
        ).parquet(src)
        out: list = []
        q = (
            session_stats_stream(stream, gap_minutes=30, watermark="10 minutes")
            .writeStream.foreachBatch(lambda b, _i: out.extend(b.collect()))
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r["user_id"], r["session_start"].hour): (r["n_events"], r["total_value"])
            for r in out
        }
        assert got[(1, 0)] == (2, 3.0)   # merged 2-event session
        assert got[(1, 2)] == (1, 4.0)   # the later singleton


def test_rank_correlation_hand_computed(spark):
    from kafka_graphs_spark.pipeline.text import rank_correlation

    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3), (1, 13, 4)],
        "query_id long, doc_id long, rank long",
    )
    # b reverses 11 and 12, drops 13, adds 99
    b = spark.createDataFrame(
        [(1, 10, 1), (1, 12, 2), (1, 11, 3), (1, 99, 4)],
        "query_id long, doc_id long, rank long",
    )
    r = rank_correlation(a, b, k=10).collect()[0]
    # common docs: 10,11,12 -> pairs (10,11)C,(10,12)C,(11,12)D
    assert r["n_common"] == 3
    assert r["concordant"] == 2 and r["discordant"] == 1
    assert abs(r["tau"] - 1 / 3) < 1e-12
    # identical runs -> tau 1
    full = rank_correlation(a, a, k=10).collect()[0]
    assert full["tau"] == 1.0


def test_powerlaw_alpha_hand_computed(spark):
    import math

    from kafka_graphs_spark import Graph
    from kafka_graphs_spark.library import powerlaw_alpha

    # two hubs of degree 3 and 2 leaves of degree 2 via a shared path:
    # star 0-(1,2,3) plus edges 1-2, 2-3 -> degrees: 0:3, 1:2, 2:3, 3:2
    e = spark.createDataFrame(
        [(0, 1, 1.0), (0, 2, 1.0), (0, 3, 1.0), (1, 2, 1.0), (2, 3, 1.0)],
        "src long, dst long, value double",
    )
    row = powerlaw_alpha(Graph.from_edges(e, F.lit(0.0)), d_min=2).collect()[0]
    assert row["n_tail"] == 4
    lnsum = 2 * math.log(3 / 1.5) + 2 * math.log(2 / 1.5)
    assert abs(row["alpha"] - (1 + 4 / lnsum)) < 1e-6

    # empty tail convention
    empty = powerlaw_alpha(Graph.from_edges(e, F.lit(0.0)), d_min=99).collect()[0]
    assert empty["n_tail"] == 0 and empty["alpha"] == 0.0
