"""Round-13 additions: unquoted robots attributes + presence-based
form priority (licenses), dtype-sweep DESCRIBE-failure surfacing,
shard-verify read without partition-column inference.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# Robots-meta extraction widening (r12 verdict item 7 + r12 ADVICE):
# unquoted attribute values must not fail open, and an explicitly
# EMPTY canonical tag must STOP the form-priority chain instead of
# falling through to a lower-priority tag's content.
# ---------------------------------------------------------------------------


class TestRobotsUnquoted:
    def _signals(self, spark, rows):
        from kafka_graphs_spark.pipeline.licenses import license_signals

        docs = spark.createDataFrame(rows, "doc_id long, text string")
        return {r["doc_id"]: r.asDict() for r in license_signals(docs).collect()}

    def test_unquoted_forms_extract(self, spark):
        out = self._signals(spark, [
            # fully-unquoted, name-first
            (1, "<meta name=robots content=noindex> body"),
            # unquoted content, quoted name
            (2, '<meta name="robots" content=noindex,follow> body'),
            # content-first, unquoted, name delimited by '>'
            (3, "<meta content=noarchive name=robots> body"),
            # content-first, unquoted, name delimited by whitespace
            (4, "<meta content=noarchive name=robots /> body"),
        ])
        assert out[1]["robots"] == "noindex" and out[1]["opted_out"]
        assert out[2]["robots"] == "noindex,follow" and out[2]["opted_out"]
        assert out[3]["robots"] == "noarchive" and out[3]["opted_out"]
        assert out[4]["robots"] == "noarchive" and out[4]["opted_out"]

    def test_name_token_is_anchored(self, spark):
        # 'robotsx' must not prefix-match 'robots' in either order
        out = self._signals(spark, [
            (1, "<meta name=robotsx content=noindex> body"),
            (2, "<meta content=noindex name=robotsx> body"),
            (3, '<meta name="robotsx" content="noindex"> body'),
        ])
        for i in (1, 2, 3):
            assert out[i]["robots"] == "" and not out[i]["opted_out"]

    def test_empty_canonical_tag_stops_priority_chain(self, spark):
        # presence-based priority (r12 ADVICE): the empty double-quoted
        # canonical tag wins over the lower-priority content-first
        # decoy — robots is '', NOT 'noarchive'
        out = self._signals(spark, [
            (1, '<meta name="robots" content=""> '
                "<meta content='noarchive' name='robots'> body"),
        ])
        assert out[1]["robots"] == "" and not out[1]["opted_out"]

    def test_quoted_form_still_outranks_unquoted(self, spark):
        # form order is fixed: double-quoted beats unquoted regardless
        # of document order (one tag per document in practice)
        out = self._signals(spark, [
            (1, '<meta name=robots content=noindex> '
                '<meta name="robots" content="index, follow"> body'),
        ])
        assert out[1]["robots"] == "index, follow" and not out[1]["opted_out"]


# ---------------------------------------------------------------------------
# write_shards verification read (r12 ADVICE): the infer-then-cast-back
# round trip canonicalized numeric-looking group strings ('0123' ->
# int 123 -> '123'); the explicit-schema read must preserve them.
# ---------------------------------------------------------------------------


def test_write_shards_preserves_noncanonical_numeric_groups(spark, tmp_path):
    from kafka_graphs_spark.pipeline.shards import shard_manifest, write_shards

    rows = [
        (i, "0123" if i % 3 == 0 else ("1e2" if i % 3 == 1 else "plain"),
         i % 2, 10)
        for i in range(30)
    ]
    assigned = spark.createDataFrame(
        rows, ["doc_id", "source", "shard", "n_tokens"]
    )
    out = str(tmp_path / "shards")
    observed = write_shards(assigned, out, group_col="source")
    want = {tuple(r) for r in shard_manifest(assigned, group_col="source").collect()}
    got = {tuple(r) for r in observed.collect()}
    assert got == want
    groups = {r[0] for r in got}
    assert groups == {"0123", "1e2", "plain"}, groups


# ---------------------------------------------------------------------------
# Louvain r13 instrumentation: the sweep_stats hook and the
# min_moved_frac early-stop knob (default off = legacy behavior).
# ---------------------------------------------------------------------------


class TestLouvainEarlyStop:
    def _graph(self, spark):
        from pyspark.sql import functions as F

        from kafka_graphs_spark import Graph

        # two K4 cliques joined by one weak bridge — unambiguous optimum
        cliques = [(a, b, 1.0) for grp in (range(4), range(4, 8))
                   for a in grp for b in grp if a < b]
        edges = spark.createDataFrame(
            cliques + [(3, 4, 0.01)], "src long, dst long, value double"
        )
        return Graph.from_edges(edges, F.lit(0.0))

    def test_sweep_stats_hook_records_distributed_sweeps(self, spark):
        from kafka_graphs_spark.library.louvain import louvain

        stats = []
        out = louvain(
            self._graph(spark), max_levels=1, max_sweeps=4,
            local_threshold=0, sweep_stats=stats,
        )
        comms = {r["community"] for r in out.collect()}
        assert comms == {0, 4}
        assert stats and all(
            set(s) == {"level", "sweep", "parity", "seconds", "moves", "n"}
            for s in stats
        )
        assert stats[0]["n"] == 8 and stats[0]["moves"] >= 1

    def test_min_moved_frac_stops_after_first_pair(self, spark):
        from kafka_graphs_spark.library.louvain import louvain

        # epsilon 1.0: any pair moving < 100% of vertices ends the
        # level after its first parity pair (2 sub-sweeps per level)
        stats = []
        out = louvain(
            self._graph(spark), max_levels=1, max_sweeps=4,
            local_threshold=0, min_moved_frac=1.0, sweep_stats=stats,
        )
        assert len(stats) == 2
        # the partition is still a valid labeling of all 8 vertices
        assert out.count() == 8

    def test_default_epsilon_is_legacy_behavior(self, spark):
        from kafka_graphs_spark.library.louvain import louvain

        a, b = [], []
        ga = louvain(self._graph(spark), max_levels=2, max_sweeps=4,
                     local_threshold=0, sweep_stats=a)
        gb = louvain(self._graph(spark), max_levels=2, max_sweeps=4,
                     local_threshold=0, min_moved_frac=0.0, sweep_stats=b)
        assert sorted(map(tuple, ga.collect())) == sorted(map(tuple, gb.collect()))
        assert [s["sweep"] for s in a] == [s["sweep"] for s in b]
