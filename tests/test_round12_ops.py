"""Round-12 additions: oracle dtype sweep, license-regex widening,
bloom merge guard, shard-manifest dtype stability, SVD++ float32.
"""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# Oracle dtype sweep (scripts/audit_discrimination.py) — round-11 lesson:
# DuckDB widens window sum(BIGINT) to HUGEINT, which fetchdf renders as
# float64 against Spark's int64 and the driver hash mismatches on
# exactly-equal values (doc_domain_token_budget, CORRECTNESS_r11).
# ---------------------------------------------------------------------------

def _sweep(oracles):
    from scripts.audit_discrimination import dtype_sweep

    con = duckdb.connect()
    try:
        return dtype_sweep(con, oracles)
    finally:
        con.close()


def test_dtype_sweep_flags_uncast_hugeint():
    # a window sum over BIGINT is exactly the doc_domain_token_budget bug
    hugeint, _, errs = _sweep({
        "bad": """
            SELECT x, sum(CAST(x AS BIGINT)) OVER (ORDER BY x) AS cum
            FROM (VALUES (1), (2), (3)) t(x)
        """,
    })
    assert hugeint == [("bad", "cum", "HUGEINT")] and errs == []


def test_dtype_sweep_accepts_cast_bigint():
    hugeint, decimal, errs = _sweep({
        "good": """
            SELECT x, CAST(sum(CAST(x AS BIGINT)) OVER (ORDER BY x) AS BIGINT) AS cum
            FROM (VALUES (1), (2), (3)) t(x)
        """,
    })
    assert hugeint == [] and decimal == [] and errs == []


def test_dtype_sweep_flags_unadjudicated_decimal():
    _, decimal, _ = _sweep({
        "dec": "SELECT CAST(1.5 AS DECIMAL(4,1)) AS score",
    })
    assert decimal and decimal[0][:2] == ("dec", "score")


ROBOTS_VARIANTS = [
    # (doc_id, text, expected robots content)
    (1, '<meta name="robots" content="noindex"> canonical', "noindex"),
    (2, "<meta name='robots' content='noarchive'> single-quoted", "noarchive"),
    (3, '<meta content="none" name="robots"> content-first', "none"),
    (4, "<meta content='noindex, follow' name='robots'> both variants", "noindex, follow"),
    (5, "<meta name='robots' content=\"noindex\"> mixed name-quote ok", "noindex"),
    (6, '<meta name="robots" content="noindexing"> whole-token only', "noindexing"),
    (7, "no tag at all", ""),
]


def test_robots_extraction_all_forms(spark):
    """r12: the widened robots extractor reads both attribute orders and
    both quote styles (r11 ADVICE — a policy gate must not fail open on
    a single-quoted or content-first tag)."""
    from kafka_graphs_spark.pipeline.licenses import license_signals

    docs = spark.createDataFrame(
        [(i, t) for i, t, _ in ROBOTS_VARIANTS], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in license_signals(docs).collect()}
    for i, _, want in ROBOTS_VARIANTS:
        assert out[i]["robots"] == want, (i, out[i]["robots"], want)
    # opt-out: whole-token membership over the widened forms
    assert out[1]["opted_out"] and out[2]["opted_out"] and out[3]["opted_out"]
    assert out[4]["opted_out"] and out[5]["opted_out"]
    assert not out[6]["opted_out"] and not out[7]["opted_out"]


def test_robots_extraction_stays_jvm_side(spark):
    """The widened extractor is still pure codegen — no BatchEvalPython."""
    from kafka_graphs_spark.pipeline.licenses import license_signals

    docs = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    plan = (
        license_signals(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_merge_bloom_filters_word_count_mismatch_raises(spark):
    """r12 (r11 ADVICE): mismatched filter sizes must fail loudly, not
    NULL-pad into silent probe corruption."""
    from pyspark.sql import functions as F

    from kafka_graphs_spark.pipeline.bloom import (
        build_bloom_filter,
        merge_bloom_filters,
    )

    keys_a = spark.createDataFrame([("a",), ("b",)], ["k"])
    keys_b = spark.createDataFrame([("c",), ("d",)], ["k"])
    fa, _, _, _ = build_bloom_filter(keys_a, "k", bits_per_key=8)
    fb, _, _, _ = build_bloom_filter(keys_b, "k", bits_per_key=512)
    na = fa.select(F.size("bloom")).first()[0]
    nb = fb.select(F.size("bloom")).first()[0]
    assert na != nb, "fixture must produce different word counts"
    with pytest.raises(Exception, match="word-count mismatch"):
        merge_bloom_filters(fa, fb).collect()
    # same-parameter merge still works
    fc, _, _, _ = build_bloom_filter(keys_b, "k", bits_per_key=8)
    merged = merge_bloom_filters(fa, fc)
    assert merged.select(F.size("bloom")).first()[0] == na


def test_write_shards_numeric_group_col_roundtrip(spark, tmp_path):
    """r12 (r11 ADVICE): a numeric-looking group value ('123') must come
    back as the input dtype from the partitioned re-read, so the
    verification manifest matches the written artifact."""
    from kafka_graphs_spark.pipeline.shards import shard_manifest, write_shards

    rows = [(i, "123" if i % 2 == 0 else "456", i % 3, 10) for i in range(30)]
    assigned = spark.createDataFrame(
        rows, ["doc_id", "source", "shard", "n_tokens"]
    )
    out = str(tmp_path / "shards")
    observed = write_shards(assigned, out, group_col="source")
    want = {tuple(r) for r in shard_manifest(assigned, group_col="source").collect()}
    got = {tuple(r) for r in observed.collect()}
    assert dict(observed.dtypes)["source"] == "string"
    assert got == want


def test_registry_oracles_dtype_clean():
    """No oracle in the live registry may emit HUGEINT or an
    unadjudicated DECIMAL — the class that produced the r11 red row."""
    import __spark_entry__ as entry_mod
    from scripts.audit_discrimination import TABLES, dtype_sweep

    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
            )
        hugeint, decimal, errs = dtype_sweep(con, entry_mod.oracle_sql())
    finally:
        con.close()
    assert hugeint == [], f"un-CAST HUGEINT oracle columns: {hugeint}"
    assert decimal == [], f"unadjudicated DECIMAL oracle columns: {decimal}"
    # r12 ADVICE: a DESCRIBE failure means the sweep never inspected
    # that oracle — it must fail the gate, not silently count as clean
    assert errs == [], f"oracles the dtype sweep could not DESCRIBE: {errs}"
