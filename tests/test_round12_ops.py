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
    hugeint, _ = _sweep({
        "bad": """
            SELECT x, sum(CAST(x AS BIGINT)) OVER (ORDER BY x) AS cum
            FROM (VALUES (1), (2), (3)) t(x)
        """,
    })
    assert hugeint == [("bad", "cum", "HUGEINT")]


def test_dtype_sweep_accepts_cast_bigint():
    hugeint, decimal = _sweep({
        "good": """
            SELECT x, CAST(sum(CAST(x AS BIGINT)) OVER (ORDER BY x) AS BIGINT) AS cum
            FROM (VALUES (1), (2), (3)) t(x)
        """,
    })
    assert hugeint == [] and decimal == []


def test_dtype_sweep_flags_unadjudicated_decimal():
    _, decimal = _sweep({
        "dec": "SELECT CAST(1.5 AS DECIMAL(4,1)) AS score",
    })
    assert decimal and decimal[0][:2] == ("dec", "score")


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
        hugeint, decimal = dtype_sweep(con, entry_mod.oracle_sql())
    finally:
        con.close()
    assert hugeint == [], f"un-CAST HUGEINT oracle columns: {hugeint}"
    assert decimal == [], f"unadjudicated DECIMAL oracle columns: {decimal}"
