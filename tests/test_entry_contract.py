"""Driver-contract parity harness — mimics the driver's t2 gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet dir, then compares row multisets with columns
sorted by name (the driver's value-hash is order-insensitive and
column-name-keyed). Floats must match to 1e-9 — the oracles are engineered
for bit-equality or explicit two-sided rounding.
"""

import math
import os

import duckdb
import pytest

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def approx_equal(a, b):
    if isinstance(a, float) or isinstance(b, float):
        if a is None or b is None:
            return a is b
        fa, fb = float(a), float(b)
        if math.isinf(fa) or math.isinf(fb):
            return fa == fb
        return math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-9)
    return a == b


def rows_equal(r1, r2):
    return len(r1) == len(r2) and all(approx_equal(a, b) for a, b in zip(r1, r2))


def assert_no_complex_columns(spark_df, name):
    """Driver-canonicalizer contract: the driver hashes oracle-backed
    results through pandas ``sort_values``, which raises ``TypeError:
    unhashable type`` on list/dict cells (r8's one red row,
    ``doc_blocklist``). Every oracle-backed ``queries()`` output must
    therefore flatten ARRAY/MAP/STRUCT columns before emitting
    (``array_join``/``posexplode``/``concat_ws`` — repo convention).
    Rows-only entries are exempt: the driver only counts them.
    """
    from pyspark.sql.types import ArrayType, MapType, StructType

    bad = [
        f.name
        for f in spark_df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, (
        f"{name}: top-level complex column(s) {bad} would crash the "
        f"driver's pandas canonicalizer — flatten with array_join/"
        f"concat_ws/posexplode before emitting"
    )


def compare(spark_df, con, sql, name):
    assert_no_complex_columns(spark_df, name)
    scols = spark_df.columns
    srows = [tuple(r) for r in spark_df.collect()]
    res = con.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols), (
        f"{name}: column mismatch spark={sorted(scols)} duck={sorted(dcols)}"
    )
    assert len(srows) == len(drows), f"{name}: rowcount spark={len(srows)} duck={len(drows)}"
    ns, nd = normalize(srows, scols), normalize(drows, dcols)
    bad = [(a, b) for a, b in zip(ns, nd) if not rows_equal(a, b)]
    assert not bad, f"{name}: {len(bad)} mismatching rows; first 3: {bad[:3]}"


@pytest.fixture(scope="module")
def contract():
    import __spark_entry__ as entry_mod

    return entry_mod


@pytest.fixture(scope="module")
def duck():
    con = duck_con(SF_DIR)
    yield con
    con.close()


def test_entry_smoke(spark, contract):
    df = contract.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["id", "value"]


def _query_names():
    import __spark_entry__ as entry_mod

    return sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", _query_names())
def test_query_parity(spark, contract, duck, name):
    q = contract.queries()[name]
    oracles = contract.oracle_sql()
    df = q(spark, SF_DIR)
    if name not in oracles:
        # rows-only check (driver's weaker path for non-SQL-expressible ops)
        assert df.count() >= 0
        return
    compare(df, duck, oracles[name], name)
