"""Local mirror of the driver's correctness gate over the first-N queries().

Usage: python scripts/check_window.py [N] [SF_DIR]
Prints one status line per query and a final summary.
"""

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(
        (tuple(r[i] for i in order) for r in rows),
        key=lambda t: tuple(str(x) for x in t),
    )


def approx_equal(a, b):
    if isinstance(a, float) or isinstance(b, float):
        if a is None or b is None:
            return a is b
        fa, fb = float(a), float(b)
        if math.isinf(fa) or math.isinf(fb):
            return fa == fb
        return math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-9)
    return a == b


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.driver.memory", "12g")
        .config("spark.ui.enabled", "false")
        .appName("check_window")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = list(qs.keys())[:n]
    if only:
        names = [nm for nm in names if nm in only]
    fails = []
    for i, name in enumerate(names, 1):
        t0 = time.time()
        try:
            df = qs[name](spark, sf_dir)
            scols = df.columns
            srows = [tuple(r) for r in df.collect()]
            if name not in oracles:
                print(f"[{i:2d}] {name}: rows_only ({len(srows)} rows) {time.time()-t0:.1f}s")
                continue
            # the driver canonicalizes via pandas sort_values, which
            # crashes on list/dict cells — reject complex top-level
            # columns the same way the driver would (r8 doc_blocklist)
            from pyspark.sql.types import ArrayType, MapType, StructType

            complex_cols = [
                f.name for f in df.schema.fields
                if isinstance(f.dataType, (ArrayType, MapType, StructType))
            ]
            if complex_cols:
                fails.append(name)
                print(f"[{i:2d}] {name}: COMPLEX TOP-LEVEL COLUMNS {complex_cols} "
                      f"(driver pandas canonicalizer would crash)")
                continue
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            if sorted(scols) != sorted(dcols):
                fails.append(name)
                print(f"[{i:2d}] {name}: SCHEMA MISMATCH spark={sorted(scols)} duck={sorted(dcols)}")
                continue
            if len(srows) != len(drows):
                fails.append(name)
                print(f"[{i:2d}] {name}: ROWCOUNT spark={len(srows)} duck={len(drows)}")
                continue
            ns, nd = normalize(srows, scols), normalize(drows, dcols)
            bad = [
                (a, b)
                for a, b in zip(ns, nd)
                if not (len(a) == len(b) and all(approx_equal(x, y) for x, y in zip(a, b)))
            ]
            if bad:
                fails.append(name)
                print(f"[{i:2d}] {name}: {len(bad)} VALUE MISMATCHES; first: {bad[:2]}")
            else:
                print(f"[{i:2d}] {name}: OK ({len(srows)} rows) {time.time()-t0:.1f}s")
        except Exception as e:  # noqa: BLE001
            fails.append(name)
            print(f"[{i:2d}] {name}: ERROR {type(e).__name__}: {str(e)[:300]}")
    print(f"\n{len(names) - len(fails)}/{len(names)} green; fails: {fails}")
    spark.stop()


if __name__ == "__main__":
    main()
