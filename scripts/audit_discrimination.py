"""Vacuousness audit over the oracle registry.

A hash-green driver row can still be vacuous (r6: an empty frame; r8:
an all-false gate) — the oracle and the query agree, but the output
exercises nothing. This script runs every ``oracle_sql()`` entry in
DuckDB (no Spark needed — by construction the oracle output equals the
query output whenever the driver row is green) and flags:

- 0-row outputs;
- boolean/flag columns with a single distinct value over >= 10 rows
  (a gate that never fires);
- any non-key column with exactly 1 distinct value over >= 20 rows
  (a computed column that never discriminates);
- oracle output columns typed HUGEINT or DECIMAL (round-11 lesson:
  DuckDB widens window ``sum(BIGINT)`` to HUGEINT, which ``fetchdf``
  renders as float64 against Spark's int64 — a hash mismatch on
  exactly-equal values; ``doc_domain_token_budget`` scored red for
  this alone).  HUGEINT is a hard failure (CAST it to BIGINT in the
  oracle); DECIMAL is allowed only when the paired Spark column is a
  double (pandas renders both sides float64) and the pairing is
  recorded in DECIMAL_DOUBLE_PAIRED.

Flags are leads, not failures — some are legitimately constant
(invariant twins SHOULD emit all-true violation=0 rows; those are
listed in EXPECTED_CONSTANT). Exit code is 0 unless an UNEXPECTED
0-row output appears.

Usage: python scripts/audit_discrimination.py [SF_DIR]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

#: invariant/violation-counter twins: constant columns are the point
#: (they assert "zero violations"), so constancy is not a finding.
EXPECTED_CONSTANT_SUFFIXES = ("_inv",)

#: adjudicated structural constants (round-9 audit) — constant BY
#: CONSTRUCTION, not vacuous; kept visible here so re-audits diff
#: against a reviewed list instead of re-flagging them.
ADJUDICATED = {
    ("doc_gopher_filter", "flag_symbol_ratio"),  # corpus has no '#'/ellipsis
    ("doc_gopher_filter", "flag_alpha_ratio"),   # tokens are pure a-z
    ("doc_source_profile", "n_docs"),            # uniform 20x25 corpus
    ("doc_dedup_rate", "n_docs"),                # same corpus shape
    ("ec_stateful_heavy", "degree"),             # alert fires AT threshold
    ("gen_complete_edges", "value"),             # unit-weight generator
    ("gen_grid_edges", "value"),
    ("gen_star_edges", "value"),
    ("gen_star_edges", "dst"),                   # star center is vertex 0
    ("gen_ktruss_complete", "support"),          # K20: all supports equal
    ("gen_msf_complete", "src"),                 # min-id MSF of K_n roots at 0
    ("emb_lsh_topk", "cos"),   # planted one-hot clusters: in-cluster
    ("emb_ivf_topk", "cos"),   # cosine is EXACTLY 1.0 by construction
    ("emb_near_dup_lsh", "cos"),  # same planted construction
}


#: DECIMAL oracle columns adjudicated as safe: the paired Spark column
#: is a double (verified against queries() schemas at sf0.01, round 12),
#: so the driver's pandas canonicalization renders BOTH sides float64
#: and the hash compares like-for-like (all five have green driver
#: history).  Any DECIMAL column NOT listed here is a failure.
DECIMAL_DOUBLE_PAIRED = {
    ("doc_domain_quality", "score"),
    ("doc_quality", "score"),
    ("doc_quantile_sketch_inv", "q"),
    ("gen_betweenness_star", "betweenness"),
    ("gen_harmonic_star", "harmonic"),
}


def dtype_sweep(con, oracles):
    """DESCRIBE every oracle; return (hugeint, unpaired_decimal,
    describe_errors) lists.

    A failed DESCRIBE (missing view, SQL drift) is returned in the
    third list instead of silently skipped (r12 ADVICE: an oracle the
    sweep never inspected must not count as dtype-clean)."""
    hugeint, decimal, errors = [], [], []
    for name, sql in sorted(oracles.items()):
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as exc:  # noqa: BLE001
            errors.append((name, str(exc)[:120]))
            continue
        for col, typ, *_ in desc:
            t = typ.upper()
            if "HUGEINT" in t:
                hugeint.append((name, col, typ))
            elif "DECIMAL" in t and (name, col) not in DECIMAL_DOUBLE_PAIRED:
                decimal.append((name, col, typ))
    return hugeint, decimal, errors


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    import __spark_entry__ as entry_mod

    oracles = entry_mod.oracle_sql()
    zero_rows, flags, errors = [], [], []
    for name, sql in sorted(oracles.items()):
        try:
            res = con.execute(sql)
            cols = [d[0] for d in res.description]
            rows = res.fetchall()
        except Exception as exc:  # noqa: BLE001
            errors.append((name, str(exc)[:120]))
            continue
        n = len(rows)
        if n == 0:
            zero_rows.append(name)
            continue
        if name.endswith(EXPECTED_CONSTANT_SUFFIXES) or n < 10:
            continue
        for i, c in enumerate(cols):
            if (name, c) in ADJUDICATED:
                continue
            distinct = {r[i] for r in rows}
            if len(distinct) == 1:
                val = next(iter(distinct))
                if isinstance(val, bool) or (n >= 20):
                    flags.append((name, c, n, repr(val)))
    hugeint, decimal, desc_errors = dtype_sweep(con, oracles)
    print(f"# audited {len(oracles)} oracles at {sf_dir}")
    print(f"# zero-row outputs: {zero_rows or 'none'}")
    for name, col, n, val in flags:
        print(f"CONSTANT {name}.{col} = {val} over {n} rows")
    for name, col, typ in hugeint:
        print(f"DTYPE-HUGEINT {name}.{col} ({typ}) — CAST to BIGINT in the oracle")
    for name, col, typ in decimal:
        print(f"DTYPE-DECIMAL {name}.{col} ({typ}) — unadjudicated; pair with a "
              f"Spark double and add to DECIMAL_DOUBLE_PAIRED, or CAST")
    for name, err in errors:
        print(f"ERROR {name}: {err}")
    for name, err in desc_errors:
        if name not in {n for n, _ in errors}:
            print(f"DESCRIBE-ERROR {name}: {err}")
    print(f"# {len(flags)} constant-column leads, {len(hugeint)} HUGEINT, "
          f"{len(decimal)} unadjudicated DECIMAL, {len(errors)} errors, "
          f"{len(desc_errors)} describe-errors")
    # an oracle that errors (run or DESCRIBE) was never inspected —
    # fail the gate rather than count it clean (r12 ADVICE)
    return 1 if zero_rows or hugeint or decimal or errors or desc_errors else 0


if __name__ == "__main__":
    sys.exit(main())
