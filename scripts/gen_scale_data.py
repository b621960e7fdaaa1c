"""True larger-SF synthetic data generator for scaling probes.

The driver testdata stops at sf0.1; round-7's scaling probe replicated
sf0.1 5x, which kept runtimes honest but corrupted OUTPUT-SIZE semantics
(replicated docs are exact duplicates, so minhash candidates exploded
256 -> 55,904). This generator reproduces the driver generator's
measured distributions (TESTDATA.md shapes, seed 42) at an arbitrary SF
so dedup-tier outputs scale under the true generative process:

- lineitem: 600k rows at sf0.1 scaling linearly; uniform (suppkey,
  partkey) over 1k suppliers / 20k parts at sf0.1, qty uniform 1..50.
- events: 100k rows at sf0.1 over a 30-day span (exponential
  inter-arrivals), 1.5k users at sf0.1 uniform => ~67 events/user
  chains (the event-chain graph keeps its per-user shape as SF grows,
  matching the driver data).
- documents: 5k docs at sf0.1, uniform 10..100 tokens drawn from a
  seeded ZIPFIAN 10k-word vocabulary (Zipf-Mandelbrot, s=1.07, q=2.7 —
  the published web-text shape), 20 sources. The r8 generator used the
  driver's 31-word vocabulary, which made jaccard>=0.05 candidate-pair
  counts quadratic in corpus size (DuckDB-measured 285 -> 28,857 at
  sf0.5 -> sf1.0) and drowned the dedup-tier probe in a corpus
  artifact; with a realistic vocabulary, random doc pairs share almost
  no shingles and candidates come only from the planted near-dup
  fraction below, so candidate counts scale LINEARLY and the probe
  reads the PLAN.
- near-dups: 8% of documents are perturbed copies of an earlier doc
  (10% of token positions resampled) — the controlled duplicate
  structure every real crawl has; LSH candidates are ~these pairs.
- embeddings: 2k vectors at sf0.1, 64-dim, 10 Gaussian clusters.
- customer/nation/region/supplier/part/orders at driver ratios.

Usage: python scripts/gen_scale_data.py [SF] [OUT_DIR]
       (default: 0.5 .scratch/sf0.5)

NOT byte-compatible with the driver parquet (different RNG) — use ONLY
for scaling probes, never for oracle parity.
"""

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

#: Zipf-Mandelbrot token distribution over a 10k-word vocabulary —
#: p(rank) ∝ 1/(rank+q)^s with the classic web-text parameters.
VOCAB_SIZE = 10_000
ZIPF_S = 1.07
ZIPF_Q = 2.7
#: fraction of documents that are perturbed copies of an earlier doc
NEAR_DUP_FRAC = 0.08
#: fraction of token positions resampled in each near-dup copy
MUTATE_FRAC = 0.10

LANGS = ["en", "zh", "de", "es", "fr"]
LANG_W = [0.44, 0.15, 0.14, 0.145, 0.125]


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.5
    out = sys.argv[2] if len(sys.argv) > 2 else f".scratch/sf{sf}"
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)
    k = sf / 0.1  # sizes are expressed relative to the measured sf0.1

    def write(name, table):
        # 100k-row row groups so scans SPLIT at larger SFs (parquet
        # parallelism is row-group-granular; one giant group = one task
        # no matter the cluster size — the layout a production writer
        # would never ship)
        pq.write_table(table, f"{out}/{name}.parquet",
                       row_group_size=100_000)
        print(f"{name}: {table.num_rows} rows")

    # region / nation (fixed TPC-H dimensions)
    write("region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": [f"region{i}" for i in range(5)],
    }))
    nat_region = rng.integers(0, 5, 25)
    write("nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"nation{i}" for i in range(25)],
        "n_regionkey": pa.array(nat_region, pa.int32()),
    }))

    n_cust = int(15_000 * k)
    write("customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"cust{i}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-999, 9999, n_cust), 2),
        "c_mktsegment": np.array(["AUTOMOBILE", "BUILDING", "FURNITURE",
                                  "HOUSEHOLD", "MACHINERY"])[
            rng.integers(0, 5, n_cust)],
    }))

    n_supp = int(1_000 * k)
    write("supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"supp{i}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-999, 9999, n_supp), 2),
    }))

    n_part = int(20_000 * k)
    write("part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": [f"part{i}" for i in range(n_part)],
        "p_brand": np.array([f"Brand#{i}" for i in range(25)])[
            rng.integers(0, 25, n_part)],
        "p_type": np.array([f"type{i}" for i in range(30)])[
            rng.integers(0, 30, n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900, 2000, n_part), 2),
    }))

    n_ord = int(150_000 * k)
    base_day = np.datetime64("1999-01-01")
    write("orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": np.array(["F", "O", "P"])[rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1000, 400000, n_ord), 2),
        "o_orderdate": pa.array(
            base_day + rng.integers(0, 2400, n_ord).astype("timedelta64[D]"),
            pa.timestamp("us")),
        "o_orderpriority": np.array([f"{i}-PRIO" for i in range(1, 6)])[
            rng.integers(0, 5, n_ord)],
    }))

    n_li = int(600_000 * k)
    write("lineitem", pa.table({
        "l_orderkey": pa.array(rng.integers(0, n_ord, n_li), pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype("float64"),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": np.round(rng.uniform(0, 0.1, n_li), 2),
        "l_tax": np.round(rng.uniform(0, 0.08, n_li), 2),
        "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)],
        "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, n_li)],
        "l_shipdate": pa.array(
            base_day + rng.integers(0, 2400, n_li).astype("timedelta64[D]"),
            pa.timestamp("us")),
    }))

    # events: exponential inter-arrivals over a 30-day span, sorted ts
    n_ev = int(100_000 * k)
    n_users = int(1_500 * k)
    span_us = 30 * 86400 * 1_000_000
    gaps = rng.exponential(1.0, n_ev)
    ts_us = (np.cumsum(gaps) / gaps.sum() * span_us).astype("int64")
    write("events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": pa.array(
            np.datetime64("2024-01-01") + ts_us.astype("timedelta64[us]"),
            pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
        "event_type": np.array(["view", "click", "purchase", "signup",
                                "error"])[rng.integers(0, 5, n_ev)],
        "value": np.round(rng.exponential(50.0, n_ev), 2),
        "props": [f'{{"k": {v}}}' for v in rng.integers(0, 100, n_ev)],
    }))

    # documents: uniform 10..100 tokens, Zipfian 10k-word vocabulary,
    # plus a planted near-dup fraction (see module docstring)
    n_docs = int(5_000 * k)
    lens = rng.integers(10, 101, n_docs)
    ranks = np.arange(VOCAB_SIZE)
    zipf_p = 1.0 / np.power(ranks + ZIPF_Q, ZIPF_S)
    zipf_p /= zipf_p.sum()
    voc = np.array([f"w{i}" for i in range(VOCAB_SIZE)])
    flat = rng.choice(VOCAB_SIZE, size=int(lens.sum()), p=zipf_p)
    tok_docs = []
    pos = 0
    for ln in lens:
        tok_docs.append(flat[pos:pos + ln])
        pos += ln
    # perturbed copies of earlier docs: realistic duplicate structure
    n_dup = int(n_docs * NEAR_DUP_FRAC)
    dup_ids = rng.choice(np.arange(1, n_docs), size=n_dup, replace=False)
    for i in dup_ids:
        src_toks = tok_docs[int(rng.integers(0, i))].copy()
        n_mut = max(1, int(len(src_toks) * MUTATE_FRAC))
        mut_pos = rng.choice(len(src_toks), size=n_mut, replace=False)
        src_toks[mut_pos] = rng.choice(VOCAB_SIZE, size=n_mut, p=zipf_p)
        tok_docs[i] = src_toks
    texts = [" ".join(voc[t]) for t in tok_docs]
    write("documents", pa.table({
        "doc_id": pa.array(np.arange(n_docs), pa.int64()),
        "text": texts,
        "lang": np.array(LANGS)[rng.choice(len(LANGS), n_docs, p=LANG_W)],
        "source": np.array([f"src{i}" for i in range(20)])[
            rng.integers(0, 20, n_docs)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    # embeddings: 10 Gaussian clusters in 64-d
    n_emb = int(2_000 * k)
    centers = rng.normal(0, 1, (10, 64))
    labels = rng.integers(0, 10, n_emb)
    vecs = (centers[labels] + rng.normal(0, 0.35, (n_emb, 64))).astype(
        "float32")
    write("embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }))


if __name__ == "__main__":
    main()
