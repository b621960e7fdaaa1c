"""Driver contract for the spark-graft builder (PySpark target).

queries() = one entry per implemented operator (SURVEY.md §2 + pipeline
ops); oracle_sql() = the DuckDB twin of each. Graph workloads are derived
from the driver's tables so that every graph result has a closed-form SQL
oracle (see kafka_graphs_spark/datasets.py):

- event-chain graph: per-user chains of events ordered by (ts, event_id) —
  disjoint directed paths, so WCC/BFS/SSSP/PageRank/LP have window-function
  oracles (PageRank's delta recurrence is reproduced bit-exactly by a
  recursive CTE computing the identical float64 operation sequence).
- supplier→part bipartite graph from lineitem — the relational-operator
  workbench (degrees, filters, joins, reductions).
- customer→nation→region hierarchy (has triangles) — clustering coefficient.

FP discipline: values that both engines compute with the same operation
order ship raw (bit-identical); accumulations whose order may differ
(window sums, dot products) are rounded on BOTH sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MAX_LONG = (1 << 63) - 1
INF = float("inf")

# ---------------------------------------------------------------------------
# shared SQL fragments (DuckDB)
# ---------------------------------------------------------------------------

# tokenizer twin of kafka_graphs_spark.pipeline.text.tokens
TOKS = "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')"

# md5-fraction twin of kafka_graphs_spark.pipeline.sample.hash_fraction
HASH_FRAC = "(('0x' || substr(md5((doc_id)::VARCHAR), 1, 8))::BIGINT / 4294967296.0)"
HASH_FRAC_SPLIT = (
    "(('0x' || substr(md5((doc_id)::VARCHAR || 'split'), 1, 8))::BIGINT / 4294967296.0)"
)

# PII regexes — single source of truth is pipeline.text.PII_PATTERNS
# (lookaround-free, so the Java and RE2 dialects agree verbatim)
from kafka_graphs_spark.pipeline.text import PII_PATTERNS as _PII

PII_EMAIL, PII_IPV4, PII_PHONE, PII_SSN = (
    _PII["email"], _PII["ipv4"], _PII["phone"], _PII["ssn"],
)

# deterministic doc-keyed PII payload (twin of _pii_augmented below):
# each kind on its own doc_id residue so every regex sees hits AND misses
PII_AUG = (
    "text"
    " || CASE WHEN doc_id % 2 = 0 THEN ' contact user' || (doc_id)::VARCHAR"
    "         || '@' || source || '.com' ELSE '' END"
    " || CASE WHEN doc_id % 3 = 0 THEN ' ip 10.0.' || (doc_id % 256)::VARCHAR"
    "         || '.' || (doc_id % 7)::VARCHAR ELSE '' END"
    " || CASE WHEN doc_id % 4 = 0 THEN ' call +1 (202) 555-0'"
    "         || lpad((doc_id % 1000)::VARCHAR, 3, '0') ELSE '' END"
    " || CASE WHEN doc_id % 5 = 0 THEN ' ssn 123-45-6789' ELSE '' END"
)

# planted exact duplicates (twin of _docs_with_exact_dups below)
_DUP_DOCS = """
  SELECT doc_id, text, source FROM documents
  UNION ALL
  SELECT doc_id + 100000, text, source FROM documents WHERE doc_id < 35
"""

SP_EDGES = """
  SELECT l_suppkey AS src, l_partkey + 1000000 AS dst, SUM(l_quantity) AS value
  FROM lineitem GROUP BY 1, 2
"""

SP_VERTICES = "SELECT DISTINCT id FROM (SELECT src AS id FROM e UNION SELECT dst FROM e)"

HIER_UND = """
  WITH e0 AS (
      SELECT CAST(c_custkey AS BIGINT) AS src,
             CAST(c_nationkey + 2000000 AS BIGINT) AS dst FROM customer
      UNION ALL
      SELECT CAST(n_nationkey + 2000000 AS BIGINT),
             CAST(n_regionkey + 3000000 AS BIGINT) FROM nation
      UNION ALL
      SELECT CAST(c_custkey AS BIGINT), CAST(n_regionkey + 3000000 AS BIGINT)
      FROM customer JOIN nation ON c_nationkey = n_nationkey
  ),
  und AS (SELECT DISTINCT src, dst
          FROM (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0)),
  deg AS (SELECT src, count(*) AS d FROM und GROUP BY 1)
"""

# directed hierarchy edges — twin of datasets.hierarchy_edges
_HIER_E0 = """
  SELECT CAST(c_custkey AS BIGINT) AS src,
         CAST(c_nationkey + 2000000 AS BIGINT) AS dst FROM customer
  UNION ALL
  SELECT CAST(n_nationkey + 2000000 AS BIGINT),
         CAST(n_regionkey + 3000000 AS BIGINT) FROM nation
  UNION ALL
  SELECT CAST(c_custkey AS BIGINT), CAST(n_regionkey + 3000000 AS BIGINT)
  FROM customer JOIN nation ON c_nationkey = n_nationkey
"""

EC_POS = """
  SELECT event_id, user_id, abs(value) AS w,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS rn
  FROM events
"""

SHINGLES = f"""
  WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents)
  SELECT DISTINCT doc_id,
         unnest(CASE WHEN len(toks) >= 3
                THEN list_transform(range(0, len(toks) - 2),
                                    i -> array_to_string(toks[i+1:i+3], ' '))
                ELSE CAST([] AS VARCHAR[]) END) AS shingle
  FROM t
"""

# shared by hier_lcc (relational) and hier_lcc_pregel (protocol twin)
HIER_LCC_SQL = """
    WITH e AS (
        SELECT CAST(c_custkey AS BIGINT) AS src,
               CAST(c_nationkey + 2000000 AS BIGINT) AS dst FROM customer
        UNION ALL
        SELECT CAST(n_nationkey + 2000000 AS BIGINT),
               CAST(n_regionkey + 3000000 AS BIGINT) FROM nation
        UNION ALL
        SELECT CAST(c_custkey AS BIGINT), CAST(n_regionkey + 3000000 AS BIGINT)
        FROM customer JOIN nation ON c_nationkey = n_nationkey
    ),
    nb AS (SELECT DISTINCT v, u FROM (
        SELECT src AS v, dst AS u FROM e
        UNION ALL SELECT dst AS v, src AS u FROM e WHERE src <> dst)),
    deg AS (SELECT v, count(*) AS d FROM nb GROUP BY 1),
    m AS (SELECT a.v, count(*) AS matches
          FROM nb a JOIN e ON a.u = e.src JOIN nb b ON b.v = a.v AND b.u = e.dst
          GROUP BY 1),
    vts AS (SELECT DISTINCT id FROM (SELECT src AS id FROM e UNION SELECT dst FROM e))
    SELECT vts.id,
           CASE WHEN coalesce(deg.d, 0) >= 2
                THEN CAST(coalesce(m.matches, 0) AS DOUBLE) / (deg.d * (deg.d - 1))
                ELSE 0.0 END AS value
    FROM vts LEFT JOIN deg ON vts.id = deg.v LEFT JOIN m ON vts.id = m.v
"""

STOP_EN = "['the','a','and','of','to','in','is','it','that','for','on','as','with']"
STOP_DE = "['der','die','das','und','ist','von','zu','mit','den','im','ein','eine']"
STOP_FR = "['le','la','les','et','des','un','une','est','dans','pour','sur','que']"
STOP_ES = "['el','los','las','y','que','en','un','una','es','por','con','para']"


# ---------------------------------------------------------------------------
# graph builders (lazy imports keep the module importable without the pkg)
# ---------------------------------------------------------------------------

def _sp_graph(spark, sf_dir):
    from kafka_graphs_spark import datasets

    return datasets.supplier_part_graph(spark, sf_dir)


def _ec_graph(spark, sf_dir):
    from kafka_graphs_spark import datasets

    return datasets.event_chain_graph(spark, sf_dir)


def _ec_temporal(spark, sf_dir):
    """(vertices, edges) for the temporal event-chain graph: consecutive
    per-user events symmetrized, edge time = the LATER event's
    epoch-micros (ts is long ns under nanosAsLong -> div 1000 floors to
    the same micros DuckDB's epoch_us yields; NTZ reads assemble the
    exact tz-free epoch-us)."""
    from pyspark.sql import Window
    from kafka_graphs_spark import datasets

    ev = datasets.load(spark, sf_dir, "events")
    if dict(ev.dtypes)["ts"] == "bigint":  # TIMESTAMP(NANOS) read as ns
        tu = F.expr("ts div 1000")
    else:  # TIMESTAMP_NTZ (micros): exact tz-free epoch-us assembly
        tu = (
            F.datediff(
                F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
            ).cast("long") * F.lit(86400000000)
            + (F.hour("ts") * 3600 + F.minute("ts") * 60 + F.second("ts"))
            .cast("long") * F.lit(1000000)
            + F.date_format("ts", "SSSSSS").cast("long")
        )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pos = ev.select(
        "event_id",
        F.lag("event_id").over(w).alias("prev_id"),
        tu.alias("tu"),
    ).filter(F.col("prev_id").isNotNull())
    ed = pos.select(
        F.col("prev_id").alias("src"),
        F.col("event_id").alias("dst"),
        F.col("tu").alias("value"),
    )
    sym = ed.unionByName(
        ed.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "value")
    )
    vertices = ev.select(F.col("event_id").alias("id"), F.lit(0).alias("value"))
    return vertices, sym


def _doc_urls(spark, sf_dir):
    """documents + a deterministic synthetic ``url`` column (the corpus
    has no URL column, so the domain-curation tier synthesizes one the
    same way in BOTH engines): scheme (sometimes with userinfo),
    subdomain depth 0-2, five site names, six TLDs (two multi-label
    public suffixes), an occasional port, and a source/doc_id path —
    30 registered domains exercising every branch of
    pipeline.domains.registered_domain."""
    from kafka_graphs_spark import datasets

    d = F.col("doc_id")
    docs = datasets.load(spark, sf_dir, "documents")
    # d % 7 == 3 rows drop the scheme entirely (www.example.com/x —
    # the real-crawl shape domains.host_of must fall back on)
    scheme = (
        F.when(d % 7 == 3, F.lit(""))
        .when(d % 11 == 0, F.lit("https://user:pw@"))
        .otherwise(F.lit("https://"))
    )
    sub = (
        F.when(d % 4 == 1, F.lit("www."))
        .when(d % 4 == 2, F.lit("cdn.assets."))
        .when(d % 4 == 3, F.lit("a."))
        .otherwise(F.lit(""))
    )
    name = (
        F.when(d % 5 == 0, F.lit("example"))
        .when(d % 5 == 1, F.lit("news"))
        .when(d % 5 == 2, F.lit("blog"))
        .when(d % 5 == 3, F.lit("shop"))
        .otherwise(F.lit("data"))
    )
    tld = (
        F.when(d % 6 == 0, F.lit(".com"))
        .when(d % 6 == 1, F.lit(".org"))
        .when(d % 6 == 2, F.lit(".net"))
        .when(d % 6 == 3, F.lit(".io"))
        .when(d % 6 == 4, F.lit(".co.uk"))
        .otherwise(F.lit(".com.au"))
    )
    port = F.when(d % 13 == 0, F.lit(":8443")).otherwise(F.lit(""))
    url = F.concat(
        scheme, sub, name, tld, port,
        F.lit("/"), F.col("source"), F.lit("/"), d.cast("string"),
    )
    return docs.withColumn("url", url)


def _doc_urls_messy(spark, sf_dir):
    """documents + a deterministic MESSY ``url`` column for the
    URL-canonicalization tier: ~2.5 documents share each page identity
    (doc_id % 200 at sf0.01), wrapped in scheme/www/path-form/tracking-
    param/fragment variation that all collapses to ONE canonical URL
    per (page, has-query) group — so url_dedup genuinely binds."""
    from kafka_graphs_spark import datasets

    d = F.col("doc_id")
    p = d % 200
    docs = datasets.load(spark, sf_dir, "documents")
    name = (
        F.when(p % 5 == 0, F.lit("example"))
        .when(p % 5 == 1, F.lit("news"))
        .when(p % 5 == 2, F.lit("blog"))
        .when(p % 5 == 3, F.lit("shop"))
        .otherwise(F.lit("data"))
    )
    tld = (
        F.when(p % 6 == 0, F.lit(".com"))
        .when(p % 6 == 1, F.lit(".org"))
        .when(p % 6 == 2, F.lit(".net"))
        .when(p % 6 == 3, F.lit(".io"))
        .when(p % 6 == 4, F.lit(".co.uk"))
        .otherwise(F.lit(".com.au"))
    )
    scheme = (
        F.when(d % 3 == 0, F.lit("https://"))
        .when(d % 3 == 1, F.lit("http://"))
        .otherwise(F.lit(""))  # scheme-less mirror form
    )
    www = F.when(d % 2 == 0, F.lit("www.")).otherwise(F.lit(""))
    ps = p.cast("string")
    path = (
        F.when(d % 4 == 0, F.concat(F.lit("/art/"), ps))
        .when(d % 4 == 1, F.concat(F.lit("/art/"), ps, F.lit("/index.html")))
        .when(d % 4 == 2, F.concat(F.lit("/art//"), ps))
        .otherwise(F.concat(F.lit("/art/"), ps, F.lit("/")))
    )
    query = (
        F.when(d % 5 == 0, F.concat(F.lit("?id="), ps, F.lit("&q=2")))
        .when(d % 5 == 1, F.concat(F.lit("?q=2&id="), ps))
        .when(d % 5 == 2, F.concat(F.lit("?utm_source=feed&id="), ps, F.lit("&q=2")))
        .when(d % 5 == 3, F.concat(F.lit("?id="), ps, F.lit("&fbclid=abc&q=2")))
        .otherwise(F.lit(""))
    )
    frag = F.when(d % 7 == 0, F.lit("#sec")).otherwise(F.lit(""))
    url = F.concat(scheme, www, name, tld, path, query, frag)
    return docs.withColumn("url", url)


#: SQL twins of _doc_urls_messy: the url construction, and the CLOSED-
#: FORM canonical key (derived independently from doc_id arithmetic, not
#: by mirroring the canonicalizer — a stronger oracle)
_MESSY_URL_CTES = """
    b AS (SELECT doc_id, doc_id % 200 AS p FROM documents),
    c AS (SELECT doc_id, p,
            (CASE p % 5 WHEN 0 THEN 'example' WHEN 1 THEN 'news'
                 WHEN 2 THEN 'blog' WHEN 3 THEN 'shop' ELSE 'data' END
             || CASE p % 6 WHEN 0 THEN '.com' WHEN 1 THEN '.org'
                 WHEN 2 THEN '.net' WHEN 3 THEN '.io'
                 WHEN 4 THEN '.co.uk' ELSE '.com.au' END) AS bh
          FROM b),
    u AS (SELECT doc_id, p,
            (CASE doc_id % 3 WHEN 0 THEN 'https://'
                 WHEN 1 THEN 'http://' ELSE '' END
             || CASE WHEN doc_id % 2 = 0 THEN 'www.' ELSE '' END
             || bh
             || CASE doc_id % 4
                    WHEN 0 THEN '/art/' || p
                    WHEN 1 THEN '/art/' || p || '/index.html'
                    WHEN 2 THEN '/art//' || p
                    ELSE '/art/' || p || '/' END
             || CASE doc_id % 5
                    WHEN 0 THEN '?id=' || p || '&q=2'
                    WHEN 1 THEN '?q=2&id=' || p
                    WHEN 2 THEN '?utm_source=feed&id=' || p || '&q=2'
                    WHEN 3 THEN '?id=' || p || '&fbclid=abc&q=2'
                    ELSE '' END
             || CASE WHEN doc_id % 7 = 0 THEN '#sec' ELSE '' END) AS url,
            (bh || '/art/' || p
             || CASE WHEN doc_id % 5 <> 4
                     THEN '?id=' || p || '&q=2' ELSE '' END) AS canon
          FROM c)"""


#: SQL twin of _doc_urls' url expression (shared by the domain oracles)
_URL_SQL = """(
    CASE WHEN doc_id % 7 = 3 THEN ''
         WHEN doc_id % 11 = 0 THEN 'https://user:pw@'
         ELSE 'https://' END
    || CASE WHEN doc_id % 4 = 1 THEN 'www.'
            WHEN doc_id % 4 = 2 THEN 'cdn.assets.'
            WHEN doc_id % 4 = 3 THEN 'a.' ELSE '' END
    || CASE doc_id % 5 WHEN 0 THEN 'example' WHEN 1 THEN 'news'
            WHEN 2 THEN 'blog' WHEN 3 THEN 'shop' ELSE 'data' END
    || CASE doc_id % 6 WHEN 0 THEN '.com' WHEN 1 THEN '.org'
            WHEN 2 THEN '.net' WHEN 3 THEN '.io'
            WHEN 4 THEN '.co.uk' ELSE '.com.au' END
    || CASE WHEN doc_id % 13 = 0 THEN ':8443' ELSE '' END
    || '/' || source || '/' || doc_id
)"""


# ---------------------------------------------------------------------------
# entry: flagship query
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: 5-iteration delta PageRank over the event-chain graph."""
    from kafka_graphs_spark.library import pagerank

    g = _ec_graph(spark, "/root/testdata/sf0.001")
    return pagerank(g, max_iterations=5).select("id", "value")


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from kafka_graphs_spark import EdgeDirection, datasets
    from kafka_graphs_spark.library import (
        bfs,
        connected_components,
        label_propagation,
        local_clustering_coefficient,
        mssp,
        pagerank,
        sssp,
    )
    from kafka_graphs_spark.pipeline import dedup, multimodal, sample, similarity, text

    # ---- graph transformation algebra (supplier→part graph) ----

    def sp_out_degrees(spark, sf):
        return _sp_graph(spark, sf).out_degrees()

    def sp_in_degrees(spark, sf):
        return _sp_graph(spark, sf).in_degrees()

    def sp_subgraph_edges(spark, sf):
        g = _sp_graph(spark, sf).subgraph(F.col("value") % 2 == 0, F.col("value") > 25)
        return g.edges.select("src", "dst", "value")

    def sp_filter_edges(spark, sf):
        return _sp_graph(spark, sf).filter_on_edges(F.col("value") > 40).edges.select(
            "src", "dst", "value"
        )

    def sp_undirected_edges(spark, sf):
        return _sp_graph(spark, sf).undirected().edges.select("src", "dst", "value")

    def sp_join_vertices(spark, sf):
        g = _sp_graph(spark, sf)
        return g.join_with_vertices(g.out_degrees(), lambda old, new: old + new).vertices

    def sp_reduce_edges_min_in(spark, sf):
        return _sp_graph(spark, sf).reduce_on_edges("min", EdgeDirection.IN)

    def sp_reduce_neighbors_sum_out(spark, sf):
        return _sp_graph(spark, sf).reduce_on_neighbors("sum", EdgeDirection.OUT)

    def sp_group_reduce_max_out(spark, sf):
        # groupReduceOnEdges: arbitrary fn over (vertex value, edge array)
        return _sp_graph(spark, sf).group_reduce_on_edges(
            lambda v, edges: F.when(
                edges.isNotNull(),
                F.aggregate(
                    edges, F.lit(None).cast("double"),
                    lambda acc, e: F.greatest(F.coalesce(acc, e["value"]), e["value"]),
                ),
            ),
            EdgeDirection.OUT,
        )

    def sp_map_vertices(spark, sf):
        return _sp_graph(spark, sf).map_vertices(
            lambda _id, v: v * 2 + 1
        ).vertices

    def sp_map_edges(spark, sf):
        g = _sp_graph(spark, sf).map_edges(
            lambda s, _d, v: v / 2.0 + (s % 10)
        )
        return g.edges.select("src", "dst", F.round("value", 6).alias("value"))

    def sp_join_edges_src(spark, sf):
        g = _sp_graph(spark, sf)
        out = g.join_with_edges_on_source(g.out_degrees(), lambda old, new: old + new)
        return out.edges.select("src", "dst", "value")

    def sp_join_edges_tgt(spark, sf):
        g = _sp_graph(spark, sf)
        out = g.join_with_edges_on_target(g.in_degrees(), lambda old, new: old + new)
        return out.edges.select("src", "dst", "value")

    def sp_join_edges(spark, sf):
        g = _sp_graph(spark, sf)
        t = g.edges.select("src", "dst", (F.col("src") + F.col("dst")).alias("value"))
        out = g.join_with_edges(t, lambda old, new: old - new)
        return out.edges.select("src", "dst", "value")

    def sp_group_reduce_nbrs(spark, sf):
        # groupReduceOnNeighbors: arbitrary fn over (value, [(edge, nvalue)])
        return _sp_graph(spark, sf).group_reduce_on_neighbors(
            lambda v, nbrs: F.when(
                nbrs.isNotNull(),
                v + F.aggregate(nbrs, F.lit(0).cast("long"), lambda a, x: a + x["nvalue"]),
            ).otherwise(v),
            EdgeDirection.OUT,
        )

    def sp_katz(spark, sf):
        # truncated Katz: dyadic alpha ⇒ exact dyadic sums, bit-exact twin
        from kafka_graphs_spark.library import katz_centrality

        return katz_centrality(_sp_graph(spark, sf), alpha=0.125, iterations=3)

    def sp_hits(spark, sf):
        # HITS with exact integer path-count semantics (unit hubs,
        # unweighted edges) — bit-exact chained-CTE oracle
        from kafka_graphs_spark.library import hits

        return hits(_sp_graph(spark, sf), iterations=3)

    def gen_betweenness_star(spark, sf):
        # exact Brandes from all sources on the 50-star: hub carries
        # every leaf pair, C(49,2) = 1176; closed-form twin
        from kafka_graphs_spark.library import betweenness_centrality
        from kafka_graphs_spark.sources import star_graph

        return betweenness_centrality(star_graph(spark, 50))

    def gen_betweenness_path(spark, sf):
        # P12 (grid 1×12): bc(i) = i·(11−i) — exercises the multi-level
        # backward accumulation (11 dependency levels)
        from kafka_graphs_spark.library import betweenness_centrality
        from kafka_graphs_spark.sources import grid_graph

        return betweenness_centrality(grid_graph(spark, 1, 12))

    def gen_closeness_star(spark, sf):
        # hub: 49 others at distance 1 → 1.0; leaf: 49/(1 + 2·48)
        from kafka_graphs_spark.library import closeness_centrality
        from kafka_graphs_spark.sources import star_graph

        return closeness_centrality(star_graph(spark, 50))

    # ---- graph generators (closed-form SQL twins) ----

    def gen_complete_edges(spark, sf):
        from kafka_graphs_spark.sources import complete_graph

        return complete_graph(spark, 50).edges.select("src", "dst", "value")

    def gen_grid_edges(spark, sf):
        from kafka_graphs_spark.sources import grid_graph

        return grid_graph(spark, 20, 30).edges.select("src", "dst", "value")

    def gen_star_edges(spark, sf):
        from kafka_graphs_spark.sources import star_graph

        return star_graph(spark, 100).edges.select("src", "dst", "value")

    # ---- graph algorithms (event-chain graph + hierarchy graph) ----

    def ec_wcc(spark, sf):
        return connected_components(_ec_graph(spark, sf), max_iterations=500)

    def ec_bfs(spark, sf):
        src = datasets.chain_sources(spark, sf, 1)[0]
        return bfs(_ec_graph(spark, sf), src_vertex_id=src, max_iterations=500)

    def ec_sssp(spark, sf):
        src = datasets.chain_sources(spark, sf, 1)[0]
        out = sssp(_ec_graph(spark, sf), src_vertex_id=src, max_iterations=500)
        return out.filter(F.col("value") < INF).select("id", F.round("value", 4).alias("value"))

    def ec_pagerank5(spark, sf):
        return pagerank(_ec_graph(spark, sf), max_iterations=5).select("id", "value")

    def ec_lp10(spark, sf):
        return label_propagation(_ec_graph(spark, sf), max_iterations=10)

    def ec_mssp(spark, sf):
        lms = datasets.chain_sources(spark, sf, 2)
        out = mssp(_ec_graph(spark, sf), landmark_vertex_ids=lms, max_iterations=500)
        return (
            out.select("id", F.explode("value").alias("landmark", "dist"))
            .filter(F.col("dist") < INF)
            .select("id", "landmark", F.round("dist", 4).alias("dist"))
        )

    def ec_pregel_sssp(spark, sf):
        # the GENERIC Pregel runtime (compute fn, combiner, vote-to-halt)
        # driving reference SSSP semantics — oracle-checked against the
        # same chain-distance SQL as the DataFrame-native ec_sssp.
        from kafka_graphs_spark.pregel import pregel

        src = datasets.chain_sources(spark, sf, 1)[0]

        def compute(step, vid, value, messages, out_edges, ctx):
            # SingleSourceShortestPaths.java:30-68
            min_dist = (
                0.0
                if vid == ctx.configs["src"] and step == 0
                else (min(messages) if messages else INF)
            )
            if min_dist < (value if value is not None else INF):
                ctx.set_new_vertex_value(min_dist)
                for e in out_edges:
                    ctx.send_message_to(e["dst"], min_dist + e["value"])
            ctx.vote_to_halt()

        g = _ec_graph(spark, sf).map_vertices(lambda _id, _v: F.lit(INF))
        res = pregel(
            g, compute, vertex_value_type="double", message_type="double",
            combiner="min", max_iterations=500, configs={"src": src},
        )
        return res.vertices.filter(F.col("value") < INF).select(
            "id", F.round("value", 4).alias("value")
        )

    def ec_pregel_wcc(spark, sf):
        # the generic Pregel runtime driving reference HashMin WCC
        # (ConnectedComponents.java:28-62 fixpoint) over the undirected
        # edge set — parity twin of the DataFrame-native ec_wcc, same SQL.
        from kafka_graphs_spark.pregel import pregel

        def compute(step, vid, value, messages, out_edges, ctx):
            cur = value if value is not None else vid
            if step == 0:
                ctx.set_new_vertex_value(vid)
                for e in out_edges:
                    if vid < e["dst"]:
                        ctx.send_message_to(e["dst"], vid)
            else:
                m = min(messages) if messages else cur
                if m < cur:
                    ctx.set_new_vertex_value(m)
                    for e in out_edges:
                        if m < e["dst"]:
                            ctx.send_message_to(e["dst"], m)
            ctx.vote_to_halt()

        g = _ec_graph(spark, sf).undirected().map_vertices(
            lambda id_col, _v: id_col
        )
        res = pregel(
            g, compute, vertex_value_type="long", message_type="long",
            combiner="min", max_iterations=1000,
        )
        return res.vertices.select("id", "value")

    def sp_io_roundtrip(spark, sf):
        # text sink + source roundtrip (verticesToFile / vertex parser):
        # degrees written as `id value` lines, read back, oracle-checked
        # against the same SQL as sp_out_degrees.
        import hashlib
        import tempfile

        from kafka_graphs_spark.sources import read_vertices_text, write_vertices_text

        out = _sp_graph(spark, sf).out_degrees()
        path = (
            f"{tempfile.gettempdir()}/kgs_roundtrip_"
            f"{hashlib.md5(sf.encode()).hexdigest()[:8]}"
        )
        write_vertices_text(out, path)
        return read_vertices_text(spark, path, value_type="long")

    def ec_sybilrank(spark, sf):
        from pyspark.sql.window import Window

        from kafka_graphs_spark.library import sybil_rank

        ev = datasets.load(spark, sf, "events")
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        heads = (
            ev.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(F.col("event_id").alias("id"))
        )
        out = sybil_rank(_ec_graph(spark, sf), trusted=heads)
        # chain tails have deg 0 → NaN/Inf (Java division semantics); the
        # oracle covers the finite rows
        return out.filter(~F.isnan("value") & (F.col("value") < INF)).select(
            "id", F.round("value", 6).alias("value")
        )

    def hier_lcc(spark, sf):
        from kafka_graphs_spark.datasets import hierarchy_graph

        return local_clustering_coefficient(hierarchy_graph(spark, sf))

    def hier_lcc_pregel(spark, sf):
        # the reference's 4-superstep inquiry/reply protocol verbatim on
        # the generic pregel runtime (LocalClusteringCoefficient.java:
        # 34-135) — same oracle as the relational hier_lcc twin.
        from kafka_graphs_spark.datasets import hierarchy_graph
        from kafka_graphs_spark.library import local_clustering_coefficient_pregel

        return local_clustering_coefficient_pregel(hierarchy_graph(spark, sf))

    def sp_sgd_factors(spark, sf):
        # iterative gradient chain — no SQL oracle (rows-only check)
        from kafka_graphs_spark import Graph
        from kafka_graphs_spark.library import sgd

        li = datasets.load(spark, sf, "lineitem")
        ratings = li.groupBy(
            F.col("l_suppkey").alias("src"),
            (F.col("l_partkey") + 1000000).alias("dst"),
        ).agg((F.avg("l_quantity") / 10.0).alias("value"))
        g = Graph.from_edges(ratings, F.lit(0.0))
        return sgd(g, dim=4, iterations=2, seed=11).select(
            "id", F.posexplode("vec").alias("i", "x")
        )

    def hier_semiclusters(spark, sf):
        # overlapping cluster sets, Python scoring — no SQL oracle
        from kafka_graphs_spark.datasets import hierarchy_graph
        from kafka_graphs_spark.library import semi_clustering

        out = semi_clustering(hierarchy_graph(spark, sf), iterations=2, max_clusters=2,
                              cluster_capacity=4)
        return out.select("id", F.size("clusters").alias("n_clusters"))

    def sp_als_factors(spark, sf):
        # iterative numpy least-squares — no SQL oracle (rows-only check)
        from kafka_graphs_spark import Graph
        from kafka_graphs_spark.library import als

        li = datasets.load(spark, sf, "lineitem")
        ratings = li.groupBy(
            F.col("l_suppkey").alias("src"),
            (F.col("l_partkey") + 1000000).alias("dst"),
        ).agg((F.avg("l_quantity") / 10.0).alias("value"))
        g = Graph.from_edges(ratings, F.lit(0.0))
        return als(g, dim=8, iterations=4, seed=11).select(
            "id", F.posexplode("vec").alias("i", "x")
        )

    def emb_kmeans(spark, sf):
        # ORACLE-BACKED since r13: planted one-hot clusters (vec_id % 8)
        # with the 8 one-hot centers pinned in order. Every point's
        # nearest center is its own one-hot (distance 0 vs 2, unique
        # argmin), the center update is the exact mean of identical
        # vectors (movement 0 → converges after one refinement pass), so
        # the assignment is provably cluster = vec_id % 8. Real-corpus
        # refinement stays covered by emb_kmeans_assign (pinned centers
        # + one iteration, closed-form oracle on the raw embeddings).
        from kafka_graphs_spark import Graph
        from kafka_graphs_spark.library import kmeans

        emb = _planted_onehot(datasets.load(spark, sf, "embeddings"))
        v = emb.select(
            F.col("vec_id").alias("id"), F.col("embedding").cast("array<double>").alias("value")
        )
        e = spark.createDataFrame([], "src long, dst long, value double")
        centers = [[1.0 if j == c else 0.0 for j in range(64)] for c in range(8)]
        return kmeans(
            Graph(v, e), k=8, max_iterations=10, initial_centers=centers
        )

    def hier_triangles(spark, sf):
        from kafka_graphs_spark.datasets import hierarchy_edges
        from kafka_graphs_spark.streaming import exact_triangle_count

        return exact_triangle_count(hierarchy_edges(spark, sf))

    def sp_walks(spark, sf):
        # deterministic hash-seeded random walks (DeepWalk corpus
        # generator); the md5 draw has an exact chained-CTE twin
        from kafka_graphs_spark.library import random_walks

        return random_walks(_sp_graph(spark, sf), walk_length=3)

    def ec_temporal_arrival(spark, sf):
        # earliest time-respecting arrival from event 0 over the
        # symmetrized event-chain graph — backward hops need
        # non-increasing times, so the temporal gate binds
        from kafka_graphs_spark import Graph
        from kafka_graphs_spark.library import temporal_earliest_arrival

        vertices, sym = _ec_temporal(spark, sf)
        return temporal_earliest_arrival(Graph(vertices, sym), 0, max_iterations=500)

    def ec_temporal_departure(spark, sf):
        # the dual: latest time-respecting departure toward event 0 with
        # deadline = the global max edge time (the deadline filter is
        # vacuous by construction; the t <= departure(v) gate is what
        # binds on backward-in-time hops)
        from kafka_graphs_spark import Graph
        from kafka_graphs_spark.library import temporal_latest_departure

        vertices, sym = _ec_temporal(spark, sf)
        deadline = sym.agg(F.max("value")).collect()[0][0]
        return temporal_latest_departure(
            Graph(vertices, sym), 0, deadline, max_iterations=500
        )

    def ec_modularity(spark, sf):
        # community-quality score of the WCC partition on the event-chain
        # graph; communities are per-user chains, so the oracle recomputes
        # Q generically from the lag-edges and the per-user min label
        from kafka_graphs_spark.library import modularity

        g = _ec_graph(spark, sf)
        return modularity(g, connected_components(g, max_iterations=500))

    def hier_n2v_walks(spark, sf):
        # node2vec-biased walks on the SYMMETRIZED hierarchy graph: from a
        # nation with a customer predecessor the candidates span all three
        # bias classes (return 1/p, common-neighbor region 1, unrelated
        # customer 1/q). p=4, q=0.25 keep every weight an exact dyadic, so
        # the cumulative-draw twin is bit-exact.
        from kafka_graphs_spark.datasets import hierarchy_graph
        from kafka_graphs_spark.library import node2vec_walks

        return node2vec_walks(
            hierarchy_graph(spark, sf).undirected(), walk_length=2, p=4.0, q=0.25
        )

    def hier_graph_stats(spark, sf):
        # one-row dataset card: sizes, degree stats, triangles,
        # assortativity — every field has a closed-form SQL twin
        from kafka_graphs_spark.datasets import hierarchy_graph
        from kafka_graphs_spark.library import graph_statistics

        return graph_statistics(hierarchy_graph(spark, sf))

    def hier_rich_club(spark, sf):
        # rich-club curve phi(k) at every distinct degree threshold —
        # tail sums over the degree and edge-min histograms, exact twin
        from kafka_graphs_spark.datasets import hierarchy_graph
        from kafka_graphs_spark.library import rich_club

        return rich_club(hierarchy_graph(spark, sf))

    def hier_conductance(spark, sf):
        # per-community conductance of the deterministic id%4 partition
        # (cut / min-side volume) — non-trivial cuts, closed-form twin
        from kafka_graphs_spark.datasets import hierarchy_graph
        from kafka_graphs_spark.library import conductance

        g = hierarchy_graph(spark, sf)
        return conductance(
            g, g.vertices.select("id", (F.col("id") % 4).alias("value"))
        )

    def doc_cap_per_source(spark, sf):
        # deterministic per-source cap (hash-ordered top-10 per source)
        return sample.cap_per_group(
            datasets.load(spark, sf, "documents"), "source", 10, "doc_id"
        ).select("doc_id", "source")

    def hier_ktruss3(spark, sf):
        # 3-truss is provably single-pass (see library.k_truss docstring),
        # so the peeled result has an exact wedge-close SQL twin; the k>=4
        # cascade path is pinned by pytest goldens
        from kafka_graphs_spark import Graph
        from kafka_graphs_spark.datasets import hierarchy_edges
        from kafka_graphs_spark.library import k_truss

        return k_truss(Graph.from_edges(hierarchy_edges(spark, sf), F.lit(0)), k=3)

    def gen_ktruss_complete(spark, sf):
        # closed-form golden: every edge of K20 survives any k <= 20 with
        # support exactly n-2 = 18
        from kafka_graphs_spark.library import k_truss
        from kafka_graphs_spark.sources import complete_graph

        return k_truss(complete_graph(spark, 20), k=5)

    def ec_stream_degrees(spark, sf):
        from kafka_graphs_spark.streaming import EdgeStream

        return EdgeStream(
            datasets.event_chain_edges(spark, sf).withColumn("event_time", F.lit(None).cast("timestamp"))
        ).degrees()

    # ---- stateful-tier driver rows (VERDICT r6 "Next round" #8): run a
    # REAL applyInPandasWithState streaming query (file source, multiple
    # micro-batches, foreachBatch sink) and check the FINAL per-key state
    # against the batch-parity SQL twin. Restart durability stays pytest
    # (tests/test_stateful_streaming.py); these rows prove semantics. ----

    def _run_stateful_stream(spark, df, op, schema_str, out_schema):
        import shutil
        import tempfile

        src = tempfile.mkdtemp(prefix="kgs_stateful_src_")
        ckpt = tempfile.mkdtemp(prefix="kgs_stateful_ckpt_")
        try:
            df.write.mode("overwrite").parquet(src)
            rows: list = []

            def sink(batch_df, _bid):
                rows.extend(batch_df.collect())

            stream = (
                spark.readStream.schema(schema_str)
                .option("maxFilesPerTrigger", 1)  # force several micro-batches
                .parquet(src)
            )
            q = (
                op(stream)
                .writeStream.foreachBatch(sink)
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            # never rmtree under a live query: on timeout, stop it and
            # raise instead of deleting its source/checkpoint dirs
            if not q.awaitTermination(600):
                q.stop()
                raise TimeoutError("stateful stream: query exceeded 600s")
        finally:
            # the collected rows are driver-side; the scratch stream dirs
            # have no further reader
            shutil.rmtree(src, ignore_errors=True)
            shutil.rmtree(ckpt, ignore_errors=True)
        return spark.createDataFrame(rows, out_schema)

    def ec_stateful_degrees(spark, sf):
        # running total degree via per-vertex GroupState; the stream emits
        # an updated (id, degree) row each micro-batch that touches the
        # vertex — degree is monotone, so final state = max per id, which
        # must equal the batch degree count exactly
        from kafka_graphs_spark.streaming.stateful import stateful_degrees

        edges = datasets.event_chain_edges(spark, sf).repartition(4)
        out = _run_stateful_stream(
            spark, edges, stateful_degrees,
            "src long, dst long, value double", "id long, degree long",
        )
        return out.groupBy("id").agg(F.max("degree").alias("degree"))

    def ec_stateful_sessions(spark, sf):
        # streaming twin of pipeline.sessions.session_stats: per-user
        # gap-based sessions with per-user GroupState. Files are
        # partitioned BY USER so each user's history arrives within one
        # micro-batch (in-batch ts sort makes the result order-free);
        # cross-key batching is still real (4 micro-batches). n_events is
        # monotone per (user, session), so final state = argmax struct.
        from kafka_graphs_spark.streaming.stateful import stateful_sessions

        ev = datasets.load(spark, sf, "events").select(
            "event_id", "ts", "user_id", "value"
        ).repartition(4, "user_id")
        out = _run_stateful_stream(
            spark, ev, lambda s: stateful_sessions(s, gap_minutes=30),
            "event_id long, ts timestamp_ntz, user_id long, value double",
            "user_id long, session long, n_events long, "
            "start_us long, end_us long, total_value double",
        )
        final = out.groupBy("user_id", "session").agg(
            F.max(F.struct("n_events", "start_us", "end_us", "total_value")).alias("s")
        )
        return final.select(
            "user_id",
            "session",
            F.col("s.n_events").alias("n_events"),
            F.col("s.start_us").alias("start_us"),
            F.col("s.end_us").alias("end_us"),
            (F.col("s.end_us") - F.col("s.start_us")).alias("duration_us"),
            F.col("s.total_value").alias("total_value"),
        )

    def ec_stateful_heavy(spark, sf):
        # heavy-hitter alerting: emit each vertex ONCE, the micro-batch
        # its running degree first reaches min_degree. Files are
        # partitioned BY USER and chain edges are user-local, so every
        # vertex's full degree is visible within one batch — the crossing
        # degree equals the total degree and the batch twin is exact:
        # vertices with degree >= 2 at their full degree.
        from pyspark.sql.window import Window

        from kafka_graphs_spark.streaming.stateful import stateful_heavy_vertices

        ev = datasets.load(spark, sf, "events")
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        edges = (
            ev.select(
                "user_id", "event_id",
                F.lag("event_id").over(w).alias("prev_id"),
                F.abs(F.col("value")).alias("wv"),
            )
            .filter(F.col("prev_id").isNotNull())
            .repartition(4, "user_id")
            .select(
                F.col("prev_id").alias("src"),
                F.col("event_id").alias("dst"),
                F.col("wv").alias("value"),
            )
        )
        return _run_stateful_stream(
            spark, edges,
            lambda s: stateful_heavy_vertices(s, min_degree=2),
            "src long, dst long, value double", "id long, degree long",
        )

    def ec_session_stream(spark, sf):
        # NATIVE session windows (F.session_window, append mode) under an
        # oracle: a REAL multi-micro-batch file-source run of
        # pipeline.sessions.session_stats_stream. Event time is rebuilt
        # as a tz-free instant (timestamp_micros of the exact naive epoch
        # micros), so the emitted unix_micros session bounds are
        # engine-portable and DST-proof regardless of the session
        # timezone. Append mode only emits a session once the watermark
        # passes its end, so two far-future sentinel files (written with
        # later mtimes -> read last) advance the global watermark and
        # flush every real session: sentinel batch 1 moves the watermark
        # past all real session ends, batch 2 triggers the emission; the
        # sentinel's own session stays in state and never emits. Native
        # windows split at gap >= 30 min (window end is exclusive), which
        # the oracle mirrors exactly.
        import shutil
        import tempfile
        import time as _time

        from kafka_graphs_spark.pipeline.sessions import (
            _micros,
            session_stats_stream,
        )

        gap_us = 30 * 60 * 1_000_000
        ev = datasets.load(spark, sf, "events")
        mic = (
            F.expr("ts div 1000")
            if dict(ev.dtypes)["ts"] == "bigint"
            else _micros(ev, "ts")
        )
        base = ev.select(
            "event_id",
            "user_id",
            F.col("value").cast("double").alias("value"),
            F.timestamp_micros(mic).alias("ts"),
        ).repartition(4, "user_id")
        src = tempfile.mkdtemp(prefix="kgs_sess_src_")
        ckpt = tempfile.mkdtemp(prefix="kgs_sess_ckpt_")
        try:
            base.write.mode("overwrite").parquet(src)
            max_us = base.agg(F.max(F.unix_micros("ts"))).collect()[0][0]
            horizon_us = 3650 * 86400 * 1_000_000
            for k in (1, 2):
                _time.sleep(1.5)  # distinct mtimes: sentinels read last
                spark.createDataFrame(
                    [(-k, -1, 0.0)], "event_id long, user_id long, value double"
                ).withColumn(
                    "ts",
                    F.timestamp_micros(
                        F.lit(max_us + horizon_us + 50 * 86400 * 1_000_000 + k)
                    ),
                ).coalesce(1).write.mode("append").parquet(src)
            rows: list = []

            def sink(batch_df, _bid):
                rows.extend(batch_df.collect())

            stream = (
                spark.readStream.schema(
                    "event_id long, user_id long, value double, ts timestamp"
                )
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            out = session_stats_stream(
                stream, gap_minutes=30, watermark="3650 days"
            ).select(
                "user_id",
                "n_events",
                F.unix_micros("session_start").alias("start_us"),
                # native window end = last event + gap; subtract it back
                (F.unix_micros("session_end") - F.lit(gap_us)).alias("end_us"),
                "total_value",
            )
            q = (
                out.writeStream.foreachBatch(sink)
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            # never rmtree under a live query: on timeout, stop it and
            # raise instead of deleting its source/checkpoint dirs
            if not q.awaitTermination(600):
                q.stop()
                raise TimeoutError("ec_session_stream: query exceeded 600s")
        finally:
            shutil.rmtree(src, ignore_errors=True)
            shutil.rmtree(ckpt, ignore_errors=True)
        return spark.createDataFrame(
            rows,
            "user_id long, n_events long, start_us long, end_us long, "
            "total_value double",
        ).filter(F.col("user_id") >= 0)

    def ec_stream_join(spark, sf):
        # REAL stream-stream interval join (two watermarked file
        # streams, multiple micro-batches each): every purchase joined
        # to the same user's clicks in the preceding 30 minutes — the
        # attribution shape. INNER stream-stream joins emit on match
        # (the watermark only bounds state retention), so with a
        # huge watermark the result is exact and no sentinel flush is
        # needed; event time is rebuilt as a tz-free instant.
        import shutil
        import tempfile

        from kafka_graphs_spark.pipeline.sessions import _micros
        from kafka_graphs_spark.streaming import stream_interval_join

        ev = datasets.load(spark, sf, "events")
        mic = (
            F.expr("ts div 1000")
            if dict(ev.dtypes)["ts"] == "bigint"
            else _micros(ev, "ts")
        )
        base = ev.select(
            "event_id",
            "user_id",
            "event_type",
            F.timestamp_micros(mic).alias("ts"),
        )
        dirs = {}
        try:
            for etype in ("purchase", "click"):
                d = tempfile.mkdtemp(prefix=f"kgs_sj_{etype}_")
                dirs[etype] = d
                base.filter(F.col("event_type") == etype).drop(
                    "event_type"
                ).repartition(3).write.mode("overwrite").parquet(d)
            ckpt = tempfile.mkdtemp(prefix="kgs_sj_ckpt_")
            dirs["ckpt"] = ckpt

            def src(d):
                return (
                    spark.readStream.schema(
                        "event_id long, user_id long, ts timestamp"
                    )
                    .option("maxFilesPerTrigger", 1)
                    .parquet(d)
                )

            joined = stream_interval_join(
                src(dirs["purchase"]).withColumnRenamed("event_id", "purchase_id"),
                src(dirs["click"]).withColumnRenamed("event_id", "click_id"),
                key="user_id",
                lower_seconds=0,
                upper_seconds=1800,
                watermark="3650 days",
            ).select("l.purchase_id", "l.user_id", "r.click_id")
            rows: list = []

            def sink(batch_df, _bid):
                rows.extend(batch_df.collect())

            q = (
                joined.writeStream.foreachBatch(sink)
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            # never rmtree under a live query: on timeout, stop it and
            # raise instead of deleting its source/checkpoint dirs
            if not q.awaitTermination(600):
                q.stop()
                raise TimeoutError("ec_stream_join: query exceeded 600s")
        finally:
            for d in dirs.values():
                shutil.rmtree(d, ignore_errors=True)
        return spark.createDataFrame(
            rows, "purchase_id long, user_id long, click_id long"
        )

    def ec_window_sum(spark, sf):
        # tumbling-window per-vertex edge-weight sum (slice +
        # reduceOnEdges) — the KGraphWindowedStream tier under an oracle.
        from pyspark.sql.window import Window

        from kafka_graphs_spark.streaming import EdgeStream

        ev = datasets.load(spark, sf, "events")
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        edges = (
            ev.select(
                "user_id", "event_id", "ts",
                F.lag("event_id").over(w).alias("prev_id"),
                F.abs(F.col("value")).alias("w"),
            )
            .filter(F.col("prev_id").isNotNull())
            .select(
                F.col("prev_id").alias("src"),
                F.col("event_id").alias("dst"),
                F.col("w").alias("value"),
                # ts is TIMESTAMP_NTZ; tumbling windows over NTZ are
                # epoch-aligned and timezone-free
                F.col("ts").alias("event_time"),
            )
        )
        out = EdgeStream(edges).slice("1 hour").reduce_on_edges("sum")
        # NTZ cannot cast to BIGINT; hour windows are epoch-aligned, so
        # days-since-epoch*86400 + hour*3600 is the exact tz-free epoch
        start = F.col("window.start")
        epoch_start = (
            F.datediff(start.cast("date"), F.lit("1970-01-01").cast("date")).cast("long") * 86400
            + F.hour(start).cast("long") * 3600
        )
        return out.select(
            epoch_start.alias("window_start"),
            "id",
            F.round("value", 6).alias("value"),
        )

    def ec_window_sum_sliding(spark, sf):
        # hopping-window variant (Spark-native extension; the reference is
        # tumbling-only) — every edge lands in exactly duration/slide
        # windows, so the SQL twin enumerates the two 30-min-aligned starts.
        from pyspark.sql.window import Window

        from kafka_graphs_spark.streaming import EdgeStream

        ev = datasets.load(spark, sf, "events")
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        edges = (
            ev.select(
                "user_id", "event_id", "ts",
                F.lag("event_id").over(w).alias("prev_id"),
                F.abs(F.col("value")).alias("w"),
            )
            .filter(F.col("prev_id").isNotNull())
            .select(
                F.col("prev_id").alias("src"),
                F.col("event_id").alias("dst"),
                F.col("w").alias("value"),
                F.col("ts").alias("event_time"),
            )
        )
        out = (
            EdgeStream(edges)
            .slice("1 hour", slide="30 minutes")
            .reduce_on_edges("sum")
        )
        start = F.col("window.start")
        epoch_start = (
            F.datediff(start.cast("date"), F.lit("1970-01-01").cast("date")).cast("long") * 86400
            + F.hour(start).cast("long") * 3600
            + F.minute(start).cast("long") * 60
        )
        return out.select(
            epoch_start.alias("window_start"),
            "id",
            F.round("value", 6).alias("value"),
        )

    def ec_stream_reverse(spark, sf):
        from kafka_graphs_spark.streaming import EdgeStream

        return EdgeStream(datasets.event_chain_edges(spark, sf)).reverse().edges.select(
            "src", "dst", F.round("value", 6).alias("value")
        )

    def ec_stream_undirected(spark, sf):
        from kafka_graphs_spark.streaming import EdgeStream

        return EdgeStream(
            datasets.event_chain_edges(spark, sf)
        ).undirected().edges.select("src", "dst", F.round("value", 6).alias("value"))

    def ec_stream_distinct(spark, sf):
        # duplicate the stream (union with itself), then distinct must
        # recover exactly the original edge set (EdgeStream.java:215-237
        # keeps per-vertex dedup state; dropDuplicates is the same
        # mechanism). Duplicate rows are identical, so the kept value is
        # deterministic.
        from kafka_graphs_spark.streaming import EdgeStream

        e = datasets.event_chain_edges(spark, sf)
        s = EdgeStream(e).union(EdgeStream(e)).distinct()
        return s.edges.select("src", "dst", F.round("value", 6).alias("value"))

    def ec_stream_union(spark, sf):
        # union of two genuinely different streams: event-chain edges +
        # supplier→part edges (EdgeStream.java:345-347); id spaces are
        # disjoint by the dataset offsets.
        from kafka_graphs_spark.streaming import EdgeStream

        ec = EdgeStream(datasets.event_chain_edges(spark, sf))
        sp = EdgeStream(
            datasets.supplier_part_edges(spark, sf).select(
                F.col("src").cast("long").alias("src"),
                F.col("dst").cast("long").alias("dst"),
                F.col("value").cast("double").alias("value"),
            )
        )
        return ec.union(sp).edges.select(
            "src", "dst", F.round("value", 6).alias("value")
        )

    def ec_stream_edge_count(spark, sf):
        # running numberOfEdges (EdgeStream.java:166-183) — batch-parity
        # twin: the running count's final value is the batch count.
        from kafka_graphs_spark.streaming import EdgeStream

        return EdgeStream(datasets.event_chain_edges(spark, sf)).number_of_edges()

    def ec_stream_vertex_count(spark, sf):
        # running numberOfVertices (EdgeStream.java:189-207): distinct
        # endpoints seen so far; final value = batch distinct count.
        from kafka_graphs_spark.streaming import EdgeStream

        return EdgeStream(datasets.event_chain_edges(spark, sf)).number_of_vertices()

    def ec_stream_aggregate(spark, sf):
        # aggregate(edgeMapper, vertexMapper) (EdgeStream.java:359-365):
        # per-vertex sum of outgoing edge weights via the generic hook.
        from kafka_graphs_spark.streaming import EdgeStream

        s = EdgeStream(datasets.event_chain_edges(spark, sf))
        return s.aggregate(
            lambda e: e.select(F.col("src").alias("id"), F.col("value").alias("v")),
            F.round(F.sum("v"), 6).alias("value"),
        )

    def ec_stream_global_aggregate(spark, sf):
        # globalAggregate (EdgeStream.java:377-407): one global row —
        # total edge weight through the generic global hook.
        from kafka_graphs_spark.streaming import EdgeStream

        s = EdgeStream(datasets.event_chain_edges(spark, sf))
        return s.global_aggregate(
            lambda e: e.select(F.col("value").alias("v")),
            F.round(F.sum("v"), 6).alias("total_w"),
        )

    def ec_fold_neighbors(spark, sf):
        # KGraphWindowedStream.foldNeighbors (KGraphWindowedStream.java:
        # 56-74): tumbling-window per-vertex fold over neighborhood edges.
        # The fold is sum-of-squares (order-insensitive up to float
        # rounding; 6-dp rounding per repo precedent for F.sum parity).
        from pyspark.sql.window import Window

        from kafka_graphs_spark.streaming import EdgeStream

        ev = datasets.load(spark, sf, "events")
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        edges = (
            ev.select(
                "user_id", "event_id", "ts",
                F.lag("event_id").over(w).alias("prev_id"),
                F.abs(F.col("value")).alias("w"),
            )
            .filter(F.col("prev_id").isNotNull())
            .select(
                F.col("prev_id").alias("src"),
                F.col("event_id").alias("dst"),
                F.col("w").alias("value"),
                F.col("ts").alias("event_time"),
            )
        )
        out = EdgeStream(edges).slice("1 hour").fold_neighbors(
            F.lit(0.0), lambda acc, e: acc + e["value"] * e["value"]
        )
        start = F.col("window.start")
        epoch_start = (
            F.datediff(start.cast("date"), F.lit("1970-01-01").cast("date")).cast("long") * 86400
            + F.hour(start).cast("long") * 3600
        )
        return out.select(
            epoch_start.alias("window_start"),
            "id",
            F.round("value", 6).alias("value"),
        )

    def ec_window_pagerank(spark, sf):
        # per-tumbling-window PageRank (streaming centrality; one
        # distributed run over struct (window, id) keys). Oracle: within a
        # (user, window) the chain edges are a contiguous run (ts is
        # non-decreasing in rn), so each window's subgraph is a disjoint
        # path and the exact delta recurrence depends only on the
        # position within the window segment — same closed form as
        # ec_pagerank5, keyed by (window, segment position).
        from pyspark.sql.window import Window

        from kafka_graphs_spark.streaming import pagerank_windowed

        ev = datasets.load(spark, sf, "events")
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        edges = (
            ev.select(
                "user_id", "event_id", "ts",
                F.lag("event_id").over(w).alias("prev_id"),
            )
            .filter(F.col("prev_id").isNotNull())
            .select(
                F.col("prev_id").alias("src"),
                F.col("event_id").alias("dst"),
                F.col("ts").alias("event_time"),
            )
        )
        out = pagerank_windowed(edges, "1 hour", max_iterations=5)
        start = F.col("window_start")
        epoch_start = (
            F.datediff(start.cast("date"), F.lit("1970-01-01").cast("date")).cast("long") * 86400
            + F.hour(start).cast("long") * 3600
        )
        return out.select(epoch_start.alias("window_start"), "id", "value")

    def ec_maxbmatching(spark, sf):
        # ORACLE-BACKED since r13 (r12 verdict #5): weights chosen so the
        # greedy ½-approx matching is provably UNIQUE. The event chains
        # are disjoint paths; give the edge ending at chain position p
        # weight 2.0 when p is odd, 1.0 when even. Every vertex's two
        # incident edges are one odd + one even (positions alternate), so
        # each vertex's heaviest available edge is its odd edge — the
        # locally-dominant protocol (MaxBMatching.java:43-201 semantics)
        # includes EXACTLY the odd-position edges, independent of
        # tie-breaks (ties only arise between non-adjacent edges).
        # Closed-form oracle: edges whose dst chain position is odd, in
        # both directions. Protocol semantics unchanged; generic-weight
        # behavior remains covered by ec_maxbmatching_inv.
        from pyspark.sql.window import Window

        from kafka_graphs_spark import Graph
        from kafka_graphs_spark.library import max_b_matching

        ev = datasets.load(spark, sf, "events")
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        pos = ev.select(
            "user_id", "event_id",
            (F.row_number().over(w) - 1).alias("rn"),
            F.lag("event_id").over(w).alias("prev_id"),
        )
        e = pos.filter(F.col("prev_id").isNotNull()).select(
            F.col("prev_id").alias("src"),
            F.col("event_id").alias("dst"),
            F.when(F.col("rn") % 2 == 1, F.lit(2.0)).otherwise(F.lit(1.0)).alias("value"),
        )
        und = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "value")
        )
        g = Graph.from_edges(und, F.lit(1))  # capacity 1 everywhere
        out = max_b_matching(g, max_iterations=12)
        return out.filter(F.col("state") == 3).select("src", "dst")

    def hier_jaccard(spark, sf):
        from kafka_graphs_spark.datasets import hierarchy_graph
        from kafka_graphs_spark.library import jaccard

        out = jaccard(hierarchy_graph(spark, sf).undirected())
        return out.select("src", "dst", F.round("value", 6).alias("value"))

    def hier_adamic_adar(spark, sf):
        from kafka_graphs_spark.datasets import hierarchy_graph
        from kafka_graphs_spark.library import adamic_adar

        out = adamic_adar(hierarchy_graph(spark, sf).undirected())
        return out.select("src", "dst", F.round("value", 6).alias("value"))

    # ---- text analysis (documents) ----

    def doc_token_count(spark, sf):
        docs = datasets.load(spark, sf, "documents")
        return text.token_count(docs)

    def doc_subword_count(spark, sf):
        return text.subword_count(datasets.load(spark, sf, "documents"))

    def doc_language_id(spark, sf):
        return text.language_id(datasets.load(spark, sf, "documents"))

    def doc_quality(spark, sf):
        return text.quality_score(datasets.load(spark, sf, "documents"))

    def doc_fingerprint(spark, sf):
        return text.fingerprint(datasets.load(spark, sf, "documents"))

    def doc_normalize(spark, sf):
        return text.normalize_text(datasets.load(spark, sf, "documents"))

    def doc_vocabulary(spark, sf):
        return text.vocabulary(datasets.load(spark, sf, "documents"), min_count=2)

    def doc_tfidf_keywords(spark, sf):
        out = text.tfidf_keywords(datasets.load(spark, sf, "documents"), k=3)
        return out.select("doc_id", "token", F.round("score", 6).alias("score"), "rank")

    def doc_bigrams(spark, sf):
        return text.bigram_counts(datasets.load(spark, sf, "documents"), min_count=3)

    def doc_chunks(spark, sf):
        # RAG-style fixed-size character windows with overlap
        return text.chunk_text(
            datasets.load(spark, sf, "documents"), size=256, overlap=32
        )

    def doc_repetition(spark, sf):
        # Gopher-style within-doc repetition signals (duplicate n-gram
        # mass + top-bigram fraction); exact-int ratios ⇒ bit-exact twin
        return text.repetition_stats(datasets.load(spark, sf, "documents"))

    # ---- sampling / mixing / packing (documents) ----

    def doc_hash_sample(spark, sf):
        # seeded Bernoulli sample: md5-fraction filter, reproducible
        # across engines/partitionings (df.sample is neither)
        return sample.hash_sample(
            datasets.load(spark, sf, "documents"), "doc_id", 0.5
        ).select("doc_id", "source")

    def doc_split(spark, sf):
        return sample.split_train_eval(
            datasets.load(spark, sf, "documents"), "doc_id", 0.25
        ).select("doc_id", "split")

    def doc_mixture_sample(spark, sf):
        # mixture_rates solves for per-source keep rates hitting a 3:1
        # src0:src1 target mix, then the stratified md5 filter applies;
        # the oracle recomputes the same rate algebra in SQL
        docs = datasets.load(spark, sf, "documents")
        rates = sample.mixture_rates(docs, "source", {"src0": 3.0, "src1": 1.0})
        return sample.stratified_sample(
            docs, "doc_id", "source", rates
        ).select("doc_id", "source")

    def doc_pack_sequences(spark, sf):
        # concat-and-chunk packing of each source shard into 2048-char
        # training sequences (per-group prefix-sum window)
        return sample.pack_sequences(
            datasets.load(spark, sf, "documents"),
            budget=2048,
            length_col="n_chars",
            group_col="source",
        )

    # ---- PII / profiling (documents) ----

    def _pii_augmented(spark, sf):
        # the synthetic corpus has no organic PII, so both sides weave a
        # deterministic doc-keyed payload into the text; the scored row
        # then proves the Java and RE2 regex dialects agree on real
        # hits. Each PII kind is injected on a DIFFERENT doc_id residue
        # (the r9 audit caught the old everywhere-injection: constant
        # n_email/n_ipv4/n_ssn = 1 and n_phone NEVER exercised), so the
        # counts vary 0..4 and all four regexes see both hit and miss.
        d = datasets.load(spark, sf, "documents")
        did = F.col("doc_id")
        email = F.when(
            did % 2 == 0,
            F.concat(
                F.lit(" contact user"), did.cast("string"),
                F.lit("@"), F.col("source"), F.lit(".com"),
            ),
        ).otherwise(F.lit(""))
        ip = F.when(
            did % 3 == 0,
            F.concat(
                F.lit(" ip 10.0."), (did % 256).cast("string"),
                F.lit("."), (did % 7).cast("string"),
            ),
        ).otherwise(F.lit(""))
        phone = F.when(
            did % 4 == 0,
            F.concat(
                F.lit(" call +1 (202) 555-0"),
                F.lpad((did % 1000).cast("string"), 3, "0"),
            ),
        ).otherwise(F.lit(""))
        ssn = F.when(did % 5 == 0, F.lit(" ssn 123-45-6789")).otherwise(
            F.lit("")
        )
        return d.select(
            "doc_id",
            F.concat(F.col("text"), email, ip, phone, ssn).alias("text"),
        )

    def doc_pii_stats(spark, sf):
        return text.pii_stats(_pii_augmented(spark, sf))

    def doc_pii_redact(spark, sf):
        return text.pii_redact(_pii_augmented(spark, sf))

    def doc_source_profile(spark, sf):
        return text.source_profile(datasets.load(spark, sf, "documents"))

    def emb_decontamination(spark, sf):
        # embedding-space eval decontamination: train split (vec_id >= 50)
        # vs benchmark split (vec_id < 50), best match per leaked vector
        emb = datasets.load(spark, sf, "embeddings")
        return similarity.embedding_decontamination(
            emb.filter(F.col("vec_id") >= 50),
            emb.filter(F.col("vec_id") < 50),
            threshold=0.4,
        )

    def doc_sketch_inv(spark, sf):
        # sketch-profile accuracy invariants: per-source HLL vocabulary
        # within 20% of exact distinct, KLL median inside [min, max] and
        # near the exact median, p90 ordered; aggregated to violation
        # counts (0) + the data-derived source count (non-vacuous)
        docs = datasets.load(spark, sf, "documents")
        prof = text.sketch_profile(docs)
        exact_vocab = (
            docs.select("source", F.explode(text.tokens(F.col("text"))).alias("token"))
            .groupBy("source")
            .agg(F.count_distinct("token").alias("vocab"))
        )
        lens = (
            docs.select("source", F.size(text.tokens(F.col("text"))).alias("n"))
            .groupBy("source")
            .agg(
                F.min("n").alias("mn"),
                F.max("n").alias("mx"),
                F.median("n").alias("med"),
            )
        )
        j = prof.join(exact_vocab, on="source").join(lens, on="source")
        return j.agg(
            F.sum(
                (F.abs(F.col("approx_vocab") - F.col("vocab")) > 0.2 * F.col("vocab"))
                .cast("long")
            ).alias("vocab_violations"),
            F.sum(
                (
                    (F.col("approx_median_tokens") < F.col("mn"))
                    | (F.col("approx_median_tokens") > F.col("mx"))
                    | (
                        F.abs(F.col("approx_median_tokens") - F.col("med"))
                        > F.greatest(F.lit(2.0), 0.2 * F.col("med"))
                    )
                ).cast("long")
            ).alias("median_violations"),
            F.sum(
                (
                    (F.col("approx_p90_tokens") < F.col("approx_median_tokens"))
                    | (F.col("approx_p90_tokens") > F.col("mx"))
                ).cast("long")
            ).alias("p90_violations"),
            F.count(F.lit(1)).alias("n_sources"),
        )

    # ---- dedup (documents) ----

    def _docs_with_exact_dups(spark, sf):
        # the synthetic corpus has no byte-identical documents, so the
        # exact-dedup tier never saw n_dups > 1 (round-9 audit). Plant
        # exact copies of docs 0..34 under new ids (source counts vary) (+100000, same text
        # and source) — identical construction in both engines.
        docs = datasets.load(spark, sf, "documents").select(
            "doc_id", "text", "source"
        )
        copies = docs.filter(F.col("doc_id") < 35).select(
            (F.col("doc_id") + 100000).alias("doc_id"), "text", "source"
        )
        return docs.unionByName(copies)

    def dedup_exact(spark, sf):
        return dedup.exact_duplicates(_docs_with_exact_dups(spark, sf))

    def dedup_ngram_jaccard(spark, sf):
        return dedup.ngram_jaccard_pairs(
            datasets.load(spark, sf, "documents"), n=3, threshold=0.05
        )

    def dedup_minhash(spark, sf):
        docs = datasets.load(spark, sf, "documents")
        sh = dedup.minhash_signatures(docs, num_hashes=16, n=3)
        return sh.select(
            "doc_id", F.posexplode("sig").alias("seed", "mh")
        )

    def dedup_minhash_lsh(spark, sf):
        return dedup.minhash_lsh_candidates(
            datasets.load(spark, sf, "documents"), num_hashes=16, bands=4, n=3
        )

    def dedup_simhash(spark, sf):
        return dedup.simhash(datasets.load(spark, sf, "documents"), bits=16)

    def doc_contamination(spark, sf):
        # eval-decontamination: 3-gram overlap of the training split
        # (doc_id >= 50) against the benchmark split (doc_id < 50)
        docs = datasets.load(spark, sf, "documents")
        return dedup.ngram_contamination(
            docs.filter(F.col("doc_id") >= 50),
            docs.filter(F.col("doc_id") < 50),
            n=3,
        )

    def doc_bloom_contamination(spark, sf):
        # Bloom-filter decontamination gate (fixed-size-filter broadcast
        # — the 100 TB form of the benchmark blocklist) audited against
        # the exact gate on the same train/benchmark split as
        # doc_contamination: false_neg_violations MUST be 0 (structural),
        # fp stays within the analytic (1-e^{-kn/m})^k bound, and the
        # exact-side counts are data-derived so the row is not vacuous.
        from kafka_graphs_spark.pipeline.bloom import bloom_contamination_check

        docs = datasets.load(spark, sf, "documents")
        return bloom_contamination_check(
            docs.filter(F.col("doc_id") >= 50),
            docs.filter(F.col("doc_id") < 50),
            n=3,
        )

    # ---- similarity search (embeddings) ----

    def emb_cosine_topk(spark, sf):
        emb = datasets.load(spark, sf, "embeddings")
        return similarity.cosine_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)

    def emb_near_dup(spark, sf):
        # the synthetic embeddings have NO organic near-duplicates (the
        # 10 Gaussian clusters top out at cos ~0.46), so threshold-0.8
        # output was structurally empty — a vacuous green row. Plant 40
        # deterministic near-copies (vec_id+1e6, first coordinate +0.1
        # on the unit-norm vectors — cos ~0.995, identical arithmetic in
        # both engines): the exact pair join must find EXACTLY those 40
        # planted pairs at cos >= 0.9.
        emb = datasets.load(spark, sf, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
        planted = emb.filter(F.col("vec_id") < 40).select(
            (F.col("vec_id") + 1000000).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: F.when(i == 0, x + F.lit(0.1)).otherwise(x),
            ).alias("embedding"),
        )
        return similarity.embedding_near_duplicates(
            emb.unionByName(planted), threshold=0.9
        )

    def _planted_onehot(emb, clusters=8):
        # planted well-separated clusters (r12 verdict #5): every vector
        # in cluster c = vec_id % clusters is the SAME one-hot e_c
        # (clusters <= dim 64). In-cluster cosine is EXACTLY 1.0 (dot 1,
        # norms sqrt(1)=1), cross-cluster exactly 0.0 — no float noise
        # on either engine — and identical vectors land in the same LSH
        # bucket in every table / the same IVF or k-means cell under any
        # quantizer, so the candidate set provably contains the whole
        # cluster and the (cos DESC, neighbor_id ASC) re-rank returns
        # the exact top-k: the k smallest same-cluster ids excluding
        # self. That closed form IS the oracle.
        c = (F.col("vec_id") % clusters).cast("int")
        vec = F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda j: F.when(j == c, F.lit(1.0)).otherwise(F.lit(0.0)),
        )
        return emb.select("vec_id", vec.alias("embedding"))

    def emb_lsh_topk(spark, sf):
        # ORACLE-BACKED since r13 via the planted one-hot clusters above;
        # real-corpus recall behavior remains covered by emb_lsh_recall
        # (4 planes × 8 tables, the recall-measured configuration).
        emb = _planted_onehot(datasets.load(spark, sf, "embeddings"))
        return similarity.rp_lsh_topk(
            emb, emb.filter(F.col("vec_id") < 10), k=5, n_planes=4, n_tables=8, dim=64
        )

    def sp_svdpp_factors(spark, sf):
        # sequential per-message gradient chain — no SQL oracle (rows-only).
        # Semantics: Svdpp.java:35-630 modulo the documented gradient-sign
        # fix (cf.py:366-372 — the reference ascends and diverges).
        from kafka_graphs_spark import Graph
        from kafka_graphs_spark.library import svdpp

        li = datasets.load(spark, sf, "lineitem")
        ratings = li.groupBy(
            F.col("l_suppkey").alias("src"),
            (F.col("l_partkey") + 1000000).alias("dst"),
        ).agg((F.avg("l_quantity") / 10.0).alias("value"))
        g = Graph.from_edges(ratings, F.lit(0.0))
        users, items, _mean = svdpp(g, dim=4, iterations=2, seed=11)
        return users.select("id", F.posexplode("p").alias("i", "x")).unionByName(
            items.select("id", F.posexplode("q").alias("i", "x"))
        )

    def sp_svdpp_loss(spark, sf):
        # invariant oracle: 2 SVD++ rounds must strictly decrease training
        # MSE vs the seed-identical iteration-0 initialization (measured
        # sf0.001: 1.239 → 0.949).
        from kafka_graphs_spark import Graph
        from kafka_graphs_spark.library import svdpp, svdpp_predict

        li = datasets.load(spark, sf, "lineitem")
        ratings = li.groupBy(
            F.col("l_suppkey").alias("src"),
            (F.col("l_partkey") + 1000000).alias("dst"),
        ).agg((F.avg("l_quantity") / 10.0).alias("value"))
        g = Graph.from_edges(ratings, F.lit(0.0))

        def mse(iters):
            users, items, mean = svdpp(g, dim=4, iterations=iters, seed=11)
            pred = svdpp_predict(
                users, items, ratings.select("src", "dst"), ratings, mean
            )
            return (
                pred.join(ratings, on=["src", "dst"])
                .select(((F.col("prediction") - F.col("value")) ** 2).alias("e2"))
                .agg(F.avg("e2").alias(f"mse_{iters}"))
            )

        return mse(2).crossJoin(mse(0)).select(
            (F.col("mse_2") < F.col("mse_0")).alias("loss_decreased")
        )

    def ec_ppr5(spark, sf):
        # personalized PageRank (PageRank.java:83-90): source-seeded delta
        # recurrence; bit-exact CTE oracle on the chain graph.
        src = datasets.chain_sources(spark, sf, 1)[0]
        return pagerank(
            _ec_graph(spark, sf), src_vertex_id=src, max_iterations=5
        ).select("id", "value")

    def ec_ppr_multi(spark, sf):
        # multi-seed personalized PageRank: ALL 3 seeds in ONE
        # distributed run over struct (seed, vid) keys — no per-seed
        # jobs; per-seed semantics identical to ec_ppr5's recurrence
        from kafka_graphs_spark.library import ppr_multi

        seeds = datasets.chain_sources(spark, sf, 3)
        return ppr_multi(
            _ec_graph(spark, sf), seeds, max_iterations=5
        ).select("id", "seed", "value")

    # ---- streaming tier (single-pass summaries; VERDICT r01 #4) ----

    def ec_stream_wcc(spark, sf):
        from kafka_graphs_spark.streaming import connected_components_frame

        return connected_components_frame(datasets.event_chain_edges(spark, sf))

    def stream_bipartiteness(spark, sf):
        # hier graph has customer-nation-region triangles (odd cycle ⇒ not
        # bipartite); supplier→part is bipartite by construction.
        from kafka_graphs_spark.datasets import hierarchy_edges
        from kafka_graphs_spark.streaming import bipartiteness_frame

        h = bipartiteness_frame(hierarchy_edges(spark, sf)).select(
            F.lit("hier").alias("g"), "success"
        )
        s = bipartiteness_frame(datasets.supplier_part_edges(spark, sf)).select(
            F.lit("sp").alias("g"), "success"
        )
        return h.unionByName(s)

    def ec_spanner(spark, sf):
        # event chains form a forest ⇒ the spanner keeps every edge
        # regardless of replay order (deterministic, hash-checkable).
        from kafka_graphs_spark.streaming import spanner_frame

        return spanner_frame(datasets.event_chain_edges(spark, sf), k=2)

    # ---- invariant oracles (VERDICT r01 #6) ----

    def ec_maxbmatching_inv(spark, sf):
        # the matching itself is order-dependent; its INVARIANTS are not:
        # INCLUDED edges are mutual, per-vertex matched degree ≤ capacity
        # (=1 here), and the matching is non-empty. Oracle pins all three.
        from kafka_graphs_spark import Graph
        from kafka_graphs_spark.library import max_b_matching

        e = datasets.event_chain_edges(spark, sf)
        und = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "value")
        )
        g = Graph.from_edges(und, F.lit(1))
        m = (
            max_b_matching(g, max_iterations=12)
            .filter(F.col("state") == 3)
            .select("src", "dst")
        )
        rev = m.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        mutual = m.join(rev, on=["src", "dst"], how="left_anti").agg(
            F.count(F.lit(1)).alias("mutual_violations")
        )
        cap = (
            m.groupBy("src")
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(
                F.coalesce(
                    F.sum(F.when(F.col("c") > 1, 1).otherwise(0)), F.lit(0)
                ).alias("capacity_violations")
            )
        )
        ne = m.agg((F.count(F.lit(1)) > 0).alias("nonempty"))
        return mutual.crossJoin(cap).crossJoin(ne)

    def emb_kmeans_assign(spark, sf):
        # pinned initial centers (embeddings 0..7) + ONE iteration ⇒ the
        # assignment is closed-form in SQL (argmin to once-updated means).
        from kafka_graphs_spark import Graph
        from kafka_graphs_spark.library import kmeans

        emb = datasets.load(spark, sf, "embeddings")
        centers = [
            [float(x) for x in r["embedding"]]
            for r in emb.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
        ]
        v = emb.select(
            F.col("vec_id").alias("id"),
            F.col("embedding").cast("array<double>").alias("value"),
        )
        e = spark.createDataFrame([], "src long, dst long, value double")
        return kmeans(
            Graph(v, e), k=8, max_iterations=1, initial_centers=centers
        )

    def sp_als_loss(spark, sf):
        # invariant oracle: 4 ALS sweeps must beat the constant-mean
        # predictor on the training ratings.
        from kafka_graphs_spark import Graph
        from kafka_graphs_spark.library import als

        li = datasets.load(spark, sf, "lineitem")
        ratings = li.groupBy(
            F.col("l_suppkey").alias("src"),
            (F.col("l_partkey") + 1000000).alias("dst"),
        ).agg((F.avg("l_quantity") / 10.0).alias("value"))
        g = Graph.from_edges(ratings, F.lit(0.0))
        f = als(g, dim=8, iterations=4, seed=11)
        fu = f.select(F.col("id").alias("src"), F.col("vec").alias("p"))
        fi = f.select(F.col("id").alias("dst"), F.col("vec").alias("q"))
        pred = (
            ratings.join(fu, on="src")
            .join(fi, on="dst")
            .select(
                "value",
                F.aggregate(
                    F.zip_with("p", "q", lambda a, b: a * b),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("pred"),
            )
        )
        mse_model = pred.select(((F.col("pred") - F.col("value")) ** 2).alias("e2")).agg(
            F.avg("e2").alias("mse_model")
        )
        gmean = ratings.agg(F.avg("value").alias("gm"))
        mse_base = (
            ratings.crossJoin(gmean)
            .select(((F.col("gm") - F.col("value")) ** 2).alias("e2"))
            .agg(F.avg("e2").alias("mse_base"))
        )
        return mse_model.crossJoin(mse_base).select(
            (F.col("mse_model") < F.col("mse_base")).alias("beats_mean")
        )

    def sp_sgd_loss(spark, sf):
        # invariant oracle: 2 SGD epochs must strictly decrease training
        # MSE vs the seed-identical iteration-0 initialization (the
        # reference's conservative 0.001 learning rate means SGD does not
        # beat the mean predictor this fast — measured 7.2905 → 7.2864).
        from kafka_graphs_spark import Graph
        from kafka_graphs_spark.library import sgd

        li = datasets.load(spark, sf, "lineitem")
        ratings = li.groupBy(
            F.col("l_suppkey").alias("src"),
            (F.col("l_partkey") + 1000000).alias("dst"),
        ).agg((F.avg("l_quantity") / 10.0).alias("value"))
        g = Graph.from_edges(ratings, F.lit(0.0))

        def mse(iters):
            f = sgd(g, dim=4, iterations=iters, seed=11)
            fu = f.select(F.col("id").alias("src"), F.col("vec").alias("p"))
            fi = f.select(F.col("id").alias("dst"), F.col("vec").alias("q"))
            return (
                ratings.join(fu, on="src")
                .join(fi, on="dst")
                .select(
                    "value",
                    F.aggregate(
                        F.zip_with("p", "q", lambda a, b: a * b),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    ).alias("pred"),
                )
                .select(((F.col("pred") - F.col("value")) ** 2).alias("e2"))
                .agg(F.avg("e2").alias(f"mse_{iters}"))
            )

        return mse(2).crossJoin(mse(0)).select(
            (F.col("mse_2") < F.col("mse_0")).alias("loss_decreased")
        )

    def emb_near_dup_lsh(spark, sf):
        # ORACLE-BACKED since r13 via planted one-hot clusters
        # (vec_id % 64): in-cluster pairs have cosine exactly 1.0 ≥ the
        # canonical 0.95 threshold, cross-cluster exactly 0.0, and
        # identical vectors share every LSH bucket — so the LSH-banded
        # candidate set provably contains every in-cluster pair and the
        # output is EXACTLY the same-cluster (a < b) pairs. Real-corpus
        # LSH recall stays covered by emb_near_dup_lsh_inv; the exact
        # path stays oracle-checked as emb_near_dup.
        emb = _planted_onehot(
            datasets.load(spark, sf, "embeddings"), clusters=64
        )
        return similarity.embedding_near_duplicates(
            emb, threshold=0.95, method="lsh", n_planes=6, n_tables=8, dim=64
        )

    def dedup_simhash_pairs(spark, sf):
        # Hamming-blocked near pairs; blocking is COMPLETE for
        # hamming <= max_hamming (pigeonhole over max_hamming+1 blocks),
        # so the unblocked SQL filter is an exact oracle.
        return dedup.simhash_near_pairs(
            datasets.load(spark, sf, "documents"), bits=16, max_hamming=2
        )

    def dedup_resolve(spark, sf):
        # transitive duplicate-cluster resolution (keep-list): candidate
        # pairs -> WCC -> min-id survivor per cluster; self when unique.
        return dedup.resolve_duplicates(
            datasets.load(spark, sf, "documents"), n=3, threshold=0.05
        )

    def pipeline_curate(spark, sf):
        # end-to-end curation: quality gate -> transitive dup resolution
        # -> keep list; the full composition under one oracle.
        from kafka_graphs_spark.pipeline.curate import curate

        return curate(
            datasets.load(spark, sf, "documents"),
            min_score=0.6, n=3, jaccard_threshold=0.05,
        )

    def pipeline_curate_gated(spark, sf):
        # curation with the Gopher-style repetition gate between quality
        # and dup resolution (drops the boilerplate-heavy docs before the
        # expensive pair stage); PII gate covered by pytest (organic
        # corpus has no pattern-PII, so it would be vacuous here)
        from kafka_graphs_spark.pipeline.curate import curate

        return curate(
            datasets.load(spark, sf, "documents"),
            min_score=0.6, n=3, jaccard_threshold=0.05,
            max_dup_trigram_frac=0.02,
        )

    def pipeline_curate_decontam(spark, sf):
        # curation with the benchmark-decontamination gate between the
        # quality filter and dup resolution: train = doc_id >= 50,
        # benchmark = doc_id < 50, drop rate > 0.5
        from kafka_graphs_spark.pipeline.curate import curate

        docs = datasets.load(spark, sf, "documents")
        return curate(
            docs.filter(F.col("doc_id") >= 50),
            min_score=0.6, n=3, jaccard_threshold=0.05,
            benchmark=docs.filter(F.col("doc_id") < 50),
            max_contamination=0.5,
        )

    def doc_language_stats(spark, sf):
        docs = datasets.load(spark, sf, "documents")
        lang = text.language_id(docs)
        qual = text.quality_score(docs).select("doc_id", "score")
        return (
            lang.join(qual, on="doc_id")
            .groupBy("lang_pred")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.round(F.avg("score"), 6).alias("avg_score"),
            )
        )

    def emb_ivf_topk(spark, sf):
        # ORACLE-BACKED since r13 via the planted one-hot clusters (see
        # _planted_onehot): identical in-cluster vectors share an IVF
        # cell under ANY trained quantizer and the query's first probe is
        # its own cell, so candidates provably contain the cluster and
        # top-k = k smallest same-cluster ids. Real-corpus recall remains
        # covered by emb_ivf_recall.
        emb = _planted_onehot(datasets.load(spark, sf, "embeddings"))
        return similarity.ivf_topk(
            emb, emb.filter(F.col("vec_id") < 10), k=5, n_cells=16, n_probe=4, dim=64
        )

    def _ann_recall(spark, sf, approx_fn, floor):
        # recall@k of an approximate ANN result vs the exact top-k,
        # thresholded well below the measured value (constant-true oracle)
        emb = datasets.load(spark, sf, "embeddings")
        q = emb.filter(F.col("vec_id") < 10)
        exact = similarity.cosine_topk(emb, q, k=5).select("query_id", "neighbor_id")
        approx = approx_fn(emb, q).select("query_id", "neighbor_id")
        hits = exact.join(approx, on=["query_id", "neighbor_id"]).agg(
            F.count(F.lit(1)).alias("h")
        )
        tot = exact.agg(F.count(F.lit(1)).alias("t"))
        return hits.crossJoin(tot).select(
            ((F.col("h").cast("double") / F.col("t")) >= floor).alias("recall_ok")
        )

    def emb_lsh_recall(spark, sf):
        # invariant oracle for the rows-only emb_lsh_topk path. 4 planes ×
        # 8 tables measured recall@5 = 0.68/0.70 at sf0.001/0.01 (8×4
        # measures 0.04 — too many planes for this corpus's weak
        # neighbors); floor 0.5 with deterministic seeded planes.
        return _ann_recall(
            spark, sf,
            lambda emb, q: similarity.rp_lsh_topk(
                emb, q, k=5, n_planes=4, n_tables=8, dim=64
            ),
            0.5,
        )

    def emb_ivf_recall(spark, sf):
        # invariant oracle for the rows-only emb_ivf_topk path; measured
        # recall@5 = 0.66/0.60 at sf0.001/0.01 (deterministic seeded
        # quantizer), floor 0.5
        return _ann_recall(
            spark, sf,
            lambda emb, q: similarity.ivf_topk(
                emb, q, k=5, n_cells=16, n_probe=4, dim=64
            ),
            0.5,
        )

    def emb_pq_recall(spark, sf):
        # invariant oracle for the PQ-ADC path: m=16×16-centroid codes +
        # ADC scan + exact rerank of a 50-candidate shortlist. Measured
        # recall@5 = 0.88/0.86 at sf0.001/0.01 (deterministic sorted-
        # sample codebooks), floor 0.6.
        return _ann_recall(
            spark, sf,
            lambda emb, q: similarity.pq_topk(
                emb, q, k=5, m=16, n_centroids=16, dim=64, rerank=50
            ),
            0.6,
        )

    def emb_pq_codes_inv(spark, sf):
        # code-validity invariant for the rows-only PQ encoder: every
        # corpus vector gets exactly m codes, each in [0, k)
        emb = datasets.load(spark, sf, "embeddings")
        cb = similarity.train_pq_codebooks(emb, m=8, k=16, dim=64)
        codes = similarity.product_quantize(emb, cb)
        n = emb.count()
        return codes.agg(
            (F.count(F.lit(1)) == n).alias("all_encoded"),
            F.every(F.size("codes") == 8).alias("m_ok"),
            F.every(
                F.forall("codes", lambda c: (c >= 0) & (c < 16))
            ).alias("range_ok"),
        )

    def emb_ivfpq_topk(spark, sf):
        # IVFADC (coarse cells + residual PQ + ADC scan + exact rerank) —
        # rows-only check; recall pinned by emb_ivfpq_recall
        emb = datasets.load(spark, sf, "embeddings")
        return similarity.ivfpq_topk(
            emb, emb.filter(F.col("vec_id") < 10),
            k=5, n_cells=16, n_probe=6, m=8, n_centroids=16, dim=64, rerank=100,
        )

    def emb_ivfpq_recall(spark, sf):
        # invariant oracle for the IVFADC path; measured recall@5 =
        # 0.70/0.66 at sf0.001/0.01 (deterministic sorted-sample
        # quantizers; recall is cell-coverage-bounded like emb_ivf_recall,
        # whose 4-probe floor is also 0.5), floor 0.5
        return _ann_recall(
            spark, sf,
            lambda emb, q: similarity.ivfpq_topk(
                emb, q, k=5, n_cells=16, n_probe=6, m=8, n_centroids=16,
                dim=64, rerank=100,
            ),
            0.5,
        )

    def emb_rp_project(spark, sf):
        # Achlioptas +-1 random projection 64 -> 16 dims, flattened to
        # (id, pos, val) scalar rows; the oracle rebuilds the SAME md5-
        # derived sign matrix as inline literals
        emb = datasets.load(spark, sf, "embeddings")
        out = similarity.random_projection(emb, out_dim=16, dim=64)
        return out.select(
            "id", F.posexplode("proj").alias("pos", "val")
        ).orderBy("id", "pos")

    def doc_span_removal(spark, sf):
        # ExactSubstr removal stage: cut every token covered by a
        # duplicated 8-token window, rejoin survivors in order
        docs = datasets.load(spark, sf, "documents")
        return dedup.remove_duplicated_spans(docs, w=8).orderBy("doc_id")

    def doc_dedup_rate(spark, sf):
        # per-source exact-dedup removal rate (keep-min-id rule) over
        # the planted-duplicates fixture, so rates are genuinely nonzero
        return dedup.dedup_rate_per_source(
            _docs_with_exact_dups(spark, sf)
        ).orderBy("source")

    def doc_weighted_sample(spark, sf):
        # Efraimidis-Spirakis weighted sample w/o replacement, weights =
        # n_chars (long docs favored), n=100 — exact md5-keyed oracle
        docs = datasets.load(spark, sf, "documents")
        return sample.weighted_sample(
            docs.withColumn("w", F.length("text")), "doc_id", "w", 100
        ).select("doc_id", "source").orderBy("doc_id")

    def ec_hyperanf(spark, sf):
        # HyperANF neighborhood function on the directed chains; the
        # exact N(t) has a closed form (per-user Σ_{d≤t} max(n−d, 0)), so
        # the oracle pins the HLL estimate inside a generous 3σ-ish band
        # (p=6 → σ≈13%; measured ≤1% on this corpus) at every t
        from kafka_graphs_spark.library import hyperanf

        g = _ec_graph(spark, sf)
        # rel_tolerance=0 disables the convergence early-stop so the query
        # always yields exactly t=0..8 rows regardless of chain lengths
        # (ADVICE r6: early convergence would fail the 9-row oracle on
        # row count rather than on the accuracy bound)
        est = hyperanf(g, p=6, max_iterations=8, rel_tolerance=0.0)
        ev = datasets.load(spark, sf, "events")
        n_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
        ts = spark.range(0, 9).select(F.col("id").cast("int").alias("t"))
        exact = (
            n_user.crossJoin(ts)
            .select(
                "t",
                F.expr(
                    "aggregate(sequence(0, t), 0L,"
                    " (acc, d) -> acc + greatest(n - d, 0L))"
                ).alias("pairs"),
            )
            .groupBy("t")
            .agg(F.sum("pairs").alias("exact_pairs"))
        )
        return (
            est.join(exact, on="t")
            .select(
                "t",
                (
                    F.abs(F.col("n_pairs_est") / F.col("exact_pairs") - 1.0)
                    <= 0.3
                ).alias("within_bound"),
            )
            .orderBy("t")
        )

    def doc_bpe_apply_inv(spark, sf):
        # BPE inference invariant: replaying the trained merge list with
        # apply_bpe over the word types reproduces the trainer's own
        # segmentation table exactly (the train/inference consistency
        # contract), and the apply path is also lossless
        from kafka_graphs_spark.pipeline.bpe import apply_bpe, train_bpe

        docs = datasets.load(spark, sf, "documents")
        merges, seg = train_bpe(docs, n_merges=20)
        applied = apply_bpe(seg.select("token"), merges)
        j = seg.select("token", F.col("symbols").alias("_train")).join(
            applied.select("token", F.col("symbols").alias("_apply")),
            on="token",
        )
        return j.agg(
            F.sum(
                F.when(F.col("_train") != F.col("_apply"), 1).otherwise(0)
            ).alias("mismatches"),
            F.sum(
                F.when(F.concat_ws("", F.col("_apply")) != F.col("token"), 1)
                .otherwise(0)
            ).alias("concat_violations"),
            (F.count(F.lit(1)) > 0).alias("nonempty"),
        )

    def ec_window_lp(spark, sf):
        # per-tumbling-window LP over the hourly-keyed chains. Within a
        # (user, hour) the edges are one contiguous run, so 10 LP rounds
        # give label(v) = max id over the 10 preceding segment positions
        # (the windowed form of ec_lp10's closed form).
        from pyspark.sql.window import Window

        from kafka_graphs_spark.streaming import lp_windowed

        ev = datasets.load(spark, sf, "events")
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        edges = (
            ev.select(
                "user_id", "event_id", "ts",
                F.lag("event_id").over(w).alias("prev_id"),
            )
            .filter(F.col("prev_id").isNotNull())
            .select(
                F.col("prev_id").alias("src"),
                F.col("event_id").alias("dst"),
                F.col("ts").alias("event_time"),
            )
        )
        out = lp_windowed(edges, "1 hour", max_iterations=10)
        start = F.col("window_start")
        epoch_start = (
            F.datediff(start.cast("date"), F.lit("1970-01-01").cast("date")).cast("long") * 86400
            + F.hour(start).cast("long") * 3600
        )
        return out.select(epoch_start.alias("window_start"), "id", "label")

    def gen_wcc_random(spark, sf):
        # WCC over the seeded ER graph — third-topology cross-validation
        # (chains and cliques already twin'd); recursive-closure oracle
        from kafka_graphs_spark.library import connected_components
        from kafka_graphs_spark.sources import random_graph

        return connected_components(
            random_graph(spark, 60, 0.02, seed=9), max_iterations=100
        )

    def pipeline_curate_spans(spark, sf):
        # curation with the ExactSubstr span gate between quality and dup
        # resolution: drop quality-survivors whose duplicated 8-token
        # window fraction (measured WITHIN the surviving subset) > 0.1
        from kafka_graphs_spark.pipeline.curate import curate

        return curate(
            datasets.load(spark, sf, "documents"),
            min_score=0.6, n=3, jaccard_threshold=0.05,
            max_dup_span_frac=0.1,
        )

    def dedup_minhash_estimate(spark, sf):
        # MinHash Jaccard estimate on LSH candidate pairs (signature
        # agreement fraction) — the scale substitute for exact verify
        docs = datasets.load(spark, sf, "documents")
        return dedup.minhash_jaccard_estimate(
            docs, num_hashes=16, bands=4
        ).orderBy("doc_a", "doc_b")

    def doc_hybrid_retrieval(spark, sf):
        # hybrid retrieval: RRF-fuse the sparse BM25 list with the dense
        # exact-cosine list for query ids 0..2 (doc ids and vec ids share
        # the 0..N-1 key space in the synthetic corpus)
        docs = datasets.load(spark, sf, "documents")
        emb = datasets.load(spark, sf, "embeddings")
        q = spark.createDataFrame(
            [
                (0, "hash join shuffle"),
                (1, "window sort merge batch"),
                (2, "slow scan table"),
            ],
            "query_id long, query_text string",
        )
        sparse = text.bm25_scores(docs, q, k=10).select(
            "query_id", "doc_id", "rank"
        )
        dense = similarity.cosine_topk(
            emb, emb.filter(F.col("vec_id") < 3), k=10
        ).select("query_id", F.col("neighbor_id").alias("doc_id"), "rank")
        return similarity.rrf_fuse(sparse, dense, k=60, top=10).orderBy(
            "query_id", "rank"
        )

    def doc_bm25(spark, sf):
        # Okapi BM25 top-10 per query over the token inverted index
        docs = datasets.load(spark, sf, "documents")
        q = spark.createDataFrame(
            [
                (0, "hash join shuffle"),
                (1, "window sort merge batch"),
                (2, "slow scan table"),
            ],
            "query_id long, query_text string",
        )
        return text.bm25_scores(docs, q, k=10).orderBy("query_id", "rank")

    def doc_rank_correlation(spark, sf):
        # Kendall tau between two BM25 hyperparameter settings (k1/b) —
        # the "did my ranking change" tuning check; exact integer
        # concordant/discordant counts, one division per query
        docs = datasets.load(spark, sf, "documents")
        seed = docs.filter(F.col("doc_id") < 3).select(
            F.col("doc_id").alias("query_id"),
            F.array_join(
                F.slice(text.tokens(F.col("text")), 1, 5), " "
            ).alias("query_text"),
        )
        run_a = text.bm25_scores(docs, seed, k=10)
        run_b = text.bm25_scores(docs, seed, k=10, k1=2.0, b=0.3)
        return text.rank_correlation(run_a, run_b, k=10)

    def doc_language_mix(spark, sf):
        # code-switch detection: per-language stopword evidence exposed
        # (not argmax'd) + the mixed flag; zero-shuffle exact ints. The
        # synthetic corpus is en-only, so the driver row is made
        # DISCRIMINATING (r7 verdict #5) by deterministically
        # code-switching it: docs with doc_id%5==0 get a Spanish
        # stopword-rich suffix, else doc_id%7==0 a French one, else
        # doc_id%11==0 a German one (r9 audit: hits_de was never
        # exercised) — those with English evidence then flag mixed=true
        # while the untouched docs keep exercising the negatives
        from kafka_graphs_spark.pipeline.text import language_mix

        docs = datasets.load(spark, sf, "documents")
        suffix = (
            F.when(
                F.col("doc_id") % 5 == 0,
                F.lit(" los datos son para todos y las tablas"),
            )
            .when(
                F.col("doc_id") % 7 == 0,
                F.lit(" le rapport est dans des pages pour la version"),
            )
            .when(
                F.col("doc_id") % 11 == 0,
                F.lit(" der bericht ist von und mit den daten im system"),
            )
            .otherwise(F.lit(""))
        )
        return language_mix(
            docs.withColumn("text", F.concat(F.col("text"), suffix))
        )

    def doc_domains(spark, sf):
        # registered-domain (eTLD+1) extraction over synthetic URLs:
        # userinfo/port stripping, case/trailing-dot normalization,
        # multi-label public suffixes (co.uk/com.au) — zero shuffles
        from kafka_graphs_spark.pipeline.domains import extract_domains

        return extract_domains(_doc_urls(spark, sf))

    def doc_domain_stats(spark, sf):
        # per-registered-domain corpus rollup (C4/RefinedWeb-style
        # domain concentration audit): one map-side-combined groupBy
        from kafka_graphs_spark.pipeline.domains import domain_stats

        return domain_stats(_doc_urls(spark, sf))

    def doc_domain_blocklist(spark, sf):
        # domain blocklist gate: label-boundary suffix match, subdomains
        # blocked, most-specific entry reported; rows never dropped
        from kafka_graphs_spark.pipeline.domains import domain_blocklist

        return domain_blocklist(
            _doc_urls(spark, sf),
            ["shop.com", "news.co.uk", "assets.blog.net"],
        )

    def doc_domain_cap(spark, sf):
        # composition: registered-domain extraction -> deterministic
        # per-domain cap (hash-ordered top-16 per domain; domain sizes are
        # 16-17 here, so 17-doc domains cap and 16-doc domains pass through
        # -- both branches discriminate) — the
        # "no more than n docs from any one domain" mixture rule keyed
        # by eTLD+1 instead of the source label
        from kafka_graphs_spark.pipeline.domains import extract_domains

        doms = extract_domains(_doc_urls(spark, sf)).select("doc_id", "domain")
        return sample.cap_per_group(doms, "domain", 16, "doc_id")

    def doc_domain_token_budget(spark, sf):
        # RefinedWeb-style per-domain TOKEN budget (r10): hash-ordered
        # exclusive cumsum per registered domain, keep while the
        # preceding mass stays under 400 tokens. Domains carry ~900
        # tokens across 16-17 docs here, so both keep branches and the
        # cum_before audit column discriminate on every domain.
        from kafka_graphs_spark.pipeline.domains import domain_token_budget

        return domain_token_budget(_doc_urls(spark, sf), max_tokens=400)

    def doc_domain_quality(spark, sf):
        # C4-style per-domain quality profile: registered domain x
        # heuristic quality band -> doc counts, computed in ONE corpus
        # pass (domain + score in the same projection — no self-join of
        # two scans). Grouping on the band-constant score is exact in
        # both engines; counts are exact ints.
        from kafka_graphs_spark.pipeline.domains import domain_quality_profile

        return domain_quality_profile(_doc_urls(spark, sf))

    def dedup_containment(spark, sf):
        # asymmetric near-duplication (Broder containment |A∩B|/|A|):
        # catches excerpts/quotes symmetric Jaccard misses; inverted-
        # index equi-join, exact-integer division
        from kafka_graphs_spark.pipeline.dedup import containment_pairs

        return containment_pairs(
            datasets.load(spark, sf, "documents"), threshold=0.8
        )

    def doc_blocklist(spark, sf):
        # C4-style blocklist gate: exact token/n-gram occurrence counts
        # per entry, hit list, keep flag — zero-shuffle per-row flags.
        # blocked_terms is ARRAY<STRING> in the library API; flatten to
        # CSV here (repo convention: the driver canonicalizer sorts via
        # pandas, which cannot hash list cells — r8's one red row).
        from kafka_graphs_spark.pipeline.text import blocklist_filter

        return blocklist_filter(
            datasets.load(spark, sf, "documents"),
            ["slow", "table scan", "big query"],
        ).select(
            "doc_id",
            "n_blocked",
            F.array_join("blocked_terms", ",").alias("blocked_terms"),
            "keep",
        )

    def doc_retrieval_metrics(spark, sf):
        # retrieval eval harness: BM25 top-10 runs for queries drawn from
        # seed docs (first 5 tokens of docs 0-2), scored against
        # SAME-SOURCE qrels — relevance is orthogonal to term frequency,
        # so nDCG@10 actually discriminates; sorted-fold DCG both engines
        docs = datasets.load(spark, sf, "documents")
        seed = docs.filter(F.col("doc_id") < 3).select(
            F.col("doc_id").alias("query_id"),
            F.array_join(
                F.slice(text.tokens(F.col("text")), 1, 5), " "
            ).alias("query_text"),
            "source",
        )
        ranked = text.bm25_scores(
            docs, seed.select("query_id", "query_text"), k=10
        )
        rels = seed.select("query_id", "source").join(
            docs.select("doc_id", "source"), on="source"
        ).select("query_id", "doc_id")
        return text.retrieval_metrics(ranked, rels, k=10)

    def doc_tfidf_pairs(spark, sf):
        # sparse TF-IDF cosine pairs via the token inverted index
        # (threshold 0.8: the tiny 31-token synthetic vocab makes docs
        #  broadly similar — 0.8 keeps the strongly-similar ~4k pairs)
        docs = datasets.load(spark, sf, "documents")
        return text.tfidf_cosine_pairs(docs, threshold=0.8).orderBy(
            "doc_a", "doc_b"
        )

    def doc_zipf_fit(spark, sf):
        # ln(freq) ~ ln(rank) least squares over the corpus vocabulary
        docs = datasets.load(spark, sf, "documents")
        return text.zipf_fit(docs)

    def doc_negative_samples(spark, sf):
        # contrastive negatives: 4 seeded draws per query over dense item
        # ids 0..499 with positive/self exclusion; the md5 draw chain
        # replays exactly in SQL
        pairs = spark.range(0, 50).select(
            F.col("id").alias("query_id"),
            ((F.col("id") * 7 + 3) % 500).alias("pos_id"),
        )
        return sample.negative_samples(
            pairs, n_items=500, k=4
        ).orderBy("query_id", "slot")

    def gen_random_graph(spark, sf):
        # seeded G(n, p) edge list — the md5-fraction rule replicates
        # exactly in SQL
        from kafka_graphs_spark.sources import random_graph

        g = random_graph(spark, 60, 0.1, seed=7)
        return g.edges.select("src", "dst").orderBy("src", "dst")

    def gen_betweenness_sampled(spark, sf):
        # Brandes-Pich sampled betweenness on the 50-star: 20 md5-chosen
        # sources, estimate(hub) = (50/20) * |sampled leaves| * 24 exactly
        # (every arithmetic step is dyadic-or-integer), leaves 0
        from kafka_graphs_spark.library import betweenness_centrality
        from kafka_graphs_spark.sources import star_graph

        return betweenness_centrality(
            star_graph(spark, 50), n_sample_sources=20
        )

    def ec_effective_diameter(spark, sf):
        # q=0.9 effective diameter from HyperANF vs the EXACT value
        # interpolated from the chain closed form N(t) (both capped at
        # t=8); HLL error ~1% moves the interpolation by << 0.5
        from kafka_graphs_spark.library import effective_diameter

        est = effective_diameter(_ec_graph(spark, sf), q=0.9, p=6, max_iterations=8)
        ev = datasets.load(spark, sf, "events")
        counts = [r["n"] for r in ev.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()]

        def n_of(t):
            return float(sum(sum(max(c - d, 0) for d in range(t + 1))
                             for c in counts))

        nf = [(t, n_of(t)) for t in range(9)]
        target = 0.9 * nf[-1][1]
        if nf[0][1] >= target:
            exact = float(nf[0][0])
        else:
            exact = float(nf[-1][0])
            for (t0, v0), (t1, v1) in zip(nf, nf[1:]):
                if v1 >= target:
                    exact = (
                        t0 + (target - v0) / (v1 - v0) * (t1 - t0)
                        if v1 > v0 else float(t1)
                    )
                    break
        return spark.createDataFrame(
            [(abs(est - exact) <= 0.5,)], "diam_ok boolean"
        )

    def hier_avg_nbr_degree(spark, sf):
        # Barabási knn(v): per-vertex mean neighbor degree (undirected
        # simple degrees), the degree-correlation card metric
        from kafka_graphs_spark.datasets import hierarchy_graph
        from kafka_graphs_spark.library import avg_neighbor_degree

        return avg_neighbor_degree(hierarchy_graph(spark, sf))

    def doc_temperature_sample(spark, sf):
        # alpha=0.3 temperature mixture (mT5 rule): w_s = c_s^0.3, rates
        # via the binding-stratum solve, md5-seeded Bernoulli keep. The
        # synthetic corpus has exactly-uniform source sizes (all rates
        # would be 1.0 — vacuous), so skew it first: sources src0/src1
        # keep everything, the rest drop doc_id % 3 == 0.
        docs = datasets.load(spark, sf, "documents").filter(
            (F.col("doc_id") % 3 != 0) | F.col("source").isin("src0", "src1")
        )
        return sample.temperature_sample(
            docs, "doc_id", "source", alpha=0.3
        ).select("doc_id", "source").orderBy("doc_id")

    def doc_bpe_inv(spark, sf):
        # BPE trainer invariants: every type's segmentation concatenates
        # back to the token (lossless), all 20 requested merges trained
        # (corpus is large enough), and merging strictly compresses the
        # freq-weighted symbol count vs character symbols
        from kafka_graphs_spark.pipeline.bpe import train_bpe

        docs = datasets.load(spark, sf, "documents")
        merges, seg = train_bpe(docs, n_merges=20)
        return seg.agg(
            F.sum(
                F.when(F.concat_ws("", F.col("symbols")) != F.col("token"), 1)
                .otherwise(0)
            ).alias("concat_violations"),
            F.lit(len(merges)).cast("long").alias("n_merges"),
            (
                F.sum(F.col("freq") * F.col("n_symbols"))
                < F.sum(F.col("freq") * F.length("token"))
            ).alias("compressed"),
        )

    def doc_bpe_segments(spark, sf):
        # ORACLE-BACKED since r13 (r12 verdict #5): every document gets
        # the SAME constructed text whose pair counts form a strict
        # chain, so the merge sequence is provably unique. With N docs,
        # types are xy:8N xz:4N yz:2N xyz:N; initial pair counts (x,y)
        # 9N > (x,z) 4N > (y,z) 3N; after merge 1 ("x y") the xyz type
        # becomes [xy, z], leaving (x,z) 4N > (y,z) 2N > (xy,z) N —
        # three merges, never a tie, all counts ≥ min_pair_count. Final
        # segmentations are closed-form: xy/xz/yz single symbols, xyz =
        # "xy z" (merge budget exhausted before (xy,z)). Real-corpus
        # training behavior remains covered by doc_bpe_inv /
        # doc_bpe_apply_inv.
        from kafka_graphs_spark.pipeline.bpe import train_bpe

        docs = datasets.load(spark, sf, "documents").select(
            "doc_id",
            F.lit("xy xy xy xy xy xy xy xy xz xz xz xz yz yz xyz").alias("text"),
        )
        _, seg = train_bpe(docs, n_merges=3)
        return seg.select(
            "token", "freq", F.concat_ws(" ", "symbols").alias("segmentation"),
            "n_symbols",
        ).orderBy("token")

    def ec_window_wcc(spark, sf):
        # per-tumbling-window WCC over the hourly-keyed chain edges. Edge
        # hours are non-decreasing along each user chain, so each (user,
        # hour) holds at most ONE contiguous path segment — component =
        # min event id over that segment's endpoints (closed-form twin).
        from pyspark.sql.window import Window

        from kafka_graphs_spark.streaming import wcc_windowed

        ev = datasets.load(spark, sf, "events")
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        edges = (
            ev.select(
                "user_id", "event_id", "ts",
                F.lag("event_id").over(w).alias("prev_id"),
            )
            .filter(F.col("prev_id").isNotNull())
            .select(
                F.col("prev_id").alias("src"),
                F.col("event_id").alias("dst"),
                F.col("ts").alias("event_time"),
            )
        )
        out = wcc_windowed(edges, "1 hour", max_iterations=500)
        start = F.col("window_start")
        epoch_start = (
            F.datediff(start.cast("date"), F.lit("1970-01-01").cast("date")).cast("long") * 86400
            + F.hour(start).cast("long") * 3600
        )
        return out.select(epoch_start.alias("window_start"), "id", "component")

    def ec_window_wcc_incr(spark, sf):
        # INCREMENTAL windowed WCC (the r7 applyInPandasWithState tier):
        # the same hourly chain edges stream through per-window DSU state
        # in 4 micro-batches; union-by-min keeps component = min id at
        # every emission, so final state = MIN over emissions and the
        # closed-form ec_window_wcc oracle applies verbatim.
        from pyspark.sql.window import Window

        from kafka_graphs_spark.streaming import wcc_windowed_incremental

        ev = datasets.load(spark, sf, "events")
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        edges = (
            ev.select(
                "user_id", "event_id", "ts",
                F.lag("event_id").over(w).alias("prev_id"),
            )
            .filter(F.col("prev_id").isNotNull())
            .select(
                F.col("prev_id").alias("src"),
                F.col("event_id").alias("dst"),
                F.col("ts").alias("event_time"),
            )
            .repartition(4)
        )
        out = _run_stateful_stream(
            spark, edges, lambda s: wcc_windowed_incremental(s, "1 hour"),
            "src long, dst long, event_time timestamp_ntz",
            "window_start timestamp_ntz, id long, component long",
        )
        final = out.groupBy("window_start", "id").agg(
            F.min("component").alias("component")
        )
        start = F.col("window_start")
        epoch_start = (
            F.datediff(start.cast("date"), F.lit("1970-01-01").cast("date")).cast("long") * 86400
            + F.hour(start).cast("long") * 3600
        )
        return final.select(epoch_start.alias("window_start"), "id", "component")

    def ec_window_triangles_incr(spark, sf):
        # INCREMENTAL windowed triangle totals: the hourly co-occurrence
        # pairs stream through per-window adjacency state; each new edge
        # closes |N(a) ∩ N(b)| triangles, duplicates excluded in-state.
        # The running total is monotone, so final = MAX over emissions;
        # oracle = the global (id = -1) rows of the batch twin.
        from kafka_graphs_spark.streaming import triangles_windowed_incremental

        ev = datasets.load(spark, sf, "events")
        occ = ev.select(
            F.window("ts", "1 hour")["start"].alias("ws"),
            "user_id",
            "event_type",
        ).distinct()
        pairs = (
            occ.alias("a")
            .join(occ.alias("b"), on=["ws", "event_type"])
            .filter(F.col("a.user_id") < F.col("b.user_id"))
            .select(
                F.col("a.user_id").alias("src"),
                F.col("b.user_id").alias("dst"),
                F.col("ws").alias("event_time"),
            )
            .distinct()
            .repartition(4)
        )
        out = _run_stateful_stream(
            spark, pairs, lambda s: triangles_windowed_incremental(s, "1 hour"),
            "src long, dst long, event_time timestamp_ntz",
            "window_start timestamp_ntz, n_triangles long",
        )
        final = out.groupBy("window_start").agg(
            F.max("n_triangles").alias("n_triangles")
        ).filter(F.col("n_triangles") > 0)  # oracle universe: windows w/ triangles
        start = F.col("window_start")
        epoch_start = (
            F.datediff(start.cast("date"), F.lit("1970-01-01").cast("date")).cast("long") * 86400
            + F.hour(start).cast("long") * 3600
        )
        return final.select(epoch_start.alias("window_start"), "n_triangles")

    def ec_window_pagerank_incr(spark, sf):
        # INCREMENTAL windowed PageRank: per-window edge-list state, the
        # exact delta recurrence replayed in-state on every micro-batch
        # touching the window. On the chain graph every vertex has
        # in-degree <= 1, so the local recurrence is bit-identical to the
        # distributed batch run and the ec_window_pagerank closed-form
        # oracle applies verbatim; value is monotone -> final = MAX.
        from pyspark.sql.window import Window

        from kafka_graphs_spark.streaming import pagerank_windowed_incremental

        ev = datasets.load(spark, sf, "events")
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        edges = (
            ev.select(
                "user_id", "event_id", "ts",
                F.lag("event_id").over(w).alias("prev_id"),
            )
            .filter(F.col("prev_id").isNotNull())
            .select(
                F.col("prev_id").alias("src"),
                F.col("event_id").alias("dst"),
                F.col("ts").alias("event_time"),
            )
            .repartition(4)
        )
        out = _run_stateful_stream(
            spark, edges,
            lambda s: pagerank_windowed_incremental(s, "1 hour", max_iterations=5),
            "src long, dst long, event_time timestamp_ntz",
            "window_start timestamp_ntz, id long, value double",
        )
        final = out.groupBy("window_start", "id").agg(F.max("value").alias("value"))
        start = F.col("window_start")
        epoch_start = (
            F.datediff(start.cast("date"), F.lit("1970-01-01").cast("date")).cast("long") * 86400
            + F.hour(start).cast("long") * 3600
        )
        return final.select(epoch_start.alias("window_start"), "id", "value")

    def ec_window_lp_incr(spark, sf):
        # INCREMENTAL windowed LP: per-window edge-list state, the exact
        # integer LP semantics replayed in-state — bit-identical to the
        # batch run on ANY window content, so the ec_window_lp closed
        # form is the oracle; labels only move up, final = MAX.
        from pyspark.sql.window import Window

        from kafka_graphs_spark.streaming import lp_windowed_incremental

        ev = datasets.load(spark, sf, "events")
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        edges = (
            ev.select(
                "user_id", "event_id", "ts",
                F.lag("event_id").over(w).alias("prev_id"),
            )
            .filter(F.col("prev_id").isNotNull())
            .select(
                F.col("prev_id").alias("src"),
                F.col("event_id").alias("dst"),
                F.col("ts").alias("event_time"),
            )
            .repartition(4)
        )
        out = _run_stateful_stream(
            spark, edges,
            lambda s: lp_windowed_incremental(s, "1 hour", max_iterations=10),
            "src long, dst long, event_time timestamp_ntz",
            "window_start timestamp_ntz, id long, label long",
        )
        final = out.groupBy("window_start", "id").agg(F.max("label").alias("label"))
        start = F.col("window_start")
        epoch_start = (
            F.datediff(start.cast("date"), F.lit("1970-01-01").cast("date")).cast("long") * 86400
            + F.hour(start).cast("long") * 3600
        )
        return final.select(epoch_start.alias("window_start"), "id", "label")

    def ec_window_triangles(spark, sf):
        # per-tumbling-window exact triangles over the hourly user
        # co-occurrence graph (users sharing an event_type that hour);
        # windows are epoch-aligned so window_start == date_trunc('hour')
        from kafka_graphs_spark.streaming import triangles_windowed

        ev = datasets.load(spark, sf, "events")
        occ = ev.select(
            F.window("ts", "1 hour")["start"].alias("ws"),
            "user_id",
            "event_type",
        ).distinct()
        pairs = (
            occ.alias("a")
            .join(occ.alias("b"), on=["ws", "event_type"])
            .filter(F.col("a.user_id") < F.col("b.user_id"))
            .select(
                F.col("a.user_id").alias("src"),
                F.col("b.user_id").alias("dst"),
                F.col("ws").alias("event_time"),
            )
        )
        out = triangles_windowed(pairs, "1 hour")
        start = F.col("window_start")
        epoch_start = (
            F.datediff(start.cast("date"), F.lit("1970-01-01").cast("date")).cast("long") * 86400
            + F.hour(start).cast("long") * 3600
        )
        return out.select(epoch_start.alias("window_start"), "id", "count")

    def emb_neighborhood_features(spark, sf):
        # GraphSAGE-style 1-hop mean aggregation over the exact 3-NN
        # graph, flattened to (id, pos, val) scalar rows for hashing
        from kafka_graphs_spark.pipeline.features import neighborhood_features

        emb = datasets.load(spark, sf, "embeddings")
        knn = similarity.knn_graph(emb, k=3, method="exact").select("src", "dst")
        nf = neighborhood_features(knn, emb, agg="mean")
        return nf.select(
            "id", F.posexplode("feat").alias("pos", "val")
        ).orderBy("id", "pos")

    def doc_jsonl_roundtrip(spark, sf):
        # JSONL corpus sink -> source roundtrip: write the documents table
        # as JSON-Lines, read it back with an explicit schema, and return
        # it — the oracle is the original table, so any drop/dup/type
        # drift in the IO path hash-mismatches.
        import os
        import tempfile

        from kafka_graphs_spark.sources import (
            read_documents_jsonl,
            write_documents_jsonl,
        )

        docs = datasets.load(spark, sf, "documents").select(
            "doc_id", "source", "text"
        )
        path = os.path.join(
            tempfile.gettempdir(), f"kgs_jsonl_roundtrip_{os.getpid()}"
        )
        write_documents_jsonl(docs, path)
        return read_documents_jsonl(spark, path).orderBy("doc_id")

    def doc_source_divergence(spark, sf):
        # per-source unigram KL divergence from the corpus distribution
        docs = datasets.load(spark, sf, "documents")
        return text.source_divergence(docs).orderBy("source")

    def hier_eigenvector(spark, sf):
        # power-iteration eigenvector centrality, t=2 on the DAG hierarchy:
        # all length-2 walks end at regions (customer->nation->region), one
        # per customer, so the closed form is per-region customer counts
        # L2-normalized — a varied, exactly-reproducible twin
        from kafka_graphs_spark.datasets import hierarchy_graph
        from kafka_graphs_spark.library import eigenvector_centrality

        return eigenvector_centrality(hierarchy_graph(spark, sf), iterations=2)

    def doc_dup_spans(spark, sf):
        # ExactSubstr-style span-level duplication: fraction of 8-token
        # windows occurring anywhere else in the corpus (full SQL oracle)
        docs = datasets.load(spark, sf, "documents")
        return dedup.duplicated_spans(docs, w=8).orderBy("doc_id")

    def emb_semantic_dedup(spark, sf):
        # ORACLE-BACKED since r13 via planted one-hot clusters
        # (vec_id % 64): identical vectors share a k-means cell under
        # any trained quantizer; within a cell the only cosine-0.95
        # witnesses are same-planted-cluster mates (cross-cluster cosine
        # is exactly 0), so keep ⇔ id is its planted cluster's minimum
        # ⇔ vec_id < 64 — independent of the (seeded, unprovable)
        # k-means cell ids, which are therefore projected away. The
        # real-corpus keep-rule contract stays pinned by
        # emb_semantic_dedup_inv.
        emb = _planted_onehot(
            datasets.load(spark, sf, "embeddings"), clusters=64
        )
        return similarity.semantic_dedup(
            emb, threshold=0.95, n_clusters=16, dim=64
        ).select("id", "keep")

    def emb_semantic_dedup_inv(spark, sf):
        # invariant oracle for semantic_dedup: against a FRESH exact-cosine
        # pair join on the raw embeddings, (a) every dropped id has a
        # smaller-id same-cluster witness within the threshold (soundness),
        # (b) no kept id has one (completeness), and (c) at this threshold
        # the corpus must yield at least one drop (non-vacuity; cosine>=0.3
        # pairs exist — same corpus fact emb_near_dup_lsh_inv relies on).
        emb = datasets.load(spark, sf, "embeddings")
        res = similarity.semantic_dedup(emb, threshold=0.3, n_clusters=16, dim=64)
        nv = emb.select(
            F.col("vec_id").alias("id"),
            F.transform(
                F.col("embedding").cast("array<double>"),
                lambda x: x
                / F.sqrt(
                    F.aggregate(
                        F.col("embedding").cast("array<double>"),
                        F.lit(0.0),
                        lambda a, y: a + y * y,
                    )
                ),
            ).alias("v"),
        )
        j = res.join(nv, on="id")
        a = j.select(F.col("id").alias("id_a"), F.col("cluster"), F.col("v").alias("va"))
        b = j.select(
            F.col("id").alias("id_b"), F.col("cluster"), F.col("v").alias("vb"),
            F.col("keep").alias("keep_b"),
        )
        witnessed = (
            a.join(b, on="cluster")
            .filter(F.col("id_a") < F.col("id_b"))
            .filter(
                F.aggregate(
                    F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                >= 0.3
            )
            .select(F.col("id_b").alias("id"))
            .distinct()
            .withColumn("_w", F.lit(True))
        )
        chk = res.join(witnessed, on="id", how="left").select(
            "id", "keep", F.coalesce(F.col("_w"), F.lit(False)).alias("w")
        )
        return chk.agg(
            F.sum(F.when(~F.col("keep") & ~F.col("w"), 1).otherwise(0)).alias(
                "unsound_drops"
            ),
            F.sum(F.when(F.col("keep") & F.col("w"), 1).otherwise(0)).alias(
                "missed_drops"
            ),
            (F.sum(F.when(~F.col("keep"), 1).otherwise(0)) > 0).alias("found_drops"),
        )

    def emb_near_dup_lsh_inv(spark, sf):
        # invariant oracle for the rows-only emb_near_dup_lsh path: the
        # exact-cosine verify stage makes precision 1.0 by construction
        # (every emitted pair IS an exact near-dup pair), and at this
        # threshold the candidate generator must find at least one pair.
        emb = datasets.load(spark, sf, "embeddings")
        exact = similarity.embedding_near_duplicates(emb, threshold=0.3).select(
            "id_a", "id_b"
        )
        approx = similarity.embedding_near_duplicates(
            emb, threshold=0.3, method="lsh", n_planes=6, n_tables=8, dim=64
        ).select("id_a", "id_b")
        fp = approx.join(exact, on=["id_a", "id_b"], how="left_anti").agg(
            F.count(F.lit(1)).alias("false_pairs")
        )
        ne = approx.agg((F.count(F.lit(1)) > 0).alias("found_pairs"))
        return fp.crossJoin(ne)

    def hier_kcore_inv(spark, sf):
        # k-core (beyond-reference operator) self-consistency invariants:
        # members are graph vertices, reported degrees are ≥ k AND equal
        # the recomputed degree of the induced undirected subgraph, and
        # the hierarchy graph's 2-core is non-empty (it has triangles).
        from kafka_graphs_spark.datasets import hierarchy_graph
        from kafka_graphs_spark.library import k_core

        g = hierarchy_graph(spark, sf)
        core = k_core(g, 2)
        ids = core.select("id")
        subset = ids.join(g.vertices.select("id"), on="id", how="left_anti").agg(
            F.count(F.lit(1)).alias("subset_violations")
        )
        und = (
            g.edges.select("src", "dst")
            .unionByName(
                g.edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            )
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )
        induced = und.join(
            ids, und["src"] == ids["id"], "left_semi"
        ).join(ids, und["dst"] == ids["id"], "left_semi")
        recomputed = induced.groupBy("src").agg(F.count(F.lit(1)).alias("rdeg"))
        mism = (
            core.join(recomputed, core["id"] == recomputed["src"], "left")
            .select(
                F.when(
                    (F.col("degree") < 2)
                    | (F.coalesce(F.col("rdeg"), F.lit(0)) != F.col("degree")),
                    1,
                ).otherwise(0).alias("bad")
            )
            .agg(F.sum("bad").cast("long").alias("degree_violations"))
        )
        ne = core.agg((F.count(F.lit(1)) > 0).alias("nonempty"))
        return subset.crossJoin(mism).crossJoin(ne)

    def hier_semiclusters_inv(spark, sf):
        # invariant oracle for the rows-only hier_semiclusters path:
        # every kept cluster contains its vertex (SemiClustering keeps
        # clusters CONTAINING self), sizes respect cluster_capacity, and
        # each vertex keeps 1..max_clusters clusters.
        from kafka_graphs_spark.datasets import hierarchy_graph
        from kafka_graphs_spark.library import semi_clustering

        out = semi_clustering(
            hierarchy_graph(spark, sf), iterations=2, max_clusters=2,
            cluster_capacity=4,
        )
        per_vertex = out.select(
            "id",
            F.size("clusters").alias("nc"),
            F.size(
                F.filter("clusters", lambda c: ~F.array_contains(c, F.col("id")))
            ).alias("not_containing_self"),
            F.size(
                F.filter("clusters", lambda c: F.size(c) > 4)
            ).alias("over_capacity"),
        )
        return per_vertex.agg(
            F.sum(F.when((F.col("nc") < 1) | (F.col("nc") > 2), 1).otherwise(0))
            .cast("long").alias("count_violations"),
            F.sum("not_containing_self").cast("long").alias("self_violations"),
            F.sum("over_capacity").cast("long").alias("capacity_violations"),
        )

    # ---- multimodal plumbing (documents as binary payloads) ----

    def multimodal_features(spark, sf):
        docs = datasets.load(spark, sf, "documents")
        media = multimodal.attach_media(docs, "doc_id", F.encode(F.col("text"), "utf-8"), "text")
        feats = multimodal.extract_features(media, strict=False)
        return feats.select("media_id", F.posexplode("features").alias("idx", "feat"))

    # ---- structural decompositions (SCC / MSF / MIS / coloring) ----

    def doc_line_dedup(spark, sf):
        # global line-level dedup at token granularity (the synthetic
        # corpus is single-line, so sep=" " exercises the same machinery:
        # drop tokens present in >= 80% of documents — boilerplate
        # removal semantics). Exact list_filter twin.
        from kafka_graphs_spark.pipeline.text import line_dedup

        docs = datasets.load(spark, sf, "documents")
        min_docs = int(0.8 * docs.count())
        return line_dedup(docs, min_docs=min_docs, sep=" ")

    def doc_bigram_logprob(spark, sf):
        # add-1-smoothed bigram surprisal (order-sensitive perplexity
        # proxy); exact-rational model, ln parity per hier_adamic_adar /
        # doc_unigram_logprob precedent
        from kafka_graphs_spark.pipeline.text import bigram_logprob

        return bigram_logprob(datasets.load(spark, sf, "documents"))

    def ec_json_props(spark, sf):
        # JSON property extraction + per-type profile over events.props
        # (get_json_object vs DuckDB json_extract_string) — integer
        # payloads make every statistic exact
        from kafka_graphs_spark.pipeline.events import json_props_stats

        return json_props_stats(datasets.load(spark, sf, "events"))

    def ec_funnel(spark, sf):
        # strict ordered signup -> view -> purchase funnel: chained
        # min-aggregations on the user key; counts only (timestamps are
        # compared, never emitted, so the ns-long/NTZ split is moot)
        from kafka_graphs_spark.pipeline.events import funnel

        return funnel(
            datasets.load(spark, sf, "events"), ["signup", "view", "purchase"]
        )

    def ec_retention(spark, sf):
        # weekly retention triangle: cohort = absolute week index of the
        # user's first event (exact epoch-seconds div 604800)
        from kafka_graphs_spark.pipeline.events import retention_cohorts

        return retention_cohorts(datasets.load(spark, sf, "events"))

    def ec_asof_attribution(spark, sf):
        # last-touch attribution: each purchase matched to the user's
        # most recent click at or before it — the as-of join
        # (union+window, one shuffle) vs DuckDB's native ASOF LEFT JOIN;
        # equal-ts click ties pre-resolved to max event_id in both
        from kafka_graphs_spark.pipeline.relational import asof_join

        ev = datasets.load(spark, sf, "events")
        purchases = ev.filter(F.col("event_type") == "purchase").select(
            "event_id", "user_id", "ts"
        )
        clicks = (
            ev.filter(F.col("event_type") == "click")
            .groupBy("user_id", "ts")
            .agg(F.max("event_id").alias("click_id"))
        )
        out = asof_join(
            purchases, clicks, key="user_id", ts="ts", right_cols=["click_id"]
        )
        return out.select("event_id", "user_id", "click_id")

    def ec_range_join(spark, sf):
        # point-in-interval range join, bucketized (no BNL): every error
        # event opens a [t, t+600s] incident window; count the events
        # inside each — exact epoch-seconds integers on both engines
        from kafka_graphs_spark.pipeline.events import _epoch_seconds
        from kafka_graphs_spark.pipeline.relational import range_join

        ev = datasets.load(spark, sf, "events")
        secs = _epoch_seconds(ev, "ts")
        pts = ev.select("event_id", secs.alias("s"))
        iv = ev.filter(F.col("event_type") == "error").select(
            F.col("event_id").alias("incident_id"),
            secs.alias("w_start"),
            (secs + F.lit(600)).alias("w_end"),
        )
        joined = range_join(
            pts, iv, ts="s", start="w_start", end="w_end", bucket_width=600
        )
        return joined.groupBy("incident_id").agg(
            F.count(F.lit(1)).cast("long").alias("n_events")
        )

    def ec_interval_join(spark, sf):
        # interval-interval overlap join, bucketized with the canonical-
        # bucket dedup (one copy per overlapping pair, no distinct):
        # error windows [t, t+600] x view windows [t, t+300]
        from kafka_graphs_spark.pipeline.events import _epoch_seconds
        from kafka_graphs_spark.pipeline.relational import interval_join

        ev = datasets.load(spark, sf, "events")
        secs = _epoch_seconds(ev, "ts")
        er = ev.filter(F.col("event_type") == "error").select(
            F.col("event_id").alias("error_id"),
            secs.alias("es"),
            (secs + F.lit(600)).alias("ee"),
        )
        vw = ev.filter(F.col("event_type") == "view").select(
            F.col("event_id").alias("view_id"),
            secs.alias("vs"),
            (secs + F.lit(300)).alias("ve"),
        )
        return interval_join(
            er, vw, "es", "ee", "vs", "ve", bucket_width=600
        ).select("error_id", "view_id")

    def ec_transitions(spark, sf):
        # first-order Markov transition profile of the event stream:
        # one user-partitioned lead() window feeding a map-side count;
        # p(next|prev) is an exact-integer division per output row
        from kafka_graphs_spark.pipeline.events import event_transitions

        return event_transitions(datasets.load(spark, sf, "events"))

    def ec_session_funnel(spark, sf):
        # funnel scoped to 12h sessions (the testdata's inter-event gap
        # is ~10h, so 30-min sessions are singletons): each step must
        # convert within the SAME visit — sessionize + chained
        # min-aggregations on the (user, session) key, exact integer us
        from kafka_graphs_spark.pipeline.sessions import session_funnel

        return session_funnel(datasets.load(spark, sf, "events"), gap_minutes=720)

    def ec_path_ngrams(spark, sf):
        # journey mining: top-20 most frequent 3-step event-type paths;
        # lead() windows + map-side count, |types|^3-bounded output
        from kafka_graphs_spark.pipeline.events import event_path_ngrams

        return event_path_ngrams(datasets.load(spark, sf, "events"))

    def doc_gopher_filter(spark, sf):
        # document-level Gopher quality rules (Rae et al. 2021 §A1.1) as
        # per-row boolean flags + keep conjunction — zero shuffles, every
        # ratio an exact-integer division. Rules are parameterized to the
        # corpus so the flags DISCRIMINATE (r9 audit): stopword rule uses
        # the repo's 13-word English set; word-length band [4.2, 4.8]
        # brackets the corpus's mean-word-length p10-p90; dup-bigram
        # bound 0.08 sits at its p90. flag_symbol_ratio and
        # flag_alpha_ratio stay structurally all-true on this corpus
        # (tokens are pure a-z with no '#'/ellipsis marks) — documented
        # constants, exercised by pytest on adversarial fixtures.
        from kafka_graphs_spark.pipeline.text import STOPWORDS, gopher_filter

        return gopher_filter(
            datasets.load(spark, sf, "documents"),
            stopwords=STOPWORDS["en"],
            min_mean_word_len=4.2, max_mean_word_len=4.8,
            max_dup_bigram_frac=0.08,
        )

    def doc_ppl_buckets(spark, sf):
        # CCNet-style per-source perplexity bucketing (Wenzek et al.
        # 2020): bigram-LM surprisal rounded 6 dp, ntile(3) within each
        # source, NULL-surprisal docs sort last (always 'tail')
        from kafka_graphs_spark.pipeline.text import perplexity_buckets

        return perplexity_buckets(datasets.load(spark, sf, "documents"))

    def doc_dsir_weights(spark, sf):
        # DSIR importance weights (Xie et al. 2023): hashed unigram+bigram
        # buckets (md5, engine-portable), add-k-smoothed target/raw
        # log-ratio model (B-bounded broadcast), per-doc sum rounded 6 dp
        from kafka_graphs_spark.pipeline.sample import dsir_weights

        return dsir_weights(
            datasets.load(spark, sf, "documents"), F.col("lang") == "en"
        )

    def doc_dsir_select(spark, sf):
        # DSIR importance RESAMPLING: Gumbel-top-n over the weights
        # (deterministic md5 Gumbel draws), two-stage top-n — no global
        # sort; 100 docs sampled w/o replacement ∝ exp(weight)
        from kafka_graphs_spark.pipeline.sample import dsir_select

        return dsir_select(
            datasets.load(spark, sf, "documents"), F.col("lang") == "en", 100
        )

    def doc_token_budget(spark, sf):
        # token-budgeted mixture draw: per-source md5-shuffled prefix
        # kept while the exclusive token prefix-sum stays under 600 —
        # budget sweeps are monotone (larger budget = superset)
        from kafka_graphs_spark.pipeline.sample import token_budget_sample
        from kafka_graphs_spark.pipeline.text import token_count

        docs = datasets.load(spark, sf, "documents")
        sized = docs.join(token_count(docs), on="doc_id")
        kept = token_budget_sample(
            sized, budget=600, length_col="n_tokens", strata_col="source"
        )
        return kept.select("doc_id", "source", F.col("n_tokens").cast("long").alias("n_tokens"))

    def doc_dsir_external(spark, sf):
        # DSIR with an EXTERNAL target corpus (the paper's real setup):
        # the target distribution comes from a separate DataFrame — here
        # the src1 slice standing in for a curated reference corpus —
        # raw counts cover the whole scored corpus, target counts only
        # the external frame
        from kafka_graphs_spark.pipeline.sample import dsir_weights

        docs = datasets.load(spark, sf, "documents")
        return dsir_weights(docs, docs.filter(F.col("source") == "src1"))

    def doc_quality_train(spark, sf):
        # distributed logistic-regression trainer: 8 full-batch GD steps,
        # each ONE map-side-combined aggregation (gradient = 4 scalars);
        # 6-dp-rounded gradients make the weights bit-exact vs the
        # chained-CTE SQL replay of the whole training loop
        from kafka_graphs_spark.pipeline.classifier import train_quality_classifier

        return train_quality_classifier(
            datasets.load(spark, sf, "documents"),
            F.col("lang") == "en",
            n_iterations=8,
            lr=0.05,
        )

    def emb_hard_negatives(spark, sf):
        # contrastive hard-negative mining: nearest wrong-label vectors
        # per query — cosine_topk's broadcast shape with the label
        # inequality pruning wrong-label scoring before the window
        from kafka_graphs_spark.pipeline.similarity import hard_negatives

        emb = datasets.load(spark, sf, "embeddings")
        return hard_negatives(emb, emb.filter(F.col("vec_id") < 10), k=5)

    def pipeline_curate_model(spark, sf):
        # curation with the TRAINED model gate replacing the heuristic
        # band gate: train in-engine, keep the top half by model
        # probability (rank cutoff, calibration-free), then the standard
        # near-dup resolution over the survivors — the full fastText/
        # CCNet-style curation loop, oracle-replayed end to end
        from kafka_graphs_spark.pipeline.curate import curate

        return curate(
            datasets.load(spark, sf, "documents"),
            model_target=F.col("lang") == "en",
        )

    def doc_quality_model(spark, sf):
        # linear quality classifier (featurize → dot → sigmoid), the
        # model-based curation gate; 6-dp rounding bounds libm exp skew
        from kafka_graphs_spark.pipeline.text import quality_score_linear

        return quality_score_linear(
            datasets.load(spark, sf, "documents")
        ).select(
            "doc_id",
            F.round("logit", 6).alias("logit"),
            F.round("prob", 6).alias("prob"),
        )

    def hier_transitivity(spark, sf):
        # global clustering coefficient of the customer→nation→region
        # hierarchy (one triangle per customer) — exact wedge/triangle twin
        from kafka_graphs_spark.datasets import hierarchy_graph
        from kafka_graphs_spark.library import transitivity

        return transitivity(hierarchy_graph(spark, sf))

    def gen_louvain_cliques(spark, sf):
        # ring of 10 single-linked K6 cliques: the modularity optimum is
        # one community per clique (pytest-verified exact recovery,
        # Q = 0.8375); canonical labels = min member id ⇒ closed-form twin
        from kafka_graphs_spark import Graph
        from kafka_graphs_spark.library import louvain

        C, K = 10, 6
        base = spark.range(C * K)
        intra = (
            base.select((F.col("id") / K).cast("long").alias("c"), (F.col("id") % K).alias("i"))
            .join(
                base.select((F.col("id") / K).cast("long").alias("c"), (F.col("id") % K).alias("j")),
                on="c",
            )
            .filter(F.col("i") < F.col("j"))
            .select(
                (F.col("c") * K + F.col("i")).alias("src"),
                (F.col("c") * K + F.col("j")).alias("dst"),
                F.lit(1.0).alias("value"),
            )
        )
        ring = spark.range(C).select(
            (F.col("id") * K).alias("src"),
            (((F.col("id") + 1) % C) * K).alias("dst"),
            F.lit(1.0).alias("value"),
        )
        g = Graph.from_edges(intra.unionByName(ring), F.lit(0.0))
        return louvain(g)

    def ec_louvain_inv(spark, sf):
        # invariant oracle for Louvain on real data: every vertex gets
        # exactly one community and Q beats a 0.65 floor (measured 0.83 /
        # 0.81 at sf0.001/0.01 with these caps; the singleton-guard
        # parallel sweeps are deterministic given the xxhash64 parities)
        from kafka_graphs_spark.library import louvain, modularity

        g = _ec_graph(spark, sf)
        res = louvain(g, max_levels=3, max_sweeps=4)
        n = g.vertices.count()
        q = modularity(g, res, label_col="community")
        assigned = res.groupBy().agg(
            F.count(F.lit(1)).alias("rows"),
            F.countDistinct("id").alias("ids"),
        )
        return assigned.crossJoin(q).select(
            ((F.col("rows") == n) & (F.col("ids") == n)).alias("all_assigned"),
            (F.col("modularity") >= 0.65).alias("q_ok"),
        )

    def gen_scc(spark, sf):
        # 40 disjoint 25-cycles, pair-bridged 2k·L → (2k+1)·L: SCC label
        # = min id of the cycle, closed-form twin. Paired bridges keep the
        # condensation 2 peel levels deep (the min-consistent peel removes
        # one condensation level per outer round), which is the regime the
        # algorithm targets — a C-deep condensation chain costs C rounds.
        from kafka_graphs_spark import Graph
        from kafka_graphs_spark.library import strongly_connected_components

        L, C = 25, 40
        base = spark.range(L * C).select(F.col("id").alias("src"))
        within = base.select(
            "src",
            ((F.col("src") / L).cast("long") * L + (F.col("src") % L + 1) % L).alias("dst"),
            F.lit(1.0).alias("value"),
        )
        bridges = spark.range(C // 2).select(
            (F.col("id") * 2 * L).alias("src"),
            ((F.col("id") * 2 + 1) * L).alias("dst"),
            F.lit(1.0).alias("value"),
        )
        g = Graph.from_edges(within.unionByName(bridges), F.lit(0.0))
        return strongly_connected_components(g)

    def gen_msf_complete(spark, sf):
        # K60 with unique weight i*60+j (i<j): the MSF is the star at 0
        # (edge (0,j) costs j; every other edge costs >= 60) — exact twin
        from kafka_graphs_spark import Graph
        from kafka_graphs_spark.library import minimum_spanning_forest

        n = 60
        a = spark.range(n).select(F.col("id").alias("src"))
        b = spark.range(n).select(F.col("id").alias("dst"))
        e = (
            a.crossJoin(b)
            .filter(F.col("src") < F.col("dst"))
            .select("src", "dst", (F.col("src") * n + F.col("dst")).cast("double").alias("value"))
        )
        g = Graph.from_edges(e, F.lit(0.0))
        return minimum_spanning_forest(g)

    def hier_msf_inv(spark, sf):
        # MSF self-consistency on the hierarchy graph: |MSF| = |V| − #WCC
        # (spanning-forest edge count), and every MSF edge is a canonical
        # graph edge carrying that pair's minimum weight.
        from kafka_graphs_spark.datasets import hierarchy_graph
        from kafka_graphs_spark.library import (
            connected_components,
            minimum_spanning_forest,
        )

        g = hierarchy_graph(spark, sf)
        msf = minimum_spanning_forest(g)
        n_v = g.vertices.count()
        n_comp = connected_components(g, max_iterations=200).select("value").distinct().count()
        canon = (
            g.edges.select(
                F.least("src", "dst").alias("src"),
                F.greatest("src", "dst").alias("dst"),
                F.col("value").cast("double").alias("weight"),
            )
            .filter(F.col("src") != F.col("dst"))
            .groupBy("src", "dst")
            .agg(F.min("weight").alias("weight"))
        )
        non_edges = msf.join(canon, on=["src", "dst", "weight"], how="left_anti").agg(
            F.count(F.lit(1)).alias("non_edges")
        )
        deficit = msf.agg(
            (F.lit(n_v - n_comp) - F.count(F.lit(1))).cast("long").alias("edge_deficit")
        )
        return deficit.crossJoin(non_edges)

    def hier_mis_inv(spark, sf):
        # Luby MIS invariants: independent (no graph edge inside the set),
        # maximal (every outsider has a neighbor inside), non-empty.
        from kafka_graphs_spark.datasets import hierarchy_graph
        from kafka_graphs_spark.library import maximal_independent_set

        g = hierarchy_graph(spark, sf)
        mis = maximal_independent_set(g)
        und = (
            g.edges.select("src", "dst")
            .unionByName(g.edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )
        inside = und.join(mis, und["src"] == mis["id"], "left_semi")
        indep = (
            inside.join(mis, inside["dst"] == mis["id"], "left_semi")
            .agg(F.count(F.lit(1)).alias("independence_violations"))
        )
        outsiders = g.vertices.select("id").join(mis, on="id", how="left_anti")
        dominated = und.join(mis, und["src"] == mis["id"], "left_semi").select(
            F.col("dst").alias("id")
        ).distinct()
        maximality = outsiders.join(dominated, on="id", how="left_anti").agg(
            F.count(F.lit(1)).alias("maximality_violations")
        )
        ne = mis.agg((F.count(F.lit(1)) > 0).alias("nonempty"))
        return indep.crossJoin(maximality).crossJoin(ne)

    def hier_coloring_inv(spark, sf):
        # greedy-coloring invariants: proper (no monochrome edge), total
        # (every vertex colored exactly once), Jones-Plassmann per-vertex
        # bound color(v) <= undirected degree(v).
        from kafka_graphs_spark.datasets import hierarchy_graph
        from kafka_graphs_spark.library import greedy_coloring

        g = hierarchy_graph(spark, sf)
        col = greedy_coloring(g)
        und = (
            g.edges.select("src", "dst")
            .unionByName(g.edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )
        mono = (
            und.join(col.select(F.col("id").alias("src"), F.col("color").alias("ca")), on="src")
            .join(col.select(F.col("id").alias("dst"), F.col("color").alias("cb")), on="dst")
            .filter(F.col("ca") == F.col("cb"))
            .agg((F.count(F.lit(1)) / 2).cast("long").alias("monochrome_edges"))
        )
        uncolored = g.vertices.select("id").join(col, on="id", how="left_anti").agg(
            F.count(F.lit(1)).alias("uncolored")
        )
        deg = und.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("deg"))
        over = (
            col.join(deg, on="id", how="left")
            .filter(F.col("color") > F.coalesce("deg", F.lit(0)))
            .agg(F.count(F.lit(1)).alias("degree_violations"))
        )
        return mono.crossJoin(uncolored).crossJoin(over)

    def doc_cross_source_near_dups(spark, sf):
        # SimHash near-dup pairs crossing source boundaries, per source
        # pair — the mirror-detection rollup
        docs = datasets.load(spark, sf, "documents")
        return dedup.cross_source_near_duplicate_profile(docs)

    def doc_unigram_logprob(spark, sf):
        # corpus-unigram surprisal per document (perplexity proxy)
        docs = datasets.load(spark, sf, "documents")
        out = text.unigram_logprob(docs)
        return out.select(
            "doc_id", "n_tokens", F.round("avg_neg_logprob", 6).alias("avg_neg_logprob")
        )

    def sp_bipartite_proj(spark, sf):
        # weighted one-mode projection: suppliers sharing parts
        from kafka_graphs_spark.library import bipartite_projection

        return bipartite_projection(_sp_graph(spark, sf), onto="src")

    def sp_ppmi(spark, sf):
        # PPMI reweighting of the supplier co-occurrence projection.
        # The raw uniform supplier-part graph co-occurs every pair at
        # the independence baseline, so PPMI clipped to ALL ZERO — a
        # vacuous column (round-9 audit). Restrict the bipartite edges
        # to block structure (supplier class src%20 owns parts dst%20,
        # plus a weak global slice dst%97) so within-class pairs earn
        # genuinely positive PMI: 328 positive / 313 distinct values.
        from kafka_graphs_spark import datasets
        from kafka_graphs_spark.graph import Graph
        from kafka_graphs_spark.library import bipartite_projection, ppmi

        edges = datasets.supplier_part_edges(spark, sf).filter(
            (F.col("src") % 20 == F.col("dst") % 20) | (F.col("dst") % 97 == 0)
        )
        pairs = bipartite_projection(
            Graph.from_edges(edges, F.col("id")), onto="src"
        )
        out = ppmi(pairs)
        return out.select(
            "id_a", "id_b", "weight", F.round("ppmi", 6).alias("ppmi")
        )

    def gen_diameter_path(spark, sf):
        # P12: double sweep is exact on trees — (11, endpoints 11 then 0)
        from kafka_graphs_spark.library import diameter_double_sweep
        from kafka_graphs_spark.sources import grid_graph

        return diameter_double_sweep(grid_graph(spark, 1, 12))

    def gen_diameter_star(spark, sf):
        # S50: hub start -> leaf 1 (dist 1, min id), ecc(1) = 2 via leaf 2
        from kafka_graphs_spark.library import diameter_double_sweep
        from kafka_graphs_spark.sources import star_graph

        return diameter_double_sweep(star_graph(spark, 50))

    def sp_degree_histogram(spark, sf):
        # out-degree distribution of the supplier-part graph
        from kafka_graphs_spark.library import degree_histogram

        return degree_histogram(_sp_graph(spark, sf), "out")

    def ec_reciprocity(spark, sf):
        # event-chain edges are strictly time-forward -> reciprocity 0;
        # the counts still pin the simple-edge denominator
        from kafka_graphs_spark.library import reciprocity

        return reciprocity(_ec_graph(spark, sf))

    def hier_powerlaw(spark, sf):
        # continuous-MLE power-law degree exponent (Clauset et al. 2009
        # eq. 3.1) — ln sum folds the SORTED degree histogram, so the
        # accumulation order is fixed on both engines
        from kafka_graphs_spark.datasets import hierarchy_graph
        from kafka_graphs_spark.library import powerlaw_alpha

        return powerlaw_alpha(hierarchy_graph(spark, sf), d_min=2)

    def hier_assortativity(spark, sf):
        # Newman degree assortativity over the hierarchy graph — exact
        # integer sums, DECIMAL(38) cross products, ONE float division
        from kafka_graphs_spark.datasets import hierarchy_graph
        from kafka_graphs_spark.library import degree_assortativity

        return degree_assortativity(hierarchy_graph(spark, sf))

    def emb_knn_wcc(spark, sf):
        # cross-tier composite: nearest-neighbor graph of the embedding
        # table -> WCC clusters (138 components at sf0.01) — verified by a
        # recursive-CTE closure twin
        from kafka_graphs_spark import Graph

        emb = datasets.load(spark, sf, "embeddings")
        knn = similarity.knn_graph(emb, k=1, method="exact")
        g = Graph.from_edges(
            knn.select("src", "dst", F.lit(1.0).alias("value")), F.lit(0.0)
        )
        return connected_components(g, max_iterations=100)

    def gen_harmonic_star(spark, sf):
        # S50: hub = 49·(1/1); leaf = 1/1 + 48·(1/2) — dyadic, exact twin
        from kafka_graphs_spark.library import harmonic_centrality
        from kafka_graphs_spark.sources import star_graph

        return harmonic_centrality(star_graph(spark, 50))

    def emb_knn_graph(spark, sf):
        # exact directed 3-NN graph of the embedding table (the verified
        # baseline; the LSH path is the scale route)
        emb = datasets.load(spark, sf, "embeddings")
        return similarity.knn_graph(emb, k=3, method="exact")

    def gen_topo_levels(spark, sf):
        # directed 20x30 grid: level(cell) = row + col, closed-form twin
        from kafka_graphs_spark.library import topological_levels
        from kafka_graphs_spark.sources import grid_graph

        return topological_levels(grid_graph(spark, 20, 30))

    def gen_lp_weighted(spark, sf):
        # weighted LP (beyond-ref): 100 disjoint 4-vertex blocks, dyadic
        # vote weights — exact chained-CTE twin over 2 update rounds
        from kafka_graphs_spark import Graph

        pat = F.array(*[
            F.struct(F.lit(s).alias("s"), F.lit(d).alias("d"), F.lit(w).alias("w"))
            for s, d, w in [
                (1, 0, 4.0), (3, 0, 1.0), (0, 1, 2.0),
                (3, 2, 2.0), (1, 2, 8.0), (2, 3, 1.0),
            ]
        ])
        edges = (
            spark.range(100)
            .select((F.col("id") * 4).alias("base"), F.explode(pat).alias("e"))
            .select(
                (F.col("base") + F.col("e.s")).alias("src"),
                (F.col("base") + F.col("e.d")).alias("dst"),
                F.col("e.w").alias("value"),
            )
        )
        g = Graph.from_edges(edges, F.col("id"))
        return label_propagation(g, max_iterations=2, weighted=True)

    def gen_pagerank_weighted(spark, sf):
        # weighted PageRank (beyond-ref): 100 disjoint 5-vertex blocks,
        # dyadic weights + reset=0.75 (damp 0.25, init 3.0) make every
        # float op exact — bit-exact chained-CTE twin, no rounding
        from kafka_graphs_spark import Graph

        pat = F.array(*[
            F.struct(F.lit(s).alias("s"), F.lit(d).alias("d"), F.lit(w).alias("w"))
            for s, d, w in [
                (0, 1, 1.0), (0, 2, 3.0), (1, 3, 2.0),
                (2, 3, 1.0), (2, 4, 1.0), (3, 0, 4.0),
            ]
        ])
        edges = (
            spark.range(100)
            .select((F.col("id") * 5).alias("base"), F.explode(pat).alias("e"))
            .select(
                (F.col("base") + F.col("e.s")).alias("src"),
                (F.col("base") + F.col("e.d")).alias("dst"),
                F.col("e.w").alias("value"),
            )
        )
        g = Graph.from_edges(edges, F.lit(0.0))
        out = pagerank(
            g, reset_probability=0.75, max_iterations=3, weighted=True
        )
        return out.select("id", "value")

    def emb_quantize_inv(spark, sf):
        # scalar-quantization invariants over the embeddings table: codes
        # bounded by the level count, reconstruction error within step/2
        from kafka_graphs_spark.pipeline.similarity import dequantize, scalar_quantize

        emb = datasets.load(spark, sf, "embeddings")
        q = scalar_quantize(emb, levels=256)
        rec = dequantize(q, levels=256)
        joined = (
            emb.select("vec_id", F.col("embedding").alias("orig"))
            .join(rec.select("vec_id", F.col("embedding").alias("back")), on="vec_id")
            .join(q.select("vec_id", "codes", "lo", "hi"), on="vec_id")
        )
        err = F.aggregate(
            F.zip_with(
                F.col("orig"), F.col("back"),
                lambda a, b: F.abs(a.cast("double") - b),
            ),
            F.lit(0.0),
            lambda acc, x: F.greatest(acc, x),
        )
        bound = (F.col("hi") - F.col("lo")) / F.lit(2.0 * 255) + F.lit(1e-9)
        bad_err = F.when(err > bound, 1).otherwise(0)
        bad_code = F.when(
            (F.array_min("codes") < 0) | (F.array_max("codes") > 255), 1
        ).otherwise(0)
        return joined.agg(
            F.sum(bad_err).cast("long").alias("error_violations"),
            F.sum(bad_code).cast("long").alias("code_violations"),
            (F.count(F.lit(1)) > 0).alias("nonempty"),
        )

    def hier_motifs(spark, sf):
        # directed triad census of the hierarchy graph: every triangle is
        # one customer's (c → nation → region, c → region) feed-forward
        # triple with ascending ids — all 030T, one per customer
        from kafka_graphs_spark.datasets import hierarchy_graph
        from kafka_graphs_spark.library import triangle_motif_census

        return triangle_motif_census(hierarchy_graph(spark, sf))

    def gen_motifs(spark, sf):
        # 50 disjoint blocks each holding one triangle of every class
        # (030T, 030C, 120, 300) — closed-form census
        from kafka_graphs_spark import Graph
        from kafka_graphs_spark.library import triangle_motif_census

        offs = [
            (1, 2), (2, 3), (1, 3),                    # 030T
            (4, 5), (5, 6), (6, 4),                    # 030C
            (7, 8), (8, 7), (8, 9), (7, 9),            # 120
            (10, 11), (11, 10), (11, 12), (12, 11),    # 300
            (10, 12), (12, 10),
        ]
        pat = F.array(*[F.struct(F.lit(s).alias("s"), F.lit(d).alias("d")) for s, d in offs])
        edges = (
            spark.range(50)
            .select((F.col("id") * 12).alias("base"), F.explode(pat).alias("e"))
            .select(
                (F.col("base") + F.col("e.s")).alias("src"),
                (F.col("base") + F.col("e.d")).alias("dst"),
                F.lit(1.0).alias("value"),
            )
        )
        return triangle_motif_census(Graph.from_edges(edges, F.lit(0.0)))

    def hier_motif_find_triangle(spark, sf):
        # GraphFrames-style pattern finder (library/motif.py) on the
        # hierarchy graph: transitive triangles a→b→c with closing a→c —
        # exactly one per customer (c → nation → region). Oracle = the
        # same three-way equi-join in SQL.
        from kafka_graphs_spark.datasets import hierarchy_graph

        return (
            hierarchy_graph(spark, sf)
            .find("(a)-[]->(b); (b)-[]->(c); (a)-[]->(c)")
            .select(
                F.col("a.id").alias("a_id"),
                F.col("b.id").alias("b_id"),
                F.col("c.id").alias("c_id"),
            )
        )

    def hier_motif_find_wedge_neg(spark, sf):
        # negated-edge motif: customer b and nation c feeding the same
        # region a where b is NOT in nation c — the anti-join discriminates
        # (each customer's own nation is excluded). 4 rows per customer.
        from kafka_graphs_spark.datasets import hierarchy_graph

        return (
            hierarchy_graph(spark, sf)
            .find("(b)-[]->(a); (c)-[]->(a); !(b)-[]->(c)")
            .filter("b.id < 2000000 AND c.id >= 2000000 AND c.id < 3000000")
            .select(
                F.col("b.id").alias("b_id"),
                F.col("c.id").alias("c_id"),
                F.col("a.id").alias("a_id"),
            )
        )

    def ec_motif_find_path(spark, sf):
        # named-edge motif with an edge-attribute predicate: 2-paths in
        # the event chains where the first hop outweighs the second. Edge
        # weights ship raw (|value| of the destination event, no
        # arithmetic → bit-identical across engines).
        return (
            _ec_graph(spark, sf)
            .find("(a)-[e]->(b); (b)-[f]->(c)")
            .filter(F.col("e.value") > F.col("f.value"))
            .select(
                F.col("a.id").alias("a_id"),
                F.col("c.id").alias("c_id"),
                F.col("e.value").alias("w1"),
                F.col("f.value").alias("w2"),
            )
        )

    def ec_sessions(spark, sf):
        # gap-based sessionization over the events table — window-function
        # twin, exact tz-free epoch microseconds
        from kafka_graphs_spark.pipeline.sessions import session_stats

        ev = datasets.load(spark, sf, "events")
        return session_stats(ev, gap_minutes=30)

    # ---- round-9 additions: URL canonicalization tier + corpus datasheet ----

    def doc_url_canonical(spark, sf):
        # fuzzy URL canonicalization (C4/RefinedWeb pre-content-dedup
        # key): scheme/www/port/fragment/index-page dropped, tracking
        # params stripped, surviving params sorted — pure per-row
        # Catalyst exprs, zero shuffles. Oracle derives the canonical
        # key in CLOSED FORM from doc_id arithmetic (independent of the
        # canonicalizer), so a parser regression cannot hide.
        from kafka_graphs_spark.pipeline.domains import canonicalize_urls

        return canonicalize_urls(_doc_urls_messy(spark, sf))

    def doc_url_dedup(spark, sf):
        # URL-level dedup: one survivor (min doc_id) per canonical URL
        # — the cheap gate that runs BEFORE shingle-based content dedup
        # at 100 TB. One map-side-combinable min-agg + equi-join back.
        from kafka_graphs_spark.pipeline.domains import url_dedup

        return url_dedup(_doc_urls_messy(spark, sf))

    def pipeline_curate_url(spark, sf):
        # curation with URL-level dedup FIRST (one survivor per
        # canonical URL, then quality gate -> shingle dedup on the
        # survivors) — the C4/RefinedWeb gate order: the cheap URL key
        # removes the bulk of crawl duplicates before pair generation
        # ever runs.
        from kafka_graphs_spark.pipeline.curate import curate

        return curate(
            _doc_urls_messy(spark, sf),
            min_score=0.6, n=3, jaccard_threshold=0.05,
            url_dedup_first=True,
        )

    def doc_shard_datasheet(spark, sf):
        # per-shard DATA CARD (r11): the shard manifest joined with
        # language mix + quality rollups — same cumsum arithmetic as
        # doc_shards, language columns flat (zh lands in n_other_lang,
        # 75 docs at sf0.01, so the bucket is never vacuous), quality
        # aggregated as exact integer deci-scores with ONE final
        # division (no float-summation-order dependence).
        from kafka_graphs_spark.pipeline.shards import shard_datasheet

        return shard_datasheet(
            datasets.load(spark, sf, "documents"), tokens_per_shard=500
        )

    def doc_bloom_url_dedup(spark, sf):
        # cross-snapshot incremental URL dedup (r11): the corpus
        # snapshot's canonical URLs become a FIXED-SIZE Bloom filter —
        # the persisted crawl state — and the new snapshot probes it
        # (seen -> dropped, zero false negatives), then resolves
        # within-snapshot dups exactly. Split doc_id%3 (200 % 3 != 0, so
        # the split does NOT correlate with the page identity p =
        # doc_id%200, and canonical keys genuinely straddle it; a %2 or
        # %5 split would make the sides disjoint). Audit row: exact-side
        # counts closed-form; FN must be 0; FPs within the analytic
        # bound; Bloom keeps ⊆ exact keeps.
        from kafka_graphs_spark.pipeline.bloom import bloom_url_dedup_check

        docs = _doc_urls_messy(spark, sf)
        return bloom_url_dedup_check(
            docs.filter(F.col("doc_id") % 3 == 2),
            docs.filter(F.col("doc_id") % 3 < 2),
        )

    def ec_heavy_hitters_inv(spark, sf):
        # distributed Misra-Gries heavy hitters (mergeable summaries):
        # guarantee audit vs exact counts over a deterministically
        # SKEWED item stream (event_id%3 -> item 7 with ~n/3 mass,
        # event_id%5 -> item 11, else a ~uniform per-user tail), so
        # n_heavy = 2 and top1 are data-derived, never vacuous. The
        # estimates themselves are partition-dependent (any MG is);
        # the guarantees are not — the row checks the guarantees.
        from kafka_graphs_spark.streaming import heavy_hitters_check

        ev = datasets.load(spark, sf, "events")
        item = (
            F.when(F.col("event_id") % 3 == 0, F.lit(7))
            .when(F.col("event_id") % 5 == 0, F.lit(11))
            .otherwise(F.col("user_id") + 1000)
        )
        return heavy_hitters_check(
            ev.select(item.alias("item")), "item", k=20
        )

    def pipeline_curate_domain(spark, sf):
        # curation with the C4 domain blocklist gate: quality gate ->
        # drop blocked registered domains (subdomains included) ->
        # shingle dedup on the survivors — the composite the r8 verdict
        # marked weak for lack of a driver row
        from kafka_graphs_spark.pipeline.curate import curate

        return curate(
            _doc_urls(spark, sf),
            min_score=0.6, n=3, jaccard_threshold=0.05,
            blocked_domains=["shop.com", "news.co.uk"],
        )

    def pipeline_curate_domcap(spark, sf):
        # curation with BOTH per-domain budgets (r10): quality gate ->
        # hash-ordered doc cap (12/domain; post-gate domains hold ~14-15
        # docs, so the cap bites) -> token budget (400/domain over cap
        # survivors, ~54 tokens/doc -> ~7-8 survive) -> shingle dedup.
        # The RefinedWeb "no domain dominates" rule applied at curation
        # time, both by doc count and by token mass.
        from kafka_graphs_spark.pipeline.curate import curate

        return curate(
            _doc_urls(spark, sf),
            min_score=0.6, n=3, jaccard_threshold=0.05,
            max_docs_per_domain=12, max_tokens_per_domain=400,
        )

    def doc_calibration(spark, sf):
        # classifier reliability table: train the quality classifier
        # (bit-exact GD loop, as doc_quality_train), score every doc,
        # bin 6-dp probs, per-bin mean prob vs observed label rate —
        # the model-quality artifact beside the datasheet. The target
        # (token count >= 40) is separable by log_n_tokens, so the
        # probabilities spread across 7+ bins and calibration structure
        # is visible (overconfident low bins, calibrated top).
        from kafka_graphs_spark.pipeline.classifier import calibration_report

        return calibration_report(
            datasets.load(spark, sf, "documents"),
            F.size(text.tokens(F.col("text"))) >= 40,
            n_iterations=40, lr=0.2, bins=10,
        )

    def doc_shards(spark, sf):
        # deterministic fixed-token-budget shard packing (two-level
        # exact cumsum — bounded partitions at any source size); the
        # oracle recomputes the cumsum as ONE flat window, a different
        # formulation of the same arithmetic
        from kafka_graphs_spark.pipeline.shards import assign_shards

        return assign_shards(
            datasets.load(spark, sf, "documents"),
            tokens_per_shard=500, bucket_size=100,
        )

    def doc_shard_manifest(spark, sf):
        # shard-level manifest (doc/token counts + doc_id range per
        # shard) — the writer-job artifact
        from kafka_graphs_spark.pipeline.shards import (
            assign_shards,
            shard_manifest,
        )

        return shard_manifest(assign_shards(
            datasets.load(spark, sf, "documents"),
            tokens_per_shard=500, bucket_size=100,
        ))

    def doc_mixture_plan(spark, sf):
        # mixture table: per-source availability vs target weights ->
        # target tokens, epochs, oversampling flags (binding: budget
        # chosen so some sources need >1 epoch and some don't)
        from kafka_graphs_spark.pipeline.shards import mixture_plan

        return mixture_plan(
            datasets.load(spark, sf, "documents"),
            weights={"src0": 0.5, "src1": 0.3, "src2": 0.2},
            budget_tokens=6000,
        )

    def doc_datasheet(spark, sf):
        # corpus data card: language mix, source mix, quality histogram,
        # overall totals — ONE corpus pass (a single GROUPING SETS
        # aggregate; every section map-side-combines in the same
        # shuffle). Exact ints until the two final share divisions.
        from kafka_graphs_spark.pipeline.datasheet import corpus_datasheet

        return corpus_datasheet(datasets.load(spark, sf, "documents"))

    def doc_incremental_dedup(spark, sf):
        # crawl-increment dedup (r10): the last 100 documents arrive as
        # a new snapshot and deduplicate against the first 400 (the
        # already-curated corpus), then within themselves — the
        # daily-ingest shape. Exact inverted-index path (the oracle
        # path; the banded-LSH method is the scale twin, verified exact
        # either way). threshold 0.05 mirrors the curate composites'
        # operating point, where the corpus has real cluster structure.
        from kafka_graphs_spark.pipeline.dedup import incremental_dedup

        docs = datasets.load(spark, sf, "documents")
        return incremental_dedup(
            docs.filter(F.col("doc_id") >= 400),
            docs.filter(F.col("doc_id") < 400),
            n=3,
            threshold=0.05,
        )

    def doc_shard_roundtrip(spark, sf):
        # shard WRITER path (r10; r11 hardened): assign -> write the
        # partitioned (source, shard) layout + manifest to disk ->
        # return the manifest RECOMPUTED from the re-read DATA files
        # (partition dirs included). Same oracle arithmetic as
        # doc_shard_manifest — green means the data files themselves
        # carry the exact planned assignment through the writer and
        # back, not merely that the manifest artifact round-tripped.
        import shutil
        import tempfile

        from kafka_graphs_spark.pipeline.shards import (
            assign_shards,
            write_shards,
        )

        d = tempfile.mkdtemp(prefix="kgs_shards_")
        try:
            manifest = write_shards(
                assign_shards(
                    datasets.load(spark, sf, "documents"),
                    tokens_per_shard=500,
                    bucket_size=100,
                ),
                d,
            )
            rows = manifest.collect()
        finally:
            shutil.rmtree(d, ignore_errors=True)
        return spark.createDataFrame(
            rows,
            "source string, shard long, n_docs long, n_tokens long,"
            " first_doc_id long, last_doc_id long",
        )

    def doc_fix_text(spark, sf):
        # encoding-artifact repair (r10, ftfy-lite). The corpus is pure
        # ASCII, so artifacts are INJECTED in closed form per doc_id
        # (mojibake prefix chosen by doc_id % 5 + a trailing zero-width
        # char), then repaired; the oracle rebuilds the expected clean
        # form directly (mapped prefix + whitespace-collapsed text) —
        # independent of the repair chain's implementation.
        from kafka_graphs_spark.pipeline.text import fix_text

        moji = ["\u00e2\u20ac\u2122", "\u00e2\u20ac\u0153",
                "\u00e2\u20ac\u009d", "\u00e2\u20ac\u201c",
                "\u00e2\u20ac\u00a6"]
        docs = datasets.load(spark, sf, "documents")
        injected = docs.select(
            "doc_id",
            F.concat(
                F.element_at(
                    F.array(*[F.lit(m) for m in moji]),
                    (F.col("doc_id") % 5).cast("int") + 1,
                ),
                F.lit(" "),
                F.col("text"),
                F.lit("\u200b"),
            ).alias("text"),
        )
        return fix_text(injected)

    def doc_strip_markup(spark, sf):
        # HTML residue removal (r10; r11 hardened): tags + entities
        # injected in closed form per doc_id over the pure-ASCII corpus
        # (tag name by doc_id % 4, attribute, entity tail). The tail
        # now includes the ESCAPED entity '&amp;lt;', which must decode
        # to the literal '&lt;' — not '<' — i.e. '&amp;' decodes LAST
        # (the r11 ADVICE fix). Checked against an oracle that rebuilds
        # the expected clean form DIRECTLY (collapsed text + decoded
        # tail) — independent of the stripper's implementation.
        from kafka_graphs_spark.pipeline.text import strip_markup

        docs = datasets.load(spark, sf, "documents")
        tag = F.element_at(
            F.array(F.lit("p"), F.lit("div"), F.lit("span"), F.lit("a")),
            (F.col("doc_id") % 4).cast("int") + 1,
        )
        injected = docs.select(
            "doc_id",
            F.concat(
                F.lit("<"), tag, F.lit(' class="x">'),
                F.col("text"),
                F.lit("</"), tag,
                F.lit("> x &amp;lt; y &amp; tail&nbsp;end"),
            ).alias("text"),
        )
        return strip_markup(injected)

    def ec_hot_keys(spark, sf):
        # join-key skew audit (r10): top-10 heaviest keys of the same
        # deterministically skewed item stream ec_heavy_hitters_inv
        # sketches (item 7 ~ n/3, item 11 ~ 2n/15, then a ~uniform user
        # tail) — ranks, counts, and shares all data-derived with real
        # spread. The report a pipeline runs BEFORE keying a 100 TB
        # shuffle on a column.
        from kafka_graphs_spark.pipeline.datasheet import hot_keys

        ev = datasets.load(spark, sf, "events")
        item = (
            F.when(F.col("event_id") % 3 == 0, F.lit(7))
            .when(F.col("event_id") % 5 == 0, F.lit(11))
            .otherwise(F.col("user_id") + 1000)
        )
        return hot_keys(ev.select(item.alias("item")), "item", k=10)

    def ec_hot_keys_stream(spark, sf):
        # ONLINE skew monitor (r11): the streaming twin of ec_hot_keys —
        # the same deterministically skewed item stream replayed as a
        # REAL 3-file multi-batch update-mode stream, per-7-day-window
        # running counts (ONE windowed stateful agg, watermark-evicted
        # state), then the per-window top-5 ranked in the batch
        # finalizer over the monotone emissions (per-key max). Oracle is
        # the closed-form per-window top-k over the same item and
        # epoch-aligned window arithmetic.
        import shutil
        import tempfile

        from kafka_graphs_spark.streaming import (
            finalize_hot_keys,
            streaming_hot_keys,
        )

        ev = datasets.load(spark, sf, "events")
        item = (
            F.when(F.col("event_id") % 3 == 0, F.lit(7))
            .when(F.col("event_id") % 5 == 0, F.lit(11))
            .otherwise(F.col("user_id") + 1000)
        )
        base = ev.select(item.cast("long").alias("item"), "ts")
        dirs = {}
        rows: list = []
        try:
            d = tempfile.mkdtemp(prefix="kgs_hk_src_")
            dirs["src"] = d
            base.repartition(3).write.mode("overwrite").parquet(d)
            ckpt = tempfile.mkdtemp(prefix="kgs_hk_ckpt_")
            dirs["ckpt"] = ckpt
            stream = (
                spark.readStream.schema("item long, ts timestamp")
                .option("maxFilesPerTrigger", 1)
                .parquet(d)
            )
            counts = streaming_hot_keys(
                stream, "item", "ts", "7 days", watermark="3650 days"
            )

            def sink(batch_df, _bid):
                rows.extend(batch_df.collect())

            q = (
                counts.writeStream.foreachBatch(sink)
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            # never rmtree under a live query (see ec_stream_join)
            if not q.awaitTermination(600):
                q.stop()
                raise TimeoutError("ec_hot_keys_stream: query exceeded 600s")
        finally:
            for p in dirs.values():
                shutil.rmtree(p, ignore_errors=True)
        emissions = spark.createDataFrame(
            [(r["window_start"], r["key"], r["n_rows"]) for r in rows],
            "window_start long, key long, n_rows long",
        )
        return finalize_hot_keys(emissions, k=5)

    def _license_injected(docs):
        # shared injection for the r11 license tier: the pure-ASCII
        # corpus carries no reuse signals (verified 0 hits at all SFs),
        # so robots meta / CC URLs / SPDX / rights boilerplate are
        # injected in closed form per doc_id — the oracle rebuilds the
        # expected signals from doc_id arithmetic alone, independent of
        # the extractor's regexes. Injections join the text BOTH sides,
        # so downstream token stats stay in exact parity.
        prefix = (
            F.when(F.col("doc_id") % 7 == 0,
                   F.lit('<meta name="robots" content="noindex, follow"> '))
            .when(F.col("doc_id") % 7 == 1,
                  F.lit('<meta name="robots" content="index, follow"> '))
            .when(F.col("doc_id") % 7 == 2,
                  # must NOT match: directive tokens are whole-token
                  F.lit('<meta name="robots" content="noindexing"> '))
            .when(F.col("doc_id") % 7 == 3,
                  # content-first, single-quoted (r12): the real-crawl
                  # variant the widened extractor must honor
                  F.lit("<meta content='noarchive' name='robots'> "))
            .when(F.col("doc_id") % 7 == 4,
                  # fully-unquoted attributes (r13): must opt out
                  F.lit("<meta name=robots content=noindex> "))
            .when(F.col("doc_id") % 7 == 5,
                  # explicitly-EMPTY canonical tag + content-first decoy
                  # (r13): presence-based priority stops at the empty
                  # tag — robots = '', NOT 'noarchive'
                  F.lit('<meta name="robots" content=""> '
                        "<meta content='noarchive' name='robots'> "))
            .otherwise(F.lit(""))
        )
        tail = (
            F.when(F.col("doc_id") % 5 == 0,
                   F.lit(" https://creativecommons.org/licenses/by/4.0/"))
            .when(F.col("doc_id") % 5 == 1,
                  F.lit(" https://creativecommons.org/licenses/by-nc/4.0/"))
            .when(F.col("doc_id") % 5 == 2,
                  F.lit(" https://creativecommons.org/publicdomain/zero/1.0/"))
            .when(F.col("doc_id") % 5 == 3,
                  F.lit(" SPDX-License-Identifier: MIT"))
            .otherwise(F.lit(""))
        )
        rights = F.when(
            F.col("doc_id") % 11 == 0, F.lit(" All Rights Reserved.")
        ).otherwise(F.lit(""))
        return docs.withColumn(
            "text", F.concat(prefix, F.col("text"), tail, rights)
        )

    def doc_license_signals(spark, sf):
        # reuse-signal extraction (r11): robots meta content + opt-out,
        # CC license slug, SPDX id, rights boilerplate — all from the
        # closed-form injection above; scan-speed expressions only.
        from kafka_graphs_spark.pipeline.licenses import license_signals

        return license_signals(
            _license_injected(datasets.load(spark, sf, "documents"))
        )

    def pipeline_curate_licensed(spark, sf):
        # curation with the reuse-policy gate (r11): quality -> honor
        # robots opt-outs + permissive-CC allowlist -> dedup. Drops
        # doc_id%7==0 (noindex), doc_id%7==3 (noarchive, content-first
        # single-quoted tag — r12), doc_id%7==4 (unquoted noindex —
        # r13) and doc_id%5==1 (by-nc) among quality survivors;
        # doc_id%7==5 (empty canonical tag + content-first decoy — r13)
        # is NOT dropped: presence-based priority stops at the empty
        # tag. Both sides run the chain over the SAME injected text,
        # so token stats and shingles stay in exact parity.
        from kafka_graphs_spark.pipeline.curate import curate
        from kafka_graphs_spark.pipeline.licenses import PERMISSIVE_CC

        return curate(
            _license_injected(datasets.load(spark, sf, "documents")),
            min_score=0.6, n=3, jaccard_threshold=0.05,
            respect_robots=True, license_allow=list(PERMISSIVE_CC),
        )

    def doc_curate_report(spark, sf):
        # gate-by-gate curation funnel (r10): quality 0.7 (drops the 47
        # score-0.6 docs), blocklist ['dup'] (25 docs carry the token,
        # some already quality-dropped), then dedup resolution at the
        # curate composites' 0.05 operating point — every n_in /
        # n_dropped / n_out data-derived, reconciling exactly with the
        # chained-CTE oracle's stage counts.
        from kafka_graphs_spark.pipeline.curate import curate_report

        return curate_report(
            datasets.load(spark, sf, "documents"),
            min_score=0.7, n=3, jaccard_threshold=0.05,
            blocklist=["dup"],
        )

    def emb_incremental_dedup(spark, sf):
        # embedding-space ingest dedup (r10 — the SemDeDup twin of
        # doc_incremental_dedup). The synthetic embeddings have no
        # organic near-dups (clusters top out at cos ~0.46), so the
        # increment is PLANTED with deterministic structure: 40
        # perturbed corpus copies (dup_of_corpus), 20 NEGATED-vector
        # pairs (a tight new cluster each — negation keeps them far
        # from every corpus vector, cos ~-1 vs ~0.99 within the pair),
        # and 20 negated singletons. Expected: 40 dups, 40 keeps
        # (20 pair-minima + 20 singletons), 20 cluster losers.
        emb = datasets.load(spark, sf, "embeddings").select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("embedding"),
        )

        def shifted(pred, neg, coord, offset):
            def f(x, i):
                base = -x if neg else x
                return F.when(i == coord, base + F.lit(0.1)).otherwise(base)

            return emb.filter(pred).select(
                (F.col("vec_id") + offset).alias("vec_id"),
                F.transform("embedding", f).alias("embedding"),
            )

        lo40 = F.col("vec_id") < 40
        mid = (F.col("vec_id") >= 40) & (F.col("vec_id") < 60)
        hi = (F.col("vec_id") >= 60) & (F.col("vec_id") < 80)
        new = (
            shifted(lo40, False, 0, 1000000)
            .unionByName(shifted(mid, True, 0, 2000000))
            .unionByName(shifted(mid, True, 1, 3000000))
            .unionByName(shifted(hi, True, 2, 4000000))
        )
        return similarity.incremental_embedding_dedup(
            new, emb, threshold=0.9
        )

    def doc_quantile_sketch_inv(spark, sf):
        # deterministic mergeable quantile summary (r10 — the order-
        # statistics sibling of ec_heavy_hitters_inv): per-probe audit
        # of the block-max summary against exact order statistics over
        # documents.n_chars. target_rank / n_values / true_value are
        # exact and data-derived; within_bound checks the sketch's rank
        # contract (estimates themselves are partition-dependent, as
        # any deterministic summary's are — the guarantees are not).
        from kafka_graphs_spark.streaming import quantile_sketch_check

        return quantile_sketch_check(
            datasets.load(spark, sf, "documents"),
            "n_chars",
            k=32,
            probes=[0.1, 0.25, 0.5, 0.75, 0.9, 0.99],
        )

    def doc_datasheet_stream(spark, sf):
        # REAL streaming data card (r10): documents replayed as a
        # 3-file stream (maxFilesPerTrigger=1 -> multiple micro-batches),
        # synthetic event time doc_id minutes -> one card per 1h
        # tumbling window, update mode; counts are monotone across
        # re-emissions so the final card is the per-key max. Late docs
        # would update only their own window's card — the streaming
        # complement of doc_datasheet, via the incremental-tier recipe.
        import shutil
        import tempfile

        from kafka_graphs_spark.pipeline.datasheet import (
            corpus_datasheet_stream,
        )

        base = datasets.load(spark, sf, "documents").select(
            "doc_id",
            "text",
            "lang",
            "source",
            F.timestamp_micros(F.col("doc_id") * 60_000_000).alias(
                "event_time"
            ),
        )
        dirs = {}
        rows: list = []
        try:
            d = tempfile.mkdtemp(prefix="kgs_ds_src_")
            dirs["src"] = d
            base.repartition(3).write.mode("overwrite").parquet(d)
            ckpt = tempfile.mkdtemp(prefix="kgs_ds_ckpt_")
            dirs["ckpt"] = ckpt
            stream = (
                spark.readStream.schema(
                    "doc_id long, text string, lang string, source string,"
                    " event_time timestamp"
                )
                .option("maxFilesPerTrigger", 1)
                .parquet(d)
            )
            card = corpus_datasheet_stream(
                stream, "1 hour", watermark="3650 days"
            ).select(
                # timestamp -> epoch seconds: tz-free, engine-portable
                F.col("window_start").cast("long").alias("window_start"),
                "section",
                "key",
                "n_docs",
                "n_tokens",
            )

            def sink(batch_df, _bid):
                rows.extend(batch_df.collect())

            q = (
                card.writeStream.foreachBatch(sink)
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            # never rmtree under a live query (see ec_stream_join)
            if not q.awaitTermination(600):
                q.stop()
                raise TimeoutError("doc_datasheet_stream: query exceeded 600s")
        finally:
            for p in dirs.values():
                shutil.rmtree(p, ignore_errors=True)
        final: dict = {}
        for r in rows:
            k = (r["window_start"], r["section"], r["key"])
            v = (r["n_docs"], r["n_tokens"])
            if k not in final or v > final[k]:
                final[k] = v
        return spark.createDataFrame(
            [k + v for k, v in final.items()],
            "window_start long, section string, key string,"
            " n_docs long, n_tokens long",
        )

    # ------------------------------------------------------------------
    # ORDERING POLICY (the driver's correctness gate checks dict entries
    # 1-50 only): slots 1-50 hold oracle-backed queries, prioritising
    # first-time scoring, then a rotating re-score core. Oracle-backed
    # queries beyond slot 50 all hash-matched in a prior round (rotated
    # out to make room, still runnable). The permanently-no-oracle seeded
    # numerics (ALS/SGD factors, k-means, semi-clustering, MBM) and
    # rows-only ANN variants sit at the tail -- their correctness
    # evidence is the invariant/loss/recall twins inside the window.
    # ------------------------------------------------------------------
    return {
        # -- ROUND-13 WINDOW (generated by scripts/rotate_window.py):
        # slots 1-7 are the seven permanent-tail CONVERSIONS — their
        # constructed fixtures (unique greedy matching, planted one-hot
        # ANN/near-dup/SemDeDup/k-means clusters, strict-chain BPE
        # corpus) made the outputs provably unique, so each now has an
        # oracle and re-scores first (old rows were no_oracle). Slots
        # 8-47 are the stalest r8 cohort (motif/temporal/asof/range
        # joins, DSIR, quality-train, multimodal, the dedup family,
        # cosine top-k, pregel sssp, io roundtrip), slots 48-50 the
        # oldest r9 greens. Target: max staleness <= 4 rounds. --
        "ec_maxbmatching": ec_maxbmatching,
        "emb_lsh_topk": emb_lsh_topk,
        "emb_ivf_topk": emb_ivf_topk,
        "doc_bpe_segments": doc_bpe_segments,
        "emb_near_dup_lsh": emb_near_dup_lsh,
        "emb_semantic_dedup": emb_semantic_dedup,
        "emb_kmeans": emb_kmeans,
        "hier_motif_find_triangle": hier_motif_find_triangle,
        "hier_motif_find_wedge_neg": hier_motif_find_wedge_neg,
        "ec_motif_find_path": ec_motif_find_path,
        "hier_rich_club": hier_rich_club,
        "hier_conductance": hier_conductance,
        "ec_temporal_arrival": ec_temporal_arrival,
        "ec_temporal_departure": ec_temporal_departure,
        "ec_funnel": ec_funnel,
        "ec_retention": ec_retention,
        "ec_asof_attribution": ec_asof_attribution,
        "ec_range_join": ec_range_join,
        "ec_interval_join": ec_interval_join,
        "ec_transitions": ec_transitions,
        "ec_path_ngrams": ec_path_ngrams,
        "ec_session_funnel": ec_session_funnel,
        "doc_gopher_filter": doc_gopher_filter,
        "doc_ppl_buckets": doc_ppl_buckets,
        "doc_dsir_weights": doc_dsir_weights,
        "doc_dsir_select": doc_dsir_select,
        "doc_quality_train": doc_quality_train,
        "pipeline_curate_model": pipeline_curate_model,
        "emb_hard_negatives": emb_hard_negatives,
        "doc_dsir_external": doc_dsir_external,
        "doc_token_budget": doc_token_budget,
        "doc_retrieval_metrics": doc_retrieval_metrics,
        "ec_ppr_multi": ec_ppr_multi,
        "hier_assortativity": hier_assortativity,
        "dedup_containment": dedup_containment,
        "doc_language_mix": doc_language_mix,
        "doc_rank_correlation": doc_rank_correlation,
        "hier_powerlaw": hier_powerlaw,
        "ec_session_stream": ec_session_stream,
        "emb_cosine_topk": emb_cosine_topk,
        "multimodal_features": multimodal_features,
        "dedup_ngram_jaccard": dedup_ngram_jaccard,
        "dedup_minhash": dedup_minhash,
        "dedup_simhash": dedup_simhash,
        "emb_near_dup": emb_near_dup,
        "hier_triangles": hier_triangles,
        "ec_pregel_sssp": ec_pregel_sssp,
        "ec_window_sum": ec_window_sum,
        "sp_io_roundtrip": sp_io_roundtrip,
        "sp_group_reduce_nbrs": sp_group_reduce_nbrs,
        "doc_domains": doc_domains,
        "doc_domain_stats": doc_domain_stats,
        "doc_domain_blocklist": doc_domain_blocklist,
        "doc_domain_cap": doc_domain_cap,
        "doc_domain_quality": doc_domain_quality,
        "ec_stream_join": ec_stream_join,
        "dedup_simhash_pairs": dedup_simhash_pairs,
        "gen_complete_edges": gen_complete_edges,
        "sp_subgraph_edges": sp_subgraph_edges,
        "sp_filter_edges": sp_filter_edges,
        "sp_undirected_edges": sp_undirected_edges,
        "sp_reduce_edges_min_in": sp_reduce_edges_min_in,
        "sp_reduce_neighbors_sum_out": sp_reduce_neighbors_sum_out,
        "sp_group_reduce_max_out": sp_group_reduce_max_out,
        "sp_map_vertices": sp_map_vertices,
        "sp_map_edges": sp_map_edges,
        "gen_grid_edges": gen_grid_edges,
        "gen_star_edges": gen_star_edges,
        "ec_window_sum_sliding": ec_window_sum_sliding,
        "ec_stream_reverse": ec_stream_reverse,
        "ec_stream_undirected": ec_stream_undirected,
        "doc_subword_count": doc_subword_count,
        "doc_language_id": doc_language_id,
        "doc_quality": doc_quality,
        "doc_fingerprint": doc_fingerprint,
        "doc_normalize": doc_normalize,
        "doc_vocabulary": doc_vocabulary,
        "doc_tfidf_keywords": doc_tfidf_keywords,
        "hier_transitivity": hier_transitivity,
        "doc_line_dedup": doc_line_dedup,
        "doc_bigram_logprob": doc_bigram_logprob,
        "ec_json_props": ec_json_props,
        "doc_quality_model": doc_quality_model,
        "emb_pq_recall": emb_pq_recall,
        "emb_pq_codes_inv": emb_pq_codes_inv,
        "gen_scc": gen_scc,
        "gen_msf_complete": gen_msf_complete,
        "hier_msf_inv": hier_msf_inv,
        "hier_mis_inv": hier_mis_inv,
        "hier_coloring_inv": hier_coloring_inv,
        "ec_sessions": ec_sessions,
        "ec_pregel_wcc": ec_pregel_wcc,
        "gen_harmonic_star": gen_harmonic_star,
        "emb_knn_graph": emb_knn_graph,
        "emb_knn_wcc": emb_knn_wcc,
        "sp_degree_histogram": sp_degree_histogram,
        "ec_reciprocity": ec_reciprocity,
        "gen_topo_levels": gen_topo_levels,
        "gen_lp_weighted": gen_lp_weighted,
        "gen_pagerank_weighted": gen_pagerank_weighted,
        "doc_blocklist": doc_blocklist,
        "doc_url_canonical": doc_url_canonical,
        "doc_url_dedup": doc_url_dedup,
        "pipeline_curate_url": pipeline_curate_url,
        "doc_datasheet": doc_datasheet,
        "doc_shards": doc_shards,
        "doc_shard_manifest": doc_shard_manifest,
        "doc_mixture_plan": doc_mixture_plan,
        "doc_calibration": doc_calibration,
        "ec_heavy_hitters_inv": ec_heavy_hitters_inv,
        "pipeline_curate_domain": pipeline_curate_domain,
        "emb_quantize_inv": emb_quantize_inv,
        "hier_motifs": hier_motifs,
        "gen_motifs": gen_motifs,
        "doc_cross_source_near_dups": doc_cross_source_near_dups,
        "doc_unigram_logprob": doc_unigram_logprob,
        "sp_bipartite_proj": sp_bipartite_proj,
        "sp_ppmi": sp_ppmi,
        "gen_diameter_path": gen_diameter_path,
        "gen_diameter_star": gen_diameter_star,
        "doc_chunks": doc_chunks,
        "doc_hash_sample": doc_hash_sample,
        "doc_pii_redact": doc_pii_redact,
        "doc_split": doc_split,
        "gen_ktruss_complete": gen_ktruss_complete,
        "sp_als_loss": sp_als_loss,
        "sp_sgd_loss": sp_sgd_loss,
        "sp_svdpp_loss": sp_svdpp_loss,
        "emb_kmeans_assign": emb_kmeans_assign,
        "hier_semiclusters_inv": hier_semiclusters_inv,
        "ec_maxbmatching_inv": ec_maxbmatching_inv,
        "hier_kcore_inv": hier_kcore_inv,
        "hier_lcc_pregel": hier_lcc_pregel,
        "pipeline_curate": pipeline_curate,
        "pipeline_curate_decontam": pipeline_curate_decontam,
        "pipeline_curate_gated": pipeline_curate_gated,
        "dedup_resolve": dedup_resolve,
        "doc_contamination": doc_contamination,
        "emb_decontamination": emb_decontamination,
        "emb_ivf_recall": emb_ivf_recall,
        "emb_lsh_recall": emb_lsh_recall,
        "emb_near_dup_lsh_inv": emb_near_dup_lsh_inv,
        "ec_stream_distinct": ec_stream_distinct,
        "ec_stream_union": ec_stream_union,
        "gen_betweenness_star": gen_betweenness_star,
        "gen_betweenness_path": gen_betweenness_path,
        "gen_closeness_star": gen_closeness_star,
        "sp_katz": sp_katz,
        "sp_hits": sp_hits,
        "sp_walks": sp_walks,
        "doc_bloom_contamination": doc_bloom_contamination,
        "pipeline_curate_domcap": pipeline_curate_domcap,
        "doc_datasheet_stream": doc_datasheet_stream,
        "doc_quantile_sketch_inv": doc_quantile_sketch_inv,
        "doc_incremental_dedup": doc_incremental_dedup,
        "emb_incremental_dedup": emb_incremental_dedup,
        "doc_shard_roundtrip": doc_shard_roundtrip,
        "doc_fix_text": doc_fix_text,
        "doc_strip_markup": doc_strip_markup,
        "ec_hot_keys": ec_hot_keys,
        "doc_curate_report": doc_curate_report,
        "hier_n2v_walks": hier_n2v_walks,
        "ec_modularity": ec_modularity,
        "hier_ktruss3": hier_ktruss3,
        "hier_graph_stats": hier_graph_stats,
        "doc_bigrams": doc_bigrams,
        "doc_repetition": doc_repetition,
        "doc_language_stats": doc_language_stats,
        "doc_sketch_inv": doc_sketch_inv,
        "doc_source_profile": doc_source_profile,
        "doc_pii_stats": doc_pii_stats,
        "doc_mixture_sample": doc_mixture_sample,
        "doc_pack_sequences": doc_pack_sequences,
        "doc_cap_per_source": doc_cap_per_source,
        "ec_pagerank5": ec_pagerank5,
        "ec_wcc": ec_wcc,
        "ec_sssp": ec_sssp,
        "ec_bfs": ec_bfs,
        "sp_out_degrees": sp_out_degrees,
        "dedup_exact": dedup_exact,
        "doc_token_count": doc_token_count,
        "ec_lp10": ec_lp10,
        "hier_lcc": hier_lcc,
        "ec_window_pagerank": ec_window_pagerank,
        "ec_stream_degrees": ec_stream_degrees,
        "dedup_minhash_lsh": dedup_minhash_lsh,
        "ec_stream_edge_count": ec_stream_edge_count,
        "ec_stream_vertex_count": ec_stream_vertex_count,
        "ec_stream_aggregate": ec_stream_aggregate,
        "ec_stream_global_aggregate": ec_stream_global_aggregate,
        "ec_fold_neighbors": ec_fold_neighbors,
        "emb_ivfpq_recall": emb_ivfpq_recall,
        "emb_semantic_dedup_inv": emb_semantic_dedup_inv,
        "doc_dup_spans": doc_dup_spans,
        "doc_span_removal": doc_span_removal,
        "doc_dedup_rate": doc_dedup_rate,
        "doc_bpe_inv": doc_bpe_inv,
        "doc_bpe_apply_inv": doc_bpe_apply_inv,
        "doc_temperature_sample": doc_temperature_sample,
        "doc_domain_token_budget": doc_domain_token_budget,
        "ec_hot_keys_stream": ec_hot_keys_stream,
        "doc_license_signals": doc_license_signals,
        "pipeline_curate_licensed": pipeline_curate_licensed,
        "doc_bloom_url_dedup": doc_bloom_url_dedup,
        "doc_shard_datasheet": doc_shard_datasheet,
        "doc_weighted_sample": doc_weighted_sample,
        "doc_negative_samples": doc_negative_samples,
        "doc_tfidf_pairs": doc_tfidf_pairs,
        "doc_bm25": doc_bm25,
        "doc_hybrid_retrieval": doc_hybrid_retrieval,
        "doc_zipf_fit": doc_zipf_fit,
        "doc_source_divergence": doc_source_divergence,
        "doc_jsonl_roundtrip": doc_jsonl_roundtrip,
        "dedup_minhash_estimate": dedup_minhash_estimate,
        "pipeline_curate_spans": pipeline_curate_spans,
        "emb_rp_project": emb_rp_project,
        "emb_neighborhood_features": emb_neighborhood_features,
        "hier_eigenvector": hier_eigenvector,
        "hier_avg_nbr_degree": hier_avg_nbr_degree,
        "ec_hyperanf": ec_hyperanf,
        "ec_effective_diameter": ec_effective_diameter,
        "ec_window_wcc": ec_window_wcc,
        "ec_window_lp": ec_window_lp,
        "ec_window_triangles": ec_window_triangles,
        "gen_betweenness_sampled": gen_betweenness_sampled,
        "gen_random_graph": gen_random_graph,
        "gen_wcc_random": gen_wcc_random,
        "ec_stateful_degrees": ec_stateful_degrees,
        "ec_stateful_sessions": ec_stateful_sessions,
        "gen_louvain_cliques": gen_louvain_cliques,
        "ec_louvain_inv": ec_louvain_inv,
        "ec_mssp": ec_mssp,
        "ec_sybilrank": ec_sybilrank,
        "ec_ppr5": ec_ppr5,
        "hier_adamic_adar": hier_adamic_adar,
        "hier_jaccard": hier_jaccard,
        "sp_in_degrees": sp_in_degrees,
        "sp_join_vertices": sp_join_vertices,
        "sp_join_edges": sp_join_edges,
        "sp_join_edges_src": sp_join_edges_src,
        "sp_join_edges_tgt": sp_join_edges_tgt,
        "ec_stream_wcc": ec_stream_wcc,
        "stream_bipartiteness": stream_bipartiteness,
        "ec_spanner": ec_spanner,
        "ec_window_wcc_incr": ec_window_wcc_incr,
        "ec_window_triangles_incr": ec_window_triangles_incr,
        "ec_window_pagerank_incr": ec_window_pagerank_incr,
        "ec_window_lp_incr": ec_window_lp_incr,
        "ec_stateful_heavy": ec_stateful_heavy,
        "sp_als_factors": sp_als_factors,
        "sp_sgd_factors": sp_sgd_factors,
        "hier_semiclusters": hier_semiclusters,
        "emb_ivfpq_topk": emb_ivfpq_topk,
        "sp_svdpp_factors": sp_svdpp_factors,
    }


# ---------------------------------------------------------------------------
# oracles
# ---------------------------------------------------------------------------

def oracle_sql() -> dict[str, str]:
    # the SAME md5-derived +-1 sign matrix random_projection uses, inlined
    # as SQL literals so DuckDB reproduces the projection bit-for-bit
    from kafka_graphs_spark.pipeline.similarity import rp_signs

    _rp = rp_signs(64, 16)
    _rp_values = ", ".join(
        f"({i + 1}, {j}, {_rp[i][j]})" for i in range(64) for j in range(16)
    )

    # registered-domain extraction twin (pipeline/domains.py): host from
    # the same regex, then the eTLD+1 rule over the same suffix set
    from kafka_graphs_spark.pipeline.domains import MULTI_LABEL_SUFFIXES

    _sfx = "[" + ", ".join(f"'{s}'" for s in sorted(set(MULTI_LABEL_SUFFIXES))) + "]"
    _DOMAIN_CTES = f"""
        u AS (SELECT doc_id, {_URL_SQL} AS url FROM documents),
        h AS (SELECT doc_id,
                 regexp_replace(lower(regexp_extract(
                     regexp_replace(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://', ''),
                     '^(?:[^/?#@]*@)?([^/:?#]+)', 1)),
                     '\\.$', '') AS host
              FROM u),
        hl AS (SELECT doc_id, host, string_split(host, '.') AS l,
                      len(string_split(host, '.')) AS n
               FROM h),
        dom AS (SELECT doc_id, host,
                   CASE WHEN regexp_matches(host,
                            '^\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}$')
                            THEN host
                        WHEN n <= 2 THEN host
                        WHEN list_contains({_sfx}, l[-2] || '.' || l[-1])
                            THEN l[-3] || '.' || l[-2] || '.' || l[-1]
                        ELSE l[-2] || '.' || l[-1] END AS domain
                FROM hl)"""

    # chained-CTE replay of train_quality_classifier's full training loop
    # (classifier.py): w{i+1} = w{i} - lr * round6(avg gradient); each
    # iteration is two one-row CTEs, so 8 steps stay a compact query.
    # MATERIALIZED everywhere: without it DuckDB inlines the weight chain
    # and re-evaluates it exponentially (measured 63.5s -> 0.28s).
    _TRAIN_Z = "(wi*intercept + ws*stop_ratio + wm*mean_token_len + wl*log_n_tokens)"
    _TRAIN_P = f"(1.0 / (1.0 + exp(-{_TRAIN_Z})))"

    def _train_ctes(T: int, LR: float, ylabel: str = None) -> list:
        p = _TRAIN_P
        if ylabel is None:
            ylabel = "CAST(CAST(lang = 'en' AS INT) AS DOUBLE)"
        ctes = [
            f"""t AS (SELECT doc_id, {TOKS} AS toks,
                  {ylabel} AS y FROM documents)""",
            f"""feats AS (SELECT doc_id, y,
                  1.0 AS intercept,
                  CASE WHEN len(toks) > 0
                       THEN CAST(len(list_filter(toks, x -> list_contains({STOP_EN}, x))) AS DOUBLE) / len(toks)
                       ELSE 0.0 END AS stop_ratio,
                  CASE WHEN len(toks) > 0
                       THEN CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks)
                       ELSE 0.0 END AS mean_token_len,
                  ln(1.0 + len(toks)) AS log_n_tokens
                  FROM t)""".replace("feats AS (", "feats AS MATERIALIZED ("),
            "w0 AS (SELECT 0.0 AS wi, 0.0 AS ws, 0.0 AS wm, 0.0 AS wl)",
        ]
        for i in range(T):
            ctes.append(
                f"""g{i} AS MATERIALIZED (SELECT
                    round(avg(({p} - y) * intercept), 6) AS gi,
                    round(avg(({p} - y) * stop_ratio), 6) AS gs,
                    round(avg(({p} - y) * mean_token_len), 6) AS gm,
                    round(avg(({p} - y) * log_n_tokens), 6) AS gl
                    FROM feats, w{i})"""
            )
            ctes.append(
                f"""w{i + 1} AS MATERIALIZED (SELECT wi - {LR} * gi AS wi, ws - {LR} * gs AS ws,
                    wm - {LR} * gm AS wm, wl - {LR} * gl AS wl FROM w{i}, g{i})"""
            )
        return ctes

    def _train_sql(T: int, LR: float) -> str:
        p = _TRAIN_P
        # same [1e-12, 1-1e-12] clamp as classifier.py's final log-loss:
        # saturated probabilities would NULL the log and drop the row
        pc = f"GREATEST(1e-12, LEAST({p}, 1.0 - 1e-12))"
        ctes = _train_ctes(T, LR)
        ctes.append(
            f"""lo AS (SELECT round(avg(-y * ln({pc}) - (1.0 - y) * ln(1.0 - {pc})), 6) AS loss
                FROM feats, w{T})"""
        )
        return "WITH " + ",\n".join(ctes) + f"""
            SELECT 'intercept' AS feature, wi AS weight, loss AS final_loss FROM w{T}, lo
            UNION ALL SELECT 'stop_ratio', ws, loss FROM w{T}, lo
            UNION ALL SELECT 'mean_token_len', wm, loss FROM w{T}, lo
            UNION ALL SELECT 'log_n_tokens', wl, loss FROM w{T}, lo
        """

    # calibration report: train (same chained CTEs), score every doc,
    # bin the 6-dp prob into equal-width bins, per-bin mean prob vs
    # observed label rate
    def _calibration_sql(T: int, LR: float, bins: int) -> str:
        p = _TRAIN_P
        # token-count label (len >= 40): separable by log_n_tokens, so
        # the probabilities SPREAD and the reliability table actually
        # has structure (the lang label clusters every doc in one bin)
        ctes = _train_ctes(
            T, LR,
            ylabel=f"CAST(CAST(len({TOKS}) >= 40 AS INT) AS DOUBLE)",
        )
        ctes.append(
            f"""sc AS MATERIALIZED (
                SELECT doc_id, y, round({p}, 6) AS p6 FROM feats, w{T})"""
        )
        return "WITH " + ",\n".join(ctes) + f"""
            SELECT bin, n, mean_prob, label_rate,
                   round(abs(mean_prob - label_rate), 6) AS gap
            FROM (
                SELECT CAST(least(floor(p6 * {bins}), {bins - 1}) AS BIGINT) AS bin,
                       CAST(count(*) AS BIGINT) AS n,
                       round(avg(p6), 6) AS mean_prob,
                       round(sum(y) / count(*), 6) AS label_rate
                FROM sc GROUP BY 1)
        """

    # pipeline_curate with the trained-model gate: train (same CTEs),
    # score every doc with the final weights, keep the top keep_frac by
    # (rounded prob, doc_id) rank, then the standard shingle->Jaccard->
    # WCC->min-id dedup chain over the survivors
    def _curate_model_sql(T: int, LR: float, keep_frac: float) -> str:
        p = _TRAIN_P
        ctes = _train_ctes(T, LR)
        ctes.append(
            f"""sc AS MATERIALIZED (
                SELECT doc_id, round({p}, 6) AS p6 FROM feats, w{T})"""
        )
        ctes.append(
            f"""q AS MATERIALIZED (
                SELECT doc_id FROM (
                    SELECT doc_id,
                           row_number() OVER (ORDER BY p6 DESC, doc_id) AS rn,
                           count(*) OVER () AS n
                    FROM sc)
                WHERE rn <= floor(n * {keep_frac}))"""
        )
        ctes.append("kt AS (SELECT t.doc_id, t.toks FROM t JOIN q USING (doc_id))")
        ctes.append(
            """sh AS (SELECT DISTINCT doc_id,
                   unnest(CASE WHEN len(toks) >= 3
                          THEN list_transform(range(0, len(toks) - 2),
                                              i -> array_to_string(toks[i+1:i+3], ' '))
                          ELSE CAST([] AS VARCHAR[]) END) AS shingle
               FROM kt)"""
        )
        ctes.append("sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1)")
        ctes.append(
            """inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
                  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                  GROUP BY 1, 2)"""
        )
        ctes.append(
            """prs AS (SELECT doc_a, doc_b FROM inter
                JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
                WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.3)"""
        )
        ctes.append(
            """und AS (SELECT doc_a AS s, doc_b AS d FROM prs
                UNION SELECT doc_b, doc_a FROM prs)"""
        )
        ctes.append(
            """reach(id, r) AS (
                SELECT s, s FROM und
                UNION
                SELECT u.d, reach.r FROM reach JOIN und u ON u.s = reach.id
            )"""
        )
        ctes.append("keep AS (SELECT id, MIN(r) AS k FROM reach GROUP BY id)")
        return "WITH RECURSIVE " + ",\n".join(ctes) + """
            SELECT q.doc_id FROM q LEFT JOIN keep ON keep.id = q.doc_id
            WHERE coalesce(keep.k, q.doc_id) = q.doc_id
        """

    return {
        "pipeline_curate_model": _curate_model_sql(8, 0.05, 0.5),
        "doc_quality_train": _train_sql(8, 0.05),
        "doc_calibration": _calibration_sql(40, 0.2, 10),
        # MG guarantee audit: violation counters are 0 by the sketch
        # guarantees; n_heavy / top1 are exact-count facts the oracle
        # derives independently from the same skewed construction
        "ec_heavy_hitters_inv": """
            WITH it AS (SELECT CASE WHEN event_id % 3 = 0 THEN 7
                                    WHEN event_id % 5 = 0 THEN 11
                                    ELSE user_id + 1000 END AS item
                        FROM events),
            c AS (SELECT item, CAST(count(*) AS BIGINT) AS t FROM it GROUP BY 1),
            n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM it)
            SELECT CAST(20 AS BIGINT) AS k,
                   n.n AS n_events,
                   CAST(0 AS BIGINT) AS underest_violations,
                   CAST(0 AS BIGINT) AS error_violations,
                   (SELECT CAST(count(*) AS BIGINT) FROM c, n
                    WHERE t * 21 > 2 * n.n) AS n_heavy,
                   CAST(0 AS BIGINT) AS heavy_missing,
                   (SELECT item FROM c ORDER BY t DESC, item LIMIT 1) AS top1_id,
                   (SELECT max(t) FROM c) AS top1_true
            FROM n
        """,
        "emb_rp_project": f"""
            WITH m(i, j, s) AS (VALUES {_rp_values}),
            v AS (
                SELECT vec_id AS id, u.i, embedding[u.i]::DOUBLE AS val
                FROM embeddings,
                     UNNEST(generate_series(1, len(embedding))) AS u(i)
            )
            SELECT v.id, CAST(m.j AS INTEGER) AS pos,
                   ROUND(0.25 * SUM(v.val * m.s), 6) AS val
            FROM v JOIN m ON v.i = m.i
            GROUP BY v.id, m.j
            ORDER BY v.id, pos
        """,
        "sp_out_degrees": f"""
            WITH e AS ({SP_EDGES}), v AS ({SP_VERTICES})
            SELECT v.id, coalesce(c.cnt, 0) AS value
            FROM v LEFT JOIN (SELECT src, count(*) AS cnt FROM e GROUP BY 1) c ON v.id = c.src
        """,
        "sp_in_degrees": f"""
            WITH e AS ({SP_EDGES}), v AS ({SP_VERTICES})
            SELECT v.id, coalesce(c.cnt, 0) AS value
            FROM v LEFT JOIN (SELECT dst, count(*) AS cnt FROM e GROUP BY 1) c ON v.id = c.dst
        """,
        "sp_katz": f"""
            WITH e AS ({SP_EDGES}), v AS ({SP_VERTICES}),
            w0 AS (SELECT id, 1::BIGINT AS n FROM v),
            w1 AS (SELECT e.dst AS id, CAST(SUM(w0.n) AS BIGINT) AS n
                   FROM e JOIN w0 ON e.src = w0.id GROUP BY 1),
            w2 AS (SELECT e.dst AS id, CAST(SUM(w1.n) AS BIGINT) AS n
                   FROM e JOIN w1 ON e.src = w1.id GROUP BY 1),
            w3 AS (SELECT e.dst AS id, CAST(SUM(w2.n) AS BIGINT) AS n
                   FROM e JOIN w2 ON e.src = w2.id GROUP BY 1)
            SELECT v.id,
                   COALESCE(w1.n, 0) * CAST(0.125 AS DOUBLE)
                   + COALESCE(w2.n, 0) * CAST(0.015625 AS DOUBLE)
                   + COALESCE(w3.n, 0) * CAST(0.001953125 AS DOUBLE) AS katz
            FROM v LEFT JOIN w1 ON v.id = w1.id
                   LEFT JOIN w2 ON v.id = w2.id
                   LEFT JOIN w3 ON v.id = w3.id
        """,
        "sp_hits": f"""
            WITH e AS ({SP_EDGES}), v AS ({SP_VERTICES}),
            h0 AS (SELECT id, 1::BIGINT AS h FROM v),
            a1 AS (SELECT e.dst AS id, CAST(SUM(h0.h) AS BIGINT) AS a
                   FROM e JOIN h0 ON e.src = h0.id GROUP BY 1),
            h1 AS (SELECT e.src AS id, CAST(SUM(a1.a) AS BIGINT) AS h
                   FROM e JOIN a1 ON e.dst = a1.id GROUP BY 1),
            a2 AS (SELECT e.dst AS id, CAST(SUM(h1.h) AS BIGINT) AS a
                   FROM e JOIN h1 ON e.src = h1.id GROUP BY 1),
            h2 AS (SELECT e.src AS id, CAST(SUM(a2.a) AS BIGINT) AS h
                   FROM e JOIN a2 ON e.dst = a2.id GROUP BY 1),
            a3 AS (SELECT e.dst AS id, CAST(SUM(h2.h) AS BIGINT) AS a
                   FROM e JOIN h2 ON e.src = h2.id GROUP BY 1),
            h3 AS (SELECT e.src AS id, CAST(SUM(a3.a) AS BIGINT) AS h
                   FROM e JOIN a3 ON e.dst = a3.id GROUP BY 1)
            SELECT v.id,
                   COALESCE(h3.h, 0::BIGINT) AS hub,
                   COALESCE(a3.a, 0::BIGINT) AS authority
            FROM v LEFT JOIN h3 ON v.id = h3.id LEFT JOIN a3 ON v.id = a3.id
        """,
        "sp_walks": f"""
            WITH e AS ({SP_EDGES}), v AS ({SP_VERTICES}),
            ed AS (SELECT DISTINCT src, dst FROM e),
            adj AS (SELECT src, dst,
                           row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS idx
                    FROM ed),
            dg AS (SELECT src, count(*) AS deg FROM ed GROUP BY 1),
            w0 AS (SELECT (id)::VARCHAR || '#0' AS walk_id, id AS start,
                          CAST(0 AS BIGINT) AS step, id AS vertex FROM v),
            s1 AS (SELECT w.walk_id, w.start, CAST(1 AS BIGINT) AS step, a.dst AS vertex
                   FROM w0 w JOIN dg d ON w.vertex = d.src
                   JOIN adj a ON a.src = w.vertex AND a.idx =
                       (('0x' || substr(md5(w.walk_id || ':walk:1:' || (w.vertex)::VARCHAR), 1, 8))::BIGINT % d.deg)),
            s2 AS (SELECT w.walk_id, w.start, CAST(2 AS BIGINT) AS step, a.dst AS vertex
                   FROM s1 w JOIN dg d ON w.vertex = d.src
                   JOIN adj a ON a.src = w.vertex AND a.idx =
                       (('0x' || substr(md5(w.walk_id || ':walk:2:' || (w.vertex)::VARCHAR), 1, 8))::BIGINT % d.deg)),
            s3 AS (SELECT w.walk_id, w.start, CAST(3 AS BIGINT) AS step, a.dst AS vertex
                   FROM s2 w JOIN dg d ON w.vertex = d.src
                   JOIN adj a ON a.src = w.vertex AND a.idx =
                       (('0x' || substr(md5(w.walk_id || ':walk:3:' || (w.vertex)::VARCHAR), 1, 8))::BIGINT % d.deg))
            SELECT * FROM w0 UNION ALL SELECT * FROM s1
            UNION ALL SELECT * FROM s2 UNION ALL SELECT * FROM s3
        """,
        "sp_subgraph_edges": f"""
            WITH e AS ({SP_EDGES})
            SELECT src, dst, value FROM e
            WHERE src % 2 = 0 AND dst % 2 = 0 AND value > 25
        """,
        "sp_filter_edges": f"""
            WITH e AS ({SP_EDGES}) SELECT src, dst, value FROM e WHERE value > 40
        """,
        "sp_undirected_edges": f"""
            WITH e AS ({SP_EDGES})
            SELECT src, dst, value FROM e
            UNION ALL
            SELECT e.dst AS src, e.src AS dst, e.value FROM e
            WHERE NOT EXISTS (SELECT 1 FROM e r WHERE r.src = e.dst AND r.dst = e.src)
        """,
        "sp_join_vertices": f"""
            WITH e AS ({SP_EDGES}), v AS ({SP_VERTICES})
            SELECT v.id, v.id + coalesce(c.cnt, 0) AS value
            FROM v LEFT JOIN (SELECT src, count(*) AS cnt FROM e GROUP BY 1) c ON v.id = c.src
        """,
        "sp_reduce_edges_min_in": f"""
            WITH e AS ({SP_EDGES})
            SELECT dst AS id, MIN(value) AS value FROM e GROUP BY 1
        """,
        "sp_reduce_neighbors_sum_out": f"""
            WITH e AS ({SP_EDGES})
            SELECT src AS id, CAST(SUM(dst) AS BIGINT) AS value FROM e GROUP BY 1
        """,
        "sp_map_vertices": f"""
            WITH e AS ({SP_EDGES}), v AS ({SP_VERTICES})
            SELECT id, id * 2 + 1 AS value FROM v
        """,
        "sp_map_edges": f"""
            WITH e AS ({SP_EDGES})
            SELECT src, dst, round(value / 2.0 + (src % 10), 6) AS value FROM e
        """,
        "sp_join_edges_src": f"""
            WITH e AS ({SP_EDGES})
            SELECT e.src, e.dst, e.value + c.cnt AS value
            FROM e JOIN (SELECT src, count(*) AS cnt FROM e GROUP BY 1) c USING (src)
        """,
        "sp_join_edges_tgt": f"""
            WITH e AS ({SP_EDGES})
            SELECT e.src, e.dst, e.value + c.cnt AS value
            FROM e JOIN (SELECT dst, count(*) AS cnt FROM e GROUP BY 1) c USING (dst)
        """,
        "sp_join_edges": f"""
            WITH e AS ({SP_EDGES})
            SELECT src, dst, value - (src + dst) AS value FROM e
        """,
        "sp_group_reduce_nbrs": f"""
            WITH e AS ({SP_EDGES}), v AS ({SP_VERTICES})
            SELECT v.id, v.id + coalesce(s.sd, 0) AS value
            FROM v LEFT JOIN
              (SELECT src, CAST(SUM(dst) AS BIGINT) AS sd FROM e GROUP BY 1) s
              ON v.id = s.src
        """,
        "gen_betweenness_star": """
            SELECT range AS id,
                   CASE WHEN range = 0 THEN 1176.0 ELSE 0.0 END AS betweenness
            FROM range(0, 50)
        """,
        "gen_betweenness_path": """
            SELECT range AS id,
                   CAST(range * (11 - range) AS DOUBLE) AS betweenness
            FROM range(0, 12)
        """,
        "gen_closeness_star": """
            SELECT range AS id,
                   CASE WHEN range = 0 THEN 1.0
                        ELSE CAST(49 AS DOUBLE) / 97 END AS closeness
            FROM range(0, 50)
        """,
        "emb_pq_recall": """
            SELECT true AS recall_ok
        """,
        "emb_pq_codes_inv": """
            SELECT true AS all_encoded, true AS m_ok, true AS range_ok
        """,
        "doc_line_dedup": """
            WITH toks AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
            ),
            freq AS (
                SELECT tok FROM toks GROUP BY tok
                HAVING count(DISTINCT doc_id) >=
                       FLOOR(0.8 * (SELECT count(*) FROM documents))
            ),
            fl AS (SELECT coalesce(list(tok), []) AS fl FROM freq)
            SELECT doc_id,
                   array_to_string(
                       list_filter(string_split(text, ' '),
                                   x -> NOT list_contains(fl.fl, x)), ' ') AS text,
                   CAST(len(list_filter(string_split(text, ' '),
                                        x -> NOT list_contains(fl.fl, x))) AS BIGINT)
                       AS n_kept,
                   CAST(len(list_filter(string_split(text, ' '),
                                        x -> list_contains(fl.fl, x))) AS BIGINT)
                       AS n_removed
            FROM documents, fl
        """,
        "doc_bigram_logprob": f"""
            WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
            bg AS (
                SELECT doc_id, unnest(list_zip(toks[1:-2], toks[2:-1])) AS p
                FROM t WHERE len(toks) >= 2
            ),
            b AS (SELECT doc_id, p[1] AS w1, p[2] AS w2 FROM bg),
            c2 AS (SELECT w1, w2, count(*) AS c2 FROM b GROUP BY 1, 2),
            c1 AS (SELECT w1, sum(c2) AS c1 FROM c2 GROUP BY 1),
            v AS (SELECT count(DISTINCT tok) AS v FROM
                  (SELECT unnest(toks) AS tok FROM t)),
            model AS (
                SELECT c2.w1, c2.w2,
                       -ln((c2.c2 + 1.0) / (c1.c1 + 1.0 * v.v)) AS nlp
                FROM c2 JOIN c1 ON c2.w1 = c1.w1, v
            ),
            per_doc AS (
                SELECT b.doc_id, count(*) AS n_bigrams, avg(m.nlp) AS nlp
                FROM b JOIN model m ON b.w1 = m.w1 AND b.w2 = m.w2
                GROUP BY 1
            )
            SELECT d.doc_id,
                   CAST(coalesce(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
                   p.nlp AS avg_neg_logprob
            FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
        """,
        "ec_json_props": """
            SELECT event_type AS "group",
                   count(*) AS n,
                   count(TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE))
                       AS k_nonnull,
                   sum(TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE)) AS k_sum,
                   min(TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE)) AS k_min,
                   max(TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE)) AS k_max,
                   avg(TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE)) AS k_avg
            FROM events GROUP BY 1
        """,
        "doc_quality_model": f"""
            WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
            s AS (SELECT doc_id,
                len(toks) AS n_tokens,
                len(list_filter(toks, x -> list_contains({STOP_EN}, x))) AS n_stop,
                CASE WHEN len(toks) > 0
                     THEN CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks)
                     ELSE 0.0 END AS mean_len
                FROM t),
            lg AS (SELECT doc_id,
                -3.0
                + 6.0 * (CASE WHEN n_tokens > 0
                              THEN CAST(n_stop AS DOUBLE) / n_tokens ELSE 0.0 END)
                + 0.25 * mean_len
                + 0.5 * ln(1.0 + n_tokens) AS logit
                FROM s)
            SELECT doc_id, round(logit, 6) AS logit,
                   round(1.0 / (1.0 + exp(-logit)), 6) AS prob
            FROM lg
        """,
        "hier_transitivity": """
            WITH e0 AS (
                SELECT CAST(c_custkey AS BIGINT) AS src,
                       CAST(c_nationkey + 2000000 AS BIGINT) AS dst FROM customer
                UNION ALL
                SELECT CAST(n_nationkey + 2000000 AS BIGINT),
                       CAST(n_regionkey + 3000000 AS BIGINT) FROM nation
                UNION ALL
                SELECT CAST(c_custkey AS BIGINT), CAST(n_regionkey + 3000000 AS BIGINT)
                FROM customer JOIN nation ON c_nationkey = n_nationkey
            ),
            e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
                  FROM e0 WHERE src <> dst),
            t AS (SELECT count(*) AS t FROM e e1
                  JOIN e e2 ON e1.b = e2.a
                  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
            d AS (SELECT id, count(*) AS d FROM (
                      SELECT a AS id FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
            w AS (SELECT CAST(sum(d * (d - 1) / 2) AS BIGINT) AS w FROM d)
            SELECT t AS n_triangles, w AS n_wedges,
                   3.0 * t / w AS transitivity FROM t, w
        """,
        "gen_louvain_cliques": """
            SELECT range AS id, (range // 6) * 6 AS community FROM range(0, 60)
        """,
        "ec_louvain_inv": """
            SELECT true AS all_assigned, true AS q_ok
        """,
        "gen_scc": """
            SELECT range AS id, (range // 25) * 25 AS value FROM range(0, 1000)
        """,
        "gen_msf_complete": """
            SELECT CAST(0 AS BIGINT) AS src, range AS dst,
                   CAST(range AS DOUBLE) AS weight
            FROM range(1, 60)
        """,
        "hier_msf_inv": """
            SELECT CAST(0 AS BIGINT) AS edge_deficit, CAST(0 AS BIGINT) AS non_edges
        """,
        "hier_mis_inv": """
            SELECT CAST(0 AS BIGINT) AS independence_violations,
                   CAST(0 AS BIGINT) AS maximality_violations,
                   true AS nonempty
        """,
        "hier_coloring_inv": """
            SELECT CAST(0 AS BIGINT) AS monochrome_edges,
                   CAST(0 AS BIGINT) AS uncolored,
                   CAST(0 AS BIGINT) AS degree_violations
        """,
        # stream-stream interval join twin: purchases x same-user clicks
        # in the preceding 30 min, exact epoch-microsecond bounds
        "ec_stream_join": """
            WITH p AS (SELECT event_id AS purchase_id, user_id,
                              epoch_us(ts) AS us
                       FROM events WHERE event_type = 'purchase'),
            c AS (SELECT event_id AS click_id, user_id, epoch_us(ts) AS us
                  FROM events WHERE event_type = 'click')
            SELECT p.purchase_id, p.user_id, c.click_id
            FROM p JOIN c ON p.user_id = c.user_id
                 AND c.us >= p.us - 1800000000
                 AND c.us <= p.us
        """,
        # native F.session_window twin: split at gap >= 30 min (the
        # native window end is exclusive, so an exactly-30-min gap starts
        # a new session — unlike batch sessionize's strict >); bounds as
        # exact naive epoch micros, engine-portable
        "ec_session_stream": """
            WITH s AS (
              SELECT user_id, event_id, value, ts, epoch_us(ts) AS us,
                     CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                            (PARTITION BY user_id ORDER BY ts, event_id)
                          >= 1800000000 THEN 1 ELSE 0 END AS brk
              FROM events),
            s2 AS (SELECT user_id, us, value,
                          SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                            AS session
                   FROM s)
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
                   MIN(us) AS start_us, MAX(us) AS end_us,
                   round(SUM(value), 6) AS total_value
            FROM s2 GROUP BY user_id, session
        """,
        "ec_sessions": """
            WITH s AS (
              SELECT user_id, event_id, value, ts, epoch_us(ts) AS us,
                     CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                            (PARTITION BY user_id ORDER BY ts, event_id)
                          > 1800000000 THEN 1 ELSE 0 END AS brk
              FROM events),
            s2 AS (SELECT user_id, us, value,
                          SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                            AS session
                   FROM s)
            SELECT user_id, CAST(session AS BIGINT) AS session,
                   COUNT(*) AS n_events, MIN(us) AS start_us, MAX(us) AS end_us,
                   MAX(us) - MIN(us) AS duration_us,
                   round(SUM(value), 6) AS total_value
            FROM s2 GROUP BY 1, 2
        """,
        "sp_bipartite_proj": f"""
            WITH e AS ({SP_EDGES}), d AS (SELECT DISTINCT src, dst FROM e)
            SELECT a.src AS id_a, b.src AS id_b, COUNT(*) AS weight
            FROM d a JOIN d b ON a.dst = b.dst AND a.src < b.src
            GROUP BY 1, 2
        """,
        "sp_ppmi": f"""
            WITH e0 AS ({SP_EDGES}),
            e AS (SELECT * FROM e0
                  WHERE src % 20 = dst % 20 OR dst % 97 = 0),
            d AS (SELECT DISTINCT src, dst FROM e),
            p AS (
              SELECT a.src AS id_a, b.src AS id_b, COUNT(*) AS weight
              FROM d a JOIN d b ON a.dst = b.dst AND a.src < b.src
              GROUP BY 1, 2
            ),
            t AS (SELECT SUM(weight) AS t FROM p),
            m AS (SELECT x, SUM(w) AS m FROM (
                    SELECT id_a AS x, weight AS w FROM p
                    UNION ALL SELECT id_b, weight FROM p) GROUP BY 1)
            SELECT p.id_a, p.id_b, p.weight,
                   round(greatest(0.0,
                     ln(p.weight::DOUBLE * t.t / (ma.m::DOUBLE * mb.m::DOUBLE))), 6)
                     AS ppmi
            FROM p CROSS JOIN t
            JOIN m ma ON ma.x = p.id_a
            JOIN m mb ON mb.x = p.id_b
        """,
        "gen_diameter_path": """
            SELECT CAST(11 AS BIGINT) AS lower_bound,
                   CAST(11 AS BIGINT) AS start_id, CAST(0 AS BIGINT) AS far_id
        """,
        "gen_diameter_star": """
            SELECT CAST(2 AS BIGINT) AS lower_bound,
                   CAST(1 AS BIGINT) AS start_id, CAST(2 AS BIGINT) AS far_id
        """,
        "gen_complete_edges": """
            SELECT a.range AS src, b.range AS dst, CAST(1 AS BIGINT) AS value
            FROM range(0, 50) a, range(0, 50) b WHERE a.range <> b.range
        """,
        "gen_grid_edges": """
            WITH cells AS (SELECT range AS id, range // 30 AS r, range % 30 AS c
                           FROM range(0, 600))
            SELECT id AS src, id + 1 AS dst, CAST(1 AS BIGINT) AS value
            FROM cells WHERE c < 29
            UNION ALL
            SELECT id, id + 30, CAST(1 AS BIGINT) FROM cells WHERE r < 19
        """,
        "gen_star_edges": """
            SELECT range AS src, CAST(0 AS BIGINT) AS dst, CAST(1 AS BIGINT) AS value
            FROM range(1, 100)
        """,
        "ec_window_pagerank": """
            WITH RECURSIVE pr(j, r, d) AS (
                SELECT 0, 0.85 * (0.15/0.85), 0.85 * (0.15/0.85)
                UNION ALL
                SELECT j + 1, r + 0.85 * d, (r + 0.85 * d) - r FROM pr WHERE j < 4
            ),
            p AS (SELECT event_id, user_id, ts,
                  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS rn
                  FROM events),
            e AS (SELECT a.user_id, a.event_id AS src, b.event_id AS dst,
                         a.rn AS arn, b.rn AS brn,
                         (CAST(floor(epoch(b.ts)) AS BIGINT) // 3600) * 3600 AS ws
                  FROM p a JOIN p b ON a.user_id = b.user_id AND b.rn = a.rn + 1),
            -- DISTINCT over UNION ALL, not bare UNION: under WITH
            -- RECURSIVE DuckDB stops deduplicating UNION in
            -- non-recursive CTEs of the same WITH list
            v AS (SELECT DISTINCT user_id, ws, id, rn FROM (
                    SELECT user_id, ws, src AS id, arn AS rn FROM e
                    UNION ALL
                    SELECT user_id, ws, dst AS id, brn AS rn FROM e)),
            pos AS (SELECT user_id, ws, id,
                    row_number() OVER (PARTITION BY user_id, ws ORDER BY rn) - 1 AS seg
                    FROM v)
            SELECT ws AS window_start, id, pr.r AS value
            FROM pos JOIN pr ON pr.j = least(pos.seg, 4)
        """,
        # the incremental variant replays the same recurrence in-state;
        # on chain graphs (in-degree <= 1) emissions are bit-identical to
        # the batch run, so the same closed form is the oracle
        "ec_window_pagerank_incr": """
            WITH RECURSIVE pr(j, r, d) AS (
                SELECT 0, 0.85 * (0.15/0.85), 0.85 * (0.15/0.85)
                UNION ALL
                SELECT j + 1, r + 0.85 * d, (r + 0.85 * d) - r FROM pr WHERE j < 4
            ),
            p AS (SELECT event_id, user_id, ts,
                  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS rn
                  FROM events),
            e AS (SELECT a.user_id, a.event_id AS src, b.event_id AS dst,
                         a.rn AS arn, b.rn AS brn,
                         (CAST(floor(epoch(b.ts)) AS BIGINT) // 3600) * 3600 AS ws
                  FROM p a JOIN p b ON a.user_id = b.user_id AND b.rn = a.rn + 1),
            v AS (SELECT DISTINCT user_id, ws, id, rn FROM (
                    SELECT user_id, ws, src AS id, arn AS rn FROM e
                    UNION ALL
                    SELECT user_id, ws, dst AS id, brn AS rn FROM e)),
            pos AS (SELECT user_id, ws, id,
                    row_number() OVER (PARTITION BY user_id, ws ORDER BY rn) - 1 AS seg
                    FROM v)
            SELECT ws AS window_start, id, pr.r AS value
            FROM pos JOIN pr ON pr.j = least(pos.seg, 4)
        """,
        "ec_stream_edge_count": f"""
            WITH pos AS ({EC_POS})
            SELECT CAST(COUNT(*) AS BIGINT) AS count FROM pos WHERE rn > 0
        """,
        "ec_stream_vertex_count": f"""
            WITH pos AS ({EC_POS})
            SELECT CAST(COUNT(*) AS BIGINT) AS count FROM pos
            WHERE user_id IN (
              SELECT user_id FROM pos GROUP BY user_id HAVING COUNT(*) >= 2
            )
        """,
        "ec_stream_aggregate": f"""
            WITH pos AS ({EC_POS})
            SELECT a.event_id AS id, round(SUM(b.w), 6) AS value
            FROM pos a JOIN pos b ON a.user_id = b.user_id AND b.rn = a.rn + 1
            GROUP BY 1
        """,
        "ec_stream_global_aggregate": f"""
            WITH pos AS ({EC_POS})
            SELECT round(SUM(b.w), 6) AS total_w
            FROM pos a JOIN pos b ON a.user_id = b.user_id AND b.rn = a.rn + 1
        """,
        "ec_fold_neighbors": """
            WITH p AS (SELECT event_id, user_id, ts, abs(value) AS w,
                       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS rn
                       FROM events),
            e AS (SELECT a.event_id AS src, b.event_id AS dst, b.w, b.ts
                  FROM p a JOIN p b ON a.user_id = b.user_id AND b.rn = a.rn + 1)
            SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS window_start,
                   src AS id, round(SUM(w * w), 6) AS value
            FROM e GROUP BY 1, 2
        """,
        "ec_window_sum": """
            WITH p AS (SELECT event_id, user_id, ts, abs(value) AS w,
                       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS rn
                       FROM events),
            e AS (SELECT a.event_id AS src, b.event_id AS dst, b.w, b.ts
                  FROM p a JOIN p b ON a.user_id = b.user_id AND b.rn = a.rn + 1)
            SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS window_start,
                   src AS id, round(SUM(w), 6) AS value
            FROM e GROUP BY 1, 2
        """,
        # hopping 1h/30min: every event is in exactly the two windows
        # starting at its 30-min-aligned floor and 30 min before it
        "ec_window_sum_sliding": """
            WITH p AS (SELECT event_id, user_id, ts, abs(value) AS w,
                       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS rn
                       FROM events),
            e AS (SELECT a.event_id AS src, b.event_id AS dst, b.w, b.ts,
                         (CAST(floor(epoch(b.ts)) AS BIGINT) // 1800) * 1800 AS b0
                  FROM p a JOIN p b ON a.user_id = b.user_id AND b.rn = a.rn + 1),
            x AS (SELECT src, w, unnest([b0, b0 - 1800]) AS ws FROM e)
            SELECT ws AS window_start, src AS id, round(SUM(w), 6) AS value
            FROM x GROUP BY 1, 2
        """,
        "ec_stream_reverse": f"""
            WITH pos AS ({EC_POS})
            SELECT b.event_id AS src, a.event_id AS dst, round(b.w, 6) AS value
            FROM pos a JOIN pos b ON a.user_id = b.user_id AND b.rn = a.rn + 1
        """,
        "ec_stream_undirected": f"""
            WITH pos AS ({EC_POS}),
            fwd AS (SELECT a.event_id AS src, b.event_id AS dst, b.w
                    FROM pos a JOIN pos b ON a.user_id = b.user_id AND b.rn = a.rn + 1)
            SELECT src, dst, round(w, 6) AS value FROM fwd
            UNION ALL
            SELECT dst, src, round(w, 6) FROM fwd
        """,
        # blocking over max_hamming+1 signature blocks is COMPLETE for
        # hamming <= max_hamming, so the unblocked pair filter is exact
        "dedup_simhash_pairs": f"""
            WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
            tok AS (SELECT DISTINCT doc_id, unnest(toks) AS tk FROM t),
            h AS (SELECT doc_id, ('0x' || substr(md5(tk), 1, 15))::BIGINT AS h FROM tok),
            bits AS (SELECT doc_id, b,
                            SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
                     FROM h, (SELECT unnest(range(0, 16)) AS b) GROUP BY 1, 2),
            sig AS (SELECT doc_id,
                           CAST(SUM(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END)
                                AS BIGINT) AS simhash
                    FROM bits GROUP BY 1)
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
            FROM sig a JOIN sig b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 2
        """,
        "sp_degree_histogram": f"""
            WITH e AS ({SP_EDGES}), v AS ({SP_VERTICES}),
            deg AS (SELECT src, COUNT(*) AS d FROM (SELECT DISTINCT src, dst FROM e)
                    GROUP BY 1),
            alldeg AS (SELECT coalesce(deg.d, 0) AS degree
                       FROM v LEFT JOIN deg ON v.id = deg.src)
            SELECT degree, COUNT(*) AS n_vertices FROM alldeg GROUP BY 1
        """,
        "ec_reciprocity": f"""
            WITH pos AS ({EC_POS}),
            e AS (SELECT DISTINCT a.event_id AS src, b.event_id AS dst
                  FROM pos a JOIN pos b
                  ON a.user_id = b.user_id AND b.rn = a.rn + 1
                  WHERE a.event_id <> b.event_id)
            SELECT COUNT(*) AS n_directed,
                   CAST(SUM(CASE WHEN r.src IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_reciprocated,
                   CASE WHEN COUNT(*) > 0
                        THEN SUM(CASE WHEN r.src IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
                             / COUNT(*)
                        ELSE 0.0 END AS reciprocity
            FROM e LEFT JOIN e r ON e.src = r.dst AND e.dst = r.src
        """,
        "emb_knn_wcc": """
            WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
            s AS (SELECT a.vec_id AS src, b.vec_id AS dst,
                         list_dot_product(a.ev, b.ev)
                         / (sqrt(list_dot_product(a.ev, a.ev))
                            * sqrt(list_dot_product(b.ev, b.ev))) AS cos
                  FROM v a JOIN v b ON a.vec_id <> b.vec_id),
            r AS (SELECT *, row_number() OVER (PARTITION BY src
                                               ORDER BY cos DESC, dst) AS rank
                  FROM s),
            knn AS (SELECT src, dst FROM r WHERE rank <= 1),
            und AS (SELECT DISTINCT src, dst FROM
                    (SELECT src, dst FROM knn UNION ALL SELECT dst, src FROM knn)),
            rec AS (
              WITH RECURSIVE reach(id, lbl) AS (
                SELECT vec_id, vec_id FROM v
                UNION
                SELECT u.dst, r2.lbl FROM reach r2 JOIN und u ON r2.id = u.src
              )
              SELECT id, MIN(lbl) AS value FROM reach GROUP BY id
            )
            SELECT id, value FROM rec
        """,
        "gen_harmonic_star": """
            SELECT range AS id,
                   CASE WHEN range = 0 THEN 49.0 ELSE 25.0 END AS harmonic
            FROM range(0, 50)
        """,
        "emb_knn_graph": """
            WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
            s AS (SELECT a.vec_id AS src, b.vec_id AS dst,
                         list_dot_product(a.ev, b.ev)
                         / (sqrt(list_dot_product(a.ev, a.ev))
                            * sqrt(list_dot_product(b.ev, b.ev))) AS cos
                  FROM v a JOIN v b ON a.vec_id <> b.vec_id),
            r AS (SELECT *, row_number() OVER (PARTITION BY src
                                               ORDER BY cos DESC, dst) AS rank
                  FROM s)
            SELECT src, dst, round(cos, 6) AS cos FROM r WHERE rank <= 3
        """,
        "gen_topo_levels": """
            SELECT range AS id, range // 30 + range % 30 AS level
            FROM range(0, 600)
        """,
        "gen_lp_weighted": """
            WITH b AS (SELECT range AS blk FROM range(0, 100)),
            e AS (SELECT blk*4 + s AS src, blk*4 + d AS dst, w::DOUBLE AS w
                  FROM b, (VALUES (1,0,4.0),(3,0,1.0),(0,1,2.0),
                                  (3,2,2.0),(1,2,8.0),(2,3,1.0)) AS t(s,d,w)),
            v AS (SELECT blk*4 + i AS id
                  FROM b, (VALUES (0),(1),(2),(3)) AS t(i)),
            s0 AS (SELECT id, id AS lbl FROM v),
            c1 AS (SELECT e.dst AS id, s.lbl, SUM(e.w) AS cnt
                   FROM s0 s JOIN e ON s.id = e.src GROUP BY 1, 2),
            b1 AS (SELECT id, lbl AS best FROM
                   (SELECT id, lbl, row_number() OVER
                      (PARTITION BY id ORDER BY cnt DESC, lbl DESC) AS rn
                    FROM c1) WHERE rn = 1),
            s1 AS (SELECT s.id,
                          CASE WHEN b1.best > s.lbl THEN b1.best ELSE s.lbl END AS lbl
                   FROM s0 s LEFT JOIN b1 ON s.id = b1.id),
            c2 AS (SELECT e.dst AS id, s.lbl, SUM(e.w) AS cnt
                   FROM s1 s JOIN e ON s.id = e.src GROUP BY 1, 2),
            b2 AS (SELECT id, lbl AS best FROM
                   (SELECT id, lbl, row_number() OVER
                      (PARTITION BY id ORDER BY cnt DESC, lbl DESC) AS rn
                    FROM c2) WHERE rn = 1),
            s2 AS (SELECT s.id,
                          CASE WHEN b2.best > s.lbl THEN b2.best ELSE s.lbl END AS lbl
                   FROM s1 s LEFT JOIN b2 ON s.id = b2.id)
            SELECT id, lbl AS value FROM s2
        """,
        "gen_pagerank_weighted": """
            WITH b AS (SELECT range AS blk FROM range(0, 100)),
            e AS (SELECT blk*5 + s AS src, blk*5 + d AS dst, w::DOUBLE AS w
                  FROM b, (VALUES (0,1,0.25),(0,2,0.75),(1,3,1.0),
                                  (2,3,0.5),(2,4,0.5),(3,0,1.0)) AS t(s,d,w)),
            v AS (SELECT blk*5 + i AS id
                  FROM b, (VALUES (0),(1),(2),(3),(4)) AS t(i)),
            s1 AS (SELECT id, 0.75::DOUBLE AS rank, 0.75::DOUBLE AS delta,
                          true AS recv FROM v),
            m2 AS (SELECT e.dst AS id, SUM(s.delta*e.w) AS m
                   FROM s1 s JOIN e ON s.id = e.src
                   WHERE s.recv AND s.delta > 0.0001 GROUP BY 1),
            s2 AS (SELECT s.id,
                          CASE WHEN m.m IS NULL THEN s.rank
                               ELSE s.rank + 0.25::DOUBLE*m.m END AS rank,
                          CASE WHEN m.m IS NULL THEN s.delta
                               ELSE 0.25::DOUBLE*m.m END AS delta,
                          m.m IS NOT NULL AS recv
                   FROM s1 s LEFT JOIN m2 m ON s.id = m.id),
            m3 AS (SELECT e.dst AS id, SUM(s.delta*e.w) AS m
                   FROM s2 s JOIN e ON s.id = e.src
                   WHERE s.recv AND s.delta > 0.0001 GROUP BY 1),
            s3 AS (SELECT s.id,
                          CASE WHEN m.m IS NULL THEN s.rank
                               ELSE s.rank + 0.25::DOUBLE*m.m END AS rank,
                          CASE WHEN m.m IS NULL THEN s.delta
                               ELSE 0.25::DOUBLE*m.m END AS delta,
                          m.m IS NOT NULL AS recv
                   FROM s2 s LEFT JOIN m3 m ON s.id = m.id)
            SELECT id, rank AS value FROM s3
        """,
        "emb_quantize_inv": """
            SELECT CAST(0 AS BIGINT) AS error_violations,
                   CAST(0 AS BIGINT) AS code_violations,
                   true AS nonempty
        """,
        "hier_motifs": """
            SELECT '030T' AS motif, COUNT(*) AS n FROM customer
        """,
        "gen_motifs": """
            SELECT motif, CAST(50 AS BIGINT) AS n
            FROM (VALUES ('030T'), ('030C'), ('120'), ('300')) AS t(motif)
        """,
        "doc_cross_source_near_dups": f"""
            WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
            tok AS (SELECT DISTINCT doc_id, unnest(toks) AS tk FROM t),
            h AS (SELECT doc_id, ('0x' || substr(md5(tk), 1, 15))::BIGINT AS h FROM tok),
            bits AS (SELECT doc_id, b,
                            SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
                     FROM h, (SELECT unnest(range(0, 16)) AS b) GROUP BY 1, 2),
            sig AS (SELECT doc_id,
                           CAST(SUM(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END)
                                AS BIGINT) AS simhash
                    FROM bits GROUP BY 1),
            p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
                  FROM sig a JOIN sig b ON a.doc_id < b.doc_id
                  WHERE bit_count(xor(a.simhash, b.simhash)) <= 2),
            lab AS (SELECT least(da.source, db.source) AS source_a,
                           greatest(da.source, db.source) AS source_b
                    FROM p JOIN documents da ON p.doc_a = da.doc_id
                           JOIN documents db ON p.doc_b = db.doc_id
                    WHERE da.source <> db.source)
            SELECT source_a, source_b, COUNT(*) AS n_pairs
            FROM lab GROUP BY 1, 2
        """,
        "doc_unigram_logprob": f"""
            WITH toks AS (SELECT doc_id, unnest({TOKS}) AS tok FROM documents),
            freq AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
            tot AS (SELECT SUM(c) AS t FROM freq),
            scored AS (SELECT doc_id, -ln(c::DOUBLE / t) AS nlp
                       FROM toks JOIN freq USING (tok) CROSS JOIN tot),
            pd AS (SELECT doc_id, COUNT(*) AS n_tokens,
                          round(AVG(nlp), 6) AS avg_neg_logprob
                   FROM scored GROUP BY doc_id)
            SELECT d.doc_id, coalesce(pd.n_tokens, 0) AS n_tokens,
                   pd.avg_neg_logprob
            FROM documents d LEFT JOIN pd USING (doc_id)
        """,
        "ec_wcc": """
            SELECT event_id AS id, MIN(event_id) OVER (PARTITION BY user_id) AS value
            FROM events
        """,
        "ec_pregel_wcc": """
            SELECT event_id AS id, MIN(event_id) OVER (PARTITION BY user_id) AS value
            FROM events
        """,
        "ec_bfs": f"""
            WITH pos AS ({EC_POS}),
            s AS (SELECT user_id AS su, rn AS sr FROM pos
                  WHERE rn = 0 AND user_id = (SELECT MIN(user_id) FROM events))
            SELECT pos.event_id AS id,
                   CASE WHEN pos.user_id = s.su AND pos.rn >= s.sr
                        THEN pos.rn - s.sr ELSE 9223372036854775807 END AS value
            FROM pos, s
        """,
        "ec_sssp": f"""
            WITH pos AS ({EC_POS}),
            u AS (SELECT * FROM pos WHERE user_id = (SELECT MIN(user_id) FROM events))
            SELECT event_id AS id,
                   round(coalesce(SUM(CASE WHEN rn > 0 THEN w END)
                         OVER (ORDER BY rn ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0), 4)
                   AS value
            FROM u
        """,
        # bit-exact oracle: the recursive CTE reproduces the engine's exact
        # float64 op sequence (r += 0.85*d; d = new - old), so no rounding
        "ec_pagerank5": f"""
            WITH RECURSIVE pr(j, r, d) AS (
                SELECT 0, 0.85 * (0.15/0.85), 0.85 * (0.15/0.85)
                UNION ALL
                SELECT j + 1, r + 0.85 * d, (r + 0.85 * d) - r FROM pr WHERE j < 4
            ),
            pos AS ({EC_POS})
            SELECT pos.event_id AS id, pr.r AS value
            FROM pos JOIN pr ON pr.j = least(pos.rn, 4)
        """,
        "ec_lp10": """
            SELECT event_id AS id,
                   MAX(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS BETWEEN 10 PRECEDING AND CURRENT ROW) AS value
            FROM events
        """,
        "ec_mssp": f"""
            WITH pos AS ({EC_POS}),
            lm AS (SELECT user_id, event_id AS landmark FROM pos
                   WHERE rn = 0 AND user_id IN
                     (SELECT user_id FROM (SELECT DISTINCT user_id FROM events ORDER BY user_id LIMIT 2))),
            d AS (SELECT user_id, event_id,
                         coalesce(SUM(CASE WHEN rn > 0 THEN w END)
                           OVER (PARTITION BY user_id ORDER BY rn
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS dist
                  FROM pos)
            SELECT d.event_id AS id, lm.landmark, round(d.dist, 4) AS dist
            FROM d JOIN lm ON d.user_id = lm.user_id
        """,
        "hier_lcc": HIER_LCC_SQL,
        "hier_lcc_pregel": HIER_LCC_SQL,
        "ec_stream_distinct": f"""
            WITH pos AS ({EC_POS})
            SELECT a.event_id AS src, b.event_id AS dst, round(b.w, 6) AS value
            FROM pos a JOIN pos b ON a.user_id = b.user_id AND b.rn = a.rn + 1
        """,
        "ec_stream_union": f"""
            WITH pos AS ({EC_POS}),
            fwd AS (SELECT a.event_id AS src, b.event_id AS dst, b.w AS value
                    FROM pos a JOIN pos b ON a.user_id = b.user_id AND b.rn = a.rn + 1),
            spe AS (SELECT l_suppkey AS src, l_partkey + 1000000 AS dst,
                           SUM(l_quantity) AS value
                    FROM lineitem GROUP BY 1, 2)
            SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst,
                   round(CAST(value AS DOUBLE), 6) AS value FROM fwd
            UNION ALL
            SELECT CAST(src AS BIGINT), CAST(dst AS BIGINT),
                   round(CAST(value AS DOUBLE), 6) FROM spe
        """,
        "sp_group_reduce_max_out": f"""
            WITH e AS ({SP_EDGES}), v AS ({SP_VERTICES})
            SELECT v.id, m.mx AS value
            FROM v LEFT JOIN (SELECT src, MAX(value) AS mx FROM e GROUP BY 1) m
              ON v.id = m.src
        """,
        "ec_modularity": f"""
            WITH pos AS ({EC_POS}),
            ed0 AS (SELECT p.event_id AS x, q.event_id AS y
                    FROM pos p JOIN pos q
                    ON p.user_id = q.user_id AND q.rn = p.rn + 1),
            und AS (SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b
                    FROM ed0 WHERE x <> y),
            lab AS (SELECT event_id AS id,
                           MIN(event_id) OVER (PARTITION BY user_id) AS c
                    FROM events),
            led AS (SELECT la.c AS ca, lb.c AS cb
                    FROM und JOIN lab la ON und.a = la.id
                             JOIN lab lb ON und.b = lb.id),
            mm AS (SELECT count(*) AS cnt FROM und),
            intra AS (SELECT ca AS c, count(*) AS l FROM led WHERE ca = cb GROUP BY 1),
            degm AS (SELECT c, count(*) AS d FROM
                       (SELECT ca AS c FROM led UNION ALL SELECT cb FROM led)
                     GROUP BY 1),
            per AS (SELECT degm.c,
                       COALESCE(intra.l, 0)::DOUBLE / mm.cnt
                       - (degm.d::DOUBLE / (2.0 * mm.cnt)) ^ 2 AS q
                    FROM degm LEFT JOIN intra ON degm.c = intra.c CROSS JOIN mm)
            SELECT (SELECT cnt FROM mm) AS m,
                   count(*) AS n_communities,
                   round(sum(q), 6) AS modularity
            FROM per
        """,
        "hier_n2v_walks": """
            WITH e0 AS (
                SELECT CAST(c_custkey AS BIGINT) AS src,
                       CAST(c_nationkey + 2000000 AS BIGINT) AS dst FROM customer
                UNION ALL
                SELECT CAST(n_nationkey + 2000000 AS BIGINT),
                       CAST(n_regionkey + 3000000 AS BIGINT) FROM nation
                UNION ALL
                SELECT CAST(c_custkey AS BIGINT), CAST(n_regionkey + 3000000 AS BIGINT)
                FROM customer JOIN nation ON c_nationkey = n_nationkey
            ),
            ed AS (SELECT DISTINCT src, dst FROM
                     (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0)),
            v AS (SELECT DISTINCT id FROM
                    (SELECT src AS id FROM ed UNION SELECT dst FROM ed)),
            w0 AS (SELECT (id)::VARCHAR || '#0' AS walk_id, id AS start,
                          CAST(0 AS BIGINT) AS step, id AS vertex FROM v),
            c1 AS (SELECT w.walk_id, w.start, w.vertex AS cur, ed.dst AS x, 1.0 AS w,
                          SUM(1.0) OVER (PARTITION BY w.walk_id ORDER BY ed.dst) AS cumw,
                          SUM(1.0) OVER (PARTITION BY w.walk_id) AS totw
                   FROM w0 w JOIN ed ON ed.src = w.vertex),
            c1l AS (SELECT c1.*,
                           LAG(cumw, 1, 0.0) OVER (PARTITION BY walk_id ORDER BY x) AS lo
                    FROM c1),
            s1 AS (SELECT walk_id, start, cur, x FROM (
                     SELECT c1l.*,
                            (('0x' || substr(md5(walk_id || ':n2v:1:' || (cur)::VARCHAR), 1, 8))::BIGINT
                             / 4294967296.0) * totw AS u
                     FROM c1l)
                   WHERE cumw > u AND lo <= u),
            c2 AS (SELECT s.walk_id, s.start, s.cur AS prev, s.x AS cur, ed.dst AS x,
                          CASE WHEN ed.dst = s.cur THEN 0.25
                               WHEN EXISTS (SELECT 1 FROM ed p
                                            WHERE p.src = s.cur AND p.dst = ed.dst)
                                    THEN 1.0
                               ELSE 4.0 END AS w
                   FROM s1 s JOIN ed ON ed.src = s.x),
            c2w AS (SELECT *,
                           SUM(w) OVER (PARTITION BY walk_id ORDER BY x) AS cumw,
                           SUM(w) OVER (PARTITION BY walk_id) AS totw
                    FROM c2),
            c2l AS (SELECT c2w.*,
                           LAG(cumw, 1, 0.0) OVER (PARTITION BY walk_id ORDER BY x) AS lo
                    FROM c2w),
            s2 AS (SELECT walk_id, start, x FROM (
                     SELECT c2l.*,
                            (('0x' || substr(md5(walk_id || ':n2v:2:' || (cur)::VARCHAR), 1, 8))::BIGINT
                             / 4294967296.0) * totw AS u
                     FROM c2l)
                   WHERE cumw > u AND lo <= u)
            SELECT walk_id, start, step, vertex FROM w0
            UNION ALL SELECT walk_id, start, CAST(1 AS BIGINT), x FROM s1
            UNION ALL SELECT walk_id, start, CAST(2 AS BIGINT), x FROM s2
        """,
        "hier_graph_stats": """
            WITH e0 AS (
                SELECT CAST(c_custkey AS BIGINT) AS src,
                       CAST(c_nationkey + 2000000 AS BIGINT) AS dst FROM customer
                UNION ALL
                SELECT CAST(n_nationkey + 2000000 AS BIGINT),
                       CAST(n_regionkey + 3000000 AS BIGINT) FROM nation
                UNION ALL
                SELECT CAST(c_custkey AS BIGINT), CAST(n_regionkey + 3000000 AS BIGINT)
                FROM customer JOIN nation ON c_nationkey = n_nationkey
            ),
            v AS (SELECT DISTINCT id FROM
                    (SELECT src AS id FROM e0 UNION SELECT dst FROM e0)),
            und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
                    FROM e0 WHERE src <> dst),
            deg AS (SELECT id, count(*) AS d FROM
                      (SELECT a AS id FROM und UNION ALL SELECT b FROM und)
                    GROUP BY 1),
            tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
                    FROM und e1 JOIN und e2 ON e1.b = e2.a
                    JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
            sym AS (SELECT a, b FROM und UNION ALL SELECT b, a FROM und),
            prs AS (SELECT da.d AS da, db.d AS db
                    FROM sym JOIN deg da ON sym.a = da.id
                             JOIN deg db ON sym.b = db.id)
            SELECT (SELECT count(*) FROM v) AS n_vertices,
                   (SELECT count(*) FROM e0) AS n_edges,
                   CAST(0 AS BIGINT) AS n_self_loops,
                   (SELECT count(*) FROM und) AS n_undirected_edges,
                   round((SELECT count(*) FROM und)
                         / ((SELECT count(*) FROM v)
                            * ((SELECT count(*) FROM v) - 1) / 2.0), 9) AS density,
                   (SELECT max(d) FROM deg) AS max_degree,
                   round((SELECT avg(d) FROM deg), 6) AS avg_degree,
                   (SELECT count(*) FROM tri) AS n_triangles,
                   round((SELECT corr(da, db) FROM prs), 6) AS assortativity
        """,
        "doc_cap_per_source": f"""
            WITH r AS (SELECT doc_id, source,
                row_number() OVER (PARTITION BY source
                    ORDER BY (('0x' || substr(md5((doc_id)::VARCHAR || 'cap'), 1, 8))::BIGINT
                              / 4294967296.0) ASC, doc_id ASC) AS rn
              FROM documents)
            SELECT doc_id, source FROM r WHERE rn <= 10
        """,
        "hier_ktruss3": """
            WITH e0 AS (
                SELECT CAST(c_custkey AS BIGINT) AS src,
                       CAST(c_nationkey + 2000000 AS BIGINT) AS dst FROM customer
                UNION ALL
                SELECT CAST(n_nationkey + 2000000 AS BIGINT),
                       CAST(n_regionkey + 3000000 AS BIGINT) FROM nation
                UNION ALL
                SELECT CAST(c_custkey AS BIGINT), CAST(n_regionkey + 3000000 AS BIGINT)
                FROM customer JOIN nation ON c_nationkey = n_nationkey
            ),
            e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
                  FROM e0 WHERE src <> dst),
            tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
                    FROM e e1 JOIN e e2 ON e1.b = e2.a
                    JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
            supp AS (SELECT a, b, count(*) AS support FROM (
                         SELECT x AS a, y AS b FROM tri
                         UNION ALL SELECT y, z FROM tri
                         UNION ALL SELECT x, z FROM tri) GROUP BY 1, 2)
            SELECT a AS src, b AS dst, CAST(support AS BIGINT) AS support
            FROM supp WHERE support >= 1
        """,
        "gen_ktruss_complete": """
            SELECT a.range AS src, b.range AS dst, CAST(18 AS BIGINT) AS support
            FROM range(0, 20) a, range(0, 20) b WHERE a.range < b.range
        """,
        "hier_triangles": """
            WITH e0 AS (
                SELECT CAST(c_custkey AS BIGINT) AS src,
                       CAST(c_nationkey + 2000000 AS BIGINT) AS dst FROM customer
                UNION ALL
                SELECT CAST(n_nationkey + 2000000 AS BIGINT),
                       CAST(n_regionkey + 3000000 AS BIGINT) FROM nation
                UNION ALL
                SELECT CAST(c_custkey AS BIGINT), CAST(n_regionkey + 3000000 AS BIGINT)
                FROM customer JOIN nation ON c_nationkey = n_nationkey
            ),
            e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
                  FROM e0 WHERE src <> dst),
            tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
                    FROM e e1 JOIN e e2 ON e1.b = e2.a
                    JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
            pv AS (SELECT id, count(*) AS count FROM (
                       SELECT x AS id FROM tri
                       UNION ALL SELECT y FROM tri
                       UNION ALL SELECT z FROM tri) GROUP BY 1)
            SELECT id, count FROM pv
            UNION ALL
            SELECT CAST(-1 AS BIGINT), count(*) FROM tri
        """,
        "ec_stream_degrees": f"""
            WITH pos AS ({EC_POS}),
            e AS (SELECT user_id, rn, event_id FROM pos)
            SELECT event_id AS id, CAST(
              (CASE WHEN rn > 0 THEN 1 ELSE 0 END) +
              (CASE WHEN rn < (SELECT MAX(rn) FROM pos p2 WHERE p2.user_id = e.user_id)
                    THEN 1 ELSE 0 END) AS BIGINT) AS degree
            FROM e
            WHERE rn > 0 OR rn < (SELECT MAX(rn) FROM pos p3 WHERE p3.user_id = e.user_id)
        """,
        # incremental windowed tier: final per-window state vs closed forms
        "ec_window_wcc_incr": """
            WITH ch AS (
                SELECT user_id, event_id, ts,
                       lag(event_id) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) AS prev_id
                FROM events
            ),
            ed AS (
                SELECT user_id,
                       epoch(date_trunc('hour', ts))::BIGINT AS ws,
                       prev_id AS src, event_id AS dst
                FROM ch WHERE prev_id IS NOT NULL
            ),
            grp AS (
                SELECT user_id, ws, LEAST(MIN(src), MIN(dst)) AS comp
                FROM ed GROUP BY 1, 2
            ),
            verts AS (
                SELECT DISTINCT ws, user_id, id FROM (
                    SELECT ws, user_id, src AS id FROM ed
                    UNION ALL SELECT ws, user_id, dst FROM ed
                )
            )
            SELECT v.ws AS window_start, v.id, g.comp AS component
            FROM verts v JOIN grp g USING (user_id, ws)
        """,
        "ec_window_triangles_incr": """
            WITH occ AS (
                SELECT DISTINCT epoch(date_trunc('hour', ts))::BIGINT AS ws,
                                user_id, event_type
                FROM events
            ),
            e AS (
                SELECT DISTINCT a.ws, a.user_id AS x, b.user_id AS y
                FROM occ a JOIN occ b
                  ON a.ws = b.ws AND a.event_type = b.event_type
                 AND a.user_id < b.user_id
            ),
            tri AS (
                SELECT e1.ws, e1.x, e1.y, e2.y AS z
                FROM e e1
                JOIN e e2 ON e1.ws = e2.ws AND e1.y = e2.x
                JOIN e e3 ON e3.ws = e1.ws AND e3.x = e1.x AND e3.y = e2.y
            )
            SELECT ws AS window_start, CAST(count(*) AS BIGINT) AS n_triangles
            FROM tri GROUP BY ws
        """,
        # stateful twins: final GroupState must equal the batch aggregate
        "ec_stateful_heavy": f"""
            WITH pos AS ({EC_POS}),
            e AS (SELECT user_id, rn, event_id FROM pos),
            deg AS (
                SELECT event_id AS id, CAST(
                  (CASE WHEN rn > 0 THEN 1 ELSE 0 END) +
                  (CASE WHEN rn < (SELECT MAX(rn) FROM pos p2 WHERE p2.user_id = e.user_id)
                        THEN 1 ELSE 0 END) AS BIGINT) AS degree
                FROM e
                WHERE rn > 0 OR rn < (SELECT MAX(rn) FROM pos p3 WHERE p3.user_id = e.user_id)
            )
            SELECT id, degree FROM deg WHERE degree >= 2
        """,
        "ec_stateful_degrees": f"""
            WITH pos AS ({EC_POS}),
            e AS (SELECT user_id, rn, event_id FROM pos)
            SELECT event_id AS id, CAST(
              (CASE WHEN rn > 0 THEN 1 ELSE 0 END) +
              (CASE WHEN rn < (SELECT MAX(rn) FROM pos p2 WHERE p2.user_id = e.user_id)
                    THEN 1 ELSE 0 END) AS BIGINT) AS degree
            FROM e
            WHERE rn > 0 OR rn < (SELECT MAX(rn) FROM pos p3 WHERE p3.user_id = e.user_id)
        """,
        "ec_stateful_sessions": """
            WITH s AS (
              SELECT user_id, event_id, value, ts, epoch_us(ts) AS us,
                     CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                            (PARTITION BY user_id ORDER BY ts, event_id)
                          > 1800000000 THEN 1 ELSE 0 END AS brk
              FROM events),
            s2 AS (SELECT user_id, us, value,
                          SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                            AS session
                   FROM s)
            SELECT user_id, CAST(session AS BIGINT) AS session,
                   COUNT(*) AS n_events, MIN(us) AS start_us, MAX(us) AS end_us,
                   MAX(us) - MIN(us) AS duration_us,
                   round(SUM(value), 6) AS total_value
            FROM s2 GROUP BY 1, 2
        """,
        # motif pattern finder (library/motif.py): the oracle IS the join
        # plan the pattern compiles to, hand-written in SQL
        "hier_motif_find_triangle": f"""
            WITH e0 AS ({_HIER_E0})
            SELECT e1.src AS a_id, e1.dst AS b_id, e2.dst AS c_id
            FROM e0 e1
            JOIN e0 e2 ON e1.dst = e2.src
            JOIN e0 e3 ON e3.src = e1.src AND e3.dst = e2.dst
        """,
        "hier_motif_find_wedge_neg": f"""
            WITH e0 AS ({_HIER_E0})
            SELECT e1.src AS b_id, e2.src AS c_id, e1.dst AS a_id
            FROM e0 e1 JOIN e0 e2 ON e1.dst = e2.dst
            WHERE e1.src < 2000000 AND e2.src >= 2000000 AND e2.src < 3000000
              AND NOT EXISTS (SELECT 1 FROM e0 x
                              WHERE x.src = e1.src AND x.dst = e2.src)
        """,
        "ec_motif_find_path": f"""
            WITH pos AS ({EC_POS})
            SELECT a.event_id AS a_id, c.event_id AS c_id,
                   b.w AS w1, c.w AS w2
            FROM pos a
            JOIN pos b ON b.user_id = a.user_id AND b.rn = a.rn + 1
            JOIN pos c ON c.user_id = a.user_id AND c.rn = a.rn + 2
            WHERE b.w > c.w
        """,
        "ec_pregel_sssp": f"""
            WITH pos AS ({EC_POS}),
            u AS (SELECT * FROM pos WHERE user_id = (SELECT MIN(user_id) FROM events))
            SELECT event_id AS id,
                   round(coalesce(SUM(CASE WHEN rn > 0 THEN w END)
                         OVER (ORDER BY rn ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0), 4)
                   AS value
            FROM u
        """,
        "sp_io_roundtrip": f"""
            WITH e AS ({SP_EDGES}), v AS ({SP_VERTICES})
            SELECT v.id, coalesce(c.cnt, 0) AS value
            FROM v LEFT JOIN (SELECT src, count(*) AS cnt FROM e GROUP BY 1) c ON v.id = c.src
        """,
        "ec_sybilrank": f"""
            WITH pos AS ({EC_POS}),
            n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM events),
            p AS (SELECT CAST(ceil(log10(n)) AS BIGINT) AS p FROM n),
            nt AS (SELECT CAST(count(*) AS DOUBLE) AS nt FROM pos WHERE rn = 0),
            nxt AS (SELECT event_id, rn,
                           lead(w) OVER (PARTITION BY user_id ORDER BY rn) AS wn
                    FROM pos)
            SELECT event_id AS id,
                   round(CASE WHEN rn = p THEN (n / nt) / wn ELSE 0.0 END, 6) AS value
            FROM nxt, n, nt, p WHERE wn IS NOT NULL
        """,
        # power-law MLE: lnsum folds the sorted (degree, count) histogram
        # — same fixed accumulation order as Spark's sorted-array fold
        "hier_powerlaw": f"""
            {HIER_UND},
            h AS (SELECT d, CAST(count(*) AS BIGINT) AS c
                  FROM deg WHERE d >= 2 GROUP BY 1),
            p AS (SELECT CAST(sum(c) AS BIGINT) AS n,
                         list_sort(list(struct_pack(d := d, c := c))) AS hist
                  FROM h),
            m AS (SELECT n,
                         list_sum(list_transform(hist,
                             x -> x.c * ln(x.d / 1.5))) AS lnsum
                  FROM p)
            SELECT CAST(2 AS BIGINT) AS d_min,
                   COALESCE(n, 0) AS n_tail,
                   round(CASE WHEN COALESCE(n, 0) > 0
                              THEN 1.0 + CAST(n AS DOUBLE) / lnsum
                              ELSE 0.0 END, 6) AS alpha
            FROM m
        """,
        # Newman assortativity: exact HUGEINT sums over the symmetrized
        # simple edges, one double division — r collapses to
        # (n·Σxy − (Σx)²)/(n·Σxx − (Σx)²) because the marginals coincide
        "hier_assortativity": f"""
            {HIER_UND},
            p AS (SELECT dv.d AS dx, du.d AS dy
                  FROM und JOIN deg dv ON dv.src = und.src
                           JOIN deg du ON du.src = und.dst),
            s AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                         CAST(sum(dx) AS HUGEINT) AS sx,
                         CAST(sum(dx * dx) AS HUGEINT) AS sxx,
                         CAST(sum(dx * dy) AS HUGEINT) AS sxy
                  FROM p)
            SELECT CAST(n // 2 AS BIGINT) AS n_und_edges,
                   round(CASE WHEN n * sxx - sx * sx <> 0
                              THEN CAST(n * sxy - sx * sx AS DOUBLE)
                                   / CAST(n * sxx - sx * sx AS DOUBLE)
                              ELSE 0.0 END, 6) AS assortativity
            FROM s
        """,
        "hier_jaccard": f"""
            {HIER_UND},
            cm AS (SELECT a.src AS v, b.src AS u, count(*) AS c
                   FROM und a JOIN und b ON a.dst = b.dst AND a.src <> b.src
                   JOIN und p ON p.src = a.src AND p.dst = b.src
                   GROUP BY 1, 2)
            SELECT und.src, und.dst,
                   round(CAST(coalesce(cm.c, 0) AS DOUBLE)
                         / (dv.d + du.d - coalesce(cm.c, 0)), 6) AS value
            FROM und
            LEFT JOIN cm ON cm.v = und.src AND cm.u = und.dst
            JOIN deg dv ON dv.src = und.src
            JOIN deg du ON du.src = und.dst
        """,
        "hier_adamic_adar": f"""
            {HIER_UND},
            aa AS (SELECT a.dst AS v, b.dst AS w, SUM(ln(1.0 / d.d)) AS s
                   FROM und a JOIN und b ON a.src = b.src AND a.dst <> b.dst
                   JOIN und p ON p.src = a.dst AND p.dst = b.dst
                   JOIN deg d ON d.src = a.src
                   GROUP BY 1, 2)
            SELECT und.src, und.dst, round(1.0 + coalesce(aa.s, 0.0), 6) AS value
            FROM und LEFT JOIN aa ON aa.v = und.src AND aa.w = und.dst
        """,
        "doc_token_count": f"""
            SELECT doc_id, CAST(len({TOKS}) AS INTEGER) AS n_tokens FROM documents
        """,
        "doc_subword_count": r"""
            SELECT doc_id,
                   CAST(len(regexp_extract_all(lower(text),
                            '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS INTEGER) AS n_subwords
            FROM documents
        """,
        "doc_language_id": f"""
            WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
            s AS (SELECT doc_id,
                len(list_filter(toks, x -> list_contains({STOP_DE}, x))) AS s_de,
                len(list_filter(toks, x -> list_contains({STOP_EN}, x))) AS s_en,
                len(list_filter(toks, x -> list_contains({STOP_ES}, x))) AS s_es,
                len(list_filter(toks, x -> list_contains({STOP_FR}, x))) AS s_fr
                FROM t)
            SELECT doc_id,
                CASE WHEN s_de + s_en + s_es + s_fr = 0 THEN 'und'
                     WHEN s_fr >= s_es AND s_fr >= s_en AND s_fr >= s_de THEN 'fr'
                     WHEN s_es >= s_en AND s_es >= s_de THEN 'es'
                     WHEN s_en >= s_de THEN 'en'
                     ELSE 'de' END AS lang_pred
            FROM s
        """,
        "doc_quality": f"""
            WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
            s AS (SELECT doc_id,
                CAST(len(toks) AS INTEGER) AS n_tokens,
                len(list_filter(toks, x -> list_contains({STOP_EN}, x))) AS n_stop,
                CASE WHEN len(toks) > 0
                     THEN CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks)
                     ELSE 0.0 END AS mean_token_len
                FROM t)
            SELECT doc_id, n_tokens,
                CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE) / n_tokens ELSE 0.0 END AS stop_ratio,
                mean_token_len,
                (CASE WHEN n_tokens > 0 AND CAST(n_stop AS DOUBLE)/n_tokens >= 0.01
                           AND CAST(n_stop AS DOUBLE)/n_tokens <= 0.5 THEN 0.4 ELSE 0.0 END
                 + CASE WHEN mean_token_len >= 3.0 AND mean_token_len <= 10.0 THEN 0.3 ELSE 0.0 END
                 + CASE WHEN n_tokens >= 10 AND n_tokens <= 100000 THEN 0.3 ELSE 0.0 END) AS score
            FROM s
        """,
        "doc_fingerprint": f"""
            SELECT doc_id, md5(array_to_string({TOKS}, ' ')) AS fp FROM documents
        """,
        "doc_normalize": f"""
            SELECT doc_id, array_to_string({TOKS}, ' ') AS norm_text FROM documents
        """,
        "doc_vocabulary": f"""
            WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
            tok AS (SELECT doc_id, unnest(toks) AS token FROM t),
            agg AS (SELECT token, count(*) AS freq, count(DISTINCT doc_id) AS doc_freq
                    FROM tok GROUP BY 1)
            SELECT token, freq, doc_freq,
                   row_number() OVER (ORDER BY freq DESC, token) AS token_id
            FROM agg WHERE freq >= 2
        """,
        "doc_tfidf_keywords": f"""
            WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
            tok AS (SELECT doc_id, unnest(toks) AS token FROM t),
            tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
            df AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
            n AS (SELECT count(*) AS n FROM documents),
            s AS (SELECT tf.doc_id, tf.token,
                         CAST(tf.tf AS DOUBLE) * (CAST(n.n AS DOUBLE) / CAST(df.df AS DOUBLE)) AS raw
                  FROM tf JOIN df ON tf.token = df.token CROSS JOIN n),
            r AS (SELECT doc_id, token, raw,
                         row_number() OVER (PARTITION BY doc_id ORDER BY raw DESC, token) AS rnk
                  FROM s)
            SELECT doc_id, token, round(raw, 6) AS score, rnk AS rank
            FROM r WHERE rnk <= 3
        """,
        "doc_bigrams": f"""
            WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
            tok AS (SELECT doc_id, unnest(toks) AS tk,
                           generate_subscripts(toks, 1) AS i FROM t),
            bg AS (SELECT a.tk || ' ' || b.tk AS bigram
                   FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1)
            SELECT bigram, count(*) AS freq FROM bg GROUP BY 1 HAVING count(*) >= 3
        """,
        # duplicate-n-gram mass + top-bigram fraction; every ratio is a
        # division of exact ints, so both engines produce bit-identical
        # doubles (same FP discipline as doc_quality)
        "doc_repetition": f"""
            WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
            arr AS (SELECT doc_id, toks,
                CASE WHEN len(toks) >= 2
                     THEN list_transform(range(0, len(toks) - 1),
                                         i -> toks[i+1] || ' ' || toks[i+2])
                     ELSE CAST([] AS VARCHAR[]) END AS bg,
                CASE WHEN len(toks) >= 3
                     THEN list_transform(range(0, len(toks) - 2),
                                         i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])
                     ELSE CAST([] AS VARCHAR[]) END AS tg
                FROM t),
            base AS (SELECT doc_id,
                CAST(len(toks) AS INTEGER) AS n_tokens,
                CASE WHEN len(toks) > 0
                     THEN 1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
                     ELSE 0.0 END AS dup_unigram_frac,
                CASE WHEN len(bg) > 0
                     THEN 1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg)
                     ELSE 0.0 END AS dup_bigram_frac,
                CASE WHEN len(tg) > 0
                     THEN 1.0 - CAST(len(list_distinct(tg)) AS DOUBLE) / len(tg)
                     ELSE 0.0 END AS dup_trigram_frac,
                len(bg) AS nbg
                FROM arr),
            topb AS (SELECT doc_id, MAX(c) AS m FROM
                       (SELECT doc_id, b, count(*) AS c FROM
                          (SELECT doc_id, unnest(bg) AS b FROM arr)
                        GROUP BY 1, 2)
                     GROUP BY 1)
            SELECT base.doc_id, n_tokens, dup_unigram_frac, dup_bigram_frac,
                   dup_trigram_frac,
                   CASE WHEN nbg > 0
                        THEN CAST(coalesce(m, 0) AS DOUBLE) / nbg
                        ELSE 0.0 END AS top_bigram_frac
            FROM base LEFT JOIN topb ON base.doc_id = topb.doc_id
        """,
        "doc_chunks": """
            WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents
                       WHERE length(text) > 0),
            s AS (SELECT doc_id, text,
                         unnest(generate_series(1, greatest(n - 256 + 224, 1), 224)) AS st
                  FROM d)
            SELECT doc_id, CAST((st - 1) // 224 AS BIGINT) AS chunk_id,
                   substr(text, st, 256) AS chunk
            FROM s
        """,
        "doc_hash_sample": f"""
            SELECT doc_id, source FROM documents
            WHERE {HASH_FRAC} < 0.5
        """,
        "doc_split": f"""
            SELECT doc_id,
                   CASE WHEN {HASH_FRAC_SPLIT} < 0.25 THEN 'eval' ELSE 'train' END AS split
            FROM documents
        """,
        "doc_mixture_sample": f"""
            WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
            w(source, w) AS (VALUES ('src0', 0.75), ('src1', 0.25)),
            t AS (SELECT min(n / w) AS big_t FROM c JOIN w USING (source) WHERE n > 0),
            r AS (SELECT c.source, LEAST(1.0, w.w * t.big_t / c.n) AS rate
                  FROM c JOIN w ON c.source = w.source CROSS JOIN t)
            SELECT d.doc_id, d.source FROM documents d JOIN r ON d.source = r.source
            WHERE (('0x' || substr(md5((d.doc_id)::VARCHAR), 1, 8))::BIGINT
                   / 4294967296.0) < r.rate
        """,
        "doc_pack_sequences": """
            WITH p AS (SELECT doc_id, source, n_chars,
                COALESCE(SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre
              FROM documents)
            SELECT doc_id, source, n_chars,
                   CAST(pre // 2048 AS BIGINT) AS seq_id,
                   CAST(pre % 2048 AS BIGINT) AS begin_offset
            FROM p
        """,
        "doc_pii_stats": f"""
            WITH a AS (SELECT doc_id, {PII_AUG} AS text FROM documents)
            SELECT doc_id,
                CAST(len(regexp_extract_all(text, '{PII_EMAIL}')) AS INTEGER) AS n_email,
                CAST(len(regexp_extract_all(text, '{PII_IPV4}')) AS INTEGER) AS n_ipv4,
                CAST(len(regexp_extract_all(text, '{PII_PHONE}')) AS INTEGER) AS n_phone,
                CAST(len(regexp_extract_all(text, '{PII_SSN}')) AS INTEGER) AS n_ssn,
                CAST(len(regexp_extract_all(text, '{PII_EMAIL}'))
                   + len(regexp_extract_all(text, '{PII_IPV4}'))
                   + len(regexp_extract_all(text, '{PII_PHONE}'))
                   + len(regexp_extract_all(text, '{PII_SSN}')) AS INTEGER) AS n_pii
            FROM a
        """,
        "doc_pii_redact": f"""
            WITH a AS (SELECT doc_id, {PII_AUG} AS text FROM documents)
            SELECT doc_id,
                regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                    text,
                    '{PII_EMAIL}', '<EMAIL>', 'g'),
                    '{PII_IPV4}', '<IPV4>', 'g'),
                    '{PII_PHONE}', '<PHONE>', 'g'),
                    '{PII_SSN}', '<SSN>', 'g') AS redacted
            FROM a
        """,
        "doc_source_profile": f"""
            WITH t AS (SELECT source, len({TOKS}) AS n FROM documents)
            SELECT source,
                   count(*) AS n_docs,
                   CAST(sum(n) AS BIGINT) AS total_tokens,
                   round(avg(n), 6) AS mean_tokens,
                   median(n) AS median_tokens
            FROM t GROUP BY source
        """,
        "doc_sketch_inv": """
            SELECT CAST(0 AS BIGINT) AS vocab_violations,
                   CAST(0 AS BIGINT) AS median_violations,
                   CAST(0 AS BIGINT) AS p90_violations,
                   count(DISTINCT source) AS n_sources
            FROM documents
        """,
        "dedup_exact": f"""
            WITH d AS ({_DUP_DOCS})
            SELECT md5(text) AS fp, MIN(doc_id) AS keep_id, count(*) AS n_dups
            FROM d GROUP BY 1
        """,
        "dedup_ngram_jaccard": f"""
            WITH sh AS ({SHINGLES}),
            sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
            inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
                      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                      GROUP BY 1, 2)
            SELECT doc_a, doc_b,
                   CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) AS jaccard
            FROM inter JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
            WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.05
        """,
        "doc_contamination": f"""
            WITH sh AS ({SHINGLES}),
            tr AS (SELECT * FROM sh WHERE doc_id >= 50),
            bm AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < 50),
            tot AS (SELECT doc_id, count(*) AS total FROM tr GROUP BY 1),
            hit AS (SELECT doc_id, count(*) AS contaminated FROM tr
                    WHERE shingle IN (SELECT shingle FROM bm) GROUP BY 1)
            SELECT t.doc_id, COALESCE(h.contaminated, 0) AS contaminated, t.total,
                   CAST(COALESCE(h.contaminated, 0) AS DOUBLE) / t.total AS rate
            FROM tot t LEFT JOIN hit h ON t.doc_id = h.doc_id
        """,
        "dedup_minhash": f"""
            WITH sh AS ({SHINGLES}),
            seeds AS (SELECT unnest(range(0, 16)) AS seed)
            SELECT doc_id, CAST(seed AS INTEGER) AS seed,
                   MIN(md5(shingle || ':' || seed::VARCHAR)) AS mh
            FROM sh, seeds GROUP BY 1, 2
        """,
        "dedup_minhash_lsh": f"""
            WITH sh AS ({SHINGLES}),
            seeds AS (SELECT unnest(range(0, 16)) AS seed),
            mh AS (SELECT doc_id, seed, MIN(md5(shingle || ':' || seed::VARCHAR)) AS mh
                   FROM sh, seeds GROUP BY 1, 2),
            bands AS (SELECT doc_id, seed // 4 AS band,
                             string_agg(mh, '|' ORDER BY seed) AS bucket
                      FROM mh GROUP BY 1, 2)
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
        """,
        "dedup_minhash_estimate": f"""
            WITH sh AS ({SHINGLES}),
            seeds AS (SELECT unnest(range(0, 16)) AS seed),
            mh AS (SELECT doc_id, seed,
                          MIN(md5(shingle || ':' || seed::VARCHAR)) AS mh
                   FROM sh, seeds GROUP BY 1, 2),
            bands AS (SELECT doc_id, seed // 4 AS band,
                             string_agg(mh, '|' ORDER BY seed) AS bucket
                      FROM mh GROUP BY 1, 2),
            cand AS (
                SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                FROM bands a JOIN bands b
                  ON a.band = b.band AND a.bucket = b.bucket
                 AND a.doc_id < b.doc_id
            ),
            agree AS (
                SELECT c.doc_a, c.doc_b,
                       SUM(CASE WHEN ma.mh = mb.mh THEN 1 ELSE 0 END) AS agr
                FROM cand c
                JOIN mh ma ON ma.doc_id = c.doc_a
                JOIN mh mb ON mb.doc_id = c.doc_b AND mb.seed = ma.seed
                GROUP BY 1, 2
            )
            SELECT doc_a, doc_b, agr / 16.0 AS est_jaccard
            FROM agree ORDER BY doc_a, doc_b
        """,
        "dedup_simhash": f"""
            WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
            tok AS (SELECT DISTINCT doc_id, unnest(toks) AS tk FROM t),
            h AS (SELECT doc_id, ('0x' || substr(md5(tk), 1, 15))::BIGINT AS h FROM tok),
            bits AS (SELECT doc_id, b,
                            SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
                     FROM h, (SELECT unnest(range(0, 16)) AS b) GROUP BY 1, 2)
            SELECT doc_id,
                   CAST(SUM(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS simhash
            FROM bits GROUP BY 1
        """,
        "emb_cosine_topk": """
            WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 10),
            c AS (SELECT vec_id AS nid, embedding::DOUBLE[] AS cv FROM embeddings),
            s AS (SELECT qid AS query_id, nid AS neighbor_id,
                         list_dot_product(qv, cv)
                         / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS cos
                  FROM q, c WHERE qid <> nid),
            r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                               ORDER BY cos DESC, neighbor_id) AS rank FROM s)
            SELECT query_id, neighbor_id, round(cos, 6) AS cos, CAST(rank AS INTEGER) AS rank
            FROM r WHERE rank <= 5
        """,
        "emb_hard_negatives": """
            WITH q AS (SELECT vec_id AS qid, label AS ql,
                              embedding::DOUBLE[] AS qv
                       FROM embeddings WHERE vec_id < 10),
            c AS (SELECT vec_id AS nid, label AS cl,
                         embedding::DOUBLE[] AS cv FROM embeddings),
            s AS (SELECT qid AS query_id, nid AS neighbor_id,
                         list_dot_product(qv, cv)
                         / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS cos
                  FROM q, c WHERE qid <> nid AND ql <> cl),
            r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                               ORDER BY cos DESC, neighbor_id) AS rank FROM s)
            SELECT query_id, neighbor_id, round(cos, 6) AS cos, CAST(rank AS INTEGER) AS rank
            FROM r WHERE rank <= 5
        """,
        "emb_decontamination": """
            WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
            t AS (SELECT * FROM v WHERE id >= 50),
            b AS (SELECT * FROM v WHERE id < 50),
            s AS (SELECT t.id, b.id AS bench_id,
                         round(list_dot_product(t.v, b.v)
                               / (sqrt(list_dot_product(t.v, t.v))
                                  * sqrt(list_dot_product(b.v, b.v))), 6) AS cos
                  FROM t, b),
            hits AS (SELECT * FROM s WHERE cos >= 0.4),
            best AS (SELECT id, bench_id, cos,
                            row_number() OVER (PARTITION BY id
                                               ORDER BY cos DESC, bench_id DESC) AS rn
                     FROM hits)
            SELECT id, bench_id, cos FROM best WHERE rn = 1
        """,
        "emb_near_dup": """
            WITH base AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
            pl AS (SELECT id + 1000000 AS id,
                       list_transform(range(1, len(v) + 1),
                           i -> CASE WHEN i = 1 THEN v[1] + 0.1 ELSE v[i] END) AS v
                   FROM base WHERE id < 40),
            u AS (SELECT * FROM base UNION ALL SELECT * FROM pl),
            s AS (SELECT a.id AS id_a, b.id AS id_b,
                         list_dot_product(a.v, b.v)
                         / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cos
                  FROM u a JOIN u b ON a.id < b.id)
            SELECT id_a, id_b, round(cos, 6) AS cos FROM s WHERE round(cos, 6) >= 0.9
        """,
        "multimodal_features": """
            WITH m AS (SELECT doc_id AS media_id, md5(text) AS hx FROM documents),
            i AS (SELECT unnest(range(0, 8)) AS idx)
            SELECT media_id, CAST(idx AS INTEGER) AS idx,
                   ((strpos('0123456789abcdef', substr(hx, idx*2 + 1, 1)) - 1) * 16
                    + (strpos('0123456789abcdef', substr(hx, idx*2 + 2, 1)) - 1)) / 256.0 AS feat
            FROM m, i
        """,
        # personalized delta recurrence on the source chain: source rank=1
        # at superstep 1, each chain hop multiplies by damp=0.85; vertices
        # farther than maxIter−1 hops (or off the source chain) stay 0.0.
        # Bit-exact: the CTE performs the engine's float64 op (0.85·r).
        "ec_ppr5": f"""
            WITH RECURSIVE pr(d, r) AS (
                SELECT 0, CAST(1.0 AS DOUBLE)
                UNION ALL SELECT d + 1, CAST(0.85 AS DOUBLE) * r FROM pr WHERE d < 4
            ),
            pos AS ({EC_POS}),
            mu AS (SELECT MIN(user_id) AS mu FROM events)
            SELECT pos.event_id AS id, coalesce(pr.r, 0.0) AS value
            FROM pos CROSS JOIN mu LEFT JOIN pr
              ON pr.d = pos.rn AND pos.user_id = mu.mu
        """,
        # multi-seed PPR: per seed, value = 0.85^position along the
        # seed's own chain (seeds are the 3 smallest users' first
        # events), 0 everywhere else — ec_ppr5's closed form per seed
        "ec_ppr_multi": f"""
            WITH RECURSIVE pr(d, r) AS (
                SELECT 0, CAST(1.0 AS DOUBLE)
                UNION ALL SELECT d + 1, CAST(0.85 AS DOUBLE) * r FROM pr WHERE d < 4
            ),
            pos AS ({EC_POS}),
            su AS (SELECT user_id, event_id AS seed FROM pos
                   WHERE rn = 0 ORDER BY user_id LIMIT 3)
            SELECT pos.event_id AS id, su.seed AS seed,
                   coalesce(pr.r, 0.0) AS value
            FROM pos CROSS JOIN su LEFT JOIN pr
              ON pr.d = pos.rn AND pos.user_id = su.user_id
        """,
        # streaming DisjointSet components == batch wcc restricted to
        # vertices that appear in an edge (users with ≥ 2 events)
        "ec_stream_wcc": """
            WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1)
            SELECT e.event_id AS id, MIN(e.event_id) OVER (PARTITION BY e.user_id) AS value
            FROM events e JOIN c ON e.user_id = c.user_id
            WHERE c.n >= 2
        """,
        # bipartiteness verdicts derived genuinely from the data: hier is
        # non-bipartite iff it has a triangle (by construction its only odd
        # cycles are customer-nation-region triangles); sp is bipartite iff
        # the natural side-coloring (suppkey < 1e6 ≤ partkey+1e6) is proper.
        "stream_bipartiteness": """
            WITH e0 AS (
                SELECT CAST(c_custkey AS BIGINT) AS src,
                       CAST(c_nationkey + 2000000 AS BIGINT) AS dst FROM customer
                UNION ALL
                SELECT CAST(n_nationkey + 2000000 AS BIGINT),
                       CAST(n_regionkey + 3000000 AS BIGINT) FROM nation
                UNION ALL
                SELECT CAST(c_custkey AS BIGINT), CAST(n_regionkey + 3000000 AS BIGINT)
                FROM customer JOIN nation ON c_nationkey = n_nationkey
            ),
            e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
                  FROM e0 WHERE src <> dst),
            tri AS (SELECT 1 AS x FROM e e1 JOIN e e2 ON e1.b = e2.a
                    JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
            spe AS (SELECT DISTINCT l_suppkey AS src, l_partkey + 1000000 AS dst
                    FROM lineitem)
            SELECT 'hier' AS g, NOT EXISTS (SELECT 1 FROM tri) AS success
            UNION ALL
            SELECT 'sp' AS g,
                   NOT EXISTS (SELECT 1 FROM spe
                               WHERE (src < 1000000) = (dst < 1000000)) AS success
        """,
        # event chains are a forest ⇒ spanner = every canonical edge
        "ec_spanner": f"""
            WITH pos AS ({EC_POS}),
            edg AS (SELECT a.event_id AS s, b.event_id AS d
                    FROM pos a JOIN pos b
                      ON a.user_id = b.user_id AND b.rn = a.rn + 1)
            SELECT DISTINCT least(s, d) AS src, greatest(s, d) AS dst FROM edg
        """,
        # matching invariants (the matching itself is protocol-order
        # dependent; these are not): mutuality, capacity, non-emptiness
        "ec_maxbmatching_inv": """
            SELECT CAST(0 AS BIGINT) AS mutual_violations,
                   CAST(0 AS BIGINT) AS capacity_violations,
                   true AS nonempty
        """,
        # ANN recall invariants: measured recall@5 is well above the 0.5
        # floor pinned in the Spark query (the result itself is
        # hash-order-dependent on bucket randomness, the floor is not)
        "emb_lsh_recall": "SELECT true AS recall_ok",
        "emb_ivf_recall": "SELECT true AS recall_ok",
        "emb_ivfpq_recall": "SELECT true AS recall_ok",
        "emb_semantic_dedup_inv": (
            "SELECT CAST(0 AS BIGINT) AS unsound_drops,"
            " CAST(0 AS BIGINT) AS missed_drops, true AS found_drops"
        ),
        "doc_jsonl_roundtrip": (
            "SELECT doc_id, source, text FROM documents ORDER BY doc_id"
        ),
        "ec_hyperanf": """
            SELECT range::INT AS t, true AS within_bound FROM range(0, 9)
        """,
        "ec_effective_diameter": "SELECT true AS diam_ok",
        "doc_hybrid_retrieval": f"""
            WITH q(query_id, query_text) AS (VALUES
                (0, 'hash join shuffle'),
                (1, 'window sort merge batch'),
                (2, 'slow scan table')),
            qt AS (
                SELECT DISTINCT query_id,
                       unnest(list_filter(regexp_split_to_array(
                           lower(query_text), '[^a-z0-9]+'), x -> x <> ''))
                           AS token
                FROM q
            ),
            tok AS (SELECT doc_id, unnest({TOKS}) AS token FROM documents),
            tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
            dfq AS (SELECT token, count(DISTINCT doc_id) AS df
                    FROM tok GROUP BY 1),
            lens AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
            st AS (SELECT (SELECT count(*)::DOUBLE FROM documents) AS n,
                          (SELECT avg(dl) FROM lens) AS avgdl),
            sc AS (
                SELECT qt.query_id, tf.doc_id,
                       ROUND(SUM(
                           ln(1.0 + (st.n - dfq.df + 0.5) / (dfq.df + 0.5))
                           * (tf.tf::DOUBLE * 2.2)
                           / (tf.tf::DOUBLE
                              + 1.2 * (0.25 + 0.75 * lens.dl::DOUBLE
                                       / st.avgdl))
                       ), 6) AS score
                FROM tf
                JOIN qt USING (token)
                JOIN dfq USING (token)
                JOIN lens ON tf.doc_id = lens.doc_id, st
                GROUP BY 1, 2
            ),
            sparse AS (
                SELECT query_id, doc_id,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY score DESC, doc_id) AS rank
                FROM sc QUALIFY rank <= 10
            ),
            v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
            cs AS (
                SELECT a.vec_id AS query_id, b.vec_id AS doc_id,
                       list_dot_product(a.ev, b.ev)
                       / (sqrt(list_dot_product(a.ev, a.ev))
                          * sqrt(list_dot_product(b.ev, b.ev))) AS cos
                FROM v a JOIN v b ON a.vec_id <> b.vec_id
                WHERE a.vec_id < 3
            ),
            dense AS (
                SELECT query_id, doc_id,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY cos DESC, doc_id) AS rank
                FROM cs QUALIFY rank <= 10
            ),
            u AS (
                SELECT query_id, doc_id, 1.0 / (60.0 + rank) AS c FROM sparse
                UNION ALL
                SELECT query_id, doc_id, 1.0 / (60.0 + rank) AS c FROM dense
            ),
            fused AS (
                SELECT query_id, doc_id, ROUND(SUM(c), 6) AS rrf
                FROM u GROUP BY 1, 2
            )
            SELECT query_id, doc_id, rrf,
                   CAST(row_number() OVER (PARTITION BY query_id
                                           ORDER BY rrf DESC, doc_id)
                        AS BIGINT) AS rank
            FROM fused QUALIFY rank <= 10
            ORDER BY query_id, rank
        """,
        "doc_bm25": f"""
            WITH q(query_id, query_text) AS (VALUES
                (0, 'hash join shuffle'),
                (1, 'window sort merge batch'),
                (2, 'slow scan table')),
            qt AS (
                SELECT DISTINCT query_id,
                       unnest(list_filter(regexp_split_to_array(
                           lower(query_text), '[^a-z0-9]+'), x -> x <> ''))
                           AS token
                FROM q
            ),
            tok AS (SELECT doc_id, unnest({TOKS}) AS token FROM documents),
            tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
            dfq AS (SELECT token, count(DISTINCT doc_id) AS df
                    FROM tok GROUP BY 1),
            lens AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
            st AS (SELECT (SELECT count(*)::DOUBLE FROM documents) AS n,
                          (SELECT avg(dl) FROM lens) AS avgdl),
            sc AS (
                SELECT qt.query_id, tf.doc_id,
                       ROUND(SUM(
                           ln(1.0 + (st.n - dfq.df + 0.5) / (dfq.df + 0.5))
                           * (tf.tf::DOUBLE * 2.2)
                           / (tf.tf::DOUBLE
                              + 1.2 * (0.25 + 0.75 * lens.dl::DOUBLE
                                       / st.avgdl))
                       ), 6) AS score
                FROM tf
                JOIN qt USING (token)
                JOIN dfq USING (token)
                JOIN lens ON tf.doc_id = lens.doc_id, st
                GROUP BY 1, 2
            ),
            r AS (
                SELECT query_id, doc_id, score,
                       CAST(row_number() OVER (
                           PARTITION BY query_id
                           ORDER BY score DESC, doc_id) AS BIGINT) AS rank
                FROM sc
            )
            SELECT query_id, doc_id, score, rank FROM r WHERE rank <= 10
            ORDER BY query_id, rank
        """,
        # Kendall tau between the two BM25 settings: k1=1.2/b=0.75 vs
        # k1=2.0/b=0.3 (so tf·2.2/(tf+1.2·(0.25+0.75·dl/avgdl)) vs
        # tf·3.0/(tf+2.0·(0.7+0.3·dl/avgdl))); exact integer pair counts
        "doc_rank_correlation": f"""
            WITH q AS (
                SELECT doc_id AS query_id,
                       array_to_string(({TOKS})[1:5], ' ') AS query_text
                FROM documents WHERE doc_id < 3),
            qt AS (
                SELECT DISTINCT query_id,
                       unnest(list_filter(regexp_split_to_array(
                           lower(query_text), '[^a-z0-9]+'), x -> x <> ''))
                           AS token
                FROM q
            ),
            tok AS (SELECT doc_id, unnest({TOKS}) AS token FROM documents),
            tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
            dfq AS (SELECT token, count(DISTINCT doc_id) AS df
                    FROM tok GROUP BY 1),
            lens AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
            st AS (SELECT (SELECT count(*)::DOUBLE FROM documents) AS n,
                          (SELECT avg(dl) FROM lens) AS avgdl),
            sc_a AS (
                SELECT qt.query_id, tf.doc_id,
                       ROUND(SUM(
                           ln(1.0 + (st.n - dfq.df + 0.5) / (dfq.df + 0.5))
                           * (tf.tf::DOUBLE * 2.2)
                           / (tf.tf::DOUBLE
                              + 1.2 * (0.25 + 0.75 * lens.dl::DOUBLE / st.avgdl))
                       ), 6) AS score
                FROM tf JOIN qt USING (token) JOIN dfq USING (token)
                JOIN lens ON tf.doc_id = lens.doc_id, st
                GROUP BY 1, 2
            ),
            sc_b AS (
                SELECT qt.query_id, tf.doc_id,
                       ROUND(SUM(
                           ln(1.0 + (st.n - dfq.df + 0.5) / (dfq.df + 0.5))
                           * (tf.tf::DOUBLE * 3.0)
                           / (tf.tf::DOUBLE
                              + 2.0 * (0.7 + 0.3 * lens.dl::DOUBLE / st.avgdl))
                       ), 6) AS score
                FROM tf JOIN qt USING (token) JOIN dfq USING (token)
                JOIN lens ON tf.doc_id = lens.doc_id, st
                GROUP BY 1, 2
            ),
            r_a AS (SELECT query_id, doc_id,
                        CAST(row_number() OVER (PARTITION BY query_id
                             ORDER BY score DESC, doc_id) AS BIGINT) AS ra
                    FROM sc_a QUALIFY ra <= 10),
            r_b AS (SELECT query_id, doc_id,
                        CAST(row_number() OVER (PARTITION BY query_id
                             ORDER BY score DESC, doc_id) AS BIGINT) AS rb
                    FROM sc_b QUALIFY rb <= 10),
            c AS (SELECT r_a.query_id, r_a.doc_id, ra, rb
                  FROM r_a JOIN r_b
                    ON r_a.query_id = r_b.query_id AND r_a.doc_id = r_b.doc_id),
            pr AS (SELECT x.query_id,
                          CAST(SUM(CASE WHEN (x.ra - y.ra) * (x.rb - y.rb) > 0
                                   THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
                          CAST(SUM(CASE WHEN (x.ra - y.ra) * (x.rb - y.rb) < 0
                                   THEN 1 ELSE 0 END) AS BIGINT) AS discordant
                   FROM c x JOIN c y
                     ON x.query_id = y.query_id AND x.doc_id < y.doc_id
                   GROUP BY 1),
            nc AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_common
                   FROM c GROUP BY 1)
            SELECT nc.query_id, nc.n_common,
                   COALESCE(pr.concordant, 0) AS concordant,
                   COALESCE(pr.discordant, 0) AS discordant,
                   CASE WHEN nc.n_common >= 2
                        THEN CAST(COALESCE(pr.concordant, 0)
                                  - COALESCE(pr.discordant, 0) AS DOUBLE)
                             / CAST(nc.n_common * (nc.n_common - 1) // 2 AS BIGINT)
                        ELSE 0.0 END AS tau
            FROM nc LEFT JOIN pr ON nc.query_id = pr.query_id
        """,
        "doc_language_mix": f"""
            WITH aug AS (
                SELECT doc_id,
                       text || CASE
                           WHEN doc_id % 5 = 0
                               THEN ' los datos son para todos y las tablas'
                           WHEN doc_id % 7 = 0
                               THEN ' le rapport est dans des pages pour la version'
                           WHEN doc_id % 11 = 0
                               THEN ' der bericht ist von und mit den daten im system'
                           ELSE '' END AS text
                FROM documents),
            t AS (SELECT doc_id, {TOKS} AS toks FROM aug),
            h AS (SELECT doc_id,
                CAST(len(list_filter(toks, x -> list_contains(
                    ['der','die','das','und','ist','von','zu','mit','den','im','ein','eine'], x))) AS BIGINT) AS hits_de,
                CAST(len(list_filter(toks, x -> list_contains({STOP_EN}, x))) AS BIGINT) AS hits_en,
                CAST(len(list_filter(toks, x -> list_contains(
                    ['el','los','las','y','que','en','un','una','es','por','con','para'], x))) AS BIGINT) AS hits_es,
                CAST(len(list_filter(toks, x -> list_contains(
                    ['le','la','les','et','des','un','une','est','dans','pour','sur','que'], x))) AS BIGINT) AS hits_fr
                FROM t)
            SELECT doc_id, hits_de, hits_en, hits_es, hits_fr,
                   CAST((CASE WHEN hits_de >= 2 THEN 1 ELSE 0 END)
                      + (CASE WHEN hits_en >= 2 THEN 1 ELSE 0 END)
                      + (CASE WHEN hits_es >= 2 THEN 1 ELSE 0 END)
                      + (CASE WHEN hits_fr >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_langs,
                   ((CASE WHEN hits_de >= 2 THEN 1 ELSE 0 END)
                  + (CASE WHEN hits_en >= 2 THEN 1 ELSE 0 END)
                  + (CASE WHEN hits_es >= 2 THEN 1 ELSE 0 END)
                  + (CASE WHEN hits_fr >= 2 THEN 1 ELSE 0 END)) >= 2 AS mixed
            FROM h
        """,
        "dedup_containment": f"""
            WITH sh AS ({SHINGLES}),
            sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
            i AS (SELECT a.doc_id AS doc_inner, b.doc_id AS doc_outer,
                         count(*) AS i
                  FROM sh a JOIN sh b
                    ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
                  GROUP BY 1, 2)
            SELECT doc_inner, doc_outer,
                   CAST(i.i AS DOUBLE) / sz.sz AS containment
            FROM i JOIN sz ON sz.doc_id = i.doc_inner
            WHERE CAST(i.i AS DOUBLE) / sz.sz >= 0.8
        """,
        "doc_blocklist": f"""
            WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
            bg AS (SELECT doc_id, toks,
                       CASE WHEN len(toks) >= 2
                            THEN list_transform(range(0, len(toks) - 1),
                                                i -> toks[i+1] || ' ' || toks[i+2])
                            ELSE CAST([] AS VARCHAR[]) END AS b2
                   FROM t),
            c AS (SELECT doc_id,
                      len(list_filter(toks, x -> x = 'slow')) AS c0,
                      len(list_filter(b2, x -> x = 'table scan')) AS c1,
                      len(list_filter(b2, x -> x = 'big query')) AS c2
                  FROM bg)
            SELECT doc_id,
                   CAST(c0 + c1 + c2 AS BIGINT) AS n_blocked,
                   coalesce(array_to_string(list_filter([
                       CASE WHEN c0 > 0 THEN 'slow' END,
                       CASE WHEN c1 > 0 THEN 'table scan' END,
                       CASE WHEN c2 > 0 THEN 'big query' END
                   ], x -> x IS NOT NULL), ','), '') AS blocked_terms,
                   (c0 + c1 + c2) = 0 AS keep
            FROM c
        """,
        "doc_domains": f"""
            WITH {_DOMAIN_CTES}
            SELECT doc_id, host, domain FROM dom
        """,
        "doc_domain_stats": f"""
            WITH {_DOMAIN_CTES},
            t AS (SELECT doc_id, CAST(len({TOKS}) AS BIGINT) AS nt
                  FROM documents)
            SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(nt) AS BIGINT) AS n_tokens,
                   round(count(*) / (SELECT count(*)::DOUBLE FROM documents),
                         6) AS doc_share
            FROM dom JOIN t USING (doc_id)
            GROUP BY domain
        """,
        # most-specific blocklist entry first (same order the Spark gate
        # compiles): assets.blog.net, news.co.uk, then shop.com
        "doc_domain_blocklist": f"""
            WITH {_DOMAIN_CTES},
            m AS (SELECT doc_id, host,
                     CASE WHEN host = 'assets.blog.net'
                               OR ends_with(host, '.assets.blog.net')
                              THEN 'assets.blog.net'
                          WHEN host = 'news.co.uk'
                               OR ends_with(host, '.news.co.uk')
                              THEN 'news.co.uk'
                          WHEN host = 'shop.com'
                               OR ends_with(host, '.shop.com')
                              THEN 'shop.com'
                     END AS matched_domain
                  FROM dom)
            SELECT doc_id, host, matched_domain,
                   CASE WHEN host = '' THEN NULL
                        ELSE matched_domain IS NULL END AS keep
            FROM m
        """,
        "doc_domain_quality": f"""
            WITH {_DOMAIN_CTES},
            t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
            s AS (SELECT doc_id,
                CAST(len(toks) AS INTEGER) AS n_tokens,
                len(list_filter(toks, x -> list_contains({STOP_EN}, x))) AS n_stop,
                CASE WHEN len(toks) > 0
                     THEN CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks)
                     ELSE 0.0 END AS mean_token_len
                FROM t),
            q AS (SELECT doc_id,
                (CASE WHEN n_tokens > 0 AND CAST(n_stop AS DOUBLE)/n_tokens >= 0.01
                           AND CAST(n_stop AS DOUBLE)/n_tokens <= 0.5 THEN 0.4 ELSE 0.0 END
                 + CASE WHEN mean_token_len >= 3.0 AND mean_token_len <= 10.0 THEN 0.3 ELSE 0.0 END
                 + CASE WHEN n_tokens >= 10 AND n_tokens <= 100000 THEN 0.3 ELSE 0.0 END) AS score
                FROM s)
            SELECT domain, score, CAST(count(*) AS BIGINT) AS n_docs
            FROM dom JOIN q USING (doc_id)
            GROUP BY 1, 2
        """,
        "doc_domain_cap": f"""
            WITH {_DOMAIN_CTES},
            r AS (SELECT doc_id, domain,
                row_number() OVER (PARTITION BY domain
                    ORDER BY (('0x' || substr(md5((doc_id)::VARCHAR || 'cap'), 1, 8))::BIGINT
                              / 4294967296.0) ASC, doc_id ASC) AS rn
              FROM dom)
            SELECT doc_id, domain FROM r WHERE rn <= 16
        """,
        # canonical key derived in CLOSED FORM from the fixture's doc_id
        # arithmetic — independent of the Spark canonicalizer's parsing
        "doc_url_canonical": f"""
            WITH {_MESSY_URL_CTES}
            SELECT doc_id, url, canon AS canonical_url FROM u
        """,
        "doc_url_dedup": f"""
            WITH {_MESSY_URL_CTES}
            SELECT doc_id, canon AS canonical_url,
                   canon = '' OR
                   doc_id = min(doc_id) OVER (PARTITION BY canon) AS keep
            FROM u
        """,
        # shard packing oracle: the two-level cumsum recomputed as ONE
        # flat window over (source, doc_id) — same arithmetic, different
        # formulation
        "doc_shards": f"""
            WITH t AS (SELECT doc_id, source,
                           CAST(len({TOKS}) AS BIGINT) AS n_tokens
                       FROM documents),
            c AS (SELECT doc_id, source, n_tokens,
                     coalesce(sum(n_tokens) OVER (PARTITION BY source
                        ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) AS cb
                  FROM t)
            SELECT doc_id, source, n_tokens,
                   CAST(cb // 500 AS BIGINT) AS shard
            FROM c
        """,
        "doc_shard_manifest": f"""
            WITH t AS (SELECT doc_id, source,
                           CAST(len({TOKS}) AS BIGINT) AS n_tokens
                       FROM documents),
            c AS (SELECT doc_id, source, n_tokens,
                     coalesce(sum(n_tokens) OVER (PARTITION BY source
                        ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) AS cb
                  FROM t),
            a AS (SELECT doc_id, source, n_tokens,
                     CAST(cb // 500 AS BIGINT) AS shard FROM c)
            SELECT source, shard,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
                   min(doc_id) AS first_doc_id,
                   max(doc_id) AS last_doc_id
            FROM a GROUP BY 1, 2
        """,
        # shard writer roundtrip: same arithmetic as doc_shard_manifest
        # (the entry returns the manifest recomputed from the re-read
        # DATA files, so this oracle checks the written data itself)
        "doc_shard_roundtrip": f"""
            WITH t AS (SELECT doc_id, source,
                           CAST(len({TOKS}) AS BIGINT) AS n_tokens
                       FROM documents),
            c AS (SELECT doc_id, source, n_tokens,
                     coalesce(sum(n_tokens) OVER (PARTITION BY source
                        ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) AS cb
                  FROM t),
            a AS (SELECT doc_id, source, n_tokens,
                     CAST(cb // 500 AS BIGINT) AS shard FROM c)
            SELECT source, shard,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
                   min(doc_id) AS first_doc_id,
                   max(doc_id) AS last_doc_id
            FROM a GROUP BY 1, 2
        """,
        "doc_mixture_plan": f"""
            WITH a AS (SELECT source,
                          CAST(sum(len({TOKS})) AS BIGINT) AS available_tokens
                       FROM documents GROUP BY source),
            w AS (SELECT source, available_tokens,
                     CAST(CASE source WHEN 'src0' THEN 0.5
                          WHEN 'src1' THEN 0.3
                          WHEN 'src2' THEN 0.2 ELSE 0.0 END AS DOUBLE) AS wt
                  FROM a)
            SELECT source, available_tokens,
                   round(wt, 6) AS weight,
                   CAST(floor(wt * 6000) AS BIGINT) AS target_tokens,
                   round(CAST(floor(wt * 6000) AS BIGINT)::DOUBLE
                         / available_tokens, 6) AS epochs,
                   round(CAST(floor(wt * 6000) AS BIGINT)::DOUBLE
                         / available_tokens, 6) > 1.0 AS oversampled
            FROM w
        """,
        "doc_datasheet": f"""
            WITH t AS (SELECT lang, source, {TOKS} AS toks FROM documents),
            s AS (SELECT lang, source,
                CAST(len(toks) AS BIGINT) AS nt,
                CAST(len(toks) AS INTEGER) AS n_tokens,
                len(list_filter(toks, x -> list_contains({STOP_EN}, x))) AS n_stop,
                CASE WHEN len(toks) > 0
                     THEN CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks)
                     ELSE 0.0 END AS mean_token_len
                FROM t),
            q AS (SELECT lang, source, nt,
                CAST(CAST(round(
                (CASE WHEN n_tokens > 0 AND CAST(n_stop AS DOUBLE)/n_tokens >= 0.01
                           AND CAST(n_stop AS DOUBLE)/n_tokens <= 0.5 THEN 0.4 ELSE 0.0 END
                 + CASE WHEN mean_token_len >= 3.0 AND mean_token_len <= 10.0 THEN 0.3 ELSE 0.0 END
                 + CASE WHEN n_tokens >= 10 AND n_tokens <= 100000 THEN 0.3 ELSE 0.0 END
                ) * 10, 0) AS INTEGER) AS VARCHAR) AS band
                FROM s),
            g AS (SELECT
                CASE WHEN GROUPING(lang) = 0 THEN 'language'
                     WHEN GROUPING(source) = 0 THEN 'source'
                     WHEN GROUPING(band) = 0 THEN 'quality_band'
                     ELSE 'overall' END AS section,
                coalesce(lang, source, band, 'all') AS key,
                CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(nt) AS BIGINT) AS n_tokens
                FROM q GROUP BY GROUPING SETS ((), (lang), (source), (band)))
            SELECT section, key, n_docs, n_tokens,
                round(CAST(n_docs AS DOUBLE)
                      / sum(n_docs) OVER (PARTITION BY section), 6) AS doc_share,
                round(CAST(n_tokens AS DOUBLE)
                      / sum(n_tokens) OVER (PARTITION BY section), 6) AS token_share
            FROM g
        """,
        # retrieval eval: BM25's run (same CTEs as doc_bm25, queries from
        # seed docs) scored vs same-source qrels; DCG folds SORTED rank
        # lists so the float accumulation order matches Spark's
        # sorted-array aggregate
        "doc_retrieval_metrics": f"""
            WITH q AS (
                SELECT doc_id AS query_id, source,
                       array_to_string(({TOKS})[1:5], ' ') AS query_text
                FROM documents WHERE doc_id < 3),
            qt AS (
                SELECT DISTINCT query_id,
                       unnest(list_filter(regexp_split_to_array(
                           lower(query_text), '[^a-z0-9]+'), x -> x <> ''))
                           AS token
                FROM q
            ),
            tok AS (SELECT doc_id, unnest({TOKS}) AS token FROM documents),
            tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
            dfq AS (SELECT token, count(DISTINCT doc_id) AS df
                    FROM tok GROUP BY 1),
            lens AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
            st AS (SELECT (SELECT count(*)::DOUBLE FROM documents) AS n,
                          (SELECT avg(dl) FROM lens) AS avgdl),
            sc AS (
                SELECT qt.query_id, tf.doc_id,
                       ROUND(SUM(
                           ln(1.0 + (st.n - dfq.df + 0.5) / (dfq.df + 0.5))
                           * (tf.tf::DOUBLE * 2.2)
                           / (tf.tf::DOUBLE
                              + 1.2 * (0.25 + 0.75 * lens.dl::DOUBLE
                                       / st.avgdl))
                       ), 6) AS score
                FROM tf
                JOIN qt USING (token)
                JOIN dfq USING (token)
                JOIN lens ON tf.doc_id = lens.doc_id, st
                GROUP BY 1, 2
            ),
            r AS (
                SELECT query_id, doc_id,
                       CAST(row_number() OVER (
                           PARTITION BY query_id
                           ORDER BY score DESC, doc_id) AS BIGINT) AS rank
                FROM sc
            ),
            rk AS (SELECT query_id, doc_id, rank FROM r WHERE rank <= 10),
            rel AS (
                SELECT q.query_id, d.doc_id
                FROM q JOIN documents d ON d.source = q.source
            ),
            nr AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_rel
                   FROM rel GROUP BY 1),
            pq AS (
                SELECT rk.query_id,
                       list_sort(list(rk.rank)
                           FILTER (WHERE rel.doc_id IS NOT NULL)) AS rr,
                       CAST(coalesce(SUM(CASE WHEN rel.doc_id IS NOT NULL
                                         THEN 1 ELSE 0 END), 0) AS BIGINT) AS hits
                FROM rk LEFT JOIN rel
                  ON rk.query_id = rel.query_id AND rk.doc_id = rel.doc_id
                GROUP BY 1
            ),
            m AS (
                -- LEFT JOIN from nr: a query with relevant docs that
                -- retrieved nothing in the top-k run scores 0, not a
                -- dropped row (mirrors retrieval_metrics)
                SELECT nr.query_id, nr.n_rel,
                       CAST(coalesce(pq.hits, 0) AS BIGINT) AS hits,
                       COALESCE(list_sum(list_transform(
                           coalesce(rr, CAST([] AS BIGINT[])),
                           x -> 0.6931471805599453 / ln(x + 1.0))), 0.0) AS dcg,
                       COALESCE(list_sum(list_transform(
                           range(1, least(nr.n_rel, 10) + 1),
                           x -> 0.6931471805599453 / ln(x + 1.0))), 0.0) AS idcg
                FROM nr LEFT JOIN pq ON pq.query_id = nr.query_id
            )
            SELECT query_id, n_rel, hits,
                   round(CAST(hits AS DOUBLE) / n_rel, 6) AS recall,
                   round(dcg, 6) AS dcg,
                   round(idcg, 6) AS idcg,
                   round(CASE WHEN idcg > 0 THEN dcg / idcg ELSE 0.0 END, 6) AS ndcg
            FROM m
        """,
        "doc_tfidf_pairs": f"""
            WITH tok AS (
                SELECT doc_id, unnest({TOKS}) AS token FROM documents
            ),
            tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
            dfq AS (SELECT token, count(DISTINCT doc_id) AS df
                    FROM tok GROUP BY 1),
            nn AS (SELECT count(*)::DOUBLE AS n FROM documents),
            w AS (
                SELECT doc_id, token,
                       tf::DOUBLE * (nn.n / df::DOUBLE) AS w
                FROM tf JOIN dfq USING (token), nn
            ),
            norms AS (
                SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY 1
            ),
            dots AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                       sum(a.w * b.w) AS dot
                FROM w a JOIN w b ON a.token = b.token
                                  AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            )
            SELECT doc_a, doc_b,
                   ROUND(dot / (na.nrm * nb.nrm), 6) AS cos
            FROM dots
            JOIN norms na ON dots.doc_a = na.doc_id
            JOIN norms nb ON dots.doc_b = nb.doc_id
            WHERE ROUND(dot / (na.nrm * nb.nrm), 6) >= 0.8
            ORDER BY doc_a, doc_b
        """,
        "doc_zipf_fit": f"""
            WITH tok AS (SELECT unnest({TOKS}) AS token FROM documents),
            v AS (SELECT token, count(*) AS freq FROM tok GROUP BY 1),
            r AS (
                SELECT ln((row_number() OVER (ORDER BY freq DESC, token))
                          ::DOUBLE) AS x,
                       ln(freq::DOUBLE) AS y
                FROM v
            ),
            a AS (
                SELECT count(*)::DOUBLE AS n, sum(x) AS sx, sum(y) AS sy,
                       sum(x * x) AS sxx, sum(y * y) AS syy,
                       sum(x * y) AS sxy
                FROM r
            )
            SELECT CAST(n AS BIGINT) AS n_types,
                   ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
                       AS slope,
                   ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx)
                          * sx) / n, 6) AS intercept,
                   ROUND(((n * sxy - sx * sy) * (n * sxy - sx * sy))
                         / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
                       AS r2
            FROM a
        """,
        "doc_negative_samples": """
            WITH qs AS (SELECT range AS q FROM range(0, 50)),
            p AS (SELECT q, (q * 7 + 3) % 500 AS pos FROM qs),
            c AS (
                SELECT qs.q, s.range AS slot, a.range AS attempt,
                       (('0x' || substr(md5('42:' || qs.q::VARCHAR || ':'
                            || s.range::VARCHAR || ':'
                            || a.range::VARCHAR), 1, 8))::BIGINT % 500)
                           AS neg_id
                FROM qs, range(0, 4) s, range(0, 8) a
            ),
            ok AS (
                SELECT c.q, c.slot, c.attempt, c.neg_id
                FROM c ANTI JOIN p ON c.q = p.q AND c.neg_id = p.pos
                WHERE c.neg_id <> c.q
            )
            SELECT q AS query_id, CAST(slot AS INTEGER) AS slot,
                   min_by(neg_id, attempt) AS neg_id
            FROM ok GROUP BY q, slot
            ORDER BY query_id, slot
        """,
        "doc_bpe_apply_inv": (
            "SELECT CAST(0 AS BIGINT) AS mismatches,"
            " CAST(0 AS BIGINT) AS concat_violations, true AS nonempty"
        ),
        "ec_window_lp": """
            WITH ch AS (
                SELECT user_id, event_id, ts,
                       lag(event_id) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) AS prev_id
                FROM events
            ),
            ed AS (
                SELECT user_id,
                       epoch(date_trunc('hour', ts))::BIGINT AS ws,
                       prev_id, event_id, ts,
                       row_number() OVER (
                           PARTITION BY user_id, date_trunc('hour', ts)
                           ORDER BY ts, event_id
                       ) AS rn
                FROM ch WHERE prev_id IS NOT NULL
            ),
            verts AS (
                SELECT user_id, ws, prev_id AS id, 0 AS ord
                FROM ed WHERE rn = 1
                UNION ALL
                SELECT user_id, ws, event_id, rn FROM ed
            )
            SELECT ws AS window_start, id,
                   MAX(id) OVER (
                       PARTITION BY user_id, ws ORDER BY ord
                       ROWS BETWEEN 10 PRECEDING AND CURRENT ROW
                   ) AS label
            FROM verts
        """,
        # the incremental variant replays the exact-integer LP in-state;
        # emissions are bit-identical to the batch run, same closed form
        "ec_window_lp_incr": """
            WITH ch AS (
                SELECT user_id, event_id, ts,
                       lag(event_id) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) AS prev_id
                FROM events
            ),
            ed AS (
                SELECT user_id,
                       epoch(date_trunc('hour', ts))::BIGINT AS ws,
                       prev_id, event_id, ts,
                       row_number() OVER (
                           PARTITION BY user_id, date_trunc('hour', ts)
                           ORDER BY ts, event_id
                       ) AS rn
                FROM ch WHERE prev_id IS NOT NULL
            ),
            verts AS (
                SELECT user_id, ws, prev_id AS id, 0 AS ord
                FROM ed WHERE rn = 1
                UNION ALL
                SELECT user_id, ws, event_id, rn FROM ed
            )
            SELECT ws AS window_start, id,
                   MAX(id) OVER (
                       PARTITION BY user_id, ws ORDER BY ord
                       ROWS BETWEEN 10 PRECEDING AND CURRENT ROW
                   ) AS label
            FROM verts
        """,
        "gen_wcc_random": """
            WITH RECURSIVE e0 AS (
                SELECT a.range AS src, b.range AS dst
                FROM range(0, 60) a, range(0, 60) b
                WHERE a.range <> b.range
                  AND (('0x' || substr(md5('9:' || a.range::VARCHAR || ':'
                           || b.range::VARCHAR), 1, 8))::BIGINT
                       / 4294967296.0) < 0.02
            ),
            und AS (
                SELECT DISTINCT src, dst FROM (
                    SELECT src, dst FROM e0
                    UNION ALL SELECT dst, src FROM e0
                )
            ),
            verts AS (
                SELECT DISTINCT id FROM (
                    SELECT src AS id FROM e0 UNION SELECT dst FROM e0
                )
            ),
            reach(id, r) AS (
                SELECT id, id FROM verts
                UNION
                SELECT und.dst, reach.r
                FROM reach JOIN und ON und.src = reach.id
            )
            SELECT id, CAST(MIN(r) AS BIGINT) AS value
            FROM reach GROUP BY id
        """,
        "gen_random_graph": """
            SELECT a.range AS src, b.range AS dst
            FROM range(0, 60) a, range(0, 60) b
            WHERE a.range <> b.range
              AND (('0x' || substr(md5('7:' || a.range::VARCHAR || ':'
                                        || b.range::VARCHAR), 1, 8))::BIGINT
                   / 4294967296.0) < 0.1
            ORDER BY src, dst
        """,
        "gen_betweenness_sampled": """
            WITH ids AS (SELECT range AS id FROM range(0, 50)),
            s AS (
                SELECT id FROM ids
                ORDER BY md5(id::VARCHAR || ':42'), id
                LIMIT 20
            ),
            nl AS (SELECT count(*) AS n_leaves FROM s WHERE id <> 0)
            SELECT ids.id,
                   CASE WHEN ids.id = 0
                        THEN (50.0 / 20) * nl.n_leaves * 24
                        ELSE 0.0 END AS betweenness
            FROM ids, nl
        """,
        "doc_span_removal": r"""
            WITH toks AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(trim(text), '\s+'),
                                   x -> x <> '') AS t
                FROM documents
            ),
            win AS (
                SELECT doc_id, i AS i1,
                       md5(array_to_string(list_slice(t, i, i + 7), ' ')) AS h
                FROM toks, UNNEST(generate_series(1, len(t) - 7)) AS s(i)
                WHERE len(t) >= 8
            ),
            cnt AS (SELECT h, count(*) AS c FROM win GROUP BY h),
            cov AS (
                SELECT DISTINCT doc_id, p
                FROM win JOIN cnt USING (h),
                     UNNEST(generate_series(win.i1, win.i1 + 7)) AS u(p)
                WHERE c >= 2
            ),
            pos AS (
                SELECT doc_id, i AS pos, t[i] AS tok
                FROM toks, UNNEST(generate_series(1, len(t))) AS s(i)
            ),
            kept AS (
                SELECT pos.doc_id, pos.pos, pos.tok
                FROM pos ANTI JOIN cov
                  ON pos.doc_id = cov.doc_id AND pos.pos = cov.p
            ),
            reb AS (
                SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
                       count(*) AS kept
                FROM kept GROUP BY doc_id
            )
            SELECT t.doc_id,
                   COALESCE(reb.clean_text, '') AS clean_text,
                   CAST(len(t.t) AS BIGINT) AS n_tokens,
                   CAST(len(t.t) - COALESCE(reb.kept, 0) AS BIGINT)
                       AS n_tokens_removed
            FROM toks t LEFT JOIN reb USING (doc_id)
            ORDER BY t.doc_id
        """,
        "doc_dedup_rate": f"""
            WITH d AS ({_DUP_DOCS}),
            fp AS (SELECT doc_id, source, md5(text) AS fp FROM d),
            keep AS (SELECT fp, min(doc_id) AS keep_id FROM fp GROUP BY 1)
            SELECT source,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(CASE WHEN doc_id <> keep_id THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_removed,
                   ROUND(sum(CASE WHEN doc_id <> keep_id THEN 1 ELSE 0 END)
                         / CAST(count(*) AS DOUBLE), 6) AS dedup_rate
            FROM fp JOIN keep USING (fp)
            GROUP BY source ORDER BY source
        """,
        "doc_weighted_sample": """
            WITH s AS (
                SELECT doc_id, source,
                       pow((('0x' || substr(md5((doc_id)::VARCHAR), 1, 8))::BIGINT
                            / 4294967296.0),
                           1.0 / length(text)) AS score
                FROM documents WHERE length(text) > 0
            ),
            r AS (SELECT doc_id, source,
                         row_number() OVER (ORDER BY score DESC, doc_id) AS rk
                  FROM s)
            SELECT doc_id, source FROM r WHERE rk <= 100 ORDER BY doc_id
        """,
        "hier_avg_nbr_degree": f"""
            {HIER_UND}
            SELECT und.src AS id, CAST(count(*) AS BIGINT) AS degree,
                   ROUND(CAST(SUM(du.d) AS DOUBLE) / count(*), 6)
                       AS avg_nbr_degree
            FROM und JOIN deg du ON und.dst = du.src
            GROUP BY und.src
        """,
        "doc_temperature_sample": """
            WITH documents_skew AS (
                SELECT * FROM documents
                WHERE doc_id % 3 <> 0 OR source IN ('src0', 'src1')
            ),
            c AS (SELECT source, count(*) AS n FROM documents_skew GROUP BY 1),
            w AS (SELECT source, n, pow(n, 0.3) AS w FROM c),
            tw AS (SELECT sum(w) AS tw FROM w),
            nw AS (SELECT source, n, w / tw AS nw FROM w, tw),
            t AS (SELECT min(n / nw) AS big_t FROM nw WHERE n > 0),
            r AS (SELECT source, LEAST(1.0, nw * big_t / n) AS rate FROM nw, t)
            SELECT d.doc_id, d.source
            FROM documents_skew d JOIN r USING (source)
            WHERE (('0x' || substr(md5((d.doc_id)::VARCHAR), 1, 8))::BIGINT
                   / 4294967296.0) < r.rate
            ORDER BY d.doc_id
        """,
        "doc_bpe_inv": (
            "SELECT CAST(0 AS BIGINT) AS concat_violations,"
            " CAST(20 AS BIGINT) AS n_merges, true AS compressed"
        ),
        "ec_window_wcc": """
            WITH ch AS (
                SELECT user_id, event_id, ts,
                       lag(event_id) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) AS prev_id
                FROM events
            ),
            ed AS (
                SELECT user_id,
                       epoch(date_trunc('hour', ts))::BIGINT AS ws,
                       prev_id AS src, event_id AS dst
                FROM ch WHERE prev_id IS NOT NULL
            ),
            grp AS (
                SELECT user_id, ws, LEAST(MIN(src), MIN(dst)) AS comp
                FROM ed GROUP BY 1, 2
            ),
            verts AS (
                SELECT DISTINCT ws, user_id, id FROM (
                    SELECT ws, user_id, src AS id FROM ed
                    UNION ALL SELECT ws, user_id, dst FROM ed
                )
            )
            SELECT v.ws AS window_start, v.id, g.comp AS component
            FROM verts v JOIN grp g USING (user_id, ws)
        """,
        "ec_window_triangles": """
            WITH occ AS (
                SELECT DISTINCT epoch(date_trunc('hour', ts))::BIGINT AS ws,
                                user_id, event_type
                FROM events
            ),
            e AS (
                SELECT DISTINCT a.ws, a.user_id AS x, b.user_id AS y
                FROM occ a JOIN occ b
                  ON a.ws = b.ws AND a.event_type = b.event_type
                 AND a.user_id < b.user_id
            ),
            tri AS (
                SELECT e1.ws, e1.x, e1.y, e2.y AS z
                FROM e e1
                JOIN e e2 ON e1.ws = e2.ws AND e1.y = e2.x
                JOIN e e3 ON e3.ws = e1.ws AND e3.x = e1.x AND e3.y = e2.y
            ),
            pv AS (
                SELECT ws, id, count(*) AS cnt FROM (
                    SELECT ws, x AS id FROM tri
                    UNION ALL SELECT ws, y FROM tri
                    UNION ALL SELECT ws, z FROM tri
                ) GROUP BY ws, id
            ),
            tot AS (
                SELECT ws, CAST(-1 AS BIGINT) AS id, count(*) AS cnt
                FROM tri GROUP BY ws
            )
            SELECT ws AS window_start, id, CAST(cnt AS BIGINT) AS count
            FROM (SELECT * FROM pv UNION ALL SELECT * FROM tot)
        """,
        "emb_neighborhood_features": """
            WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
            s AS (SELECT a.vec_id AS src, b.vec_id AS dst,
                         list_dot_product(a.ev, b.ev)
                         / (sqrt(list_dot_product(a.ev, a.ev))
                            * sqrt(list_dot_product(b.ev, b.ev))) AS cos
                  FROM v a JOIN v b ON a.vec_id <> b.vec_id),
            r AS (SELECT *, row_number() OVER (PARTITION BY src
                                               ORDER BY cos DESC, dst) AS rank
                  FROM s),
            knn AS (SELECT src, dst FROM r WHERE rank <= 3),
            x AS (SELECT knn.src AS id, u.i - 1 AS pos, f.ev[u.i] AS v
                  FROM knn JOIN v f ON knn.dst = f.vec_id,
                       UNNEST(generate_series(1, len(f.ev))) u(i))
            SELECT id, CAST(pos AS INTEGER) AS pos,
                   ROUND(SUM(v) / COUNT(*), 6) AS val
            FROM x GROUP BY id, pos
            ORDER BY id, pos
        """,
        "doc_source_divergence": f"""
            WITH tok AS (
                SELECT source, unnest({TOKS}) AS t FROM documents
            ),
            sc AS (SELECT source, t, count(*) AS c FROM tok GROUP BY 1, 2),
            st AS (SELECT source, sum(c) AS n FROM sc GROUP BY 1),
            ct AS (SELECT t, sum(c) AS ctot FROM sc GROUP BY 1),
            tot AS (SELECT sum(c) AS N FROM sc)
            SELECT sc.source,
                   CAST(MAX(st.n) AS BIGINT) AS n_tokens,
                   CAST(COUNT(*) AS BIGINT) AS vocab_size,
                   ROUND(SUM((sc.c / CAST(st.n AS DOUBLE))
                             * LN((sc.c / CAST(st.n AS DOUBLE))
                                  / (ct.ctot / CAST(tot.N AS DOUBLE)))), 6) AS kl
            FROM sc JOIN st USING (source) JOIN ct USING (t), tot
            GROUP BY sc.source
            ORDER BY sc.source
        """,
        "hier_eigenvector": """
            WITH cnt AS (
                SELECT CAST(n_regionkey + 3000000 AS BIGINT) AS id,
                       CAST(COUNT(*) AS BIGINT) AS n
                FROM customer JOIN nation ON c_nationkey = n_nationkey
                GROUP BY 1
            ),
            verts AS (
                SELECT DISTINCT id FROM (
                    SELECT CAST(c_custkey AS BIGINT) AS id FROM customer
                    UNION ALL
                    SELECT CAST(n_nationkey + 2000000 AS BIGINT) FROM nation
                    UNION ALL
                    SELECT CAST(n_regionkey + 3000000 AS BIGINT) FROM nation
                )
            ),
            z AS (SELECT SQRT(SUM(n * n)) AS z FROM cnt)
            SELECT v.id, ROUND(COALESCE(cnt.n, 0) / z.z, 6) AS score
            FROM verts v LEFT JOIN cnt USING (id), z
        """,
        "doc_dup_spans": r"""
            WITH toks AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(trim(text), '\s+'),
                                   x -> x <> '') AS t
                FROM documents
            ),
            win AS (
                SELECT doc_id,
                       md5(array_to_string(list_slice(t, i, i + 7), ' ')) AS h
                FROM toks, UNNEST(generate_series(1, len(t) - 7)) AS s(i)
                WHERE len(t) >= 8
            ),
            cnt AS (SELECT h, count(*) AS c FROM win GROUP BY h),
            per AS (
                SELECT doc_id,
                       count(*) AS n_windows,
                       sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS n_dup_windows
                FROM win JOIN cnt USING (h)
                GROUP BY doc_id
            )
            SELECT d.doc_id,
                   CAST(COALESCE(per.n_windows, 0) AS BIGINT) AS n_windows,
                   CAST(COALESCE(per.n_dup_windows, 0) AS BIGINT)
                       AS n_dup_windows,
                   COALESCE(
                       ROUND(per.n_dup_windows / per.n_windows, 6), 0.0
                   ) AS dup_fraction
            FROM documents d
            LEFT JOIN per USING (doc_id)
            ORDER BY doc_id
        """,
        # LSH near-dup invariants: exact-cosine verify ⇒ zero false pairs;
        # candidate generator must surface at least one true pair
        "emb_near_dup_lsh_inv": """
            SELECT CAST(0 AS BIGINT) AS false_pairs, true AS found_pairs
        """,
        # k-core self-consistency: membership ⊆ vertices, degrees ≥ k and
        # equal to the induced-subgraph recount, 2-core non-empty
        "hier_kcore_inv": """
            SELECT CAST(0 AS BIGINT) AS subset_violations,
                   CAST(0 AS BIGINT) AS degree_violations,
                   true AS nonempty
        """,
        # semi-clustering invariants: clusters contain their vertex,
        # respect capacity, and each vertex keeps 1..max_clusters of them
        "hier_semiclusters_inv": """
            SELECT CAST(0 AS BIGINT) AS count_violations,
                   CAST(0 AS BIGINT) AS self_violations,
                   CAST(0 AS BIGINT) AS capacity_violations
        """,
        # one k-means iteration from pinned centers, closed-form: assign to
        # initial centers (embeddings 0..7), recompute means, re-assign
        "emb_kmeans_assign": """
            WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS vv FROM embeddings),
            c0 AS (SELECT CAST(vec_id AS INTEGER) AS c, embedding::DOUBLE[] AS cv
                   FROM embeddings WHERE vec_id < 8),
            d1 AS (SELECT v.id, c0.c,
                          list_sum(list_transform(range(1, 65),
                                   i -> (vv[i] - cv[i]) * (vv[i] - cv[i]))) AS dist
                   FROM v, c0),
            a1 AS (SELECT id, c FROM (SELECT id, c, row_number() OVER
                       (PARTITION BY id ORDER BY dist, c) AS rn FROM d1) WHERE rn = 1),
            upd AS (SELECT a1.c, t.i, SUM(vv[t.i]) / COUNT(*) AS x
                    FROM a1 JOIN v USING (id), range(1, 65) t(i) GROUP BY 1, 2),
            c1 AS (SELECT c, list(x ORDER BY i) AS cv FROM upd GROUP BY 1),
            cc AS (SELECT c0.c, coalesce(c1.cv, c0.cv) AS cv
                   FROM c0 LEFT JOIN c1 USING (c)),
            d2 AS (SELECT v.id, cc.c,
                          list_sum(list_transform(range(1, 65),
                                   i -> (vv[i] - cv[i]) * (vv[i] - cv[i]))) AS dist
                   FROM v, cc)
            SELECT id, CAST(c AS INTEGER) AS cluster
            FROM (SELECT id, c, row_number() OVER
                      (PARTITION BY id ORDER BY dist, c) AS rn FROM d2)
            WHERE rn = 1
        """,
        # full curation composition: quality gate (same banded score as
        # doc_quality) -> shingle-Jaccard pairs on SURVIVORS -> recursive
        # component resolution -> canonical keep set
        "pipeline_curate": f"""
            WITH RECURSIVE t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
            s AS (SELECT doc_id,
                CAST(len(toks) AS INTEGER) AS n_tokens,
                len(list_filter(toks, x -> list_contains({STOP_EN}, x))) AS n_stop,
                CASE WHEN len(toks) > 0
                     THEN CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks)
                     ELSE 0.0 END AS mtl
                FROM t),
            q AS (SELECT doc_id FROM s WHERE
                (CASE WHEN n_tokens > 0 AND CAST(n_stop AS DOUBLE)/n_tokens >= 0.01
                           AND CAST(n_stop AS DOUBLE)/n_tokens <= 0.5 THEN 0.4 ELSE 0.0 END
                 + CASE WHEN mtl >= 3.0 AND mtl <= 10.0 THEN 0.3 ELSE 0.0 END
                 + CASE WHEN n_tokens >= 10 AND n_tokens <= 100000 THEN 0.3 ELSE 0.0 END)
                >= 0.6),
            kt AS (SELECT t.doc_id, t.toks FROM t JOIN q USING (doc_id)),
            sh AS (SELECT DISTINCT doc_id,
                       unnest(CASE WHEN len(toks) >= 3
                              THEN list_transform(range(0, len(toks) - 2),
                                                  i -> array_to_string(toks[i+1:i+3], ' '))
                              ELSE CAST([] AS VARCHAR[]) END) AS shingle
                   FROM kt),
            sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
            inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
                      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                      GROUP BY 1, 2),
            prs AS (SELECT doc_a, doc_b FROM inter
                    JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
                    WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.05),
            und AS (SELECT doc_a AS s, doc_b AS d FROM prs
                    UNION SELECT doc_b, doc_a FROM prs),
            reach(id, r) AS (
                SELECT s, s FROM und
                UNION
                SELECT u.d, reach.r FROM reach JOIN und u ON u.s = reach.id
            ),
            keep AS (SELECT id, MIN(r) AS k FROM reach GROUP BY id)
            SELECT q.doc_id FROM q LEFT JOIN keep ON keep.id = q.doc_id
            WHERE coalesce(keep.k, q.doc_id) = q.doc_id
        """,
        # pipeline_curate with the domain blocklist gate: quality pass
        # minus blocked registered domains (label-boundary suffix match),
        # then the standard dedup chain over the survivors
        "pipeline_curate_domain": f"""
            WITH RECURSIVE {_DOMAIN_CTES},
            blk AS (SELECT doc_id FROM dom
                    WHERE host = 'shop.com' OR ends_with(host, '.shop.com')
                       OR host = 'news.co.uk' OR ends_with(host, '.news.co.uk')),
            t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
            s AS (SELECT doc_id,
                CAST(len(toks) AS INTEGER) AS n_tokens,
                len(list_filter(toks, x -> list_contains({STOP_EN}, x))) AS n_stop,
                CASE WHEN len(toks) > 0
                     THEN CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks)
                     ELSE 0.0 END AS mtl
                FROM t),
            q AS (SELECT doc_id FROM s WHERE
                (CASE WHEN n_tokens > 0 AND CAST(n_stop AS DOUBLE)/n_tokens >= 0.01
                           AND CAST(n_stop AS DOUBLE)/n_tokens <= 0.5 THEN 0.4 ELSE 0.0 END
                 + CASE WHEN mtl >= 3.0 AND mtl <= 10.0 THEN 0.3 ELSE 0.0 END
                 + CASE WHEN n_tokens >= 10 AND n_tokens <= 100000 THEN 0.3 ELSE 0.0 END)
                >= 0.6
                AND doc_id NOT IN (SELECT doc_id FROM blk)),
            kt AS (SELECT t.doc_id, t.toks FROM t JOIN q USING (doc_id)),
            sh AS (SELECT DISTINCT doc_id,
                       unnest(CASE WHEN len(toks) >= 3
                              THEN list_transform(range(0, len(toks) - 2),
                                                  i -> array_to_string(toks[i+1:i+3], ' '))
                              ELSE CAST([] AS VARCHAR[]) END) AS shingle
                   FROM kt),
            sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
            inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
                      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                      GROUP BY 1, 2),
            prs AS (SELECT doc_a, doc_b FROM inter
                    JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
                    WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.05),
            und AS (SELECT doc_a AS s, doc_b AS d FROM prs
                    UNION SELECT doc_b, doc_a FROM prs),
            reach(id, r) AS (
                SELECT s, s FROM und
                UNION
                SELECT u2.d, reach.r FROM reach JOIN und u2 ON u2.s = reach.id
            ),
            keep AS (SELECT id, MIN(r) AS k FROM reach GROUP BY id)
            SELECT q.doc_id FROM q LEFT JOIN keep ON keep.id = q.doc_id
            WHERE coalesce(keep.k, q.doc_id) = q.doc_id
        """,
        # pipeline_curate with URL-level dedup FIRST: the closed-form
        # canonical key (messy fixture arithmetic) picks min-doc_id
        # survivors, then the same quality -> pairs -> resolution chain
        # runs on the survivor subset only
        "pipeline_curate_url": f"""
            WITH RECURSIVE {_MESSY_URL_CTES},
            uw AS (SELECT doc_id FROM
                     (SELECT doc_id,
                             canon = '' OR
                             doc_id = min(doc_id) OVER (PARTITION BY canon) AS k
                      FROM u) WHERE k),
            t AS (SELECT doc_id, {TOKS} AS toks
                  FROM documents JOIN uw USING (doc_id)),
            s AS (SELECT doc_id,
                CAST(len(toks) AS INTEGER) AS n_tokens,
                len(list_filter(toks, x -> list_contains({STOP_EN}, x))) AS n_stop,
                CASE WHEN len(toks) > 0
                     THEN CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks)
                     ELSE 0.0 END AS mtl
                FROM t),
            q AS (SELECT doc_id FROM s WHERE
                (CASE WHEN n_tokens > 0 AND CAST(n_stop AS DOUBLE)/n_tokens >= 0.01
                           AND CAST(n_stop AS DOUBLE)/n_tokens <= 0.5 THEN 0.4 ELSE 0.0 END
                 + CASE WHEN mtl >= 3.0 AND mtl <= 10.0 THEN 0.3 ELSE 0.0 END
                 + CASE WHEN n_tokens >= 10 AND n_tokens <= 100000 THEN 0.3 ELSE 0.0 END)
                >= 0.6),
            kt AS (SELECT t.doc_id, t.toks FROM t JOIN q USING (doc_id)),
            sh AS (SELECT DISTINCT doc_id,
                       unnest(CASE WHEN len(toks) >= 3
                              THEN list_transform(range(0, len(toks) - 2),
                                                  i -> array_to_string(toks[i+1:i+3], ' '))
                              ELSE CAST([] AS VARCHAR[]) END) AS shingle
                   FROM kt),
            sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
            inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
                      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                      GROUP BY 1, 2),
            prs AS (SELECT doc_a, doc_b FROM inter
                    JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
                    WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.05),
            und AS (SELECT doc_a AS s, doc_b AS d FROM prs
                    UNION SELECT doc_b, doc_a FROM prs),
            reach(id, r) AS (
                SELECT s, s FROM und
                UNION
                SELECT u2.d, reach.r FROM reach JOIN und u2 ON u2.s = reach.id
            ),
            keep AS (SELECT id, MIN(r) AS k FROM reach GROUP BY id)
            SELECT q.doc_id FROM q LEFT JOIN keep ON keep.id = q.doc_id
            WHERE coalesce(keep.k, q.doc_id) = q.doc_id
        """,
        # pipeline_curate plus the ExactSubstr span gate between quality
        # and dedup: duplicated 8-token window fraction measured WITHIN
        # the quality-surviving subset must stay <= 0.1
        "pipeline_curate_spans": rf"""
            WITH RECURSIVE t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
            s AS (SELECT doc_id,
                CAST(len(toks) AS INTEGER) AS n_tokens,
                len(list_filter(toks, x -> list_contains({STOP_EN}, x))) AS n_stop,
                CASE WHEN len(toks) > 0
                     THEN CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks)
                     ELSE 0.0 END AS mtl
                FROM t),
            q AS (SELECT doc_id FROM s WHERE
                (CASE WHEN n_tokens > 0 AND CAST(n_stop AS DOUBLE)/n_tokens >= 0.01
                           AND CAST(n_stop AS DOUBLE)/n_tokens <= 0.5 THEN 0.4 ELSE 0.0 END
                 + CASE WHEN mtl >= 3.0 AND mtl <= 10.0 THEN 0.3 ELSE 0.0 END
                 + CASE WHEN n_tokens >= 10 AND n_tokens <= 100000 THEN 0.3 ELSE 0.0 END)
                >= 0.6),
            spanw AS (
                SELECT d.doc_id,
                       list_filter(regexp_split_to_array(trim(d.text), '\s+'),
                                   x -> x <> '') AS st
                FROM documents d JOIN q USING (doc_id)
            ),
            win AS (
                SELECT doc_id,
                       md5(array_to_string(list_slice(st, i, i + 7), ' ')) AS h
                FROM spanw, UNNEST(generate_series(1, len(st) - 7)) AS u(i)
                WHERE len(st) >= 8
            ),
            wcnt AS (SELECT h, count(*) AS c FROM win GROUP BY h),
            per AS (
                SELECT doc_id, count(*) AS nw,
                       sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS nd
                FROM win JOIN wcnt USING (h) GROUP BY doc_id
            ),
            q2 AS (
                SELECT q.doc_id FROM q LEFT JOIN per USING (doc_id)
                WHERE COALESCE(ROUND(per.nd / per.nw, 6), 0.0) <= 0.1
            ),
            kt AS (SELECT t.doc_id, t.toks FROM t JOIN q2 USING (doc_id)),
            sh AS (SELECT DISTINCT doc_id,
                       unnest(CASE WHEN len(toks) >= 3
                              THEN list_transform(range(0, len(toks) - 2),
                                                  i -> array_to_string(toks[i+1:i+3], ' '))
                              ELSE CAST([] AS VARCHAR[]) END) AS shingle
                   FROM kt),
            sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
            inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
                      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                      GROUP BY 1, 2),
            prs AS (SELECT doc_a, doc_b FROM inter
                    JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
                    WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.05),
            und AS (SELECT doc_a AS s, doc_b AS d FROM prs
                    UNION SELECT doc_b, doc_a FROM prs),
            reach(id, r) AS (
                SELECT s, s FROM und
                UNION
                SELECT u.d, reach.r FROM reach JOIN und u ON u.s = reach.id
            ),
            keep AS (SELECT id, MIN(r) AS k FROM reach GROUP BY id)
            SELECT q2.doc_id FROM q2 LEFT JOIN keep ON keep.id = q2.doc_id
            WHERE coalesce(keep.k, q2.doc_id) = q2.doc_id
        """,
        # pipeline_curate plus the repetition gate between quality and
        # dedup: drop docs whose duplicate-trigram mass exceeds 0.02
        "pipeline_curate_gated": f"""
            WITH RECURSIVE t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
            s AS (SELECT doc_id,
                CAST(len(toks) AS INTEGER) AS n_tokens,
                len(list_filter(toks, x -> list_contains({STOP_EN}, x))) AS n_stop,
                CASE WHEN len(toks) > 0
                     THEN CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks)
                     ELSE 0.0 END AS mtl
                FROM t),
            q AS (SELECT doc_id FROM s WHERE
                (CASE WHEN n_tokens > 0 AND CAST(n_stop AS DOUBLE)/n_tokens >= 0.01
                           AND CAST(n_stop AS DOUBLE)/n_tokens <= 0.5 THEN 0.4 ELSE 0.0 END
                 + CASE WHEN mtl >= 3.0 AND mtl <= 10.0 THEN 0.3 ELSE 0.0 END
                 + CASE WHEN n_tokens >= 10 AND n_tokens <= 100000 THEN 0.3 ELSE 0.0 END)
                >= 0.6),
            tg AS (SELECT doc_id,
                       CASE WHEN len(toks) >= 3
                            THEN list_transform(range(0, len(toks) - 2),
                                                i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])
                            ELSE CAST([] AS VARCHAR[]) END AS g
                   FROM t JOIN q USING (doc_id)),
            q2 AS (SELECT doc_id FROM tg WHERE
                       (CASE WHEN len(g) > 0
                             THEN 1.0 - CAST(len(list_distinct(g)) AS DOUBLE) / len(g)
                             ELSE 0.0 END) <= 0.02),
            kt AS (SELECT t.doc_id, t.toks FROM t JOIN q2 USING (doc_id)),
            sh AS (SELECT DISTINCT doc_id,
                       unnest(CASE WHEN len(toks) >= 3
                              THEN list_transform(range(0, len(toks) - 2),
                                                  i -> array_to_string(toks[i+1:i+3], ' '))
                              ELSE CAST([] AS VARCHAR[]) END) AS shingle
                   FROM kt),
            sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
            inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
                      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                      GROUP BY 1, 2),
            prs AS (SELECT doc_a, doc_b FROM inter
                    JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
                    WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.05),
            und AS (SELECT doc_a AS s, doc_b AS d FROM prs
                    UNION SELECT doc_b, doc_a FROM prs),
            reach(id, r) AS (
                SELECT s, s FROM und
                UNION
                SELECT u.d, reach.r FROM reach JOIN und u ON u.s = reach.id
            ),
            keep AS (SELECT id, MIN(r) AS k FROM reach GROUP BY id)
            SELECT q2.doc_id FROM q2 LEFT JOIN keep ON keep.id = q2.doc_id
            WHERE coalesce(keep.k, q2.doc_id) = q2.doc_id
        """,
        # curation with the decontamination gate: quality (train split) →
        # drop docs with > 0.5 of their shingles in the benchmark split →
        # transitive dup resolution over the survivors
        "pipeline_curate_decontam": f"""
            WITH RECURSIVE t AS (SELECT doc_id, {TOKS} AS toks FROM documents
                                 WHERE doc_id >= 50),
            s AS (SELECT doc_id,
                CAST(len(toks) AS INTEGER) AS n_tokens,
                len(list_filter(toks, x -> list_contains({STOP_EN}, x))) AS n_stop,
                CASE WHEN len(toks) > 0
                     THEN CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks)
                     ELSE 0.0 END AS mtl
                FROM t),
            q AS (SELECT doc_id FROM s WHERE
                (CASE WHEN n_tokens > 0 AND CAST(n_stop AS DOUBLE)/n_tokens >= 0.01
                           AND CAST(n_stop AS DOUBLE)/n_tokens <= 0.5 THEN 0.4 ELSE 0.0 END
                 + CASE WHEN mtl >= 3.0 AND mtl <= 10.0 THEN 0.3 ELSE 0.0 END
                 + CASE WHEN n_tokens >= 10 AND n_tokens <= 100000 THEN 0.3 ELSE 0.0 END)
                >= 0.6),
            kt AS (SELECT t.doc_id, t.toks FROM t JOIN q USING (doc_id)),
            sh AS (SELECT DISTINCT doc_id,
                       unnest(CASE WHEN len(toks) >= 3
                              THEN list_transform(range(0, len(toks) - 2),
                                                  i -> array_to_string(toks[i+1:i+3], ' '))
                              ELSE CAST([] AS VARCHAR[]) END) AS shingle
                   FROM kt),
            bt AS (SELECT doc_id, {TOKS} AS toks FROM documents WHERE doc_id < 50),
            bm AS (SELECT DISTINCT
                       unnest(CASE WHEN len(toks) >= 3
                              THEN list_transform(range(0, len(toks) - 2),
                                                  i -> array_to_string(toks[i+1:i+3], ' '))
                              ELSE CAST([] AS VARCHAR[]) END) AS shingle
                   FROM bt),
            dirty AS (SELECT doc_id FROM sh
                      GROUP BY doc_id
                      HAVING CAST(count(*) FILTER (shingle IN (SELECT shingle FROM bm))
                                  AS DOUBLE) / count(*) > 0.5),
            clean AS (SELECT doc_id FROM q
                      WHERE doc_id NOT IN (SELECT doc_id FROM dirty)),
            sh2 AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN clean USING (doc_id)),
            sz AS (SELECT doc_id, count(*) AS sz FROM sh2 GROUP BY 1),
            inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
                      FROM sh2 a JOIN sh2 b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                      GROUP BY 1, 2),
            prs AS (SELECT doc_a, doc_b FROM inter
                    JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
                    WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.05),
            und AS (SELECT doc_a AS s, doc_b AS d FROM prs
                    UNION SELECT doc_b, doc_a FROM prs),
            reach(id, r) AS (
                SELECT s, s FROM und
                UNION
                SELECT u.d, reach.r FROM reach JOIN und u ON u.s = reach.id
            ),
            keep AS (SELECT id, MIN(r) AS k FROM reach GROUP BY id)
            SELECT clean.doc_id FROM clean LEFT JOIN keep ON keep.id = clean.doc_id
            WHERE coalesce(keep.k, clean.doc_id) = clean.doc_id
        """,
        # per-language corpus stats over the lang-ID + quality operators
        "doc_language_stats": f"""
            WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
            st AS (SELECT doc_id,
                len(list_filter(toks, x -> list_contains({STOP_DE}, x))) AS s_de,
                len(list_filter(toks, x -> list_contains({STOP_EN}, x))) AS s_en,
                len(list_filter(toks, x -> list_contains({STOP_ES}, x))) AS s_es,
                len(list_filter(toks, x -> list_contains({STOP_FR}, x))) AS s_fr
                FROM t),
            lng AS (SELECT doc_id,
                CASE WHEN s_de + s_en + s_es + s_fr = 0 THEN 'und'
                     WHEN s_fr >= s_es AND s_fr >= s_en AND s_fr >= s_de THEN 'fr'
                     WHEN s_es >= s_en AND s_es >= s_de THEN 'es'
                     WHEN s_en >= s_de THEN 'en'
                     ELSE 'de' END AS lang_pred
                FROM st),
            s AS (SELECT doc_id,
                CAST(len(toks) AS INTEGER) AS n_tokens,
                len(list_filter(toks, x -> list_contains({STOP_EN}, x))) AS n_stop,
                CASE WHEN len(toks) > 0
                     THEN CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks)
                     ELSE 0.0 END AS mtl
                FROM t),
            sc AS (SELECT doc_id,
                (CASE WHEN n_tokens > 0 AND CAST(n_stop AS DOUBLE)/n_tokens >= 0.01
                           AND CAST(n_stop AS DOUBLE)/n_tokens <= 0.5 THEN 0.4 ELSE 0.0 END
                 + CASE WHEN mtl >= 3.0 AND mtl <= 10.0 THEN 0.3 ELSE 0.0 END
                 + CASE WHEN n_tokens >= 10 AND n_tokens <= 100000 THEN 0.3 ELSE 0.0 END)
                AS score FROM s)
            SELECT lng.lang_pred, count(*) AS n_docs, round(AVG(sc.score), 6) AS avg_score
            FROM lng JOIN sc USING (doc_id) GROUP BY 1
        """,
        # transitive closure of the candidate-pair graph by recursive
        # reachability; component label = min reachable id (dup clusters
        # are tiny, so the reach set is small even though it is quadratic
        # per cluster)
        "dedup_resolve": f"""
            WITH RECURSIVE sh AS ({SHINGLES}),
            sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
            inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
                      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                      GROUP BY 1, 2),
            prs AS (SELECT doc_a, doc_b FROM inter
                    JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
                    WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.05),
            und AS (SELECT doc_a AS s, doc_b AS d FROM prs
                    UNION SELECT doc_b, doc_a FROM prs),
            reach(id, r) AS (
                SELECT s, s FROM und
                UNION
                SELECT u.d, reach.r FROM reach JOIN und u ON u.s = reach.id
            ),
            keep AS (SELECT id, MIN(r) AS k FROM reach GROUP BY id)
            SELECT d.doc_id, coalesce(keep.k, d.doc_id) AS keep_id
            FROM documents d LEFT JOIN keep ON keep.id = d.doc_id
        """,
        "hier_rich_club": f"""
            {HIER_UND},
            ce AS (SELECT src AS a, dst AS b FROM und WHERE src < dst),
            em AS (SELECT least(da.d, db.d) AS md
                   FROM ce JOIN deg da ON ce.a = da.src
                           JOIN deg db ON ce.b = db.src),
            dh AS (SELECT d, count(*) AS n FROM deg GROUP BY 1),
            eh AS (SELECT md, count(*) AS e FROM em GROUP BY 1),
            ks AS (SELECT DISTINCT d AS k FROM deg),
            nk AS (SELECT k, CAST(SUM(n) AS BIGINT) AS n_nodes
                   FROM ks JOIN dh ON dh.d > ks.k GROUP BY 1),
            ek AS (SELECT k, CAST(SUM(e) AS BIGINT) AS n_edges
                   FROM ks JOIN eh ON eh.md > ks.k GROUP BY 1)
            SELECT nk.k, nk.n_nodes, COALESCE(ek.n_edges, 0) AS n_edges,
                   round(2.0 * COALESCE(ek.n_edges, 0)
                         / (nk.n_nodes * (nk.n_nodes - 1)), 6) AS phi
            FROM nk LEFT JOIN ek ON nk.k = ek.k
            WHERE nk.n_nodes >= 2
        """,
        "hier_conductance": f"""
            {HIER_UND},
            ce AS (SELECT src AS a, dst AS b FROM und WHERE src < dst),
            led AS (SELECT a % 4 AS ca, b % 4 AS cb FROM ce),
            mm AS (SELECT 2 * count(*) AS vol2 FROM led),
            vol AS (SELECT label, CAST(count(*) AS BIGINT) AS volume FROM
                      (SELECT ca AS label FROM led
                       UNION ALL SELECT cb FROM led)
                    GROUP BY 1),
            cut AS (SELECT label, CAST(count(*) AS BIGINT) AS cut_edges FROM
                      (SELECT ca AS label FROM led WHERE ca <> cb
                       UNION ALL SELECT cb FROM led WHERE ca <> cb)
                    GROUP BY 1)
            SELECT vol.label, COALESCE(cut.cut_edges, 0) AS cut_edges,
                   vol.volume,
                   CASE WHEN least(vol.volume, mm.vol2 - vol.volume) > 0
                        THEN round(COALESCE(cut.cut_edges, 0)::DOUBLE
                                   / least(vol.volume, mm.vol2 - vol.volume), 6)
                        ELSE 0.0 END AS conductance
            FROM vol LEFT JOIN cut ON vol.label = cut.label CROSS JOIN mm
        """,
        "ec_temporal_arrival": """
            WITH RECURSIVE pos AS (
                SELECT event_id, user_id, epoch_us(ts) AS tu,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS rn
                FROM events
            ),
            ed AS (SELECT p.event_id AS src, q.event_id AS dst, q.tu AS t
                   FROM pos p JOIN pos q
                   ON p.user_id = q.user_id AND q.rn = p.rn + 1),
            sym AS (SELECT src, dst, t FROM ed
                    UNION ALL
                    SELECT dst, src, t FROM ed),
            reach(id, t) AS (
                SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT)
                UNION
                SELECT s.dst, s.t
                FROM reach JOIN sym s
                ON s.src = reach.id AND s.t >= reach.t
            ),
            arr AS (SELECT id, MIN(t) AS a FROM reach GROUP BY 1)
            SELECT e.event_id AS id,
                   COALESCE(arr.a, 9223372036854775807) AS value
            FROM events e LEFT JOIN arr ON e.event_id = arr.id
        """,
        "ec_range_join": """
            WITH es AS (SELECT event_id,
                               CAST(floor(epoch(ts)) AS BIGINT) AS s
                        FROM events),
            iv AS (SELECT e.event_id AS incident_id, es.s AS w0
                   FROM events e JOIN es ON e.event_id = es.event_id
                   WHERE e.event_type = 'error')
            SELECT iv.incident_id, CAST(count(*) AS BIGINT) AS n_events
            FROM iv JOIN es ON es.s BETWEEN iv.w0 AND iv.w0 + 600
            GROUP BY 1
        """,
        "ec_asof_attribution": """
            WITH p AS (SELECT event_id, user_id, ts FROM events
                       WHERE event_type = 'purchase'),
            c AS (SELECT user_id, ts, MAX(event_id) AS click_id
                  FROM events WHERE event_type = 'click' GROUP BY 1, 2)
            SELECT p.event_id, p.user_id, c.click_id
            FROM p ASOF LEFT JOIN c
            ON p.user_id = c.user_id AND p.ts >= c.ts
        """,
        "ec_funnel": """
            WITH s1 AS (SELECT user_id, MIN(ts) AS t FROM events
                        WHERE event_type = 'signup' GROUP BY 1),
            s2 AS (SELECT e.user_id, MIN(e.ts) AS t
                   FROM events e JOIN s1 ON e.user_id = s1.user_id
                   WHERE e.event_type = 'view' AND e.ts >= s1.t
                   GROUP BY 1),
            s3 AS (SELECT e.user_id, MIN(e.ts) AS t
                   FROM events e JOIN s2 ON e.user_id = s2.user_id
                   WHERE e.event_type = 'purchase' AND e.ts >= s2.t
                   GROUP BY 1)
            SELECT CAST(1 AS BIGINT) AS step, 'signup' AS event_type,
                   CAST(count(*) AS BIGINT) AS n_users FROM s1
            UNION ALL
            SELECT 2, 'view', CAST(count(*) AS BIGINT) FROM s2
            UNION ALL
            SELECT 3, 'purchase', CAST(count(*) AS BIGINT) FROM s3
        """,
        "ec_retention": """
            WITH es AS (SELECT user_id,
                               CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS w
                        FROM events),
            first AS (SELECT user_id, MIN(w) AS cw FROM es GROUP BY 1),
            act AS (SELECT DISTINCT es.user_id, first.cw, es.w
                    FROM es JOIN first ON es.user_id = first.user_id)
            SELECT cw AS cohort, w - cw AS period,
                   CAST(count(*) AS BIGINT) AS n_users
            FROM act GROUP BY 1, 2
        """,
        "ec_interval_join": """
            WITH e AS (SELECT event_id, event_type,
                              CAST(floor(epoch(ts)) AS BIGINT) AS s
                       FROM events),
            er AS (SELECT event_id AS error_id, s AS es, s + 600 AS ee
                   FROM e WHERE event_type = 'error'),
            vw AS (SELECT event_id AS view_id, s AS vs, s + 300 AS ve
                   FROM e WHERE event_type = 'view')
            SELECT error_id, view_id
            FROM er JOIN vw ON er.es <= vw.ve AND vw.vs <= er.ee
        """,
        "ec_transitions": """
            WITH nxt AS (
                SELECT event_type AS prev_type,
                       lead(event_type) OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id) AS next_type
                FROM events
            ),
            agg AS (SELECT prev_type, next_type, count(*) AS n
                    FROM nxt WHERE next_type IS NOT NULL GROUP BY 1, 2)
            SELECT prev_type, next_type, CAST(n AS BIGINT) AS n,
                   CAST(n AS DOUBLE) /
                       CAST(sum(n) OVER (PARTITION BY prev_type) AS DOUBLE) AS p
            FROM agg
        """,
        "ec_session_funnel": """
            WITH s AS (
              SELECT user_id, event_type, epoch_us(ts) AS us,
                     CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                            (PARTITION BY user_id ORDER BY ts, event_id)
                          > 43200000000 THEN 1 ELSE 0 END AS brk,
                     ts, event_id
              FROM events),
            s2 AS (SELECT user_id, event_type, us,
                          SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                            AS session
                   FROM s),
            f1 AS (SELECT user_id, session, MIN(us) AS t FROM s2
                   WHERE event_type = 'signup' GROUP BY 1, 2),
            f2 AS (SELECT e.user_id, e.session, MIN(e.us) AS t
                   FROM s2 e JOIN f1 ON e.user_id = f1.user_id
                                    AND e.session = f1.session
                   WHERE e.event_type = 'view' AND e.us >= f1.t
                   GROUP BY 1, 2),
            f3 AS (SELECT e.user_id, e.session, MIN(e.us) AS t
                   FROM s2 e JOIN f2 ON e.user_id = f2.user_id
                                    AND e.session = f2.session
                   WHERE e.event_type = 'purchase' AND e.us >= f2.t
                   GROUP BY 1, 2)
            SELECT CAST(1 AS BIGINT) AS step, 'signup' AS event_type,
                   CAST(count(*) AS BIGINT) AS n_sessions FROM f1
            UNION ALL
            SELECT 2, 'view', CAST(count(*) AS BIGINT) FROM f2
            UNION ALL
            SELECT 3, 'purchase', CAST(count(*) AS BIGINT) FROM f3
        """,
        "ec_path_ngrams": """
            WITH seq AS (
                SELECT event_type AS t0,
                       lead(event_type, 1) OVER (PARTITION BY user_id
                                                 ORDER BY ts, event_id) AS t1,
                       lead(event_type, 2) OVER (PARTITION BY user_id
                                                 ORDER BY ts, event_id) AS t2
                FROM events
            ),
            agg AS (SELECT t0 || ' > ' || t1 || ' > ' || t2 AS path,
                           CAST(count(*) AS BIGINT) AS n_occurrences
                    FROM seq WHERE t2 IS NOT NULL GROUP BY 1),
            rk AS (SELECT path, n_occurrences,
                          CAST(row_number() OVER (ORDER BY n_occurrences DESC, path)
                               AS BIGINT) AS rank
                   FROM agg)
            SELECT path, n_occurrences, rank FROM rk WHERE rank <= 20
        """,
        # document-level Gopher rules: every ratio is a division of exact
        # ints (same FP discipline as doc_quality); '…' spelled chr(8230)
        # so the oracle file stays ASCII-safe
        "doc_gopher_filter": f"""
            WITH t AS (SELECT doc_id, text, {TOKS} AS toks FROM documents),
            s AS (SELECT doc_id, toks,
                len(toks) AS n,
                CASE WHEN len(toks) > 0
                     THEN CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks)
                     ELSE 0.0 END AS mean_len,
                length(text) - length(replace(text, '#', '')) AS n_hash,
                (length(text) - length(replace(text, '...', ''))) / 3
                    + length(text) - length(replace(text, chr(8230), '')) AS n_ell,
                len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS n_alpha,
                len(list_intersect(list_distinct(toks), {STOP_EN})) AS n_stop,
                CASE WHEN len(toks) >= 2
                     THEN list_transform(range(0, len(toks) - 1),
                                         i -> toks[i+1] || ' ' || toks[i+2])
                     ELSE CAST([] AS VARCHAR[]) END AS bg,
                CASE WHEN len(toks) >= 3
                     THEN list_transform(range(0, len(toks) - 2),
                                         i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])
                     ELSE CAST([] AS VARCHAR[]) END AS tg
                FROM t),
            fl AS (SELECT doc_id,
                CAST(n AS INTEGER) AS n_tokens,
                (n >= 50 AND n <= 100000) AS flag_word_count,
                (mean_len >= 4.2 AND mean_len <= 4.8) AS flag_word_length,
                CASE WHEN n > 0 THEN (n_hash + n_ell) / CAST(n AS DOUBLE) <= 0.1
                     ELSE FALSE END AS flag_symbol_ratio,
                CASE WHEN n > 0 THEN CAST(n_alpha AS DOUBLE) / n >= 0.8
                     ELSE FALSE END AS flag_alpha_ratio,
                (n_stop >= 2) AS flag_stopwords,
                ((CASE WHEN len(bg) > 0
                       THEN 1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg)
                       ELSE 0.0 END) <= 0.08
                 AND
                 (CASE WHEN len(tg) > 0
                       THEN 1.0 - CAST(len(list_distinct(tg)) AS DOUBLE) / len(tg)
                       ELSE 0.0 END) <= 0.18) AS flag_repetition
                FROM s)
            SELECT doc_id, n_tokens, flag_word_count, flag_word_length,
                   flag_symbol_ratio, flag_alpha_ratio, flag_stopwords,
                   flag_repetition,
                   (flag_word_count AND flag_word_length AND flag_symbol_ratio
                    AND flag_alpha_ratio AND flag_stopwords AND flag_repetition) AS keep
            FROM fl
        """,
        # CCNet bucketing rides the doc_bigram_logprob model verbatim;
        # surprisal rounded 6 dp before ranking, doc_id tie-break, NULLs
        # (docs with < 2 tokens) last — deterministic ntile on both sides
        "doc_ppl_buckets": f"""
            WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
            bg AS (
                SELECT doc_id, unnest(list_zip(toks[1:-2], toks[2:-1])) AS p
                FROM t WHERE len(toks) >= 2
            ),
            b AS (SELECT doc_id, p[1] AS w1, p[2] AS w2 FROM bg),
            c2 AS (SELECT w1, w2, count(*) AS c2 FROM b GROUP BY 1, 2),
            c1 AS (SELECT w1, sum(c2) AS c1 FROM c2 GROUP BY 1),
            v AS (SELECT count(DISTINCT tok) AS v FROM
                  (SELECT unnest(toks) AS tok FROM t)),
            model AS (
                SELECT c2.w1, c2.w2,
                       -ln((c2.c2 + 1.0) / (c1.c1 + 1.0 * v.v)) AS nlp
                FROM c2 JOIN c1 ON c2.w1 = c1.w1, v
            ),
            per_doc AS (
                SELECT b.doc_id, avg(m.nlp) AS nlp
                FROM b JOIN model m ON b.w1 = m.w1 AND b.w2 = m.w2
                GROUP BY 1
            ),
            scored AS (
                SELECT d.doc_id, d.source, round(p.nlp, 6) AS surprisal
                FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
            ),
            rk AS (
                SELECT doc_id, source, surprisal,
                       CAST(ntile(3) OVER (PARTITION BY source
                            ORDER BY surprisal ASC NULLS LAST, doc_id) AS BIGINT) AS bucket
                FROM scored
            )
            SELECT doc_id, source, surprisal, bucket,
                   CASE WHEN bucket = 1 THEN 'head'
                        WHEN bucket = 3 THEN 'tail'
                        ELSE 'middle' END AS band
            FROM rk
        """,
        # DSIR (Xie et al. 2023): hashed unigram+bigram buckets via the
        # shared md5-prefix hash, add-0.5-smoothed log-ratio model over
        # 8192 buckets (0.5·8192 = 4096 in the denominators), per-doc
        # sum rounded 6 dp
        "doc_dsir_weights": f"""
            WITH t AS (SELECT doc_id, lang = 'en' AS tgt, {TOKS} AS toks
                       FROM documents),
            uni AS (SELECT doc_id, tgt, unnest(toks) AS f FROM t),
            bi AS (SELECT doc_id, tgt,
                          unnest(CASE WHEN len(toks) >= 2
                               THEN list_transform(range(0, len(toks) - 1),
                                                   i -> toks[i+1] || ' ' || toks[i+2])
                               ELSE CAST([] AS VARCHAR[]) END) AS f
                   FROM t),
            feats AS (SELECT doc_id, tgt,
                             ('0x' || substr(md5(f), 1, 8))::BIGINT % 8192 AS bucket
                      FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)),
            df AS (SELECT doc_id, tgt, bucket, count(*) AS cnt
                   FROM feats GROUP BY 1, 2, 3),
            pb AS (SELECT bucket,
                          CAST(sum(cnt) AS BIGINT) AS c_raw,
                          CAST(sum(CASE WHEN tgt THEN cnt ELSE 0 END) AS BIGINT) AS c_tgt
                   FROM df GROUP BY 1),
            tot AS (SELECT CAST(sum(c_raw) AS BIGINT) AS cr,
                           CAST(sum(c_tgt) AS BIGINT) AS ct FROM pb),
            model AS (SELECT bucket,
                             ln((c_tgt + 0.5) / (ct + 4096.0))
                             - ln((c_raw + 0.5) / (cr + 4096.0)) AS lr
                      FROM pb, tot),
            sc AS (SELECT df.doc_id,
                          CAST(sum(cnt) AS BIGINT) AS n_feats,
                          round(sum(cnt * lr), 6) AS weight
                   FROM df JOIN model ON df.bucket = model.bucket
                   GROUP BY 1)
            SELECT d.doc_id,
                   COALESCE(sc.n_feats, 0) AS n_feats,
                   COALESCE(sc.weight, 0.0) AS weight
            FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
        """,
        "doc_token_budget": f"""
            WITH t AS (SELECT doc_id, source,
                              CAST(len({TOKS}) AS BIGINT) AS n_tokens
                       FROM documents),
            o AS (SELECT doc_id, source, n_tokens,
                         ('0x' || substr(md5(doc_id::VARCHAR || 'budget'), 1, 8))::BIGINT
                             / 4294967296.0 AS frac
                  FROM t),
            p AS (SELECT doc_id, source, n_tokens,
                         COALESCE(SUM(n_tokens) OVER (
                             PARTITION BY source ORDER BY frac, doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                         ), 0) AS prefix
                  FROM o)
            SELECT doc_id, source, n_tokens FROM p WHERE prefix < 600
        """,
        # DSIR, external-target flavor: raw counts over the whole corpus,
        # target counts over the src1 frame only; scoring joins on the
        # raw-present buckets (left), totals aggregate each side pre-join
        "doc_dsir_external": f"""
            WITH t AS (SELECT doc_id, source, {TOKS} AS toks FROM documents),
            uni AS (SELECT doc_id, source, unnest(toks) AS f FROM t),
            bi AS (SELECT doc_id, source,
                          unnest(CASE WHEN len(toks) >= 2
                               THEN list_transform(range(0, len(toks) - 1),
                                                   i -> toks[i+1] || ' ' || toks[i+2])
                               ELSE CAST([] AS VARCHAR[]) END) AS f
                   FROM t),
            feats AS (SELECT doc_id, source,
                             ('0x' || substr(md5(f), 1, 8))::BIGINT % 8192 AS bucket
                      FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)),
            df AS (SELECT doc_id, source, bucket, count(*) AS cnt
                   FROM feats GROUP BY 1, 2, 3),
            rb AS (SELECT bucket, CAST(sum(cnt) AS BIGINT) AS c_raw
                   FROM df GROUP BY 1),
            tb AS (SELECT bucket, CAST(sum(cnt) AS BIGINT) AS c_tgt
                   FROM df WHERE source = 'src1' GROUP BY 1),
            tot AS (SELECT (SELECT CAST(sum(c_raw) AS BIGINT) FROM rb) AS cr,
                           (SELECT CAST(sum(c_tgt) AS BIGINT) FROM tb) AS ct),
            model AS (SELECT rb.bucket,
                             ln((COALESCE(tb.c_tgt, 0) + 0.5) / (ct + 4096.0))
                             - ln((rb.c_raw + 0.5) / (cr + 4096.0)) AS lr
                      FROM rb LEFT JOIN tb ON rb.bucket = tb.bucket, tot),
            sc AS (SELECT df.doc_id,
                          CAST(sum(cnt) AS BIGINT) AS n_feats,
                          round(sum(cnt * lr), 6) AS weight
                   FROM df JOIN model ON df.bucket = model.bucket
                   GROUP BY 1)
            SELECT d.doc_id,
                   COALESCE(sc.n_feats, 0) AS n_feats,
                   COALESCE(sc.weight, 0.0) AS weight
            FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
        """,
        # Gumbel-top-n resampling over the same weights: the Gumbel draw
        # replays as -ln(-ln((md5 + 0.5)/2^32)) — strictly inside (0,1)
        # so both ln calls stay finite on both engines
        "doc_dsir_select": f"""
            WITH t AS (SELECT doc_id, lang = 'en' AS tgt, {TOKS} AS toks
                       FROM documents),
            uni AS (SELECT doc_id, tgt, unnest(toks) AS f FROM t),
            bi AS (SELECT doc_id, tgt,
                          unnest(CASE WHEN len(toks) >= 2
                               THEN list_transform(range(0, len(toks) - 1),
                                                   i -> toks[i+1] || ' ' || toks[i+2])
                               ELSE CAST([] AS VARCHAR[]) END) AS f
                   FROM t),
            feats AS (SELECT doc_id, tgt,
                             ('0x' || substr(md5(f), 1, 8))::BIGINT % 8192 AS bucket
                      FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)),
            df AS (SELECT doc_id, tgt, bucket, count(*) AS cnt
                   FROM feats GROUP BY 1, 2, 3),
            pb AS (SELECT bucket,
                          CAST(sum(cnt) AS BIGINT) AS c_raw,
                          CAST(sum(CASE WHEN tgt THEN cnt ELSE 0 END) AS BIGINT) AS c_tgt
                   FROM df GROUP BY 1),
            tot AS (SELECT CAST(sum(c_raw) AS BIGINT) AS cr,
                           CAST(sum(c_tgt) AS BIGINT) AS ct FROM pb),
            model AS (SELECT bucket,
                             ln((c_tgt + 0.5) / (ct + 4096.0))
                             - ln((c_raw + 0.5) / (cr + 4096.0)) AS lr
                      FROM pb, tot),
            sc AS (SELECT df.doc_id, round(sum(cnt * lr), 6) AS weight
                   FROM df JOIN model ON df.bucket = model.bucket
                   GROUP BY 1),
            w AS (SELECT d.doc_id, COALESCE(sc.weight, 0.0) AS weight
                  FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id),
            keyed AS (SELECT doc_id, weight,
                             round(weight - ln(-ln(
                                 (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT + 0.5)
                                 / 4294967296.0)), 6) AS key
                      FROM w)
            SELECT doc_id, weight, key FROM keyed
            ORDER BY key DESC, doc_id LIMIT 100
        """,
        "ec_temporal_departure": """
            WITH RECURSIVE pos AS (
                SELECT event_id, user_id, epoch_us(ts) AS tu,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS rn
                FROM events
            ),
            ed AS (SELECT p.event_id AS src, q.event_id AS dst, q.tu AS t
                   FROM pos p JOIN pos q
                   ON p.user_id = q.user_id AND q.rn = p.rn + 1),
            sym AS (SELECT src, dst, t FROM ed
                    UNION ALL
                    SELECT dst, src, t FROM ed),
            reach(id, t) AS (
                SELECT CAST(0 AS BIGINT), (SELECT MAX(t) FROM sym)
                UNION
                SELECT s.src, s.t
                FROM reach JOIN sym s
                ON s.dst = reach.id AND s.t <= reach.t
            ),
            dep AS (SELECT id, MAX(t) AS d FROM reach GROUP BY 1)
            SELECT e.event_id AS id,
                   COALESCE(dep.d, -9223372036854775808) AS value
            FROM events e LEFT JOIN dep ON e.event_id = dep.id
        """,
        # Bloom gate audit: the exact-side columns (n_docs,
        # n_bench_shingles, contaminated_exact) are recomputed from the
        # same train/benchmark split; the two guarantee columns are the
        # sketch's structural contract (no false negatives; fp within
        # the analytic bound), same adjudication as ec_heavy_hitters_inv
        "doc_bloom_contamination": f"""
            WITH sh AS ({SHINGLES}),
            tr AS (SELECT doc_id, shingle FROM sh WHERE doc_id >= 50),
            bn AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < 50)
            SELECT (SELECT count(DISTINCT doc_id) FROM tr) AS n_docs,
                   (SELECT CAST(count(*) AS BIGINT) FROM bn) AS n_bench_shingles,
                   (SELECT CAST(count(*) AS BIGINT) FROM tr
                    WHERE shingle IN (SELECT shingle FROM bn)) AS contaminated_exact,
                   CAST(0 AS BIGINT) AS false_neg_violations,
                   true AS fp_within_bound
        """,
        # per-domain token budget: hash-ordered exclusive cumsum within
        # each registered domain (closed-form domain key), keep while
        # the preceding mass is under the budget
        "doc_domain_token_budget": f"""
            WITH {_DOMAIN_CTES},
            t AS (SELECT doc_id, CAST(len({TOKS}) AS BIGINT) AS n_tokens
                  FROM documents),
            o AS (SELECT dom.doc_id, dom.domain, t.n_tokens,
                     coalesce(sum(t.n_tokens) OVER (PARTITION BY dom.domain
                         ORDER BY (('0x' || substr(md5((dom.doc_id)::VARCHAR || 'dombudget'), 1, 8))::BIGINT
                                   / 4294967296.0) ASC, dom.doc_id ASC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                         0) AS cum_before
                  FROM dom JOIN t USING (doc_id))
            SELECT doc_id, domain, n_tokens,
                   CAST(cum_before AS BIGINT) AS cum_before,
                   (domain = '' OR cum_before < 400) AS keep
            FROM o
        """,
        # curate with BOTH per-domain budgets: quality gate -> hash-
        # ordered doc cap (12/domain, salt 'cap') -> token budget
        # (400/domain over cap survivors, salt 'dombudget') -> the same
        # shingle-dedup tail as every curate composite
        "pipeline_curate_domcap": f"""
            WITH RECURSIVE {_DOMAIN_CTES},
            t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
            s AS (SELECT doc_id,
                CAST(len(toks) AS INTEGER) AS n_tokens,
                len(list_filter(toks, x -> list_contains({STOP_EN}, x))) AS n_stop,
                CASE WHEN len(toks) > 0
                     THEN CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks)
                     ELSE 0.0 END AS mtl
                FROM t),
            q AS (SELECT doc_id FROM s WHERE
                (CASE WHEN n_tokens > 0 AND CAST(n_stop AS DOUBLE)/n_tokens >= 0.01
                           AND CAST(n_stop AS DOUBLE)/n_tokens <= 0.5 THEN 0.4 ELSE 0.0 END
                 + CASE WHEN mtl >= 3.0 AND mtl <= 10.0 THEN 0.3 ELSE 0.0 END
                 + CASE WHEN n_tokens >= 10 AND n_tokens <= 100000 THEN 0.3 ELSE 0.0 END)
                >= 0.6),
            qd AS (SELECT q.doc_id, dom.domain FROM q JOIN dom USING (doc_id)),
            r AS (SELECT doc_id, domain,
                     row_number() OVER (PARTITION BY domain
                         ORDER BY (('0x' || substr(md5((doc_id)::VARCHAR || 'cap'), 1, 8))::BIGINT
                                   / 4294967296.0) ASC, doc_id ASC) AS rn
                  FROM qd),
            cap AS (SELECT doc_id, domain FROM r
                    WHERE rn <= 12 OR domain = ''),
            b AS (SELECT cap.doc_id, cap.domain,
                     CAST(len(t.toks) AS BIGINT) AS nt
                  FROM cap JOIN t USING (doc_id)),
            o AS (SELECT doc_id, domain,
                     coalesce(sum(nt) OVER (PARTITION BY domain
                         ORDER BY (('0x' || substr(md5((doc_id)::VARCHAR || 'dombudget'), 1, 8))::BIGINT
                                   / 4294967296.0) ASC, doc_id ASC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                         0) AS cb
                  FROM b),
            k0 AS (SELECT doc_id FROM o WHERE domain = '' OR cb < 400),
            kt AS (SELECT t.doc_id, t.toks FROM t JOIN k0 USING (doc_id)),
            shg AS (SELECT DISTINCT doc_id,
                       unnest(CASE WHEN len(toks) >= 3
                              THEN list_transform(range(0, len(toks) - 2),
                                                  i -> array_to_string(toks[i+1:i+3], ' '))
                              ELSE CAST([] AS VARCHAR[]) END) AS shingle
                   FROM kt),
            sz AS (SELECT doc_id, count(*) AS sz FROM shg GROUP BY 1),
            inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
                      FROM shg a JOIN shg b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                      GROUP BY 1, 2),
            prs AS (SELECT doc_a, doc_b FROM inter
                    JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
                    WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.05),
            und AS (SELECT doc_a AS s, doc_b AS d FROM prs
                    UNION SELECT doc_b, doc_a FROM prs),
            reach(id, rr) AS (
                SELECT s, s FROM und
                UNION
                SELECT u2.d, reach.rr FROM reach JOIN und u2 ON u2.s = reach.id
            ),
            keep AS (SELECT id, MIN(rr) AS k FROM reach GROUP BY id)
            SELECT k0.doc_id FROM k0 LEFT JOIN keep ON keep.id = k0.doc_id
            WHERE coalesce(keep.k, k0.doc_id) = k0.doc_id
        """,
        # fix_text: expected clean form rebuilt directly — the mapped
        # ASCII for each injected mojibake prefix, then the same
        # whitespace collapse the repair chain ends with. The OUTER
        # trim mirrors Spark's trim-of-the-whole-string, so the oracle
        # stays exact even for empty/whitespace-only document text
        # (r11 ADVICE fix — previously safe only by corpus invariant).
        "doc_fix_text": '''
            SELECT doc_id,
                   trim((CASE doc_id % 5 WHEN 0 THEN chr(39)
                        WHEN 1 THEN '"' WHEN 2 THEN '"'
                        WHEN 3 THEN '-' ELSE '...' END)
                   || ' ' || trim(regexp_replace(text, '\\s+', ' ', 'g')))
                   AS fixed_text
            FROM documents
        ''',
        # strip_markup: expected clean form rebuilt directly — the
        # injected wrapper reduces to collapsed text + decoded tail.
        # '&amp;lt;' decodes to the LITERAL '&lt;' (amp decoded last);
        # outer trim = the empty-text fix as in doc_fix_text above.
        "doc_strip_markup": '''
            SELECT doc_id,
                   trim(trim(regexp_replace(text, '\\s+', ' ', 'g'))
                   || ' x &lt; y & tail end') AS stripped_text
            FROM documents
        ''',
        # hot-key skew audit over the skewed item stream (closed-form
        # item construction; rank ties by key asc, nulls first)
        "ec_hot_keys": '''
            WITH it AS (SELECT CASE WHEN event_id % 3 = 0 THEN 7
                                    WHEN event_id % 5 = 0 THEN 11
                                    ELSE user_id + 1000 END AS key
                        FROM events),
            a AS (SELECT key, CAST(count(*) AS BIGINT) AS n_rows
                  FROM it GROUP BY key),
            t AS (SELECT key, n_rows,
                     round(n_rows / (SELECT CAST(sum(n_rows) AS DOUBLE) FROM a), 6) AS share,
                     CAST(row_number() OVER (ORDER BY n_rows DESC, key ASC NULLS FIRST) AS BIGINT) AS rank
                  FROM a)
            SELECT key, n_rows, share, rank FROM t WHERE rank <= 10
        ''',
        # per-shard data card: the doc_shards cumsum + flat language
        # counts + integer deci-score quality rollup (bands 4/3/3)
        "doc_shard_datasheet": f"""
            WITH t AS (SELECT doc_id, source, lang, {TOKS} AS toks
                       FROM documents),
            s AS (SELECT doc_id, source, lang,
                     CAST(len(toks) AS BIGINT) AS n_tokens,
                     len(list_filter(toks, x -> list_contains({STOP_EN}, x))) AS n_stop,
                     CASE WHEN len(toks) > 0
                          THEN CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks)
                          ELSE 0.0 END AS mtl
                  FROM t),
            sc AS (SELECT doc_id, source, lang, n_tokens,
                     (CASE WHEN n_tokens > 0 AND CAST(n_stop AS DOUBLE)/n_tokens >= 0.01
                                AND CAST(n_stop AS DOUBLE)/n_tokens <= 0.5 THEN 4 ELSE 0 END
                      + CASE WHEN mtl >= 3.0 AND mtl <= 10.0 THEN 3 ELSE 0 END
                      + CASE WHEN n_tokens >= 10 AND n_tokens <= 100000 THEN 3 ELSE 0 END)
                     AS q10
                   FROM s),
            c AS (SELECT doc_id, source, lang, n_tokens, q10,
                     coalesce(sum(n_tokens) OVER (PARTITION BY source
                        ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) AS cb
                  FROM sc),
            a AS (SELECT doc_id, source, lang, n_tokens, q10,
                     CAST(cb // 500 AS BIGINT) AS shard FROM c)
            SELECT source, shard,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
                   CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
                   CAST(sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS n_de,
                   CAST(sum(CASE WHEN lang = 'es' THEN 1 ELSE 0 END) AS BIGINT) AS n_es,
                   CAST(sum(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT) AS n_fr,
                   CAST(sum(CASE WHEN lang NOT IN ('en','de','es','fr') THEN 1 ELSE 0 END) AS BIGINT) AS n_other_lang,
                   round(CAST(sum(q10) AS DOUBLE) / (count(*) * 10.0), 6) AS mean_quality,
                   round(CAST(min(q10) AS DOUBLE) / 10.0, 6) AS min_quality
            FROM a GROUP BY 1, 2
        """,
        # cross-snapshot Bloom URL dedup audit: exact side in closed
        # form from the messy-URL fixture's canonical key; the filter's
        # structural guarantees (FN=0, keeps subset) as literals the
        # Spark side must reproduce
        "doc_bloom_url_dedup": f"""
            WITH {_MESSY_URL_CTES},
            corp AS (SELECT DISTINCT canon FROM u WHERE doc_id % 3 < 2),
            nw AS (SELECT doc_id, canon FROM u WHERE doc_id % 3 = 2),
            flag AS (SELECT n.doc_id, n.canon,
                            (c.canon IS NOT NULL) AS e
                     FROM nw n LEFT JOIN corp c ON c.canon = n.canon),
            win AS (SELECT canon, MIN(doc_id) AS kid FROM flag
                    WHERE NOT e GROUP BY canon)
            SELECT CAST((SELECT count(*) FROM nw) AS BIGINT) AS n_new,
                   CAST((SELECT count(*) FROM corp) AS BIGINT) AS n_corpus_urls,
                   CAST((SELECT sum(CASE WHEN e THEN 1 ELSE 0 END) FROM flag)
                        AS BIGINT) AS seen_exact,
                   CAST(0 AS BIGINT) AS false_neg_violations,
                   true AS fp_within_bound,
                   CAST((SELECT count(*) FROM flag f JOIN win w
                         ON w.canon = f.canon AND f.doc_id = w.kid)
                        AS BIGINT) AS kept_exact,
                   true AS no_extra_keeps
        """,
        # reuse-signal extraction: every signal rebuilt in closed form
        # from the doc_id injection arithmetic — independent of the
        # extractor's regexes
        "doc_license_signals": '''
            SELECT doc_id,
                   CASE doc_id % 7 WHEN 0 THEN 'noindex, follow'
                        WHEN 1 THEN 'index, follow'
                        WHEN 2 THEN 'noindexing'
                        WHEN 3 THEN 'noarchive'
                        WHEN 4 THEN 'noindex' ELSE '' END AS robots,
                   doc_id % 7 IN (0, 3, 4) AS opted_out,
                   CASE doc_id % 5 WHEN 0 THEN 'by' WHEN 1 THEN 'by-nc'
                        WHEN 2 THEN 'zero' ELSE '' END AS cc_license,
                   CASE WHEN doc_id % 5 = 3 THEN 'MIT' ELSE '' END AS spdx,
                   doc_id % 11 = 0 AS rights_reserved
            FROM documents
        ''',
        # curation with the reuse-policy gate: the SAME injected text
        # drives quality + shingles on both sides (exact token parity);
        # the gate itself is closed-form (drops doc_id%7 IN (0,3,4) —
        # noindex / content-first noarchive / unquoted noindex — and
        # doc_id%5==1 by-nc; %7==5's EMPTY canonical tag stops the
        # priority chain, so its decoy noarchive does NOT drop), then
        # the standard dedup chain
        "pipeline_curate_licensed": f"""
            WITH RECURSIVE documents2 AS (SELECT doc_id,
                (CASE doc_id % 7
                     WHEN 0 THEN '<meta name="robots" content="noindex, follow"> '
                     WHEN 1 THEN '<meta name="robots" content="index, follow"> '
                     WHEN 2 THEN '<meta name="robots" content="noindexing"> '
                     WHEN 3 THEN '<meta content=''noarchive'' name=''robots''> '
                     WHEN 4 THEN '<meta name=robots content=noindex> '
                     WHEN 5 THEN '<meta name="robots" content=""> <meta content=''noarchive'' name=''robots''> '
                     ELSE '' END)
                || text ||
                (CASE doc_id % 5
                     WHEN 0 THEN ' https://creativecommons.org/licenses/by/4.0/'
                     WHEN 1 THEN ' https://creativecommons.org/licenses/by-nc/4.0/'
                     WHEN 2 THEN ' https://creativecommons.org/publicdomain/zero/1.0/'
                     WHEN 3 THEN ' SPDX-License-Identifier: MIT'
                     ELSE '' END)
                || (CASE WHEN doc_id % 11 = 0 THEN ' All Rights Reserved.'
                         ELSE '' END) AS text
                FROM documents),
            t AS (SELECT doc_id, {TOKS} AS toks FROM documents2),
            s AS (SELECT doc_id,
                CAST(len(toks) AS INTEGER) AS n_tokens,
                len(list_filter(toks, x -> list_contains({STOP_EN}, x))) AS n_stop,
                CASE WHEN len(toks) > 0
                     THEN CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks)
                     ELSE 0.0 END AS mtl
                FROM t),
            q AS (SELECT doc_id FROM s WHERE
                (CASE WHEN n_tokens > 0 AND CAST(n_stop AS DOUBLE)/n_tokens >= 0.01
                           AND CAST(n_stop AS DOUBLE)/n_tokens <= 0.5 THEN 0.4 ELSE 0.0 END
                 + CASE WHEN mtl >= 3.0 AND mtl <= 10.0 THEN 0.3 ELSE 0.0 END
                 + CASE WHEN n_tokens >= 10 AND n_tokens <= 100000 THEN 0.3 ELSE 0.0 END)
                >= 0.6),
            g AS (SELECT doc_id FROM q
                  WHERE doc_id % 7 NOT IN (0, 3, 4) AND doc_id % 5 <> 1),
            kt AS (SELECT t.doc_id, t.toks FROM t JOIN g USING (doc_id)),
            sh AS (SELECT DISTINCT doc_id,
                       unnest(CASE WHEN len(toks) >= 3
                              THEN list_transform(range(0, len(toks) - 2),
                                                  i -> array_to_string(toks[i+1:i+3], ' '))
                              ELSE CAST([] AS VARCHAR[]) END) AS shingle
                   FROM kt),
            sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
            inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
                      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                      GROUP BY 1, 2),
            prs AS (SELECT doc_a, doc_b FROM inter
                    JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
                    WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.05),
            und AS (SELECT doc_a AS s, doc_b AS d FROM prs
                    UNION SELECT doc_b, doc_a FROM prs),
            reach(id, r) AS (
                SELECT s, s FROM und
                UNION
                SELECT u.d, reach.r FROM reach JOIN und u ON u.s = reach.id
            ),
            keep AS (SELECT id, MIN(r) AS k FROM reach GROUP BY id)
            SELECT g.doc_id FROM g LEFT JOIN keep ON keep.id = g.doc_id
            WHERE coalesce(keep.k, g.doc_id) = g.doc_id
        """,
        # online skew monitor: per-7-day-window (epoch-aligned tumbling,
        # same arithmetic as Spark's F.window) top-5 heavy keys of the
        # skewed item stream — closed-form item construction, ranks/
        # shares per window; batch parity of the streaming entry
        "ec_hot_keys_stream": '''
            WITH it AS (SELECT CASE WHEN event_id % 3 = 0 THEN 7
                                    WHEN event_id % 5 = 0 THEN 11
                                    ELSE user_id + 1000 END AS key,
                               CAST(floor(epoch(ts) / 604800) * 604800
                                    AS BIGINT) AS window_start
                        FROM events),
            a AS (SELECT window_start, key,
                         CAST(count(*) AS BIGINT) AS n_rows
                  FROM it GROUP BY 1, 2),
            t AS (SELECT window_start, key, n_rows,
                     round(n_rows / CAST(sum(n_rows) OVER
                         (PARTITION BY window_start) AS DOUBLE), 6) AS share,
                     CAST(row_number() OVER (PARTITION BY window_start
                         ORDER BY n_rows DESC, key ASC NULLS FIRST)
                         AS BIGINT) AS rank
                  FROM a)
            SELECT window_start, key, n_rows, share, rank
            FROM t WHERE rank <= 5
        ''',
        # curation funnel: the same quality/blocklist/dedup chain as the
        # curate composites, but emitting per-stage counts (n_in of a
        # stage = n_out of the previous)
        "doc_curate_report": f'''
            WITH RECURSIVE t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
            s AS (SELECT doc_id, toks,
                CAST(len(toks) AS INTEGER) AS n_tokens,
                len(list_filter(toks, x -> list_contains({STOP_EN}, x))) AS n_stop,
                CASE WHEN len(toks) > 0
                     THEN CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks)
                     ELSE 0.0 END AS mtl
                FROM t),
            q AS (SELECT doc_id, toks FROM s WHERE
                (CASE WHEN n_tokens > 0 AND CAST(n_stop AS DOUBLE)/n_tokens >= 0.01
                           AND CAST(n_stop AS DOUBLE)/n_tokens <= 0.5 THEN 0.4 ELSE 0.0 END
                 + CASE WHEN mtl >= 3.0 AND mtl <= 10.0 THEN 0.3 ELSE 0.0 END
                 + CASE WHEN n_tokens >= 10 AND n_tokens <= 100000 THEN 0.3 ELSE 0.0 END)
                >= 0.7),
            b AS (SELECT doc_id, toks FROM q
                  WHERE NOT list_contains(toks, 'dup')),
            shx AS (SELECT DISTINCT doc_id,
                       unnest(CASE WHEN len(toks) >= 3
                              THEN list_transform(range(0, len(toks) - 2),
                                                  i -> array_to_string(toks[i+1:i+3], ' '))
                              ELSE CAST([] AS VARCHAR[]) END) AS shingle
                   FROM b),
            sz AS (SELECT doc_id, count(*) AS sz FROM shx GROUP BY 1),
            inter AS (SELECT a.doc_id AS doc_a, bb.doc_id AS doc_b, count(*) AS i
                      FROM shx a JOIN shx bb ON a.shingle = bb.shingle AND a.doc_id < bb.doc_id
                      GROUP BY 1, 2),
            prs AS (SELECT doc_a, doc_b FROM inter
                    JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
                    WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.05),
            und AS (SELECT doc_a AS s2, doc_b AS d2 FROM prs
                    UNION SELECT doc_b, doc_a FROM prs),
            reach(id, r) AS (
                SELECT s2, s2 FROM und
                UNION
                SELECT u2.d2, reach.r FROM reach JOIN und u2 ON u2.s2 = reach.id
            ),
            keepm AS (SELECT id, MIN(r) AS k FROM reach GROUP BY id),
            dd AS (SELECT b.doc_id FROM b LEFT JOIN keepm ON keepm.id = b.doc_id
                   WHERE coalesce(keepm.k, b.doc_id) = b.doc_id),
            c0 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
            c1 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM q),
            c2 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM b),
            c3 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM dd)
            SELECT CAST(1 AS BIGINT) AS stage_idx, 'quality_gate' AS stage,
                   c0.n AS n_in, c0.n - c1.n AS n_dropped, c1.n AS n_out
            FROM c0, c1
            UNION ALL
            SELECT CAST(2 AS BIGINT), 'blocklist', c1.n, c1.n - c2.n, c2.n
            FROM c1, c2
            UNION ALL
            SELECT CAST(3 AS BIGINT), 'dedup_resolve', c2.n, c2.n - c3.n, c3.n
            FROM c2, c3
        ''',
        # embedding-space ingest dedup: the planted increment (40
        # perturbed copies / 20 negated pairs / 20 negated singletons)
        # rebuilt in closed form, then the GENERIC semantics — corpus
        # gate by exact cosine, survivors-only transitive resolution
        "emb_incremental_dedup": """
            WITH RECURSIVE base AS (
                SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
            pl AS (SELECT id + 1000000 AS id,
                       list_transform(range(1, len(v) + 1),
                           i -> CASE WHEN i = 1 THEN v[1] + 0.1 ELSE v[i] END) AS v
                   FROM base WHERE id < 40),
            na AS (SELECT id + 2000000 AS id,
                       list_transform(range(1, len(v) + 1),
                           i -> CASE WHEN i = 1 THEN -v[1] + 0.1 ELSE -v[i] END) AS v
                   FROM base WHERE id >= 40 AND id < 60),
            nb AS (SELECT id + 3000000 AS id,
                       list_transform(range(1, len(v) + 1),
                           i -> CASE WHEN i = 2 THEN -v[2] + 0.1 ELSE -v[i] END) AS v
                   FROM base WHERE id >= 40 AND id < 60),
            ns AS (SELECT id + 4000000 AS id,
                       list_transform(range(1, len(v) + 1),
                           i -> CASE WHEN i = 3 THEN -v[3] + 0.1 ELSE -v[i] END) AS v
                   FROM base WHERE id >= 60 AND id < 80),
            newv AS (SELECT * FROM pl UNION ALL SELECT * FROM na
                     UNION ALL SELECT * FROM nb UNION ALL SELECT * FROM ns),
            dup AS (SELECT DISTINCT n.id FROM newv n JOIN base c
                    ON round(list_dot_product(n.v, c.v)
                       / (sqrt(list_dot_product(n.v, n.v))
                          * sqrt(list_dot_product(c.v, c.v))), 6) >= 0.9),
            surv AS (SELECT * FROM newv
                     WHERE id NOT IN (SELECT id FROM dup)),
            prs AS (SELECT a.id AS ia, b.id AS ib FROM surv a JOIN surv b
                    ON a.id < b.id
                    AND round(list_dot_product(a.v, b.v)
                        / (sqrt(list_dot_product(a.v, a.v))
                           * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.9),
            und AS (SELECT ia AS s, ib AS d FROM prs
                    UNION SELECT ib, ia FROM prs),
            reach(id, r) AS (
                SELECT s, s FROM und
                UNION
                SELECT u2.d, reach.r FROM reach JOIN und u2 ON u2.s = reach.id
            ),
            keep AS (SELECT id, MIN(r) AS k FROM reach GROUP BY id)
            SELECT n.id,
                   n.id IN (SELECT id FROM dup) AS dup_of_corpus,
                   n.id NOT IN (SELECT id FROM dup)
                   AND coalesce(keep.k, n.id) = n.id AS keep
            FROM newv n LEFT JOIN keep ON keep.id = n.id
        """,
        # incremental ingest dedup: new = doc_id >= 400, corpus < 400;
        # dup_of_corpus by exact Jaccard vs any corpus doc; resolution
        # (recursive closure, min-id keep) over the corpus-SURVIVING
        # new docs only
        "doc_incremental_dedup": f"""
            WITH RECURSIVE sh AS ({SHINGLES}),
            szs AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
            ci AS (SELECT a.doc_id AS na, b.doc_id AS ob, count(*) AS i
                   FROM sh a JOIN sh b ON a.shingle = b.shingle
                   WHERE a.doc_id >= 400 AND b.doc_id < 400
                   GROUP BY 1, 2),
            dup AS (SELECT DISTINCT na AS doc_id FROM ci
                    JOIN szs sa ON sa.doc_id = na
                    JOIN szs sb ON sb.doc_id = ob
                    WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.05),
            surv AS (SELECT doc_id FROM documents
                     WHERE doc_id >= 400
                       AND doc_id NOT IN (SELECT doc_id FROM dup)),
            ni AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
                   FROM sh a JOIN sh b ON a.shingle = b.shingle
                       AND a.doc_id < b.doc_id
                   WHERE a.doc_id IN (SELECT doc_id FROM surv)
                     AND b.doc_id IN (SELECT doc_id FROM surv)
                   GROUP BY 1, 2),
            prs AS (SELECT doc_a, doc_b FROM ni
                    JOIN szs sa ON sa.doc_id = doc_a
                    JOIN szs sb ON sb.doc_id = doc_b
                    WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.05),
            und AS (SELECT doc_a AS s, doc_b AS d FROM prs
                    UNION SELECT doc_b, doc_a FROM prs),
            reach(id, r) AS (
                SELECT s, s FROM und
                UNION
                SELECT u2.d, reach.r FROM reach JOIN und u2 ON u2.s = reach.id
            ),
            keep AS (SELECT id, MIN(r) AS k FROM reach GROUP BY id)
            SELECT d.doc_id,
                   d.doc_id IN (SELECT doc_id FROM dup) AS dup_of_corpus,
                   d.doc_id NOT IN (SELECT doc_id FROM dup)
                   AND coalesce(keep.k, d.doc_id) = d.doc_id AS keep
            FROM documents d LEFT JOIN keep ON keep.id = d.doc_id
            WHERE d.doc_id >= 400
        """,
        # quantile-summary audit: exact lower quantiles (value at sorted
        # rank ceil(q*n)) recomputed by rank; within_bound is the sketch
        # contract (must hold on any partitioning), same adjudication as
        # ec_heavy_hitters_inv / doc_bloom_contamination
        "doc_quantile_sketch_inv": """
            WITH v AS (SELECT CAST(n_chars AS DOUBLE) AS x FROM documents
                       WHERE n_chars IS NOT NULL),
            nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
            r AS (SELECT x, row_number() OVER (ORDER BY x) AS rn FROM v),
            p AS (SELECT unnest([0.1, 0.25, 0.5, 0.75, 0.9, 0.99]) AS q)
            SELECT p.q,
                   CAST(ceil(p.q * nn.n) AS BIGINT) AS target_rank,
                   nn.n AS n_values,
                   (SELECT x FROM r
                    WHERE rn = CAST(ceil(p.q * nn.n) AS BIGINT)) AS true_value,
                   true AS within_bound
            FROM p, nn
        """,
        # streaming data card: event time is doc_id minutes, so the 1h
        # window start is (doc_id // 60) * 3600 epoch seconds in closed
        # form; the four sections are the GROUPING SETS unpivoted as a
        # UNION ALL (the Expand shape the stream computes per row)
        "doc_datasheet_stream": f"""
            WITH t AS (SELECT doc_id, lang, source, {TOKS} AS toks
                       FROM documents),
            s AS (SELECT doc_id, lang, source,
                CAST(len(toks) AS BIGINT) AS nt,
                CAST(len(toks) AS INTEGER) AS n_tokens,
                len(list_filter(toks, x -> list_contains({STOP_EN}, x))) AS n_stop,
                CASE WHEN len(toks) > 0
                     THEN CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks)
                     ELSE 0.0 END AS mean_token_len
                FROM t),
            q AS (SELECT (doc_id // 60) * 3600 AS window_start,
                lang, source, nt,
                CAST(CAST(round(
                (CASE WHEN n_tokens > 0 AND CAST(n_stop AS DOUBLE)/n_tokens >= 0.01
                           AND CAST(n_stop AS DOUBLE)/n_tokens <= 0.5 THEN 0.4 ELSE 0.0 END
                 + CASE WHEN mean_token_len >= 3.0 AND mean_token_len <= 10.0 THEN 0.3 ELSE 0.0 END
                 + CASE WHEN n_tokens >= 10 AND n_tokens <= 100000 THEN 0.3 ELSE 0.0 END
                ) * 10, 0) AS INTEGER) AS VARCHAR) AS band
                FROM s),
            u AS (
                SELECT window_start, 'overall' AS section, 'all' AS key, nt FROM q
                UNION ALL
                SELECT window_start, 'language', lang, nt FROM q
                UNION ALL
                SELECT window_start, 'source', source, nt FROM q
                UNION ALL
                SELECT window_start, 'quality_band', band, nt FROM q)
            SELECT window_start, section, key,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(nt) AS BIGINT) AS n_tokens
            FROM u GROUP BY 1, 2, 3
        """,
        # trained-model-beats-baseline invariants (loss is a gradient chain
        # with no SQL twin; the boolean IS the checkable contract)
        "sp_als_loss": "SELECT true AS beats_mean",
        "sp_sgd_loss": "SELECT true AS loss_decreased",
        "sp_svdpp_loss": "SELECT true AS loss_decreased",
        # ---- r13 permanent-tail conversions (r12 verdict #5):
        # constructed fixtures whose output is provably unique, so the
        # exact closed form is a valid oracle ----
        # unique greedy matching: odd/even path weights make the
        # locally-dominant matching exactly the odd-position edges
        # (both directions; see the query docstring for the proof)
        "ec_maxbmatching": f"""
            WITH pos AS ({EC_POS}),
            e AS (SELECT p1.event_id AS src, p2.event_id AS dst
                  FROM pos p1 JOIN pos p2
                    ON p1.user_id = p2.user_id AND p2.rn = p1.rn + 1
                  WHERE p2.rn % 2 = 1)
            SELECT src, dst FROM e
            UNION ALL SELECT dst AS src, src AS dst FROM e
        """,
        # planted one-hot clusters (cluster = vec_id % 8): in-cluster
        # cosine exactly 1.0, cross-cluster 0.0, identical vectors share
        # every LSH bucket / IVF cell — ANN provably equals the exact
        # top-k = the 5 smallest same-cluster ids excluding self
        "emb_lsh_topk": """
            WITH q AS (SELECT vec_id AS query_id FROM embeddings WHERE vec_id < 10),
            r AS (SELECT q.query_id, e.vec_id AS neighbor_id,
                         row_number() OVER (PARTITION BY q.query_id
                                            ORDER BY e.vec_id) AS rank
                  FROM q JOIN embeddings e
                    ON e.vec_id % 8 = q.query_id % 8
                   AND e.vec_id <> q.query_id)
            SELECT query_id, neighbor_id, CAST(1.0 AS DOUBLE) AS cos,
                   CAST(rank AS INTEGER) AS rank
            FROM r WHERE rank <= 5
        """,
        "emb_ivf_topk": """
            WITH q AS (SELECT vec_id AS query_id FROM embeddings WHERE vec_id < 10),
            r AS (SELECT q.query_id, e.vec_id AS neighbor_id,
                         row_number() OVER (PARTITION BY q.query_id
                                            ORDER BY e.vec_id) AS rank
                  FROM q JOIN embeddings e
                    ON e.vec_id % 8 = q.query_id % 8
                   AND e.vec_id <> q.query_id)
            SELECT query_id, neighbor_id, CAST(1.0 AS DOUBLE) AS cos,
                   CAST(rank AS INTEGER) AS rank
            FROM r WHERE rank <= 5
        """,
        # planted one-hot near-dup: the LSH-banded candidates provably
        # contain every in-cluster pair (identical vectors share all
        # buckets), and only in-cluster pairs clear the 0.95 threshold
        "emb_near_dup_lsh": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   CAST(1.0 AS DOUBLE) AS cos
            FROM embeddings a JOIN embeddings b
              ON a.vec_id < b.vec_id AND a.vec_id % 64 = b.vec_id % 64
        """,
        # planted one-hot SemDeDup: keep ⇔ id is its planted cluster's
        # minimum ⇔ vec_id < 64 (see the query docstring for the proof)
        "emb_semantic_dedup": """
            SELECT vec_id AS id, vec_id < 64 AS keep FROM embeddings
        """,
        # planted one-hot k-means with pinned one-hot centers: nearest
        # center = own one-hot (unique argmin), zero movement after one
        # pass — assignment is provably vec_id % 8
        "emb_kmeans": """
            SELECT vec_id AS id, CAST(vec_id % 8 AS INTEGER) AS cluster
            FROM embeddings
        """,
        # strict-chain BPE corpus: with N docs of identical text
        # "xy"×8 "xz"×4 "yz"×2 "xyz", pair counts are 9N > 4N > 3N→2N
        # with never a tie, so 3 merges are provably (x,y)(x,z)(y,z)
        # and the segmentation table is closed-form
        "doc_bpe_segments": """
            WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents)
            SELECT token, freq, segmentation, n_symbols FROM (
                SELECT 'xy' AS token, 8 * n AS freq, 'xy' AS segmentation,
                       CAST(1 AS INTEGER) AS n_symbols FROM n
                UNION ALL SELECT 'xyz', n, 'xy z', CAST(2 AS INTEGER) FROM n
                UNION ALL SELECT 'xz', 4 * n, 'xz', CAST(1 AS INTEGER) FROM n
                UNION ALL SELECT 'yz', 2 * n, 'yz', CAST(1 AS INTEGER) FROM n
            ) ORDER BY token
        """,
        # sp_svdpp_factors, emb_near_dup_lsh, emb_ivfpq_topk, ...:
        # intentionally no oracle (sequential gradient chain / lossy PQ
        # approximation) — driver records the weaker rows-only check.
    }
