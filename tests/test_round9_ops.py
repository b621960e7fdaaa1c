"""Round-9 additions: advice fixes — scheme-less URL host fallback,
auditable empty-host blocklist rows, byte-budget ALS broadcast gate —
plus the driver-canonicalizer list-column contract."""

import pytest
from pyspark.sql import functions as F

from kafka_graphs_spark.pipeline.domains import (
    domain_blocklist,
    extract_domains,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, url string, text string")


class TestSchemelessHosts:
    def test_schemeless_url_parses_as_bare_host(self, spark):
        rows = [
            (1, "www.example.com/x", "x"),            # scheme-less + path
            (2, "news.co.uk", "x"),                   # bare host only
            (3, "user@blog.org/x", "x"),              # scheme-less userinfo
            (4, "localhost:8080/dev", "x"),           # scheme-less port
            (5, "/just/a/path", "x"),                 # truly host-less
            (6, "://broken.example.com/x", "x"),      # malformed scheme
        ]
        out = {r["doc_id"]: r for r in extract_domains(_docs(spark, rows)).collect()}
        assert out[1]["host"] == "www.example.com"
        assert out[1]["domain"] == "example.com"
        assert out[2]["domain"] == "news.co.uk"
        assert out[3]["host"] == "blog.org"
        assert out[4]["host"] == "localhost"
        assert out[5]["host"] == ""
        assert out[6]["host"] == ""

    def test_blocklist_flags_hostless_rows_as_null(self, spark):
        rows = [
            (1, "www.shop.com/x", "x"),     # scheme-less subdomain: blocked
            (2, "/no/host/here", "x"),      # host-less: keep must be NULL
            (3, "https://data.org/x", "x"),
        ]
        out = {
            r["doc_id"]: r
            for r in domain_blocklist(_docs(spark, rows), ["shop.com"]).collect()
        }
        assert out[1]["keep"] is False
        assert out[1]["matched_domain"] == "shop.com"
        assert out[2]["keep"] is None            # auditable, not silently kept
        assert out[3]["keep"] is True

    def test_curate_drops_hostless_rows_under_domain_gate(self, spark):
        from kafka_graphs_spark.pipeline.curate import curate

        rows = [
            (1, "https://good.org/x", "some perfectly fine text here ok"),
            (2, "/no/host", "some perfectly fine text here ok"),
            (3, "https://bad.com/x", "some perfectly fine text here ok"),
        ]
        kept = curate(
            _docs(spark, rows),
            min_score=0.0,
            blocked_domains=["bad.com"],
        )
        ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
        # the gate cannot clear a host-less URL -> it is dropped, not passed
        assert ids == {1}


class TestBroadcastGateBytes:
    def test_gate_scales_with_dim(self):
        from kafka_graphs_spark.library.cf import (
            BROADCAST_FACTOR_BYTES,
            _fits_broadcast,
        )

        rows_at_dim8 = BROADCAST_FACTOR_BYTES // (8 * 8)
        assert _fits_broadcast(rows_at_dim8, 8)
        assert not _fits_broadcast(rows_at_dim8 + 1, 8)
        # at the als() default dim=50 the same row count is ~6x the
        # budget — the r8 gate would have broadcast ~400 MB here
        assert not _fits_broadcast(rows_at_dim8, 50)
        assert _fits_broadcast(BROADCAST_FACTOR_BYTES // (50 * 8), 50)


class TestNoComplexTopLevelColumns:
    """The driver hashes oracle-backed outputs through pandas
    sort_values, which crashes on list/dict cells (r8 doc_blocklist).
    Spot-check the contract on the query that broke plus the schema
    helper itself; the full 227-entry sweep enforces it in
    test_entry_contract.test_query_parity."""

    def test_doc_blocklist_emits_flat_columns(self, spark):
        import __spark_entry__ as entry_mod
        from pyspark.sql.types import ArrayType, MapType, StructType

        df = entry_mod.queries()["doc_blocklist"](
            spark, "/root/testdata/sf0.001"
        )
        bad = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        assert not bad
        row = df.filter(F.col("n_blocked") > 0).first()
        assert row is not None and isinstance(row["blocked_terms"], str)
