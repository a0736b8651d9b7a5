"""PII redaction/pseudonymization (operators/pii.py) and the JSONL
documents source/sink (sources/docs_io.py)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from market_microstructure_toolkit_spark.operators.pii import (
    generalize_band,
    pseudonymize,
    redact_pii,
)


def _texts(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )


class TestRedactPii:
    def test_email_ip_phone_redacted_and_counted(self, spark):
        df = _texts(
            spark,
            [
                "mail a.user+tag@example.co.uk now",
                "server at 10.0.255.3 responded",
                "call +1 415-555-0199 today",
                "clean text stays untouched",
            ],
        )
        out = {r.id: r for r in redact_pii(df).collect()}
        assert out[0].text == "mail <EMAIL> now"
        assert out[0].pii_email_hits == 1
        assert out[1].text == "server at <IP> responded"
        assert out[1].pii_ipv4_hits == 1
        assert out[2].text == "call <PHONE> today"
        assert out[2].pii_phone_hits == 1
        assert out[3].text == "clean text stays untouched"
        assert (
            out[3].pii_email_hits
            == out[3].pii_ipv4_hits
            == out[3].pii_phone_hits
            == 0
        )

    def test_multiple_hits_one_row(self, spark):
        df = _texts(spark, ["a@b.io and c@d.io wrote from 1.2.3.4"])
        row = redact_pii(df).collect()[0]
        assert row.pii_email_hits == 2 and row.pii_ipv4_hits == 1
        assert row.text == "<EMAIL> and <EMAIL> wrote from <IP>"

    def test_email_wins_over_phone_digits(self, spark):
        # pattern order: the mailbox digits must not be phone-mangled
        df = _texts(spark, ["reach 12345678901@example.com ok"])
        assert redact_pii(df).collect()[0].text == "reach <EMAIL> ok"


class TestPseudonymize:
    def test_deterministic_and_salt_sensitive(self, spark):
        df = spark.createDataFrame([("alice",), ("bob",)], "name string")
        a1 = {r.name: r.pseudonym for r in pseudonymize(df, "name", "s1").collect()}
        a2 = {r.name: r.pseudonym for r in pseudonymize(df, "name", "s1").collect()}
        b = {r.name: r.pseudonym for r in pseudonymize(df, "name", "s2").collect()}
        assert a1 == a2  # stable across runs
        assert a1["alice"] != b["alice"]  # salt rotation unlinks
        assert a1["alice"] != a1["bob"]

    def test_band_generalization(self, spark):
        df = spark.createDataFrame([(999.99,), (1000.0,), (-1.0,)], "x double")
        got = [
            r.b
            for r in df.select(generalize_band("x", 1000.0).alias("b"))
            .orderBy("x")
            .collect()
        ]
        assert got == [-1, 0, 1]  # floor semantics: -1.0 -> band -1

    def test_gate_redaction_fires_on_fixture(self, spark, sf_dir):
        """customer names carry digit runs -> redacted forms collapse."""
        from market_microstructure_toolkit_spark.plans.queries import REGISTRY

        out = REGISTRY["customer_pseudonymize"].spark(spark, sf_dir)
        n_red = out.select("redacted_name").distinct().count()
        n_pse = out.select("pseudonym").distinct().count()
        assert n_red == 1  # every name redacts to Customer#<NUM>
        assert n_pse == out.count()  # pseudonyms stay distinct per name


class TestJsonlRoundtrip:
    def test_lossless_with_hostile_text(self, spark):
        from market_microstructure_toolkit_spark.sources.docs_io import (
            read_documents_jsonl,
            write_documents_jsonl,
        )

        rows = [
            (1, 'line1\nline2\t"quoted" \\ back', "en", "web", 25),
            (2, "", "de", "books", 0),
            (3, None, None, None, None),
            (4, "unicode éß中文", "zh", "web", 11),
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
        path = tempfile.mkdtemp(prefix="jsonl_rt_")
        write_documents_jsonl(df, path)
        back = read_documents_jsonl(spark, path)
        got = sorted(
            [tuple(r) for r in back.collect()], key=lambda t: t[0]
        )
        # Spark's JSON sink drops null fields per row; the explicit-schema
        # read surfaces them as NULL again -> frames match exactly.
        assert got == rows

    def test_read_uses_explicit_schema_no_inference(self, spark, sf_dir):
        from market_microstructure_toolkit_spark.sources.docs_io import (
            DOCUMENTS_SCHEMA,
            read_documents_jsonl,
            write_documents_jsonl,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        path = tempfile.mkdtemp(prefix="jsonl_schema_")
        write_documents_jsonl(docs, path)
        back = read_documents_jsonl(spark, path)
        assert back.schema == DOCUMENTS_SCHEMA
