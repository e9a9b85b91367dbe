"""Differential PII corpus: the synthetic documents table contains no
digits or '@', so the registered text_pii_scrub hash check pins only
the no-op path.  This corpus exercises the redaction semantics — each
category, multiples, adjacency, the ssn-inside-email overlap — and
must agree with the DuckDB oracle under the driver's normalization."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod

PII_DOCS = [
    (0, "no pii here at all", "en", "edge", 18),
    (1, "contact bob.smith+spam@example.com for details", "en", "edge", 46),
    (2, "ssn 123-45-6789 on file", "en", "edge", 23),
    (3, "call 415-555-1234 or 415.555.9876 today", "en", "edge", 39),
    (4, "mail a@b.io and c_d%e@f-g.org twice", "en", "edge", 35),
    # ssn-shaped digits inside an email local part: email replacement
    # runs first, so the ssn REPLACEMENT stage finds nothing, while
    # n_ssn (counted on the original text) still reports the shape
    (5, "leak 123-45-6789@mail.com mixed", "en", "edge", 31),
    (6, "adjacent 999-88-7777 123-456-7890 pair", "en", "edge", 38),
]


@pytest.fixture(scope="module")
def pii_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("pii")
    spark.createDataFrame(
        PII_DOCS, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_pii_scrub_matches_oracle_on_pii_corpus(spark, pii_dir):
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    srows = {r.doc_id: r for r in qs["text_pii_scrub"](spark, pii_dir).collect()}

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{pii_dir}/documents.parquet/*.parquet'"
    )
    orows = {r[0]: r for r in con.execute(oracles["text_pii_scrub"]).fetchall()}

    assert set(srows) == set(orows)
    for doc_id, s in srows.items():
        assert (s.n_emails, s.n_ssn, s.n_phones, s.scrubbed_fp) == orows[doc_id][1:], doc_id

    # semantic pins (both engines, since they just matched):
    assert (srows[0].n_emails, srows[0].n_ssn, srows[0].n_phones) == (0, 0, 0)
    assert srows[1].n_emails == 1
    assert srows[2].n_ssn == 1
    assert srows[3].n_phones == 2
    assert srows[4].n_emails == 2
    # overlap: the ssn shape sat inside the email, so the email pass
    # already removed it — counted on original, absent at its own stage
    assert (srows[5].n_emails, srows[5].n_ssn) == (1, 1)
    assert srows[6].n_ssn == 1 and srows[6].n_phones == 1


def test_pii_scrub_noop_fp_equals_text_md5(spark, pii_dir):
    """Docs without PII must hash to md5(text) — the invariant the
    registered main-corpus query pins at scale."""
    from pyspark.sql import functions as F

    qs = entrymod.queries()
    out = qs["text_pii_scrub"](spark, pii_dir).filter("doc_id = 0").collect()[0]
    expected = (
        spark.read.parquet(f"{pii_dir}/documents.parquet")
        .filter("doc_id = 0")
        .select(F.md5("text"))
        .collect()[0][0]
    )
    assert out.scrubbed_fp == expected
