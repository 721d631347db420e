"""PII redaction: per-family replacement, sequential-count semantics."""

from __future__ import annotations

from chrono_scraper_spark.operators.pii import with_pii_redaction


def _one(spark, text):
    df = spark.createDataFrame([(0, text)], "doc_id int, text string")
    return with_pii_redaction(df).collect()[0]


def test_each_family_redacts(spark):
    r = _one(spark, "mail a.b+c@ex.co, host 10.0.255.7, ssn 123-45-6789, "
                    "call (555) 123-4567 now")
    assert r["text_redacted"] == ("mail <EMAIL>, host <IP>, ssn <SSN>, "
                                  "call <PHONE> now")
    assert (r["n_email"], r["n_ipv4"], r["n_ssn"], r["n_phone"]) \
        == (1, 1, 1, 1)
    assert r["n_pii"] == 4 and r["has_pii"]


def test_sequential_counts_no_double_redaction(spark):
    # email is redacted FIRST: an SSN-shaped username is consumed by the
    # email match and never double-counts as an SSN
    r = _one(spark, "write to 123-45-6789@example.com please")
    assert r["n_email"] == 1 and r["n_ssn"] == 0
    assert r["text_redacted"] == "write to <EMAIL> please"
    # a digits-only host is NOT an email (TLD must be alphabetic), so the
    # address inside it still counts as an IP
    r2 = _one(spark, "write to root@10.1.2.3 please")
    assert r2["n_email"] == 0 and r2["n_ipv4"] == 1
    assert r2["text_redacted"] == "write to root@<IP> please"


def test_invalid_octets_not_an_ip(spark):
    r = _one(spark, "version 999.300.1.256 is fine; 256.1.1.1 too")
    assert r["n_ipv4"] == 0


def test_clean_text_untouched(spark):
    r = _one(spark, "no sensitive content in this sentence")
    assert not r["has_pii"] and r["n_pii"] == 0
    assert r["text_redacted"] == "no sensitive content in this sentence"
    rn = _one(spark, None)
    assert rn["text_redacted"] == "" and not rn["has_pii"]
