"""PII-scrub tests: planted emails/URLs/digit runs are replaced, counts
are right, clean text passes through untouched."""

from __future__ import annotations

from liblevenshtein_spark.functions.text import scrub_columns


DOCS = [
    (0, "reach me at jane.doe+spam@corp-mail.co.uk or on the phone"),
    (1, "docs at https://example.com/a/b?q=1#frag and http://t.co/x"),
    (2, "order 1234567 shipped, ref 987654321, but 12345 is too short"),
    (3, "perfectly clean text with no sensitive content at all"),
    (4, "mixed: https://a.io/u?e=x@y.com plus admin@a.io and 5550001234"),
    (5, ""),
]


def _rows(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    return {r.doc_id: r for r in df.select("doc_id", *scrub_columns("text")).collect()}


def test_email_scrub(spark):
    r = _rows(spark)[0]
    assert r.n_email == 1 and "<EMAIL>" in r.scrubbed
    assert "jane.doe" not in r.scrubbed


def test_url_scrub(spark):
    r = _rows(spark)[1]
    assert r.n_url == 2
    assert r.scrubbed == "docs at <URL> and <URL>"


def test_longnum_scrub_spares_short_numbers(spark):
    r = _rows(spark)[2]
    assert r.n_longnum == 2
    assert "1234567" not in r.scrubbed and "987654321" not in r.scrubbed
    assert "12345" in r.scrubbed            # below the 6-digit floor


def test_clean_text_passthrough(spark):
    rows = _rows(spark)
    assert rows[3].scrubbed == DOCS[3][1]
    assert (rows[3].n_email, rows[3].n_url, rows[3].n_longnum) == (0, 0, 0)
    assert rows[5].scrubbed == ""


def test_url_scrubbed_before_email(spark):
    # the URL containing '@' is consumed by the URL pass; the standalone
    # email and the 10-digit number still get their own placeholders
    r = _rows(spark)[4]
    assert "<URL>" in r.scrubbed and "<EMAIL>" in r.scrubbed and "<NUM>" in r.scrubbed
    assert "x@y.com" not in r.scrubbed and "admin" not in r.scrubbed
    # counts are measured independently on the original text
    assert r.n_url == 1 and r.n_email == 2 and r.n_longnum == 1
