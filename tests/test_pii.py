"""PII scrub (functions/pii.py): detection counts and in-place redaction
over realistic text — the adversarial cases the synthetic-corpus oracle
(text_pii_scrub) can't exercise."""

from __future__ import annotations

from pyspark.sql import functions as F

from codegraphcontext_spark.functions.pii import scrub_pii

ROWS = [
    # (id, text, n_emails, n_phones, n_ips, redacted)
    (1, "mail bob.smith+x@corp.example.co or jo@a.io today",
     2, 0, 0, "mail <EMAIL> or <EMAIL> today"),
    (2, "call 555-0142 then 555-0199.",
     0, 2, 0, "call <PHONE> then <PHONE>."),
    (3, "host 10.20.30.40 and 192.168.0.1:8080",
     0, 0, 2, "host <IP> and <IP>:8080"),
    # digits glued to words are NOT phones (\b), version strings with two
    # dots are NOT IPv4 (needs four octets)
    (4, "v1.2.3 build x555-0142y release 1.2",
     0, 0, 0, "v1.2.3 build x555-0142y release 1.2"),
    (5, "reach admin@example.com at 10.0.0.2 or 555-0100",
     1, 1, 1, "reach <EMAIL> at <IP> or <PHONE>"),
    (6, "", 0, 0, 0, ""),
    # counts are independent per-pattern over the RAW text (the digits
    # match the phone pattern too), but redaction applies in order —
    # email first — so its digits never re-match as a phone in the output
    (7, "x 123-4567@mail.example.net y",
     1, 1, 0, "x <EMAIL> y"),
]


def test_pii_counts_and_redaction(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t, *_ in ROWS], "id int, text string"
    )
    got = {
        r["id"]: r
        for r in scrub_pii(df).orderBy("id").collect()
    }
    for i, _, ne, np_, ni, red in ROWS:
        r = got[i]
        assert (r["n_emails"], r["n_phones"], r["n_ips"]) == (ne, np_, ni), i
        assert r["redacted"] == red, i


def test_pii_is_narrow_plan(spark):
    """The scrub must stay a scan-fused projection: no Exchange anywhere."""
    df = spark.createDataFrame([(1, "a@b.co")], "id int, text string")
    plan = scrub_pii(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pii_keeps_input_columns(spark):
    df = spark.createDataFrame(
        [(1, "x", "keep")], "id int, text string, extra string"
    )
    out = scrub_pii(df)
    assert {"id", "text", "extra", "redacted"} <= set(out.columns)
    assert out.where(F.col("extra") == "keep").count() == 1
