"""PII detection/redaction contract: counts, placeholders, and the
email-before-phone redaction order (an email whose local part is
phone-shaped is redacted as ONE <EMAIL>, not a phone inside an email).
Detection counts are over the RAW text, independent of redaction."""

from pyspark.sql import functions as F

from extraction.textops import pii_counts, redact_pii


def test_pii_counts_and_redaction(spark):
    rows = [
        ("a", "mail me at jo.do+1@ex-ample.co.uk now"),
        ("b", "server 192.168.0.1 and 10.0.0.255"),
        ("c", "call 555-123-4567 or 555-000-9999"),
        ("d", "user123@example.com then 1.2.3.4 then 555-111-2222"),
        ("e", "no pii here 1234 5678"),
        ("f", "call 555-123-4567@x.com ok"),
    ]
    df = spark.createDataFrame(rows, "id string, t string")
    c = pii_counts(F.col("t"))
    got = {
        r["id"]: r
        for r in df.select(
            "id",
            c["n_emails"].alias("e"),
            c["n_ips"].alias("i"),
            c["n_phones"].alias("p"),
            redact_pii(F.col("t")).alias("r"),
        ).collect()
    }
    assert (got["a"]["e"], got["a"]["i"], got["a"]["p"]) == (1, 0, 0)
    assert got["a"]["r"] == "mail me at <EMAIL> now"
    assert (got["b"]["e"], got["b"]["i"], got["b"]["p"]) == (0, 2, 0)
    assert got["b"]["r"] == "server <IP> and <IP>"
    assert (got["c"]["e"], got["c"]["i"], got["c"]["p"]) == (0, 0, 2)
    assert got["c"]["r"] == "call <PHONE> or <PHONE>"
    assert (got["d"]["e"], got["d"]["i"], got["d"]["p"]) == (1, 1, 1)
    assert got["d"]["r"] == "<EMAIL> then <IP> then <PHONE>"
    assert (got["e"]["e"], got["e"]["i"], got["e"]["p"]) == (0, 0, 0)
    assert got["e"]["r"] == rows[4][1]
    # raw-text detection sees the phone-shaped local part; redaction
    # consumes the whole thing as one email first
    assert (got["f"]["e"], got["f"]["p"]) == (1, 1)
    assert got["f"]["r"] == "call <EMAIL> ok"


# --- property: Spark regex counts/redaction match Python re ---------------

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from extraction.textops import PII_EMAIL_RE, PII_IPV4_RE, PII_PHONE_RE

TOKENS = st.sampled_from(
    [
        "hello", "a.b", "x@", "@y", "1.2.3", "999", "call",
        "user7@example.com", "a.b-c+d@ex-ample.co.uk",
        "10.0.0.1", "255.255.255.255", "1.2.3.4.5",
        "555-123-4567", "12-345-6789", "555-12-34567",
    ]
)
TEXTS = st.lists(TOKENS, min_size=0, max_size=12).map(" ".join)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.lists(TEXTS, min_size=1, max_size=6))
def test_pii_matches_python_re(spark, texts):
    """The restricted Java∩RE2 dialect must also agree with Python re:
    same match counts per class and same redaction output."""
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    c = pii_counts(F.col("t"))
    got = {
        r["i"]: r
        for r in df.select(
            "i",
            c["n_emails"].alias("e"),
            c["n_ips"].alias("ip"),
            c["n_phones"].alias("p"),
            redact_pii(F.col("t")).alias("r"),
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i]["e"] == len(re.findall(PII_EMAIL_RE, t)), (t, "email")
        assert got[i]["ip"] == len(re.findall(PII_IPV4_RE, t)), (t, "ip")
        assert got[i]["p"] == len(re.findall(PII_PHONE_RE, t)), (t, "phone")
        want = re.sub(PII_EMAIL_RE, "<EMAIL>", t)
        want = re.sub(PII_IPV4_RE, "<IP>", want)
        want = re.sub(PII_PHONE_RE, "<PHONE>", want)
        assert got[i]["r"] == want, t
