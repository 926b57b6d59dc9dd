"""PII scrub + URL canonicalization unit contracts (r7). The cross-engine
byte-identity proof lives in the oracle twins (pii_redaction /
url_canonicalize, checked in test_oracle_twins + check_oracles --twins);
here: redaction order/idempotence, the leak invariant, and canonical-form
edge cases."""

import pytest
from pyspark.sql import functions as F

from erased_cells_spark.functions import pii as P
from erased_cells_spark.functions import url as U


def one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


CASES = [
    (
        "mail bob.smith+x@corp.example.org now",
        "mail [EMAIL] now",
        {"email": 1, "phone": 0, "card": 0, "ip": 0},
    ),
    (
        "call +1-555-0199 or +44-020-7946-0958",
        "call [PHONE] or [PHONE]",
        {"email": 0, "phone": 2, "card": 0, "ip": 0},
    ),
    (
        "pan 4111-2222-3333-4444 via 192.168.1.254",
        "pan [CARD] via [IP]",
        {"email": 0, "phone": 0, "card": 1, "ip": 1},
    ),
    ("clean text with-no pii 12-34", "clean text with-no pii 12-34",
     {"email": 0, "phone": 0, "card": 0, "ip": 0}),
]


class TestPii:
    @pytest.mark.parametrize("raw,want,counts", CASES)
    def test_redact_and_count(self, spark, raw, want, counts):
        got = one(spark, P.redact_pii(F.lit(raw)))
        assert got == want
        for kind, n in counts.items():
            assert one(spark, P.pii_counts(F.lit(raw))[kind]) == n

    def test_redaction_is_idempotent_and_leak_free(self, spark):
        raw = F.lit(" ".join(r for r, _, _ in CASES))
        once = P.redact_pii(raw)
        assert one(spark, P.redact_pii(once)) == one(spark, once)
        assert one(spark, P.pii_any(once)) is False
        assert one(spark, P.pii_any(raw)) is True

    def test_card_redacts_before_phone_grammar_can_bite(self, spark):
        # the card grammar is a superset of the phone TAIL: ordering means
        # one [CARD], never a half-eaten [PHONE] inside the card
        got = one(spark, P.redact_pii(F.lit("x 4111-2222-3333-4444 y")))
        assert got == "x [CARD] y"


URL_CASES = [
    # case folding + default port + www + tracking + fragment
    ("HTTPS://WWW.Ex.COM:443/a/b?utm_source=x&id=7&utm_campaign=y#top",
     "https://ex.com/a/b?id=7"),
    # explicit non-default port survives; http default port drops
    ("http://ex.com:8080/a", "http://ex.com:8080/a"),
    ("HTTP://EX.com:80/a", "http://ex.com/a"),
    # empty path -> /, tracking-only query -> no '?'
    ("https://Ex.com?utm_campaign=z", "https://ex.com/"),
    # userinfo skipped for the host, gclid/fbclid dropped, order kept
    ("https://user:pw@Ex.com/p?gclid=1&a=2&fbclid=3&b=4",
     "https://ex.com/p?a=2&b=4"),
    # fragment-only tail
    ("https://ex.com/p#frag", "https://ex.com/p"),
]


class TestUrl:
    @pytest.mark.parametrize("raw,want", URL_CASES)
    def test_canonical_url(self, spark, raw, want):
        assert one(spark, U.canonical_url(F.lit(raw))) == want

    def test_canonicalization_is_idempotent(self, spark):
        for raw, want in URL_CASES:
            again = one(spark, U.canonical_url(F.lit(want)))
            assert again == want

    def test_parts(self, spark):
        raw = F.lit("HTTPS://WWW.Ex.COM:8443/a/b?id=1#f")
        assert one(spark, U.url_scheme(raw)) == "https"
        assert one(spark, U.url_host(raw)) == "ex.com"
        assert one(spark, U.url_port(raw)) == "8443"
        assert one(spark, U.url_path(raw)) == "/a/b"
        assert one(spark, U.url_query(raw)) == "id=1"
