"""PII detection + redaction for web-text curation, pure JVM expressions.

A training-data pipeline scrubs personally identifiable information before
anything ships: emails, phone numbers, card-shaped numbers, IPv4
addresses. At 100 TB this must be a scan-side, whole-stage-codegen row
expression — `regexp_count` / `regexp_replace` on the JVM, zero Python,
zero shuffle until the audit aggregation (the same execution shape as the
Gopher/C4 rules in functions/text.py).

Pattern scope is deliberately conservative and DIALECT-PORTABLE: every
regex runs identically under Java (Spark) and RE2 (DuckDB oracles) — no
backreferences, no lookaround. A production deployment would widen the
grammar (international phone formats, IBANs); the *engine* contract here
is that detection and redaction are exact twins across engines, proven by
the `pii_redaction` oracle twin.

Each `*_sql` helper emits the DuckDB expression the oracle runs; keeping
both dialects in one module is what stops them drifting apart.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# portable regex grammar (Java ∩ RE2): character classes, bounded repeats,
# \b word boundaries only
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+[0-9]{1,2}-[0-9]{3}-[0-9]{3,4}(-[0-9]{3,4})?"
CARD_RE = r"\b[0-9]{4}-[0-9]{4}-[0-9]{4}-[0-9]{4}\b"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"

# redaction order matters: the card grammar is a superset of the phone
# TAIL (4-4 groups), so cards redact before phones; emails first (their
# local part may contain digits a later pass would chew on)
_ORDERED = (
    ("email", EMAIL_RE, "[EMAIL]"),
    ("card", CARD_RE, "[CARD]"),
    ("phone", PHONE_RE, "[PHONE]"),
    ("ip", IPV4_RE, "[IP]"),
)

PII_KINDS = tuple(k for k, _, _ in _ORDERED)


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-kind match counts (JVM `regexp_count`): {'email': Column, ...}.
    Counts are taken on the RAW text — they are the audit numbers a
    curation job reports before redacting."""
    return {kind: F.regexp_count(col, F.lit(rx)) for kind, rx, _ in _ORDERED}


def redact_pii(col: Column) -> Column:
    """All four kinds replaced with bracketed placeholders, in the
    documented order. Idempotent: placeholders match none of the
    patterns."""
    out = col
    for _, rx, repl in _ORDERED:
        out = F.regexp_replace(out, rx, repl)
    return out


def pii_any(col: Column) -> Column:
    """True iff ANY pattern still matches — the post-redaction leak check
    (must be uniformly false after redact_pii)."""
    cond = None
    for _, rx, _ in _ORDERED:
        c = F.regexp_count(col, F.lit(rx)) > 0
        cond = c if cond is None else (cond | c)
    return cond


# ------------------------------------------------------- DuckDB twins ------
def sql_pii_count(expr: str, kind: str) -> str:
    """DuckDB twin of pii_counts[kind] (DuckDB has no regexp_count —
    len(regexp_extract_all) is the same non-overlapping match count)."""
    rx = dict((k, r) for k, r, _ in _ORDERED)[kind]
    return f"len(regexp_extract_all({expr}, '{rx}'))"


def sql_redact_pii(expr: str) -> str:
    """DuckDB twin of redact_pii — the identical ordered replace chain."""
    out = expr
    for _, rx, repl in _ORDERED:
        out = f"regexp_replace({out}, '{rx}', '{repl}', 'g')"
    return out


def sql_pii_any(expr: str) -> str:
    return " OR ".join(
        f"regexp_matches({expr}, '{rx}')" for _, rx, _ in _ORDERED
    )


def k_anonymity_audit(df, qi_cols: list[str], ks: list[int]):
    """K-anonymity audit over a quasi-identifier combination — the
    privacy gate next to PII redaction: redaction removes DIRECT
    identifiers, but a row is still re-identifiable when its
    quasi-identifier combo (coarse location x day x type...) is shared
    by too few rows. Reports the group-size HISTOGRAM (anonymity-set
    size -> groups, rows) plus, per requested k, how many rows sit in
    groups smaller than k (the re-identification exposure the release
    must mitigate by generalizing a QI column).

    Exact integers end to end (counts of counts; the exposure fractions
    are single divides the caller rounds). Two map-side-combined
    aggregations: groupBy(QI) then groupBy(size) — the second input is
    |distinct QI combos| rows. Returns (audit_df, exposure_df):
      audit:    (group_size, n_groups, n_rows)
      exposure: (k, rows_below, frac_below)"""
    from pyspark.sql import functions as F

    if not qi_cols or not ks:
        raise ValueError("qi_cols and ks are required")
    sizes = df.groupBy(*qi_cols).agg(F.count(F.lit(1)).alias("group_size"))
    audit = (
        sizes.groupBy("group_size")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum("group_size").alias("n_rows"),
        )
    )
    total = audit.agg(F.sum("n_rows").alias("total"))
    parts = []
    for k in sorted(ks):
        parts.append(
            audit.crossJoin(F.broadcast(total)).select(
                F.lit(k).alias("k"),
                F.sum(
                    F.when(F.col("group_size") < k, F.col("n_rows")).otherwise(0)
                ).alias("rows_below"),
                (
                    F.sum(
                        F.when(F.col("group_size") < k, F.col("n_rows")).otherwise(0)
                    ).cast("double")
                    / F.first("total").cast("double")
                ).alias("frac_below"),
            )
        )
    exposure = parts[0]
    for p in parts[1:]:
        exposure = exposure.unionAll(p)
    return audit, exposure
