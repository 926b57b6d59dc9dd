"""Text analysis functions.

Everything except `extract_text` is pure JVM builtin Column expressions
(whole-stage codegen; no Python in the hot path) with exact DuckDB-SQL
twins for the correctness oracle. `extract_text` is the one pandas UDF —
the per-row byte-identity invariant of the north rule lives there.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import StringType

# --------------------------------------------------------------- extraction --
_OPEN = b"<p>"
_CLOSE = b"</p>"


def extract_text_bytes(html: bytes) -> str:
    """Extract body text from the synthetic page wrapper, byte-identically.
    (The generator guarantees text contains no '<'.)"""
    i = html.find(_OPEN)
    j = html.rfind(_CLOSE)
    if i < 0 or j < 0 or j < i:
        return ""
    return html[i + len(_OPEN) : j].decode("utf-8")


@pandas_udf(StringType())
def _extract_text_udf(html: pd.Series) -> pd.Series:
    return html.map(extract_text_bytes)


def extract_text_pandas(html: Column) -> Column:
    """Arrow-batched pandas-UDF extraction (the reference-semantics twin;
    kept for parity testing and as the template for extractors that need
    real Python libs)."""
    return _extract_text_udf(html)


def extract_text(html: Column) -> Column:
    """html BINARY → text STRING; byte-identical per url (north-rule
    invariant, tested in test_pages_pipeline).

    Hot path is pure JVM builtins — whole-stage codegen, no Python worker
    hop — and mirrors the byte twin's FIRST-'<p>' → LAST-'</p>' semantics
    exactly (not first-close/last-open), so pages whose body itself contains
    marker pairs extract identically on both paths. Markers are ASCII, so
    char-slicing the decoded string equals byte-slicing the raw payload.

    The LAST '</p>' is located via substring_index(t, '</p>', -1) — the
    length of the tail after the last marker — instead of reversing the
    whole page and searching '>p/<' (r8): no reversed copy per row,
    measured 2x on the flagship's extraction stage, output identical on
    the full pages table and every marker-nesting edge case (pytest)."""
    s = html.cast("string")
    p1 = F.locate("<p>", s)  # 1-based, 0 = missing
    t = F.substr(s, p1 + F.lit(3))  # everything after the FIRST <p>
    tail = F.length(F.substring_index(t, "</p>", -1))  # chars after LAST </p>
    body = F.substr(t, F.lit(1), F.length(t) - tail - F.lit(4))
    # missing markers (or last close before first open) ⇒ "" (byte-twin parity)
    return F.when((p1 > 0) & (F.locate("</p>", t) > 0), body).otherwise(F.lit(""))


# --------------------------------------------------------------- token count --
def token_count(text: Column) -> Column:
    """Whitespace token count; empty/blank text counts 0."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    ).cast("long")


def sql_token_count(text_expr: str) -> str:
    return (
        f"CASE WHEN length(trim({text_expr})) = 0 THEN 0 "
        f"ELSE len(regexp_split_to_array(trim({text_expr}), '\\s+')) END"
    )


# -------------------------------------------------------------- BPE-ish split --
def subword_count(text: Column) -> Column:
    """BPE-ish token estimate: alnum runs + punctuation marks each count."""
    return F.size(F.regexp_extract_all(text, F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"), 0)).cast("long")


def sql_subword_count(text_expr: str) -> str:
    return f"len(regexp_extract_all({text_expr}, '[A-Za-z0-9]+|[^A-Za-z0-9\\s]'))"


# -------------------------------------------------------------------- quality --
_ASCII_LETTERS = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"


def quality_score(text: Column) -> Column:
    """Deterministic quality heuristic ∈ [0,1]: length saturation × alpha
    ratio. Same arithmetic, same order as the SQL twin (float-exact).
    The alpha count uses translate() deletion (a char-table lookup) rather
    than the twin's regexp_replace — identical count over the explicit
    ASCII a-zA-Z set, measured ~25% cheaper per scan (r8)."""
    n_chars = F.length(text).cast("double")
    n_alpha = (F.length(text) - F.length(F.translate(text, _ASCII_LETTERS, ""))).cast(
        "double"
    )
    len_sat = F.least(F.lit(1.0), n_chars / F.lit(500.0))
    alpha_ratio = F.when(n_chars == 0.0, F.lit(0.0)).otherwise(n_alpha / n_chars)
    return len_sat * alpha_ratio


def sql_quality_score(text_expr: str) -> str:
    n = f"length({text_expr})::DOUBLE"
    a = f"length(regexp_replace({text_expr}, '[^a-zA-Z]', '', 'g'))::DOUBLE"
    return (
        f"least(1.0, {n} / 500.0) * "
        f"(CASE WHEN {n} = 0.0 THEN 0.0 ELSE {a} / {n} END)"
    )


# --------------------------------------------------------------------- lang id --
# Marker-word lists for the n-gram/stopword heuristic. Deterministic CASE
# chain (first max wins in fixed order) — identical in Spark and DuckDB.
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein"],
    "fr": ["le", "la", "les", "et", "est", "une", "des"],
    "es": ["el", "la", "los", "y", "es", "una", "de"],
    "pt": ["o", "a", "os", "e", "um", "uma", "nao"],
}
_LANG_ORDER = ["en", "de", "fr", "es", "pt"]


def _hits(text: Column, words: list[str]) -> Column:
    toks = F.split(F.lower(text), r"\s+")
    return F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))


def lang_id(text: Column) -> Column:
    """Predicted language: most distinct marker-word hits; ties resolve in
    fixed order en>de>fr>es>pt; zero hits ⇒ 'und' (undetermined).

    BOUND EVALUATION (r8, same trick as shingles_expr): the token array is
    bound once as a lambda variable, so the split(lower(text)) runs ONCE
    per row instead of once per marker-list reference (the hits feed both
    greatest() and every CASE arm — ~10 references). Measured ~2x on the
    lang-filter scans; decision logic and results unchanged."""
    def from_toks(toks: Column) -> Column:
        hits = {
            l: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in ws])))
            for l, ws in LANG_MARKERS.items()
        }
        best = F.greatest(*[hits[l] for l in _LANG_ORDER])
        expr = F.lit("und")
        for l in reversed(_LANG_ORDER):
            expr = F.when((best > 0) & (hits[l] == best), F.lit(l)).otherwise(expr)
        return expr

    return F.get(F.transform(F.array(F.split(F.lower(text), r"\s+")), from_toks), 0)


def sql_lang_id(text_expr: str) -> str:
    toks = f"regexp_split_to_array(lower({text_expr}), '\\s+')"
    hits = {
        l: f"len(list_intersect({toks}, {_sql_list(ws)}))" for l, ws in LANG_MARKERS.items()
    }
    best = "greatest(" + ", ".join(hits[l] for l in _LANG_ORDER) + ")"
    case = "CASE "
    for l in _LANG_ORDER:
        case += f"WHEN {best} > 0 AND {hits[l]} = {best} THEN '{l}' "
    case += "ELSE 'und' END"
    return case


def _sql_list(words: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


# ------------------------------------------------- Gopher/C4 structural rules --
# Each rule is a pure JVM column expression with an arithmetic-identical
# DuckDB twin (ints are exact doubles, so ratio parity is bit-exact).
GOPHER_STOP_WORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def symbol_count(text: Column) -> Column:
    """Gopher symbol count: '#' occurrences + '...' occurrences (the
    symbol-to-word-ratio numerator)."""
    n_hash = F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    n_ell = (F.length(text) - F.length(F.replace(text, F.lit("..."), F.lit("")))) / F.lit(3.0)
    return n_hash.cast("double") + n_ell


def sql_symbol_count(t: str) -> str:
    return (
        f"(length({t}) - length(replace({t}, '#', '')))::DOUBLE"
        f" + (length({t}) - length(replace({t}, '...', ''))) / 3.0"
    )


def _lines(text: Column) -> Column:
    return F.split(text, "\n")


_SQL_LINES = "string_split({t}, chr(10))"


def bullet_line_frac(text: Column) -> Column:
    """Fraction of lines starting with a bullet marker ('- ', '* ', '• ')."""
    lines = _lines(text)
    bullets = F.filter(
        lines,
        lambda l: F.ltrim(l).startswith("- ")
        | F.ltrim(l).startswith("* ")
        | F.ltrim(l).startswith("• "),
    )
    return F.size(bullets).cast("double") / F.size(lines).cast("double")


def sql_bullet_line_frac(t: str) -> str:
    ls = _SQL_LINES.format(t=t)
    return (
        f"len(list_filter({ls}, l -> ltrim(l) LIKE '- %' OR ltrim(l) LIKE '* %' "
        f"OR ltrim(l) LIKE '• %'))::DOUBLE / len({ls})::DOUBLE"
    )


def ellipsis_line_frac(text: Column) -> Column:
    """Fraction of lines ending in an ellipsis ('...' or '…')."""
    lines = _lines(text)
    ell = F.filter(
        lines, lambda l: F.rtrim(l).endswith("...") | F.rtrim(l).endswith("…")
    )
    return F.size(ell).cast("double") / F.size(lines).cast("double")


def sql_ellipsis_line_frac(t: str) -> str:
    ls = _SQL_LINES.format(t=t)
    return (
        f"len(list_filter({ls}, l -> rtrim(l) LIKE '%...' OR rtrim(l) LIKE '%…'"
        f"))::DOUBLE / len({ls})::DOUBLE"
    )


def dup_line_frac(text: Column) -> Column:
    """1 − distinct/total lines: the duplicate-line (boilerplate) fraction."""
    lines = _lines(text)
    return F.lit(1.0) - F.size(F.array_distinct(lines)).cast("double") / F.size(
        lines
    ).cast("double")


def sql_dup_line_frac(t: str) -> str:
    ls = _SQL_LINES.format(t=t)
    return f"1.0 - len(list_distinct({ls}))::DOUBLE / len({ls})::DOUBLE"


def stop_word_hits(text: Column) -> Column:
    """Distinct Gopher stop words present (the 'has ≥2 stop words' rule)."""
    return _hits(text, GOPHER_STOP_WORDS).cast("long")


def sql_stop_word_hits(t: str) -> str:
    toks = f"regexp_split_to_array(lower({t}), '\\s+')"
    return f"len(list_intersect({toks}, {_sql_list(GOPHER_STOP_WORDS)}))::BIGINT"


# ----------------------------------------------------------------- fingerprint --
def doc_fingerprint(text: Column) -> Column:
    """Whitespace-normalized md5 document fingerprint (exact-dedup key)."""
    return F.md5(F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "))


def sql_doc_fingerprint(text_expr: str) -> str:
    return f"md5(regexp_replace(lower(trim({text_expr})), '\\s+', ' ', 'g'))"


# ------------------------------------------------------- unigram LM score --
def unigram_logprob_df(docs, id_col: str = "doc_id", text_col: str = "text"):
    """Corpus-unigram language-model score per document — the CCNet
    perplexity-filter shape with the KenLM n-gram model replaced by the
    corpus's OWN unigram distribution (the honest in-env stand-in: no
    external LM, same plan skeleton — score every doc against a model
    table, rank, filter the tail):

        logp(doc) = mean over its words of ln(count(word) / total_words)

    Boilerplate-heavy and ultra-common-word docs score HIGH (typical),
    rare-garble docs score LOW — CCNet keeps the middle. Returns
    (doc_id, n_words, avg_logp).

    Plan: one groupBy(word) builds the model (map-side combined), one
    equi-join scores tokens against it (the model table is
    vocabulary-sized — broadcastable for natural language), one
    groupBy(doc) averages. At 100 TB the model is built once and REUSED
    across scoring runs — persist it as a SnapshotTable and skip stage 1;
    the scoring join is the only data-proportional stage."""
    w = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("word"),
    )
    freq = w.groupBy("word").agg(F.count("*").alias("c"))
    total = freq.agg(F.sum("c").cast("double").alias("t"))
    scored = (
        w.join(freq, "word")
        .crossJoin(F.broadcast(total))  # 1-row aggregate: the repo contract
        .select("doc_id", F.log(F.col("c") / F.col("t")).alias("lp"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.count("*").alias("n_words"), F.avg("lp").alias("avg_logp"))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------- link extraction --
# <a ... href="...">anchor — no lookaround/backreferences (Java and RE2
# both run it, keeping a future DuckDB twin possible). The anchor is the
# text up to the first '<' after the opening tag; requiring a literal
# </a> would silently drop links whose anchor starts with nested markup
# (<a href=x><b>bold</b></a>), which real crawls are full of.
_HREF_RE = r"""<a\s[^>]*href=["']([^"'<>]*)["'][^>]*>([^<]*)"""


def extract_links(html: Column) -> Column:
    """array<struct<href, anchor>> of <a href> links from raw html text —
    the crawl-side input to link-graph construction (doc_link_edges is
    the synthetic stand-in; real pipelines extract from bytes). Pure JVM
    regexp (whole-stage codegen, zero Python): two regexp_extract_all
    passes over the same pattern zipped together. Anchors are the
    immediate text content only (nested markup inside <a> yields an
    empty anchor — stated convention, malformed html yields no match,
    never an error)."""
    s = html.cast("string")
    hrefs = F.regexp_extract_all(s, F.lit(_HREF_RE), 1)
    anchors = F.regexp_extract_all(s, F.lit(_HREF_RE), 2)
    return F.arrays_zip(hrefs.alias("href"), anchors.alias("anchor"))


def resolve_href(href: Column, base_url: Column) -> Column:
    """Minimal RFC-3986-ish resolution for crawl link graphs: absolute
    URLs pass through; protocol-relative (//h/p) adopt the base scheme;
    root-relative (/p) adopt scheme://host; anything else (relative
    paths, fragments, javascript:, mailto:) resolves to NULL — the
    conservative 'only follow what we can canonicalize' crawl rule.
    Composes with url.url_canonicalize downstream."""
    from erased_cells_spark.functions.url import url_host, url_scheme

    scheme = url_scheme(base_url)
    host = url_host(base_url)
    return (
        F.when(href.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*://"), href)
        .when(href.startswith("//"), F.concat(scheme, F.lit(":"), href))
        .when(href.startswith("/"), F.concat(scheme, F.lit("://"), host, href))
        .otherwise(F.lit(None).cast("string"))
    )


def link_edges(pages: DataFrame, url_col: str = "url", html_col: str = "html") -> DataFrame:
    """(src, dst, anchor) crawl link edges: extract -> resolve -> drop
    unresolvable -> drop self-loops. Feeds pagerank/hits/components
    directly. One explode; everything whole-stage codegen."""
    link = F.explode(extract_links(F.col(html_col))).alias("l")
    raw = pages.select(F.col(url_col).alias("src"), link)
    return (
        raw.select(
            "src",
            resolve_href(F.col("l.href"), F.col("src")).alias("dst"),
            F.col("l.anchor").alias("anchor"),
        )
        .filter(F.col("dst").isNotNull())
        .filter(F.col("dst") != F.col("src"))
    )
