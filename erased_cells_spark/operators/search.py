"""BM25 keyword search over the documents table — the scoring/retrieval op a
training-data curation pipeline uses to FIND data (topic filters, quality
probes, eval-set mining).

Spark-first shape: one explode → per-(doc, term) tf with map-side combine;
document frequencies are a tiny per-term aggregate joined back by broadcast;
the score is a pure JVM expression (log/arithmetic only — no Python, no
UDF). At 100 TB: the explode+combine is the same shuffle profile as word
count; the query-term filter prunes the explode output to |terms| rows per
doc before anything wide happens."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_scores(
    docs: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """(doc_id, score) for every document matching ≥1 query term.
    idf = ln((N - df + 0.5) / (df + 0.5) + 1) (the Lucene/BM25+ form —
    always positive); tf normalization uses whitespace token counts."""
    words = docs.select(
        F.col(id_col).alias("id"),
        F.size(F.split(F.col(text_col), " ")).alias("dl"),
        F.explode(F.split(F.col(text_col), " ")).alias("w"),
    )
    # corpus stats as a broadcast 1-row relation instead of a BLOCKING
    # driver collect (r8, guide §5): the stats scan still happens, but it
    # rides the same Spark job as the scoring plan instead of serializing
    # a separate action before it; n/avgdl enter the arithmetic as columns
    # holding the identical double values the literals held
    stats_df = docs.select(
        F.count("*").cast("double").alias("__n"),
        F.avg(F.size(F.split(F.col(text_col), " "))).alias("__avgdl"),
    )
    hits = words.filter(F.col("w").isin(terms))
    tf = hits.groupBy("id", "dl", "w").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("w").agg(F.countDistinct("id").alias("df"))
    scored = (
        tf.join(F.broadcast(df_), "w")
        .crossJoin(F.broadcast(stats_df))
        .withColumn(
            "idf",
            F.log((F.col("__n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0),
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("__avgdl"))),
        )
    )
    return (
        scored.groupBy("id")
        .agg(F.sum("term_score").alias("score"))
        .select(F.col("id").alias(id_col), "score")
    )


def bm25_sql(terms: list[str], k1: float = BM25_K1, b: float = BM25_B) -> str:
    """DuckDB twin of bm25_scores over the `documents` view — identical
    arithmetic (ln, same idf form, same whitespace token counts). Terms are
    SQL-escaped ('' doubling) so a quote inside a term can't break the
    generated oracle."""
    tlist = ", ".join("'{}'".format(t.replace("'", "''")) for t in terms)
    return f"""
WITH words AS (
  SELECT doc_id AS id, len(string_split(text, ' ')) AS dl,
         unnest(string_split(text, ' ')) AS w
  FROM documents
),
stats AS (
  SELECT count(*) AS n, avg(len(string_split(text, ' '))) AS avgdl FROM documents
),
tf AS (
  SELECT id, dl, w, count(*) AS tf FROM words WHERE w IN ({tlist}) GROUP BY 1, 2, 3
),
idf AS (
  SELECT w, ln((s.n - count(DISTINCT id) + 0.5) / (count(DISTINCT id) + 0.5) + 1.0) AS idf
  FROM tf, stats s GROUP BY w, s.n
),
scored AS (
  SELECT t.id,
         i.idf * (t.tf * ({k1} + 1)) /
         (t.tf + {k1} * (1 - {b} + {b} * t.dl / s.avgdl)) AS term_score
  FROM tf t JOIN idf i ON t.w = i.w CROSS JOIN stats s
)
SELECT id AS doc_id, sum(term_score) AS score FROM scored GROUP BY id
"""


def positional_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Positional inverted-index postings (term, doc_id, pos) — the index
    shape behind phrase/proximity search: BM25 above needs only term
    frequencies, but "merge AS A PHRASE" needs positions. One posexplode
    (0-based pos), same shuffle profile as word count; persist as a
    bucketed-by-term table at corpus scale and phrase queries never touch
    the raw text again."""
    return docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "term"),
    )


def phrase_occurrences(
    docs: DataFrame,
    phrase: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_hits) — exact occurrence counts of the token-sequence
    `phrase` (whitespace tokenization, same convention as the shingle
    family). Plan: the first term's postings equi-join each subsequent
    term's postings at (doc, pos+i) — every side is TERM-FILTERED before
    joining, so the join inputs are the phrase terms' posting lists, not
    the corpus (the classic positional-intersection query plan). k-1
    equi-joins for a k-word phrase, all sharing the doc+pos key space;
    exact integer counts, overlapping matches counted (each start
    position independently)."""
    words = phrase.split(" ")
    if not words or any(not w for w in words):
        raise ValueError("phrase must be non-empty whitespace-separated tokens")
    post = positional_postings(docs, id_col=id_col, text_col=text_col)
    base = post.filter(F.col("term") == words[0]).select(
        F.col(id_col), F.col("pos").alias("p0")
    )
    for i, wd in enumerate(words[1:], 1):
        nxt = post.filter(F.col("term") == wd).select(
            F.col(id_col), (F.col("pos") - i).alias("p0")
        )
        base = base.join(nxt, [id_col, "p0"])
    return base.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_hits"))
