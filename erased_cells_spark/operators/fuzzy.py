"""Fuzzy string matching: edit-distance-1 self-join via DELETION
NEIGHBORHOODS (the SymSpell indexing idea) — the exact scalable form of
"find all near-identical strings" (URL/title/entity dedup), where the
naive plan is an O(n^2) Levenshtein cross join.

Completeness (distance <= 1, classic): for strings a, b with
lev(a, b) <= 1, the variant sets V(s) = {s} ∪ {s minus one char}
intersect —
  equal:        share s itself;
  deletion:     b = a minus a char  ->  b ∈ V(a) and b ∈ V(b);
  insertion:    symmetric;
  substitution at position i: deleting position i from both yields the
                same string, in both deletion sets.
So an equi-join on exploded variants finds every qualifying pair; a
final exact levenshtein(a, b) <= 1 filter removes the collisions the
neighborhood over-generates (e.g. 'ab'/'ba' share deletion 'a' at
distance 2). Everything is JVM string expressions + one equi-join —
no Python, no cross join; the blowup factor is len(s)+1 variants per
string, and candidates are DISTINCT pairs before the verify.

Scale: variant index size is sum(len+1) rows of (variant, id) — linear;
the join is hash-partitioned on the variant. Hot variants (very short
strings) behave like hot LSH buckets — same guard story if a corpus of
1-char strings ever shows up; typical keys (urls, titles, 8+ chars) are
fine. Distance k > 1 composes by recursing deletions k times (not
implemented: k=1 covers the dedup-adjacent use and keeps the index
linear)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _variants(col: str):
    """array: the string itself (i=0) plus every single-char deletion."""
    return F.expr(
        f"transform(sequence(0, length({col})), i -> CASE WHEN i = 0 THEN {col} "
        f"ELSE concat(substring({col}, 1, i - 1), substring({col}, i + 1, length({col}))) "
        f"END)"
    )


def edit1_pairs(strings: DataFrame, id_col: str = "id", str_col: str = "s") -> DataFrame:
    """All unordered pairs (id_a < id_b) with levenshtein <= 1 between
    their strings (0 = exact duplicate included). Returns
    (id_a, id_b, dist)."""
    v = strings.select(
        F.col(id_col).alias("id"), F.col(str_col).alias("s"),
        F.explode(_variants(str_col)).alias("var"),
    ).distinct()  # a string can produce the same variant twice (e.g. 'aa')
    a = v.select(F.col("id").alias("id_a"), F.col("s").alias("s_a"), "var")
    b = v.select(F.col("id").alias("id_b"), F.col("s").alias("s_b"), "var")
    cand = (
        a.join(b, ["var"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "s_a", "s_b")
        .distinct()
    )
    return (
        cand.withColumn("dist", F.levenshtein("s_a", "s_b"))
        .filter(F.col("dist") <= 1)
        .select("id_a", "id_b", F.col("dist").cast("long").alias("dist"))
    )
