"""Row-level functions: geocode, text extraction, lang-id, quality scoring,
token counting, fingerprints. Everything here is either a JVM builtin Column
expression (preferred — whole-stage codegen, SQL-oracle-expressible) or an
Arrow-batched pandas UDF (only where builtins genuinely can't express it)."""

from erased_cells_spark.functions.geocode import (
    geocode_lat,
    geocode_lon,
    geocode_np,
    host_of,
)
from erased_cells_spark.functions.text import (
    doc_fingerprint,
    extract_text,
    lang_id,
    quality_score,
    token_count,
)

__all__ = [
    "host_of",
    "geocode_lon",
    "geocode_lat",
    "geocode_np",
    "extract_text",
    "lang_id",
    "quality_score",
    "token_count",
    "doc_fingerprint",
]
