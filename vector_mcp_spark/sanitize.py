"""Content/metadata sanitization — SURVEY.md §2.2 T3/T4.

Replicates the reference's observable redaction behavior
(``vector_mcp/vector_api.py:40-46,284-301``):

- filesystem-path shaped substrings → ``[REDACTED_PATH]``;
- PII (email addresses; long digit runs shaped like phone numbers) redacted;
- metadata keys matching
  ``(file|filename|filepath|path|directory|dirname|uri|url|source)``
  (case-insensitive) dropped entirely (``vector_api.py:40-43,289-293``).

All of it is JVM-side: chained ``regexp_replace`` + ``map_filter`` — no
Python UDF, so sanitization rides inside whole-stage codegen at ingest scan
speed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# vector_api.py:40-43 — the reference matches these words as
# underscore-delimited components ANYWHERE in the key (re.search), so
# file_path / source_url / my_path are all dropped. Used unanchored (rlike).
PRIVATE_METADATA_KEY_PATTERN = (
    r"(?i)(?:^|_)(?:file|filename|filepath|path|directory|dirname|uri|url|source)(?:$|_)"
)

# Unix-style absolute path with at least two segments (vector_api.py:44-46 shape)
PATH_PATTERN = r"(?:/[A-Za-z0-9._-]+){2,}/?"
# Windows drive-letter (C:\... or C:/...) and UNC (\\host\share...) paths
# (vector_api.py:44-46 _LOCAL_PATH). The reference guards with a lookbehind
# (?<![\w:]) so "http://x" isn't treated as drive "p:/"; RE2 (the DuckDB
# oracle engine) has no lookbehind, so the guard is a captured prefix group
# restored in the replacement — identical behavior, portable to both engines.
WIN_PATH_PATTERN = r"(^|[^\w:])((?:[A-Za-z]:[\\/]|\\\\[^\s\\]+\\)[^\s<>\"']+)"
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\+?\d[\d ()-]{7,}\d"

REDACTED_PATH = "[REDACTED_PATH]"
REDACTED_PII = "[REDACTED]"


def sanitize_text_col(col: Column) -> Column:
    col = F.regexp_replace(col, EMAIL_PATTERN, REDACTED_PII)
    # windows before unix: C:/a/b must not leave "C:" + redacted unix tail
    col = F.regexp_replace(col, WIN_PATH_PATTERN, "$1" + REDACTED_PATH)
    col = F.regexp_replace(col, PATH_PATTERN, REDACTED_PATH)
    col = F.regexp_replace(col, PHONE_PATTERN, REDACTED_PII)
    return col


def sanitize_content_col(col: Column) -> Column:
    return sanitize_text_col(col)


def sanitize_metadata_col(col: Column) -> Column:
    """Drop private keys, then sanitize remaining values
    (sanitizer recurses over metadata in ``vector_api.py:287-298``)."""
    kept = F.map_filter(col, lambda k, v: ~k.rlike(PRIVATE_METADATA_KEY_PATTERN))
    keys = F.map_keys(kept)
    vals = F.transform(F.map_values(kept), sanitize_text_col)
    return F.when(col.isNull(), F.lit(None).cast("map<string,string>")).otherwise(
        F.map_from_arrays(keys, vals)
    )


def sanitize_text_py(text: str) -> str:
    """Driver-side twin for query strings (``vector_api.py:548``)."""
    import re

    text = re.sub(EMAIL_PATTERN, REDACTED_PII, text)
    text = re.sub(WIN_PATH_PATTERN, r"\g<1>" + REDACTED_PATH, text)
    text = re.sub(PATH_PATTERN, REDACTED_PATH, text)
    text = re.sub(PHONE_PATTERN, REDACTED_PII, text)
    return text


def sanitize_metadata_py(meta) -> dict | None:
    """Driver-side twin of ``sanitize_metadata_col`` for bounded ingest
    batches: drop private keys, sanitize remaining values."""
    import re

    if meta is None:
        return None
    return {
        k: sanitize_text_py(v)
        for k, v in meta.items()
        if not re.search(PRIVATE_METADATA_KEY_PATTERN, k)
    }
