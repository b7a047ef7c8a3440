"""Sanitization parity with the reference's _PRIVATE_METADATA / _LOCAL_PATH
(vector_mcp/vector_api.py:40-46): underscore-delimited private key components
anywhere in the key; Unix, Windows drive-letter, and UNC path redaction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_mcp_spark.sanitize import (
    PRIVATE_METADATA_KEY_PATTERN,
    sanitize_metadata_col,
    sanitize_text_col,
    sanitize_text_py,
)


def _clean(spark, text: str) -> str:
    df = spark.createDataFrame([(text,)], "t string")
    return df.select(sanitize_text_col(F.col("t")).alias("c")).collect()[0].c


@pytest.mark.parametrize(
    "text,expect_redacted,expect_kept",
    [
        ("see /private/x/y now", "[REDACTED_PATH]", "see "),
        (r"open C:\Users\bob\doc.txt please", "[REDACTED_PATH]", "open "),
        ("open C:/Users/bob/doc.txt please", "[REDACTED_PATH]", "open "),
        (r"share \\fileserver\team\q.xlsx here", "[REDACTED_PATH]", "share "),
    ],
)
def test_path_shapes_redacted(spark, text, expect_redacted, expect_kept):
    got = _clean(spark, text)
    assert expect_redacted in got and expect_kept in got
    assert got == sanitize_text_py(text)  # driver twin behaves identically


def test_url_scheme_not_drive_letter(spark):
    # "http://x/y/z" — the "p:/" tail must NOT be treated as drive p:\
    got = _clean(spark, "fetch http://example.com/a/b ok")
    assert "[REDACTED_PATH]" in got  # the /a/b unix tail still redacts
    assert got.startswith("fetch http:")
    assert got == sanitize_text_py("fetch http://example.com/a/b ok")


def test_time_literal_not_a_path(spark):
    got = _clean(spark, "meet at 5:30 and 12:45 today")
    assert got == "meet at 5:30 and 12:45 today"


@pytest.mark.parametrize(
    "key,dropped",
    [
        ("file", True),
        ("file_path", True),
        ("source_url", True),
        ("dir_path", True),
        ("my_directory", True),
        ("FILE_NAME", True),
        ("profile", False),  # 'file' not underscore-delimited
        ("resourceful", False),
        ("topic", False),
    ],
)
def test_private_metadata_key_components(spark, key, dropped):
    import re

    assert bool(re.search(PRIVATE_METADATA_KEY_PATTERN, key)) is dropped
    df = spark.createDataFrame([({key: "v", "keep_me": "w"},)], "m map<string,string>")
    got = df.select(sanitize_metadata_col(F.col("m")).alias("m")).collect()[0].m
    assert ("keep_me" in got) and (key in got) is not dropped


def test_sanitize_metadata_py_twin_matches_column(spark):
    """The driver-side metadata twin (used by the bounded-ingest fast path in
    engine.add_documents) drops and redacts exactly what the Column form does."""
    from vector_mcp_spark.sanitize import sanitize_metadata_py

    meta = {
        "file_path": "/etc/secret",
        "topic": "mail me at a@b.co or /var/log/x/y",
        "source_url": "http://x",
        "note": "call +1 (415) 555-0100 now",
    }
    df = spark.createDataFrame([(meta,)], "m map<string,string>")
    col_side = df.select(sanitize_metadata_col(F.col("m")).alias("m")).collect()[0].m
    assert sanitize_metadata_py(meta) == dict(col_side)
    assert sanitize_metadata_py(None) is None
