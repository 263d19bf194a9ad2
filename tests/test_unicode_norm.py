"""Unicode NFC normalization: composition, idempotence, NULLs, and a
CPython-unicodedata referee over representative forms."""

from __future__ import annotations

import unicodedata

import pyspark.sql.functions as F

from crawler_apple_podcast_spark.operators import unicode_norm as UN

CASES = [
    "cafe\u0301",        # e + combining acute -> \u00e9
    "caf\u00e9",         # already NFC
    "o\u0308o\u0308",   # double diaeresis composition
    "plain ascii text",
    "",
    "\u212b",            # ANGSTROM SIGN -> \u00c5 (canonical singleton)
    "q\u0307\u0323",    # combining-mark reordering (UAX15 canonical order)
]


def test_matches_unicodedata_referee(spark):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(CASES)], "doc_id LONG, text STRING"
    )
    out = {r.doc_id: r for r in UN.normalize_nfc(df, "text").collect()}
    for i, s in enumerate(CASES):
        expect = unicodedata.normalize("NFC", s)
        assert out[i].text_nfc == expect
        assert out[i].chars_pre == len(s)
        assert out[i].chars_post == len(expect)


def test_idempotent_and_shrinks(spark):
    df = spark.createDataFrame([(0, "café naïve")], "doc_id LONG, text STRING")
    once = UN.normalize_nfc(df, "text")
    twice = UN.normalize_nfc(once.select("doc_id", F.col("text_nfc").alias("text")), "text")
    r1 = once.collect()[0]
    r2 = twice.collect()[0]
    assert r1.text_nfc == r2.text_nfc
    assert r2.chars_pre == r2.chars_post  # second pass is identity
    assert r1.chars_post < r1.chars_pre   # first pass composed something


def test_null_preserved(spark):
    df = spark.createDataFrame([(0, None)], "doc_id LONG, text STRING")
    r = UN.normalize_nfc(df, "text").collect()[0]
    assert r.text_nfc is None and r.chars_pre is None and r.chars_post is None
