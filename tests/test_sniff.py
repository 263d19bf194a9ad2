"""Content sniffing (functions/sniff.py): magic refinement, token
scan edge cases, charset precedence, degenerate blobs."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_apple_podcast_spark.functions import sniff as SN


def _sniff(spark, blobs):
    df = spark.createDataFrame([(k, bytearray(v)) for k, v in blobs.items()],
                               "k string, blob binary")
    return {
        r.k: (r.s.mime, r.s.charset)
        for r in df.select("k", SN.sniff_content(F.col("blob")).alias("s")).collect()
    }


def test_magic_and_riff_refinement(spark):
    got = _sniff(spark, {
        "wav": b"RIFF\x24\x00\x00\x00WAVEfmt ",
        "avi": b"RIFF\x24\x00\x00\x00AVI LIST",
        "jpeg": b"\xff\xd8\xff\xe0JFIF",
        "mp3_id3": b"ID3\x04rest",
        "zip": b"PK\x03\x04payload",
    })
    assert got["wav"] == ("audio/wav", None)
    assert got["avi"] == ("application/octet-stream", None)
    assert got["jpeg"] == ("image/jpeg", None)
    assert got["mp3_id3"] == ("audio/mpeg", None)
    assert got["zip"] == ("application/zip", None)


def test_html_token_scan_tolerates_leading_whitespace_and_case(spark):
    got = _sniff(spark, {
        "ws": b"\n\t  <!DOCTYPE HTML><html>",
        "upper": b"<HTML><BODY>hi",
        "xml": b"  <?xml version='1.0'?><feed/>",
        "plain": b"podcast transcript text",
    })
    assert got["ws"][0] == "text/html"
    assert got["upper"][0] == "text/html"
    assert got["xml"][0] == "application/xml"
    assert got["plain"][0] == "text/plain"


def test_charset_precedence_bom_beats_meta(spark):
    got = _sniff(spark, {
        "bom_meta": b"\xef\xbb\xbf<html><meta charset='koi8-r'>",
        "meta_sq": b"<html><meta charset='KOI8-R'>",
        "meta_spaces": b"<html><meta charset = \"shift_jis\" >",
        "u16le": b"\xff\xfe<\x00h\x00",
        "u16be": b"\xfe\xff\x00<\x00h",
    })
    assert got["bom_meta"] == ("text/html", "utf-8")
    assert got["meta_sq"] == ("text/html", "koi8-r")
    assert got["meta_spaces"] == ("text/html", "shift_jis")
    assert got["u16le"][1] == "utf-16le"
    assert got["u16be"][1] == "utf-16be"


def test_degenerate_blobs(spark):
    got = _sniff(spark, {"empty": b"", "one": b"<", "null_bytes": b"\x00\x00\x00"})
    for k in got:
        assert got[k] == ("text/plain", None)
