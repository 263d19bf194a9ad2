from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from crawler_apple_podcast_spark.sources.warc import (
    parse_warc_records,
    synth_warc_files,
)


def _rec(uri: str, payload: bytes, wtype: bytes = b"response") -> bytes:
    return (
        b"WARC/1.0\r\nWARC-Type: " + wtype + b"\r\n"
        b"WARC-Target-URI: " + uri.encode() + b"\r\n"
        b"Content-Length: " + str(len(payload)).encode() + b"\r\n\r\n"
        + payload + b"\r\n\r\n"
    )


def test_magic_inside_payload_not_split(spark):
    # Content-Length-driven parsing must sail straight through a
    # payload that contains the record magic.
    evil = b"xxWARC/1.0\r\nyy"
    blob = _rec("u1", evil) + _rec("u2", b"ok")
    df = spark.createDataFrame([(1, bytearray(blob))], "file_id int, content binary")
    rows = parse_warc_records(df, id_type="INT").orderBy("rec_offset").collect()
    assert [r.target_uri for r in rows] == ["u1", "u2"]
    assert rows[0].content_length == len(evil)
    assert rows[0].payload_md5 == hashlib.md5(evil).hexdigest()
    assert rows[1].rec_offset == rows[0].rec_length


def test_strict_raises_nonstrict_resyncs(spark):
    blob = _rec("a", b"p1") + b"GARBAGE-TORN-RECORD" + _rec("b", b"p2")
    df = spark.createDataFrame([(1, bytearray(blob))], "file_id int, content binary")
    with pytest.raises(Exception):
        parse_warc_records(df, id_type="INT", strict=True).collect()
    rows = (
        parse_warc_records(df, id_type="INT", strict=False)
        .orderBy("rec_offset")
        .collect()
    )
    assert [r.target_uri for r in rows] == ["a", "b"]
    assert rows[1].rec_offset == len(_rec("a", b"p1")) + len(b"GARBAGE-TORN-RECORD")


def test_binaryfile_roundtrip(spark, tmp_path):
    # Write real .warc files, re-read via the binaryFile source, parse
    # with path as the id, and compare against in-memory parsing of
    # the synthesized blobs.
    docs = spark.createDataFrame(
        [(i, f"payload number {i} " * (i + 1)) for i in range(10)],
        "doc_id long, text string",
    )
    files = synth_warc_files(docs, n_files=3)
    for fid, blob in files.collect():
        (tmp_path / f"part-{fid}.warc").write_bytes(bytes(blob))
    scanned = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc")
        .load(str(tmp_path))
        .select(F.col("path").alias("file_id"), "content")
    )
    via_fs = parse_warc_records(scanned, id_type="STRING")
    direct = parse_warc_records(files)
    key = ["target_uri", "rec_offset", "rec_length", "content_length", "payload_md5"]
    assert sorted(map(tuple, via_fs.select(*key).collect())) == sorted(
        map(tuple, direct.select(*key).collect())
    )
    assert via_fs.count() == 10
