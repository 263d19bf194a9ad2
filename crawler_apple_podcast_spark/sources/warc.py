"""WARC record source and CDX indexing.

WARC (ISO 28500) is THE storage format of web crawls — Common Crawl
alone serves ~100 TB/month of them.  The reference crawler writes
bare JSON batches (/root/reference/utils/file.py:19-40); a web-scale
engine must instead read/index concatenated WARC records.

Spark shape: one task parses one file's blob sequentially —
distribution is ACROSS files (binaryFile source or `synth_warc_files`
below), exactly how a 100 TB WARC corpus parallelizes (files are
~1 GB, independent, and a record cannot be split without the previous
record's Content-Length, so intra-file parsing is inherently serial).
The parser runs in ``mapInPandas`` so each task holds one Arrow batch
of blobs; payloads become columns, never driver objects.  The CDX
index (URI -> file/offset/length/digest) is the standard random-access
layer built on top.

Parsing is Content-Length driven, never delimiter splitting: a payload
may legally contain ``WARC/1.0\\r\\n`` and must not break the scan.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CRLF = "\r\n"

RECORD_SCHEMA = (
    "rec_offset BIGINT, rec_length BIGINT, warc_type STRING, "
    "target_uri STRING, content_length BIGINT, payload_md5 STRING"
)


def warc_record(uri: Column, payload: Column, warc_type: str = "response") -> Column:
    """The exact record string this module writes and parses —
    ``Content-Length`` counts payload bytes (``octet_length``)."""
    return F.concat(
        F.lit("WARC/1.0" + CRLF),
        F.lit(f"WARC-Type: {warc_type}" + CRLF),
        F.lit("WARC-Target-URI: "), uri, F.lit(CRLF),
        F.lit("Content-Length: "),
        F.octet_length(payload).cast("string"),
        F.lit(CRLF + CRLF),
        payload,
        F.lit(CRLF + CRLF),
    )


def synth_warc_files(
    documents: DataFrame, n_files: int = 8, uri: Column | None = None
) -> DataFrame:
    """Deterministic WARC corpus from the ``documents`` table:
    ``(file_id BIGINT, content BINARY)``, records concatenated in
    ``doc_id`` order within ``file_id = doc_id % n_files``."""
    if uri is None:
        uri = F.concat(
            F.lit("https://h"),
            F.pmod("doc_id", F.lit(20)).cast("string"),
            F.lit(".example/p/"),
            F.col("doc_id").cast("string"),
        )
    recs = documents.select(
        F.pmod("doc_id", F.lit(n_files)).alias("file_id"),
        F.struct("doc_id", warc_record(uri, F.col("text")).alias("rec")).alias("_r"),
    )
    return recs.groupBy("file_id").agg(
        F.encode(
            F.concat_ws(
                "", F.transform(F.array_sort(F.collect_list("_r")), lambda x: x["rec"])
            ),
            "UTF-8",
        ).alias("content")
    )


def _parse_blob(blob: bytes, strict: bool) -> list[tuple]:
    out: list[tuple] = []
    magic = b"WARC/1.0\r\n"
    pos, n = 0, len(blob)
    while pos < n:
        start = pos
        if not blob.startswith(magic, pos):
            if strict:
                raise ValueError(f"bad WARC magic at offset {pos}")
            nxt = blob.find(magic, pos + 1)
            if nxt < 0:
                break
            pos = nxt
            continue
        pos += len(magic)
        headers: dict[str, str] = {}
        while True:
            eol = blob.index(b"\r\n", pos)
            line = blob[pos:eol]
            pos = eol + 2
            if not line:
                break
            k, _, v = line.partition(b":")
            headers[k.decode("utf-8").strip().lower()] = v.decode("utf-8").strip()
        clen = int(headers["content-length"])
        payload = blob[pos : pos + clen]
        pos += clen
        if blob[pos : pos + 4] != b"\r\n\r\n":
            if strict:
                raise ValueError(f"missing record trailer at offset {pos}")
        pos += 4
        out.append(
            (
                start,
                pos - start,
                headers.get("warc-type", ""),
                headers.get("warc-target-uri", ""),
                clen,
                hashlib.md5(payload).hexdigest(),
            )
        )
    return out


def parse_warc_records(
    files: DataFrame,
    id_col: str = "file_id",
    content_col: str = "content",
    id_type: str = "BIGINT",
    strict: bool = True,
) -> DataFrame:
    """Sequential Content-Length-driven record scan per file blob:
    ``(id_col, rec_offset, rec_length, warc_type, target_uri,
    content_length, payload_md5)``.

    ``strict=False`` resynchronizes on the next ``WARC/1.0`` magic
    after a malformed record instead of failing the task — the
    behavior a real crawl ingest wants for torn tails.
    """
    schema = f"{id_col} {id_type}, {RECORD_SCHEMA}"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            id_col, "rec_offset", "rec_length", "warc_type",
            "target_uri", "content_length", "payload_md5",
        ]
        for pdf in batches:
            rows = [
                (fid, *rec)
                for fid, blob in zip(pdf[id_col], pdf[content_col])
                for rec in _parse_blob(bytes(blob), strict)
            ]
            yield pd.DataFrame(rows, columns=cols)

    return files.select(id_col, content_col).mapInPandas(run, schema)


def cdx_index(records: DataFrame, id_col: str = "file_id") -> DataFrame:
    """CDX-style random-access index over parsed records."""
    return records.select(
        "target_uri", id_col, "rec_offset", "rec_length",
        "content_length", "payload_md5",
    )
