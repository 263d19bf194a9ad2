"""Content-type + charset sniffing over raw fetched bytes.

The input table carries ``html:binary`` — raw response bodies.  A
Common-Crawl-style corpus routinely mislabels them (gzip served as
text/html, RSS as text/plain, audio behind an .html URL), and the
reference never has to care because it only fetches one JSON API
(``/root/reference/handler/apple_podcast_api.py:48`` asserts 200 and
parses JSON unconditionally).  At corpus scale the router that decides
"parse as HTML / parse as feed XML / hand to the media pipeline /
decompress first" has to come from the BYTES, WHATWG-sniffing style,
not from headers.

Everything is whole-stage-codegen Column arithmetic: magic numbers
compare a ``hex(substring(blob))`` prefix against literals, the
HTML/XML token scan and the ``<meta charset>`` regex run over a
latin-1-decoded bounded prefix (latin-1 maps every byte, so the decode
can never throw under ANSI), and charset resolution is BOM-first then
meta.  Zero shuffle, zero Python — a narrow map over 10^10 blobs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# bytes of prefix examined for the token scan / meta charset (WHATWG
# uses 1445 for sniffing; meta is required to appear in the first 1024)
SNIFF_PREFIX = 1445

_MAGIC = (
    # (hex prefix, mime) — first match wins, longest patterns first
    ("89504E470D0A1A0A", "image/png"),
    ("474946383761", "image/gif"),
    ("474946383961", "image/gif"),
    ("52494646", "riff"),  # refined to wav/avi below
    ("255044462D", "application/pdf"),
    ("FFD8FF", "image/jpeg"),
    ("494433", "audio/mpeg"),
    ("FFFB", "audio/mpeg"),
    ("1F8B", "application/gzip"),
    ("504B0304", "application/zip"),
)


def _hexpfx(blob: Column, nbytes: int) -> Column:
    return F.hex(F.substring(blob, 1, nbytes))


def sniff_mime(blob: Column) -> Column:
    """Byte-sniffed MIME: magic numbers, then an HTML/XML token scan
    on the (BOM-stripped, whitespace-trimmed) text prefix, else
    ``text/plain``."""
    out = None
    riff_kind = F.when(
        F.hex(F.substring(blob, 9, 4)) == F.lit("57415645"), F.lit("audio/wav")
    ).otherwise(F.lit("application/octet-stream"))
    for hexpat, mime in _MAGIC:
        hit = _hexpfx(blob, len(hexpat) // 2) == F.lit(hexpat)
        val = riff_kind if mime == "riff" else F.lit(mime)
        out = F.when(hit, val) if out is None else out.when(hit, val)
    # WHATWG skips \t \n \r \f and space before the token scan;
    # ltrim would only drop spaces
    text = F.lower(F.regexp_replace(_text_prefix(blob), r"^\s+", ""))
    return out.otherwise(
        F.when(
            text.startswith("<!doctype html") | text.startswith("<html"),
            F.lit("text/html"),
        )
        .when(text.startswith("<?xml"), F.lit("application/xml"))
        .otherwise(F.lit("text/plain"))
    )


def _text_prefix(blob: Column) -> Column:
    """First SNIFF_PREFIX bytes as text, BOM dropped.  latin-1 decodes
    every byte sequence, so this is total (never raises)."""
    pfx = F.substring(blob, 1, SNIFF_PREFIX)
    no_bom = (
        F.when(_hexpfx(blob, 3) == "EFBBBF", F.substring(pfx, 4, SNIFF_PREFIX))
        .when(_hexpfx(blob, 2).isin("FFFE", "FEFF"), F.substring(pfx, 3, SNIFF_PREFIX))
        .otherwise(pfx)
    )
    return F.decode(no_bom, "ISO-8859-1")


def sniff_charset(blob: Column) -> Column:
    """BOM first (authoritative per WHATWG), else ``<meta charset>`` /
    ``http-equiv`` ``charset=`` in the text prefix, else NULL
    (caller falls back to a detector or the corpus default)."""
    meta = F.lower(
        F.regexp_extract(
            F.lower(_text_prefix(blob)),
            r"""charset\s*=\s*["']?([a-z0-9._-]+)""",
            1,
        )
    )
    return (
        F.when(_hexpfx(blob, 3) == "EFBBBF", F.lit("utf-8"))
        .when(_hexpfx(blob, 2) == "FFFE", F.lit("utf-16le"))
        .when(_hexpfx(blob, 2) == "FEFF", F.lit("utf-16be"))
        .otherwise(F.nullif(meta, F.lit("")))
    )


def sniff_content(blob: Column) -> Column:
    """``struct<mime, charset>`` — the routing decision per blob."""
    return F.struct(
        sniff_mime(blob).alias("mime"), sniff_charset(blob).alias("charset")
    )


# ------------------------------------------------- soft-404 detection

# Error pages served with HTTP 200 — every big site has them, and an
# unfiltered crawl trains on millions of "Page Not Found" boilerplate
# documents.  Heuristics are the standard ones (title markers; body
# markers on THIN pages only, so an article *about* 404s survives).
SOFT404_RE = (
    r"(?i)(page not found|not found|error 404|404 error"
    r"|does not exist|no longer available|been removed)"
)


def soft404_reason(status: Column, html: Column, thin_bytes: int = 512) -> Column:
    """NULL for a good page; otherwise why it is a soft 404:
    ``'title'`` (title carries an error marker) or ``'thin-body'``
    (body marker AND page under ``thin_bytes`` — UTF-8 BYTES via
    ``octet_length``, so the thin cutoff means what it says on
    non-ASCII pages; the oracle replays it with DuckDB ``strlen``,
    which is also byte-counted).  Pages whose HTTP status already says
    4xx/5xx are NOT soft 404s — the status is honest — so they come
    back NULL too.  Codegen-only."""
    title = F.regexp_extract(html, r"(?i)<title>([^<]*)</title>", 1)
    title_hit = title.rlike(SOFT404_RE)
    body_hit = html.rlike(SOFT404_RE) & (F.octet_length(html) < thin_bytes)
    return F.when(
        status == 200,
        F.when(title_hit, F.lit("title")).when(body_hit, F.lit("thin-body")),
    )
