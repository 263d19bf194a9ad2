"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1-2).

Generates the ``pages`` table of the BASELINE.json input_hint shape
``(url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang
STRING)`` plus the ``seeds`` table, with page payloads shaped exactly
like the reference crawler's inputs:

- episodes-API JSON pages (``{"next": ..., "data": [...]}``,
  /root/reference/handler/apple_podcast_api.py:106-117), chained by
  relative ``next`` cursors with ``offset`` += 10 starting at 10;
- show HTML pages (url shape of /root/reference/doc/web_search_info.sql);
- per-host ``robots.txt`` with a deterministic ``Crawl-delay``.

Everything derives from md5 of a ``(seed, key)`` string — no RNG state,
no network, stable under parameter changes.  The ``text`` column of an
episodes-API page is the canonical extraction byte-string (shared
serializer in ``serde.py``), which the engine must reproduce
byte-identically per url.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass
from datetime import datetime, timedelta, timezone

import pandas as pd

from ..serde import API_BASE, parse_page, serialize_records

SHOW_BASE = "https://podcasts.apple.com/us/podcast"

_WORDS = (
    "signal noise garden midnight harbor copper violet meadow ember "
    "drift lantern orchid summit quarry sable tundra velvet willow "
    "zephyr basalt cinder dynamo fable glacier hollow ivory juniper"
).split()

_GENRES = ["Comedy", "News", "Technology", "True Crime", "History", "Science"]

# Unicode-rich fragments mirroring the goldens (smart quotes, emoji,
# non-ASCII — cf. output/apple_podcast/20240523175020.json:4).
_FANCY = ["‘Racist Lapel Pin’", "café ☕", "naïve — dash", "日本語エピソード", "🎙️ live"]

_ASSET_HOST_FMT = "https://mcdn{i}.podbean.example/mf/web"


def _h(seed: int, *key: object) -> int:
    raw = ("%d:" % seed + ":".join(str(k) for k in key)).encode()
    return int.from_bytes(hashlib.md5(raw).digest()[:8], "big")


@dataclass
class CorpusParams:
    seed: int = 42
    n_shows: int = 8
    max_pages_per_show: int = 5
    episodes_per_page: int = 10
    n_asset_hosts: int = 4
    n_seeds: int | None = None  # default: all shows are seeds


def _show_id(p: CorpusParams, i: int) -> str:
    return str(1000000000 + i)


def _slug(p: CorpusParams, i: int) -> str:
    w = [_WORDS[_h(p.seed, "sw", i, j) % len(_WORDS)] for j in range(3)]
    if i % 11 == 7:
        # percent-encoded non-ASCII slug (doc/web_search_info.sql:82 shape)
        return "%D8%A8%D9%88%D8%AF%D9%83%D8%A7%D8%B3%D8%AA-" + "-".join(w)
    return "-".join(w)


def api_url(show_id: str, offset: int) -> str:
    return f"{API_BASE}/v1/catalog/us/podcasts/{show_id}/episodes?l=en-US&offset={offset}"


def _rel_next(show_id: str, offset: int) -> str:
    return f"/v1/catalog/us/podcasts/{show_id}/episodes?l=en-US&offset={offset}"


def _episode(p: CorpusParams, i: int, show_id: str, slug: str, k: int) -> dict:
    eid = str(1000000000000 + int(show_id) % 1000000 * 1000 + k)
    title_words = [_WORDS[_h(p.seed, "tw", i, k, j) % len(_WORDS)] for j in range(4)]
    title = " ".join(title_words).title()
    if _h(p.seed, "fancy", i, k) % 7 == 0:
        title += " " + _FANCY[_h(p.seed, "ff", i, k) % len(_FANCY)]
    host = _ASSET_HOST_FMT.format(i=_h(p.seed, "ah", i, k) % p.n_asset_hosts)
    return {
        "id": eid,
        "attributes": {
            "itunesTitle": title,
            "url": f"{SHOW_BASE}/{slug}/id{show_id}?i={eid}",
            "artistName": " ".join(w.upper() for w in _WORDS[i % 5 : i % 5 + 2]),
            "durationInMilliseconds": int(_h(p.seed, "dur", i, k) % 7200) * 1000,
            "genreNames": [_GENRES[_h(p.seed, "g", i, k) % len(_GENRES)]],
            "assetUrl": f"{host}/{slug}-{k}.mp3",
        },
    }


def _warc_ts(url: str) -> datetime:
    base = datetime(2024, 5, 23, tzinfo=timezone.utc)
    return base + timedelta(seconds=_h(0, "ts", url) % 86400)


def _lang(p: CorpusParams, url: str) -> str:
    if _h(p.seed, "lang", url) % 20 == 0:
        return ["fr-FR", "de-DE", "ja-JP", "ar-EG"][_h(p.seed, "l2", url) % 4]
    return "en-US"


def generate_corpus(p: CorpusParams | None = None) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Return ``(pages_pdf, seeds_pdf)`` pandas frames.

    Edge-case shows (when ``n_shows`` is large enough), exercising the
    reference's failure paths:

    - show 1: a middle page missing the ``data`` key (chain continues,
      apple_podcast_api.py:88-90);
    - show 2: a middle page with non-``str`` ``next`` (chain dies via
      the bare-base quirk, :80-82);
    - show 3: a middle page with an empty ``data`` list
      (crawler_podcasts.py:55-56).
    """
    p = p or CorpusParams()
    rows: list[dict] = []
    seeds: list[dict] = []
    hosts: set[str] = set()

    for i in range(p.n_shows):
        show_id = _show_id(p, i)
        slug = _slug(p, i)
        n_pages = 1 + _h(p.seed, "np", i) % p.max_pages_per_show

        seeds.append(
            {
                "seed_index": i,
                "url": f"{API_BASE}/v1/catalog/us/podcasts/{show_id}/episodes",
                "batch_id": "TEST_BATCH_240524_04",
            }
        )

        for pg in range(n_pages):
            offset = 10 * (pg + 1)
            url = api_url(show_id, offset)
            n_eps = p.episodes_per_page if pg < n_pages - 1 else 1 + _h(p.seed, "ne", i) % p.episodes_per_page
            payload: dict = {
                "data": [
                    _episode(p, i, show_id, slug, (offset - 10) + e) for e in range(n_eps)
                ]
            }
            if pg < n_pages - 1:
                payload["next"] = _rel_next(show_id, offset + 10)

            if i == 1 and pg == min(1, n_pages - 1):
                payload.pop("data", None)  # missing-data edge
            if i == 2 and pg == min(1, n_pages - 1) and "next" in payload:
                payload["next"] = 12345  # non-string next edge
            if i == 3 and pg == min(1, n_pages - 1):
                payload["data"] = []  # empty page edge

            html = json.dumps(payload, ensure_ascii=False).encode("utf-8")
            # canonical extraction bytes for this page (parity target)
            _, records = parse_page(url, payload)
            rows.append(
                {
                    "url": url,
                    "warc_ts": _warc_ts(url),
                    "html": html,
                    "text": serialize_records(records),
                    "lang": _lang(p, url),
                }
            )
            for ep in payload.get("data", []):
                hosts.add(ep["attributes"]["assetUrl"].split("/")[2])

        # show page
        show_url = f"{SHOW_BASE}/{slug}/id{show_id}"
        if i % 13 == 9:
            show_url += "x"  # trailing non-digit negative case for P4
        show_html = (
            f"<html><body><a href='{api_url(show_id, 10)}'>episodes</a>"
            f"<a href='https://feeds.example/{slug}.rss'>rss</a></body></html>"
        ).encode("utf-8")
        rows.append(
            {
                "url": show_url,
                "warc_ts": _warc_ts(show_url),
                "html": show_html,
                "text": slug.replace("-", " "),
                "lang": _lang(p, show_url),
            }
        )

    hosts.add("amp-api.podcasts.apple.com")
    hosts.add("podcasts.apple.com")
    for host in sorted(hosts):
        rurl = f"https://{host}/robots.txt"
        delay = [1, 5, 10][_h(p.seed, "rd", host) % 3]
        disallow = "/private" if _h(p.seed, "rdis", host) % 3 == 0 else ""
        body = f"User-agent: *\nCrawl-delay: {delay}\n"
        if disallow:
            body += f"Disallow: {disallow}\n"
        rows.append(
            {
                "url": rurl,
                "warc_ts": _warc_ts(rurl),
                "html": body.encode("utf-8"),
                "text": body,
                "lang": "en-US",
            }
        )

    pages = pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])
    seeds_pdf = pd.DataFrame(seeds, columns=["seed_index", "url", "batch_id"])
    if p.n_seeds is not None:
        seeds_pdf = seeds_pdf.head(p.n_seeds)
    return pages, seeds_pdf


def pages_schema() -> str:
    return "url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING"


def seeds_schema() -> str:
    return "seed_index INT, url STRING, batch_id STRING"


def to_spark(spark, pages_pdf: pd.DataFrame, seeds_pdf: pd.DataFrame):
    pages = spark.createDataFrame(pages_pdf, schema=pages_schema())
    seeds = spark.createDataFrame(seeds_pdf, schema=seeds_schema())
    return pages, seeds
