"""Canonical parse/serialize contract shared by engine, datagen and oracle.

The reference crawler's extraction contract is pinned here in ONE place
so the Spark engine, the synthetic corpus generator and the pure-Python
parity oracle all agree byte-for-byte:

- field mapping:   /root/reference/handler/apple_podcast_api.py:119-127
- composite id:    ``"Podcast_%s_%s" % (user_id, data["id"])``  (:120)
- user-id parse:   apple_podcast_api.py:131-135 (API url),
                   google_api.py:106-116 (show url)
- next-cursor:     apple_podcast_api.py:74-83 (missing / non-str -> "")
                   + absolutization quirk :56-57 (applies to "" too, so a
                   terminated chain re-fetches the bare API base once)
- first-request params: apple_podcast_api.py:26-30 (l=en-US, offset=10)
- serialization:   ``json.dumps(..., indent=4, ensure_ascii=False)``
                   (utils/file.py:22)
"""

from __future__ import annotations

import json
from typing import Any
from urllib.parse import parse_qs, urlparse

API_BASE = "https://amp-api.podcasts.apple.com"

EPISODE_FIELDS = (
    "id",
    "title",
    "full_url",
    "author",
    "duration",
    "categories",
    "asset_url",
)


def parse_user_id_from_api_url(url: str) -> str:
    """Reference ``ApplePod.GetUserId`` (apple_podcast_api.py:131-135)."""
    sub = url.rsplit("podcasts/")[1]
    return sub.rsplit("/episodes")[0]


def parse_user_id_from_show_url(url: str) -> str:
    """Reference ``ParseApplePodcastUserId`` (google_api.py:106-116).

    ``.../id1220985045 -> "1220985045"``; non-digit tail -> ``""``.
    """
    user_id = url.rsplit("/id")[-1]
    return user_id if user_id.isdigit() else ""


def parse_episode_record(user_id: str, data: dict[str, Any]) -> dict[str, Any]:
    """Reference ``ParseApiSingleData`` (apple_podcast_api.py:104-129)."""
    attrs = data["attributes"]
    return {
        "id": "Podcast_%s_%s" % (user_id, data["id"]),
        "title": attrs["itunesTitle"],
        "full_url": attrs["url"],
        "author": attrs["artistName"],
        "duration": attrs["durationInMilliseconds"],
        "categories": attrs["genreNames"],
        "asset_url": attrs["assetUrl"],
    }


def parse_page(fetch_url: str, resp: dict[str, Any]) -> tuple[str, list[dict]]:
    """Reference handler body semantics (apple_podcast_api.py:39-62).

    Returns ``(next_url, records)`` where ``next_url`` is already
    absolutized.  Quirks reproduced exactly:

    - missing/non-``str`` ``next`` -> ``""`` -> absolutized to the bare
      ``API_BASE`` (the chain then dies on the next, missing, fetch);
    - missing ``data`` key -> ``[]`` but the chain continues;
    - a malformed item aborts the remaining items of the page but keeps
      the ones already parsed (``ParseApiData``'s try/finally,
      apple_podcast_api.py:94-101).
    """
    user_id = parse_user_id_from_api_url(fetch_url.split("?")[0])

    nxt = resp.get("next", "")
    if not isinstance(nxt, str):
        nxt = ""

    records: list[dict] = []
    if "data" in resp:
        try:
            for item in resp["data"]:
                records.append(parse_episode_record(user_id, item))
        except Exception:
            pass  # keep partial list, as the reference does

    if not nxt.startswith("http"):
        nxt = API_BASE + nxt
    return nxt, records


def normalize_fetch_url(url: str) -> str:
    """The URL actually requested for a frontier entry.

    Reference flow: ``crawler_podcasts.py:48-52`` strips the query and
    re-sends it as params; empty params default to ``l=en-US&offset=10``
    (apple_podcast_api.py:26-30); requests re-encodes in insertion
    order.  Only ``l``/``offset`` are carried (our corpus never uses
    other params).
    """
    base = url.split("?")[0]
    qs = parse_qs(urlparse(url).query)
    lang = qs.get("l", ["en-US"])[0]
    offset = qs.get("offset", ["10"])[0]
    return f"{base}?l={lang}&offset={offset}"


def offset_of(url: str) -> int:
    """Ordering-parity helper: the ``offset`` param of a fetch url."""
    qs = parse_qs(urlparse(url).query)
    try:
        return int(qs.get("offset", ["10"])[0])
    except ValueError:
        return -1


def serialize_records(records: list[dict]) -> str:
    """Byte-identical to the reference's JSON flush (utils/file.py:22)."""
    return json.dumps(records, indent=4, ensure_ascii=False)
