"""Pure-Python sequential parity oracle (SURVEY.md §5.1).

Faithful reimplementation of the reference crawler's control flow —
``crawler_podcasts.py:36-91`` (pagination loop), ``handler/
apple_podcast_api.py:16-62`` (fetch+parse), ``handler/google_api.py:
68-95`` (seed dedupe+insert) — minus sleeps and network: "fetching" a
URL is a dict lookup into the same synthetic ``pages`` corpus the Spark
engine joins against.  Pytest compares the engine's output to this
oracle: extracted bytes per url, crawl ordering (the O1 total order
``(seed_index, offset, array_pos)``), and the final URL-seen set.
"""

from __future__ import annotations

from dataclasses import dataclass, field
import json

from .serde import (
    normalize_fetch_url,
    offset_of,
    parse_page,
    parse_user_id_from_show_url,
    serialize_records,
)


@dataclass
class CrawlResult:
    # one row per extracted episode, in exact reference emission order
    emissions: list[dict] = field(default_factory=list)  # keys: seed_index, offset, pos, record
    fetch_log: list[tuple[int, str, bool]] = field(default_factory=list)  # (seed_index, url, hit)
    flushes: list[str] = field(default_factory=list)  # serialized JSON batches


def fetch(pages: dict[str, bytes], url: str) -> tuple[str, list[dict]]:
    """``ApplePodcastsHandler`` minus HTTP: miss or bad JSON -> ("", []).

    (Reference: assert status==200 / resp.json() raise -> except ->
    finally returns the empty pair, apple_podcast_api.py:41-62.)
    """
    try:
        body = pages[url]
        resp = json.loads(body.decode("utf-8"))
        if not isinstance(resp, dict):
            raise ValueError("non-object response")
        return parse_page(url, resp)
    except Exception:
        return "", []


def crawl(seeds: list[str], pages: dict[str, bytes], output_count: int = 1000) -> CrawlResult:
    """Sequential crawl of every seed (``main_apple_podcast`` +
    ``single_apple_podcast`` semantics, crawler_podcasts.py:9-91)."""
    out = CrawlResult()
    for seed_index, seed in enumerate(seeds):
        search_url = seed
        buffer: list[dict] = []
        while True:
            fetch_url = normalize_fetch_url(search_url)
            next_url, records = fetch(pages, fetch_url)
            out.fetch_log.append((seed_index, fetch_url, fetch_url in pages))
            offset = offset_of(fetch_url)
            for pos, rec in enumerate(records):
                out.emissions.append(
                    {"seed_index": seed_index, "offset": offset, "pos": pos, "record": rec}
                )
            if records:
                buffer += records
                if len(buffer) >= output_count:
                    out.flushes.append(serialize_records(buffer))
                    buffer = []
            search_url = next_url
            if next_url == "":
                break
        out.flushes.append(serialize_records(buffer))
    return out


def save_urls_to_db(
    seen_rows: list[tuple[str, str]], url_list: list[str]
) -> list[tuple[str, str]]:
    """``SaveUrlsToDb`` sequential OR-dedupe (google_api.py:68-95).

    ``seen_rows`` is the persisted ``web_search_info`` state as
    ``(result_url, apple_podcast_user_id)`` tuples.  A candidate is
    skipped iff ANY existing row (including rows inserted earlier in
    this batch) matches on url OR on user_id — note the quirk that an
    empty-string user_id matches every other empty-string row.
    Returns the rows inserted by this batch, in insertion order.
    """
    seen_urls = {u for u, _ in seen_rows}
    seen_uids = {d for _, d in seen_rows}
    inserted: list[tuple[str, str]] = []
    for url in url_list:
        uid = parse_user_id_from_show_url(url)
        if url in seen_urls or uid in seen_uids:
            continue
        inserted.append((url, uid))
        seen_urls.add(url)
        seen_uids.add(uid)
    return inserted
