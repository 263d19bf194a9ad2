"""Minimum end-to-end slice (SURVEY.md §7.2): one wave of
frontier ⨝ pages → from_json → posexplode, byte-identical to the oracle
and to the corpus ``text`` column."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from crawler_apple_podcast_spark.functions import episodes as E
from crawler_apple_podcast_spark.functions import urls as U
from crawler_apple_podcast_spark.oracle import fetch
from crawler_apple_podcast_spark.serde import normalize_fetch_url, serialize_records


def _one_wave(pages, seeds):
    frontier = seeds.select(
        "seed_index", U.normalize_fetch_url(F.col("url")).alias("fetch_url")
    ).withColumn("wave", F.lit(0))
    fetched = frontier.join(
        pages.select(F.col("url").alias("fetch_url"), "html"), "fetch_url", "left"
    )
    return E.next_cursor(E.parse_pages(fetched))


def test_wave_records_match_oracle(corpus, corpus_pdfs):
    pages, seeds = corpus
    pages_pdf, seeds_pdf = corpus_pdfs
    page_lookup = dict(zip(pages_pdf.url, pages_pdf.html))

    parsed = _one_wave(pages, seeds)
    eps = E.extract_episodes(parsed).orderBy("seed_index", "offset", "pos")
    got = [
        (r.seed_index, r.pos, r.id, r.title, r.full_url, r.author, r.duration, list(r.categories), r.asset_url)
        for r in eps.collect()
    ]

    want = []
    for si, seed_url in enumerate(seeds_pdf.url):
        fu = normalize_fetch_url(seed_url)
        _, records = fetch(page_lookup, fu)
        for pos, rec in enumerate(records):
            want.append(
                (si, pos, rec["id"], rec["title"], rec["full_url"], rec["author"],
                 rec["duration"], rec["categories"], rec["asset_url"])
            )
    assert got == want
    assert len(got) > 0


def test_next_cursor_absolutized(corpus):
    pages, seeds = corpus
    parsed = _one_wave(pages, seeds)
    rows = parsed.select("seed_index", "fetch_ok", "next_url").collect()
    assert all(r.next_url.startswith("http") for r in rows if r.fetch_ok)


def test_parity_text_bytes(corpus):
    """Engine's serialized extraction == the corpus `text` column, per url."""
    pages, seeds = corpus
    parsed = _one_wave(pages, seeds)
    eps = E.extract_episodes(parsed)
    got = E.parity_text(eps)
    joined = got.join(pages.select("url", F.col("text").alias("want")), "url")
    bad = joined.where(F.col("text") != F.col("want"))
    assert bad.count() == 0
    assert joined.count() == got.count() > 0


def test_empty_serialization_matches():
    assert serialize_records([]) == json.dumps([], indent=4, ensure_ascii=False)
