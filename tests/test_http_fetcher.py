"""Injectable-client HTTP fetcher (plans/http_fetcher.py): everything
except the socket runs for real — mapInPandas schema/batching, retry
loop, miss semantics — and the whole crawl is parity-checked against
the join fetcher on the same corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_apple_podcast_spark.plans.http_fetcher import (
    DictClient,
    FlakyClient,
    make_http_fetcher,
)
from crawler_apple_podcast_spark.plans.wave_loop import (
    WaveConfig,
    make_join_fetcher,
    run_crawl,
)


@pytest.fixture(scope="module")
def url_map(corpus_pdfs):
    pages_pdf, _ = corpus_pdfs
    return {u: bytes(h) for u, h in zip(pages_pdf.url, pages_pdf.html)}


def _wave(spark, urls, wave=0):
    return spark.createDataFrame(
        [(i, u, 1, wave) for i, u in enumerate(urls)],
        "seed_index INT, fetch_url STRING, priority INT, wave INT",
    )


def test_http_fetcher_hits_and_misses(spark, url_map):
    def factory():
        return DictClient(url_map)

    fetch = make_http_fetcher(factory)
    some = list(url_map)[:5]
    wave = _wave(spark, some + ["https://nowhere.example/missing"])
    out = fetch(wave)
    assert out.columns == ["seed_index", "fetch_url", "priority", "wave", "html"]
    rows = {r.fetch_url: r.html for r in out.collect()}
    assert len(rows) == 6
    for u in some:
        assert bytes(rows[u]) == url_map[u]
    assert rows["https://nowhere.example/missing"] is None


def test_http_fetcher_retries_retryable_status(spark, url_map):
    def flaky_factory():
        return FlakyClient(url_map, fail_times=1)

    some = list(url_map)[:4]
    out = make_http_fetcher(flaky_factory, max_retries=2)(_wave(spark, some))
    rows = {r.fetch_url: r.html for r in out.collect()}
    assert all(bytes(rows[u]) == url_map[u] for u in some)

    def dead_factory():
        return FlakyClient(url_map, fail_times=99)

    out2 = make_http_fetcher(dead_factory, max_retries=2)(_wave(spark, some))
    assert all(r.html is None for r in out2.collect())


def test_full_crawl_parity_join_vs_http_fetcher(spark, corpus, url_map):
    """The crawl driven by the HTTP fetcher (fake socket) emits exactly
    the episodes the join fetcher emits — the fetcher is genuinely
    swappable behind the wave_loop interface."""

    def factory():
        return DictClient(url_map)

    pages, seeds = corpus
    cfg = WaveConfig(use_politeness=False)
    via_join = run_crawl(spark, pages, seeds, cfg)
    via_http = run_crawl(spark, pages, seeds, cfg, fetcher=make_http_fetcher(factory))
    a = via_join.episodes.orderBy("seed_index", "offset", "pos").collect()
    b = via_http.episodes.orderBy("seed_index", "offset", "pos").collect()
    assert a == b
    assert via_join.n_waves == via_http.n_waves
