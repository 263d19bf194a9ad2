from __future__ import annotations

from crawler_apple_podcast_spark.operators.reputation import host_scorecard

GOOD = "the quick brown fox jumps over a lazy dog and then the fox naps " * 3
SALAD = "zz qq xx ww vv kk jj"


def test_scorecard_signals_and_tiers(spark):
    rows = (
        [("good", f"{GOOD} variant {i}") for i in range(4)]
        + [("dupey", GOOD)] * 4
        + [("salad", f"{SALAD} {i}") for i in range(4)]
    )
    docs = spark.createDataFrame(rows, "host string, text string")
    out = {r.host: r for r in host_scorecard(docs).collect()}
    g, d, s = out["good"], out["dupey"], out["salad"]
    assert g.uniq_milli == 1000 and d.uniq_milli == 250
    assert g.en_milli == 1000 and s.en_milli == 0
    assert g.score > d.score and g.score > s.score
    assert g.tier == "keep" and s.tier == "drop"
    # score is the exact integer blend of its own row's signals
    assert g.score == (2 * g.quality_milli + g.en_milli + g.uniq_milli) // 4


def test_hashed_uniq_matches_exact_here(spark):
    rows = [("h", GOOD)] * 3 + [("h", SALAD), ("h", GOOD + "x")]
    docs = spark.createDataFrame(rows, "host string, text string")
    a = host_scorecard(docs, exact_uniq=True).collect()[0]
    b = host_scorecard(docs, exact_uniq=False).collect()[0]
    assert (a.uniq_milli, a.score, a.tier) == (b.uniq_milli, b.score, b.tier)
    assert a.uniq_milli == 600  # 3 distinct of 5


def test_page_link_signals_edges(spark):
    from crawler_apple_podcast_spark.operators.reputation import page_link_signals

    rows = [
        # pure link farm: density 1000 -> spam
        ("https://a.example/f", '<a href="/x">aaaa</a><a href="https://b.example/y">bbbb</a>'),
        # prose page, one internal link
        ("https://a.example/p", "<p>a long paragraph of visible prose text</p>" '<a href="/x">hi</a>'),
        # no links, no visible text
        ("https://a.example/e", "<div></div>"),
    ]
    df = spark.createDataFrame(rows, "page_url string, html string")
    out = {r.page_url.rsplit("/", 1)[1]: r for r in page_link_signals(df).collect()}
    farm, prose, empty = out["f"], out["p"], out["e"]
    assert farm.n_links == 2 and farm.n_external == 1
    assert farm.link_density_milli >= 880 and farm.is_linkspam
    assert farm.external_milli == 500
    assert prose.n_links == 1 and prose.n_external == 0
    assert not prose.is_linkspam
    assert (empty.n_links, empty.text_chars) == (0, 0)
    assert (empty.link_density_milli, empty.external_milli) == (-1, -1)
    assert not empty.is_linkspam
