"""Unit tests for the JVM-side URL expressions vs the reference's
string surgery (serde.py re-implements the reference exactly)."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_apple_podcast_spark.functions import urls as U
from crawler_apple_podcast_spark import serde

SHOW = "https://podcasts.apple.com/us/podcast"
API = "https://amp-api.podcasts.apple.com/v1/catalog/us/podcasts"

FIXTURE_URLS = [
    f"{SHOW}/trashfuture/id1261944206",
    f"{SHOW}/oppenheimer/id1220985045",
    # percent-encoded non-ASCII slug (doc/web_search_info.sql:82 shape)
    f"{SHOW}/%D8%A8%D9%88%D8%AF%D9%83%D8%A7%D8%B3%D8%AA/id1530599871",
    f"{SHOW}/broken/id12345x",        # trailing non-digit -> ""
    f"{SHOW}/noid/slug",              # no /id segment -> ""
    "",                                # empty
]


def _col(spark, values, expr):
    df = spark.createDataFrame([(v,) for v in values], "url STRING")
    return [r.out for r in df.select(expr(F.col("url")).alias("out")).collect()]


def test_show_user_id_matches_reference(spark):
    got = _col(spark, FIXTURE_URLS, U.show_user_id)
    want = [serde.parse_user_id_from_show_url(u) for u in FIXTURE_URLS]
    assert got == want


def test_api_user_id_matches_reference(spark):
    urls = [f"{API}/1261944206/episodes", f"{API}/918896288/episodes?l=en-US&offset=30"]
    got = _col(spark, urls, U.api_user_id)
    want = [serde.parse_user_id_from_api_url(u.split("?")[0]) for u in urls]
    assert got == want == ["1261944206", "918896288"]


def test_normalize_fetch_url_matches_reference(spark):
    urls = [
        f"{API}/1261944206/episodes",
        f"{API}/1261944206/episodes?l=en-US&offset=30",
        "https://amp-api.podcasts.apple.com",  # terminal quirk url
    ]
    got = _col(spark, urls, U.normalize_fetch_url)
    want = [serde.normalize_fetch_url(u) for u in urls]
    assert got == want
    assert got[0].endswith("?l=en-US&offset=10")


def test_offset_of(spark):
    urls = [f"{API}/1/episodes?l=en-US&offset=40", f"{API}/1/episodes?l=en-US", "x"]
    assert _col(spark, urls, U.offset_of) == [40, -1, -1]


def test_validate_and_absolutize_next(spark):
    vals = ["/v1/catalog/x?offset=20", "https://a.b/c", "12345", None]
    df = spark.createDataFrame([(v,) for v in vals], "n STRING")
    out = [
        r.out
        for r in df.select(U.absolutize_next(U.validate_next(F.col("n"))).alias("out")).collect()
    ]
    assert out == [
        "https://amp-api.podcasts.apple.com/v1/catalog/x?offset=20",
        "https://a.b/c",
        "https://amp-api.podcasts.apple.com",  # non-string-next quirk
        "https://amp-api.podcasts.apple.com",
    ]


def test_canonicalize_url(spark):
    urls = [
        "HTTPS://Example.COM:443/Path?b=2&a=1#frag",
        "http://example.com:80/x",
        "https://example.com/x?z=1",
    ]
    got = _col(spark, urls, U.canonicalize_url)
    assert got[0] == "https://example.com/Path?a=1&b=2"
    assert got[1] == "http://example.com/x"
    assert got[2] == "https://example.com/x?z=1"


def test_canonicalize_preserves_nondefault_ports(spark):
    """Non-default ports are distinct origins: they must NOT collapse
    into the portless canonical form (a collision would silently drop
    the URL from scheduling via the seen-set)."""
    urls = [
        "https://h.example:8080/a",
        "https://h.example/a",
        "http://h.example:443/a",   # 443 is NOT default for http
        "https://h.example:80/a",   # 80 is NOT default for https
        "HTTP://H.Example:80/a",    # default -> stripped
    ]
    got = _col(spark, urls, U.canonicalize_url)
    assert got[0] == "https://h.example:8080/a"
    assert got[1] == "https://h.example/a"
    assert got[2] == "http://h.example:443/a"
    assert got[3] == "https://h.example:80/a"
    assert got[4] == "http://h.example/a"
    assert len(set(got)) == 5


def test_url_hash_deterministic_and_seeded(spark):
    urls = ["https://a/1", "https://a/2"]
    h0 = _col(spark, urls, U.url_hash)
    h1 = _col(spark, urls, lambda c: U.url_hash(c, 7))
    assert h0 == _col(spark, urls, U.url_hash)
    assert h0 != h1
    assert len(set(h0)) == 2


# ------------------------------------------------ property: idempotence

from hypothesis import given, settings, strategies as st

_scheme = st.sampled_from(["http", "https", "HTTP", "HTTPS", "Http"])
_host = st.from_regex(r"[A-Za-z][A-Za-z0-9-]{0,10}(\.[A-Za-z]{2,5}){1,2}", fullmatch=True)
_port = st.sampled_from(["", ":80", ":443", ":8080", ":65535"])
_path = st.from_regex(r"(/[A-Za-z0-9._~%-]{0,8}){0,3}", fullmatch=True)
_query = st.sampled_from(["", "?b=2&a=1", "?z=", "?a=1&a=2", "?x", "?c=3&b=2&a=1"])
_frag = st.sampled_from(["", "#f", "#", "#Frag-1"])
_url_s = st.builds(
    lambda s, h, po, pa, q, f: f"{s}://{h}{po}{pa}{q}{f}",
    _scheme, _host, _port, _path, _query, _frag,
)


@settings(max_examples=10, deadline=None)
@given(st.lists(_url_s, min_size=1, max_size=40))
def test_canonicalize_idempotent_property(spark, urls):
    """canonicalize(canonicalize(u)) == canonicalize(u) for messy URL
    shapes — the seen-set invariant: a re-discovered already-canonical
    URL must map to itself or the dedupe anti-join silently misses."""
    df = spark.createDataFrame([(u,) for u in urls], "url STRING")
    c = df.select(U.canonicalize_url(F.col("url")).alias("c1"))
    cc = c.select("c1", U.canonicalize_url(F.col("c1")).alias("c2"))
    bad = cc.where(F.col("c1") != F.col("c2")).collect()
    assert bad == [], bad


def test_extract_sitemap_urls(spark):
    from crawler_apple_podcast_spark.functions.urls import extract_sitemap_urls

    rows = [
        (1, "<urlset><url><loc>https://a.example/x</loc></url>"
            "<url><loc>  https://b.example/y </loc></url></urlset>"),
        (2, "<urlset></urlset>"),                      # no entries
        (3, "<loc>relative/path</loc> junk <loc></loc>"),  # bare + empty loc
    ]
    df = spark.createDataFrame(rows, "doc_id INT, xml STRING")
    out = {r.doc_id: r.u for r in df.select("doc_id", extract_sitemap_urls(F.col("xml")).alias("u")).collect()}
    assert out[1] == ["https://a.example/x", "https://b.example/y"]
    assert out[2] == []
    assert out[3] == ["relative/path", ""]


# --------------------------------- property: sitemap round trip

from hypothesis import given, settings, strategies as st

_URLS = st.lists(
    st.text(alphabet=st.characters(blacklist_characters="<&", blacklist_categories=("Cs",)), max_size=30),
    max_size=8,
)


@settings(max_examples=12, deadline=None)
@given(_URLS)
def test_sitemap_roundtrip_property(spark, urls):
    """Arbitrary loc contents (anything but markup chars): building a
    sitemap then extracting returns exactly the space-trimmed inputs,
    in order.  (Spark trim strips ASCII spaces only — hypothesis
    found that Python str.strip also eats \x1c-\x1f, so the model
    here is strip(' '), the operator's actual contract.)"""
    from crawler_apple_podcast_spark.functions.urls import extract_sitemap_urls

    xml = "<urlset>" + "".join(f"<url><loc>{u}</loc></url>" for u in urls) + "</urlset>"
    df = spark.createDataFrame([(xml,)], "xml STRING")
    (got,) = df.select(extract_sitemap_urls(F.col("xml")).alias("u")).first()
    assert got == [u.strip(' ') for u in urls]


# ------------------------------------------------- href extract/resolve

def test_extract_hrefs_quotes_and_noise(spark):
    html = (
        '<html><a href="https://a.example/x">1</a>'
        "<a class='k' href='rel/y.html'>2</a>"
        '<a href="#frag">3</a><a href="javascript:void(0)">4</a>'
        '<a href="mailto:x@y">5</a><a href="tel:+1">6</a>'
        '<a href="/root">7</a><a name="noref">8</a></html>'
    )
    df = spark.createDataFrame([(html,)], "html string")
    got = df.select(U.extract_hrefs(F.col("html")).alias("h")).first().h
    # double-quoted pass first (document order), then single-quoted
    assert got == ["https://a.example/x", "/root", "rel/y.html"]


def test_extract_hrefs_anchored_attribute(spark):
    # ADVICE r4 defect class (canonical.py had it; extract_hrefs shared
    # it): a tag carrying only data-href must extract NOTHING — the
    # unanchored pattern greedy-backed-off into the attribute name and
    # emitted a false link.  With a real href alongside, the real one
    # wins; `=` whitespace and a leading-attribute href still match.
    html = (
        '<a data-href="/fake1">no</a>'
        '<a data-href="/fake2" href="/real">yes</a>'
        '<a href = "/spaced">yes</a>'
        "<abbr href=\"/not-an-a-tag\">no</abbr>"
        "<a data-href='/sqfake'>no</a>"
    )
    df = spark.createDataFrame([(html,)], "html string")
    got = df.select(U.extract_hrefs(F.col("html")).alias("h")).first().h
    assert got == ["/real", "/spaced"]


def test_resolve_href_fixed(spark):
    cases = [
        ("https://abs.example/p", "https://h.example/dir/page.html",
         "https://abs.example/p"),
        ("//cdn.example/c", "https://h.example/dir/page.html",
         "https://cdn.example/c"),
        ("/root/x", "https://h.example/dir/page.html",
         "https://h.example/root/x"),
        ("rel/x.html", "https://h.example/dir/page.html",
         "https://h.example/dir/rel/x.html"),
        ("rel", "https://h.example", "https://h.example/rel"),
    ]
    df = spark.createDataFrame(cases, "href string, base string, want string")
    out = df.select(
        U.resolve_href(F.col("href"), F.col("base")).alias("got"), "want"
    ).collect()
    for r in out:
        assert r.got == r.want, r


_seg = st.text(alphabet="abz", min_size=1, max_size=4)
_relpath = st.lists(_seg, min_size=1, max_size=3).map("/".join)


@settings(max_examples=25, deadline=None)
@given(
    href=st.one_of(
        _relpath,
        _relpath.map(lambda p: "/" + p),
        _relpath.map(lambda p: "//x.example/" + p),
        _relpath.map(lambda p: "https://x.example/" + p),
    ),
    base_dirs=st.lists(_seg, min_size=0, max_size=3),
)
def test_resolve_href_matches_urljoin(spark, href, base_dirs):
    """stdlib urllib.parse.urljoin as referee — restricted to paths
    without dot segments, where RFC 3986 merge == our directory
    concatenation."""
    from urllib.parse import urljoin

    base = "https://h.example/" + "/".join(base_dirs + ["page.html"])
    df = spark.createDataFrame([(href, base)], "href string, base string")
    got = df.select(U.resolve_href(F.col("href"), F.col("base")).alias("g")).first().g
    assert got == urljoin(base, href), (href, base)


def test_extract_anchors_pairs_and_filters(spark):
    from pyspark.sql import functions as F

    from crawler_apple_podcast_spark.functions import urls as U

    html = (
        '<a href="/a">first</a> txt <a class="x" href="/b" id="y">second one</a>'
        '<a href="#frag">no</a><a href="javascript:void(0)">no</a>'
        '<a href="/c"><b>nested markup drops</b></a>'
        "<a href='/sq'>single-quote style not extracted here</a>"
    )
    df = spark.createDataFrame([(html,)], "h string")
    [row] = df.select(U.extract_anchors(F.col("h")).alias("a")).collect()
    assert [(p.href, p.anchor) for p in row.a] == [
        ("/a", "first"),
        ("/b", "second one"),
    ]


def test_extract_anchors_anchored_attribute(spark):
    from pyspark.sql import functions as F

    from crawler_apple_podcast_spark.functions import urls as U

    html = (
        '<a data-href="/fake">decoy</a>'
        '<a data-href="/d" href="/real">kept</a>'
    )
    df = spark.createDataFrame([(html,)], "h string")
    [row] = df.select(U.extract_anchors(F.col("h")).alias("a")).collect()
    assert [(p.href, p.anchor) for p in row.a] == [("/real", "kept")]


def test_anchor_text_agg_dedupes_per_page(spark):
    from crawler_apple_podcast_spark.operators.graph import anchor_text_agg

    links = spark.createDataFrame(
        # p1 votes (t, "x") twice -> counts once; three anchors on t
        [("p1", "t", "x"), ("p1", "t", "x"), ("p2", "t", "x"),
         ("p1", "t", "y"), ("p2", "t", "z"), ("p3", "t", "z")],
        "page_url string, target_url string, anchor string",
    )
    rows = anchor_text_agg(links, k=2).collect()
    assert [(r.anchor, r.n_pages, r.rk) for r in sorted(rows, key=lambda r: r.rk)] == [
        ("x", 2, 1), ("z", 2, 2)  # tie on 2 -> anchor asc; y (1) cut by k=2
    ]


def test_strip_tracking_params(spark):
    from crawler_apple_podcast_spark.functions.urls import strip_tracking_params

    cases = {
        # mixed: tracking keys go, order of survivors preserved
        "https://a.ex/p?id=1&utm_source=nl&x=2&gclid=z": "https://a.ex/p?id=1&x=2",
        # all-tracking: the '?' disappears too
        "https://a.ex/p?utm_campaign=c&fbclid=f": "https://a.ex/p",
        # fragment survives in place
        "https://a.ex/p?utm_medium=m&k=v#sec": "https://a.ex/p?k=v#sec",
        # no query: untouched
        "https://a.ex/p#only-frag": "https://a.ex/p#only-frag",
        # value containing 'utm_source=' is NOT a tracking KEY
        "https://a.ex/p?next=utm_source%3Dx": "https://a.ex/p?next=utm_source%3Dx",
        # utm key must match at the key position only
        "https://a.ex/p?xutm_source=1": "https://a.ex/p?xutm_source=1",
    }
    df = spark.createDataFrame([(u,) for u in cases], "url STRING")
    got = {
        r.url: r.out
        for r in df.select(
            "url", strip_tracking_params(F.col("url")).alias("out")
        ).collect()
    }
    assert got == cases
