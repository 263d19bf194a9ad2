"""URL expressions — all JVM-side Column functions (no Python UDFs).

Spark-first equivalents of the reference's string surgery:

- show-url user-id:  /root/reference/handler/google_api.py:106-116
- API-url user-id:   /root/reference/handler/apple_podcast_api.py:131-135
- fetch-url normalization: crawler_podcasts.py:48-52 +
  apple_podcast_api.py:26-30 (default ``l=en-US&offset=10``)
- canonicalization + xxhash64 keys for the URL-seen structures
  (north_rule: "bloom/cuckoo URL-seen filter keyed on
  canonicalized+hashed URLs").

Everything stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

API_BASE = "https://amp-api.podcasts.apple.com"


def host_of(url: Column) -> Column:
    return F.lower(F.try_parse_url(url, F.lit("HOST")))


def strip_query(url: Column) -> Column:
    return F.split(url, r"\?", 2).getItem(0)


def show_user_id(url: Column) -> Column:
    """``ParseApplePodcastUserId``: digits after a trailing ``/id``; else ''."""
    return F.regexp_extract(url, r"/id([0-9]+)$", 1)


def api_user_id(url: Column) -> Column:
    """``ApplePod.GetUserId``: the segment between ``podcasts/`` and
    ``/episodes`` (reference keeps it verbatim, digits or not)."""
    return F.regexp_extract(url, r"podcasts/([^/]*)/episodes", 1)


def normalize_fetch_url(url: Column) -> Column:
    """The URL a frontier entry actually requests (serde.normalize_fetch_url)."""
    lang = F.coalesce(F.try_parse_url(url, F.lit("QUERY"), F.lit("l")), F.lit("en-US"))
    offset = F.coalesce(F.try_parse_url(url, F.lit("QUERY"), F.lit("offset")), F.lit("10"))
    return F.concat(strip_query(url), F.lit("?l="), lang, F.lit("&offset="), offset)


def offset_of(url: Column) -> Column:
    """Ordering-parity key component (O1): the ``offset`` query param."""
    return F.coalesce(
        F.try_parse_url(url, F.lit("QUERY"), F.lit("offset")).try_cast("int"),
        F.lit(-1),
    )


def absolutize_next(next_url: Column) -> Column:
    """apple_podcast_api.py:56-57 — prefix the API base when not absolute.

    Applied to the validated cursor, so ``""`` becomes the bare base
    (the reference's terminal-quirk fetch).
    """
    return F.when(next_url.startswith("http"), next_url).otherwise(
        F.concat(F.lit(API_BASE), next_url)
    )


def validate_next(next_raw: Column) -> Column:
    """apple_podcast_api.py:74-83 — missing / non-string ``next`` -> "".

    ``from_json`` coerces any JSON scalar to string for a STRING field,
    so "looks like a path or absolute url" stands in for the oracle's
    ``isinstance(str)`` check (a numeric ``next`` fails it, exactly like
    the reference).
    """
    ok = next_raw.rlike(r"^(https?://|/)")
    return F.when(next_raw.isNotNull() & ok, next_raw).otherwise(F.lit(""))


def canonicalize_url(url: Column) -> Column:
    """Canonical form for seen-set keys: lowercase scheme+host, strip
    fragment and DEFAULT port only (``:80`` http / ``:443`` https —
    other ports are distinct origins and must survive), sort query
    params, drop trailing ``?``.

    ``try_parse_url(url, 'HOST')`` returns the host WITHOUT the port,
    so the port is extracted separately from the authority.

    Malformed URLs (``try_parse_url`` -> NULL: bad percent-escapes
    etc. — a 10^10-URL web frontier always contains some) pass through
    UNCHANGED: the throwing ``parse_url`` would kill the whole job on
    one bad row (found by the idempotence property test), and mapping
    them all to a shared fallback key would wrongly dedupe every
    malformed URL into one.  Unchanged junk stays a distinct key and
    is idempotent by construction.
    """
    proto = F.lower(F.coalesce(F.try_parse_url(url, F.lit("PROTOCOL")), F.lit("http")))
    host = F.coalesce(host_of(url), F.lit(""))
    auth = F.regexp_extract(url, r"^[^:/?#]+://([^/?#]*)", 1)
    port = F.regexp_extract(auth, r":([0-9]+)$", 1)
    default_port = ((proto == "http") & (port == "80")) | (
        (proto == "https") & (port == "443")
    )
    hostport = F.concat(
        host,
        F.when((port != "") & ~default_port, F.concat(F.lit(":"), port)).otherwise(
            F.lit("")
        ),
    )
    path = F.coalesce(F.try_parse_url(url, F.lit("PATH")), F.lit(""))
    query = F.try_parse_url(url, F.lit("QUERY"))
    sorted_query = F.array_join(F.array_sort(F.split(query, "&")), "&")
    canon = F.concat(
        proto,
        F.lit("://"),
        hostport,
        path,
        F.when(
            query.isNotNull() & (F.length(query) > 0), F.concat(F.lit("?"), sorted_query)
        ).otherwise(F.lit("")),
    )
    # `host` is the already-coalesced lower(HOST): empty iff the URL
    # failed to parse (or genuinely has no authority) — reuse it so
    # the fallback branch costs no extra parse.
    return F.when(host == "", url).otherwise(canon)


# Ad/analytics parameters that denote the SAME resource: the classic
# frontier-inflation source (every email/social referral mints a
# distinct URL).  Keys only — values are wildcards by construction.
TRACKING_PARAM_RE = (
    r"^(utm_[a-z0-9_]+|gclid|dclid|fbclid|msclkid|yclid|twclid|igshid"
    r"|mc_eid|mc_cid|mkt_tok|oly_enc_id|oly_anon_id|vero_id|_hsenc"
    r"|_hsmi|s_cid|spm|ref_src)="
)


def strip_tracking_params(url: Column) -> Column:
    """Drop tracking query parameters (``utm_*``, click ids) — compose
    BEFORE ``canonicalize_url`` so referral alias variants collapse to
    one seen-set key instead of inflating the frontier.  Codegen-only:
    split the query on ``&``, ``filter`` out keys matching the
    tracking list, rejoin; a query left empty loses its ``?``.

    URLs ``try_parse_url`` rejects (bad escapes) pass through
    unchanged — same malformed-input policy as ``canonicalize_url``
    (junk stays a distinct key; nothing throws, nothing collapses).
    """
    query = F.try_parse_url(url, F.lit("QUERY"))
    kept = F.filter(
        F.split(query, "&"), lambda p: ~p.rlike(TRACKING_PARAM_RE)
    )
    new_q = F.array_join(kept, "&")
    base = F.regexp_extract(url, r"^([^?#]*)", 1)
    frag = F.regexp_extract(url, r"(#.*)$", 1)
    return F.when(query.isNull() | (F.length(query) == 0), url).otherwise(
        F.concat(
            base,
            F.when(F.length(new_q) > 0, F.concat(F.lit("?"), new_q)).otherwise(
                F.lit("")
            ),
            frag,
        )
    )


def url_hash(url: Column, seed: int | None = None) -> Column:
    """64-bit JVM-side hash key (xxhash64); ``seed`` derives independent
    hash families for Bloom double-hashing."""
    if seed is None:
        return F.xxhash64(url)
    return F.xxhash64(url, F.lit(seed))


def user_agent_for(url: Column, agents: list[str], index_expr: Column | None = None) -> Column:
    """P11 UA rotation (/root/reference/utils/user_agent.py:4-65,
    picked at handler/apple_podcast_api.py:32).  The reference uses
    ``random.randint``; a deterministic hash-pick keeps reruns
    reproducible (the UA never reaches any output, so parity does not
    depend on the distribution).  ``index_expr`` overrides the picker
    (e.g. an oracle-replayable expression)."""
    arr = F.array(*[F.lit(a) for a in agents])
    idx = (
        index_expr
        if index_expr is not None
        else F.pmod(F.xxhash64(url), F.lit(len(agents)))
    )
    return F.element_at(arr, (idx + 1).cast("int"))


def extract_hrefs(html: Column) -> Column:
    """``href`` values of every ``<a>`` tag in an HTML string column,
    both quote styles — document order within each style, all
    double-quoted links before all single-quoted ones (two extraction
    passes concatenated).  One codegen regexp pass per
    quote style (RE2-safe: ``[^>]*`` / ``[^"]*`` instead of non-greedy
    dot, so Java regex and the oracle dialect agree byte-for-byte);
    scheme-noise links (``javascript:``, ``mailto:``, ``tel:``,
    fragment-only) are dropped here so downstream resolution only sees
    fetchable candidates.

    The attribute is anchored — ``href`` must open the attribute list
    or follow whitespace/quote (``<a\\s(?:[^>]*[\\s"'])?href``), so a
    tag carrying only ``data-href="x"`` extracts NOTHING instead of
    the greedy-backoff false link the unanchored form produced (the
    same defect class ADVICE r4 flagged in ``canonical.py``; when a
    real ``href`` is present alongside ``data-href`` both forms
    already agreed).  ``=`` tolerates surrounding whitespace, matching
    the laxity of the robots/sitemap/canonical parsers."""
    dq = F.regexp_extract_all(html, F.lit(_HREF_DQ_PAT), F.lit(1))
    sq = F.regexp_extract_all(html, F.lit(_HREF_SQ_PAT), F.lit(1))
    return F.filter(
        F.concat(dq, sq),
        lambda h: (F.length(h) > 0)
        & ~h.startswith("#")
        & ~h.startswith("javascript:")
        & ~h.startswith("mailto:")
        & ~h.startswith("tel:"),
    )


# Anchored href attribute: `href` opens the attribute list or follows
# whitespace/quote, so `data-href="x"` alone never matches (ADVICE r4
# defect class, see extract_hrefs).  RE2-safe: optional group instead
# of lookbehind.
_HREF_DQ_PAT = "<a\\s(?:[^>]*[\\s\"'])?href\\s*=\\s*\"([^\"]*)\""
_HREF_SQ_PAT = "<a\\s(?:[^>]*[\\s\"'])?href\\s*=\\s*'([^']*)'"
_ANCHOR_PAT = "<a\\s(?:[^>]*[\\s\"'])?href\\s*=\\s*\"([^\"]*)\"[^>]*>([^<]*)</a>"


def extract_anchors(html: Column) -> Column:
    """``array<struct<href,anchor>>`` for double-quoted ``<a>`` tags
    whose inner text is plain (no nested markup — group 2 is
    ``[^<]*``, RE2-safe like ``extract_hrefs``; a nested-markup anchor
    extracts as the empty string and is filtered with the scheme
    noise).  One codegen regexp pass + per-match group extraction."""
    full = F.regexp_extract_all(html, F.lit(_ANCHOR_PAT), F.lit(0))
    pairs = F.transform(
        full,
        lambda m: F.struct(
            F.regexp_extract(m, _ANCHOR_PAT, 1).alias("href"),
            F.regexp_extract(m, _ANCHOR_PAT, 2).alias("anchor"),
        ),
    )
    return F.filter(
        pairs,
        lambda p: (F.length(p["href"]) > 0)
        & (F.length(p["anchor"]) > 0)
        & ~p["href"].startswith("#")
        & ~p["href"].startswith("javascript:")
        & ~p["href"].startswith("mailto:")
        & ~p["href"].startswith("tel:"),
    )


def resolve_href(href: Column, base_url: Column) -> Column:
    """Resolve an extracted href against the page URL, codegen-only:
    absolute stays; ``//h/p`` takes the base scheme; ``/p`` takes the
    base origin; any other relative path resolves against the base
    URL's directory (no ``..`` normalization — a canonical frontier
    treats ``a/../b`` and ``b`` as distinct keys, which only costs a
    re-fetch, never a wrong merge)."""
    scheme = F.lower(F.coalesce(F.try_parse_url(base_url, F.lit("PROTOCOL")), F.lit("http")))
    origin = F.concat(scheme, F.lit("://"), F.coalesce(host_of(base_url), F.lit("")))
    base_path = F.coalesce(F.try_parse_url(base_url, F.lit("PATH")), F.lit("/"))
    # directory of the base path: up to and including the last '/';
    # a rootless base path ("https://h" -> PATH "") resolves under "/"
    stripped = F.regexp_replace(base_path, r"[^/]*$", "")
    base_dir = F.when(F.length(stripped) == 0, F.lit("/")).otherwise(stripped)
    return (
        F.when(href.rlike(r"^[a-zA-Z][a-zA-Z0-9+.-]*://"), href)
        .when(href.startswith("//"), F.concat(scheme, F.lit(":"), href))
        .when(href.startswith("/"), F.concat(origin, href))
        .otherwise(F.concat(origin, base_dir, href))
    )


def extract_sitemap_urls(xml: Column) -> Column:
    """URL list from a sitemap-XML string column: every ``<loc>`` entry,
    space-trimmed (Spark ``trim`` semantics: ASCII spaces only —
    control characters survive, unlike Python ``str.strip``).  One codegen regexp pass — ``[^<]*`` instead of
    a non-greedy ``.*?`` so the pattern means the same thing in Java
    regex and RE2 (the oracle dialect), and nested markup cannot make
    it overrun a closing tag.  Feed the result through
    ``canonicalize_url`` + the Bloom/politeness gates to turn a fetched
    sitemap page into frontier candidates."""
    return F.transform(
        F.regexp_extract_all(xml, F.lit(r"<loc>([^<]*)</loc>"), F.lit(1)),
        lambda u: F.trim(u),
    )
