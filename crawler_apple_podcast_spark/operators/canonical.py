"""``<link rel="canonical">`` alias extraction and chain collapse.

rel=canonical is the page's own declaration that its content lives at
another URL — the strongest URL-aliasing signal a crawler gets ahead
of content dedup (print views, tracking-parameter variants, mirrors).
A frontier that folds canonical aliases into its seen-set skips whole
alias families for the cost of one fetch each; a training pipeline
keys its per-URL dedup ledger on the canonical target instead of the
alias.

Publishers chain and misconfigure these (A declares B, B declares C;
A and B declare each other), so collapse is the redirect-resolution
problem on a different edge relation — ``resolve_redirects``'s
pointer doubling is reused verbatim rather than re-implemented
(``operators/redirects.py``: log2(max_hops) shuffle rounds).  Cycles
come back ``status='truncated'`` and should be treated as
self-canonical by policy.

Extraction is two codegen regexes (tag scan, then href attribute — so
attribute order inside the tag never matters) plus the shared
``resolve_href`` base resolution: zero Python, zero shuffle until the
chain collapse.  Self-declarations (href == page URL, the dominant
case on the real web) are dropped before the collapse — they are
confirmations, not edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.urls import resolve_href
from .redirects import resolve_redirects

_TAG_RE = r'<link[^>]*rel="canonical"[^>]*>'
_HREF_RE = r'href="([^"]*)"'


def canonical_href(html, base_url):
    """Declared canonical URL of a page (absolute), NULL when the page
    declares none."""
    tag = F.regexp_extract(html, _TAG_RE, 0)
    href = F.nullif(F.regexp_extract(tag, _HREF_RE, 1), F.lit(""))
    return F.when(href.isNotNull(), resolve_href(href, base_url))


def canonical_edges(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src_url, dst_url) alias edges: pages declaring a canonical URL
    other than themselves."""
    dst = canonical_href(F.col(html_col), F.col(url_col))
    return (
        pages.select(F.col(url_col).alias("src_url"), dst.alias("dst_url"))
        .where(F.col("dst_url").isNotNull())
        .where(F.col("dst_url") != F.col("src_url"))
    )


def resolve_canonical(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    max_hops: int = 8,
    cache_registry: list[DataFrame] | None = None,
) -> DataFrame:
    """(src_url, final_url, hops, status) for every alias-declaring
    page: the canonical chain's terminal URL, or ``truncated`` for
    over-long chains and declaration cycles."""
    return resolve_redirects(
        canonical_edges(pages, url_col, html_col),
        src_col="src_url",
        dst_col="dst_url",
        max_hops=max_hops,
        cache_registry=cache_registry,
    )
