"""Host-level reputation scorecard and corpus admission tiers.

Web-corpus curation filters by DOMAIN before it filters by document
(RefinedWeb/C4 blocklists, Common Crawl host ranks): a host whose
pages are mostly duplicated, non-target-language, or low-quality is
cut wholesale, cheaply, before per-document processing.  The
reference has no notion of source quality (it crawls a fixed seed
list); this aggregates the engine's own per-doc signals into one
integer score per host and an admission tier.

Signals (all per-mille, all integer):
- ``quality_milli``  — floor-mean of per-doc quality scores
  (``functions/text.py:quality_score_milli``);
- ``en_milli``       — fraction of docs the stopword heuristic calls
  English (``lang_id``);
- ``uniq_milli``     — distinct texts per doc (1000 = no exact dups).

``score = (w_quality*quality + w_en*en + w_uniq*uniq) div (sum of
weights)``; tiers: ``keep`` (>= hi), ``sample`` (>= lo), ``drop``.

Spark shape: one map-side pass computes the per-doc signals (pure
codegen expressions), then ONE groupBy(host) with a distinct-count.
With ``exact_uniq=False`` the distinct text count becomes a distinct
``xxhash64`` count — 8-byte shuffle keys instead of full documents,
the right trade at 10^8 docs/host (a 64-bit collision inside one host
misses one dup; the per-mille signal is unchanged).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import lang_id, quality_score_milli


def host_scorecard(
    docs: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
    w_quality: int = 2,
    w_en: int = 1,
    w_uniq: int = 1,
    hi: int = 600,
    lo: int = 400,
    exact_uniq: bool = True,
) -> DataFrame:
    """``(host, n_docs, quality_milli, en_milli, uniq_milli, score,
    tier)`` — see module docstring."""
    text = F.col(text_col)
    per_doc = docs.select(
        host_col,
        quality_score_milli(text).alias("_q"),
        (lang_id(text) == "en").cast("int").alias("_en"),
        (text if exact_uniq else F.xxhash64(text)).alias("_t"),
    )
    agg = per_doc.groupBy(host_col).agg(
        F.count("*").alias("n_docs"),
        F.sum("_q").alias("_sq"),
        F.sum("_en").alias("_ne"),
        F.count_distinct("_t").alias("_nu"),
    )
    w_sum = w_quality + w_en + w_uniq
    s = agg.select(
        host_col,
        "n_docs",
        F.expr("_sq div n_docs").alias("quality_milli"),
        F.expr("(1000 * _ne) div n_docs").alias("en_milli"),
        F.expr("(1000 * _nu) div n_docs").alias("uniq_milli"),
    ).withColumn(
        "score",
        F.expr(
            f"({w_quality} * quality_milli + {w_en} * en_milli"
            f" + {w_uniq} * uniq_milli) div {w_sum}"
        ),
    )
    tier = (
        F.when(F.col("score") >= hi, "keep")
        .when(F.col("score") >= lo, "sample")
        .otherwise("drop")
    )
    return s.withColumn("tier", tier)


def page_link_signals(
    pages: DataFrame,
    url_col: str = "page_url",
    html_col: str = "html",
    spam_density_milli: int = 500,
) -> DataFrame:
    """Per-page link-density spam signals — the C4/Gopher-family
    structural filters: link farms and nav-only pages are mostly
    anchor text; prose pages are not.

    ``(page_url, n_links, n_external, anchor_chars, text_chars,
    link_density_milli, external_milli, is_linkspam)`` where
    ``link_density_milli = 1000 * anchor_chars div text_chars`` (-1 on
    empty visible text), ``external_milli = 1000 * n_external div
    n_links`` (-1 on zero links), and ``is_linkspam`` gates on the
    density threshold.  Visible text = HTML with tags collapsed to
    single spaces.  Everything is one codegen map over the page scan —
    no shuffle, no Python.
    """
    from ..functions.urls import extract_anchors, host_of, resolve_href

    anchors = extract_anchors(F.col(html_col))
    page_host = host_of(F.col(url_col))
    n_ext = F.size(
        F.filter(
            anchors,
            lambda p: host_of(resolve_href(p["href"], F.col(url_col)))
            != page_host,
        )
    ).cast("long")
    anchor_chars = F.aggregate(
        anchors, F.lit(0).cast("long"), lambda acc, p: acc + F.length(p["anchor"])
    )
    visible = F.trim(
        F.regexp_replace(F.regexp_replace(F.col(html_col), "<[^>]*>", " "), " +", " ")
    )
    sig = pages.select(
        F.col(url_col).alias("page_url"),
        F.size(anchors).cast("long").alias("n_links"),
        n_ext.alias("n_external"),
        anchor_chars.alias("anchor_chars"),
        F.length(visible).cast("long").alias("text_chars"),
    )
    density = F.when(
        F.col("text_chars") > 0,
        F.expr("(1000 * anchor_chars) div text_chars"),
    ).otherwise(F.lit(-1))
    ext = F.when(
        F.col("n_links") > 0, F.expr("(1000 * n_external) div n_links")
    ).otherwise(F.lit(-1))
    return (
        sig.withColumn("link_density_milli", density)
        .withColumn("external_milli", ext)
        .withColumn(
            "is_linkspam",
            F.col("link_density_milli") >= spam_density_milli,
        )
    )
