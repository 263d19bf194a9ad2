"""Spider-trap detection via URL template mining.

Calendar pages, session-id paths, and faceted-search grids generate
unbounded URL spaces with near-identical content — the classic crawler
trap.  The reference has no defense (its frontier is a finite seed
list); a web-scale frontier must detect traps ONLINE from what it has
already fetched.  Standard signal: collapse URLs to a path template
(digit runs -> ``{N}``), then per ``(host, template)`` compare URL
cardinality against content diversity.  Many URLs + few distinct
fingerprints = a trap; the scheduler stops expanding that template.

Spark shape: template derivation is map-side ``regexp_replace``; the
detector is ONE groupBy on ``(host, template)`` with two distinct
counts (Catalyst plans multi-distinct with a single Expand — still one
shuffle).  Integer per-mille diversity, so the DuckDB oracle
byte-matches.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.urls import host_of


def url_template(url: Column) -> Column:
    """Path+query with digit runs collapsed to ``{N}`` — the trap
    grouping key (query VALUES also collapse: ``?page=7`` and
    ``?page=8`` share a template)."""
    rest = F.regexp_replace(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", "")
    nofrag = F.split(rest, "#", 2).getItem(0)
    path = F.when(F.length(nofrag) == 0, F.lit("/")).otherwise(nofrag)
    return F.regexp_replace(path, r"[0-9]+", "{N}")


def detect_url_traps(
    pages: DataFrame,
    url_col: str = "url",
    fp_col: str = "fingerprint",
    min_urls: int = 20,
    max_diversity_milli: int = 200,
) -> DataFrame:
    """``(host, template, n_urls, n_fps, diversity_milli, is_trap)``.

    ``is_trap`` iff the template has at least ``min_urls`` distinct
    URLs whose content diversity ``1000 * n_fps div n_urls`` is at or
    below ``max_diversity_milli``.
    """
    t = pages.select(
        host_of(F.col(url_col)).alias("host"),
        url_template(F.col(url_col)).alias("template"),
        F.col(url_col).alias("_u"),
        F.col(fp_col).alias("_fp"),
    )
    agg = t.groupBy("host", "template").agg(
        F.count_distinct("_u").alias("n_urls"),
        F.count_distinct("_fp").alias("n_fps"),
    )
    div = F.expr("(1000 * n_fps) div n_urls")
    return agg.select(
        "host",
        "template",
        "n_urls",
        "n_fps",
        div.alias("diversity_milli"),
        (
            (F.col("n_urls") >= min_urls) & (div <= max_diversity_milli)
        ).alias("is_trap"),
    )


def trap_gate(
    frontier: DataFrame,
    traps: DataFrame,
    url_col: str = "fetch_url",
) -> DataFrame:
    """Drop frontier URLs whose ``(host, template)`` is a known trap —
    a broadcast anti-join (the trap table is tiny: templates that
    cleared ``min_urls``), evaluated before fetch."""
    keys = traps.where("is_trap").select("host", "template")
    f = frontier.withColumn("_h", host_of(F.col(url_col))).withColumn(
        "_t", url_template(F.col(url_col))
    )
    return (
        f.join(
            F.broadcast(keys),
            (f["_h"] == keys["host"]) & (f["_t"] == keys["template"]),
            "left_anti",
        )
        .drop("_h", "_t")
    )
