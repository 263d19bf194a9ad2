"""Registrable-domain extraction (public-suffix longest match).

Grouping hosts by *registrable domain* (the label directly below the
public suffix: ``a.b.shop.co.uk`` -> ``shop.co.uk``) is how a crawler
scopes politeness, dedup, and per-site quotas — ``co.uk`` is not a
site, ``shop.co.uk`` is.  The reference never needs this (one seeded
API host); any open-web frontier does.

The suffix list is DATA (the Mozilla Public Suffix List, ~9k rows —
shipped by the operator's caller, never hardcoded), so the match is a
join, not an expression: explode each host into its dot-suffixes
(``a.b.co.uk`` -> 4 candidates — hosts have a handful of labels, so
the fan-out is a small constant), broadcast-join the suffix table,
keep the LONGEST matching suffix per host (``max(struct(n_labels,
suffix))`` — map-side combinable), and take one label more as the
registrable domain.  Hosts matching no listed suffix fall back to the
PSL's implicit ``*`` rule: the last label is the public suffix.  A
host that IS a public suffix has no registrable domain (NULL).

Scale: run this on the DISTINCT host table (10^7 rows at web scale,
3 orders below the URL table) and join the result back — the operator
takes whatever frame it is given and leaves that staging to the
caller.  One shuffle (the groupBy), one broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def registrable_domains(
    hosts: DataFrame, suffixes: DataFrame, host_col: str = "host"
) -> DataFrame:
    """``(host_col, public_suffix, registrable_domain)`` for each row of
    ``hosts`` (callers pass distinct hosts).  ``suffixes`` has one
    string column ``suffix`` holding public suffixes in plain form
    (``com``, ``co.uk`` — no leading dot).
    """
    parts = F.split(F.col(host_col), r"\.")
    n = F.size(parts)
    cands = hosts.select(
        host_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(1), n),
                lambda i: F.array_join(F.slice(parts, i, n - i + 1), "."),
            )
        ).alias("_cand"),
    )
    sfx = suffixes.select(F.col("suffix").alias("_cand")).distinct()
    matched = (
        cands.join(F.broadcast(sfx), "_cand")
        .groupBy(host_col)
        .agg(
            F.max(
                F.struct(
                    F.size(F.split(F.col("_cand"), r"\.")).alias("_n"),
                    F.col("_cand").alias("_sfx"),
                )
            ).alias("_win")
        )
        .select(host_col, F.col("_win._sfx").alias("_sfx"))
    )
    out = hosts.join(matched, host_col, "left").select(
        host_col,
        # implicit-* fallback: last label is the public suffix
        F.coalesce(F.col("_sfx"), F.element_at(parts, -1)).alias("public_suffix"),
    )
    ps_labels = F.size(F.split(F.col("public_suffix"), r"\."))
    host_labels = F.size(F.split(F.col(host_col), r"\."))
    return out.select(
        host_col,
        "public_suffix",
        F.when(
            host_labels > ps_labels,
            F.array_join(
                F.slice(
                    F.split(F.col(host_col), r"\."),
                    host_labels - ps_labels,
                    ps_labels + 1,
                ),
                ".",
            ),
        ).alias("registrable_domain"),
    )
