"""Frontier/URL-list prefix-delta compression accounting.

A 10^10-row frontier snapshot is mostly redundant bytes: URLs from one
host share long prefixes.  Sorted prefix-delta coding (store
``(shared_prefix_len, suffix)`` against the previous URL — the CDX /
frontier-file layout) removes most of it.  This operator computes the
exact per-host byte accounting of that coding — the decision input for
"delta-code this snapshot?" — without materializing compressed blobs.

Spark shape: hosts are the natural delta-coding unit AND the shuffle
key, so the previous-URL lookup is a ``lag`` window per host ordered
by URL — never a global sort.  The shared-prefix length is an
``aggregate`` scan over character positions (interpreted lambda, ~URL
length steps); fine for an accounting pass over a snapshot, and the
whole pipeline stays one shuffle.  Integer arithmetic throughout so
the DuckDB oracle byte-matches.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def common_prefix_len(a: Column, b: Column) -> Column:
    """Length of the longest common prefix of two strings; NULL if
    either side is NULL.

    ``aggregate`` over positions 1..min(len): the accumulator counts
    matches while non-negative and freezes as ``-acc-1`` on the first
    mismatch (sequence can't early-exit); decoded at the end."""
    n = F.least(F.length(a), F.length(b))
    acc = F.aggregate(
        F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
            F.array().cast("array<int>")
        ),
        F.lit(0),
        lambda acc, i: F.when(
            (acc >= 0) & (a.substr(i, F.lit(1)) == b.substr(i, F.lit(1))),
            acc + 1,
        ).otherwise(F.when(acc >= 0, -acc - 1).otherwise(acc)),
        lambda acc: F.when(acc >= 0, acc).otherwise(-acc - 1),
    )
    return F.when(a.isNotNull() & b.isNotNull(), acc)


def prefix_delta_stats(
    urls: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    overhead_bytes: int = 2,
) -> DataFrame:
    """``(host, n_urls, raw_bytes, delta_bytes, savings_milli)`` for
    per-host sorted prefix-delta coding: each host's first URL stored
    raw, every next one as ``(prefix_len, suffix)`` plus
    ``overhead_bytes`` of framing.  ``savings_milli`` is the per-mille
    byte reduction (negative if framing overhead loses)."""
    w = Window.partitionBy(host_col).orderBy("_u")
    u = urls.select(host_col, F.col(url_col).alias("_u")).withColumn(
        "_prev", F.lag("_u").over(w)
    )
    cpl = common_prefix_len(F.col("_u"), F.col("_prev"))
    cost = F.when(F.col("_prev").isNull(), F.length("_u")).otherwise(
        F.length("_u") - cpl + F.lit(overhead_bytes)
    )
    agg = u.groupBy(host_col).agg(
        F.count("*").alias("n_urls"),
        F.sum(F.length("_u")).cast("long").alias("raw_bytes"),
        F.sum(cost).cast("long").alias("delta_bytes"),
    )
    return agg.withColumn(
        "savings_milli",
        F.expr("(1000 * (raw_bytes - delta_bytes)) div raw_bytes"),
    )
