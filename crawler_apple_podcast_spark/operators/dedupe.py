"""URL-seen dedupe operators (SURVEY.md §2.3 D1/D2).

The reference's seed-dedupe is a *sequential* 2-key OR probe
(/root/reference/handler/google_api.py:76-81): a candidate is skipped
iff any already-inserted row matches its ``result_url`` OR its
``apple_podcast_user_id`` — including rows inserted earlier in the same
batch, and including the quirk that an empty-string user id matches
every other empty-string row.  That sequential dependence is not a
plain ``dropDuplicates``: whether row i survives depends on which
earlier rows survived.

Distributed formulation: survival dependencies only exist between rows
sharing a url or uid key, i.e. within connected components of the
bipartite row↔key graph.  We compute components with a handful of
min-label-propagation shuffles (components are tiny in real corpora —
the giant ``uid=''`` component degenerates to "first valid row wins"
and stays cheap because the scan is O(component)), then replay the
reference's scan order inside each component with one grouped Arrow
UDF.  Rows in singleton components pass through the same code path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def two_key_or_anti_join(
    candidates: DataFrame, seen: DataFrame, url_col: str = "url", uid_col: str = "uid"
) -> DataFrame:
    """Set-semantics D1: drop candidates matching the *persisted* seen
    table on either key.  (Batch-internal ordering handled by
    ``sequential_or_dedupe``.)"""
    seen_urls = seen.select(F.col(url_col)).where(F.col(url_col).isNotNull()).distinct()
    seen_uids = seen.select(F.col(uid_col)).where(F.col(uid_col).isNotNull()).distinct()
    return candidates.join(seen_urls, url_col, "left_anti").join(
        seen_uids, uid_col, "left_anti"
    )


def _scan_component(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("ord")
    urls: set = set()
    uids: set = set()
    keep = []
    for r in pdf.itertuples():
        if r.seen_hit or r.url in urls or r.uid in uids:
            keep.append(False)
        else:
            keep.append(True)
            urls.add(r.url)
            uids.add(r.uid)
    return pdf[pd.Series(keep, index=pdf.index)]


def sequential_or_dedupe(
    candidates: DataFrame,
    seen: DataFrame,
    url_col: str = "url",
    uid_col: str = "uid",
    ord_col: str = "ord",
    max_iters: int = 50,
) -> DataFrame:
    """Exact replay of ``SaveUrlsToDb`` batch semantics, distributed.

    ``candidates`` needs a total-order column ``ord_col`` (the
    reference's processing order).  Returns the surviving rows with
    their original columns.
    """
    c = candidates.select(
        F.col(ord_col).cast("long").alias("ord"),
        F.col(url_col).alias("url"),
        F.col(uid_col).alias("uid"),
    )

    seen_urls = seen.select(F.col(url_col).alias("url")).where(
        F.col("url").isNotNull()
    ).distinct().withColumn("_hu", F.lit(True))
    seen_uids = seen.select(F.col(uid_col).alias("uid")).where(
        F.col("uid").isNotNull()
    ).distinct().withColumn("_hd", F.lit(True))

    c = (
        c.join(seen_urls, "url", "left")
        .join(seen_uids, "uid", "left")
        .withColumn(
            "seen_hit", F.coalesce(F.col("_hu"), F.lit(False)) | F.coalesce(F.col("_hd"), F.lit(False))
        )
        .drop("_hu", "_hd")
    )

    # min-label propagation over the url/uid key graph
    lab = c.withColumn("comp", F.col("ord"))
    for _ in range(max_iters):
        by_url = lab.groupBy("url").agg(F.min("comp").alias("_cu"))
        by_uid = lab.groupBy("uid").agg(F.min("comp").alias("_cd"))
        nxt = (
            lab.join(by_url, "url")
            .join(by_uid, "uid")
            .withColumn("_new", F.least("comp", "_cu", "_cd"))
        )
        changed = nxt.where(F.col("_new") != F.col("comp")).limit(1).count()
        lab = nxt.withColumn("comp", F.col("_new")).drop("_cu", "_cd", "_new")
        if changed == 0:
            break
    survivors = (
        lab.select("ord", "url", "uid", "seen_hit", "comp")
        .groupBy("comp")
        .applyInPandas(
            _scan_component,
            schema="ord BIGINT, url STRING, uid STRING, seen_hit BOOLEAN, comp BIGINT",
        )
        .select("ord")
    )
    return candidates.join(
        survivors.withColumnRenamed("ord", ord_col), ord_col, "left_semi"
    )


def skip_if_exists(
    new_assets: DataFrame, ledger: DataFrame, key_col: str = "id"
) -> DataFrame:
    """D2 download-dedupe: the ``os.path.exists`` skip
    (apple_podcast_api.py:151-152) as a ``left_anti`` join."""
    return new_assets.join(
        ledger.select(key_col).distinct(), key_col, "left_anti"
    )
