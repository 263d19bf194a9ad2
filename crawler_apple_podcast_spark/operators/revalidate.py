"""HTTP revalidation planning: fetch vs conditional-GET vs skip.

The reference re-downloads unconditionally — its only work-avoidance
is file-exists skipping (``/root/reference/handler/apple_podcast_api.py:151-152``,
``utils/file.py:51-53``); it never sends ``If-None-Match`` /
``If-Modified-Since``.  At recrawl scale the cheapest byte is the one
the server never sends: a wave's scheduled URLs split into

- ``fetch``       — never seen, or seen without any validator;
- ``conditional`` — stale but the last response carried an ETag or
  Last-Modified, so a 304 costs headers only;
- ``skip``        — fetched within the freshness TTL (heuristic
  freshness, the RFC 9111 default when no explicit policy is given).

One equi-join of the schedule against the fetch-history ledger on
``url`` — history is url-unique so the join never fans out, and at
10^10 URLs it is the same url-keyed shuffle the ledger itself was
written with (bucketed storage makes it exchange-free).  All time
arithmetic is integer epoch seconds; the plan is fully replayable in
ANSI SQL (driver entry ``crawl_revalidation_plan``).

``apply_revalidation_outcomes`` folds the wave's responses back into
the ledger with 304 semantics: Not-Modified refreshes ``fetched_ts``
but keeps the old content fingerprint and validators (the page did
not change — downstream dedupe/diff must not see a new version), 200
replaces them, errors leave the ledger row untouched (retry policy is
``operators/retry.py``'s job).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HISTORY_COLS = ("url", "etag", "last_modified", "fetched_ts", "fingerprint")


def revalidation_plan(
    schedule: DataFrame,
    history: DataFrame,
    now_ts: int,
    ttl_s: int,
    url_col: str = "url",
) -> DataFrame:
    """``(url_col, action, etag, last_modified)`` for every scheduled
    URL; ``action`` in ``('fetch','conditional','skip')``.  Validators
    are carried only on ``conditional`` rows (they become the
    ``If-None-Match`` / ``If-Modified-Since`` request headers)."""
    if ttl_s < 0:
        raise ValueError("ttl_s must be >= 0")
    h = history.select(
        F.col(url_col).alias("_hu"),
        F.col("etag").alias("_etag"),
        F.col("last_modified").alias("_lm"),
        F.col("fetched_ts").alias("_fts"),
    )
    j = schedule.join(h, schedule[url_col] == h["_hu"], "left")
    fresh = F.col("_fts").isNotNull() & (F.lit(now_ts) - F.col("_fts") < F.lit(ttl_s))
    has_validator = F.col("_etag").isNotNull() | F.col("_lm").isNotNull()
    action = (
        F.when(fresh, F.lit("skip"))
        .when(F.col("_fts").isNotNull() & has_validator, F.lit("conditional"))
        .otherwise(F.lit("fetch"))
    )
    cond = action == "conditional"
    return j.select(
        schedule[url_col],
        action.alias("action"),
        F.when(cond, F.col("_etag")).alias("etag"),
        F.when(cond, F.col("_lm")).alias("last_modified"),
    )


def apply_revalidation_outcomes(
    history: DataFrame,
    outcomes: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Fold wave responses into the history ledger.

    ``outcomes``: ``(url, status, etag, last_modified, fingerprint,
    fetched_ts)`` — one row per attempted URL.  Semantics per status:
    200 replaces validators+fingerprint, 304 refreshes ``fetched_ts``
    only (content provably unchanged), anything else leaves the
    existing row as-is.  URLs new to the ledger insert on 200."""
    o = outcomes.select(
        F.col(url_col).alias("_ou"),
        F.col("status").alias("_st"),
        F.col("etag").alias("_oetag"),
        F.col("last_modified").alias("_olm"),
        F.col("fingerprint").alias("_ofp"),
        F.col("fetched_ts").alias("_ots"),
    )
    j = history.join(o, history[url_col] == o["_ou"], "full_outer")
    st = F.col("_st")
    merged = j.select(
        F.coalesce(history[url_col], F.col("_ou")).alias(url_col),
        F.when(st == 200, F.col("_oetag")).otherwise(F.col("etag")).alias("etag"),
        F.when(st == 200, F.col("_olm"))
        .otherwise(F.col("last_modified"))
        .alias("last_modified"),
        F.when(
            (st == 200) | ((st == 304) & history[url_col].isNotNull()),
            F.col("_ots"),
        )
        .otherwise(F.col("fetched_ts"))
        .alias("fetched_ts"),
        F.when(st == 200, F.col("_ofp"))
        .otherwise(F.col("fingerprint"))
        .alias("fingerprint"),
    )
    # rows that exist ONLY in outcomes with a non-200 status never
    # became ledger state (a failed first fetch is retry.py's problem)
    return merged.where(F.col("fetched_ts").isNotNull())
