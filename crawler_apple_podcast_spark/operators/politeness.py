"""Per-host politeness scheduling (SURVEY.md §2.7 / §4.3).

The reference sleeps 10-15 s between pages of ONE host
(/root/reference/crawler_podcasts.py:81, utils/utime.py:5-14) and
consults nothing else; the engine turns that into a per-host *budget*:
with crawl-delay d and a wave lasting W seconds, a host may receive at
most ``max(1, W // d)`` fetches per wave.  Crawl-delays come from the
corpus' own ``robots.txt`` rows (broadcast as a tiny dim table).

Scale note: ranking "top-B per host" with a single window over ``host``
puts the whole ``amp-api.podcasts.apple.com`` skew bucket in one task.
We therefore rank in two phases — a salted partial top-B within
``(host, salt)`` prunes to ``salt_n * B`` rows per host before the
exact per-host rank — the classic distributed top-k trick.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.urls import host_of, url_hash


def parse_robots(pages: DataFrame) -> DataFrame:
    """robots.txt rows -> ``(host, crawl_delay, disallow)`` dim table."""
    robots = pages.where(F.col("url").rlike(r"^https?://[^/]+/robots\.txt$"))
    body = F.decode(F.col("html"), "UTF-8")
    return robots.select(
        host_of(F.col("url")).alias("host"),
        F.regexp_extract(body, r"Crawl-delay:\s*([0-9]+)", 1).try_cast("int").alias("crawl_delay"),
        F.regexp_extract(body, r"Disallow:\s*(\S+)", 1).alias("disallow"),
    )


def filter_disallowed(frontier: DataFrame, robots: DataFrame, url_col: str = "fetch_url") -> DataFrame:
    """Drop frontier rows whose path matches the host's Disallow prefix.

    ``robots`` is tiny (one row per host) -> broadcast join.
    """
    f = frontier.withColumn("_host", host_of(F.col(url_col)))
    joined = f.join(F.broadcast(robots.select("host", "disallow")),
                    f["_host"] == robots["host"], "left")
    path = F.parse_url(F.col(url_col), F.lit("PATH"))
    blocked = (
        F.col("disallow").isNotNull()
        & (F.length("disallow") > 0)
        & path.startswith(F.col("disallow"))
    )
    return joined.where(~blocked).drop("host", "disallow", "_host")


def host_budgets(robots: DataFrame, wave_seconds: int, default_delay: int = 5) -> DataFrame:
    """Budget dim table: fetches allowed per host per wave."""
    delay = F.coalesce(F.col("crawl_delay"), F.lit(default_delay))
    return robots.select(
        "host",
        F.greatest(F.lit(1), (F.lit(wave_seconds) / delay).cast("int")).alias("budget"),
    )


def politeness_gate(
    frontier: DataFrame,
    budgets: DataFrame | None,
    default_budget: int = 1_000_000_000,
    url_col: str = "fetch_url",
    priority_col: str = "priority",
    salt_n: int = 16,
    key_cols: list[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Split the frontier into (scheduled, deferred) for this wave.

    Deterministic order within a host: ``(priority, url_hash, url,
    *key_cols)``.  ``key_cols`` identifies a frontier row (default
    ``[url_col, priority_col]``); deferred rows keep all original
    columns and should be unioned into the next wave's frontier.
    """
    key_cols = key_cols or [url_col, priority_col]
    f = (
        frontier.withColumn("_host", host_of(F.col(url_col)))
        .withColumn("_uh", url_hash(F.col(url_col)))
        .withColumn("_salt", F.pmod(F.col("_uh"), F.lit(salt_n)))
    )
    if budgets is not None:
        f = f.join(F.broadcast(budgets), f["_host"] == budgets["host"], "left").drop("host")
        f = f.withColumn("_budget", F.coalesce(F.col("budget"), F.lit(default_budget))).drop("budget")
    else:
        f = f.withColumn("_budget", F.lit(default_budget))

    order = [F.col(priority_col), F.col("_uh"), F.col(url_col)] + [
        F.col(c) for c in key_cols if c not in (url_col, priority_col)
    ]
    w_salted = Window.partitionBy("_host", "_salt").orderBy(*order)
    w_host = Window.partitionBy("_host").orderBy(*order)

    pruned = f.withColumn("_rn1", F.row_number().over(w_salted)).where(
        F.col("_rn1") <= F.col("_budget")
    )
    ranked = pruned.withColumn("_rn", F.row_number().over(w_host))
    helper = ["_host", "_uh", "_salt", "_budget", "_rn1", "_rn"]
    scheduled = ranked.where(F.col("_rn") <= F.col("_budget")).drop(*helper)

    # deferred = frontier minus scheduled (includes phase-1-pruned rows)
    deferred = frontier.join(scheduled.select(*key_cols), key_cols, "left_anti")
    return scheduled, deferred
