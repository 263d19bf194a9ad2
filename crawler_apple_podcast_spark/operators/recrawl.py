"""Adaptive recrawl scheduling from observed change rates.

A crawler that refetches everything at one cadence wastes its budget
on static pages and goes stale on fast-moving ones.  The classic fix
(Cho & Garcia-Molina, "Effective Page Refresh Policies") estimates a
per-URL change rate from fetch history and spaces revisits inversely
to it.  The reference crawls once and never revisits
(/root/reference/main.py — single pass over seeds); revisit policy is
pure engine-side addition.

Spark shape: ONE shuffle on the URL.  The adjacent-fetch change flag
is a ``lag`` window over ``(url, wave)``; the per-URL aggregate that
follows groups by the same key, so Catalyst reuses the window's hash
partitioning instead of shuffling again (visible in the plan: a
single Exchange).  Integer-exact throughout — the change ratio is
per-mille with floor division, the interval a linear blend of
``min/max_interval`` — so the DuckDB oracle byte-matches.

Policy: ``next_interval = max_iv - ((max_iv - min_iv) * change_milli)
div 1000`` — a never-changing page waits ``max_iv`` waves, an
every-fetch-changing one ``min_iv``.  A URL seen once has no observed
rate; it gets ``min_iv`` (crawl aggressively until we know better)
and ``change_milli`` NULL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def revisit_schedule(
    history: DataFrame,
    url_col: str = "url",
    wave_col: str = "wave",
    fp_col: str = "fingerprint",
    min_interval: int = 1,
    max_interval: int = 16,
) -> DataFrame:
    """``(url, n_obs, n_changes, change_milli, next_interval,
    next_due)`` from a fetch log of ``(url, wave, fingerprint)``.

    ``n_changes`` counts adjacent fetches whose fingerprint differs;
    ``change_milli = 1000 * n_changes div (n_obs - 1)``;
    ``next_due = last_wave + next_interval``.
    """
    if not 0 < min_interval <= max_interval:
        raise ValueError("need 0 < min_interval <= max_interval")
    w = Window.partitionBy(url_col).orderBy(wave_col)
    flagged = history.select(
        url_col,
        wave_col,
        F.when(F.lag(fp_col).over(w).isNull(), None)
        .when(F.lag(fp_col).over(w) != F.col(fp_col), 1)
        .otherwise(0)
        .alias("_chg"),
    )
    agg = flagged.groupBy(url_col).agg(
        F.count("*").alias("n_obs"),
        F.coalesce(F.sum("_chg"), F.lit(0)).alias("n_changes"),
        F.max(wave_col).alias("_last"),
    )
    change_milli = F.when(
        F.col("n_obs") > 1,
        F.expr("(1000 * n_changes) div (n_obs - 1)"),
    )
    span = max_interval - min_interval
    next_interval = F.coalesce(
        F.lit(max_interval) - F.expr(f"({span} * change_milli) div 1000"),
        F.lit(min_interval),
    )
    return (
        agg.withColumn("change_milli", change_milli)
        .withColumn("next_interval", next_interval.cast("long"))
        .withColumn("next_due", (F.col("_last") + F.col("next_interval")).cast("long"))
        .select(
            url_col, "n_obs", "n_changes", "change_milli",
            "next_interval", "next_due",
        )
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    url_col: str = "url",
    fp_col: str = "fingerprint",
) -> DataFrame:
    """``(url, status)`` between two crawl snapshots of
    ``(url, fingerprint)``: ``new`` (only in new), ``gone`` (only in
    old), ``changed`` (fingerprint differs), ``same``.

    One full-outer shuffle join on the URL; the fingerprints are the
    only payload carried, so the shuffle stays ~24 B/row however wide
    the snapshots' source tables are.  Feeds ``revisit_schedule``
    (diff streams are its fetch-log increments) and incremental
    re-extraction (only ``new``/``changed`` re-enter the pipeline).
    """
    o = old.select(F.col(url_col).alias("_u"), F.col(fp_col).alias("_fo"))
    n = new.select(F.col(url_col).alias("_v"), F.col(fp_col).alias("_fn"))
    j = o.join(n, o["_u"] == n["_v"], "full_outer")
    status = (
        F.when(F.col("_u").isNull(), "new")
        .when(F.col("_v").isNull(), "gone")
        .when(F.col("_fo") != F.col("_fn"), "changed")
        .otherwise("same")
    )
    return j.select(
        F.coalesce("_u", "_v").alias(url_col), status.alias("status")
    )


def due_frontier(
    schedule: DataFrame, current_wave: int, url_col: str = "url"
) -> DataFrame:
    """URLs whose revisit is due at ``current_wave`` — the recrawl
    slice of the frontier (a map-side filter; no shuffle)."""
    return schedule.where(F.col("next_due") <= current_wave).select(
        url_col, "next_due"
    )


def content_history(
    history: DataFrame,
    url_col: str = "url",
    wave_col: str = "wave",
    fp_col: str = "fingerprint",
) -> DataFrame:
    """SCD2 content-version history: collapse the per-wave fetch log
    into one row per (url, version) — ``(url, version, fingerprint,
    valid_from_wave, valid_to_wave, n_obs)`` where a new version opens
    whenever the content fingerprint differs from the previous fetch
    of the same URL and ``valid_to_wave`` is NULL for the current
    version (half-open validity: a version covers waves
    ``[valid_from, valid_to]`` inclusive, ``valid_to`` = the wave
    before the next version's first observation).  This is the
    warehouse-side "what did this page say at wave W" index that
    snapshot_diff (pairwise) can't answer.

    Spark shape: ONE url-keyed Exchange end to end.  The change flag
    is a ``lag`` window over (url, wave); the cumulative version
    number a running sum over the same window spec; the per-(url,
    version) aggregate groups by a superset of the window partition
    key; and the closing ``lead`` window on the aggregated frame is
    again url-partitioned — Catalyst reuses the first Exchange for
    all four (same guarantee plan-asserted for sessions/revisit).
    Assumes one fetch per (url, wave) — the wave loop's fetch log
    shape; ties would make lag order nondeterministic.
    """
    w = Window.partitionBy(url_col).orderBy(wave_col)
    chg = F.when(
        F.lag(fp_col).over(w).isNull()
        | (F.col(fp_col) != F.lag(fp_col).over(w)),
        1,
    ).otherwise(0)
    versioned = history.select(
        url_col, wave_col, fp_col, chg.alias("_chg")
    ).withColumn(
        "version",
        F.sum("_chg").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
    agg = versioned.groupBy(url_col, "version").agg(
        # fp is constant within a version by construction; min() rather
        # than first() so the aggregate is order-insensitive on both
        # engines
        F.min(fp_col).alias("fingerprint"),
        F.min(wave_col).cast("long").alias("valid_from_wave"),
        F.count(F.lit(1)).alias("n_obs"),
    )
    vw = Window.partitionBy(url_col).orderBy("version")
    return agg.withColumn(
        "valid_to_wave", F.lead("valid_from_wave").over(vw) - F.lit(1)
    ).select(
        url_col, "version", "fingerprint",
        "valid_from_wave", "valid_to_wave", "n_obs",
    )
