"""Retry scheduling with exponential backoff over the fetch log.

The reference swallows per-seed exceptions and moves on
(/root/reference/crawler_podcasts.py:28-30) — a failed page is simply
lost.  A crawl engine needs the standard recovery loop instead: a URL
whose LATEST attempt failed re-enters the frontier after an
exponentially growing wave delay, and is abandoned after
``max_attempts`` failures.

Scale shape: one groupBy over (seed_index, fetch_url) with map-side
partial aggregation — failure count, last wave, and the latest
attempt's outcome (``max_by`` over the wave; the wave loop fetches a
URL at most once per wave, so the argmax is tie-free).  Backoff
``2^failures`` is computed as ``pow`` on small integers, exact in
double on both engines, so the due wave is oracle-replayable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def schedule_retries(
    fetch_log: DataFrame,
    max_attempts: int = 3,
    wave_col: str = "wave",
    ok_col: str = "fetch_ok",
) -> DataFrame:
    """(seed_index, fetch_url, failures, due_wave) for every URL whose
    latest attempt failed and which has failed at most ``max_attempts``
    times: eligible to re-enter the frontier at
    ``due_wave = last_wave + 2^failures``.  URLs whose latest attempt
    succeeded, and URLs past the attempt cap, are absent."""
    g = fetch_log.groupBy("seed_index", "fetch_url").agg(
        F.sum(F.when(~F.col(ok_col), 1).otherwise(0)).cast("long").alias("failures"),
        F.max(wave_col).cast("long").alias("_last_wave"),
        F.max_by(ok_col, wave_col).alias("_last_ok"),
    )
    backoff = F.pow(F.lit(2.0), F.col("failures")).cast("long")
    return (
        g.where(~F.col("_last_ok") & (F.col("failures") <= F.lit(int(max_attempts))))
        .select(
            "seed_index",
            "fetch_url",
            "failures",
            (F.col("_last_wave") + backoff).alias("due_wave"),
        )
    )


def due_retries(retries: DataFrame, current_wave: int) -> DataFrame:
    """The slice of a retry schedule eligible at ``current_wave``,
    shaped as frontier rows (retries ride in with priority = failures,
    so fresher URLs outrank repeatedly-failing ones under the
    ascending-priority politeness gate)."""
    return retries.where(F.col("due_wave") <= F.lit(int(current_wave))).select(
        "seed_index",
        F.col("fetch_url").alias("url"),
        F.col("failures").cast("int").alias("priority"),
    )
