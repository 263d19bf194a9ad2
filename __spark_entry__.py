"""Driver contract for the spark-graft builder (PySpark target).

``entry``   — flagship: the engine's frontier schedule+dedupe pipeline
              (Bloom-gated exact anti-join + per-host politeness gate +
              counter aggregation) over a frontier derived from the
              sf0.001 ``events`` table.
``queries`` / ``oracle_sql`` — operator catalog in
              ``crawler_apple_podcast_spark/queries.py`` (one entry per
              implemented operator family from SURVEY.md §2 plus the
              training-data-pipeline operators).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawler_apple_podcast_spark import queries as _catalog
from crawler_apple_podcast_spark.operators.bloom import build_bloom_shards, bloom_gated_anti_join
from crawler_apple_podcast_spark.operators.politeness import politeness_gate
from crawler_apple_podcast_spark.functions.urls import host_of


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Schedules a synthetic URL frontier: canonical url per event, seen
    set = low-value events (already-crawled ledger analog), Bloom-gated
    exact dedupe, per-host politeness budget, per-host counters.
    """
    sf = "/root/testdata/sf0.001"
    e = spark.read.parquet(f"{sf}/events.parquet")
    url = F.concat(
        F.lit("https://host"), F.pmod(F.col("user_id"), F.lit(20)).cast("string"),
        F.lit(".example/e/"), F.col("event_id").cast("string"),
    )
    frontier = e.select(
        url.alias("fetch_url"),
        F.pmod(F.col("event_id"), F.lit(3)).cast("int").alias("priority"),
        (F.col("value") < 5).alias("_seen"),
    )
    seen = frontier.where(F.col("_seen")).select("fetch_url")
    candidates = frontier.select("fetch_url", "priority")

    bloom = build_bloom_shards(seen, "fetch_url", n_shards=8, m_bits=1 << 16, k=5)
    fresh = bloom_gated_anti_join(candidates, seen, bloom, "fetch_url")

    scheduled, deferred = politeness_gate(fresh, None, default_budget=50)
    return (
        scheduled.withColumn("host", host_of(F.col("fetch_url")))
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("scheduled"),
            F.min("priority").alias("top_priority"),
        )
        .orderBy("host")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Each callable takes (spark, sf_dir) and returns a DataFrame.
    Every computed column is aliased identically in ``oracle_sql``.
    """
    return _catalog.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents (same column names).  Every
    ``queries()`` key has a full value oracle — including
    ``dedup_simhash`` (arithmetic bit family replayed as SQL literals)
    and ``ann_lsh_bucketed`` (integer hyperplanes embedded as list
    literals) — except two rows-only entries: ``dedup_simhash_prod``
    (xxhash64 token hashing, not replayable in DuckDB; its oracle-gated
    twin is ``dedup_simhash`` with the identical plan shape, and pytest
    asserts the packed fingerprint aggregate is bit-identical across
    both bit families) and ``text_compression_signal`` (zlib isn't SQL;
    a direct-zlib pytest referee covers the values)."""
    return _catalog.oracle_sql()
