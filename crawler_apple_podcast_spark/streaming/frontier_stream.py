"""Structured Streaming front-end for the frontier scheduler.

The batch engine (plans/wave_loop.py) runs discrete waves; this module
exposes the same schedule+dedupe core as a continuous micro-batch
stream, for deployments where URL discoveries arrive as a feed (e.g. a
Kafka topic or an object-store drop directory) rather than as bounded
wave outputs.  Mirrors the reference's poller pattern
(/root/reference/test/cronjob_test.py:7-23 — `schedule.every(...)`)
at cluster scale.

Design
- Source: any streaming DataFrame with ``url STRING, priority INT,
  discovered_ts TIMESTAMP`` (file source in tests; swap for Kafka in
  production — the transformation is source-agnostic).
- Each micro-batch runs inside ``foreachBatch``: in-batch dedupe,
  Bloom-gated EXACT anti-join against the persistent seen set, per-host
  politeness gate, then two idempotent appends (scheduled rows to the
  out dir, their urls to the seen dir) keyed by ``batch_id`` so a
  replayed batch overwrites rather than duplicates — exactly-once
  downstream given the checkpointed source offsets.
- Watermarked windowed aggregation (``host_rate_metrics``) gives
  per-host scheduling-rate observability with bounded state; late
  discoveries beyond the watermark are dropped from metrics only,
  never from scheduling.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..functions.urls import canonicalize_url, host_of
from ..operators.bloom import build_bloom_shards, bloom_gated_anti_join
from ..operators.politeness import politeness_gate

CANDIDATE_SCHEMA = "url STRING, priority INT, discovered_ts TIMESTAMP"


@dataclass
class StreamConfig:
    seen_dir: str                 # persistent URL-seen set (parquet)
    out_dir: str                  # scheduled-URL sink (parquet, per-batch subdirs)
    checkpoint_dir: str           # Structured Streaming offset/commit log
    default_budget: int = 1_000_000
    bloom_shards: int = 32
    bloom_threshold: int = 100_000  # build a Bloom gate only past this seen-set size


def _read_seen(spark: SparkSession, seen_dir: str, exclude_batch: int) -> DataFrame:
    """Seen set from all committed batches EXCEPT ``exclude_batch``: a
    replayed batch must not dedupe against its own prior output (that
    would drop its rows and overwrite the sink with nothing)."""
    if os.path.isdir(seen_dir) and any(
        f.endswith(".parquet") for _, _, fs in os.walk(seen_dir) for f in fs
    ):
        return (
            spark.read.parquet(seen_dir)
            .where(F.col("batch_id") != exclude_batch)
            .select("fetch_url")
        )
    return spark.createDataFrame([], "fetch_url STRING")


def process_candidate_batch(
    spark: SparkSession, batch_df: DataFrame, batch_id: int, cfg: StreamConfig
) -> None:
    """One micro-batch of the frontier stream (also callable directly —
    the unit tests drive it both ways)."""
    cand = (
        batch_df.select(
            canonicalize_url(F.col("url")).alias("fetch_url"),
            F.col("priority"),
        )
        .dropDuplicates(["fetch_url"])
    )
    seen = _read_seen(spark, cfg.seen_dir, exclude_batch=batch_id)

    n_seen = seen.count()
    if n_seen >= cfg.bloom_threshold:
        bloom = build_bloom_shards(
            seen, "fetch_url", n_shards=cfg.bloom_shards, expected_items=n_seen
        )
        fresh = bloom_gated_anti_join(cand, seen, bloom, "fetch_url")
    else:
        fresh = cand.join(seen, "fetch_url", "left_anti")

    scheduled, _deferred = politeness_gate(
        fresh, None, default_budget=cfg.default_budget
    )
    # Idempotent per-batch dirs: a replayed batch overwrites its own
    # output instead of appending a duplicate; the dir name doubles as
    # a hive-style `batch_id` partition column on read.
    scheduled.write.mode("overwrite").parquet(f"{cfg.out_dir}/batch_id={batch_id}")
    scheduled.select("fetch_url").write.mode("overwrite").parquet(
        f"{cfg.seen_dir}/batch_id={batch_id}"
    )


def run_frontier_stream(
    spark: SparkSession,
    source_dir: str,
    cfg: StreamConfig,
    available_now: bool = True,
) -> StreamingQuery:
    """Start the streaming scheduler over a file-source drop directory.

    ``available_now=True`` drains what exists and stops (deterministic
    for tests / catch-up runs); ``False`` runs continuously.
    """
    candidates = (
        spark.readStream.schema(CANDIDATE_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(source_dir)
    )
    writer = candidates.writeStream.foreachBatch(
        lambda df, bid: process_candidate_batch(spark, df, bid, cfg)
    ).option("checkpointLocation", cfg.checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def host_rate_metrics(
    candidates: DataFrame, window: str = "1 minute", watermark: str = "2 minutes"
) -> DataFrame:
    """Watermarked per-host discovery-rate metrics (bounded state):
    append-mode windowed counts keyed by (window, host)."""
    return (
        candidates.withWatermark("discovered_ts", watermark)
        .groupBy(
            F.window("discovered_ts", window).alias("w"),
            host_of(F.col("url")).alias("host"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.min("priority").alias("top_priority"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "host",
            "n_urls",
            "top_priority",
        )
    )
