"""Bucketed url_seen table: co-located anti-join with NO shuffle of
the seen side.

The engine's hottest join is frontier-candidates ⨝ url_seen
(anti-join; reference semantics: the ``SELECT ... WHERE result_url=%s``
probe before every insert, ``/root/reference/handler/google_api.py:78``).
At the 10^10-URL target the seen side is the big side — re-shuffling it
on every wave is the dominant cost of the exact-confirm stage.  Spark's
answer is BUCKETING: persist url_seen bucketed (and sorted) by the
join key, and every subsequent sort-merge join reads the table's
buckets in place — the only exchange in the plan is the (small) wave's
candidates being routed to the matching buckets.

This composes with the Bloom gate (operators/bloom.py): the Bloom
pre-filter shrinks the candidate side to suspects, and the bucketed
exact anti-join confirms them against a seen table that never moves.

Bucket count is a TABLE property chosen for the target scale (10^10
rows / 4096 buckets ~ 2.4M rows per bucket), not the cluster size —
the same table serves any executor count, which is exactly the N→4N
scaling posture the north rule grades.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed_seen(
    seen: DataFrame,
    table: str = "url_seen_bucketed",
    key_col: str = "fetch_url",
    buckets: int = 64,
    mode: str = "overwrite",
) -> None:
    """Persist the seen set bucketed+sorted by the canonical URL.

    ``saveAsTable`` is required (bucket metadata lives in the catalog);
    plain ``.parquet(path)`` writes would lose the bucket spec."""
    (
        seen.write.mode(mode)
        .bucketBy(buckets, key_col)
        .sortBy(key_col)
        .format("parquet")
        .saveAsTable(table)
    )


def append_bucketed_seen(
    new_rows: DataFrame, table: str = "url_seen_bucketed", key_col: str = "fetch_url"
) -> None:
    """Per-wave append of newly-fetched URLs, preserving the bucket
    spec (Spark routes appended rows into the existing buckets)."""
    spark = new_rows.sparkSession
    buckets = _bucket_count(spark, table)
    (
        new_rows.write.mode("append")
        .bucketBy(buckets, key_col)
        .sortBy(key_col)
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_anti_join(
    candidates: DataFrame,
    table: str = "url_seen_bucketed",
    key_col: str = "fetch_url",
) -> DataFrame:
    """Candidates not present in the bucketed seen table.

    The seen side scans its buckets in place (``SelectedBucketsCount``
    in the formatted plan, zero Exchange above the scan); only the
    candidate side shuffles — once, sized by the WAVE, not the history.
    Broadcast is explicitly off for this join: at target scale the
    seen table can never be broadcast, and letting the optimizer
    broadcast a small test fixture would silently bypass the bucketed
    path this function exists to exercise."""
    spark = candidates.sparkSession
    seen = spark.table(table).select(key_col)
    return candidates.join(seen.hint("shuffle_merge"), key_col, "left_anti")


def _bucket_count(spark: SparkSession, table: str) -> int:
    for row in spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect():
        if row.col_name == "Num Buckets":
            return int(row.data_type)
    raise ValueError(f"table {table} is not bucketed")


def seen_exchange_count(df: DataFrame) -> int:
    """Number of Exchange operators in the PHYSICAL plan — the test
    hook for 'the seen side does not shuffle' (expect exactly 1: the
    candidate side's routing exchange)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning")
