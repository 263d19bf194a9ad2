"""Small-file compaction planning (Iceberg ``rewrite_data_files``
binpack-style) over a table's file manifest.

A 10^10-row crawl commits a wave of small parquet files per snapshot
(`plans/snapshots.py` writes one directory per wave); after thousands
of waves the table is millions of sub-target files and every scan pays
per-file open cost.  The maintenance decision — WHICH files to rewrite
together into ~target-size outputs — is itself a dataflow over the
file manifest (path, partition, bytes), tiny relative to the data it
describes, so the planner can run exact and single-pass.

Grouping rule: within each table partition, files are taken in
manifest order (file id) and assigned to the bin their *exclusive*
running-byte offset falls in — ``bin = prefix_bytes div target``.
Bins are therefore aligned to target-byte boundaries: every bin except
a partition's last holds >= target bytes, and a bin overflows by at
most one file (the straddler stays with the bin it started in).  This
is deliberately the closed-form variant of greedy first-fit — greedy
with per-bin reset is sequentially recursive and neither parallelizes
nor SQL-replays, while boundary-aligned packing is one window + one
groupBy and differs from greedy only in where a straddling file lands.

Spark shape: the lag-window prefix sum and the (partition, bin)
groupBy share the partition-key Exchange (window partition keys are a
prefix of the grouping keys) — the whole plan is ONE shuffle of
24-byte manifest rows.  No driver collection; output is the rewrite
work list a maintenance job maps over.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import idiv


def compaction_plan(
    files: DataFrame,
    target_bytes: int,
    part_col: str = "part",
    file_col: str = "file_id",
    size_col: str = "bytes",
) -> DataFrame:
    """``(part, bin, n_files, bin_bytes, first_file, last_file,
    compact)`` — the per-partition rewrite groups; ``compact`` marks
    bins worth rewriting (more than one input file)."""
    w = (
        Window.partitionBy(part_col)
        .orderBy(file_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pre = F.coalesce(F.sum(size_col).over(w), F.lit(0)).cast("long")
    binned = files.withColumn("bin", idiv(pre, F.lit(target_bytes)))
    return (
        binned.groupBy(part_col, "bin")
        .agg(
            F.count("*").alias("n_files"),
            F.sum(size_col).cast("long").alias("bin_bytes"),
            F.min(file_col).alias("first_file"),
            F.max(file_col).alias("last_file"),
        )
        .withColumn("compact", F.col("n_files") > 1)
    )
