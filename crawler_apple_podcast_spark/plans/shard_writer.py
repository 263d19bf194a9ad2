"""Training-shard output layout: the last stage of a corpus build.

A dataloader wants the prepared corpus as N roughly-equal parquet
shards, globally range-ordered on a shuffle key (so shard i holds a
contiguous key range and a sequential reader streams the corpus in
key order), with per-file row counts capped.  ``df.write.parquet``
alone gives neither: file boundaries follow whatever partitioning the
last shuffle left, and nothing orders across files.

Spark shape: ``repartitionByRange(n_shards, key)`` (one shuffle whose
range boundaries come from Spark's reservoir sampling — the same
mechanism a sort uses, so shard sizes track the key distribution) +
``sortWithinPartitions(key)`` (in-shard order without a second
exchange) + ``maxRecordsPerFile`` (hard per-file cap even when a
range boundary lands badly, e.g. a single hot key).  At 100 TB this
is exactly one extra shuffle over the final frame — there is no
cheaper way to get global order — and the writer stays entirely
JVM-side.

Determinism note: range boundaries are SAMPLED, so shard *boundaries*
can shift between runs on different partitionings; the CONTENTS
(row set) and the within-shard order rule are deterministic, and the
manifest records the boundaries actually used so a resume/debug run
can see them.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_corpus_shards(
    df: DataFrame,
    out_dir: str,
    key_col: str,
    n_shards: int,
    max_records_per_file: int = 1_000_000,
) -> dict[str, Any]:
    """Write ``df`` as ``n_shards`` range-ordered parquet shards and a
    ``_shards.json`` manifest (per-shard row counts + key ranges).
    Returns the manifest dict."""
    shaped = df.repartitionByRange(n_shards, F.col(key_col)).sortWithinPartitions(
        key_col
    )
    (
        shaped.write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .parquet(out_dir)
    )
    # Manifest from the data just written (one scan of the output):
    # per-file row counts and key ranges, using the file name Spark
    # recorded for each row.
    spark = df.sparkSession
    written = spark.read.parquet(out_dir).withColumn(
        "_file", F.element_at(F.split(F.input_file_name(), "/"), -1)
    )
    stats = (
        written.groupBy("_file")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.min(key_col).alias("key_min"),
            F.max(key_col).alias("key_max"),
        )
        .orderBy("key_min", "_file")
        .collect()
    )
    manifest = {
        "key_col": key_col,
        "n_shards": n_shards,
        "max_records_per_file": max_records_per_file,
        "files": [
            {
                "file": r["_file"],
                "rows": r["rows"],
                "key_min": r["key_min"],
                "key_max": r["key_max"],
            }
            for r in stats
        ],
        "total_rows": sum(r["rows"] for r in stats),
    }
    with open(os.path.join(out_dir, "_shards.json"), "w") as f:
        json.dump(manifest, f, default=str)
    return manifest
