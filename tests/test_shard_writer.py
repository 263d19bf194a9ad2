"""Training-shard writer: exact content preservation, per-file caps,
within-file ordering, and non-overlapping file key ranges."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from crawler_apple_podcast_spark.plans.shard_writer import write_corpus_shards


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.range(10_000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id").cast("string")).alias("text"),
    )


def test_contents_preserved_and_files_capped(spark, corpus, tmp_path):
    out = str(tmp_path / "shards")
    m = write_corpus_shards(corpus, out, "doc_id", n_shards=8, max_records_per_file=900)
    assert m["total_rows"] == 10_000
    back = spark.read.parquet(out)
    assert back.count() == 10_000
    assert back.select(F.sum("doc_id")).first()[0] == sum(range(10_000))
    assert all(f["rows"] <= 900 for f in m["files"])
    assert len(m["files"]) >= 12  # 10k rows / 900 cap


def test_files_are_sorted_and_ranges_disjoint(spark, corpus, tmp_path):
    out = str(tmp_path / "shards2")
    m = write_corpus_shards(corpus, out, "doc_id", n_shards=4)
    # within-file: physically sorted on the key
    for f in m["files"]:
        vals = pq.read_table(f"{out}/{f['file']}", columns=["doc_id"])["doc_id"].to_pylist()
        assert vals == sorted(vals)
        assert vals[0] == f["key_min"] and vals[-1] == f["key_max"]
    # across files: key ranges never overlap (global range order)
    spans = sorted((f["key_min"], f["key_max"]) for f in m["files"])
    for (a_lo, a_hi), (b_lo, b_hi) in zip(spans, spans[1:]):
        assert a_hi < b_lo
