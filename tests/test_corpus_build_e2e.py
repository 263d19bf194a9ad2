"""End-to-end training-data build: documents -> clean/gate/dedup
(corpus_prep_frame) -> leakage-safe split -> temperature mixture ->
sliding-window chunks -> range-ordered shards + manifest.

This is the composition test for the pipeline a real training-data
run would wire: every stage is an operator with its own oracle/tests;
here we assert the INVARIANTS that only hold if the stages compose
correctly (conservation, leakage, manifest integrity, determinism).
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from crawler_apple_podcast_spark.functions import text as T
from crawler_apple_podcast_spark.operators import similarity as S
from crawler_apple_podcast_spark.operators.budget import mixture_apportion
from crawler_apple_podcast_spark.operators.packing import chunk_documents
from crawler_apple_podcast_spark.operators.sampling import split_assign
from crawler_apple_podcast_spark.plans.shard_writer import write_corpus_shards
from crawler_apple_podcast_spark.queries import corpus_prep_frame

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    # corpus_prep_frame returns the accounting projection (no text);
    # join text/source back for the downstream stages
    prepped = corpus_prep_frame(docs.select("doc_id", "text")).join(
        docs.select("doc_id", "source", "text"), "doc_id"
    )
    split = split_assign(prepped, F.col("source"))
    chunks = chunk_documents(
        split.select("doc_id", "split", "source", T.tokens(F.col("text")).alias("tokens")),
        max_len=32,
    ).join(split.select("doc_id", "split", "source"), "doc_id")
    out_dir = str(tmp_path_factory.mktemp("shards"))
    manifest = write_corpus_shards(
        chunks.where(F.col("split") == "train"), out_dir, "doc_id", n_shards=4
    )
    return docs, prepped, split, chunks, out_dir, manifest


def test_token_conservation_through_chunking(spark, built):
    """Disjoint chunks (stride == max_len) partition every surviving
    doc's tokens exactly."""
    _, prepped, _, chunks, _, _ = built
    per_doc = {
        r.doc_id: r.tot
        for r in chunks.groupBy("doc_id").agg(F.sum("n_tokens").alias("tot")).collect()
    }
    want = {r.doc_id: r.n_tokens for r in prepped.select("doc_id", "n_tokens").collect()}
    assert per_doc == {k: v for k, v in want.items() if v > 0}


def test_no_near_dup_straddles_splits_within_host(spark, built):
    """split_assign keys on source, so every surviving near-dup pair
    with a shared source sits in one split — the leakage audit."""
    _, prepped, split, _, _, _ = built
    pairs = S.minhash_dedup_pairs(
        prepped.select("doc_id", "text"), "doc_id", "text", 3, 500
    )
    sa = split.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("sp_a"),
                      F.col("source").alias("src_a"))
    sb = split.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("sp_b"),
                      F.col("source").alias("src_b"))
    leaked = (
        pairs.join(sa, "doc_a").join(sb, "doc_b")
        .where((F.col("src_a") == F.col("src_b")) & (F.col("sp_a") != F.col("sp_b")))
    )
    assert leaked.count() == 0


def test_mixture_quota_covers_every_surviving_source(spark, built):
    _, prepped, _, _, _, _ = built
    counts = prepped.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    alloc = mixture_apportion(counts, total=1000)
    rows = alloc.collect()
    assert sum(r.alloc for r in rows) == 1000
    # sqrt flattening: every source with >= 1 doc gets a nonzero quota
    # at this budget (the tail isn't starved)
    assert all(r.alloc > 0 for r in rows)


def test_manifest_integrity_and_order(spark, built):
    _, _, _, chunks, out_dir, manifest = built
    n_train = chunks.where(F.col("split") == "train").count()
    assert manifest["total_rows"] == n_train
    assert os.path.exists(os.path.join(out_dir, "_shards.json"))
    with open(os.path.join(out_dir, "_shards.json")) as f:
        assert json.load(f)["total_rows"] == n_train
    # shard key ranges are disjoint and ordered (range repartition)
    files = manifest["files"]
    for a, b in zip(files, files[1:]):
        assert a["key_max"] <= b["key_min"]


def test_rebuild_is_deterministic(spark, built):
    docs, prepped, split, chunks, out_dir, manifest = built
    docs2 = spark.read.parquet(f"{SF}/documents.parquet").repartition(7)
    prepped2 = corpus_prep_frame(docs2.select("doc_id", "text")).join(
        docs2.select("doc_id", "source"), "doc_id"
    )
    split2 = split_assign(prepped2, F.col("source"))
    got = sorted(map(tuple, split2.select("doc_id", "split").collect()))
    want = sorted(map(tuple, split.select("doc_id", "split").collect()))
    assert got == want


def test_component_split_blocks_cross_source_leaks(spark, built):
    """The component-level split (operators/splits.py) closes the gap
    source-keyed splitting leaves open: near-dup pairs that span
    SOURCES still land on one side, and the budget-select stage
    downstream respects its global token budget on the train side."""
    from crawler_apple_podcast_spark.operators.packing import budget_select
    from crawler_apple_podcast_spark.operators.splits import leakage_safe_split

    _, prepped, _, _, _, _ = built
    pairs = S.minhash_dedup_pairs(
        prepped.select("doc_id", "text"), "doc_id", "text", 3, 500
    )
    csplit = leakage_safe_split(
        prepped.select("doc_id", "quality_milli", "n_tokens"), pairs, "doc_id",
        holdout_milli=200,
    )
    sa = csplit.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("sp_a"))
    sb = csplit.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("sp_b"))
    leaked = (
        pairs.join(sa, "doc_a").join(sb, "doc_b")
        .where(F.col("sp_a") != F.col("sp_b"))
    )
    assert leaked.count() == 0  # across sources too, not just within

    train = csplit.where(F.col("split") == "train")
    budget = 3000
    sel = budget_select(train, "n_tokens", budget, "quality_milli")
    got = sel.agg(F.sum("n_tokens")).first()[0]
    assert got is not None and got <= budget
    # maximality: the best-ranked dropped doc would not have fit
    kept = {r.doc_id for r in sel.select("doc_id").collect()}
    order = sorted(
        train.collect(), key=lambda r: (-r.quality_milli, r.doc_id)
    )
    for r in order:
        if r.doc_id not in kept:
            assert got + r.n_tokens > budget
            break
