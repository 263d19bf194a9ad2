"""Collocation (statistically-bound phrase) extraction.

PMI-ranked bigram collocations are a standard corpus-analysis tool for
a training-data pipeline (phrase vocabularies, tokenizer seeding,
boilerplate phrase discovery).  PMI's ordering is fully determined by
the *lift* rational ``C(ab)·N / (C(a)·C(b))`` — log is monotone — so
ranking and thresholding never need floats: this implementation scores
``lift_milli = floor(C(ab)·N·1000 / (C(a)·C(b)))``, exact integer
arithmetic that a SQL oracle replays bit-for-bit.

Plan shape (the part that must survive 100 TB):
- bigram materialization is a zero-shuffle narrow map — ``arrays_zip``
  of the token array with its shift-by-one slice, no self-join on
  position;
- one shuffle each for the unigram and bigram count aggregates (both
  map-side combined);
- the scoring joins are vocab-sized (distinct tokens / distinct
  bigrams), orders of magnitude below corpus row counts, and the
  unigram side of each join is the smaller one;
- top-k is ``orderBy().limit()`` -> TakeOrderedAndProject (per-partition
  heaps + driver merge of k rows), never a global sort.

Overflow note: ``C(ab)·N·1000`` stays in BIGINT up to ~10^15 token
corpora per count bucket; past that, promote the product to
DECIMAL(38,0) — ordering semantics are unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bigram_rows(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc) -> one row per adjacent token pair (w1, w2).  Pure JVM:
    split -> zip with the shifted slice -> explode."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != F.lit(""))
    n = F.size("_ts")
    pairs = F.arrays_zip(
        F.slice("_ts", 1, F.greatest(n - 1, F.lit(0))).alias("w1"),
        F.slice(F.col("_ts"), F.lit(2), F.greatest(n - 1, F.lit(0))).alias("w2"),
    )
    return (
        df.select(F.col(id_col).alias("doc_id"), toks.alias("_ts"))
        .select("doc_id", F.explode(pairs).alias("_p"))
        .select("doc_id", F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2"))
    )


def collocation_lift_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 100,
    min_count: int = 3,
) -> DataFrame:
    """Top-``k`` bigram collocations by integer lift.

    Returns (w1, w2, n_ab, lift_milli), ordered by
    (lift_milli DESC, w1, w2) — a deterministic total order, so the
    k-boundary is engine-independent.  ``min_count`` suppresses the
    classic PMI pathology where a pair seen once between two hapaxes
    scores highest.
    """
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != F.lit(""))
    uni = (
        df.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cw"))
    )
    total = uni.agg(F.sum("cw").alias("n"))
    bi = (
        bigram_rows(df, id_col, text_col)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= min_count)
    )
    scored = (
        bi.join(uni.select(F.col("w").alias("w1"), F.col("cw").alias("ca")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("cw").alias("cb")), "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "w1",
            "w2",
            "n_ab",
            # `div` is Spark's exact BIGINT integer division (the / on
            # longs would detour through double and lose exactness).
            F.expr("(n_ab * n * 1000) div (ca * cb)").cast("long").alias("lift_milli"),
        )
    )
    return scored.orderBy(F.desc("lift_milli"), "w1", "w2").limit(k)
