"""Data-selection importance weighting (DSIR-style, integer-exact).

Data Selection with Importance Resampling (Xie et al., 2023) scores
every raw document by how much its hashed n-gram distribution looks
like a small TARGET corpus (the domain you want more of), then keeps
the high scorers.  The published method uses log-ratios of hashed
unigram/bigram probabilities; this engine implements the same
structure with integer ratio weights so the score is bit-replayable
across engines (no float log accumulation to disagree about):

    w[b]       = (target_count[b] * SCALE) // corpus_count[b]
    score(doc) = sum over token occurrences of w[bucket(token)]

- buckets unseen in the target weigh 0 (they carry no evidence FOR
  the target); buckets unseen in the corpus cannot occur in a doc.
- ``//`` here is non-negative-over-positive, where DuckDB's
  truncating division and Spark's floor agree exactly.
- feature hashing is the same md5-hex arithmetic as every other
  engine-portable hash in this repo.

Scale shape (the part that matters at 100 TB):

- corpus bucket counts: explode -> groupBy over B keys.  B is tiny
  (hundreds to 2^18), so map-side partial aggregation collapses each
  task's output to <= B rows and the shuffle moves kilobytes per
  task regardless of corpus size — low-cardinality groupBys are
  cheap BECAUSE of partial agg, not despite it.
- target bucket counts: same over the (small) target corpus.
- the weight table (B rows) rides a BROADCAST join onto the exploded
  token stream; the per-doc sum is one shuffle keyed on doc id.
- total: two tiny aggs + one narrow map + one doc-keyed shuffle.
  Nothing quadratic, nothing driver-side, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens
from .classifier import hash_bucket

SCALE = 1_000_000


def bucket_counts(df: DataFrame, text_col: str, buckets: int) -> DataFrame:
    """Token-occurrence counts per hash bucket: ``_bucket``, ``_cnt``."""
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("_token"))
        .select(hash_bucket(F.col("_token"), buckets).alias("_bucket"))
        .groupBy("_bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("_cnt"))
    )


def importance_weights(
    corpus: DataFrame, target: DataFrame, text_col: str, buckets: int
) -> DataFrame:
    """Per-bucket integer importance weights: ``_bucket``,
    ``_weight_ppm`` = target_count * SCALE // corpus_count.  Buckets
    absent from the target get weight 0; the join is on the corpus
    side so every bucket a corpus doc can hit has a row."""
    c = bucket_counts(corpus, text_col, buckets).withColumnRenamed("_cnt", "_ccnt")
    t = bucket_counts(target, text_col, buckets).withColumnRenamed("_cnt", "_tcnt")
    # Pure 64-bit integer division (`div`), never a double detour: at
    # web scale target_count * SCALE exceeds 2^53 and a double cast
    # would silently round the weight.
    return c.join(t, "_bucket", "left").select(
        "_bucket",
        F.expr(f"coalesce(_tcnt, 0L) * {SCALE}L div _ccnt")
        .cast("long")
        .alias("_weight_ppm"),
    )


def importance_scores(
    corpus: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    buckets: int = 256,
) -> DataFrame:
    """Score every corpus doc by summed bucket importance.

    Returns one row per corpus doc: ``<id_col>``, ``n_tokens``,
    ``importance_raw`` (long — sum of per-occurrence weights; divide
    by ``n_tokens`` downstream if a length-normalized score is
    wanted), computed against the target slice.  Zero-token docs
    score 0.  Deterministic: same corpus + target -> same scores on
    any partitioning or engine."""
    w = importance_weights(corpus, target, text_col, buckets)
    sel = corpus.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_tk")
    ).select(id_col, "_tk", F.size("_tk").cast("long").alias("n_tokens"))
    ex = sel.select(id_col, "n_tokens", F.explode("_tk").alias("_token")).withColumn(
        "_bucket", hash_bucket(F.col("_token"), buckets)
    )
    scored = (
        ex.join(F.broadcast(w), "_bucket", "left")
        .groupBy(id_col, "n_tokens")
        .agg(
            F.coalesce(F.sum("_weight_ppm"), F.lit(0))
            .cast("long")
            .alias("importance_raw")
        )
    )
    empties = sel.where(F.size("_tk") == 0).select(
        id_col,
        F.lit(0).cast("long").alias("n_tokens"),
        F.lit(0).cast("long").alias("importance_raw"),
    )
    return scored.unionByName(empties)
