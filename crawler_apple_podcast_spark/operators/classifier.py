"""Hashed-bag-of-words linear classifier scoring (fastText-style gate).

The production quality filter of most web-text pipelines (CCNet's
fastText language/quality gates, GPT-3's WebText-vs-CommonCrawl
logistic regression) is at serving time just::

    score(doc) = sum over token occurrences of W[hash(token) % B]

— a linear model over hashed bag-of-words features.  Training happens
offline; the *engine's* job is applying a fixed weight vector to
trillions of tokens.  This module implements exactly that serving
path, engine-portably:

- feature hashing is md5-hex arithmetic (``hash_bucket``), so any
  engine replays the bucket of a token bit-for-bit — no dependence on
  a Python ``hash()`` or a JVM murmur seed;
- weights live in a DataFrame (one row per bucket), broadcast-joined
  onto the exploded token stream — the model is DATA, swappable per
  run, not an expression baked into the plan (at B = 2^18 buckets a
  CASE expression would blow past codegen limits; a join does not);
- the score is an INTEGER sum of per-mille weights — no float
  accumulation order to disagree about, so the DuckDB oracle matches
  by value hash, and no division (DuckDB ``//`` truncates toward zero
  while Spark ``floor`` rounds down; signed scores never divide).

Scale shape: tokenize+explode+bucket is one narrow codegen map over
the scan; the weight join broadcasts (B rows, a few MB even at 2^20
buckets); the per-doc sum is ONE shuffle keyed on doc_id with
map-side partial aggregation.  At 100 TB nothing here is quadratic,
driver-bound, or per-row Python.

Reference parity note: the reference crawler has no quality model —
this is part of the training-data-pipeline layer the engine adds
(SURVEY.md §2.9).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens


def hash_bucket(key: Column, buckets: int) -> Column:
    """Uniform bucket in [0, buckets) from md5 of ``key``'s string
    form — first 6 hex chars as a 24-bit integer, mod ``buckets``
    (DuckDB replay: ``CAST('0x' || substr(md5(k),1,6) AS BIGINT) %
    B``).  Keep ``buckets`` far below 2^24 so the mod bias stays
    negligible."""
    return F.pmod(
        F.conv(F.substring(F.md5(key.cast("string")), 1, 6), 16, 10).cast("long"),
        F.lit(int(buckets)),
    )


def hash_weights(spark: SparkSession, buckets: int, lo: int = -1000, hi: int = 1000) -> DataFrame:
    """A deterministic stand-in weight vector: one row per bucket with
    an integer weight in [lo, hi] derived from md5 of the bucket id.
    Real deployments replace this with trained weights loaded from a
    table; every downstream shape (broadcast join, integer sum) is
    identical.  Columns: ``_bucket``, ``_weight_milli``."""
    span = int(hi) - int(lo) + 1
    b = F.col("id").cast("long")
    w = F.pmod(
        F.conv(F.substring(F.md5(b.cast("string")), 1, 6), 16, 10).cast("long"),
        F.lit(span),
    ) + F.lit(int(lo))
    return spark.range(int(buckets)).select(
        b.alias("_bucket"), w.cast("long").alias("_weight_milli")
    )


def classifier_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    weights: DataFrame,
    buckets: int,
    threshold: int = 0,
) -> DataFrame:
    """Score every document with the hashed linear model and gate on
    ``threshold``.

    Returns one row per input doc: ``<id_col>``, ``n_tokens`` (long),
    ``score_raw`` (long — the integer sum of per-occurrence weights;
    occurrences, not distinct tokens, exactly like a BoW dot product),
    and ``label`` ('keep' iff score_raw >= threshold).  Docs with zero
    tokens score 0.

    ``weights`` must have columns ``_bucket`` (long) and
    ``_weight_milli`` (long) covering every bucket in [0, buckets);
    missing buckets weigh 0 via the left join's coalesce.
    """
    sel = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_tk")
    ).select(
        id_col, "_tk", F.size("_tk").cast("long").alias("n_tokens")
    )
    ex = sel.select(
        id_col, "n_tokens", F.explode("_tk").alias("_token")
    ).withColumn("_bucket", hash_bucket(F.col("_token"), buckets))
    scored = (
        ex.join(F.broadcast(weights), "_bucket", "left")
        .groupBy(id_col, "n_tokens")
        .agg(
            F.coalesce(F.sum("_weight_milli"), F.lit(0)).cast("long").alias("score_raw")
        )
    )
    # Zero-token docs vanish at the explode; restore them with score 0
    # (a quality gate must emit a verdict for EVERY input row).
    empties = sel.where(F.size("_tk") == 0).select(
        id_col, F.lit(0).cast("long").alias("n_tokens"),
        F.lit(0).cast("long").alias("score_raw"),
    )
    return scored.unionByName(empties).select(
        id_col,
        "n_tokens",
        "score_raw",
        F.when(F.col("score_raw") >= F.lit(int(threshold)), F.lit("keep"))
        .otherwise(F.lit("drop"))
        .alias("label"),
    )
