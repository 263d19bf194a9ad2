"""TF-IDF term scoring over the document corpus.

Keyword indexing/scoring is the retrieval-side twin of the dedup
stack: same explode-shuffle skeleton, different aggregate.  The
reference never indexes text (it stores raw episode JSON,
/root/reference/handler/apple_podcast_api.py:60-76); a corpus engine
needs at least "top salient terms per document" for search, topic
audit, and quality triage.

Integer-exact scoring so the DuckDB oracle byte-matches: instead of a
float ``ln(N/df)`` (libm rounding differs across engines), the idf is
the rank-preserving scaled ratio ``(N * idf_scale) div df`` — floor
division, associative sums, no doubles anywhere.

Spark shape: explode tokens (map-side) -> groupBy (doc, term) for tf
(one shuffle, map-side combinable) -> groupBy term for df over the
*already-distinct* (doc, term) pairs — a plain count, never a
count-distinct over raw tokens (that would carry every token
occurrence into the shuffle) -> broadcast the single-row corpus size
-> per-doc top-k via a window bounded by the doc's vocabulary (never a
global sort).  Every stage is a standard two-phase aggregate; nothing
is driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens


def term_frequencies(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """``(id_col, term, tf)`` — whitespace-token term counts per doc."""
    return (
        docs.select(id_col, F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )


def tfidf_topk(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    idf_scale: int = 1000,
) -> DataFrame:
    """Top-``k`` terms per document by integer TF-IDF:
    ``(id_col, term, tf, score, rk)`` with
    ``score = tf * ((N * idf_scale) div df)`` and deterministic
    tie-break (score desc, term asc — binary UTF-8 order on both
    engines)."""
    tf = term_frequencies(docs, text_col, id_col)
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.agg(F.count_distinct(F.col(id_col)).alias("n"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n))
        .withColumn("score", F.col("tf") * F.expr(f"(n * {idf_scale}) div df"))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= k)
        .select(id_col, "term", "tf", "score", "rk")
    )
