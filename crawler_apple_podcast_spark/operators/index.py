"""Inverted-index (posting-list) construction.

The corpus-search shape a training-data pipeline needs for term-level
decontamination audits, targeted corpus slicing ("every doc containing
this benchmark phrase token"), and boilerplate forensics.  Output is
one row per surviving term: document frequency plus a capped, sorted
posting list serialized as a canonical comma-joined string (stable
across engines — the driver hash never sees engine array types).

Scale guards (the parts that matter at 100 TB):
- the document-frequency cutoff (``max_df_milli``) drops stopword-class
  terms BEFORE any posting list exists — "the" would otherwise carry a
  corpus-sized list through the shuffle;
- the per-term cap is applied with a ``row_number`` window BEFORE
  ``collect_list``, so no executor ever materializes more than
  ``max_postings`` ids per term; window and final group share the
  ``term`` shuffle key, so Catalyst plans ONE exchange for both;
- term-frequency aggregation is map-side combined.

Deliberate diamond: the (doc_id, term) set feeds both the df count and
the posting build, and the plan recomputes it once per branch (two
scans).  The single-pass alternative — df as a window count over the
same term partition — would carry every stopword occurrence through
the term shuffle and pin each hot term on one task; paying a second
pruned columnar scan to keep the df cutoff a *broadcast* pre-shuffle
filter is the right trade at corpus scale (persist the token set
explicitly if scans dominate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def build_postings(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_df_milli: int = 500,
    max_postings: int = 16,
) -> DataFrame:
    """(docs) -> (term, df, postings) with ``df`` the full document
    frequency and ``postings`` the ``max_postings`` smallest doc ids
    containing the term, sorted, comma-joined.  Terms present in more
    than ``max_df_milli``/1000 of documents are dropped."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != F.lit(""))
    tk = (
        df.select(F.col(id_col).alias("doc_id"), F.explode(toks).alias("term"))
        .distinct()
    )
    nd = df.agg(F.count(F.lit(1)).alias("nd"))
    keep = (
        tk.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(nd))
        .where(F.col("df") * 1000 <= F.col("nd") * F.lit(max_df_milli))
        .select("term", "df")
    )
    w = Window.partitionBy("term").orderBy("doc_id")
    capped = (
        tk.join(keep, "term")
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= max_postings)
    )
    return (
        capped.groupBy("term")
        .agg(
            F.max("df").alias("df"),
            F.concat_ws(",", F.sort_array(F.collect_list("doc_id"))).alias("postings"),
        )
    )
