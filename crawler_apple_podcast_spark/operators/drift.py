"""Corpus drift monitoring between crawl waves / corpus snapshots.

A continuously-crawled training corpus changes shape over time —
length mix, language mix, quality mix — and a pipeline that keeps
training on it needs a cheap alarm when a new wave's distribution
diverges from the reference corpus (seed-list rot, a spam network
entering the frontier, an extraction regression).  The standard
monitoring statistics (PSI, KL) need logarithms, which float-drift
across engines; this uses the chi-square-style symmetric statistic

    drift = sum_i (pa_i - pb_i)^2 / (pa_i + pb_i)

over per-mille bucket shares — same ordering behavior as PSI for
small shifts (both are f-divergences; this one is 2x the triangular
discrimination), but every step is exact integer arithmetic, so the
alarm threshold means the same thing on every engine and every rerun.

Spark shape: one tiny aggregate per snapshot (buckets are bounded by
construction: length bands, languages, quality deciles), a broadcast
full-outer join of the two bucket tables, and per-row integer math.
Nothing here scales with corpus size except the two map-side-combined
counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import idiv


def histogram_drift(
    cur: DataFrame,
    ref: DataFrame,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Per-bucket drift contributions between two snapshots:
    ``(bucket, n_cur, n_ref, cur_milli, ref_milli, contrib_milli)``
    where ``*_milli`` are per-mille shares of each snapshot and
    ``contrib_milli = (cur_milli - ref_milli)^2 div (cur_milli +
    ref_milli)`` (0 for an empty bucket pair).  Sum ``contrib_milli``
    for the corpus-level alarm score; per-bucket rows name the
    offending band.  A bucket present in only one snapshot counts the
    full one-sided share — new spam bands alarm loudly."""
    a = cur.groupBy(bucket_col).agg(F.count(F.lit(1)).alias("n_cur"))
    b = ref.groupBy(bucket_col).agg(F.count(F.lit(1)).alias("n_ref"))
    ta = a.agg(F.sum("n_cur").alias("_ta"))
    tb = b.agg(F.sum("n_ref").alias("_tb"))
    j = (
        a.join(b, bucket_col, "full_outer")
        .na.fill(0, ["n_cur", "n_ref"])
        .crossJoin(F.broadcast(ta))
        .crossJoin(F.broadcast(tb))
    )
    pa = idiv(F.col("n_cur") * F.lit(1000), F.col("_ta"))
    pb = idiv(F.col("n_ref") * F.lit(1000), F.col("_tb"))
    contrib = idiv((pa - pb) * (pa - pb), pa + pb)
    return j.select(
        bucket_col,
        F.col("n_cur").cast("long").alias("n_cur"),
        F.col("n_ref").cast("long").alias("n_ref"),
        pa.alias("cur_milli"),
        pb.alias("ref_milli"),
        contrib.alias("contrib_milli"),
    )
