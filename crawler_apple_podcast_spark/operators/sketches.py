"""Mergeable cardinality sketches (Apache DataSketches HLL via Spark
built-ins) for distinct-count accounting that never stores the set.

"How many distinct URLs has host H contributed across all waves?" at
10^10 frontier rows cannot keep per-host URL sets; the crawl ledger
instead stores one ~2^lgk-byte HLL sketch per (host) per wave and
MERGES them — union is associative/commutative, so per-wave sketches
roll up across any re-partitioning, and the estimate is within ~1.6%
(lgk=12) with high probability.  Everything here is Spark's built-in
``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``
(JVM DataSketches, codegen aggregate with map-side partials) — no
Python in the path.

Honesty contract (repo-wide): approximate structures must be checked
against exact computation.  The estimates cannot byte-match a DuckDB
oracle (different sketch family), so the driver entry asserts the
BOUND — per-key ``|estimate - exact| <= tol`` as a boolean the oracle
predicts as TRUE — and pytest asserts the rollup contract: the union
of per-wave sketches honors the same bound under any input
partitioning.  Estimates are NOT byte-stable across merge shapes —
sparse-vs-dense promotion and the order-dependent HIP estimator make
a direct build, a rollup, and a repartitioned rollup all slightly
different — so the BOUND, not estimate identity, is the guarantee.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_build(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    lgk: int = 12,
) -> DataFrame:
    """One HLL sketch (binary) per key group over ``value_col``."""
    return df.groupBy(*key_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lgk)).alias("hll")
    )


def hll_merge(sketches: DataFrame, key_cols: list[str]) -> DataFrame:
    """Union per-group sketches (e.g. per-wave rows) down to one sketch
    per key — the cross-wave rollup."""
    return sketches.groupBy(*key_cols).agg(
        F.hll_union_agg("hll").alias("hll")
    )


def hll_estimate(sketches: DataFrame) -> DataFrame:
    """Add ``distinct_est`` (long) from the ``hll`` column."""
    return sketches.withColumn(
        "distinct_est", F.hll_sketch_estimate("hll").cast("long")
    )


def distinct_within_tolerance(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    tol_milli: int = 50,
    lgk: int = 12,
) -> DataFrame:
    """Per-key exact distinct count plus the sketch-accuracy invariant:
    ``(keys..., n_distinct, within_tol)`` where ``within_tol`` is
    ``|hll_estimate - exact| * 1000 <= tol_milli * exact``.  The exact
    count is computed alongside (this is the VALIDATION query — at
    production scale only the sketch side runs); lgk=12 gives ~1.6%
    relative standard error, so tol 5% holds with overwhelming
    probability at any cardinality."""
    agg = df.groupBy(*key_cols).agg(
        F.countDistinct(value_col).alias("n_distinct"),
        F.hll_sketch_agg(value_col, F.lit(lgk)).alias("hll"),
    )
    est = F.hll_sketch_estimate("hll").cast("long")
    return agg.select(
        *key_cols,
        "n_distinct",
        (
            F.abs(est - F.col("n_distinct")) * F.lit(1000)
            <= F.lit(tol_milli) * F.col("n_distinct")
        ).alias("within_tol"),
    )
