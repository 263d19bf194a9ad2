"""Deterministic stratified sampling for training-corpus curation.

The standard mixture-shaping op in an LLM data pipeline: keep X per
mille of each stratum (language, quality band, source domain), with a
decision that is a PURE FUNCTION of the row key — no RNG state, no
``df.sample`` (whose Bernoulli draw depends on partitioning and seed
plumbing and is not replayable across engines).  Every row maps to a
bucket in [0, 1000) via md5 of its key; a row survives iff its bucket
is below its stratum's keep rate.  Properties that matter at 100 TB:

- reproducible: same key -> same decision on any cluster layout, any
  engine (the DuckDB oracle replays md5-hex arithmetic bit-for-bit);
- incremental: re-running over a grown corpus keeps exactly the
  previously-kept rows (no reshuffling of the sample as data arrives);
- monotone in rate: raising a stratum's rate only ADDS rows, so
  mixture re-weighting between pipeline versions is a superset diff;
- one narrow map + one broadcast join: rates are a tiny dimension
  table joined onto the scan, never a per-row Python call.

Scale shape: the bucket is md5 on an existing key column (codegen),
the rate lookup is a broadcast hash join against a frame with one row
per stratum, and the filter pushes past column pruning — zero
shuffles, zero Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 1000


def hash_bucket_milli(key: Column) -> Column:
    """Uniform bucket in [0, 1000) from the md5 of ``key``'s string
    form: the first 6 hex chars parsed as an integer (24 bits, so the
    mod-1000 bias is < 2^-14), identically computable in any engine
    with md5 + hex parsing (DuckDB: ``CAST('0x' || substr(md5(k),1,6)
    AS BIGINT)``).  NULL keys get NULL buckets (callers decide)."""
    return F.pmod(
        F.conv(F.substring(F.md5(key.cast("string")), 1, 6), 16, 10).cast("long"),
        F.lit(BUCKETS),
    )


def sample_stratified(
    df: DataFrame,
    stratum_col: Column | str,
    key_col: Column | str,
    rates_milli: dict[str, int],
    default_milli: int = 0,
) -> DataFrame:
    """Keep each row iff ``hash_bucket_milli(key) < rate`` for its
    stratum's rate (per mille).  Strata missing from ``rates_milli``
    (including NULL strata) fall back to ``default_milli``; NULL keys
    are always dropped (their bucket is NULL, and a row with no
    identity cannot be sampled reproducibly).

    Returns the input rows (all columns) plus ``_stratum`` and
    ``_bucket`` for auditability.  The rate table rides a broadcast
    join so the decision is data-plane, not a giant CASE expression —
    at thousands of strata (per-domain rates) the expression form
    would blow past codegen limits, the join form does not."""
    spark = df.sparkSession
    rates = spark.createDataFrame(
        [(k, int(v)) for k, v in sorted(rates_milli.items())],
        "_stratum STRING, _rate_milli INT",
    )
    stratum = F.col(stratum_col) if isinstance(stratum_col, str) else stratum_col
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    tagged = df.withColumn("_stratum", stratum).withColumn(
        "_bucket", hash_bucket_milli(key)
    )
    return (
        tagged.join(F.broadcast(rates), "_stratum", "left")
        .withColumn(
            "_rate_milli", F.coalesce(F.col("_rate_milli"), F.lit(int(default_milli)))
        )
        .where(F.col("_bucket") < F.col("_rate_milli"))
        .drop("_rate_milli")
    )


def split_assign(
    df: DataFrame,
    key_col: Column | str,
    splits_milli: list[tuple[str, int]] = (
        ("train", 900), ("val", 50), ("test", 50),
    ),
    out_col: str = "split",
) -> DataFrame:
    """Deterministic, leakage-safe train/val/test assignment: the
    bucket of ``key_col`` falls into cumulative per-mille ranges.

    Key the GROUP that leaks (host / registrable domain), not the
    document: near-duplicate pages of one site then land in the same
    split by construction, which hash-of-doc-id splits do not
    guarantee.  Same replayability properties as
    ``sample_stratified`` (pure function of the key, engine-portable
    md5 arithmetic, stable under corpus growth).  NULL keys get a NULL
    split.  The ranges must sum to exactly 1000.
    """
    pairs = list(splits_milli)
    if sum(m for _, m in pairs) != BUCKETS:
        raise ValueError(f"split fractions must sum to {BUCKETS}")
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    b = hash_bucket_milli(key)
    expr = None
    hi = 0
    for name, milli in pairs:
        hi += milli
        expr = F.when(b < hi, name) if expr is None else expr.when(b < hi, name)
    return df.withColumn(out_col, expr)
