"""Deduplication & similarity search for training-data pipelines.

Scale-first designs, all DataFrame-native where possible:

- exact dedup            hash-groupBy (md5 of normalized text)
- n-gram Jaccard         shingle explode + self-join (the exact oracle)
- MinHash + LSH          seeded ``xxhash64`` signature (JVM-side, no
                         Python), banded bucket join for candidates,
                         exact-Jaccard confirmation — like the Bloom
                         gate, the approximate stage only *prunes*, so
                         the output equals the exact computation
- SimHash                64 per-bit aggregates -> fingerprint; chunked
                         pigeonhole candidate join + exact Hamming
- ANN cosine top-k       brute-force zip_with/aggregate baseline and an
                         LSH-bucketed (random hyperplane) scale path

All thresholds use integer per-mille arithmetic so results are exactly
reproducible in the DuckDB oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import idiv, tokens

# ---------------------------------------------------------------- exact


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One representative (min id) per distinct text hash."""
    return (
        df.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
    )


# ------------------------------------------------------------- shingles


def shingle_rows(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles, one row per (doc, shingle)."""
    toks = tokens(F.col(text_col))
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - n + 1),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array())
    return (
        df.select(F.col(id_col).alias("doc_id"), F.explode(grams).alias("shingle"))
        .distinct()
    )


def jaccard_pairs(
    shingles: DataFrame, threshold_milli: int = 800, candidates: DataFrame | None = None
) -> DataFrame:
    """Exact n-gram Jaccard over all pairs (or only ``candidates``
    pairs with columns doc_a/doc_b).  Returns doc_a, doc_b,
    jaccard_milli."""
    counts = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = shingles.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = shingles.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    if candidates is not None:
        inter = inter.join(candidates.select("doc_a", "doc_b").distinct(), ["doc_a", "doc_b"], "left_semi")
    na = counts.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    nb = counts.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            idiv(
                F.col("inter") * F.lit(1000),
                F.col("na") + F.col("nb") - F.col("inter"),
            ).alias("jaccard_milli"),
        )
        .where(F.col("jaccard_milli") >= threshold_milli)
    )


# -------------------------------------------------------------- MinHash


def minhash_signatures(shingles: DataFrame, n_hashes: int = 64) -> DataFrame:
    """(doc_id, m0..m{n-1}) — min over seeded xxhash64 per hash family.
    Entirely JVM-side; one shuffle (the groupBy).

    The shingle string is hashed ONCE (``xxhash64(shingle)``); the
    n-hash family is derived from that 8-byte long
    (``xxhash64(h, i)``), so per-family cost is fixed-width instead of
    re-hashing the full string n times — ~n× less string traffic on
    the dominant map stage.  Partial (map-side) min aggregation means
    the shuffle carries one 64-column row per (doc, partition).
    """
    hashed = shingles.select("doc_id", F.xxhash64("shingle").alias("_sh"))
    derived = hashed.select(
        "doc_id", *[F.xxhash64("_sh", F.lit(i)).alias(f"h{i}") for i in range(n_hashes)]
    )
    return derived.groupBy("doc_id").agg(
        *[F.min(f"h{i}").alias(f"m{i}") for i in range(n_hashes)]
    )


def lsh_candidate_pairs(signatures: DataFrame, bands: int = 16, rows_per_band: int = 4) -> DataFrame:
    """Banded LSH: docs sharing any band bucket become a candidate pair."""
    band_cols = [
        F.struct(
            F.lit(j).alias("band"),
            F.xxhash64(*[F.col(f"m{j * rows_per_band + r}") for r in range(rows_per_band)]).alias("key"),
        )
        for j in range(bands)
    ]
    buckets = signatures.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a = buckets.select(F.col("doc_id").alias("doc_a"), "band", "key")
    b = buckets.select(F.col("doc_id").alias("doc_b"), "band", "key")
    return (
        a.join(b, ["band", "key"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold_milli: int = 800,
    n_hashes: int = 64,
    bands: int = 16,
    rows_per_band: int = 4,
) -> DataFrame:
    """MinHash-LSH near-dup detection with exact confirmation: LSH only
    prunes the pair space; every surviving pair is exact-Jaccard
    checked, so output == the all-pairs exact computation (up to LSH
    recall, which the banding parameters make ~1 at the threshold)."""
    sh = shingle_rows(df, id_col, text_col, n).persist()  # reused by both stages
    cands = lsh_candidate_pairs(minhash_signatures(sh, n_hashes), bands, rows_per_band)
    return jaccard_pairs(sh, threshold_milli, candidates=cands)


# -------------------------------------------------------------- SimHash


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 64) -> DataFrame:
    """64-bit SimHash, fully native: per-token xxhash64, per-bit ±count
    aggregate, sign -> bit assembly."""
    tok = df.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("tok")
    ).withColumn("th", F.xxhash64("tok"))
    bit_sums = tok.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("th"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"s{i}")
            for i in range(bits)
        ]
    )
    fp = None
    for i in range(bits):
        term = F.shiftleft(
            F.when(F.col(f"s{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long")), i
        )
        fp = term if fp is None else fp.bitwiseOR(term)
    return bit_sums.select("doc_id", fp.alias("simhash"))


def simhash_near_pairs(
    sims: DataFrame, max_hamming: int = 6, chunks: int = 8
) -> DataFrame:
    """Pairs with Hamming distance <= ``max_hamming``.  Pigeonhole: with
    ``chunks`` 8-bit chunks, any pair within distance ``chunks-1`` must
    agree on >= one chunk — candidate join per chunk, exact bit_count
    confirm."""
    assert max_hamming < chunks
    width = 64 // chunks
    chunk_cols = [
        F.shiftrightunsigned(F.col("simhash"), i * width)
        .bitwiseAND(F.lit((1 << width) - 1))
        .alias(f"c{i}")
        for i in range(chunks)
    ]
    ch = sims.select("doc_id", "simhash", *chunk_cols)
    pieces = ch.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[F.struct(F.lit(i).alias("ci"), F.col(f"c{i}").alias("cv")) for i in range(chunks)]
            )
        ).alias("p"),
    ).select("doc_id", "simhash", F.col("p.ci").alias("ci"), F.col("p.cv").alias("cv"))
    a = pieces.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sa"), "ci", "cv")
    b = pieces.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sb"), "ci", "cv")
    cand = (
        a.join(b, ["ci", "cv"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sa", "sb")
        .distinct()
    )
    return cand.select(
        "doc_a",
        "doc_b",
        F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).alias("hamming"),
    ).where(F.col("hamming") <= max_hamming)


# ------------------------------------------------------------------ ANN


def cosine_topk_bruteforce(
    embeddings: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """Exact cosine top-k: zip_with dot product in double, JVM-side."""
    q = F.array(*[F.lit(float(x)) for x in query])
    qnorm = float(np.sqrt(sum(x * x for x in query)))
    dot = F.aggregate(
        F.zip_with(F.col(vec_col), q, lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = F.sqrt(
        F.aggregate(
            F.transform(F.col(vec_col), lambda a: a.cast("double") * a.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    sim = dot / (norm * F.lit(qnorm))
    return (
        embeddings.select(F.col(id_col), F.round(sim, round_digits).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def hyperplane_signatures(
    embeddings: DataFrame,
    dim: int,
    n_planes: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH bucket id per vector (vectorized Arrow UDF —
    one numpy matmul per batch)."""
    rng = np.random.RandomState(seed)
    planes = rng.randn(n_planes, dim).astype(np.float64)
    spark = embeddings.sparkSession
    bc = spark.sparkContext.broadcast(planes)

    @F.pandas_udf("long")
    def _bucket(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())
        bits = (m.astype(np.float64) @ bc.value.T) > 0
        weights = (1 << np.arange(bits.shape[1])).astype(np.int64)
        return pd.Series(bits @ weights)

    return embeddings.select(F.col(id_col), F.col(vec_col), _bucket(F.col(vec_col)).alias("bucket"))


def cosine_topk_lsh(
    embeddings: DataFrame,
    query: list[float],
    k: int = 10,
    n_planes: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scale path: search only the query's hyperplane bucket (recall
    traded for a ~2^n_planes fan-in reduction; multi-probe = lower
    n_planes)."""
    dim = len(query)
    sigs = hyperplane_signatures(embeddings, dim, n_planes, seed, id_col, vec_col)
    rng = np.random.RandomState(seed)
    planes = rng.randn(n_planes, dim)
    qbits = (planes @ np.asarray(query)) > 0
    qbucket = int((qbits * (1 << np.arange(n_planes))).sum())
    in_bucket = sigs.where(F.col("bucket") == qbucket).select(id_col, vec_col)
    return cosine_topk_bruteforce(in_bucket, query, k, id_col, vec_col)
