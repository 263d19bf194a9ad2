"""Eval-set decontamination for training corpora.

The canonical pre-training hygiene op: drop every training document
that shares at least ``min_hits`` distinct word n-grams with a
benchmark/eval corpus, so the model is never scored on text it saw in
training.  (The reference crawler has no analog — this is engine
surface the 100 TB pipeline needs, like dedup/sampling.)

Scale shape: the eval corpus is small (thousands of docs) and the
training corpus is the 100 TB side, so the eval shingle set is built
once, made distinct, and BROADCAST; the training side is one shingle
explode joined against that broadcast (map-side hash lookup, no
shuffle of corpus shingles), a groupBy on doc_id for the distinct-hit
count, and a broadcast anti-join back onto the corpus.  The corpus is
scanned twice (shingle pass + final gate) and shuffled never.

Two keying modes, same semantics:
- ``use_hashes=True`` (default, the scale path): shingles travel as
  chained xxhash64 longs — 8 bytes each, no n-gram strings anywhere;
  equal up to 64-bit collisions (~1e-9 at 1e5-shingle eval sets).
- ``use_hashes=False``: shingle STRINGS, byte-exact — the oracle mode
  (xxhash64 is not replayable in DuckDB).  A pytest asserts both modes
  agree on the test corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import shingle_hashes, shingle_rows


def contamination_hits(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    use_hashes: bool = True,
) -> DataFrame:
    """(doc_id, n_contaminated): distinct n-grams each corpus doc
    shares with the eval corpus.  Docs with zero overlap are absent."""
    if use_hashes:
        ev = shingle_hashes(eval_df, id_col, text_col, n).select("_sh").distinct()
        doc_sh = shingle_hashes(corpus, id_col, text_col, n)
        key = "_sh"
    else:
        ev = shingle_rows(eval_df, id_col, text_col, n).select("shingle").distinct()
        doc_sh = shingle_rows(corpus, id_col, text_col, n)
        key = "shingle"
    return (
        doc_sh.join(F.broadcast(ev), key)
        .groupBy("doc_id")
        .agg(F.count_distinct(key).alias("n_contaminated"))
    )


def decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    min_hits: int = 1,
    use_hashes: bool = True,
) -> DataFrame:
    """Corpus minus every doc with >= ``min_hits`` distinct shared
    n-grams (all input columns preserved).  The contaminated-doc set is
    eval-sized at worst, so the final gate is a broadcast anti-join."""
    hits = contamination_hits(corpus, eval_df, id_col, text_col, n, use_hashes)
    bad = hits.where(F.col("n_contaminated") >= min_hits).select(
        F.col("doc_id").alias(id_col)
    )
    return corpus.join(F.broadcast(bad), id_col, "left_anti")
