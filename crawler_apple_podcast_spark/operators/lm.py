"""Self-trained bigram language-model fluency scoring.

The CCNet recipe ranks web documents by LM perplexity; a float KenLM
is out of scope here (no model files, and libm floats break oracle
byte-parity), so this is the integer analog: train bigram counts on
the corpus itself, score each document by its MEAN bigram continuation
probability ``P(w2|w1) = C(w1,w2)/C(w1,·)`` in per-mille floor
arithmetic.  Word-salad documents (bigrams the corpus never repeats)
score near 0; formulaic ones score high — the same signal direction as
perplexity, rank-stable, and byte-reproducible on any engine.

Spark shape: bigram instances via a ``transform`` over an index
``sequence`` (``element_at`` stays in bounds, Spark 4 ANSI-safe) +
``explode`` — map-side.  ``C(w1,w2)`` and ``C(w1,·)`` are two
map-side-combinable aggregates; the instance table joins both back on
their own keys, then one doc-keyed aggregate averages.  Everything is
bounded by vocabulary size on the model side and corpus token count on
the instance side; nothing touches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def bigram_instances(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """``(id_col, w1, w2)`` — one row per adjacent token pair."""
    tk = tokens(F.col(text_col))
    # Spark's sequence(1, 0) DESCENDS ([1, 0]) — guard short docs with
    # NULL (explode drops them) instead of relying on an empty range.
    pairs = F.when(
        F.size(tk) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(tk) - 1),
            lambda i: F.struct(
                F.element_at(tk, i).alias("w1"),
                F.element_at(tk, i + 1).alias("w2"),
            ),
        ),
    )
    return docs.select(id_col, F.explode(pairs).alias("_bg")).select(
        id_col, F.col("_bg.w1").alias("w1"), F.col("_bg.w2").alias("w2")
    )


def bigram_continuation_score(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    scale: int = 1000,
) -> DataFrame:
    """``(id_col, n_bigrams, score_milli)`` with ``score_milli`` the
    floor-mean of per-bigram ``(scale * C(w1,w2)) div C(w1,·)`` over
    the doc's bigram instances; ``-1`` for docs with < 2 tokens."""
    inst = bigram_instances(docs, text_col, id_col)
    c2 = inst.groupBy("w1", "w2").agg(F.count("*").alias("_n2"))
    c1 = inst.groupBy("w1").agg(F.count("*").alias("_n1"))
    scored = (
        inst.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum(F.expr(f"({scale} * _n2) div _n1")).alias("_s"),
        )
    )
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce(F.expr("_s div n_bigrams"), F.lit(-1))
            .cast("long")
            .alias("score_milli"),
        )
    )
