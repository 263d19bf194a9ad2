"""Distributed BPE tokenizer fitting (Sennrich et al. 2016) — the
training-data pipeline step the corpus stats feed: learn the merge
table ON the corpus the model will train on.

Why this distributes cleanly: BPE trains on WORD TYPES weighted by
frequency, not on the token stream — and the type table is Zipf-small
relative to the corpus (10^5-10^7 types against 10^12 tokens), so one
corpus-wide token count builds the working set and every merge
iteration after that touches only the type table.  Per iteration:
one map-side-combined pair-count shuffle over the types, a 1-row
``max_by`` collect (the winning pair), and a pure-JVM fold that
rewrites each type's symbol array.  Driver state is the merge list —
``n_merges`` rows — never data.

Determinism: the winning pair breaks frequency ties lexicographically
(``(freq DESC, pair ASC)``), so the merge sequence is a pure function
of the type table and replays identically under any partitioning —
the pytest referee is the classic single-machine implementation.

The greedy left-to-right merge application is one ``aggregate`` lambda
per type (array-accumulator fold), exact BPE-apply semantics:
overlapping occurrences like ``a a a`` with merge ``(a, a)`` collapse
leftmost-first.  Lineage is truncated with ``localCheckpoint`` every
``checkpoint_every`` merges, or the 10^2-iteration plan tree blows up
Catalyst long before data size matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: end-of-word marker, per the original BPE formulation
EOW = "</w>"


def word_types(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``(word, freq)`` — the Zipf-compressed working set BPE trains
    on.  One shuffle; everything downstream is type-table-sized."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _initial_symbols(types: DataFrame) -> DataFrame:
    """Split each word type into its character symbols + EOW marker."""
    chars = F.filter(F.split(F.col("word"), ""), lambda c: c != "")
    return types.select(
        "word", "freq", F.concat(chars, F.array(F.lit(EOW))).alias("syms")
    )


def _pair_counts(syms: DataFrame) -> DataFrame:
    """Adjacent-symbol pair frequencies, weighted by type freq: the
    per-iteration aggregate (map-side combined, type-table-sized)."""
    pairs = F.when(
        F.size("syms") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("syms") - 1),
            lambda i: F.struct(
                F.element_at("syms", i).alias("a"),
                F.element_at("syms", i + 1).alias("b"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    return (
        syms.select("freq", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").alias("pair_freq"))
    )


def _apply_merge(syms_col, a: str, b: str):
    """Greedy leftmost merge of adjacent (a, b) into ``a+b`` — an
    array-accumulator fold, pure JVM."""
    merged = F.lit(a + b)
    return F.aggregate(
        syms_col,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def train_bpe(
    spark: SparkSession,
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_freq: int = 2,
    checkpoint_every: int = 8,
) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` BPE merges from the corpus; stops early
    when the best remaining pair's frequency drops below ``min_freq``.
    Returns the ordered merge list (the tokenizer artifact)."""
    syms = _initial_symbols(word_types(docs, text_col)).localCheckpoint()
    merges: list[tuple[str, str]] = []
    for i in range(n_merges):
        top = (
            _pair_counts(syms)
            .orderBy(F.desc("pair_freq"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["pair_freq"] < min_freq:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        syms = syms.select("word", "freq", _apply_merge(F.col("syms"), a, b).alias("syms"))
        if (i + 1) % checkpoint_every == 0:
            syms = syms.localCheckpoint()
    return merges


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize with a learned merge list: per word, split to chars +
    EOW and replay the merges in order — all JVM folds, a narrow map
    over the docs (no shuffle; at serving scale, apply to the DISTINCT
    word table and broadcast-join back instead)."""
    chars = lambda w: F.filter(F.split(w, ""), lambda c: c != "")  # noqa: E731
    word_syms = lambda w: F.concat(chars(w), F.array(F.lit(EOW)))  # noqa: E731

    def encode(w):
        s = word_syms(w)
        for a, b in merges:
            s = _apply_merge(s, a, b)
        return s

    words = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    return docs.withColumn(
        out_col, F.flatten(F.transform(words, encode))
    )
