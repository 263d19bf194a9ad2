"""BPE fitting: merge-sequence parity with the classic reference
implementation, determinism under repartition, apply semantics."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from crawler_apple_podcast_spark.operators.bpe import (
    EOW,
    apply_bpe,
    train_bpe,
    word_types,
)


def _ref_bpe(word_freqs: dict[str, int], n_merges: int, min_freq: int = 2):
    """Sennrich-style reference: pair stats over typed vocab, greedy
    leftmost apply, (freq desc, pair asc) tiebreak."""
    vocab = {w: list(w) + [EOW] for w in word_freqs}
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, syms in vocab.items():
            for x, y in zip(syms, syms[1:]):
                pairs[(x, y)] += word_freqs[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_freq:
            break
        (a, b) = best[0]
        merges.append((a, b))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "wider wider new new",
]


def _docs(spark, parts=4):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id LONG, text STRING"
    ).repartition(parts)


def test_merge_sequence_matches_reference(spark):
    docs = _docs(spark)
    wf = {r.word: r.freq for r in word_types(docs).collect()}
    want, _ = _ref_bpe(wf, 10)
    got = train_bpe(spark, docs, 10)
    assert got == want
    assert len(got) >= 5  # the classic corpus yields real merges


def test_deterministic_under_repartition(spark):
    a = train_bpe(spark, _docs(spark, 1), 6)
    b = train_bpe(spark, _docs(spark, 7), 6)
    assert a == b


def test_apply_matches_reference_vocab(spark):
    docs = _docs(spark)
    wf = {r.word: r.freq for r in word_types(docs).collect()}
    merges, vocab = _ref_bpe(wf, 8)
    enc = apply_bpe(
        spark.createDataFrame([(0, "newest wider low")], "doc_id LONG, text STRING"),
        train_bpe(spark, docs, 8),
    ).first()["bpe_tokens"]
    assert enc == vocab["newest"] + vocab["wider"] + vocab["low"]


def test_overlapping_merge_is_leftmost_greedy(spark):
    docs = spark.createDataFrame([(0, "aaa aaa aaa")], "doc_id LONG, text STRING")
    merges = train_bpe(spark, docs, 1, min_freq=1)
    assert merges[0] == ("a", "a")
    enc = apply_bpe(docs.limit(1), merges).first()["bpe_tokens"]
    # 'aaa' -> [aa, a, </w>]: leftmost-first, no overlap reuse
    assert enc[:3] == ["aa", "a", EOW]
