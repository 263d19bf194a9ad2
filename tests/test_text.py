"""Text-analysis expressions vs straightforward Python reimplementations
and the sf0.001 documents table."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from crawler_apple_podcast_spark.functions import text as T

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def _py_tokens(s):
    return [t for t in s.split(" ") if t]


def test_token_counts(spark, docs):
    rows = docs.select(
        "text", T.token_count_ws(F.col("text")).alias("ws"), T.token_count_bpe(F.col("text")).alias("bpe")
    ).collect()
    pat = re.compile(r"[A-Za-z0-9']+|[^A-Za-z0-9\s]")
    for r in rows:
        assert r.ws == len(_py_tokens(r.text))
        assert r.bpe == len(pat.findall(r.text))


def test_stopword_and_lang(spark, docs):
    rows = docs.select(
        "text",
        T.stopword_count(F.col("text")).alias("sc"),
        T.stopword_ratio_milli(F.col("text")).alias("rm"),
        T.lang_id(F.col("text")).alias("lid"),
    ).collect()
    for r in rows:
        toks = _py_tokens(r.text)
        sc = sum(1 for t in toks if t in T.STOPWORDS)
        assert r.sc == sc
        want_rm = (sc * 1000) // len(toks) if toks else 0
        assert r.rm == want_rm
        assert r.lid == ("en" if want_rm >= 30 else "other")


def test_fingerprint_matches_python(spark, docs):
    rows = docs.select("text", T.fingerprint(F.col("text")).alias("fp")).collect()
    for r in rows:
        toks = _py_tokens(r.text)
        total = sum(
            (i + 1) * (ord(t[0]) + 31 * len(t)) for i, t in enumerate(toks)
        )
        assert r.fp == total % T.FINGERPRINT_MOD


def test_quality_score_range_and_determinism(spark, docs):
    a = [r.q for r in docs.select(T.quality_score_milli(F.col("text")).alias("q")).collect()]
    b = [r.q for r in docs.select(T.quality_score_milli(F.col("text")).alias("q")).collect()]
    assert a == b
    assert all(0 <= q <= 1000 for q in a)


def test_corpus_profile_median_rule(spark, tmp_path):
    """corpus_profile's histogram median equals the lower median
    (value at position ceil(n/2) in sorted order), checked on a
    hand-computable corpus with ties and both parities."""
    import statistics

    from crawler_apple_podcast_spark import queries as Q

    # 'the of and to in' repeated -> all-stopword docs => lang 'en';
    # token counts: en [2,2,4,6] (even, lower median 2), other [1,3,5] (odd, 3)
    rows = [
        (1, "the of"), (2, "the of"), (3, "the of and to"), (4, "the of and to in is"),
        (5, "x"), (6, "x y z"), (7, "x y z w v"),
    ]
    spark.createDataFrame(rows, "doc_id INT, text STRING").write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/documents.parquet")
    out = {
        r.lang: (r.n_docs, r.median_tokens)
        for r in Q.queries()["corpus_profile"](spark, str(tmp_path)).collect()
    }
    assert out == {"en": (4, 2), "other": (3, 3)}
    # cross-check the rule itself: statistics.median_low on each stratum
    assert statistics.median_low([2, 2, 4, 6]) == 2
    assert statistics.median_low([1, 3, 5]) == 3


def test_pii_scrub_golden_and_idempotent(spark):
    rows = [
        (1, "mail a.b+c@test.org or x@y.io, call +1-555-123-4567 ok"),
        (2, "no pii here"),
        (3, "+1-555-000-9999"),
    ]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    n_e, n_p = T.pii_counts(F.col("text"))
    out = {
        r.doc_id: (r.e, r.p, r.s)
        for r in df.select(
            "doc_id", n_e.alias("e"), n_p.alias("p"), T.scrub_pii(F.col("text")).alias("s")
        ).collect()
    }
    assert out[1] == (2, 1, "mail <EMAIL> or <EMAIL>, call <PHONE> ok")
    assert out[2] == (0, 0, "no pii here")
    assert out[3] == (0, 1, "<PHONE>")
    # idempotent: placeholders contain no matchable PII
    once = df.select("doc_id", T.scrub_pii(F.col("text")).alias("text"))
    ne2, np2 = T.pii_counts(F.col("text"))
    residual = once.select((ne2 + np2).alias("n")).agg(F.sum("n")).first()[0]
    assert residual == 0


def test_dup_ngram_milli_hand_cases(spark):
    rows = [
        (1, "a b a b a b"),      # 2-grams: ab ba ab ba ab -> 5 total, 2 distinct -> 600
        (2, "a b c d e"),        # all distinct -> 0
        (3, "x"),                # < n tokens -> 0
        (4, "w w w w"),          # ww ww ww -> 3 total 1 distinct -> 666
    ]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    t = df.select("doc_id", T.tokens(F.col("text")).alias("_tk"))
    out = {r.doc_id: r.m for r in t.select("doc_id", T.dup_ngram_milli(F.col("_tk"), 2).alias("m")).collect()}
    assert out == {1: 600, 2: 0, 3: 0, 4: 666}


# ------------------------------------------------- Gopher rule set


def test_gopher_rules_referee(spark):
    """Python referee over crafted docs hitting each rule boundary."""
    from crawler_apple_podcast_spark.functions.text import (
        GOPHER_STOPWORDS,
        gopher_stats,
    )

    good = "the quick brown fox and that dog have fun with it " * 6  # 60 words
    docs = {
        0: good,                                   # passes everything
        1: "word " * 10,                           # too short
        2: ("#tag " * 30) + good,                  # symbol ratio blows up
        3: "• a\n• b\n" + good,                    # bullet lines > 10%
        4: good.replace("the", "zzz").replace("and", "qqq")
              .replace("that", "rrr").replace("have", "sss")
              .replace("with", "ttt"),             # < 2 stopwords
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id LONG, text STRING")
    stats = gopher_stats(F.col("text"))
    out = {r.doc_id: r for r in df.select("doc_id", *[c.alias(n) for n, c in stats.items()]).collect()}
    assert out[0].keep
    assert not out[1].keep and out[1].n_words == 10
    assert not out[2].keep and out[2].symbol_milli > 100
    assert not out[3].keep and out[3].bullet_milli > 100
    assert not out[4].keep and out[4].stop_hits < 2

    def ref(text):
        words = [w for w in text.replace("\n", " ").split(" ") if w]
        lines = text.split("\n")
        return {
            "n_words": len(words),
            "mean_wlen_milli": sum(map(len, words)) * 1000 // len(words),
            "symbol_milli": (text.count("#") + text.count("...")) * 1000 // len(words),
            "bullet_milli": sum(l.startswith(("•", "- ")) for l in lines) * 1000 // len(lines),
            "ellipsis_milli": sum(l.endswith("...") for l in lines) * 1000 // len(lines),
            "alpha_milli": sum(any(c.isascii() and c.isalpha() for c in w) for w in words) * 1000 // len(words),
            "stop_hits": sum(s in words for s in GOPHER_STOPWORDS),
        }

    for did, text in docs.items():
        want = ref(text)
        for field, v in want.items():
            assert getattr(out[did], field) == v, (did, field)


def test_mojibake_detector(spark):
    from pyspark.sql import functions as F

    rows = [
        (1, "clean english text with nothing wrong"),
        (2, "we donâ€™t say â€œhelloâ€\x9d anymore"),  # curly quotes x3
        (3, "CafÃ© in MÃ¼nchen costs 5Â€"),             # 2x 'Ã.', 1x 'Â.'
        (4, "broken ï¿½ char"),
    ]
    df = spark.createDataFrame(rows, "k LONG, t STRING")
    got = {
        r.k: r.h
        for r in df.select("k", T.mojibake_hits(F.col("t")).alias("h")).collect()
    }
    assert got == {1: 0, 2: 3, 3: 3, 4: 1}
    # per-mille is integer division by char length
    milli = df.where("k = 3").select(T.mojibake_milli(F.col("t")).alias("m")).first().m
    text = rows[2][1]
    assert milli == 3 * 1000 // len(text)


def test_html_unescape_basic(spark):
    from pyspark.sql import functions as F

    rows = [
        (1, "Tom &amp; Jerry &lt;3"),
        (2, "it&#39;s &quot;here&quot;&nbsp;now"),
        # double-escape decodes ONE level, like a spec single pass
        (3, "&amp;lt;b&amp;gt; stays literal"),
        (4, "&eacute; unknown entity survives"),
    ]
    df = spark.createDataFrame(rows, "k LONG, t STRING")
    got = {
        r.k: r.d
        for r in df.select(
            "k", T.html_unescape_basic(F.col("t")).alias("d")
        ).collect()
    }
    assert got[1] == "Tom & Jerry <3"
    assert got[2] == 'it\'s "here" now'
    assert got[3] == "&lt;b&gt; stays literal"
    assert got[4] == "&eacute; unknown entity survives"


def test_collocation_lift_topk_matches_referee(spark):
    from collections import Counter

    from crawler_apple_podcast_spark.operators.collocations import (
        collocation_lift_topk,
    )

    texts = [
        "new york is a big city",
        "new york has new people",
        "big city big city lights",
        "york is new and new york wins",
        "a city of new york",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    )

    toks = [t.split() for t in texts]
    uni = Counter(w for ts in toks for w in ts)
    n = sum(uni.values())
    bi = Counter((ts[i], ts[i + 1]) for ts in toks for i in range(len(ts) - 1))
    want = sorted(
        (
            (w1, w2, c, (c * n * 1000) // (uni[w1] * uni[w2]))
            for (w1, w2), c in bi.items()
            if c >= 2
        ),
        key=lambda r: (-r[3], r[0], r[1]),
    )[:5]
    got = [
        (r.w1, r.w2, r.n_ab, r.lift_milli)
        for r in collocation_lift_topk(df, "doc_id", "text", k=5, min_count=2).collect()
    ]
    assert got == want
    assert ("new", "york") in {(a, b) for a, b, _, _ in got}


def test_build_postings_matches_referee_and_caps(spark):
    from crawler_apple_podcast_spark.operators.index import build_postings

    texts = {
        0: "x common alpha",
        1: "x common beta",
        2: "x common alpha gamma",
        3: "x delta",
        4: "x epsilon common",
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id LONG, text STRING"
    )
    # max_df_milli=700 -> df cutoff at 3.5: 'x' (df 5) and 'common'
    # (df 4) dropped; cap=2 truncates alpha's postings to first 2 ids.
    got = {
        r.term: (r.df, r.postings)
        for r in build_postings(df, "doc_id", "text", 700, 2).collect()
    }
    assert "x" not in got and "common" not in got
    assert got["alpha"] == (2, "0,2")
    assert got["beta"] == (1, "1")
    assert got["delta"] == (1, "3")
    assert got["epsilon"] == (1, "4")
    assert got["gamma"] == (1, "2")


def test_soft404_reason_heuristics(spark):
    from crawler_apple_podcast_spark.functions.sniff import soft404_reason

    rows = [
        (1, 200, "<html><title>404 Not Found</title><body>x</body>"),
        (2, 200, "<html><title>ok</title><body>Page not found.</body>"),
        # body marker but LONG page: an article about 404s survives
        (3, 200, "<html><title>essay</title><body>not found " + "w " * 400 + "</body>"),
        (4, 200, "<html><title>fine</title><body>hello</body>"),
        # honest hard 404: status tells the truth, not a soft 404
        (5, 404, "<html><title>404 Not Found</title><body>x</body>"),
    ]
    df = spark.createDataFrame(rows, "id LONG, status INT, html STRING")
    got = {
        r.id: r.reason
        for r in df.select(
            "id", soft404_reason(F.col("status"), F.col("html")).alias("reason")
        ).collect()
    }
    assert got == {1: "title", 2: "thin-body", 3: None, 4: None, 5: None}
