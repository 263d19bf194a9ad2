"""Composite corpus-prep pipeline: each gate fires for the documented
reason, the exact-dup keeps the min doc_id, the near-dup drop removes
the greater doc of the confirmed pair."""

from __future__ import annotations

from crawler_apple_podcast_spark.queries import corpus_prep_frame

BASE = (
    "the quick brown fox jumps over a lazy dog and then it runs to the"
    " river in the morning light with a happy heart"
)


def _docs(spark):
    rows = [
        (1, BASE),                                # kept (canonical)
        (2, BASE),                                # exact dup of 1 -> dropped
        (3, BASE.replace("happy heart", "happy song")),  # near-dup of 1 -> dropped
        (4, "a calm night settles over the old harbour and the boats sway"
            " gently in the tide while lanterns glow along the stone pier"),
        (5, "zork blin trask vorn quux zilch brix "* 4),  # no stopwords -> lang gate
        (6, "the cat and the dog in a box sat down"),     # en but low quality
    ]
    return spark.createDataFrame(rows, "doc_id INT, text STRING")


def test_corpus_prep_gates_and_dedup(spark):
    out = corpus_prep_frame(_docs(spark)).collect()
    kept = {r.doc_id for r in out}
    assert kept == {1, 4}
    by_id = {r.doc_id: r for r in out}
    assert by_id[1].n_tokens == len(BASE.split())
    assert by_id[1].quality_milli >= 600
    assert by_id[4].n_bpe >= by_id[4].n_tokens


def test_corpus_prep_pairwise_vs_components_on_bridge(spark):
    """Doc 3 bridges docs 1 and 2 (near-dup of both; 1 !~ 2): the
    pairwise rule only drops doc_b's ({3}), keeping both 1 and 2; the
    component rule keeps exactly the component min ({1})."""
    from crawler_apple_podcast_spark.queries import corpus_prep_frame as prep

    # base doc 3; docs 1 and 2 each edit ONE (different) token: j(1,3)
    # = j(2,3) ~ 0.85 (above threshold, inside the LSH recall band),
    # j(1,2) ~ 0.73 (below the 0.8 threshold).  All-alpha fillers keep
    # the quality gate's alpha-density component high.
    t3 = ["the", "and", "it"] + [
        f"w{chr(97 + i)}{chr(97 + (i * 7) % 26)}ord" for i in range(37)
    ]
    t1 = list(t3)
    t1[10] = "alphaword"
    t2 = list(t3)
    t2[30] = "omegaword"
    df = spark.createDataFrame(
        [(1, " ".join(t1)), (2, " ".join(t2)), (3, " ".join(t3))],
        "doc_id INT, text STRING",
    )
    kept_pairs = {r.doc_id for r in prep(df, jaccard_threshold_milli=800).collect()}
    kept_cc = {
        r.doc_id
        for r in prep(df, jaccard_threshold_milli=800, dedup="components").collect()
    }
    assert kept_pairs == {1, 2}
    assert kept_cc == {1}


def test_corpus_prep_near_dup_direction(spark):
    # swap ids 1<->3: the near-dup pair's LOWER id survives, whichever
    # text it carries.
    df = _docs(spark).selectExpr(
        "CASE doc_id WHEN 1 THEN 3 WHEN 3 THEN 1 ELSE doc_id END AS doc_id",
        "text",
    )
    kept = {r.doc_id for r in corpus_prep_frame(df).collect()}
    # exact-dup of BASE now keeps id 2 (min of {2, 3}); near-dup pair
    # (1, 2) keeps 1 (the edited text, now the lowest id).
    assert kept == {1, 4}
