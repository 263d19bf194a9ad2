from __future__ import annotations

from crawler_apple_podcast_spark.operators.boilerplate import (
    strip_boilerplate_lines,
)


def _rows(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_strip_boilerplate_edges(spark):
    # Host A, 4 docs.  "nav" on all 4 (df 100% -> removed at 600‰);
    # "footer" on 2 of 4 (df 500‰ -> kept at 600, boundary below);
    # doc 3 is nav-only -> clean_text '' ; doc 4 repeats nav twice in
    # one doc (counts once toward df, removed twice).
    docs = spark.createDataFrame(
        [
            (1, "A", "nav\nalpha\nfooter"),
            (2, "A", "nav\nbeta\nfooter"),
            (3, "A", "nav"),
            (4, "A", "nav\ngamma\nnav"),
            (5, "B", "solo line\nnav"),  # B: every line df=100% -> all gone
        ],
        "doc_id int, host string, text string",
    )
    out = _rows(strip_boilerplate_lines(docs, threshold_milli=600))
    assert out[1] == {
        "doc_id": 1, "clean_text": "alpha\nfooter", "n_lines": 3, "removed": 1
    }
    assert out[2]["clean_text"] == "beta\nfooter"
    assert out[3] == {"doc_id": 3, "clean_text": "", "n_lines": 1, "removed": 1}
    assert out[4] == {"doc_id": 4, "clean_text": "gamma", "n_lines": 3, "removed": 2}
    assert out[5] == {"doc_id": 5, "clean_text": "", "n_lines": 2, "removed": 2}


def test_strip_boilerplate_threshold_boundary(spark):
    # df*1000 >= threshold*nd is inclusive: 3 of 5 docs at 600‰ removed.
    docs = spark.createDataFrame(
        [(i, "H", ("common\nu%d" % i) if i <= 3 else "u%d" % i) for i in range(1, 6)],
        "doc_id int, host string, text string",
    )
    out = _rows(strip_boilerplate_lines(docs, threshold_milli=600))
    assert all(out[i]["clean_text"] == "u%d" % i for i in range(1, 6))
    assert [out[i]["removed"] for i in range(1, 6)] == [1, 1, 1, 0, 0]


def test_strip_boilerplate_order_preserved(spark):
    docs = spark.createDataFrame(
        [(1, "H", "z\na\nm"), (2, "H", "q\nb")],
        "doc_id int, host string, text string",
    )
    out = _rows(strip_boilerplate_lines(docs, threshold_milli=900))
    # nothing reaches 90% df with disjoint lines -> original order kept
    assert out[1]["clean_text"] == "z\na\nm"
    assert out[2]["clean_text"] == "q\nb"


def test_paragraph_dedup_keep_first(spark):
    from crawler_apple_podcast_spark.operators.boilerplate import (
        dedup_paragraphs_global,
    )

    docs = spark.createDataFrame(
        [
            (1, "dup\nuniq1"),
            (2, "uniq2\ndup"),       # dup first seen at (1,0) -> removed here
            (3, "dup\ndup\nuniq3"),  # both copies removed
            (4, "dup"),              # whole doc boilerplate -> ''
        ],
        "doc_id int, text string",
    )
    out = {r.doc_id: r for r in dedup_paragraphs_global(docs).collect()}
    assert out[1].clean_text == "dup\nuniq1" and out[1].removed == 0
    assert out[2].clean_text == "uniq2" and out[2].removed == 1
    assert out[3].clean_text == "uniq3" and out[3].removed == 2
    assert (out[4].clean_text, out[4].n_paras, out[4].removed) == ("", 1, 1)


def test_paragraph_dedup_in_doc_repeat_keeps_first_position(spark):
    from crawler_apple_podcast_spark.operators.boilerplate import (
        dedup_paragraphs_global,
    )

    docs = spark.createDataFrame(
        [(1, "a\nb\na\nc\na")], "doc_id int, text string"
    )
    [r] = dedup_paragraphs_global(docs).collect()
    assert r.clean_text == "a\nb\nc" and r.removed == 2
