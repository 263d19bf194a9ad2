"""Exact-substring span dedup: planted-passage recovery, keep-first,
python referee parity, strip round-trip."""

import pytest
from pyspark.sql import functions as F

from crawler_apple_podcast_spark.operators import spans as SP


def _referee(docs, w):
    """Single-node ExactSubstr: same semantics, dict-of-lists code."""
    wins = {}
    for doc_id, text in docs:
        tk = text.split(" ")
        for p in range(1, len(tk) - w + 2):
            wins.setdefault(" ".join(tk[p - 1 : p - 1 + w]), []).append((doc_id, p))
    marks = {}
    for occ in wins.values():
        if len(occ) > 1:
            for doc_id, p in sorted(occ)[1:]:
                marks.setdefault(doc_id, set()).add(p)
    out = []
    for doc_id, ps in marks.items():
        run = []
        for p in sorted(ps):
            if run and p <= run[-1] + w:
                run.append(p)
            else:
                if run:
                    out.append((doc_id, run[0], run[-1] + w - 1))
                run = [p]
        if run:
            out.append((doc_id, run[0], run[-1] + w - 1))
    return sorted(out)


PASSAGE = "the quick brown fox jumps over the lazy dog again and again"
DOCS = [
    (1, f"alpha beta {PASSAGE} gamma delta"),
    (2, f"unrelated words here {PASSAGE} trailing tail tokens"),
    (3, "completely different text with no repeats whatsoever in it"),
    (4, f"{PASSAGE} {PASSAGE}"),  # self-repeat within one doc
]


def test_spans_match_referee(spark):
    df = spark.createDataFrame(DOCS, "doc_id LONG, text STRING")
    for w in (4, 8):
        got = sorted(
            (r.doc_id, r.span_start, r.span_end)
            for r in SP.exact_substring_spans(df, "doc_id", "text", w).collect()
        )
        assert got == _referee(DOCS, w), w


def test_keep_first_occurrence_survives(spark):
    df = spark.createDataFrame(DOCS, "doc_id LONG, text STRING")
    spans = SP.exact_substring_spans(df, "doc_id", "text", w=8)
    by_doc = {r.doc_id: r for r in spans.collect()}
    # doc 1 is the globally-first occurrence: nothing removed from it
    assert 1 not in by_doc
    # doc 2's copy of the passage is covered by one merged span
    tk2 = DOCS[1][1].split(" ")
    start = tk2.index("the") + 1
    assert by_doc[2].span_start == start
    assert by_doc[2].span_end == start + len(PASSAGE.split(" ")) - 1


def test_strip_spans_removes_exactly_covered_tokens(spark):
    df = spark.createDataFrame(DOCS, "doc_id LONG, text STRING")
    w = 8
    spans = SP.exact_substring_spans(df, "doc_id", "text", w)
    cleaned = {
        r.doc_id: r.text_dedup
        for r in SP.strip_spans(df, spans, "doc_id", "text").collect()
    }
    ref = {doc_id: set() for doc_id, _ in DOCS}
    for doc_id, s, e in _referee(DOCS, w):
        ref[doc_id].update(range(s, e + 1))
    for doc_id, text in DOCS:
        tk = text.split(" ")
        want = " ".join(t for i, t in enumerate(tk, 1) if i not in ref[doc_id])
        assert cleaned[doc_id] == want, doc_id
    # untouched docs pass through verbatim (no split/rejoin drift)
    assert cleaned[3] == DOCS[2][1]


def test_no_false_spans_on_unique_corpus(spark):
    df = spark.range(40).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[F.concat(F.lit(f"w{i}_"), F.col("id").cast("string")) for i in range(12)],
        ).alias("text"),
    )
    assert SP.exact_substring_spans(df, "doc_id", "text", w=4).count() == 0


def test_window_scan_is_shuffle_free(spark):
    """Stage 1 (the only full-corpus pass) must be a narrow map —
    no Exchange before the dup-hash aggregate's own shuffle."""
    df = spark.createDataFrame(DOCS, "doc_id LONG, text STRING").coalesce(64)
    plan = (
        SP.token_windows(df, "doc_id", "text", 8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_incremental_equals_batch_when_old_ids_first(spark):
    """With every indexed doc_id below every new doc_id, the batch
    keep-first order prefers the old corpus — so incremental spans must
    equal the batch spans restricted to the new docs (the contract that
    lets a crawl switch to the index without changing output)."""
    df = spark.createDataFrame(DOCS, "doc_id LONG, text STRING")
    old = df.where(F.col("doc_id") <= 2)
    new = df.where(F.col("doc_id") >= 3)
    for w in (4, 8):
        idx = SP.window_hash_index(old, "doc_id", "text", w)
        got = sorted(
            (r.doc_id, r.span_start, r.span_end, r.span_tokens)
            for r in SP.exact_substring_spans_incremental(
                new, idx, "doc_id", "text", w
            ).collect()
        )
        want = sorted(
            (r.doc_id, r.span_start, r.span_end, r.span_tokens)
            for r in SP.exact_substring_spans(df, "doc_id", "text", w).collect()
            if r.doc_id >= 3
        )
        assert got == want, w


def test_incremental_marks_every_new_occurrence_of_indexed_window(spark):
    """A window already in the index loses ALL its new occurrences
    (the keep-first copy lives in the indexed corpus)."""
    old = spark.createDataFrame([(1, PASSAGE)], "doc_id LONG, text STRING")
    new = spark.createDataFrame(
        [(10, f"pre filler {PASSAGE} post filler")], "doc_id LONG, text STRING"
    )
    idx = SP.window_hash_index(old, "doc_id", "text", 8)
    rows = SP.exact_substring_spans_incremental(
        new, idx, "doc_id", "text", 8
    ).collect()
    n = len(PASSAGE.split(" "))
    assert [(r.doc_id, r.span_start, r.span_end) for r in rows] == [(10, 3, 2 + n)]


def test_incremental_within_batch_keep_first_for_novel_windows(spark):
    """A window NOT in the index dedups within the batch: first new
    occurrence survives, later ones are marked."""
    old = spark.createDataFrame(
        [(1, "totally unrelated indexed corpus text here okay fine")],
        "doc_id LONG, text STRING",
    )
    new = spark.createDataFrame(
        [(10, f"{PASSAGE} end"), (11, f"start {PASSAGE}")],
        "doc_id LONG, text STRING",
    )
    idx = SP.window_hash_index(old, "doc_id", "text", 8)
    rows = SP.exact_substring_spans_incremental(
        new, idx, "doc_id", "text", 8
    ).collect()
    n = len(PASSAGE.split(" "))
    assert [(r.doc_id, r.span_start, r.span_end) for r in rows] == [(11, 2, 1 + n)]


def test_incremental_probe_is_semi_join_on_whash(spark):
    """Steady-state cost contract: the index probe must be a LEFT SEMI
    join keyed on the 8-byte whash — no string traffic against the old
    corpus, whose text never re-enters the plan (the index carries
    hashes only, so it CAN'T)."""
    old = spark.createDataFrame(DOCS[:2], "doc_id LONG, text STRING")
    new = spark.createDataFrame(DOCS[2:], "doc_id LONG, text STRING")
    idx = SP.window_hash_index(old, "doc_id", "text", 8)
    plan = (
        SP.duplicate_window_marks_incremental(new, idx, "doc_id", "text", 8)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "LeftSemi" in plan, plan
    assert idx.columns == ["whash"]  # 8 bytes/row, nothing else persists


def test_bucketed_index_probe_reads_buckets_in_place(spark):
    """The committed bucketed index must serve the incremental probe
    with ZERO index-side shuffle: exactly one Exchange in the probe
    join (the new batch's windows routing to the buckets) and the
    bucketed scan visible in the plan."""
    table = "win_idx_spans_test"
    old = spark.createDataFrame(DOCS[:2], "doc_id LONG, text STRING")
    new = spark.createDataFrame(DOCS[2:], "doc_id LONG, text STRING")
    try:
        SP.write_window_index_bucketed(
            SP.window_hash_index(old, "doc_id", "text", 8), table, buckets=8, w=8
        )
        # a probe opened with a different w must refuse loudly (the
        # silent alternative is zero hash matches = every cross-index
        # duplicate surviving); the matching w opens fine
        with pytest.raises(ValueError, match="committed=8 probe=50"):
            SP.bucketed_window_index(spark, table, w=50)
        idx = SP.bucketed_window_index(spark, table, w=8)
        probe = SP.token_windows(new, "doc_id", "text", 8).join(
            idx, "whash", "left_semi"
        )
        plan = probe._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 1, plan
        assert "SelectedBucketsCount" in plan, plan
        # and the full incremental output through the bucketed index
        # equals the plain-frame path
        got = sorted(
            (r.doc_id, r.span_start, r.span_end)
            for r in SP.exact_substring_spans_incremental(
                new, idx, "doc_id", "text", 8
            ).collect()
        )
        want = sorted(
            (r.doc_id, r.span_start, r.span_end)
            for r in SP.exact_substring_spans_incremental(
                new,
                SP.window_hash_index(old, "doc_id", "text", 8),
                "doc_id",
                "text",
                8,
            ).collect()
        )
        assert got == want and got
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        spark.sql(f"DROP TABLE IF EXISTS {table}__meta")


def test_production_window_size_w50(spark):
    """The prod-scale W=50 hash chain (50-arg xxhash64 codegen) works
    and recovers a long shared passage exactly."""
    base = " ".join(f"t{i}" for i in range(400))
    shared = " ".join(f"s{i}" for i in range(120))
    df = spark.createDataFrame(
        [(1, base + " " + shared), (2, shared + " xyz " + base.replace("t", "u"))],
        "doc_id LONG, text STRING",
    )
    rows = SP.exact_substring_spans(df, "doc_id", "text", w=50).collect()
    assert [(r.doc_id, r.span_start, r.span_end) for r in rows] == [(2, 1, 120)]


def test_bucketed_index_append_validates_stamp(spark):
    """mode='append' with a DIFFERENT w must refuse before any data
    lands (overwriting the stamp would wave a mixed-family index
    through the open-time check); appending with the matching w works
    and keeps the stamp."""
    table = "win_idx_append_stamp_test"
    old = spark.createDataFrame(DOCS[:2], "doc_id LONG, text STRING")
    new = spark.createDataFrame(DOCS[2:], "doc_id LONG, text STRING")
    try:
        SP.write_window_index_bucketed(
            SP.window_hash_index(old, "doc_id", "text", 8), table, buckets=4, w=8
        )
        before = spark.table(table).count()
        with pytest.raises(ValueError, match="committed=8 probe=50"):
            SP.write_window_index_bucketed(
                SP.window_hash_index(new, "doc_id", "text", 50),
                table, buckets=4, mode="append", w=50,
            )
        assert spark.table(table).count() == before  # nothing landed
        SP.write_window_index_bucketed(
            SP.window_hash_index(new, "doc_id", "text", 8),
            table, buckets=4, mode="append", w=8,
        )
        assert spark.table(table).count() > before
        SP.bucketed_window_index(spark, table, w=8)  # stamp intact
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        spark.sql(f"DROP TABLE IF EXISTS {table}__meta")


def test_stamp_lifecycle_overwrite_and_retroactive_rules(spark):
    """Shared stamp lifecycle (operators/stamps.py): an
    un-parameterized OVERWRITE drops a stale stamp (which would vouch
    for the wrong hash family and fail the right probe); appending
    with w onto a pre-existing UNSTAMPED table never stamps
    retroactively; appending without w onto a STAMPED table refuses."""
    table = "win_idx_lifecycle_test"
    old = spark.createDataFrame(DOCS[:2], "doc_id LONG, text STRING")
    try:
        # stamped w=50, then rebuilt without w: stamp must be gone,
        # and a w=8 probe of the w=8 rebuild must NOT raise
        SP.write_window_index_bucketed(
            SP.window_hash_index(old, "doc_id", "text", 50), table, buckets=4, w=50
        )
        SP.write_window_index_bucketed(
            SP.window_hash_index(old, "doc_id", "text", 8), table, buckets=4
        )
        assert not spark.catalog.tableExists(table + "__meta")
        SP.bucketed_window_index(spark, table, w=8)  # no spurious raise

        # append WITH w onto the (now unstamped, pre-existing) table:
        # data lands but no retroactive stamp appears
        SP.write_window_index_bucketed(
            SP.window_hash_index(old, "doc_id", "text", 8),
            table, buckets=4, mode="append", w=8,
        )
        assert not spark.catalog.tableExists(table + "__meta")

        # stamped table refuses an un-parameterized append
        SP.write_window_index_bucketed(
            SP.window_hash_index(old, "doc_id", "text", 8), table, buckets=4, w=8
        )
        with pytest.raises(ValueError, match="parameter-stamped"):
            SP.write_window_index_bucketed(
                SP.window_hash_index(old, "doc_id", "text", 8),
                table, buckets=4, mode="append",
            )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        spark.sql(f"DROP TABLE IF EXISTS {table}__meta")
