"""Mirror-host detection: planted mirrors, ubiquity cap, demotion."""

from pyspark.sql import functions as F

from crawler_apple_podcast_spark.operators import mirrors as MIR


def _pages(spark):
    rows = []
    # full mirror: m2 serves every one of m1's 8 pages
    for i in range(8):
        rows += [("m1", f"page content {i}"), ("m2", f"page content {i}")]
    # partial mirror: p2 carries 5 of p1's 10 pages (containment 500)
    for i in range(10):
        rows.append(("p1", f"other content {i}"))
        if i < 5:
            rows.append(("p2", f"other content {i}"))
    # p2 padding so it clears min_docs on its own
    rows += [("p2", f"p2 only {i}") for i in range(3)]
    # unrelated host
    rows += [("solo", f"solo content {i}") for i in range(6)]
    # boilerplate on EVERY host: must not count as mirror evidence
    for h in ("m1", "m2", "p1", "p2", "solo"):
        rows.append((h, "shared boilerplate"))
    return spark.createDataFrame(rows, "host STRING, text STRING")


def test_planted_mirrors_detected(spark):
    got = {
        (r.host_a, r.host_b): r.containment_milli
        for r in MIR.mirror_host_pairs(
            _pages(spark), min_docs=5, max_hosts_per_fp=3
        ).collect()
    }
    assert got[("m1", "m2")] == 1000  # 9/9 with boilerplate excluded both sides
    assert ("p1", "p2") in got
    assert 500 <= got[("p1", "p2")] <= 700
    assert not any("solo" in pair for pair in got)


def test_ubiquity_cap_blocks_boilerplate_evidence(spark):
    """Five hosts sharing ONLY boilerplate never pair: with the cap the
    boilerplate fingerprint is dropped; without it every host pair
    would share one fingerprint."""
    rows = [(f"b{i}", "the one shared page") for i in range(5)]
    rows += [(f"b{i}", f"unique {i} {j}") for i in range(5) for j in range(6)]
    df = spark.createDataFrame(rows, "host STRING, text STRING")
    assert (
        MIR.mirror_host_pairs(
            df, threshold_milli=100, min_docs=5, max_hosts_per_fp=3
        ).count()
        == 0
    )


def test_duplicate_urls_within_host_collapse(spark):
    """Same content served at many URLs of one host counts once (the
    distinct) — a host spamming one page 100x is not 100 shared docs."""
    rows = [("a", "dup page")] * 100 + [("b", "dup page")] * 100
    rows += [(h, f"{h} unique {i}") for h in ("a", "b") for i in range(5)]
    df = spark.createDataFrame(rows, "host STRING, text STRING")
    got = MIR.mirror_host_pairs(df, min_docs=5, threshold_milli=100).collect()
    assert len(got) == 1 and got[0].shared == 1


def test_demote_mirror_hosts_pushes_loser_only(spark):
    pages = _pages(spark)
    mirrors = MIR.mirror_host_pairs(pages, min_docs=5, max_hosts_per_fp=3)
    frontier = spark.createDataFrame(
        [(h, i) for i, h in enumerate(["m1", "m2", "p1", "p2", "solo"])],
        "host STRING, priority LONG",
    )
    out = {r.host: r.priority for r in
           MIR.demote_mirror_hosts(frontier, mirrors).collect()}
    assert out["m2"] > 1_000_000 and out["p2"] > 1_000_000
    assert out["m1"] == 0 and out["p1"] == 2 and out["solo"] == 4
    assert len(out) == 5  # no rows lost or duplicated
