"""Registrable-domain extraction vs a pure-Python PSL referee."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from crawler_apple_podcast_spark.operators.domains import registrable_domains


def ref_registrable(host: str, suffixes: set[str]):
    labels = host.split(".")
    cands = [".".join(labels[i:]) for i in range(len(labels))]
    matches = [c for c in cands if c in suffixes]
    ps = (
        max(matches, key=lambda c: len(c.split(".")))
        if matches
        else labels[-1]
    )
    n = len(ps.split("."))
    reg = ".".join(labels[-(n + 1):]) if len(labels) > n else None
    return ps, reg


def _run(spark, hosts, suffixes):
    hdf = spark.createDataFrame([(h,) for h in hosts], "host string")
    sdf = spark.createDataFrame([(s,) for s in suffixes], "suffix string")
    return {
        r.host: (r.public_suffix, r.registrable_domain)
        for r in registrable_domains(hdf, sdf).collect()
    }


PSL = {"com", "co.uk", "uk", "io", "github.io"}


def test_fixed_cases(spark):
    hosts = [
        "a.b.shop.co.uk",  # co.uk beats uk
        "shop.co.uk",
        "co.uk",           # host IS a suffix -> no registrable domain
        "x.github.io",     # multi-label private-ish suffix
        "deep.x.github.io",
        "plain.com",
        "weird.zz",        # unlisted TLD -> implicit * rule
        "zz",              # single unlisted label
    ]
    got = _run(spark, hosts, PSL)
    assert got == {h: ref_registrable(h, PSL) for h in hosts}
    assert got["a.b.shop.co.uk"] == ("co.uk", "shop.co.uk")
    assert got["co.uk"] == ("co.uk", None)
    assert got["deep.x.github.io"] == ("github.io", "x.github.io")
    assert got["weird.zz"] == ("zz", "weird.zz")
    assert got["zz"] == ("zz", None)


_label = st.text(alphabet="abz", min_size=1, max_size=3)
_host = st.lists(_label, min_size=1, max_size=4).map(".".join)


@settings(max_examples=20, deadline=None)
@given(
    hosts=st.sets(_host, min_size=1, max_size=12),
    suffixes=st.sets(_host, min_size=1, max_size=8),
)
def test_matches_referee(spark, hosts, suffixes):
    got = _run(spark, sorted(hosts), sorted(suffixes))
    assert got == {h: ref_registrable(h, suffixes) for h in hosts}
