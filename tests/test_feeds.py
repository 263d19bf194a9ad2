"""RSS feed-item parsing (functions/feeds.py): field round-trip, the
alignment precondition gate, and the ragged-feed failure mode it
guards against."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_apple_podcast_spark.functions import feeds as FD


def _item(title, url, length, pub, guid):
    return (
        f"<item><title>{title}</title>"
        f'<enclosure url="{url}" length="{length}" type="audio/mpeg"/>'
        f"<pubDate>{pub}</pubDate><guid>{guid}</guid></item>"
    )


FEED = (
    "<rss><channel><title>Show</title>"
    + _item("Ep 1", "https://cdn.example/a/1.mp3", 111,
            "Mon, 05 Jan 2026 07:30:00 GMT", "g-1")
    + _item("Ep 2", "https://cdn.example/a/2.mp3", 222,
            "Tue, 06 Jan 2026 08:45:10 GMT", "g-2")
    + "</channel></rss>"
)

# second item has no <enclosure>: xpath arrays go ragged
RAGGED = (
    "<rss><channel>"
    + _item("Ep 1", "https://cdn.example/a/1.mp3", 111,
            "Mon, 05 Jan 2026 07:30:00 GMT", "g-1")
    + "<item><title>Ep 2</title>"
    "<pubDate>Tue, 06 Jan 2026 08:45:10 GMT</pubDate><guid>g-2</guid></item>"
    "</channel></rss>"
)


def test_parse_feed_items_fields(spark):
    df = spark.createDataFrame([(FEED,)], "xml string")
    rows = (
        df.select(F.posexplode(FD.parse_feed_items(F.col("xml"))).alias("p", "it"))
        .select("p", "it.*")
        .orderBy("p")
        .collect()
    )
    assert [r.title for r in rows] == ["Ep 1", "Ep 2"]
    assert rows[0].audio_url == "https://cdn.example/a/1.mp3"
    assert [r.length_bytes for r in rows] == [111, 222]
    # 2026-01-05 07:30:00 UTC and 2026-01-06 08:45:10 UTC
    assert rows[0].pub_epoch == 1767598200
    assert rows[1].pub_epoch == 1767689110
    assert [r.guid for r in rows] == ["g-1", "g-2"]


def test_alignment_gate(spark):
    df = spark.createDataFrame([(FEED, "ok"), (RAGGED, "bad")], "xml string, tag string")
    got = {
        r.tag: r.aligned
        for r in df.select(
            "tag", FD.feed_items_aligned(F.col("xml")).alias("aligned")
        ).collect()
    }
    assert got == {"ok": True, "bad": False}


def test_feed_audio_urls(spark):
    df = spark.createDataFrame([(FEED,)], "xml string")
    urls = df.select(FD.feed_audio_urls(F.col("xml")).alias("u")).first().u
    assert urls == ["https://cdn.example/a/1.mp3", "https://cdn.example/a/2.mp3"]


def test_ragged_feed_is_why_the_gate_exists(spark):
    """Document the failure mode: on the ragged feed the single present
    enclosure aligns with item 0's slot and item 1 gets NULL-shifted
    fields — exactly what feed_items_aligned quarantines."""
    df = spark.createDataFrame([(RAGGED,)], "xml string")
    rows = (
        df.select(F.posexplode(FD.parse_feed_items(F.col("xml"))).alias("p", "it"))
        .select("p", "it.*")
        .orderBy("p")
        .collect()
    )
    assert rows[0].audio_url == "https://cdn.example/a/1.mp3"
    assert rows[1].audio_url is None


def test_regex_fast_twin_matches_xpath_on_wellformed(spark):
    df = spark.createDataFrame([(FEED,)], "xml string")

    def rows(parser):
        return (
            df.select(F.posexplode(parser(F.col("xml"))).alias("p", "it"))
            .select("p", "it.*")
            .orderBy("p")
            .collect()
        )

    assert rows(FD.parse_feed_items_regex) == rows(FD.parse_feed_items)


def test_regex_twin_multiline_item_bodies(spark):
    # (?s) makes the item scan span newlines — pretty-printed feeds
    xml = FEED.replace("<item>", "<item>\n  ").replace("</item>", "\n</item>")
    df = spark.createDataFrame([(xml,)], "xml string")
    got = (
        df.select(F.posexplode(FD.parse_feed_items_regex(F.col("xml"))).alias("p", "it"))
        .select("it.title", "it.length_bytes")
        .orderBy("it.length_bytes")
        .collect()
    )
    assert [(r.title, r.length_bytes) for r in got] == [("Ep 1", 111), ("Ep 2", 222)]
