"""K3 crawl_status state machine + E2 seed-discovery plan + S7
directory scan — reference semantics per SURVEY.md §2."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from crawler_apple_podcast_spark.oracle import save_urls_to_db
from crawler_apple_podcast_spark.plans.ledger import build_download_ledger
from crawler_apple_podcast_spark.plans.seed_discovery import run_seed_discovery
from crawler_apple_podcast_spark.plans.snapshots import SnapshotStore
from crawler_apple_podcast_spark.plans.status import (
    STATUS_FAIL,
    STATUS_OK,
    STATUS_PENDING,
    latest_status,
    merge_status,
)
from crawler_apple_podcast_spark.plans.wave_loop import (
    WaveConfig,
    read_current_status,
    run_crawl,
)
from crawler_apple_podcast_spark.sources import scan_directory

SHOW = "https://podcasts.apple.com/us/podcast"


# ------------------------------------------------------------------ K3

def test_merge_status_latest_wins_and_inserts(spark):
    cur = spark.createDataFrame(
        [("u1", 1, 10), ("u2", 2, 11)], "key STRING, status INT, update_ts INT"
    )
    upd = spark.createDataFrame(
        [("u2", 3, 12), ("u2", 4, 13), ("u3", 1, 12)],
        "key STRING, status INT, update_ts INT",
    )
    out = {r.key: r.status for r in merge_status(cur, upd, ["key"], "update_ts").collect()}
    assert out == {"u1": 1, "u2": 4, "u3": 1}


def test_merge_status_update_beats_current_on_ts_tie(spark):
    cur = spark.createDataFrame([("u1", 1, 10)], "key STRING, status INT, update_ts INT")
    upd = spark.createDataFrame([("u1", 3, 10)], "key STRING, status INT, update_ts INT")
    out = merge_status(cur, upd, ["key"], "update_ts").collect()
    assert out[0].status == 3


def test_wave_loop_commits_status_and_survives_resume(spark, corpus, tmp_path):
    """Statuses land in the snapshot store per wave (3 ok / 4 fail /
    1 deferred) and survive a kill+resume."""
    pages, seeds = corpus
    root = str(tmp_path / "snap")
    store = SnapshotStore(spark, root)
    cfg = WaveConfig(max_waves=2)
    run_crawl(spark, pages, seeds, cfg, store=store)
    st1 = read_current_status(store)
    vals1 = {(r.seed_index, r.fetch_url): r.status for r in st1.collect()}
    assert vals1 and set(vals1.values()) <= {STATUS_PENDING, STATUS_OK, STATUS_FAIL}
    assert STATUS_OK in vals1.values()

    # resume: statuses keep accumulating, earlier ones unchanged
    store2 = SnapshotStore(spark, root)
    run_crawl(spark, pages, seeds, WaveConfig(max_waves=32), store=store2, resume=True)
    st2 = read_current_status(store2)
    vals2 = {(r.seed_index, r.fetch_url): r.status for r in st2.collect()}
    assert len(vals2) >= len(vals1)
    for k, v in vals1.items():
        assert k in vals2
        if v in (STATUS_OK, STATUS_FAIL):
            assert vals2[k] == v  # terminal statuses survive the resume


def test_invalid_transitions_flags_illegal_steps(spark):
    from crawler_apple_podcast_spark.plans.status import invalid_transitions

    cur = spark.createDataFrame(
        [("a", 1, 1), ("b", 3, 1), ("c", 2, 1)], "key STRING, status INT, update_ts INT"
    )
    upd = spark.createDataFrame(
        [("a", 2, 2),   # pending -> processing: legal
         ("b", 1, 2),   # ok -> pending: ILLEGAL (terminal)
         ("c", 3, 2),   # processing -> ok: legal
         ("d", 1, 2),   # insert as pending: legal
         ("e", 3, 2)],  # insert straight to ok: ILLEGAL
        "key STRING, status INT, update_ts INT",
    )
    bad = sorted(r.key for r in invalid_transitions(cur, upd, ["key"]).collect())
    assert bad == ["b", "e"]


# ------------------------------------------------------------------ E2

def _discover(spark, urls, seen_rows):
    cand = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "ord BIGINT, url STRING"
    )
    seen = spark.createDataFrame(seen_rows or [("", "")], "url STRING, uid STRING")
    if not seen_rows:
        seen = seen.limit(0)
    out = run_seed_discovery(cand, seen).orderBy("ord").collect()
    return [(r.url, r.uid) for r in out], [r.status for r in out]


def test_seed_discovery_matches_sequential_oracle(spark):
    urls = [
        f"{SHOW}/a/id111",
        "",                      # P1: dropped before dedupe
        "ftp://no.example/x",    # P1: non-http dropped
        f"{SHOW}/b/id111",       # uid dup -> skipped
        f"{SHOW}/a/id111",       # url dup -> skipped
        f"{SHOW}/c/idxx",        # malformed -> uid '' -> first empty kept
        f"{SHOW}/d/idyy",        # second empty -> skipped
        f"{SHOW}/e/id222",       # kept
    ]
    seen_rows = [(f"{SHOW}/z/id333", "333")]
    got, statuses = _discover(spark, urls, seen_rows)
    valid = [u for u in urls if u and u.startswith("http")]
    want = save_urls_to_db(seen_rows, valid)
    assert got == want
    assert set(statuses) == {STATUS_PENDING}


def test_seed_discovery_result_window(spark):
    urls = [f"{SHOW}/s{i}/id{100 + i}" for i in range(10)]
    cand = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "ord BIGINT, url STRING"
    )
    seen = spark.createDataFrame([("", "")], "url STRING, uid STRING").limit(0)
    out = run_seed_discovery(cand, seen, result_window=(2, 6)).collect()
    assert sorted(r.ord for r in out) == [2, 3, 4, 5]


def test_seed_discovery_commits_via_store(spark, tmp_path):
    urls = [f"{SHOW}/s{i}/id{100 + i}" for i in range(5)]
    cand = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "ord BIGINT, url STRING"
    )
    seen = spark.createDataFrame([("", "")], "url STRING, uid STRING").limit(0)
    store = SnapshotStore(spark, str(tmp_path / "seeds"))
    out = run_seed_discovery(cand, seen, store=store, wave=0)
    assert out.count() == 5
    assert store.last_committed_wave() == 0
    assert store.read_wave("web_search_info", 0).count() == 5


# ------------------------------------------------------------------ S7

def test_scan_directory_skips_processed_and_temp(spark, tmp_path):
    root = tmp_path / "audio"
    (root / "show1").mkdir(parents=True)
    (root / "show1" / "_processed").mkdir()
    (root / "show1" / "a.mp3").write_bytes(b"AAA")
    (root / "show1" / "b.mp3").write_bytes(b"BB")
    (root / "show1" / "c.wav").write_bytes(b"C")          # wrong ext
    (root / "show1" / "d.mp3.temp").write_bytes(b"D")     # partial
    (root / "show1" / "_processed" / "e.mp3").write_bytes(b"E")  # processed
    got = scan_directory(spark, str(root), ext="mp3")
    names = sorted(os.path.basename(r.path) for r in got.collect())
    assert names == ["a.mp3", "b.mp3"]
    sizes = {os.path.basename(r.path): (r.length, bytes(r.content)) for r in got.collect()}
    assert sizes["a.mp3"] == (3, b"AAA")


def test_scan_directory_wav_ext(spark, tmp_path):
    root = tmp_path / "audio2"
    root.mkdir()
    (root / "x.wav").write_bytes(b"W")
    (root / "y.mp3").write_bytes(b"M")
    got = scan_directory(spark, str(root), ext="wav", with_content=False)
    assert [os.path.basename(r.path) for r in got.collect()] == ["x.wav"]
    assert "content" not in got.columns


# ------------------------------------------------------------- ledger

def test_download_ledger_shape_and_skip(spark):
    eps = spark.createDataFrame(
        [("Podcast_7_100", "https://a/1.mp3", "T", "A", 1000),
         ("Podcast_7_101", "https://a/2.mp3", "T2", "A", 2000)],
        "id STRING, asset_url STRING, title STRING, author STRING, duration BIGINT",
    )
    existing = spark.createDataFrame([("Podcast_7_100",)], "id STRING")
    out = build_download_ledger(eps, existing).collect()
    assert len(out) == 1
    r = out[0]
    assert r.local_path == "downloads/Podcast_7/Podcast_7_101.mp3"
    assert r.cos_key == "cos/Podcast_7/Podcast_7_101.mp3"
    assert r.info == '{"title":"T2","author":"A","duration":2000}'
    assert (r.status, r.lock) == (0, 0)
