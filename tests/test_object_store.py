"""K5-lite object-store sink: claim -> upload -> finalize lifecycle,
blob byte content, failure paths, and kill/resume through SnapshotStore
(plans/object_store.py)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from crawler_apple_podcast_spark.plans.ledger import build_download_ledger
from crawler_apple_podcast_spark.plans.object_store import (
    deterministic_fake_fetch,
    reclaim_stale,
    retry_failed,
    run_download_cycle,
    upload_assets,
)
from crawler_apple_podcast_spark.plans.snapshots import SnapshotStore
from crawler_apple_podcast_spark.plans.status import merge_status  # noqa: F401 (API)


def _episodes(spark, n=6):
    return spark.range(n).select(
        F.concat(F.lit("Podcast_u"), F.pmod("id", F.lit(2)).cast("string"),
                 F.lit("_e"), F.col("id").cast("string")).alias("id"),
        F.concat(F.lit("https://assets.example/"), F.col("id").cast("string"),
                 F.lit(".mp3")).alias("asset_url"),
        F.concat(F.lit("t"), F.col("id").cast("string")).alias("title"),
        F.lit("auth").alias("author"),
        (F.col("id") * 100).alias("duration"),
    )


def _make_failing_fetch():
    # Defined as a closure: cloudpickle ships it by VALUE — a module-
    # level function in tests/ is pickled by reference and executors
    # cannot import the test module.
    def failing_fetch(url: str) -> bytes:
        if url.endswith("3.mp3"):
            raise RuntimeError("simulated 404")
        return deterministic_fake_fetch(url)

    return failing_fetch


def test_full_cycle_uploads_and_finalizes(spark, tmp_path):
    bucket = str(tmp_path / "bucket")
    ledger = build_download_ledger(_episodes(spark))
    final, outcomes = run_download_cycle(spark, ledger, bucket)
    stat = {r.id: (r.status, r.lock) for r in final.collect()}
    assert len(stat) == 6 and all(v == (3, 0) for v in stat.values())
    # blob content is byte-exact at the ledger's cos_key
    for r in final.collect():
        path = os.path.join(bucket, r.cos_key)
        assert os.path.exists(path)
        with open(path, "rb") as f:
            assert f.read() == deterministic_fake_fetch(r.asset_url)
    # second cycle: nothing claimable, nothing re-uploaded
    final2, outcomes2 = run_download_cycle(spark, final, bucket)
    assert outcomes2.count() == 0
    assert {r.id: (r.status, r.lock) for r in final2.collect()} == stat


def test_failures_land_on_status_4_and_retry(spark, tmp_path):
    bucket = str(tmp_path / "bucket")
    ledger = build_download_ledger(_episodes(spark))
    final, outcomes = run_download_cycle(
        spark, ledger, bucket, fetch_fn=_make_failing_fetch()
    )
    by_stat = {r.id: r.status for r in final.collect()}
    failed = [i for i, s in by_stat.items() if s == 4]
    assert failed == ["Podcast_u1_e3"]
    assert sorted(r.id for r in outcomes.where(~F.col("ok")).collect()) == failed
    assert not os.path.exists(os.path.join(bucket, "cos/Podcast_u1/Podcast_u1_e3.mp3"))
    # retry path: 4 -> 0, then a clean cycle completes it
    final2, _ = run_download_cycle(
        spark, retry_failed(final), bucket, cycle=1
    )
    assert all(r.status == 3 for r in final2.collect())


def test_kill_between_claim_and_finalize_resumes(spark, tmp_path):
    bucket = str(tmp_path / "bucket")
    root = str(tmp_path / "snaps")
    store = SnapshotStore(spark, root)
    ledger = build_download_ledger(_episodes(spark))

    # Simulate the kill: run ONLY the claim commit (phase 1) by hand —
    # same code path run_download_cycle takes before the upload stage.
    from crawler_apple_podcast_spark.plans.object_store import _with_ts
    from crawler_apple_podcast_spark.plans.status import (
        STATUS_INIT, STATUS_PROCESSING, merge_status,
    )
    lg = _with_ts(ledger, 0)
    claim_delta = _with_ts(
        lg.where((F.col("status") == STATUS_INIT) & (F.col("lock") == 0))
        .withColumn("status", F.lit(STATUS_PROCESSING).cast("int"))
        .withColumn("lock", F.lit(1).cast("int"))
        .drop("update_ts"),
        1,
    )
    claimed = merge_status(lg, claim_delta, ["id"], "update_ts").drop("update_ts")
    store.commit_wave(0, {"download_ledger": claimed})
    # crash here: no blobs written, rows stuck at (2, locked)
    assert not os.path.isdir(bucket) or not os.listdir(bucket)

    resumed = store.read_wave("download_ledger", store.last_committed_wave())
    assert {(r.status, r.lock) for r in resumed.collect()} == {(2, 1)}
    released = reclaim_stale(resumed)
    final, _ = run_download_cycle(spark, released, bucket, store=store, cycle=1)
    assert all((r.status, r.lock) == (3, 0) for r in final.collect())
    # claim + finalize snapshots committed after resume
    assert store.last_committed_wave() == 3
    head = store.read_wave("download_ledger", 3)
    assert all(r.status == 3 for r in head.collect())
