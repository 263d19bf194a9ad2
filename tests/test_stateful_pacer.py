"""applyInPandasWithState per-host pacer: credit rule matches the
batch ledger (fractional carry rolls forward, idle credit is not
banked) and state survives a query restart via the checkpoint."""

from __future__ import annotations

import pytest

from crawler_apple_podcast_spark.streaming.stateful_pacer import paced_admissions

SCHEMA = "url STRING, priority INT"


def _drop(spark, src, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(src)


def _run(spark, src, out, ckpt, **kw):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        paced_admissions(stream, **kw)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_pacer_carries_fractional_credit_across_batches(spark, tmp_path):
    tmp = str(tmp_path)
    src, out, ckpt = f"{tmp}/src", f"{tmp}/out", f"{tmp}/ckpt"
    kw = dict(batch_ms=3000, default_delay_ms=1000, delays={"a.example": 1750})

    # batch 1: host a has 5 pending; credit 3000, delay 1750 -> allow 1,
    # carry 1250.  host b (default 1000ms) has 1 pending; allow 3 but
    # only 1 admitted -> idle, carry resets to 0.
    _drop(
        spark,
        src,
        [(f"https://a.example/p/{i}", 0, ) for i in range(5)]
        + [("https://b.example/p/0", 0)],
    )
    _run(spark, src, out, ckpt, **kw)
    r1 = spark.read.parquet(out).collect()
    a1 = [r for r in r1 if r.host == "a.example"]
    b1 = [r for r in r1 if r.host == "b.example"]
    assert sum(r.admitted for r in a1) == 1 and a1[0].batch_allow == 1
    assert sum(r.admitted for r in b1) == 1 and b1[0].batch_allow == 3

    # batch 2 (restart from checkpoint -> state restored): credit
    # 3000 + 1250 = 4250 -> allow 2 for host a.
    _drop(spark, src, [(f"https://a.example/q/{i}", 0) for i in range(4)])
    _run(spark, src, out, ckpt, **kw)
    r2 = spark.read.parquet(out).collect()
    a2 = [r for r in r2 if r.host == "a.example" and "/q/" in r.url]
    assert sum(r.admitted for r in a2) == 2
    assert all(r.batch_allow == 2 for r in a2)

    # batch 3: idle reset held for b — 4 pending now, credit is a fresh
    # 3000 (the unused batch-1 allowance was NOT banked) -> allow 3.
    _drop(spark, src, [(f"https://b.example/q/{i}", 0) for i in range(4)])
    _run(spark, src, out, ckpt, **kw)
    r3 = spark.read.parquet(out).collect()
    b3 = [r for r in r3 if r.host == "b.example" and "/q/" in r.url]
    assert sum(r.admitted for r in b3) == 3


def test_pacer_admits_by_priority_then_url(spark, tmp_path):
    tmp = str(tmp_path)
    src, out, ckpt = f"{tmp}/src", f"{tmp}/out", f"{tmp}/ckpt"
    _drop(
        spark,
        src,
        [
            ("https://a.example/z", 1),
            ("https://a.example/a", 0),
            ("https://a.example/b", 0),
        ],
    )
    _run(spark, src, out, ckpt, batch_ms=2000, default_delay_ms=1000)
    rows = {r.url: r.admitted for r in spark.read.parquet(out).collect()}
    assert rows == {
        "https://a.example/a": True,
        "https://a.example/b": True,
        "https://a.example/z": False,
    }
