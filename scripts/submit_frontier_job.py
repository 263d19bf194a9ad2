"""Cluster entry point for the frontier engine (north_rule:
"runs via spark-submit --py-files on multi-executor clusters").

Local sandbox has no cluster manager; on a real deployment:

    cd /root/repo && zip -r /tmp/capods.zip crawler_apple_podcast_spark
    spark-submit \
        --master yarn --deploy-mode cluster \
        --num-executors $N --executor-cores 4 --executor-memory 8g \
        --conf spark.sql.adaptive.enabled=true \
        --conf spark.sql.shuffle.partitions=$((N * 8)) \
        --py-files /tmp/capods.zip \
        scripts/submit_frontier_job.py \
        --pages  s3://bucket/pages   \
        --seeds  s3://bucket/seeds   \
        --snapshots s3://bucket/crawl-snapshots \
        [--resume]

The same module code runs unchanged: ``get_spark`` defers master /
executor topology to the submitter, and the SnapshotStore root works on
any Hadoop-compatible filesystem.  Locally this script self-tests on a
generated corpus:  ``python scripts/submit_frontier_job.py --selftest``.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from crawler_apple_podcast_spark.plans.snapshots import SnapshotStore
from crawler_apple_podcast_spark.plans.wave_loop import WaveConfig, run_crawl
from crawler_apple_podcast_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", help="pages table path (url, warc_ts, html, text, lang)")
    ap.add_argument("--seeds", help="seeds table path (seed_index, url)")
    ap.add_argument("--snapshots", help="snapshot-store root (per-wave commits)")
    ap.add_argument("--resume", action="store_true", help="resume from last committed wave")
    ap.add_argument("--max-waves", type=int, default=64)
    ap.add_argument("--wave-seconds", type=int, default=3600)
    ap.add_argument("--selftest", action="store_true", help="run on a small generated corpus")
    args = ap.parse_args()

    spark = get_spark(app_name="frontier-crawl")

    if args.selftest:
        from crawler_apple_podcast_spark.datagen import CorpusParams, generate_corpus
        from crawler_apple_podcast_spark.datagen.corpus import to_spark

        pages, seeds = to_spark(spark, *generate_corpus(CorpusParams(n_shows=10)))
        pages.cache().count()
        snap_root = args.snapshots or tempfile.mkdtemp(prefix="snap_")
    else:
        if not (args.pages and args.seeds and args.snapshots):
            ap.error("--pages/--seeds/--snapshots required (or --selftest)")
        pages = spark.read.parquet(args.pages)
        seeds = spark.read.parquet(args.seeds)
        snap_root = args.snapshots

    store = SnapshotStore(spark, snap_root)
    out = run_crawl(
        spark,
        pages,
        seeds,
        WaveConfig(max_waves=args.max_waves, wave_seconds=args.wave_seconds),
        store=store,
        resume=args.resume,
    )
    print(
        json.dumps(
            {
                "waves": out.n_waves,
                "episodes": out.episodes.count(),
                "snapshot_root": snap_root,
                "lineage_waves": len(store.lineage()),
            }
        )
    )


if __name__ == "__main__":
    main()
