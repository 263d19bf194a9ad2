"""Episode extraction — native ``from_json`` + ``posexplode`` pipeline.

Spark-first replacement of the reference's per-row dict surgery
(/root/reference/handler/apple_podcast_api.py:85-129): the page JSON is
parsed JVM-side with a pinned schema, episodes are exploded with their
array position (the O1 ordering key), and the 7-field record is built
from struct fields — all whole-stage-codegen.  The only Python on the
path is the byte-parity serializer, a grouped Arrow UDF reproducing
``json.dumps(..., indent=4, ensure_ascii=False)`` exactly
(utils/file.py:22) for golden comparison.

Known divergence (documented): the reference aborts the *remainder* of
a page when one item is malformed (apple_podcast_api.py:94-101
try/finally).  The native explode instead yields null fields for a
malformed item and keeps the rest; the synthetic corpus pins page-level
edge cases (missing ``data``, empty ``data``, bad ``next``) which both
paths handle identically.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..serde import EPISODE_FIELDS
from . import urls as U

ATTRS_SCHEMA = StructType(
    [
        StructField("itunesTitle", StringType()),
        StructField("url", StringType()),
        StructField("artistName", StringType()),
        StructField("durationInMilliseconds", LongType()),
        StructField("genreNames", ArrayType(StringType())),
        StructField("assetUrl", StringType()),
    ]
)

PAGE_SCHEMA = StructType(
    [
        StructField("next", StringType()),
        StructField(
            "data",
            ArrayType(
                StructType(
                    [StructField("id", StringType()), StructField("attributes", ATTRS_SCHEMA)]
                )
            ),
        ),
    ]
)

EPISODE_SCHEMA = (
    "id STRING, title STRING, full_url STRING, author STRING, "
    "duration BIGINT, categories ARRAY<STRING>, asset_url STRING"
)


def parse_pages(fetched: DataFrame, html_col: str = "html") -> DataFrame:
    """Decode + parse the page payload.  ``parsed`` is null for non-JSON
    bodies (the engine's analog of ``resp.json()`` raising)."""
    return fetched.withColumn(
        "parsed", F.from_json(F.decode(F.col(html_col), "UTF-8"), PAGE_SCHEMA)
    )


def extract_episodes(parsed: DataFrame, fetch_url_col: str = "fetch_url") -> DataFrame:
    """Explode one row per episode with the O1 key ``(seed_index,
    offset, pos)``.  Input needs columns ``seed_index``, ``wave``,
    ``parsed`` and ``fetch_url_col``."""
    uid = U.api_user_id(F.col(fetch_url_col))
    exploded = (
        parsed.where(F.col("parsed.data").isNotNull())
        .select(
            "seed_index",
            "wave",
            F.col(fetch_url_col).alias("source_url"),
            U.offset_of(F.col(fetch_url_col)).alias("offset"),
            uid.alias("user_id"),
            F.posexplode("parsed.data").alias("pos", "item"),
        )
    )
    return exploded.select(
        "seed_index",
        "offset",
        "pos",
        "wave",
        "source_url",
        F.concat(F.lit("Podcast_"), F.col("user_id"), F.lit("_"), F.col("item.id")).alias("id"),
        F.col("item.attributes.itunesTitle").alias("title"),
        F.col("item.attributes.url").alias("full_url"),
        F.col("item.attributes.artistName").alias("author"),
        F.col("item.attributes.durationInMilliseconds").alias("duration"),
        F.col("item.attributes.genreNames").alias("categories"),
        F.col("item.attributes.assetUrl").alias("asset_url"),
    )


def next_cursor(parsed: DataFrame) -> DataFrame:
    """Add ``next_url`` (absolutized, reference quirks included) and
    ``fetch_ok``.  ``next_url`` is null when the fetch/parse failed —
    i.e. the chain is dead."""
    validated = U.validate_next(F.col("parsed.next"))
    return parsed.withColumn(
        "fetch_ok", F.col("parsed").isNotNull()
    ).withColumn(
        "next_url",
        F.when(F.col("parsed").isNotNull(), U.absolutize_next(validated)),
    )


def _serialize_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped Arrow UDF body: records (already ordered) -> reference bytes."""
    out = []
    for url, grp in pdf.groupby("source_url", sort=False):
        grp = grp.sort_values("pos")
        records = [
            {
                "id": r.id,
                "title": r.title,
                "full_url": r.full_url,
                "author": r.author,
                "duration": None if pd.isna(r.duration) else int(r.duration),
                "categories": list(r.categories) if r.categories is not None else None,
                "asset_url": r.asset_url,
            }
            for r in grp.itertuples()
        ]
        out.append(
            {"url": url, "text": json.dumps(records, indent=4, ensure_ascii=False)}
        )
    return pd.DataFrame(out, columns=["url", "text"])


def parity_text(episodes: DataFrame) -> DataFrame:
    """Per source page, the reference's exact flush bytes (K1 parity).

    One Arrow round-trip per page group; everything upstream is native.
    """
    cols = ["source_url", "pos", *EPISODE_FIELDS]
    return (
        episodes.select(*cols)
        .groupBy("source_url")
        .applyInPandas(
            lambda pdf: _serialize_batch(pdf), schema="url STRING, text STRING"
        )
    )


def asset_paths(
    episodes: DataFrame, save_dir: str = "downloads", cos_save_path: str = "cos"
) -> DataFrame:
    """P9 file-path derivation (/root/reference/handler/
    apple_podcast_api.py:146-150, 163): local save path
    ``{save_dir}/Podcast_{uid}/{composite_id}.mp3`` and COS key
    ``{cos_save_path}/Podcast_{uid}/{composite_id}.mp3`` — pure string
    exprs over the composite episode id (``Podcast_{uid}_{eid}``)."""
    uid = F.regexp_extract("id", r"^Podcast_([^_]*)_", 1)
    sub = F.concat(F.lit("Podcast_"), uid)
    fname = F.concat(F.col("id"), F.lit(".mp3"))
    return episodes.withColumn(
        "local_path", F.concat_ws("/", F.lit(save_dir), sub, fname)
    ).withColumn("cos_key", F.concat_ws("/", F.lit(cos_save_path), sub, fname))
