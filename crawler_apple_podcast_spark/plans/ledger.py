"""Download/asset ledger (SURVEY.md §2 K4/K5 + the
``crawler_download_info`` table shape).

The reference tracks every downloaded asset in MySQL
(/root/reference/doc/data_download.sql:8-32): an ``info`` JSON column
(:20), a ``status`` tinyint lifecycle (:18) and a ``lock`` flag (:19),
written by the DAO (/root/reference/db/data_download.py:3-56) around
the local-download + COS-upload chain
(handler/apple_podcast_api.py:137-182).

Spark-side the ledger is a DataFrame/Iceberg table built from extracted
episodes: P9 path derivation, metadata packed into an ``info`` JSON
string, lifecycle columns from the K3 state machine.  Dedupe against
the existing ledger is ``skip_if_exists`` (D2); the physical blob
write / object-store upload stays a sink stub by design (SURVEY K4/K5 —
out of crawl-engine scope)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.episodes import asset_paths
from ..operators.dedupe import skip_if_exists
from .status import STATUS_INIT


def build_download_ledger(
    episodes: DataFrame,
    existing: DataFrame | None = None,
    save_dir: str = "downloads",
    cos_save_path: str = "cos",
) -> DataFrame:
    """Episodes -> new ledger rows (id, asset_url, local_path, cos_key,
    info JSON, status=0, lock=0), minus ids already in ``existing``."""
    rows = asset_paths(episodes, save_dir, cos_save_path).select(
        "id",
        "asset_url",
        "local_path",
        "cos_key",
        F.to_json(
            F.struct(
                F.col("title"), F.col("author"), F.col("duration")
            )
        ).alias("info"),
        F.lit(STATUS_INIT).cast("int").alias("status"),
        F.lit(0).cast("int").alias("lock"),
    )
    if existing is not None:
        rows = skip_if_exists(rows, existing, "id")
    return rows
