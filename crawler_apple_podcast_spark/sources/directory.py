"""S7 directory scan (SURVEY.md §2.1).

The reference walks a download directory collecting files by extension
while skipping ``_processed`` directories and ``.temp`` partial files
(/root/reference/utils/tool.py:42-52, 55-65 — ``get_audio_files`` /
``get_specific_files``).

Spark-native: the ``binaryFile`` source with ``recursiveFileLookup`` +
``pathGlobFilter``.  Filters on the metadata columns (``path``,
``length``, ``modificationTime``) are pushed to file listing, so a
skipped directory's blobs are never read — the distributed analog of
the reference's pruned walk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def scan_directory(
    spark: SparkSession,
    root: str,
    ext: str = "mp3",
    skip_dirs: tuple[str, ...] = ("_processed",),
    skip_suffixes: tuple[str, ...] = (".temp",),
    with_content: bool = True,
) -> DataFrame:
    """Recursive file scan: (path, modificationTime, length[, content]).

    ``ext`` mirrors ``get_specific_files(folder, ext)``;
    ``skip_dirs`` / ``skip_suffixes`` mirror the walk's pruning.
    """
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", f"*.{ext}")
        .option("recursiveFileLookup", "true")
        .load(root)
    )
    for d in skip_dirs:
        df = df.where(~F.col("path").contains(f"/{d}/"))
    for s in skip_suffixes:
        df = df.where(~F.col("path").endswith(s))
    cols = ["path", "modificationTime", "length"] + (
        ["content"] if with_content else []
    )
    return df.select(*cols)
