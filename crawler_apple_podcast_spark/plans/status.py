"""crawl_status state machine (SURVEY.md §2 K3).

The reference's frontier rows carry a tinyint lifecycle — 0 init,
1 pending, 2 processing, 3 ok, 4 fail (/root/reference/doc/
google_search.sql:10) — advanced by raw UPDATEs (/root/reference/db/
search_info.py:56-66, db/data_download.py:49-56).  Spark-side the same
contract is a MERGE: per-key latest-update-wins against the current
status table, committed through ``SnapshotStore`` (Iceberg ``MERGE
INTO`` on a real cluster).

Scale shape: one shuffle on the merge key (window row_number); the
updates side is a wave's delta (small), the current side the full
table — exactly the MERGE input shapes Iceberg optimizes, nothing is
collected or broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

STATUS_INIT = 0
STATUS_PENDING = 1
STATUS_PROCESSING = 2
STATUS_OK = 3
STATUS_FAIL = 4

# Legal transitions of the reference lifecycle (init -> pending ->
# processing -> ok|fail; fail may be retried back to pending).
VALID_TRANSITIONS = {
    STATUS_INIT: {STATUS_PENDING},
    STATUS_PENDING: {STATUS_PROCESSING},
    STATUS_PROCESSING: {STATUS_OK, STATUS_FAIL},
    STATUS_FAIL: {STATUS_PENDING},
    STATUS_OK: set(),
}


def merge_status(
    current: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    ts_col: str = "update_ts",
) -> DataFrame:
    """MERGE-INTO analog: per key, the latest update row wins; keys
    with no update keep their current row; update keys absent from
    ``current`` are inserts.  Both frames need the same schema."""
    tagged = updates.withColumn("_src", F.lit(1)).unionByName(
        current.withColumn("_src", F.lit(0))
    )
    w = Window.partitionBy(*key_cols).orderBy(
        F.col("_src").desc(), F.col(ts_col).desc()
    )
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )


def invalid_transitions(
    current: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    status_col: str = "status",
) -> DataFrame:
    """Updates that are not a legal lifecycle step from the key's
    current status (per VALID_TRANSITIONS).  The reference applies raw
    UPDATEs unchecked; this is the observability guard an operator
    wants before merging — join it out or alert on it."""
    cur = current.select(
        *key_cols, F.col(status_col).alias("_cur_status")
    )
    joined = updates.join(cur, key_cols, "left")
    cond = None
    for frm, tos in VALID_TRANSITIONS.items():
        if not tos:
            continue
        c = (F.col("_cur_status") == frm) & F.col(status_col).isin(*tos)
        cond = c if cond is None else (cond | c)
    # unknown keys are inserts: only PENDING (1) is a legal first state
    cond = cond | (F.col("_cur_status").isNull() & (F.col(status_col) == STATUS_PENDING))
    # coalesce: for inserts the _cur_status comparisons are NULL, and
    # where(~NULL) would silently drop the row instead of flagging it
    return joined.where(~F.coalesce(cond, F.lit(False))).drop("_cur_status")


def latest_status(status_rows: DataFrame, key_cols: list[str], ts_col: str = "wave") -> DataFrame:
    """Current status from an append-only status-delta table (the
    committed ``url_status`` wave partitions): latest row per key."""
    w = Window.partitionBy(*key_cols).orderBy(F.col(ts_col).desc())
    return (
        status_rows.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def wave_status_delta(fetch_log: DataFrame, deferred: DataFrame | None, wave: int) -> DataFrame:
    """Status delta emitted by one crawl wave: fetched rows land on
    3 (ok) / 4 (fail); politeness-deferred rows stay 1 (pending)."""
    out = fetch_log.select(
        "seed_index",
        "fetch_url",
        F.when(F.col("fetch_ok"), F.lit(STATUS_OK))
        .otherwise(F.lit(STATUS_FAIL))
        .cast("int")
        .alias("status"),
        F.lit(wave).alias("wave"),
    )
    if deferred is not None:
        out = out.unionByName(
            deferred.select(
                "seed_index",
                "fetch_url",
                F.lit(STATUS_PENDING).cast("int").alias("status"),
                F.lit(wave).alias("wave"),
            )
        )
    return out
