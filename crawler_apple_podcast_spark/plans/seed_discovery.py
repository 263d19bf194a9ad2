"""E2 seed-discovery pipeline, end-to-end (SURVEY.md §3 E2).

The reference's second entry point (``python main.py google``,
/root/reference/crawler_goolge_search.py:4-23): search-result URLs ->
P1 validity filter -> windowed result range -> P4 user-id extract ->
sequential 2-key OR dedupe against ``web_search_info`` -> insert with
``crawl_status=1`` (/root/reference/handler/google_api.py:68-95).

Here the candidate source is a DataFrame (search results joined from
the pages corpus or any discovery feed); every stage is the engine's
existing operator, wired in reference order, with the insert persisted
through ``SnapshotStore`` as a ``web_search_info``-shaped commit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import urls as U
from ..operators.dedupe import sequential_or_dedupe
from .snapshots import SnapshotStore
from .status import STATUS_PENDING


def run_seed_discovery(
    candidates: DataFrame,
    seen: DataFrame,
    result_window: tuple[int, int] | None = None,
    store: SnapshotStore | None = None,
    wave: int = 0,
) -> DataFrame:
    """Candidate result URLs -> inserted ``web_search_info`` rows.

    ``candidates``: (ord, url) in discovery order (the reference's
    sequential result stream); ``seen``: persisted (url, uid) rows.
    ``result_window``: the Google ``start/stop`` slice (O2),
    e.g. ``(200, 5000)`` — applied on the discovery order.
    Returns (ord, url, uid, status=1) in insertion order; with
    ``store`` set the batch is one atomic commit.
    """
    # P1 validity filter: drop empties / non-http (google_api.py:29-33).
    cand = candidates.where(
        (F.col("url").isNotNull())
        & (F.col("url") != "")
        & F.col("url").startswith("http")
    )
    # O2 result window on the discovery order: distributed top-`stop`
    # (TakeOrderedAndProject) before ranking the bounded slice — the
    # global row_number window never sees the full candidate stream.
    if result_window is not None:
        start, stop = result_window
        top = cand.orderBy("ord").limit(stop)
        w = Window.orderBy("ord")
        cand = (
            top.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") > start)
            .drop("_rn")
        )
    # P4 user-id extract; D1 sequential OR-dedupe (exact batch replay).
    cand = cand.withColumn("uid", U.show_user_id(F.col("url")))
    inserted = sequential_or_dedupe(cand, seen, "url", "uid", "ord")
    out = inserted.select(
        "ord", "url", "uid", F.lit(STATUS_PENDING).cast("int").alias("status")
    )
    if store is not None:
        store.commit_wave(wave, {"web_search_info": out}, metrics={"stage": "seed_discovery"})
        out = store.read_wave("web_search_info", wave)
    return out
