"""Stateful per-host pacing for streaming candidate feeds
(``applyInPandasWithState``).

The batch engine carries politeness credit between waves with a
DataFrame ledger (``operators/politeness.py``: ``pacing_allowance`` /
``pacing_carry_update`` — the distributed form of the reference's
one-fetch-per-10-15-s-per-host sleep, ``/root/reference/
crawler_podcasts.py:81``).  In a continuous deployment the feed never
pauses between "waves", so the ledger lives in Structured Streaming's
managed GROUP STATE instead: one tiny ``carry_ms`` per host, stored in
the checkpoint, restored on restart, sharded with the host hash —
bounded state (8 bytes/host), no driver involvement, any number of
executors.

Credit rule — IDENTICAL to the batch ledger, per micro-batch:

    credit  = batch_ms + carry          (carry starts at 0)
    allow   = max(0, credit // delay_ms)
    admit   = min(pending, allow)
    carry'  = 0                 if pending < allow   (idle NOT banked)
            = credit - admit * delay_ms  otherwise   (fractional credit
                                                      rolls forward)

Rows come out with an ``admitted`` flag rather than being withheld:
state must stay bounded, so deferral/requeueing is the caller's sink
policy (the batch engine makes the same split — the gate flags, the
wave loop carries).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.urls import host_of

OUTPUT_SCHEMA = (
    "host STRING, url STRING, priority INT, admitted BOOLEAN, batch_allow INT"
)
STATE_SCHEMA = "carry_ms LONG"


def paced_admissions(
    candidates: DataFrame,
    batch_ms: int,
    default_delay_ms: int = 1000,
    delays: dict[str, int] | None = None,
) -> DataFrame:
    """Tag each candidate row with ``admitted`` under the per-host
    credit rule, carrying fractional credit across micro-batches in
    group state.

    ``candidates``: streaming frame with ``url STRING, priority INT``
    (host derived here).  ``delays``: per-host crawl-delay overrides in
    ms (e.g. from robots ``Crawl-delay``); ships to executors in the
    function closure — host-count-bounded, like the batch engine's
    broadcast delay dim.  Admission order within a batch is
    deterministic: (priority, url)."""
    delay_map = {str(k): int(v) for k, v in (delays or {}).items()}
    batch_ms = int(batch_ms)
    default_delay_ms = int(default_delay_ms)

    def pace(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (host,) = key
        carry = int(state.get[0]) if state.exists else 0
        rows = pd.concat(list(pdfs), ignore_index=True)
        delay = delay_map.get(host, default_delay_ms)
        credit = batch_ms + carry
        allow = max(0, credit // delay)
        rows = rows.sort_values(["priority", "url"], kind="mergesort").reset_index(
            drop=True
        )
        pending = len(rows)
        admit = min(pending, allow)
        new_carry = 0 if pending < allow else credit - admit * delay
        state.update((int(new_carry),))
        yield pd.DataFrame(
            {
                "host": host,
                "url": rows["url"],
                "priority": rows["priority"].astype("int32"),
                "admitted": rows.index < allow,
                "batch_allow": int(allow),
            }
        )

    with_host = candidates.withColumn("host", host_of(F.col("url"))).select(
        "host", "url", "priority"
    )
    return with_host.groupBy("host").applyInPandasWithState(
        pace,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
