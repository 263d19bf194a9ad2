"""Distributed HTTP fetcher with an injectable client — the live
counterpart of ``wave_loop.make_join_fetcher``.

The reference fetches sequentially on one thread (``requests.get`` at
``/root/reference/handler/apple_podcast_api.py:43``, one URL per
10–15 s politeness cycle, ``crawler_podcasts.py:81``).  Here the
scheduled wave is fetched as a ``mapInPandas`` over the frontier: one
Arrow batch of URLs per task, ONE client per executor-worker process
(not per row, not per batch), an in-task thread pool for connection
concurrency, and bounded retries on retryable statuses.  Politeness is
enforced UPSTREAM by the gate (operators/politeness.py) — by the time
rows reach the fetcher they are within budget, so the fetcher itself
never sleeps.

The network socket is the ONLY part this sandbox cannot exercise, so
the client is injected: ``make_http_fetcher(factory)`` takes a factory
for any object with ``get(url) -> (status, body|None)``.  Production
passes a requests/httpx-session factory; tests pass ``DictClient`` /
``FlakyClient`` fakes and parity-check the fetcher against
``make_join_fetcher`` on the same pages table — everything except the
socket (schema, Arrow batching, per-process client reuse, retry loop,
miss semantics) runs for real.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from concurrent.futures import ThreadPoolExecutor

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import BinaryType, StructType

# One client per (executor-worker process, factory identity).  Keyed by
# the factory's qualified name: task retries and subsequent batches in
# the same Python worker reuse the connection pool instead of
# re-handshaking per task (the whole point of a pooled client).  The
# factory must therefore be a STABLE named callable (module function or
# class) — two distinct anonymous closures sharing a qualname would
# collide in the cache.
_CLIENT_CACHE: dict[tuple[str, str], object] = {}


def _client_for(factory: Callable[[], object]):
    key = (getattr(factory, "__module__", "?"), getattr(factory, "__qualname__", repr(factory)))
    client = _CLIENT_CACHE.get(key)
    if client is None:
        client = factory()
        _CLIENT_CACHE[key] = client
    return client


RETRYABLE = (429, 500, 502, 503, 504)


def make_http_fetcher(
    client_factory: Callable[[], object],
    url_col: str = "fetch_url",
    max_retries: int = 2,
    pool_size: int = 8,
    retryable: tuple[int, ...] = RETRYABLE,
):
    """Build a fetcher callable with the ``wave_loop`` fetch contract:
    ``fetch(wave_side) -> wave_side + html BINARY`` (null html = miss
    or exhausted retries).

    ``pool_size`` threads per TASK overlap request latency within one
    Arrow batch; total concurrency = tasks * pool_size, controlled by
    the wave's partitioning — so a 1000-executor crawl fans out without
    any driver choke point, and per-host pacing stays where it belongs
    (the politeness gate), not in fetcher sleeps."""

    def fetch(wave_side: DataFrame) -> DataFrame:
        # Copy the field list: StructType keeps the passed list by
        # REFERENCE, so .add() on a shared list would mutate the input
        # DataFrame's cached schema (and break its own analysis).
        out_schema = StructType(list(wave_side.schema.fields)).add("html", BinaryType())

        def run_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            client = _client_for(client_factory)

            def one(url: str) -> bytes | None:
                for attempt in range(max_retries + 1):
                    try:
                        status, body = client.get(url)
                    except Exception:
                        continue  # transport error: retry, then miss
                    if status == 200:
                        return None if body is None else bytes(body)
                    if status not in retryable:
                        return None
                return None

            with ThreadPoolExecutor(max_workers=pool_size) as pool:
                for pdf in batches:
                    html = list(pool.map(one, pdf[url_col].tolist()))
                    out = pdf.copy()
                    out["html"] = pd.Series(html, index=pdf.index, dtype=object)
                    yield out

        return wave_side.mapInPandas(run_batches, schema=out_schema)

    return fetch


class DictClient:
    """Test fake: serves ``mapping[url]`` with status 200, 404 on miss.
    Picklable (ships to executors inside the factory closure)."""

    def __init__(self, mapping: dict[str, bytes]):
        self.mapping = mapping

    def get(self, url: str) -> tuple[int, bytes | None]:
        body = self.mapping.get(url)
        return (200, body) if body is not None else (404, None)


class FlakyClient(DictClient):
    """Test fake: first ``fail_times`` hits per URL return a retryable
    503, then 200 — exercises the retry loop.  Per-process state, which
    is exactly the semantics of a per-worker client."""

    def __init__(self, mapping: dict[str, bytes], fail_times: int = 1):
        super().__init__(mapping)
        self.fail_times = fail_times
        self.seen: dict[str, int] = {}

    def get(self, url: str) -> tuple[int, bytes | None]:
        n = self.seen.get(url, 0)
        self.seen[url] = n + 1
        if n < self.fail_times:
            return (503, None)
        return super().get(url)
