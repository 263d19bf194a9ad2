"""Per-host politeness scheduling (SURVEY.md §2.7 / §4.3).

The reference sleeps 10-15 s between pages of ONE host
(/root/reference/crawler_podcasts.py:81, utils/utime.py:5-14) and
consults nothing else; the engine turns that into a per-host *budget*:
with crawl-delay d and a wave lasting W seconds, a host may receive at
most ``max(1, W // d)`` fetches per wave.  Crawl-delays come from the
corpus' own ``robots.txt`` rows (broadcast as a tiny dim table).

Scale note: ranking "top-B per host" with a window over ``host`` puts
the whole ``amp-api.podcasts.apple.com`` skew bucket in ONE task — at
the 10^10-URL target that single sorted partition is the job.  The
gate instead computes the exact per-host rank with a *parallel* sort:

1. ``repartitionByRange(host, priority, hash, url)`` — Spark's
   sampled range exchange + per-partition sort, fully parallel; the
   hot host spans MANY consecutive partitions instead of one task.
2. ``monotonically_increasing_id()`` after the sort is
   ``(partition_id << 33) + local_row_index`` — a JVM-side,
   order-stable partition-local index for free (no Python boundary,
   no second window).
3. Per-partition counts (tiny, one row per partition) turn the local
   index into a global sort position; ``min(position) per host``
   (a parallel agg) turns that into the exact per-host rank.

``deferred`` falls out as ``rank > budget`` — no anti-join needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.urls import host_of, url_hash

_MID_BITS = 33  # monotonically_increasing_id: (pid << 33) + local index

# Persisted intermediates of parallel_host_rank, kept so long-running
# callers (the wave loop) can release them once the wave's outputs are
# materialized — otherwise every wave leaks one cached frame.
_rank_cache: list[DataFrame] = []


def release_rank_cache() -> None:
    """Unpersist all rank intermediates persisted since the last call."""
    while _rank_cache:
        _rank_cache.pop().unpersist()


def parse_robots(pages: DataFrame) -> DataFrame:
    """robots.txt rows -> ``(host, crawl_delay, disallow)`` dim table."""
    robots = pages.where(F.col("url").rlike(r"^https?://[^/]+/robots\.txt$"))
    body = F.decode(F.col("html"), "UTF-8")
    return robots.select(
        host_of(F.col("url")).alias("host"),
        F.regexp_extract(body, r"Crawl-delay:\s*([0-9]+)", 1).try_cast("int").alias("crawl_delay"),
        F.regexp_extract(body, r"Disallow:\s*(\S+)", 1).alias("disallow"),
    )


def filter_disallowed(frontier: DataFrame, robots: DataFrame, url_col: str = "fetch_url") -> DataFrame:
    """Drop frontier rows whose path matches the host's Disallow prefix.

    ``robots`` is tiny (one row per host) -> broadcast join.
    """
    f = frontier.withColumn("_host", host_of(F.col(url_col)))
    joined = f.join(F.broadcast(robots.select("host", "disallow")),
                    f["_host"] == robots["host"], "left")
    path = F.parse_url(F.col(url_col), F.lit("PATH"))
    blocked = (
        F.col("disallow").isNotNull()
        & (F.length("disallow") > 0)
        & path.startswith(F.col("disallow"))
    )
    return joined.where(~blocked).drop("host", "disallow", "_host")


def host_budgets(robots: DataFrame, wave_seconds: int, default_delay: int = 5) -> DataFrame:
    """Budget dim table: fetches allowed per host per wave."""
    delay = F.coalesce(F.col("crawl_delay"), F.lit(default_delay))
    return robots.select(
        "host",
        F.greatest(F.lit(1), (F.lit(wave_seconds) / delay).cast("int")).alias("budget"),
    )


def parallel_host_rank(
    df: DataFrame,
    host_col: str,
    order_cols: list,
    out_col: str = "_rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact 1-based rank of each row within its ``host_col`` group by
    ``order_cols``, computed with a parallel range sort — no per-group
    single-task window, so a group holding 90% of all rows (the
    apple.com skew bucket) still ranks at full cluster parallelism.

    The returned frame is range-sorted; ties beyond ``order_cols`` get
    an arbitrary but stable-within-run order (callers include a unique
    key, e.g. the url, for full determinism).
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))

    keys = [F.col(host_col), *order_cols]
    s = (
        df.repartitionByRange(num_partitions, *keys)
        .sortWithinPartitions(*keys)
        # (pid << 33) + local index, assigned AFTER the sort, JVM-side.
        .withColumn("_mid", F.monotonically_increasing_id())
        .withColumn("_pid", F.shiftright("_mid", _MID_BITS).cast("int"))
        .withColumn("_lidx", F.col("_mid").bitwiseAND(F.lit((1 << _MID_BITS) - 1)))
        .drop("_mid")
        .persist()
    )
    _rank_cache.append(s)

    # ONE aggregate over the big frame; everything else happens on the
    # tiny (pid, host) stats frame (<= partitions + hosts rows):
    #   pstart[pid]      cumulative row count of earlier partitions
    #   gstart(pid,host) global position of the host's first row in pid
    #   hstart[host]     global position of the host's first row overall
    #   delta(pid,host)  pstart - hstart  ->  rank = lidx + delta + 1
    stats = s.groupBy("_pid", host_col).agg(
        F.count(F.lit(1)).alias("_cnt"), F.min("_lidx").alias("_flidx")
    )
    pid_w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    pid_offsets = (
        stats.groupBy("_pid")
        .agg(F.sum("_cnt").alias("_pcnt"))
        .withColumn("_pstart", F.coalesce(F.sum("_pcnt").over(pid_w), F.lit(0)))
        .drop("_pcnt")
    )
    st = stats.join(pid_offsets, "_pid").withColumn(
        "_gstart", F.col("_pstart") + F.col("_flidx")
    )
    st = st.withColumn(
        "_hstart", F.min("_gstart").over(Window.partitionBy(host_col))
    )
    deltas = st.select(
        "_pid", host_col, (F.col("_pstart") - F.col("_hstart")).alias("_delta")
    )

    # Broadcast join preserves the range partitioning — no extra
    # shuffle of the big frame.
    ranked = s.join(F.broadcast(deltas), ["_pid", host_col]).withColumn(
        out_col, (F.col("_lidx") + F.col("_delta") + 1).cast("int")
    )
    return ranked.drop("_pid", "_lidx", "_delta")


def hash_bucketed_host_rank(
    df: DataFrame,
    host_col: str,
    priority_col,
    hash_col: str,
    tiebreak_col: str,
    out_col: str = "_rn",
    n_buckets: int = 32,
) -> DataFrame:
    """Exact per-host rank by ``(priority, hash, tiebreak)`` with no
    single-task window AND no ``repartitionByRange`` sampling pass.

    The hash column is uniform, so its top bits are an ORDER-ALIGNED
    salt: for equal priority, signed(hash_a) < signed(hash_b) implies
    bucket_a <= bucket_b (arithmetic shift keeps signed order).  The
    skewed host therefore spreads over ``n_buckets`` ordinary window
    partitions, and the global per-host rank is
    ``local row_number + offset``, where offsets come from one tiny
    (host, priority, bucket) count aggregate.  Exactly one shuffle of
    the big frame, no sampling job, no persist."""
    if n_buckets & (n_buckets - 1) != 0:
        raise ValueError(f"n_buckets must be a power of two, got {n_buckets}")
    k = n_buckets.bit_length() - 1
    b = df.withColumn("_bkt", F.shiftright(F.col(hash_col), 64 - k).cast("int"))
    cnt = b.groupBy(host_col, priority_col, "_bkt").agg(F.count(F.lit(1)).alias("_c"))
    ow = (
        Window.partitionBy(host_col)
        .orderBy(priority_col, "_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = cnt.withColumn("_off", F.coalesce(F.sum("_c").over(ow), F.lit(0))).drop("_c")
    lw = Window.partitionBy(host_col, priority_col, "_bkt").orderBy(
        hash_col, tiebreak_col
    )
    ranked = b.join(off, [host_col, priority_col, "_bkt"]).withColumn(
        out_col, (F.row_number().over(lw) + F.col("_off")).cast("int")
    )
    return ranked.drop("_bkt", "_off")


def politeness_gate(
    frontier: DataFrame,
    budgets: DataFrame | None,
    default_budget: int = 1_000_000_000,
    url_col: str = "fetch_url",
    priority_col: str = "priority",
    salt_n: int = 16,  # kept for API compat; parallel rank needs no salt
    key_cols: list[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Split the frontier into (scheduled, deferred) for this wave.

    Deterministic order within a host: ``(priority, url_hash, url)``.
    Both outputs keep all original frontier columns; deferred rows
    should be unioned into the next wave's frontier.
    """
    f = frontier.withColumn("_host", host_of(F.col(url_col))).withColumn(
        "_uh", url_hash(F.col(url_col))
    )
    if budgets is not None:
        f = f.join(F.broadcast(budgets), f["_host"] == budgets["host"], "left").drop("host")
        f = f.withColumn("_budget", F.coalesce(F.col("budget"), F.lit(default_budget))).drop("budget")
    else:
        f = f.withColumn("_budget", F.lit(default_budget))

    # Order-aligned hash-prefix salting: the skewed host spans many
    # window partitions, no range-sampling pass, no cached intermediate.
    ranked = hash_bucketed_host_rank(f, "_host", priority_col, "_uh", url_col)

    helper = ["_host", "_uh", "_budget", "_rn"]
    scheduled = ranked.where(F.col("_rn") <= F.col("_budget")).drop(*helper)
    deferred = ranked.where(F.col("_rn") > F.col("_budget")).drop(*helper)
    return scheduled, deferred


# -------------------------------------------------- cross-wave pacing
#
# The per-wave budget alone is a RATE only when every wave lasts
# exactly ``wave_seconds``: floor() truncation loses up to one
# crawl-delay of credit per wave, and variable wave lengths let a
# short wave followed by a long one exceed the host's average rate.
# The reference's semantics is a rate — one fetch per 10-15 s per host
# (crawler_podcasts.py:81) — so the engine carries per-host credit
# across waves in a tiny (host, carry_ms) ledger:
#
#   credit  = wave_ms + carry          (ms the host may spend)
#   budget  = max(0, credit // delay)  (0 = host still in debt: a
#                                       30 s-delay host in 10 s waves
#                                       fetches every 3rd wave, never
#                                       "at least once per wave")
#   carry'  = credit - n*delay   if the host used its full budget
#           = 0                  if it scheduled fewer than allowed
#                                (idle time is NOT banked — a host
#                                with an empty frontier must not earn
#                                a burst allowance for later)
#
# All three frames are host-dim-sized (broadcastable); the big
# frontier is only ever touched by the gate itself.


def host_delays(robots: DataFrame, default_delay_ms: int = 5000) -> DataFrame:
    """(host, delay_ms) dim table from robots crawl-delays."""
    return robots.select(
        "host",
        (F.coalesce(F.col("crawl_delay"), F.lit(default_delay_ms / 1000.0)) * 1000)
        .cast("long")
        .alias("delay_ms"),
    )


def _with_credit(delays: DataFrame, carry: DataFrame | None, wave_ms: int) -> DataFrame:
    d = delays
    if carry is None:
        return d.withColumn("_credit", F.lit(int(wave_ms)).cast("long"))
    return (
        d.join(F.broadcast(carry), "host", "left")
        .withColumn(
            "_credit", F.lit(int(wave_ms)) + F.coalesce(F.col("carry_ms"), F.lit(0))
        )
        .drop("carry_ms")
    )


def pacing_allowance(
    delays: DataFrame, carry: DataFrame | None, wave_ms: int
) -> DataFrame:
    """Per-host budget for THIS wave under rate pacing: (host, budget).
    Plugs straight into ``politeness_gate``'s ``budgets`` argument."""
    c = _with_credit(delays, carry, wave_ms)
    return c.select(
        "host",
        F.greatest(
            F.lit(0), F.floor(F.col("_credit") / F.col("delay_ms"))
        ).cast("int").alias("budget"),
    )


def pacing_carry_update(
    delays: DataFrame,
    carry: DataFrame | None,
    scheduled_counts: DataFrame,
    wave_ms: int,
) -> DataFrame:
    """Next wave's (host, carry_ms) ledger given what this wave
    actually scheduled (``scheduled_counts``: (host, n))."""
    c = _with_credit(delays, carry, wave_ms)
    j = (
        c.join(F.broadcast(scheduled_counts), "host", "left")
        .withColumn("_n", F.coalesce(F.col("n"), F.lit(0)))
        .withColumn(
            "_allow", F.greatest(F.lit(0), F.floor(F.col("_credit") / F.col("delay_ms")))
        )
    )
    return j.select(
        "host",
        F.when(F.col("_n") < F.col("_allow"), F.lit(0).cast("long"))
        .otherwise(F.col("_credit") - F.col("_n") * F.col("delay_ms"))
        .alias("carry_ms"),
    )


# --------------------------------------- adaptive crawl-delay (AIMD)

def adaptive_delay(
    fetch_log: DataFrame,
    delays: DataFrame,
    default_delay_ms: int = 1000,
    min_delay_ms: int = 100,
    max_delay_ms: int = 60_000,
    err_backoff_milli: int = 100,
    fast_latency_ms: int = 200,
    decrease_step_ms: int = 50,
) -> DataFrame:
    """AIMD crawl-delay controller: per host, tune the politeness delay
    from the last wave's observed behavior the way TCP tunes cwnd —
    multiplicative backoff on distress, additive decrease when the
    server is comfortably fast, hold otherwise.

    - error share > ``err_backoff_milli`` per-mille  -> ``delay * 2``
      (capped at ``max_delay_ms``), action ``'backoff'``;
    - mean latency < ``fast_latency_ms``             -> ``delay -
      decrease_step_ms`` (floored at ``min_delay_ms``), ``'decrease'``;
    - otherwise ``'hold'``.  Hosts with traffic but no delay row start
      from ``default_delay_ms``; hosts with a delay row but no traffic
      hold.

    All state is integers (error share in per-mille, mean latency by
    integer division), so the controller replays exactly in SQL and
    two engines never drift by a rounding ULP.  Plan: one map-side-
    combined groupBy(host) over the fetch log + one host-keyed outer
    join against the (hosts-sized, not fetch-sized) delay table.
    """
    stats = fetch_log.groupBy("host").agg(
        F.sum(F.when(F.col("ok"), 1).otherwise(0)).alias("n_ok"),
        F.sum(F.when(F.col("ok"), 0).otherwise(1)).alias("n_err"),
        F.sum("latency_ms").alias("_lat_sum"),
        F.count(F.lit(1)).alias("_n"),
    )
    j = delays.select("host", "delay_ms").join(stats, "host", "full_outer")
    cur = F.coalesce(F.col("delay_ms"), F.lit(default_delay_ms))
    err_milli = F.expr("(1000 * n_err) div (n_ok + n_err)")
    mean_lat = F.expr("_lat_sum div _n")
    action = F.when(F.col("_n").isNull(), F.lit("hold")).when(
        err_milli > err_backoff_milli, F.lit("backoff")
    ).when(mean_lat < fast_latency_ms, F.lit("decrease")).otherwise(F.lit("hold"))
    nxt = (
        F.when(action == "backoff", F.least(cur * 2, F.lit(max_delay_ms)))
        .when(
            action == "decrease",
            F.greatest(cur - decrease_step_ms, F.lit(min_delay_ms)),
        )
        .otherwise(cur)
    )
    return j.select(
        "host",
        nxt.cast("long").alias("delay_ms"),
        F.coalesce("n_ok", F.lit(0)).cast("long").alias("n_ok"),
        F.coalesce("n_err", F.lit(0)).cast("long").alias("n_err"),
        F.coalesce(err_milli, F.lit(0)).cast("long").alias("err_milli"),
        F.coalesce(mean_lat, F.lit(-1)).cast("long").alias("mean_latency_ms"),
        action.alias("action"),
    )
