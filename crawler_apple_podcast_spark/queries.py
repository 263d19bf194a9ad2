"""Driver-contract query catalog (SURVEY.md §2 operator inventory).

Each entry pairs a Spark DataFrame program with an ANSI-SQL oracle that
DuckDB runs over the same parquet tables.  Naming convention ties each
query to the operator-inventory id it demonstrates (``p1_…``, ``d1_…``,
``o2_…`` — SURVEY.md §2), plus the training-data-pipeline operators
(dedup / similarity / text analysis) that the engine adds beyond the
reference.

Design rules for exact cross-engine parity:
- money is compared in integer *cents* (``CAST(ROUND(x*100) AS BIGINT)``),
  ratios in integer per-mille — never raw double aggregates;
- timestamps are compared as formatted strings;
- every computed column is aliased identically on both sides;
- approximate operators (MinHash-LSH) are *prune-only* with exact
  confirmation, so their oracle is the exact computation.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions import feeds as FD
from .functions import text as T
from .functions import urls as U
from .functions.episodes import asset_paths
from .functions.text import STOPWORDS, FINGERPRINT_MOD, idiv
from .operators import clustering as CL
from .operators import decontaminate as DC
from .operators import domains as DOM
from .operators import graph as G
from .operators import multimodal as MM
from .operators import packing as PK
from .operators import retry as RT
from .operators import robots as RB
from .operators import tfidf as TI
from .operators import sampling as SAMP
from .operators import similarity as S
from .operators.skew import two_phase_agg
from .plans.ledger import build_download_ledger
from .plans.seed_discovery import run_seed_discovery
from .plans.status import latest_status

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def q(name: str, oracle: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def cents(col) -> F.Column:
    return F.round(col * 100).cast("long")


# ------------------------------------------------------------------ scans

@q("s1_seed_scan", "SELECT DISTINCT source FROM documents")
def s1_seed_scan(spark, sf):
    return _t(spark, sf, "documents").select("source").distinct()


# ------------------------------------- projections / filters / scalar fns

@q(
    "p1_filter_project",
    "SELECT event_id, user_id FROM events WHERE event_type = 'click' AND value > 50",
)
def p1_filter_project(spark, sf):
    e = _t(spark, sf, "events")
    return e.where((F.col("event_type") == "click") & (F.col("value") > 50)).select(
        "event_id", "user_id"
    )


@q(
    "p2_json_extract",
    "SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,"
    " count(*) AS cnt FROM events GROUP BY 1",
)
def p2_json_extract(spark, sf):
    e = _t(spark, sf, "events")
    return e.select(
        F.get_json_object("props", "$.k").cast("long").alias("k_val")
    ).groupBy("k_val").agg(F.count(F.lit(1)).alias("cnt"))


@q(
    "p3_regexp_extract",
    "SELECT CAST(regexp_extract(source, 'src([0-9]+)', 1) AS BIGINT) AS src_id,"
    " count(*) AS n_docs FROM documents GROUP BY 1",
)
def p3_regexp_extract(spark, sf):
    d = _t(spark, sf, "documents")
    return d.select(
        F.regexp_extract("source", r"src([0-9]+)", 1).cast("long").alias("src_id")
    ).groupBy("src_id").agg(F.count(F.lit(1)).alias("n_docs"))


@q(
    "p6_conditional_rewrite",
    "SELECT event_id, CASE WHEN event_type LIKE 'c%' THEN event_type"
    " ELSE concat('x-', event_type) END AS tagged FROM events",
)
def p6_conditional_rewrite(spark, sf):
    e = _t(spark, sf, "events")
    return e.select(
        "event_id",
        F.when(F.col("event_type").startswith("c"), F.col("event_type"))
        .otherwise(F.concat(F.lit("x-"), F.col("event_type")))
        .alias("tagged"),
    )


@q(
    "p4_show_user_id",
    # ParseApplePodcastUserId (reference handler/google_api.py:106-116):
    # digits after a trailing '/id', else ''.
    "WITH u AS (SELECT event_id,"
    " CASE WHEN event_id % 4 = 0 THEN 'https://podcasts.apple.com/us/podcast/x/id' || event_id"
    "      WHEN event_id % 4 = 1 THEN 'https://podcasts.apple.com/us/podcast/x/id' || event_id || '?i=9'"
    "      WHEN event_id % 4 = 2 THEN 'https://podcasts.apple.com/us/podcast/idless'"
    "      ELSE 'https://podcasts.apple.com/us/podcast/x/idABC' END AS url FROM events)"
    " SELECT event_id, regexp_extract(url, '/id([0-9]+)$', 1) AS user_id FROM u",
)
def p4_show_user_id(spark, sf):
    e = _t(spark, sf, "events")
    url = (
        F.when(F.pmod("event_id", F.lit(4)) == 0,
               F.concat(F.lit("https://podcasts.apple.com/us/podcast/x/id"), F.col("event_id").cast("string")))
        .when(F.pmod("event_id", F.lit(4)) == 1,
              F.concat(F.lit("https://podcasts.apple.com/us/podcast/x/id"), F.col("event_id").cast("string"), F.lit("?i=9")))
        .when(F.pmod("event_id", F.lit(4)) == 2, F.lit("https://podcasts.apple.com/us/podcast/idless"))
        .otherwise(F.lit("https://podcasts.apple.com/us/podcast/x/idABC"))
    )
    return e.select("event_id", U.show_user_id(url).alias("user_id"))


@q(
    "p5_cursor_validate",
    # GetNextUrl + absolutize (reference apple_podcast_api.py:56-57,
    # 74-83): missing/invalid next -> '', relative -> API-base prefix.
    "WITH c AS (SELECT event_id,"
    " CASE WHEN event_id % 3 = 0 THEN '/v1/catalog/us/podcasts/' || event_id || '/episodes?offset=10'"
    "      WHEN event_id % 3 = 1 THEN 'https://amp-api.podcasts.apple.com/v1/x/' || event_id"
    "      ELSE '' END AS next_raw FROM events),"
    " v AS (SELECT event_id, CASE WHEN regexp_matches(next_raw, '^(https?://|/)')"
    "   THEN next_raw ELSE '' END AS valid FROM c)"
    " SELECT event_id, valid AS next_url,"
    " CASE WHEN valid LIKE 'http%' THEN valid"
    "      ELSE 'https://amp-api.podcasts.apple.com' || valid END AS absolute_url FROM v",
)
def p5_cursor_validate(spark, sf):
    e = _t(spark, sf, "events")
    raw = (
        F.when(F.pmod("event_id", F.lit(3)) == 0,
               F.concat(F.lit("/v1/catalog/us/podcasts/"), F.col("event_id").cast("string"), F.lit("/episodes?offset=10")))
        .when(F.pmod("event_id", F.lit(3)) == 1,
              F.concat(F.lit("https://amp-api.podcasts.apple.com/v1/x/"), F.col("event_id").cast("string")))
        .otherwise(F.lit(""))
    )
    valid = U.validate_next(raw)
    return e.select(
        "event_id",
        valid.alias("next_url"),
        U.absolutize_next(valid).alias("absolute_url"),
    )


@q(
    "url_canonicalize",
    # canonicalize_url: lowercase scheme+host, strip default port and
    # fragment, sort query params (north_rule seen-key contract).
    "WITH u AS (SELECT event_id,"
    " 'HTTPS://Host' || (user_id % 20) || '.Example:443/p/' || event_id"
    " || '?z=' || (event_id % 7) || '&a=1#frag' AS raw FROM events)"
    " SELECT event_id, 'https://host' || (user_id % 20) || '.example/p/' || event_id"
    " || '?' || array_to_string(list_sort(['z=' || (event_id % 7), 'a=1']), '&') AS canon"
    " FROM u JOIN events USING (event_id)",
)
def url_canonicalize(spark, sf):
    e = _t(spark, sf, "events")
    raw = F.concat(
        F.lit("HTTPS://Host"), F.pmod("user_id", F.lit(20)).cast("string"),
        F.lit(".Example:443/p/"), F.col("event_id").cast("string"),
        F.lit("?z="), F.pmod("event_id", F.lit(7)).cast("string"),
        F.lit("&a=1#frag"),
    )
    return e.select("event_id", U.canonicalize_url(raw).alias("canon"))


# strip_tracking_params (functions/urls.py): referral-alias collapse.
# Four query shapes — all-tracking (loses its '?'), mixed, clean, no
# query — with fragments on every 5th URL.  The oracle replays the
# regex FILTER over the split query, not the expected output.
@q(
    "url_strip_tracking",
    "WITH u AS (SELECT doc_id, 'https://ex.com/p/' || doc_id ||"
    " CASE doc_id % 4"
    "  WHEN 0 THEN '?utm_source=only&fbclid=x' || doc_id"
    "  WHEN 1 THEN '?id=' || doc_id || '&utm_campaign=c&gclid=g' || doc_id"
    "  WHEN 2 THEN '?a=1&b=' || doc_id"
    "  ELSE '' END ||"
    " CASE WHEN doc_id % 5 = 0 THEN '#sec' ELSE '' END AS raw FROM documents),"
    " q AS (SELECT doc_id, raw, regexp_extract(raw, '[?]([^#]*)', 1) AS qs"
    " FROM u),"
    " f AS (SELECT doc_id, raw, qs, array_to_string(list_filter("
    " string_split(qs, '&'), p -> NOT regexp_matches(p,"
    " '^(utm_[a-z0-9_]+|gclid|dclid|fbclid|msclkid|yclid|twclid|igshid"
    "|mc_eid|mc_cid|mkt_tok|oly_enc_id|oly_anon_id|vero_id|_hsenc"
    "|_hsmi|s_cid|spm|ref_src)=')), '&') AS nq FROM q)"
    " SELECT doc_id, CASE WHEN qs = '' THEN raw ELSE"
    " regexp_extract(raw, '^([^?#]*)', 1) ||"
    " CASE WHEN nq <> '' THEN '?' || nq ELSE '' END ||"
    " regexp_extract(raw, '(#.*)$', 1) END AS url FROM f",
)
def url_strip_tracking(spark, sf):
    d = _t(spark, sf, "documents")
    did = F.col("doc_id").cast("string")
    m4 = F.pmod("doc_id", F.lit(4))
    raw = F.concat(
        F.lit("https://ex.com/p/"),
        did,
        F.when(m4 == 0, F.concat(F.lit("?utm_source=only&fbclid=x"), did))
        .when(m4 == 1, F.concat(F.lit("?id="), did, F.lit("&utm_campaign=c&gclid=g"), did))
        .when(m4 == 2, F.concat(F.lit("?a=1&b="), did))
        .otherwise(F.lit("")),
        F.when(F.pmod("doc_id", F.lit(5)) == 0, F.lit("#sec")).otherwise(F.lit("")),
    )
    return d.select("doc_id", U.strip_tracking_params(raw).alias("url"))


@q(
    "p8_explode_tokens",
    "SELECT token, count(*) AS cnt FROM (SELECT unnest(string_split(text, ' ')) AS token"
    " FROM documents) WHERE token <> '' GROUP BY token",
)
def p8_explode_tokens(spark, sf):
    d = _t(spark, sf, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@q(
    "p10_time_bucket",
    "SELECT strftime(ts, '%Y%m%d%H') AS hour_bucket, count(*) AS cnt"
    " FROM events GROUP BY 1",
)
def p10_time_bucket(spark, sf):
    e = _t(spark, sf, "events")
    return e.select(
        F.date_format("ts", "yyyyMMddHH").alias("hour_bucket")
    ).groupBy("hour_bucket").agg(F.count(F.lit(1)).alias("cnt"))


@q(
    "p12_size_bands",
    "SELECT n_chars // 100 AS band, count(*) AS cnt FROM documents GROUP BY 1",
)
def p12_size_bands(spark, sf):
    d = _t(spark, sf, "documents")
    return d.select(
        idiv(F.col("n_chars"), F.lit(100)).alias("band")
    ).groupBy("band").agg(F.count(F.lit(1)).alias("cnt"))


# --------------------------------------------------------- joins / dedupe

@q(
    "d1_two_key_anti_join",
    "SELECT c_custkey FROM customer c WHERE NOT EXISTS"
    " (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey"
    "  AND o.o_totalprice > 400000)"
    " AND NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey"
    "  AND n.n_regionkey = 0)",
)
def d1_two_key_anti_join(spark, sf):
    """The reference's 2-key OR seen-probe (google_api.py:78): skip a
    candidate matching EITHER key -> two chained left_anti joins."""
    c = _t(spark, sf, "customer")
    seen_url = (
        _t(spark, sf, "orders")
        .where(F.col("o_totalprice") > 400000)
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    seen_uid = (
        _t(spark, sf, "nation")
        .where(F.col("n_regionkey") == 0)
        .select(F.col("n_nationkey").alias("c_nationkey"))
        .distinct()
    )
    return (
        c.join(seen_url, "c_custkey", "left_anti")
        .join(F.broadcast(seen_uid), "c_nationkey", "left_anti")
        .select("c_custkey")
    )


@q(
    "d2_semi_join",
    "SELECT c_custkey, c_name FROM customer c WHERE EXISTS"
    " (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)",
)
def d2_semi_join(spark, sf):
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.join(o, "c_custkey", "left_semi").select("c_custkey", "c_name")


@q(
    "d3_drop_duplicates",
    "SELECT DISTINCT user_id, event_type FROM events",
)
def d3_drop_duplicates(spark, sf):
    return _t(spark, sf, "events").select("user_id", "event_type").dropDuplicates()


@q(
    "d4_fetch_join_counters",
    # Outer CAST: DuckDB sum(BIGINT) returns HUGEINT, which surfaces as
    # float64 through Arrow and breaks the driver's value hash.
    "SELECT c_nationkey, count(*) AS n_orders,"
    " CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents"
    " FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY c_nationkey",
)
def d4_fetch_join_counters(spark, sf):
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    # frontier⨝pages shape: broadcast the small dim side
    return (
        o.join(F.broadcast(c.select("c_custkey", "c_nationkey")),
               o["o_custkey"] == c["c_custkey"])
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(cents(F.col("o_totalprice"))).alias("total_cents"),
        )
    )


# --------------------------------------------------------- aggregations

@q(
    "a1_wave_counts",
    "SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS wave,"
    " event_type, count(*) AS cnt FROM events GROUP BY 1, 2",
)
def a1_wave_counts(spark, sf):
    e = _t(spark, sf, "events")
    return e.groupBy(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("wave"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("cnt"))


@q(
    "a2_success_fail_counters",
    "SELECT event_type, count(*) AS total,"
    " CAST(sum(CASE WHEN value < 10 THEN 1 ELSE 0 END) AS BIGINT) AS fail_count,"
    " CAST(sum(CASE WHEN value >= 10 THEN 1 ELSE 0 END) AS BIGINT) AS succ_count,"
    " max(CAST(round(value * 100) AS BIGINT)) AS max_cents"
    " FROM events GROUP BY event_type",
)
def a2_success_fail_counters(spark, sf):
    e = _t(spark, sf, "events")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(F.when(F.col("value") < 10, 1).otherwise(0)).alias("fail_count"),
        F.sum(F.when(F.col("value") >= 10, 1).otherwise(0)).alias("succ_count"),
        F.max(cents(F.col("value"))).alias("max_cents"),
    )


@q(
    "a2_skew_twophase_agg",
    "SELECT event_type, count(*) AS cnt,"
    " CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents"
    " FROM events GROUP BY event_type",
)
def a2_skew_twophase_agg(spark, sf):
    """Hot-key agg via explicit salted two-phase plan; result equals the
    plain groupBy (oracle) exactly."""
    e = _t(spark, sf, "events").withColumn("value_cents_src", cents(F.col("value")))
    out = two_phase_agg(
        e, ["event_type"], sum_cols={"value_cents_src": "value_cents"}, count_alias="cnt",
        salt_expr=F.pmod(F.col("event_id"), F.lit(32)),
    )
    return out.select("event_type", "cnt", "value_cents")


# ------------------------------------------------- ordering / windows

@q(
    "o1_order_parity_key",
    "SELECT user_id, pos, event_id FROM (SELECT user_id, event_id,"
    " row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pos"
    " FROM events) WHERE pos <= 3",
)
def o1_order_parity_key(spark, sf):
    e = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("pos", F.row_number().over(w).cast("long"))
        .where(F.col("pos") <= 3)
        .select("user_id", "pos", "event_id")
    )


@q(
    "o2_result_window_limit",
    "SELECT rnk, o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents"
    " FROM (SELECT o_orderkey, o_totalprice, row_number() OVER"
    " (ORDER BY o_totalprice DESC, o_orderkey) AS rnk FROM orders)"
    " WHERE rnk > 10 AND rnk <= 50",
)
def o2_result_window_limit(spark, sf):
    """Result-window slice [start, stop): distributed top-`stop` first
    (TakeOrderedAndProject — per-partition top-k + merge, never a
    global single-partition window over the full table), then rank the
    tiny `stop`-row result."""
    o = _t(spark, sf, "orders")
    top = o.orderBy(F.col("o_totalprice").desc(), "o_orderkey").limit(50)
    w = Window.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        top.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") > 10)
        .select("rnk", "o_orderkey", cents(F.col("o_totalprice")).alias("price_cents"))
    )


@q(
    "politeness_budget_gate",
    "SELECT event_type, event_id, rn FROM (SELECT event_type, event_id,"
    " row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS rn"
    " FROM events) g WHERE rn <= (ascii(substr(event_type, 1, 1)) % 4) + 1",
)
def politeness_budget_gate(spark, sf):
    """Per-host budget gate shape: rank within host, keep within budget
    (budget derived deterministically per host analog)."""
    e = _t(spark, sf, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    budget = F.pmod(F.ascii(F.substring("event_type", 1, 1)), F.lit(4)) + 1
    return (
        e.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= budget)
        .select("event_type", "event_id", "rn")
    )


@q(
    "u3_bloom_gated_dedupe",
    # The Bloom gate only prunes; output == the exact anti-join, so the
    # oracle is plain NOT EXISTS over the same url formulas.
    "WITH cand AS (SELECT 'https://h' || CAST(user_id % 50 AS VARCHAR) || '.example/p/'"
    " || CAST(event_id AS VARCHAR) AS url FROM events),"
    " seen AS (SELECT 'https://h' || CAST(user_id % 50 AS VARCHAR) || '.example/p/'"
    " || CAST(event_id AS VARCHAR) AS url FROM events WHERE event_id % 3 = 0)"
    " SELECT url FROM cand WHERE NOT EXISTS (SELECT 1 FROM seen WHERE seen.url = cand.url)",
)
def u3_bloom_gated_dedupe(spark, sf):
    from .operators.bloom import bloom_gated_anti_join, build_bloom_shards

    e = _t(spark, sf, "events")
    url = F.concat(
        F.lit("https://h"), F.pmod("user_id", F.lit(50)).cast("string"),
        F.lit(".example/p/"), F.col("event_id").cast("string"),
    )
    cand = e.select(url.alias("url"))
    seen = e.where(F.pmod("event_id", F.lit(3)) == 0).select(url.alias("url"))
    bloom = build_bloom_shards(seen, "url", n_shards=8, m_bits=1 << 15, k=5)
    return bloom_gated_anti_join(cand, seen, bloom, "url")


@q(
    "u3_cuckoo_gated_dedupe",
    # Cuckoo gate with an in-place DELETE between build and probe (the
    # recrawl/expiry flow a Bloom filter cannot serve without a
    # rebuild).  Gate only prunes, exact join confirms: output == the
    # exact anti-join against the UPDATED seen set.
    "WITH cand AS (SELECT 'https://h' || CAST(user_id % 50 AS VARCHAR) || '.example/p/'"
    " || CAST(event_id AS VARCHAR) AS url FROM events),"
    " seen AS (SELECT 'https://h' || CAST(user_id % 50 AS VARCHAR) || '.example/p/'"
    " || CAST(event_id AS VARCHAR) AS url FROM events WHERE event_id % 3 = 0),"
    " expired AS (SELECT url FROM seen WHERE url LIKE '%/p/9%'),"
    " live AS (SELECT url FROM seen WHERE NOT EXISTS"
    "  (SELECT 1 FROM expired e WHERE e.url = seen.url))"
    " SELECT url FROM cand WHERE NOT EXISTS"
    "  (SELECT 1 FROM live WHERE live.url = cand.url)",
)
def u3_cuckoo_gated_dedupe(spark, sf):
    """Deletable URL-seen: cuckoo build on the full seen set, expiry
    batch deleted in place, gated dedupe vs the updated table."""
    from .operators.cuckoo import (
        build_cuckoo_shards,
        cuckoo_gated_anti_join,
        delete_from_cuckoo,
    )

    e = _t(spark, sf, "events")
    url = F.concat(
        F.lit("https://h"), F.pmod("user_id", F.lit(50)).cast("string"),
        F.lit(".example/p/"), F.col("event_id").cast("string"),
    )
    cand = e.select(url.alias("url"))
    seen = e.where(F.pmod("event_id", F.lit(3)) == 0).select(url.alias("url"))
    expired = seen.where(F.col("url").like("%/p/9%"))
    live = seen.join(expired, "url", "left_anti")
    filt = build_cuckoo_shards(seen, "url", n_shards=8, expected_items=4000)
    filt = delete_from_cuckoo(filt, expired, "url")
    return cuckoo_gated_anti_join(cand, live, filt, "url")


@q(
    "u5_parallel_host_rank",
    # The sampling-free per-host rank (order-aligned hash-prefix salt)
    # must equal the naive single-window row_number.  xxhash64 is not
    # SQL-expressible, so the rank is demonstrated on the hash's ORDER
    # via a derived deterministic key both engines share: compare the
    # per-host rank by (priority, event_id).
    "SELECT host, event_id, rn FROM (SELECT"
    " 'h' || CAST(CASE WHEN event_id % 10 < 9 THEN 0 ELSE user_id % 20 END AS VARCHAR)"
    "   AS host,"
    " CAST(event_id % 3 AS INT) AS priority, event_id,"
    " row_number() OVER (PARTITION BY (CASE WHEN event_id % 10 < 9 THEN 0"
    "   ELSE user_id % 20 END) ORDER BY event_id % 3, event_id) AS rn FROM events) t",
)
def u5_parallel_host_rank(spark, sf):
    """90%-skewed host ranked with hash_bucketed_host_rank, proven
    against the naive SQL window.  The production path buckets on
    xxhash64's top bits (not SQL-replayable), so the oracle-checked
    variant uses an order-aligned monotone surrogate (event_id shifted
    into the high bits — any monotone function of the order key keeps
    bucket order aligned; safe to sf1: 500k << 2^19).  Blocking under a
    true uniform hash is pinned by test_hash_bucketed_rank_matches_window."""
    from .operators.politeness import hash_bucketed_host_rank

    e = _t(spark, sf, "events")
    host = F.concat(
        F.lit("h"),
        F.when(F.pmod("event_id", F.lit(10)) < 9, F.lit(0))
        .otherwise(F.pmod("user_id", F.lit(20)))
        .cast("string"),
    )
    f = e.select(
        host.alias("host"),
        F.pmod("event_id", F.lit(3)).cast("int").alias("priority"),
        F.col("event_id"),
        F.shiftleft(F.col("event_id"), 44).alias("_uh"),
    )
    ranked = hash_bucketed_host_rank(f, "host", "priority", "_uh", "event_id", out_col="rn")
    return ranked.select("host", "event_id", F.col("rn").cast("long").alias("rn"))


# ------------------------------------------- K3 / E2 / P9 / P11 / ledger

@q(
    "k3_status_transitions",
    # K3 MERGE/latest-wins: the crawl_status state machine's "current
    # status" view (reference db/search_info.py:56-66 UPDATE semantics).
    "SELECT user_id, status, last_event FROM ("
    " SELECT user_id, CAST(event_id % 5 AS INT) AS status, event_id AS last_event,"
    " row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn"
    " FROM events) t WHERE rn = 1",
)
def k3_status_transitions(spark, sf):
    e = _t(spark, sf, "events")
    updates = e.select(
        "user_id",
        F.pmod("event_id", F.lit(5)).cast("int").alias("status"),
        F.col("event_id"),
    )
    out = latest_status(updates, ["user_id"], "event_id")
    return out.select("user_id", "status", F.col("event_id").alias("last_event"))


_SHOW_BASE = "https://podcasts.apple.com/us/podcast/"

_E2_URL_SQL = (
    "CASE"
    f" WHEN event_id % 10 <= 3 THEN '{_SHOW_BASE}s' || CAST(event_id AS VARCHAR)"
    " || '/id' || CAST(1000 + event_id % 50 AS VARCHAR)"
    f" WHEN event_id % 10 = 4 THEN '{_SHOW_BASE}s' || CAST(event_id - 4 AS VARCHAR)"
    " || '/id' || CAST(1000 + (event_id - 4) % 50 AS VARCHAR)"
    f" WHEN event_id % 10 = 5 THEN '{_SHOW_BASE}s' || CAST(event_id AS VARCHAR) || '/idless'"
    " WHEN event_id % 10 = 6 THEN ''"
    " WHEN event_id % 10 = 7 THEN 'ftp://x.example/y'"
    f" WHEN event_id % 10 = 8 THEN '{_SHOW_BASE}s' || CAST(event_id AS VARCHAR)"
    " || '/id' || CAST(1000 + event_id % 50 AS VARCHAR) || '?x=1'"
    f" ELSE '{_SHOW_BASE}s' || CAST(event_id AS VARCHAR)"
    " || '/id' || CAST(700000 + event_id AS VARCHAR) END"
)


def _e2_candidates(e):
    m = F.pmod("event_id", F.lit(10))
    eid = F.col("event_id").cast("string")
    uid_small = (F.lit(1000) + F.pmod("event_id", F.lit(50))).cast("string")
    dup_eid = (F.col("event_id") - 4).cast("string")
    dup_uid = (F.lit(1000) + F.pmod(F.col("event_id") - 4, F.lit(50))).cast("string")
    url = (
        F.when(m <= 3, F.concat(F.lit(f"{_SHOW_BASE}s"), eid, F.lit("/id"), uid_small))
        .when(m == 4, F.concat(F.lit(f"{_SHOW_BASE}s"), dup_eid, F.lit("/id"), dup_uid))
        .when(m == 5, F.concat(F.lit(f"{_SHOW_BASE}s"), eid, F.lit("/idless")))
        .when(m == 6, F.lit(""))
        .when(m == 7, F.lit("ftp://x.example/y"))
        .when(m == 8, F.concat(F.lit(f"{_SHOW_BASE}s"), eid, F.lit("/id"), uid_small, F.lit("?x=1")))
        .otherwise(
            F.concat(F.lit(f"{_SHOW_BASE}s"), eid, F.lit("/id"),
                     (F.lit(700000) + F.col("event_id")).cast("string"))
        )
    )
    return e.select(F.col("event_id").cast("long").alias("ord"), url.alias("url"))


@q(
    "e2_seed_discovery",
    # E2 end-to-end: P1 filter -> P4 extract -> sequential OR dedupe ->
    # status-1 insert.  Because uid is a FUNCTION of url here (as in the
    # reference), the sequential batch scan reduces exactly to
    # first-per-url then first-per-uid — replayed below with windows.
    "WITH c AS (SELECT event_id AS ord, " + _E2_URL_SQL + " AS url FROM events),"
    " f AS (SELECT ord, url, regexp_extract(url, '/id([0-9]+)$', 1) AS uid FROM c"
    "  WHERE url <> '' AND url LIKE 'http%'),"
    " sn AS (SELECT " + _E2_URL_SQL + " AS url,"
    "  CAST(1000 + event_id % 50 AS VARCHAR) AS uid FROM events WHERE event_id % 50 = 0),"
    " g AS (SELECT * FROM f WHERE url NOT IN (SELECT url FROM sn)"
    "  AND uid NOT IN (SELECT uid FROM sn)),"
    " h AS (SELECT *, row_number() OVER (PARTITION BY url ORDER BY ord) AS r1 FROM g),"
    " i AS (SELECT ord, url, uid, row_number() OVER (PARTITION BY uid ORDER BY ord) AS r2"
    "  FROM h WHERE r1 = 1)"
    " SELECT ord, url, uid, 1 AS status FROM i WHERE r2 = 1",
)
def e2_seed_discovery(spark, sf):
    e = _t(spark, sf, "events")
    cand = _e2_candidates(e)
    seen = _e2_candidates(e.where(F.pmod("event_id", F.lit(50)) == 0)).select(
        "url",
        (F.lit(1000) + F.pmod(F.col("ord"), F.lit(50))).cast("string").alias("uid"),
    )
    return run_seed_discovery(cand, seen)


# --------------------------------------------------------- E1 wave loop
# Flagship crawl pipeline as a driver-contract entry: a deterministic
# pages corpus is synthesized from `events` (40 seeds, pagination depth
# uid % 4), run through the REAL wave loop (plans/wave_loop.py:98), and
# oracled in closed form — with bounded depth, wave k is exactly the
# pages at offset 10*k, so no recursive SQL is needed.

_E1_API = U.API_BASE + "/v1/catalog/us/podcasts/"


def _e1_corpus(spark, sf):
    """(pages, seeds) for the E1 driver entry — pure Column exprs over
    `events`, byte-deterministic, so the DuckDB oracle can enumerate
    the same crawl in closed form."""
    e = _t(spark, sf, "events")
    u = e.select(F.pmod("user_id", F.lit(40)).cast("long").alias("uid")).distinct()
    uid_s = F.col("uid").cast("string")
    depth = F.pmod("uid", F.lit(4))
    p = u.select("uid", F.explode(F.sequence(F.lit(0), depth)).alias("step"))
    off = (F.col("step") * 10).cast("long")

    def item(j: int):
        eid = (F.col("uid") * 1000 + off + j).cast("string")
        return F.concat(
            F.lit('{"id": "'), eid,
            F.lit('", "attributes": {"itunesTitle": "t'), uid_s,
            F.lit("-"), off.cast("string"), F.lit(f"-{j}"),
            F.lit('", "url": "https://podcasts.apple.com/us/podcast/e'), eid,
            F.lit('", "artistName": "a'), uid_s,
            F.lit('", "durationInMilliseconds": '), ((off + j) * 1000).cast("string"),
            F.lit(', "genreNames": ["g'), F.pmod("uid", F.lit(5)).cast("string"),
            F.lit('"], "assetUrl": "https://assets.example/'), uid_s,
            F.lit("/"), (off + j).cast("string"), F.lit('.mp3"}}'),
        )

    nxt = F.when(
        F.col("step") < F.pmod("uid", F.lit(4)),
        F.concat(
            F.lit('"next": "/v1/catalog/us/podcasts/'), uid_s,
            F.lit("/episodes?offset="), (off + 10).cast("string"), F.lit('", '),
        ),
    ).otherwise(F.lit(""))
    body = F.concat(
        F.lit("{"), nxt, F.lit('"data": ['), item(0), F.lit(", "), item(1), F.lit("]}")
    )
    url = F.concat(
        F.lit(_E1_API), uid_s, F.lit("/episodes?l=en-US&offset="), off.cast("string")
    )
    pages = p.select(url.alias("url"), F.encode(body, "UTF-8").alias("html"))
    seeds = u.select(
        F.col("uid").cast("int").alias("seed_index"),
        F.concat(F.lit(_E1_API), uid_s, F.lit("/episodes?offset=0")).alias("url"),
    )
    return pages, seeds


_E1_CTE = (
    "WITH u AS (SELECT DISTINCT user_id % 40 AS uid FROM events),"
    " p AS (SELECT uid, unnest(range(0, uid % 4 + 1)) AS step FROM u),"
    " src AS (SELECT uid, step,"
    f"  '{_E1_API}' || uid || '/episodes?l=en-US&offset=' || (step * 10) AS source_url"
    " FROM p)"
)


@q(
    "e1_crawl_wave",
    # Episodes emitted by the full wave loop: 2 per page, wave = step.
    _E1_CTE
    + " SELECT CAST(uid AS INT) AS seed_index, CAST(step * 10 AS INT) AS offset,"
    " CAST(j.pos AS INT) AS pos, CAST(step AS INT) AS wave, source_url,"
    " 'Podcast_' || uid || '_' || (uid * 1000 + step * 10 + j.pos) AS id,"
    " 't' || uid || '-' || (step * 10) || '-' || j.pos AS title,"
    " 'https://podcasts.apple.com/us/podcast/e' || (uid * 1000 + step * 10 + j.pos) AS full_url,"
    " 'a' || uid AS author,"
    " CAST((step * 10 + j.pos) * 1000 AS BIGINT) AS duration,"
    " 'g' || (uid % 5) AS categories,"
    " 'https://assets.example/' || uid || '/' || (step * 10 + j.pos) || '.mp3' AS asset_url"
    " FROM src, (SELECT unnest([0, 1]) AS pos) j",
)
def e1_crawl_wave(spark, sf):
    from .plans.wave_loop import WaveConfig, run_crawl

    pages, seeds = _e1_corpus(spark, sf)
    out = run_crawl(spark, pages, seeds, WaveConfig())
    return out.episodes.withColumn("categories", F.array_join("categories", ","))


@q(
    "e1_crawl_fetch_log",
    # Fetch log incl. the reference's terminal quirk: a dead cursor
    # (missing `next`) absolutizes to the bare API base, which is
    # fetched ONCE per seed (a miss) at wave depth+1 before the chain
    # dies (functions/urls.py:58-78).
    _E1_CTE
    + " SELECT CAST(uid AS INT) AS seed_index, source_url AS fetch_url,"
    " CAST(step AS INT) AS wave, TRUE AS fetch_ok, CAST(step * 10 AS INT) AS offset"
    " FROM src UNION ALL"
    f" SELECT CAST(uid AS INT), '{U.API_BASE}?l=en-US&offset=10',"
    " CAST(uid % 4 + 1 AS INT), FALSE, 10 FROM u",
)
def e1_crawl_fetch_log(spark, sf):
    from .plans.wave_loop import WaveConfig, run_crawl

    pages, seeds = _e1_corpus(spark, sf)
    out = run_crawl(spark, pages, seeds, WaveConfig())
    return out.fetch_log


@q(
    "p9_asset_paths",
    "SELECT id, local_path, cos_key FROM (SELECT"
    " 'Podcast_' || CAST(user_id AS VARCHAR) || '_' || CAST(event_id AS VARCHAR) AS id,"
    " 'downloads/Podcast_' || CAST(user_id AS VARCHAR) || '/Podcast_'"
    "  || CAST(user_id AS VARCHAR) || '_' || CAST(event_id AS VARCHAR) || '.mp3' AS local_path,"
    " 'cos/Podcast_' || CAST(user_id AS VARCHAR) || '/Podcast_'"
    "  || CAST(user_id AS VARCHAR) || '_' || CAST(event_id AS VARCHAR) || '.mp3' AS cos_key"
    " FROM events) t",
)
def p9_asset_paths(spark, sf):
    e = _t(spark, sf, "events")
    eps = e.select(
        F.concat(
            F.lit("Podcast_"), F.col("user_id").cast("string"),
            F.lit("_"), F.col("event_id").cast("string"),
        ).alias("id")
    )
    return asset_paths(eps).select("id", "local_path", "cos_key")


_UA_LIST = [f"Mozilla/5.0 (Engine; rv:{i}.0) Crawler/{i}.0" for i in range(8)]


@q(
    "p11_ua_rotation",
    "SELECT event_id, (["
    + ", ".join(f"'{a}'" for a in _UA_LIST)
    + "])[CAST(event_id % 8 AS INT) + 1] AS ua FROM events",
)
def p11_ua_rotation(spark, sf):
    e = _t(spark, sf, "events")
    url = F.concat(F.lit("https://h.example/p/"), F.col("event_id").cast("string"))
    return e.select(
        "event_id",
        U.user_agent_for(url, _UA_LIST, index_expr=F.pmod("event_id", F.lit(8))).alias("ua"),
    )


@q(
    "k4_download_ledger",
    # crawler_download_info shape: P9 paths + info JSON + lifecycle,
    # skip-if-exists against the current ledger (D2).
    "WITH eps AS (SELECT 'Podcast_' || CAST(doc_id % 100 AS VARCHAR) || '_'"
    "  || CAST(doc_id AS VARCHAR) AS id,"
    " 'https://assets.example/a/' || CAST(doc_id AS VARCHAR) || '.mp3' AS asset_url,"
    " 't' || CAST(doc_id AS VARCHAR) AS title,"
    " 'a' || CAST(doc_id % 10 AS VARCHAR) AS author,"
    " doc_id * 1000 AS duration, doc_id FROM documents)"
    " SELECT id, asset_url,"
    " 'downloads/Podcast_' || CAST(doc_id % 100 AS VARCHAR) || '/' || id || '.mp3' AS local_path,"
    " 'cos/Podcast_' || CAST(doc_id % 100 AS VARCHAR) || '/' || id || '.mp3' AS cos_key,"
    " to_json(struct_pack(title := title, author := author,"
    "   duration := CAST(duration AS BIGINT))) AS info,"
    " 0 AS status, 0 AS lock FROM eps WHERE doc_id % 7 <> 0",
)
def k4_download_ledger(spark, sf):
    d = _t(spark, sf, "documents")
    eps = d.select(
        F.concat(
            F.lit("Podcast_"), F.pmod("doc_id", F.lit(100)).cast("string"),
            F.lit("_"), F.col("doc_id").cast("string"),
        ).alias("id"),
        F.concat(F.lit("https://assets.example/a/"), F.col("doc_id").cast("string"),
                 F.lit(".mp3")).alias("asset_url"),
        F.concat(F.lit("t"), F.col("doc_id").cast("string")).alias("title"),
        F.concat(F.lit("a"), F.pmod("doc_id", F.lit(10)).cast("string")).alias("author"),
        (F.col("doc_id") * 1000).alias("duration"),
        "doc_id",
    )
    existing = eps.where(F.pmod("doc_id", F.lit(7)) == 0).select("id")
    return build_download_ledger(eps.drop("doc_id"), existing)


# ----------------------------------------------------- TPC-H style joins

@q(
    "tpch_q1_pricing_summary",
    "SELECT l_returnflag, l_linestatus,"
    " CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,"
    " CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,"
    " CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,"
    " count(*) AS count_order FROM lineitem"
    " WHERE l_shipdate <= TIMESTAMP '2001-09-02'"
    " GROUP BY l_returnflag, l_linestatus",
)
def tpch_q1_pricing_summary(spark, sf):
    li = _t(spark, sf, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.sum(cents(F.col("l_extendedprice"))).alias("sum_base_cents"),
            F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "sum_disc_cents"
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@q(
    "tpch_q3_top_orders",
    "SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,"
    " CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents"
    " FROM customer JOIN orders ON c_custkey = o_custkey"
    " JOIN lineitem ON l_orderkey = o_orderkey"
    " WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-03-15'"
    " GROUP BY o_orderkey, orderdate ORDER BY revenue_cents DESC, o_orderkey LIMIT 10",
)
def tpch_q3_top_orders(spark, sf):
    c = _t(spark, sf, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp_ntz")
    )
    li = _t(spark, sf, "lineitem")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c.select("c_custkey")), o["o_custkey"] == c["c_custkey"])
        .groupBy(
            "o_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate")
        )
        .agg(
            F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue_cents"
            )
        )
        .orderBy(F.col("revenue_cents").desc(), "o_orderkey")
        .limit(10)
    )


# --------------------------------------------- dedup / similarity / text

@q(
    "dedup_exact_hash",
    "SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS n_dups"
    " FROM documents GROUP BY md5(text)",
)
def dedup_exact_hash(spark, sf):
    return S.exact_dedup(_t(spark, sf, "documents"), "doc_id", "text")


# Mirror-host detection (operators/mirrors.py): base hosts h0-h4 get
# the corpus by doc_id%5; h5-h9 mirror the even half of their base
# host; one boilerplate page sits on all 10 hosts and must be killed
# by the ubiquity cap (4), not counted as mirror evidence.  md5
# fingerprints on both engines -> full value oracle.
@q(
    "crawl_mirror_hosts",
    "WITH pages AS ("
    " SELECT 'h' || CAST(doc_id % 5 AS VARCHAR) AS host, text FROM documents"
    " UNION ALL"
    " SELECT 'h' || CAST(doc_id % 5 + 5 AS VARCHAR) AS host, text FROM documents"
    " WHERE doc_id % 2 = 0"
    " UNION ALL"
    " SELECT 'h' || CAST(i AS VARCHAR) AS host, 'shared boilerplate template page' AS text"
    " FROM range(10) t(i)),"
    " hf AS (SELECT DISTINCT host, md5(text) AS fp FROM pages),"
    " rare AS (SELECT fp FROM hf GROUP BY fp HAVING count(*) <= 4),"
    " hf2 AS (SELECT hf.host, hf.fp FROM hf JOIN rare USING (fp)),"
    " sizes AS (SELECT host, count(*) AS n_fp FROM hf2 GROUP BY host),"
    " sh AS (SELECT a.host AS host_a, b.host AS host_b, count(*) AS shared"
    " FROM hf2 a JOIN hf2 b ON a.fp = b.fp AND a.host < b.host GROUP BY 1, 2)"
    " SELECT host_a, host_b, shared,"
    " (shared * 1000) // least(sa.n_fp, sb.n_fp) AS containment_milli"
    " FROM sh JOIN sizes sa ON sh.host_a = sa.host"
    " JOIN sizes sb ON sh.host_b = sb.host"
    " WHERE least(sa.n_fp, sb.n_fp) >= 5"
    " AND (shared * 1000) // least(sa.n_fp, sb.n_fp) >= 500",
)
def crawl_mirror_hosts(spark, sf):
    from .operators import mirrors as MIR

    d = _t(spark, sf, "documents")
    base = d.select(
        F.concat(F.lit("h"), F.pmod("doc_id", F.lit(5)).cast("string")).alias("host"),
        "text",
    )
    mirror = d.where(F.pmod("doc_id", F.lit(2)) == 0).select(
        F.concat(F.lit("h"), (F.pmod("doc_id", F.lit(5)) + 5).cast("string")).alias(
            "host"
        ),
        "text",
    )
    boiler = spark.range(10).select(
        F.concat(F.lit("h"), F.col("id").cast("string")).alias("host"),
        F.lit("shared boilerplate template page").alias("text"),
    )
    pages = base.unionByName(mirror).unionByName(boiler)
    return MIR.mirror_host_pairs(
        pages, threshold_milli=500, min_docs=5, max_hosts_per_fp=4
    )


# Cross-document exact-substring span dedup (operators/spans.py — the
# ExactSubstr pass of Lee et al. 2022): every repeated 8-token window
# loses its non-first occurrences, stride-1 marks merged to spans.
# The hash stage is prune-only (string-confirmed), so the oracle can
# replay the whole thing on window STRINGS directly.
@q(
    "dedup_exact_substring",
    "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),"
    " w AS (SELECT doc_id,"
    " CAST(unnest(generate_series(1, len(tk) - 7)) AS INT) AS pos,"
    " unnest(list_transform(generate_series(1, len(tk) - 7),"
    " i -> array_to_string(tk[i:i+7], ' '))) AS win"
    " FROM toks WHERE len(tk) >= 8),"
    " d AS (SELECT doc_id, pos,"
    " row_number() OVER (PARTITION BY win ORDER BY doc_id, pos) AS rn,"
    " count(*) OVER (PARTITION BY win) AS c FROM w),"
    " rem AS (SELECT doc_id, pos FROM d WHERE c > 1 AND rn > 1),"
    " isl AS (SELECT doc_id, pos,"
    " CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL"
    " OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 8"
    " THEN 1 ELSE 0 END AS brk FROM rem),"
    " g AS (SELECT doc_id, pos,"
    " sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM isl)"
    " SELECT doc_id, min(pos) AS span_start,"
    " CAST(max(pos) + 7 AS INT) AS span_end,"
    " CAST(max(pos) - min(pos) + 8 AS INT) AS span_tokens"
    " FROM g GROUP BY doc_id, grp",
)
def dedup_exact_substring(spark, sf):
    from .operators import spans as SP

    return SP.exact_substring_spans(_t(spark, sf, "documents"), "doc_id", "text", w=8)


# Incremental ExactSubstr (steady-state crawl shape): docs < 250 are
# the already-indexed corpus (window_hash_index: distinct whash only),
# docs >= 250 are the new batch.  A new window present in the index is
# marked at EVERY new occurrence (the indexed corpus holds keep-first);
# index-novel windows keep-first within the batch.  The oracle replays
# both legs on window STRINGS — the hash probe is semantically
# transparent (collision P ~ n^2/2^64, the accepted bloom-confirm
# bound).
@q(
    "dedup_exact_substring_incr",
    "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),"
    " w AS (SELECT doc_id,"
    " CAST(unnest(generate_series(1, len(tk) - 7)) AS INT) AS pos,"
    " unnest(list_transform(generate_series(1, len(tk) - 7),"
    " i -> array_to_string(tk[i:i+7], ' '))) AS win"
    " FROM toks WHERE len(tk) >= 8),"
    " vs AS (SELECT doc_id, pos FROM w WHERE doc_id >= 250"
    " AND win IN (SELECT win FROM w WHERE doc_id < 250)),"
    " nw AS (SELECT doc_id, pos,"
    " row_number() OVER (PARTITION BY win ORDER BY doc_id, pos) AS rn,"
    " count(*) OVER (PARTITION BY win) AS c FROM w WHERE doc_id >= 250),"
    " rem AS (SELECT DISTINCT doc_id, pos FROM"
    " (SELECT doc_id, pos FROM vs UNION ALL"
    " SELECT doc_id, pos FROM nw WHERE c > 1 AND rn > 1)),"
    " isl AS (SELECT doc_id, pos,"
    " CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL"
    " OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 8"
    " THEN 1 ELSE 0 END AS brk FROM rem),"
    " g AS (SELECT doc_id, pos,"
    " sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM isl)"
    " SELECT doc_id, min(pos) AS span_start,"
    " CAST(max(pos) + 7 AS INT) AS span_end,"
    " CAST(max(pos) - min(pos) + 8 AS INT) AS span_tokens"
    " FROM g GROUP BY doc_id, grp",
)
def dedup_exact_substring_incr(spark, sf):
    from .operators import spans as SP

    docs = _t(spark, sf, "documents")
    idx = SP.window_hash_index(
        docs.where(F.col("doc_id") < 250), "doc_id", "text", w=8
    )
    return SP.exact_substring_spans_incremental(
        docs.where(F.col("doc_id") >= 250), idx, "doc_id", "text", w=8
    )


# Shared shingle CTE chain (toks -> distinct shingles -> per-doc counts
# -> pair intersections) feeding the Jaccard AND containment oracles.
_SHINGLE_BASE = (
    "WITH toks AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk"
    " FROM documents),"
    " sh AS (SELECT DISTINCT doc_id, unnest(list_transform(generate_series(1, len(tk) - 2),"
    " i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS shingle FROM toks WHERE len(tk) >= 3),"
    " cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),"
    " inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i_cnt"
    " FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id"
    " GROUP BY 1, 2)"
)

_SHINGLE_CTE = (
    _SHINGLE_BASE
    + " SELECT doc_a, doc_b, (i_cnt * 1000) // (ca.n_sh + cb.n_sh - i_cnt) AS jaccard_milli"
    " FROM inter JOIN cnt ca ON ca.doc_id = doc_a JOIN cnt cb ON cb.doc_id = doc_b"
    " WHERE (i_cnt * 1000) // (ca.n_sh + cb.n_sh - i_cnt) >= {thr}"
)


@q("dedup_ngram_jaccard", _SHINGLE_CTE.format(thr=500))
def dedup_ngram_jaccard(spark, sf):
    sh = S.shingle_rows(_t(spark, sf, "documents"), "doc_id", "text", 3)
    return S.jaccard_pairs(sh, 500)


# Leakage-safe train/holdout split (operators/splits.py): near-dup
# components (exact Jaccard >= 500 pairs -> min-label CC) choose a
# side TOGETHER via the md5 bucket of the component representative —
# a dup cluster can never straddle the cut.  Oracle: the shared
# shingle CTE + recursive reachability + the same md5-hex bucket.
@q(
    "corpus_split_leakage_safe",
    "WITH RECURSIVE "
    + _SHINGLE_BASE.removeprefix("WITH ")
    + ", pairs AS (SELECT doc_a, doc_b FROM inter"
    " JOIN cnt ca ON ca.doc_id = doc_a JOIN cnt cb ON cb.doc_id = doc_b"
    " WHERE (i_cnt * 1000) // (ca.n_sh + cb.n_sh - i_cnt) >= 500),"
    " edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs"
    " UNION ALL SELECT doc_b AS src, doc_a AS dst FROM pairs),"
    " reach AS (SELECT src AS doc, src AS root FROM edges"
    " UNION SELECT e.dst AS doc, r.root FROM reach r JOIN edges e ON e.src = r.doc),"
    " comp AS (SELECT doc, min(root) AS component FROM reach GROUP BY doc),"
    " lab AS (SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component"
    " FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc)"
    " SELECT doc_id, component,"
    " CASE WHEN CAST('0x' || substr(md5(CAST(component AS VARCHAR)), 1, 6) AS BIGINT)"
    " % 1000 < 100 THEN 'holdout' ELSE 'train' END AS split"
    " FROM lab",
)
def corpus_split_leakage_safe(spark, sf):
    from .operators import splits as SPL

    d = _t(spark, sf, "documents")
    pairs = S.jaccard_pairs(S.shingle_rows(d, "doc_id", "text", 3), 500)
    return SPL.leakage_safe_split(d, pairs, "doc_id", holdout_milli=100).select(
        "doc_id", "component", "split"
    )


@q("dedup_minhash_lsh", _SHINGLE_CTE.format(thr=500))
def dedup_minhash_lsh(spark, sf):
    """MinHash+LSH prune, exact confirm — oracle is the exact all-pairs
    computation (LSH recall at these parameters is total on this data).

    Oracle-equivalence domain: exact while every (band, key) bucket
    holds <= ``max_bucket`` (default 256) members — above that the
    star cap makes candidate enumeration deliberately approximate
    (see ``lsh_candidate_pairs``).  The documents table's buckets are
    far below the cap at every tested sf; a corpus with genuine
    256+-member mega-buckets is exactly the regime where the exact
    all-pairs oracle itself is uncomputable."""
    return S.minhash_dedup_pairs(_t(spark, sf, "documents"), "doc_id", "text", 3, 500)


# Canonical-representative dedup needs graph connectivity over the
# near-dup pairs (chains a~b~c collapse to one component).  Spark side
# is iterative min-label propagation (operators/graph.py); the oracle
# replays reachability with a recursive CTE over the exact pair graph.
_CC_ORACLE = (
    "WITH RECURSIVE pairs AS (" + _SHINGLE_CTE.format(thr=500) + "),"
    " edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs"
    " UNION ALL SELECT doc_b AS src, doc_a AS dst FROM pairs),"
    " reach AS (SELECT src AS doc, src AS root FROM edges"
    " UNION SELECT e.dst AS doc, r.root FROM reach r JOIN edges e ON e.src = r.doc)"
    " SELECT doc AS doc_id, min(root) AS component FROM reach GROUP BY doc"
)


@q("dedup_connected_components", _CC_ORACLE)
def dedup_connected_components(spark, sf):
    """Near-dup pairs (MinHash prune + exact confirm) -> connected
    components -> (doc_id, component = min reachable doc_id).  The
    canonical-representative grouping a corpus-level dedup actually
    keys its keep/drop decision on."""
    pairs = S.minhash_dedup_pairs(_t(spark, sf, "documents"), "doc_id", "text", 3, 500)
    return G.dedup_components(pairs)


# Incremental CC twin (graph.py connected_components_incremental,
# VERDICT r4 #5): the corpus is split at doc_id 250 into a committed
# wave (batch CC over old-only pairs) and a new wave (every pair
# touching a doc >= 250); the incremental fold of the new edges into
# the committed labels must equal batch CC over the full pair graph —
# so the oracle IS the batch recursive-CTE oracle.
@q("dedup_cc_incremental", _CC_ORACLE)
def dedup_cc_incremental(spark, sf):
    """Steady-state component maintenance: new near-dup edges merged
    into committed labels without rescanning old pairs."""
    pairs = S.minhash_dedup_pairs(
        _t(spark, sf, "documents"), "doc_id", "text", 3, 500
    ).localCheckpoint()
    old = pairs.where((F.col("doc_a") < 250) & (F.col("doc_b") < 250))
    new = pairs.where((F.col("doc_a") >= 250) | (F.col("doc_b") >= 250))
    committed = G.connected_components(old).localCheckpoint()
    return G.connected_components_incremental(committed, new).select(
        F.col("id").alias("doc_id"), "component"
    )


def _simhash_oracle(bits: int = 64, chunks: int = 4, max_hamming: int = 3) -> str:
    """Full SQL replay of simhash_arith + chunked near-pair search: the
    per-bit (P, Q) constants are embedded as literals, chunk values are
    compared with xor/bit_count (never assembling bit 63 into a BIGINT)."""
    P, Q = S.simhash_bit_params(bits)
    width = bits // chunks
    s_cols = ", ".join(
        f"sum(CASE WHEN ((cs * {P[i]} + {Q[i]}) % {S.SIMHASH_M}) % 2 = 1"
        f" THEN 1 ELSE -1 END) AS s{i}"
        for i in range(bits)
    )
    c_cols = ", ".join(
        "CAST("
        + " + ".join(
            f"(CASE WHEN s{c * width + r} > 0 THEN {1 << r} ELSE 0 END)"
            for r in range(width)
        )
        + f" AS BIGINT) AS c{c}"
        for c in range(chunks)
    )
    ham = " + ".join(f"bit_count(xor(x.c{c}, y.c{c}))" for c in range(chunks))
    return (
        "WITH tk AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '),"
        " t -> t <> '')) AS tok FROM documents),"
        " s AS (SELECT doc_id, CAST(list_sum(list_transform(string_split(tok, ''),"
        " ch -> ascii(ch))) AS BIGINT) AS cs FROM tk),"
        f" b AS (SELECT doc_id, {s_cols} FROM s GROUP BY doc_id),"
        f" f AS (SELECT doc_id, {c_cols} FROM b),"
        f" p AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,"
        f" CAST({ham} AS BIGINT) AS hamming FROM f x JOIN f y ON x.doc_id < y.doc_id)"
        f" SELECT doc_a, doc_b, hamming FROM p WHERE hamming <= {max_hamming}"
    )


@q("dedup_simhash", _simhash_oracle())
def dedup_simhash(spark, sf):
    """Arithmetic-hash SimHash (oracle-reproducible bit family) with
    16-bit pigeonhole blocking; the xxhash64 variant (S.simhash) is the
    production hash with the same plan shape."""
    sims = S.simhash_arith(_t(spark, sf, "documents"), "doc_id", "text")
    return S.simhash_near_pairs(sims, max_hamming=3, chunks=4)


@q("dedup_simhash_prod", None)
def dedup_simhash_prod(spark, sf):
    """Production SimHash: xxhash64 token hashing (the hash a real
    deployment runs — JVM-native, no per-token char-sum arithmetic),
    identical plan shape to ``dedup_simhash`` (explode -> map-side
    partial per-bit sums -> pigeonhole blocking).  xxhash64 is not
    SQL-replayable in DuckDB, so this entry carries no value oracle;
    the bit-family arithmetic twin ``dedup_simhash`` IS the full value
    oracle for the shared plan, and pytest asserts this variant finds
    the planted near-dup pairs (tests/test_similarity.py)."""
    sims = S.simhash(_t(spark, sf, "documents"), "doc_id", "text")
    return S.simhash_near_pairs(sims, max_hamming=3, chunks=4)


@q(
    "dedup_embedding_cosine",
    # Exact integer-quantized cosine (floor(x*1000+0.5) per element):
    # products and 64-element sums stay exact in double, so every IEEE
    # op below is correctly rounded from identical inputs and Spark ==
    # DuckDB bit-for-bit — no float-threshold flakiness at the cut.
    "WITH q AS (SELECT vec_id,"
    " list_transform(embedding::DOUBLE[], x -> floor(x * 1000 + 0.5)) AS qe"
    " FROM embeddings),"
    " n AS (SELECT vec_id, qe, list_dot_product(qe, qe) AS nq FROM q WHERE"
    " list_dot_product(qe, qe) > 0)"
    " SELECT vec_a, vec_b, cosine_milli FROM (SELECT a.vec_id AS vec_a,"
    " b.vec_id AS vec_b,"
    " CAST(floor(1000.0 * list_dot_product(a.qe, b.qe)"
    " / (sqrt(a.nq) * sqrt(b.nq))) AS BIGINT) AS cosine_milli"
    " FROM n a JOIN n b ON a.vec_id < b.vec_id) t WHERE cosine_milli >= 450",
)
def dedup_embedding_cosine(spark, sf):
    """Embedding-cosine near-dup pairs, exact path (the oracle); the
    banded-hyperplane blocked scale path
    (S.embedding_cosine_pairs_blocked) is recall-tested in pytest on
    planted near-dups."""
    return S.embedding_cosine_pairs_exact(_t(spark, sf, "embeddings"), 450)


@q(
    "ann_cosine_topk",
    "SELECT e.vec_id, round(list_dot_product(e.embedding::DOUBLE[], q.qe::DOUBLE[])"
    " / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))"
    " * sqrt(list_dot_product(q.qe::DOUBLE[], q.qe::DOUBLE[]))), 4) AS cosine"
    " FROM embeddings e CROSS JOIN (SELECT embedding AS qe FROM embeddings"
    " WHERE vec_id = 0) q ORDER BY cosine DESC, e.vec_id LIMIT 10",
)
def ann_cosine_topk(spark, sf):
    emb = _t(spark, sf, "embeddings")
    query = list(emb.where(F.col("vec_id") == 0).first()["embedding"])
    return S.cosine_topk_bruteforce(emb, query, k=10)


def _ann_lsh_oracle(n_planes: int = 6, dim: int = 64, seed: int = 42, k: int = 10) -> str:
    """SQL replay of the hyperplane LSH: integer plane literals, exact
    integer-quantized dot-product signs, ±1-bit multiprobe, cosine
    top-k within the candidate set."""
    planes = S.plane_matrix(n_planes, dim, seed)
    terms = " + ".join(
        f"(CASE WHEN list_dot_product(qv, {[int(v) for v in planes[i]]}::DOUBLE[]) > 0"
        f" THEN {1 << i} ELSE 0 END)"
        for i in range(n_planes)
    )
    return (
        "WITH e AS (SELECT vec_id, embedding,"
        " list_transform(embedding::DOUBLE[], x -> floor(x * 1000 + 0.5)) AS qv FROM embeddings),"
        f" sig AS (SELECT vec_id, embedding, CAST({terms} AS BIGINT) AS bucket FROM e),"
        " qb AS (SELECT bucket AS qbucket FROM sig WHERE vec_id = 0),"
        " q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),"
        " cand AS (SELECT s.vec_id, s.embedding FROM sig s, qb"
        " WHERE bit_count(xor(s.bucket, qb.qbucket)) <= 1)"
        " SELECT c.vec_id, round(list_dot_product(c.embedding::DOUBLE[], q.qe::DOUBLE[])"
        " / (sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))"
        " * sqrt(list_dot_product(q.qe::DOUBLE[], q.qe::DOUBLE[]))), 4) AS cosine"
        f" FROM cand c CROSS JOIN q ORDER BY cosine DESC, c.vec_id LIMIT {k}"
    )


@q("ann_lsh_bucketed", _ann_lsh_oracle())
def ann_lsh_bucketed(spark, sf):
    emb = _t(spark, sf, "embeddings")
    query = list(emb.where(F.col("vec_id") == 0).first()["embedding"])
    return S.cosine_topk_lsh(emb, query, k=10, n_planes=6, probe_bits=1)


# Shared CTE prefix for the k-NN join oracles: integer-quantized
# vectors + squared norms (bit-exact in double — same contract as
# dedup_embedding_cosine), queries = every 20th vector.
_KNN_BASE = (
    "WITH e0 AS (SELECT vec_id, embedding,"
    " list_transform(embedding::DOUBLE[], x -> floor(x * 1000 + 0.5)) AS qe"
    " FROM embeddings),"
    " n AS (SELECT vec_id, embedding, qe, list_dot_product(qe, qe) AS nq"
    " FROM e0 WHERE list_dot_product(qe, qe) > 0),"
    " qq AS (SELECT * FROM n WHERE vec_id % 20 = 0)"
)

_KNN_TOPK = (
    " SELECT query_id, neighbor_id, cosine_milli, CAST(rank AS BIGINT) AS rank"
    " FROM (SELECT *, row_number() OVER (PARTITION BY query_id"
    " ORDER BY cosine_milli DESC, neighbor_id) AS rank FROM scored) t"
    " WHERE rank <= 5"
)


@q(
    "knn_join_exact",
    _KNN_BASE + ", scored AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,"
    " CAST(floor(1000.0 * list_dot_product(q.qe, c.qe)"
    " / (sqrt(q.nq) * sqrt(c.nq))) AS BIGINT) AS cosine_milli"
    " FROM qq q JOIN n c ON q.vec_id <> c.vec_id)" + _KNN_TOPK,
)
def knn_join_exact(spark, sf):
    """Batch k-NN join, exact baseline: true cosine top-5 over the
    corpus for EVERY query vector (5% sample), fully distributed —
    no driver collect (the single-query ann_* entries collect one
    vector; this is the many-queries shape, VERDICT r3 missing #1)."""
    emb = _t(spark, sf, "embeddings")
    qs = emb.where(F.col("vec_id") % 20 == 0)
    return S.knn_join_bruteforce(qs, emb, k=5, exclude_self=True)


def _knn_lsh_oracle(bands: int = 4, rows_per_band: int = 4, probe_bits: int = 1,
                    dim: int = 64, seed: int = 42) -> str:
    """SQL replay of the banded-hyperplane k-NN join: same integer
    plane literals as the Spark side, candidate iff SOME band's key is
    within ``probe_bits`` flips, exact quantized cosine, top-5."""
    n_planes = bands * rows_per_band
    planes = S.plane_matrix(n_planes, dim, seed)
    terms = " + ".join(
        f"(CASE WHEN list_dot_product(qe, {[int(v) for v in planes[i]]}::DOUBLE[]) > 0"
        f" THEN {1 << i} ELSE 0 END)"
        for i in range(n_planes)
    )
    mask = (1 << rows_per_band) - 1
    band_hit = " OR ".join(
        f"bit_count(xor((q.bucket >> {j * rows_per_band}) & {mask},"
        f" (c.bucket >> {j * rows_per_band}) & {mask})) <= {probe_bits}"
        for j in range(bands)
    )
    return (
        _KNN_BASE.replace(
            " qq AS (SELECT * FROM n WHERE vec_id % 20 = 0)",
            f" sig AS (SELECT vec_id, qe, nq, CAST({terms} AS BIGINT) AS bucket FROM n),"
            " qq AS (SELECT * FROM sig WHERE vec_id % 20 = 0)",
        )
        + ", scored AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,"
        " CAST(floor(1000.0 * list_dot_product(q.qe, c.qe)"
        " / (sqrt(q.nq) * sqrt(c.nq))) AS BIGINT) AS cosine_milli"
        f" FROM qq q JOIN sig c ON q.vec_id <> c.vec_id AND ({band_hit}))"
        + _KNN_TOPK
    )


@q("knn_join_lsh", _knn_lsh_oracle())
def knn_join_lsh(spark, sf):
    """Batch k-NN join, scale path: banded hyperplane signatures on
    both sides, (band, key) equi-join with ±1-bit query-side
    multiprobe, exact cosine confirm on candidates, per-query top-5.
    The oracle replays the identical candidate rule, so the driver
    check is exact (top-k of the candidate set)."""
    emb = _t(spark, sf, "embeddings")
    qs = emb.where(F.col("vec_id") % 20 == 0)
    return S.knn_join_lsh(
        qs, emb, k=5, bands=4, rows_per_band=4, probe_bits=1, exclude_self=True,
        dim=64,  # testdata embedding width — skips the driver width probe
    )


def _knn_ivf_oracle(n_centroids: int = 8, nprobe: int = 2, k: int = 5) -> str:
    """SQL replay of the IVF join: stride-sampled centroid codebook
    (cell = position in vec_id order), per-vector argmax assignment via
    row_number over (score desc, cell) — the same first-index-wins tie
    rule numpy's stable argsort applies — corpus in 1 cell, queries
    probing ``nprobe``, exact quantized cosine, top-k."""
    return (
        "WITH e0 AS (SELECT vec_id,"
        " list_transform(embedding::DOUBLE[], x -> floor(x * 1000 + 0.5)) AS qe"
        " FROM embeddings),"
        " n AS (SELECT vec_id, qe, list_dot_product(qe, qe) AS nq"
        " FROM e0 WHERE list_dot_product(qe, qe) > 0),"
        f" st AS (SELECT greatest(1, count(*) // {n_centroids}) AS s FROM e0),"
        " cent AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,"
        " qe AS cv, list_dot_product(qe, qe) AS cn FROM e0, st"
        f" WHERE vec_id % s = 0 ORDER BY vec_id LIMIT {n_centroids}),"
        " sc AS (SELECT n.vec_id, cent.cell,"
        " list_dot_product(n.qe, cent.cv) / sqrt(cent.cn) AS score"
        " FROM n CROSS JOIN cent),"
        " ranked AS (SELECT vec_id, cell, row_number() OVER"
        " (PARTITION BY vec_id ORDER BY score DESC, cell) AS rn FROM sc),"
        " cassign AS (SELECT vec_id AS cid, cell FROM ranked WHERE rn <= 1),"
        " qassign AS (SELECT vec_id AS qid, cell FROM ranked"
        f" WHERE rn <= {nprobe} AND vec_id % 20 = 0),"
        " cand AS (SELECT DISTINCT qid, cid FROM qassign JOIN cassign USING (cell)"
        " WHERE qid <> cid),"
        " scored AS (SELECT cand.qid AS query_id, cand.cid AS neighbor_id,"
        " CAST(floor(1000.0 * list_dot_product(q.qe, c.qe)"
        " / (sqrt(q.nq) * sqrt(c.nq))) AS BIGINT) AS cosine_milli"
        " FROM cand JOIN n q ON cand.qid = q.vec_id JOIN n c ON cand.cid = c.vec_id)"
        " SELECT query_id, neighbor_id, cosine_milli, CAST(rank AS BIGINT) AS rank"
        " FROM (SELECT *, row_number() OVER (PARTITION BY query_id"
        " ORDER BY cosine_milli DESC, neighbor_id) AS rank FROM scored) t"
        f" WHERE rank <= {k}"
    )


@q("knn_join_ivf", _knn_ivf_oracle())
def knn_join_ivf(spark, sf):
    """Batch k-NN join, IVF path: stride-sampled coarse codebook,
    Arrow-matmul cell assignment (corpus 1 cell, queries probe 2),
    cell equi-join candidates, exact cosine confirm, per-query top-5.
    Oracle replays the identical assignment rule, so the driver check
    is exact (top-k of the candidate set)."""
    emb = _t(spark, sf, "embeddings")
    qs = emb.where(F.col("vec_id") % 20 == 0)
    return S.knn_join_ivf(
        qs, emb, k=5, n_centroids=8, nprobe=2, exclude_self=True
    )


_STOP_SQL = "(" + ", ".join(f"'{s}'" for s in STOPWORDS) + ")"

@q(
    "text_stats",
    "WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk,"
    " text FROM documents)"
    " SELECT doc_id, len(tk)::BIGINT AS n_tokens,"
    f" len(list_filter(tk, x -> x IN {_STOP_SQL}))::BIGINT AS n_stop,"
    f" (len(list_filter(tk, x -> x IN {_STOP_SQL})) * 1000) // len(tk) AS stop_milli,"
    f" CASE WHEN (len(list_filter(tk, x -> x IN {_STOP_SQL})) * 1000) // len(tk) >= 30"
    " THEN 'en' ELSE 'other' END AS lang_pred,"
    " len(regexp_extract_all(text, '[A-Za-z0-9'']+|[^A-Za-z0-9\\s]'))::BIGINT AS n_bpe"
    " FROM t",
)
def text_stats(spark, sf):
    d = _t(spark, sf, "documents")
    return d.select(
        "doc_id",
        T.token_count_ws(F.col("text")).alias("n_tokens"),
        T.stopword_count(F.col("text")).alias("n_stop"),
        T.stopword_ratio_milli(F.col("text")).alias("stop_milli"),
        T.lang_id(F.col("text")).alias("lang_pred"),
        T.token_count_bpe(F.col("text")).alias("n_bpe"),
    )


@q(
    "text_fingerprint",
    "WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk"
    " FROM documents)"
    " SELECT doc_id, CAST(COALESCE(list_sum(list_transform(tk,"
    f" (x, i) -> i * (ascii(x) + 31 * length(x)))), 0) % {FINGERPRINT_MOD} AS BIGINT) AS fp"
    " FROM t",
)
def text_fingerprint(spark, sf):
    d = _t(spark, sf, "documents")
    return d.select("doc_id", T.fingerprint(F.col("text")).alias("fp"))


# Corpus distribution profile: per-language doc counts, token totals,
# extremes, and the EXACT lower median of per-doc token counts.  The
# median deliberately avoids a per-language global sort (a handful of
# language partitions would each swallow a corpus-scale sort — maximal
# skew): instead groupBy (lang, n_tokens) builds a tiny histogram (one
# row per distinct length), a cumulative window runs over THAT, and
# the median is the first length whose cumulative count reaches
# ceil(n/2).  Exact, two small shuffles, no corpus-wide ordering.
@q(
    "corpus_profile",
    "WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk"
    " FROM documents),"
    " d AS (SELECT doc_id,"
    f" CASE WHEN (len(list_filter(tk, x -> x IN {_STOP_SQL}))*1000)//len(tk) >= 30"
    " THEN 'en' ELSE 'other' END AS lang, len(tk)::BIGINT AS n_tokens FROM t),"
    " tot AS (SELECT lang, count(*)::BIGINT AS n_docs, sum(n_tokens)::BIGINT AS total_tokens,"
    " min(n_tokens) AS min_tokens, max(n_tokens) AS max_tokens FROM d GROUP BY lang),"
    " hist AS (SELECT lang, n_tokens, count(*) AS c FROM d GROUP BY lang, n_tokens),"
    " cum AS (SELECT lang, n_tokens, sum(c) OVER (PARTITION BY lang ORDER BY n_tokens) AS cc"
    " FROM hist),"
    " med AS (SELECT cum.lang, min(cum.n_tokens) AS median_tokens FROM cum JOIN tot"
    " ON cum.lang = tot.lang WHERE cum.cc >= (tot.n_docs + 1) // 2 GROUP BY cum.lang)"
    " SELECT tot.lang, n_docs, total_tokens, min_tokens, max_tokens, median_tokens"
    " FROM tot JOIN med ON tot.lang = med.lang",
)
def corpus_profile(spark, sf):
    """Per-language corpus stats with an exact histogram-based median
    (never a per-language corpus sort — see comment above)."""
    d = _t(spark, sf, "documents").select(
        T.lang_id(F.col("text")).alias("lang"),
        T.token_count_ws(F.col("text")).alias("n_tokens"),
    )
    tot = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.min("n_tokens").alias("min_tokens"),
        F.max("n_tokens").alias("max_tokens"),
    )
    hist = d.groupBy("lang", "n_tokens").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("lang").orderBy("n_tokens")
    cum = hist.withColumn("cc", F.sum("c").over(w))
    med = (
        cum.join(tot.select("lang", "n_docs"), "lang")
        .where(F.col("cc") >= idiv(F.col("n_docs") + 1, F.lit(2)))
        .groupBy("lang")
        .agg(F.min("n_tokens").alias("median_tokens"))
    )
    return tot.join(med, "lang").select(
        "lang", "n_docs", "total_tokens", "min_tokens", "max_tokens", "median_tokens"
    )


# Compression-ratio quality signal (operators/multimodal.py): zlib
# bytes per mille — NO SQL oracle (DuckDB has no zlib), so the driver
# records the weaker rows-only check; pytest referees the values
# against direct zlib.compress calls and the determinism of level-6
# zlib makes the rows-only check stable.
@q("text_compression_signal", None)
def text_compression_signal(spark, sf):
    """Entropy-based quality signal: zlib-compressed size per mille of
    the UTF-8 length, Arrow-batched."""
    d = _t(spark, sf, "documents")
    return MM.compression_ratio_milli(d, "doc_id", "text")


# Retry scheduling (operators/retry.py): synthetic fetch log derived
# closed-form from events (each url key attempted once per wave
# block, deterministic failures), then the backoff rule — a URL whose
# LATEST attempt failed re-enters at last_wave + 2^failures unless
# past the attempt cap.
@q(
    "crawl_retry_schedule",
    "WITH fl AS (SELECT (event_id % 120) % 5 AS seed_index,"
    " 'https://h' || (event_id % 120) || '.example/p' AS fetch_url,"
    " event_id // 120 AS wave, (event_id % 7) <> 0 AS fetch_ok FROM events),"
    " g AS (SELECT seed_index, fetch_url,"
    " CAST(sum(CASE WHEN NOT fetch_ok THEN 1 ELSE 0 END) AS BIGINT) AS failures,"
    " CAST(max(wave) AS BIGINT) AS last_wave,"
    " arg_max(fetch_ok, wave) AS last_ok"
    " FROM fl GROUP BY seed_index, fetch_url)"
    " SELECT seed_index, fetch_url, failures,"
    " last_wave + CAST(power(2, failures) AS BIGINT) AS due_wave"
    " FROM g WHERE NOT last_ok AND failures <= 30",
)
def crawl_retry_schedule(spark, sf):
    """Exponential-backoff retry schedule over a deterministic fetch
    log: failures count, latest-attempt gate, due wave."""
    e = _t(spark, sf, "events")
    key = F.pmod("event_id", F.lit(120))
    fl = e.select(
        F.pmod(key, F.lit(5)).cast("int").alias("seed_index"),
        F.concat(F.lit("https://h"), key.cast("string"), F.lit(".example/p")).alias(
            "fetch_url"
        ),
        (F.col("event_id") / 120).cast("long").alias("wave"),
        (F.pmod("event_id", F.lit(7)) != 0).alias("fetch_ok"),
    )
    return RT.schedule_retries(fl, max_attempts=30)


# Sitemap ingestion: <loc> extraction from sitemap XML -> posexplode
# -> canonicalization, the discovery path that turns a fetched
# /sitemap.xml page into frontier candidates.  XML is synthesized
# closed-form from doc_id (1-3 entries per doc, uppercase scheme/host,
# default port, unsorted query, fragment, stray whitespace) so the
# oracle predicts the canonical output without parsing anything.
@q(
    "sitemap_ingest",
    "WITH j AS (SELECT doc_id, d AS pos FROM documents"
    " CROSS JOIN generate_series(0, 2) t(d) WHERE d <= doc_id % 3)"
    " SELECT doc_id, CAST(pos AS BIGINT) AS pos,"
    " 'https://site' || (doc_id % 50) || '.example/page/' || doc_id || '/' || pos"
    " || '?a=1&b=2' AS fetch_url FROM j",
)
def sitemap_ingest(spark, sf):
    """Sitemap XML -> ordered, canonicalized frontier candidates."""
    d = _t(spark, sf, "documents")

    def block(j: int):
        return F.when(
            F.pmod("doc_id", F.lit(3)) >= j,
            F.concat(
                F.lit("<url><loc> HTTPS://Site"),
                F.pmod("doc_id", F.lit(50)).cast("string"),
                F.lit(".Example:443/page/"),
                F.col("doc_id").cast("string"),
                F.lit(f"/{j}?b=2&a=1#f </loc></url>"),
            ),
        ).otherwise(F.lit(""))

    xml = F.concat(F.lit("<urlset>"), block(0), block(1), block(2), F.lit("</urlset>"))
    t = d.select("doc_id", U.extract_sitemap_urls(xml).alias("_locs"))
    return t.select(
        "doc_id", F.posexplode("_locs").alias("pos", "_raw")
    ).select(
        "doc_id",
        F.col("pos").cast("long").alias("pos"),
        U.canonicalize_url(F.col("_raw")).alias("fetch_url"),
    )


# Lloyd's k-means over embeddings (operators/clustering.py), exactly
# replayable because cosine assignment is scale-invariant per centroid
# — centroids stay integer SUM-vectors, never float means.  One
# iteration from the stride-sampled codebook; the oracle chains the
# same init -> assign -> per-dim integer sums (empty cells keep the
# previous centroid) -> reassign as CTEs.
# One Lloyd iteration (k=8) as chained CTEs ending in a2(vec_id, cell)
# — shared by cluster_kmeans and the SemDeDup oracle.
_KMEANS_CTES = (
    "WITH e0 AS (SELECT vec_id,"
    " list_transform(embedding::DOUBLE[], x -> floor(x*1000+0.5)) AS qe FROM embeddings),"
    " st AS (SELECT greatest(1, count(*) // 8) AS s FROM e0),"
    " cent AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, qe AS cv"
    " FROM e0, st WHERE vec_id % s = 0 ORDER BY vec_id LIMIT 8),"
    " sc1 AS (SELECT e0.vec_id, cent.cell, list_dot_product(e0.qe, cent.cv)"
    " / sqrt(list_dot_product(cent.cv, cent.cv)) AS score FROM e0 CROSS JOIN cent),"
    " a1 AS (SELECT vec_id, cell FROM (SELECT vec_id, cell, row_number() OVER"
    " (PARTITION BY vec_id ORDER BY score DESC, cell) AS rn FROM sc1) WHERE rn = 1),"
    " s1 AS (SELECT cell, d, CAST(sum(qe[d]) AS BIGINT) AS sv FROM a1 JOIN e0"
    " USING (vec_id) CROSS JOIN generate_series(1, 64) AS t(d) GROUP BY cell, d),"
    " c1 AS (SELECT cell, list(CAST(sv AS DOUBLE) ORDER BY d) AS cv FROM s1 GROUP BY cell),"
    " cf AS (SELECT cent.cell, COALESCE(c1.cv, cent.cv) AS cv FROM cent LEFT JOIN c1 USING (cell)),"
    " sc2 AS (SELECT e0.vec_id, cf.cell, list_dot_product(e0.qe, cf.cv)"
    " / sqrt(list_dot_product(cf.cv, cf.cv)) AS score FROM e0 CROSS JOIN cf),"
    " a2 AS (SELECT vec_id, cell FROM (SELECT vec_id, cell, row_number() OVER"
    " (PARTITION BY vec_id ORDER BY score DESC, cell) AS rn FROM sc2) WHERE rn = 1)"
)


@q(
    "cluster_kmeans",
    _KMEANS_CTES + " SELECT vec_id, CAST(cell AS BIGINT) AS cell FROM a2",
)
def cluster_kmeans(spark, sf):
    """One Lloyd iteration of cosine k-means (k=8) from the
    deterministic stride-sampled codebook — assignments bit-match the
    SQL replay because every quantity stays exact integers (see
    operators/clustering.py)."""
    emb = _t(spark, sf, "embeddings")
    assign, _cents = CL.kmeans_lloyd(emb, 8, n_iter=1, dim=64)
    return assign.select("vec_id", F.col("cell").cast("long").alias("cell"))


# Gopher-style repetition gate: per-mille duplicated-2-gram fraction
# per doc, plus the keep decision at the classic <200 threshold.
@q(
    "text_repetition_filter",
    "WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk"
    " FROM documents),"
    " g AS (SELECT doc_id, CASE WHEN len(tk) >= 2 THEN"
    " list_transform(generate_series(1, len(tk) - 1), i -> tk[i] || ' ' || tk[i+1])"
    " ELSE [] END AS grams FROM t)"
    " SELECT doc_id,"
    " COALESCE(((len(grams) - len(list_distinct(grams))) * 1000) // nullif(len(grams), 0), 0)"
    " ::BIGINT AS dup_milli,"
    " COALESCE(((len(grams) - len(list_distinct(grams))) * 1000) // nullif(len(grams), 0), 0)"
    " < 200 AS keep FROM g",
)
def text_repetition_filter(spark, sf):
    """Within-doc repetition scoring (duplicate 2-gram fraction) and
    the keep gate — the Gopher-rule quality filter."""
    d = _t(spark, sf, "documents")
    t = d.select("doc_id", T.tokens(F.col("text")).alias("_tk"))
    dup = T.dup_ngram_milli(F.col("_tk"), 2)
    return t.select(
        "doc_id", dup.alias("dup_milli"), (dup < 200).alias("keep")
    )


# PII scrubbing (functions/text.py): synthetic emails/phones are
# injected closed-form from doc_id on BOTH sides (the corpus itself
# carries none), then counted and redacted; patterns are chosen to
# mean the same thing in Java regex and RE2, so the scrubbed string
# itself is part of the oracle comparison.
@q(
    "text_pii_scrub",
    "WITH t AS (SELECT doc_id, text"
    " || CASE WHEN doc_id % 5 = 0 THEN ' contact user' || doc_id || '@example.com now'"
    " ELSE '' END"
    " || CASE WHEN doc_id % 7 = 0 THEN ' call +1-555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')"
    " || '-0199' ELSE '' END AS text FROM documents)"
    " SELECT doc_id,"
    " len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))::BIGINT AS n_emails,"
    " len(regexp_extract_all(text, '\\+1-[0-9]{3}-[0-9]{3}-[0-9]{4}'))::BIGINT AS n_phones,"
    " regexp_replace(regexp_replace(text,"
    " '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),"
    " '\\+1-[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS scrubbed"
    " FROM t",
)
def text_pii_scrub(spark, sf):
    """PII redaction audit: per-doc email/phone counts plus the
    scrubbed text, compared byte-for-byte against the oracle."""
    d = _t(spark, sf, "documents")
    injected = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.lit(" contact user"), F.col("doc_id").cast("string"),
                     F.lit("@example.com now")),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.lit(" call +1-555-"),
                     F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
                     F.lit("-0199")),
        ).otherwise(F.lit("")),
    )
    t = d.select("doc_id", injected.alias("text"))
    n_e, n_p = T.pii_counts(F.col("text"))
    return t.select(
        "doc_id",
        n_e.alias("n_emails"),
        n_p.alias("n_phones"),
        T.scrub_pii(F.col("text")).alias("scrubbed"),
    )


# Eval-set decontamination (operators/decontaminate.py): drop every
# training doc sharing >= 1 distinct 5-gram with the eval corpus (a
# deterministic doc_id % 37 slice of documents — eval docs therefore
# remove themselves, and docs under 5 tokens have no grams and
# survive).  The entry runs the byte-exact string mode so the oracle
# replays it literally; the xxhash64 scale mode is pytest-asserted
# equal to it.
@q(
    "corpus_decontaminate",
    "WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk"
    " FROM documents),"
    " sh AS (SELECT DISTINCT doc_id, unnest(list_transform(generate_series(1, len(tk) - 4),"
    " i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3] || ' ' || tk[i+4]))"
    " AS shingle FROM t WHERE len(tk) >= 5),"
    " ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 37 = 0),"
    " bad AS (SELECT DISTINCT sh.doc_id FROM sh JOIN ev USING (shingle))"
    " SELECT doc_id FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM bad)",
)
def corpus_decontaminate(spark, sf):
    """Benchmark decontamination: training corpus minus every doc that
    shares an n-gram with the eval slice."""
    docs = _t(spark, sf, "documents")
    ev = docs.where(F.col("doc_id") % 37 == 0)
    return DC.decontaminate(
        docs, ev, "doc_id", "text", n=5, min_hits=1, use_hashes=False
    ).select("doc_id")


# REAL audio-header decode (no codec library needed for canonical PCM
# WAV): synth_wav builds valid RIFF blobs whose parameters are
# closed-form in doc_id, parse_wav_header reads them back with pure
# JVM byte arithmetic, and the oracle predicts every field without
# touching bytes — a full synth -> binary -> parse round trip.
@q(
    "mm_wav_header",
    "SELECT doc_id AS media_id, 1::BIGINT AS audio_format,"
    " (doc_id % 2 + 1)::BIGINT AS channels,"
    " (8000 + (doc_id % 4) * 4000)::BIGINT AS sample_rate,"
    " ((8000 + (doc_id % 4) * 4000) * ((doc_id % 2 + 1) * 2))::BIGINT AS byte_rate,"
    " 16::BIGINT AS bits_per_sample,"
    " (((doc_id % 50) + 1) * 100 * ((doc_id % 2 + 1) * 2))::BIGINT AS data_bytes,"
    " ((((doc_id % 50) + 1) * 100 * ((doc_id % 2 + 1) * 2)) * 1000)"
    " // ((8000 + (doc_id % 4) * 4000) * ((doc_id % 2 + 1) * 2)) AS duration_ms"
    " FROM documents",
)
def mm_wav_header(spark, sf):
    """WAV/RIFF header decode over binary blobs — the one REAL (not
    stubbed) media decode: fixed-offset little-endian header fields
    need no codec library."""
    docs = _t(spark, sf, "documents")
    return MM.parse_wav_header(MM.synth_wav(docs))


# Deterministic mixture shaping (operators/sampling.py): keep 900/1000
# of 'en' docs and 150/1000 of 'other', decided purely by
# md5(doc_id) — replayable bit-for-bit in the oracle, stable under
# repartitioning and corpus growth.
@q(
    "corpus_sample_stratified",
    "WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk"
    " FROM documents),"
    " s AS (SELECT doc_id,"
    f" CASE WHEN (len(list_filter(tk, x -> x IN {_STOP_SQL}))*1000)//len(tk) >= 30"
    " THEN 'en' ELSE 'other' END AS lang,"
    " CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) AS BIGINT) % 1000 AS bucket"
    " FROM t)"
    " SELECT doc_id, lang, bucket FROM s"
    " WHERE bucket < CASE lang WHEN 'en' THEN 900 WHEN 'other' THEN 150 ELSE 0 END",
)
def corpus_sample_stratified(spark, sf):
    """Stratified corpus sampling: per-language keep rates over a
    hash-bucket decision that any engine can replay (no RNG, no
    partition dependence) — the mixture-shaping op of a training-data
    pipeline."""
    d = _t(spark, sf, "documents")
    out = SAMP.sample_stratified(
        d, T.lang_id(F.col("text")), "doc_id", {"en": 900, "other": 150}
    )
    return out.select(
        "doc_id", F.col("_stratum").alias("lang"), F.col("_bucket").alias("bucket")
    )


# Leakage-safe train/val/test assignment (operators/sampling.py
# split_assign, VERDICT r4 missing #4): HOST-keyed, so every page of a
# site lands in the same split by construction — hash-of-doc-id splits
# cannot guarantee that.  The oracle replays the same md5-hex bucket
# arithmetic and cumulative per-mille ranges.
@q(
    "corpus_split_assign",
    "WITH h AS (SELECT doc_id,"
    " 'h' || (doc_id % 97) || '.example.com' AS host FROM documents)"
    " SELECT doc_id, host,"
    " CASE WHEN b < 900 THEN 'train' WHEN b < 950 THEN 'val'"
    " ELSE 'test' END AS split FROM"
    " (SELECT doc_id, host,"
    " CAST('0x' || substr(md5(host), 1, 6) AS BIGINT) % 1000 AS b FROM h)",
)
def corpus_split_assign(spark, sf):
    """Deterministic host-keyed train/val/test split: 900/50/50 per
    mille, a pure function of the host key (replayable, stable under
    corpus growth, leakage-safe at host granularity)."""
    d = _t(spark, sf, "documents")
    host = F.concat(
        F.lit("h"), F.pmod("doc_id", F.lit(97)).cast("string"), F.lit(".example.com")
    )
    return SAMP.split_assign(d.select("doc_id", host.alias("host")), "host").select(
        "doc_id", "host", "split"
    )


# The composite an LLM-data pipeline actually runs as ONE job: language
# gate -> quality gate -> exact dedup -> near-dup removal -> token
# accounting.  Every stage is a §2.9 operator; the oracle replays the
# chain with the EXACT all-pairs Jaccard in place of the MinHash prune
# (prune-only + exact confirm, so the outputs agree).
# Shared CTE chain through the near-dup pair graph; the two finals
# below differ only in the drop rule (pairwise doc_b vs component
# non-representatives).
_CORPUS_PREP_BASE = (
    "t AS (SELECT doc_id, text, list_filter(string_split(text, ' '), x -> x <> '') AS tk"
    " FROM documents),"
    " c AS (SELECT doc_id, text, tk,"
    f" (len(list_filter(tk, x -> x IN {{stop}}))*1000)//len(tk) AS stop_m,"
    " (length(regexp_replace(text, '[^A-Za-z]', '', 'g'))*1000)//length(text) AS alpha_m,"
    " CASE WHEN len(tk) BETWEEN 20 AND 1000 THEN 1000 ELSE 200 END AS len_m FROM t),"
    " q0 AS (SELECT doc_id, text, tk, stop_m, (stop_m+alpha_m+len_m)//3 AS quality_milli FROM c),"
    " kept AS (SELECT *, min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id"
    " FROM q0 WHERE stop_m >= 30 AND quality_milli >= {qthr}),"
    " kept2 AS (SELECT doc_id, text, tk, quality_milli FROM kept WHERE doc_id = keep_id),"
    " sh AS (SELECT DISTINCT doc_id, unnest(list_transform(generate_series(1, len(tk) - 2),"
    " i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS shingle FROM kept2 WHERE len(tk) >= 3),"
    " cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),"
    " inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i_cnt"
    " FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id GROUP BY 1, 2),"
    " pairs AS (SELECT doc_a, doc_b FROM inter"
    " JOIN cnt ca ON ca.doc_id = doc_a JOIN cnt cb ON cb.doc_id = doc_b"
    " WHERE (i_cnt * 1000) // (ca.n_sh + cb.n_sh - i_cnt) >= {jthr})"
)

_CORPUS_PREP_SELECT = (
    " SELECT doc_id, quality_milli, len(tk)::BIGINT AS n_tokens,"
    " len(regexp_extract_all(text, '[A-Za-z0-9'']+|[^A-Za-z0-9\\s]'))::BIGINT AS n_bpe"
    " FROM final"
)

_CORPUS_PREP_ORACLE = (
    "WITH "
    + _CORPUS_PREP_BASE
    + ", final AS (SELECT * FROM kept2 WHERE doc_id NOT IN (SELECT doc_b FROM pairs))"
    + _CORPUS_PREP_SELECT
).format(stop=_STOP_SQL, qthr=600, jthr=500)

_CORPUS_PREP_CC_ORACLE = (
    "WITH RECURSIVE "
    + _CORPUS_PREP_BASE
    + ", edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs"
    " UNION ALL SELECT doc_b AS src, doc_a AS dst FROM pairs),"
    " reach AS (SELECT src AS doc, src AS root FROM edges"
    " UNION SELECT e.dst AS doc, r.root FROM reach r JOIN edges e ON e.src = r.doc),"
    " comp AS (SELECT doc, min(root) AS component FROM reach GROUP BY doc),"
    " final AS (SELECT * FROM kept2 WHERE doc_id NOT IN"
    " (SELECT doc FROM comp WHERE doc <> component))"
    + _CORPUS_PREP_SELECT
).format(stop=_STOP_SQL, qthr=600, jthr=500)


def corpus_prep_frame(
    d: DataFrame,
    quality_threshold: int = 600,
    jaccard_threshold_milli: int = 500,
    dedup: str = "pairs",
) -> DataFrame:
    """End-to-end training-corpus prep over a ``documents``-shaped frame
    as one plan: language gate (stopword-ratio lang-id) -> quality gate
    (integer per-mille score) -> exact dedup (keep min doc_id per md5)
    -> MinHash-LSH near-dup removal -> per-doc token accounting.

    ``dedup``: drop rule over the confirmed near-dup pairs.  "pairs"
    drops the greater doc of every pair (cheap, may over-drop on
    chains); "components" keeps exactly the min doc_id of each
    connected component (canonical-representative policy,
    operators/graph.py).  Both are prune-only + exact confirm, so each
    equals its oracle's exact-Jaccard replay.

    Scale shape: gates and scoring are pure JVM column exprs on the
    scan; exact dedup is one window over md5 partitions; the only
    corpus-wide shuffles are that window, the LSH band join, and the
    signature groupBy-min (map-side combined to one row per doc per
    partition, all hashes codegen'd) — at 100 TB the near-dup stage
    only ever touches docs that survive the cheap gates."""
    # Tokenize ONCE in a dedicated projection (the lambda re-eval trap:
    # Catalyst does not CSE across higher-order functions, so deriving
    # every stat straight from `text` re-splits the document per
    # column), then derive all gate stats from the array.  Semantics
    # identical to T.quality_score_milli / T.lang_id / token counts.
    stops = F.array(*[F.lit(s) for s in STOPWORDS])
    t1 = d.select("doc_id", "text", T.tokens(F.col("text")).alias("_tk"))
    n_tokens = F.size("_tk").cast("long")
    n_stop = F.size(F.filter("_tk", lambda x: F.array_contains(stops, x))).cast("long")
    stop_m = idiv(n_stop * F.lit(1000), n_tokens)
    alpha = F.length(F.regexp_replace("text", r"[^A-Za-z]", "")).cast("long")
    alpha_m = idiv(alpha * F.lit(1000), F.length("text").cast("long"))
    len_m = (
        F.when((n_tokens >= 20) & (n_tokens <= 1000), F.lit(1000))
        .otherwise(F.lit(200))
        .cast("long")
    )
    scored = t1.select(
        "doc_id",
        "text",
        idiv(stop_m + alpha_m + len_m, F.lit(3)).alias("quality_milli"),
        stop_m.alias("_stop_m"),
        n_tokens.alias("n_tokens"),
        T.token_count_bpe(F.col("text")).alias("n_bpe"),
    )
    kept = scored.where(
        (F.col("_stop_m") >= 30) & (F.col("quality_milli") >= quality_threshold)
    ).drop("_stop_m")
    w = Window.partitionBy(F.md5(F.col("text")))
    kept = (
        kept.withColumn("_keep", F.col("doc_id") == F.min("doc_id").over(w))
        .where(F.col("_keep"))
        .drop("_keep")
    )
    # Three consumers read the gated subset (signature scan, exact
    # confirm, final anti-join) — materialize it once instead of
    # re-running the scan+gates+window per consumer.
    kept = kept.localCheckpoint()
    pairs = S.minhash_dedup_pairs(
        kept, "doc_id", "text", 3, jaccard_threshold_milli
    )
    if dedup == "components":
        comp = G.dedup_components(pairs)
        drop = comp.where(F.col("doc_id") != F.col("component")).select("doc_id")
    else:
        drop = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    out = kept.join(drop, "doc_id", "left_anti")
    return out.select("doc_id", "quality_milli", "n_tokens", "n_bpe")


# Token-budget corpus selection (operators/packing.budget_select):
# "assemble exactly N tokens of the best data" — the greedy
# quality-ordered prefix under a global token budget, cumsum'd by the
# two-phase range-bucket prefix scan (never a single-partition sort).
# The oracle reuses the corpus-prep q0 scoring CTE and replays the
# cumsum as a plain SQL window.
_CORPUS_BUDGET_ORACLE = (
    "WITH "
    + _CORPUS_PREP_BASE
    + ", s AS (SELECT doc_id, quality_milli, CAST(len(tk) AS BIGINT) AS n_tokens"
    " FROM q0 WHERE len(tk) > 0),"
    " c2 AS (SELECT doc_id, quality_milli, n_tokens,"
    " CAST(sum(n_tokens) OVER (ORDER BY quality_milli DESC, doc_id"
    " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens FROM s)"
    " SELECT doc_id, quality_milli, n_tokens, cum_tokens FROM c2"
    " WHERE cum_tokens <= 12000"
).format(stop=_STOP_SQL, qthr=600, jthr=500)


@q("corpus_budget_select", _CORPUS_BUDGET_ORACLE)
def corpus_budget_select(spark, sf):
    """Greedy quality-prefix selection at a 12k-token global budget."""
    from .operators import packing as PK

    d = _t(spark, sf, "documents")
    stops = F.array(*[F.lit(s) for s in STOPWORDS])
    t1 = d.select("doc_id", "text", T.tokens(F.col("text")).alias("_tk"))
    n_tokens = F.size("_tk").cast("long")
    n_stop = F.size(F.filter("_tk", lambda x: F.array_contains(stops, x))).cast(
        "long"
    )
    stop_m = idiv(n_stop * F.lit(1000), n_tokens)
    alpha = F.length(F.regexp_replace("text", r"[^A-Za-z]", "")).cast("long")
    alpha_m = idiv(alpha * F.lit(1000), F.length("text").cast("long"))
    len_m = (
        F.when((n_tokens >= 20) & (n_tokens <= 1000), F.lit(1000))
        .otherwise(F.lit(200))
        .cast("long")
    )
    scored = t1.select(
        "doc_id",
        idiv(stop_m + alpha_m + len_m, F.lit(3)).alias("quality_milli"),
        n_tokens.alias("n_tokens"),
    )
    return PK.budget_select(scored, "n_tokens", 12000, "quality_milli")


@q("corpus_prep_pipeline", _CORPUS_PREP_ORACLE)
def corpus_prep_pipeline(spark, sf):
    """The composite corpus-prep chain (see ``corpus_prep_frame``)."""
    return corpus_prep_frame(_t(spark, sf, "documents"))


# Corpus prep chained into exact-substring span cleaning (T81): the
# gated+deduped survivors lose every non-first repeated 4-token window
# (4, not the prod-scale 50: the synthetic corpus has ~50-token docs
# over a tiny vocabulary, and w=4 makes the span machinery actually
# fire on the survivor set — 163 docs lose 970 tokens at sf0.01),
# and the CLEANED TEXT ITSELF is value-checked — spans are computed on
# the survivor set (post-dedup), matching a real pipeline's stage
# order (drop whole near-dup docs first, then cut residual verbatim
# passages out of the keepers).  Positions index the raw single-space
# split on both engines.
_CORPUS_PREP_SPANCLEAN_ORACLE = (
    "WITH "
    + _CORPUS_PREP_BASE
    + ", final AS (SELECT * FROM kept2 WHERE doc_id NOT IN (SELECT doc_b FROM pairs)),"
    " rtk AS (SELECT doc_id, text, string_split(text, ' ') AS rk FROM final),"
    " w AS (SELECT doc_id,"
    " CAST(unnest(generate_series(1, len(rk) - {wm1})) AS INT) AS pos,"
    " unnest(list_transform(generate_series(1, len(rk) - {wm1}),"
    " i -> array_to_string(rk[i:i+{wm1}], ' '))) AS win"
    " FROM rtk WHERE len(rk) >= {w}),"
    " dd AS (SELECT doc_id, pos,"
    " row_number() OVER (PARTITION BY win ORDER BY doc_id, pos) AS rn,"
    " count(*) OVER (PARTITION BY win) AS cc FROM w),"
    " rem AS (SELECT doc_id, pos FROM dd WHERE cc > 1 AND rn > 1),"
    " isl AS (SELECT doc_id, pos,"
    " CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL"
    " OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + {w}"
    " THEN 1 ELSE 0 END AS brk FROM rem),"
    " g AS (SELECT doc_id, pos,"
    " sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM isl),"
    " sp AS (SELECT doc_id, min(pos) AS s, CAST(max(pos) + {wm1} AS INT) AS e"
    " FROM g GROUP BY doc_id, grp),"
    " spl AS (SELECT doc_id, list(struct_pack(s := s, e := e)) AS sps"
    " FROM sp GROUP BY doc_id),"
    " cl AS (SELECT r.doc_id,"
    " CASE WHEN spl.sps IS NULL THEN r.text ELSE"
    " array_to_string(list_filter(list_transform(range(1, len(rk) + 1),"
    " i -> CASE WHEN len(list_filter(spl.sps,"
    " s -> i >= s.s AND i <= s.e)) > 0 THEN NULL ELSE rk[CAST(i AS INT)] END),"
    " x -> x IS NOT NULL), ' ') END AS text_dedup,"
    " CAST(len(rk) AS BIGINT) AS n_raw"
    " FROM rtk r LEFT JOIN spl ON r.doc_id = spl.doc_id)"
    " SELECT doc_id, text_dedup,"
    " CAST(len(string_split(text_dedup, ' ')) AS BIGINT) AS n_tokens_clean,"
    " n_raw - CAST(len(string_split(text_dedup, ' ')) AS BIGINT) AS tokens_removed"
    " FROM cl"
).format(stop=_STOP_SQL, qthr=600, jthr=500, w=4, wm1=3)


@q("corpus_prep_spanclean", _CORPUS_PREP_SPANCLEAN_ORACLE)
def corpus_prep_spanclean(spark, sf):
    """Corpus prep chained into exact-substring span cleaning: residual
    verbatim passages are cut out of the surviving docs."""
    from .operators import spans as SP

    d = _t(spark, sf, "documents")
    prepped = corpus_prep_frame(d)
    survivors = d.join(prepped.select("doc_id"), "doc_id", "left_semi").select(
        "doc_id", "text"
    )
    spans = SP.exact_substring_spans(survivors, "doc_id", "text", w=4)
    cleaned = SP.strip_spans(survivors, spans, "doc_id", "text")
    raw_n = F.size(F.split("text", " ")).cast("long")
    clean_n = F.size(F.split("text_dedup", " ")).cast("long")
    return cleaned.select(
        "doc_id",
        "text_dedup",
        clean_n.alias("n_tokens_clean"),
        (raw_n - clean_n).alias("tokens_removed"),
    )


@q("corpus_prep_cc", _CORPUS_PREP_CC_ORACLE)
def corpus_prep_cc(spark, sf):
    """Corpus prep with the component-canonical drop rule: exactly one
    survivor (min doc_id) per near-dup connected component."""
    return corpus_prep_frame(_t(spark, sf, "documents"), dedup="components")


# Corpus prep chained into mixture shaping (T15 -> T18): after gates,
# exact dedup and near-dup removal, keep every high-quality survivor
# (quality >= 700) but only 400/1000 of the rest, decided by the
# deterministic md5 bucket.  The oracle extends the corpus-prep replay
# with the same bucket arithmetic — the full five-stage composite is
# still one exactly-replayable plan.
_CORPUS_PREP_SAMPLED_ORACLE = (
    "WITH "
    + _CORPUS_PREP_BASE
    + ", final AS (SELECT * FROM kept2 WHERE doc_id NOT IN (SELECT doc_b FROM pairs)),"
    " scored AS (SELECT doc_id, quality_milli, len(tk)::BIGINT AS n_tokens,"
    " len(regexp_extract_all(text, '[A-Za-z0-9'']+|[^A-Za-z0-9\\s]'))::BIGINT AS n_bpe,"
    " CASE WHEN quality_milli >= 700 THEN 'hi' ELSE 'lo' END AS band,"
    " CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) AS BIGINT) % 1000 AS bucket"
    " FROM final)"
    " SELECT doc_id, quality_milli, n_tokens, n_bpe, band, bucket FROM scored"
    " WHERE bucket < CASE band WHEN 'hi' THEN 1000 ELSE 400 END"
).format(stop=_STOP_SQL, qthr=600, jthr=500)


@q("corpus_prep_sampled", _CORPUS_PREP_SAMPLED_ORACLE)
def corpus_prep_sampled(spark, sf):
    """Corpus prep chained into deterministic quality-stratified
    sampling — the end-to-end shape of a real mixture-shaped training
    set build."""
    prepped = corpus_prep_frame(_t(spark, sf, "documents"))
    band = F.when(F.col("quality_milli") >= 700, F.lit("hi")).otherwise(F.lit("lo"))
    out = SAMP.sample_stratified(prepped, band, "doc_id", {"hi": 1000, "lo": 400})
    return out.select(
        "doc_id", "quality_milli", "n_tokens", "n_bpe",
        F.col("_stratum").alias("band"), F.col("_bucket").alias("bucket"),
    )


@q(
    "text_quality_score",
    "WITH t AS (SELECT doc_id, text, list_filter(string_split(text, ' '), x -> x <> '') AS tk"
    " FROM documents), c AS (SELECT doc_id,"
    f" (len(list_filter(tk, x -> x IN {_STOP_SQL})) * 1000) // len(tk) AS stop_m,"
    " (length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1000) // length(text) AS alpha_m,"
    " CASE WHEN len(tk) BETWEEN 20 AND 1000 THEN 1000 ELSE 200 END AS len_m FROM t)"
    " SELECT doc_id, (stop_m + alpha_m + len_m) // 3 AS quality_milli FROM c",
)
def text_quality_score(spark, sf):
    d = _t(spark, sf, "documents")
    return d.select("doc_id", T.quality_score_milli(F.col("text")).alias("quality_milli"))


# ------------------------------------------------------------ streaming
# The streaming front-end's windowed per-host metric, driven as a batch
# query (same plan Structured Streaming runs incrementally).


@q(
    "stream_host_rate_metrics",
    "WITH c AS (SELECT 'https://host' || (user_id % 20) || '.example/e/' || event_id AS url,"
    " (event_id % 3)::INT AS priority, ts FROM events)"
    " SELECT date_trunc('minute', ts) AS window_start,"
    " date_trunc('minute', ts) + INTERVAL 1 MINUTE AS window_end,"
    " 'host' || (CAST(regexp_extract(url, 'host([0-9]+)', 1) AS BIGINT)) || '.example' AS host,"
    " count(*) AS n_urls, min(priority) AS top_priority"
    " FROM c GROUP BY 1, 2, 3",
)
def stream_host_rate_metrics(spark, sf):
    from .streaming.frontier_stream import host_rate_metrics

    e = _t(spark, sf, "events")
    cand = e.select(
        F.concat(
            F.lit("https://host"), F.pmod("user_id", F.lit(20)).cast("string"),
            F.lit(".example/e/"), F.col("event_id").cast("string"),
        ).alias("url"),
        F.pmod("event_id", F.lit(3)).cast("int").alias("priority"),
        F.col("ts").alias("discovered_ts"),
    )
    return host_rate_metrics(cand)


# ----------------------------------------------------------- multimodal
# Media = opaque BINARY blobs + typed metadata (operators/multimodal.py).
# The synthetic blob is the document's UTF-8 bytes and the corpus is
# ASCII, so every byte-level quantity is reproducible in the oracle via
# char arithmetic.

_KIND_SQL = (
    "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"
)


@q(
    "mm_media_meta",
    f"SELECT doc_id AS media_id, {_KIND_SQL} AS kind,"
    f" 'x-fake/' || {_KIND_SQL} AS mime,"
    " length(text) AS n_bytes,"
    " (doc_id % 640 + 1) AS declared_w, (doc_id % 480 + 1) AS declared_h"
    " FROM documents",
)
def mm_media_meta(spark, sf):
    m = MM.synth_media(_t(spark, sf, "documents"))
    return m.select(
        "media_id", "kind", "mime",
        F.length("blob").alias("n_bytes"), "declared_w", "declared_h",
    )


@q(
    "mm_decode_fake",
    f"SELECT doc_id AS media_id, {_KIND_SQL} AS kind,"
    " (doc_id % 640 + 1) AS width, (doc_id % 480 + 1) AS height,"
    " length(text) AS n_bytes,"
    " COALESCE(ascii(substring(text, 1, 1)), 0) AS first_byte,"
    " CAST(COALESCE(list_aggregate(list_transform(string_split(text, ''),"
    "   x -> ascii(x)), 'sum'), 0) AS BIGINT) AS byte_sum"
    " FROM documents",
)
def mm_decode_fake(spark, sf):
    return MM.decode_media(MM.synth_media(_t(spark, sf, "documents")), codec="fake")


@q(
    "mm_frame_sample",
    "WITH v AS (SELECT doc_id AS media_id, text FROM documents"
    " WHERE doc_id % 3 = 2 AND length(text) >= 64),"
    " f AS (SELECT media_id, text,"
    "  unnest(range(0, length(text) // 64, 4)) AS frame_no FROM v)"
    " SELECT media_id, frame_no,"
    " md5(substring(text, (frame_no * 64 + 1)::INT, 64)) AS frame_md5 FROM f",
)
def mm_frame_sample(spark, sf):
    m = MM.synth_media(_t(spark, sf, "documents"))
    return MM.sample_frames(m, frame_bytes=64, every_n=4)


@q(
    "mm_byte_histogram",
    "WITH c AS (SELECT doc_id AS media_id,"
    " list_transform(string_split(text, ''), x -> ascii(x)) AS codes"
    " FROM documents)"
    " SELECT media_id, "
    + ", ".join(
        f"len(list_filter(codes, x -> x // 32 = {i}))::BIGINT AS b{i}"
        for i in range(8)
    )
    + " FROM c",
)
def mm_byte_histogram(spark, sf):
    h = MM.byte_histogram(MM.synth_media(_t(spark, sf, "documents")), bins=8)
    return h.select(
        "media_id", *[F.element_at("hist", i + 1).alias(f"b{i}") for i in range(8)]
    )


@q(
    "mm_resize_checksum",
    # corpus min length (48) exceeds the 32-byte target, so the cycled
    # fake resize reduces to a truncation — md5(first 32 chars).
    "SELECT doc_id AS media_id, 32 AS n_bytes,"
    " md5(substring(text, 1, 32)) AS blob_md5 FROM documents",
)
def mm_resize_checksum(spark, sf):
    r = MM.resize_media(MM.synth_media(_t(spark, sf, "documents")), out_w=8, out_h=4)
    return r.select(
        "media_id", F.length("blob").alias("n_bytes"), F.md5("blob").alias("blob_md5")
    )


# Average-hash (aHash) perceptual fingerprint: bits are exposed to the
# oracle as 4x16-bit chunk columns (never assembling bit 63 into a
# signed BIGINT literal), the same convention as the SimHash oracle.
_AHASH_BITS = 64


def _ahash_bit_sql(i: int) -> str:
    cell = (
        f"COALESCE(list_sum(codes[({i}*n)//{_AHASH_BITS}+1 :"
        f" (({i}+1)*n)//{_AHASH_BITS}]), 0)"
    )
    ln = f"((({i}+1)*n)//{_AHASH_BITS} - ({i}*n)//{_AHASH_BITS})"
    return f"(CASE WHEN {cell} * n > total * {ln} THEN 1 ELSE 0 END)"


def _ahash_chunk_sql(chunks: int = 4) -> str:
    width = _AHASH_BITS // chunks
    return ", ".join(
        "CAST("
        + " + ".join(f"{_ahash_bit_sql(c * width + r)} * {1 << r}" for r in range(width))
        + f" AS BIGINT) AS c{c}"
        for c in range(chunks)
    )


@q(
    "mm_ahash_fingerprint",
    "WITH c AS (SELECT doc_id AS media_id,"
    " list_transform(string_split(text,''), x -> ascii(x)) AS codes,"
    " length(text) AS n FROM documents),"
    " t AS (SELECT media_id, codes, n,"
    " CAST(COALESCE(list_sum(codes),0) AS BIGINT) AS total FROM c)"
    f" SELECT media_id, {_ahash_chunk_sql()} FROM t",
)
def mm_ahash_fingerprint(spark, sf):
    """Average-hash perceptual fingerprint of every media blob, exposed
    as 16-bit chunks (the blocking keys of the near-pair search)."""
    fp = MM.ahash_fingerprints(MM.synth_media(_t(spark, sf, "documents")))
    return fp.select(
        "media_id",
        *[
            F.shiftrightunsigned("ahash", 16 * c)
            .bitwiseAND(F.lit(0xFFFF))
            .cast("long")
            .alias(f"c{c}")
            for c in range(4)
        ],
    )


@q(
    "mm_ahash_near_pairs",
    # Watermarked-copy scenario: every 5th document gets a twin blob
    # with one byte rewritten; aHash must pair each twin with its
    # source at hamming <= 3.  Oracle replays hash + all-pairs exactly.
    "WITH base AS (SELECT doc_id*2 AS media_id, text FROM documents"
    " UNION ALL SELECT doc_id*2+1 AS media_id, 'z' || substring(text, 2) AS text"
    " FROM documents WHERE doc_id % 5 = 0),"
    " c AS (SELECT media_id,"
    " list_transform(string_split(text,''), x -> ascii(x)) AS codes,"
    " length(text) AS n FROM base),"
    " t AS (SELECT media_id, codes, n,"
    " CAST(COALESCE(list_sum(codes),0) AS BIGINT) AS total FROM c),"
    f" f AS (SELECT media_id, {_ahash_chunk_sql()} FROM t),"
    " p AS (SELECT x.media_id AS media_a, y.media_id AS media_b,"
    " CAST(bit_count(xor(x.c0, y.c0)) + bit_count(xor(x.c1, y.c1))"
    " + bit_count(xor(x.c2, y.c2)) + bit_count(xor(x.c3, y.c3)) AS BIGINT)"
    " AS hamming FROM f x JOIN f y ON x.media_id < y.media_id)"
    " SELECT media_a, media_b, hamming FROM p WHERE hamming <= 3",
)
def mm_ahash_near_pairs(spark, sf):
    """Perceptual near-dup pairs over blobs (aHash + pigeonhole
    blocking + exact Hamming confirm) on a corpus with planted
    one-byte-perturbed twins."""
    docs = _t(spark, sf, "documents")
    base = docs.select((F.col("doc_id") * 2).alias("media_id"), "text")
    twins = docs.where(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") * 2 + 1).alias("media_id"),
        F.concat(F.lit("z"), F.expr("substring(text, 2)")).alias("text"),
    )
    media = base.unionAll(twins).select(
        "media_id", F.encode("text", "UTF-8").alias("blob")
    )
    return MM.ahash_near_pairs(media, max_hamming=3, chunks=4)


# ------------------------------------------------- robots.txt (RFC 9309)

# Both entries synthesize robots bodies / frontier URLs deterministically
# from ``documents`` (20 hosts, 6 path shapes), run the real parser/gate
# on the Spark side, and check against an ANALYTICALLY derived truth
# table in SQL — the oracle re-derives the RFC-9309 longest-match
# verdicts by hand from the synthesis parameters, so the two sides share
# no code at all.
#
# Body for host h (hosts h0..h19.example):
#   [h%3==0 only]  User-agent: podbot / Disallow: /p / Allow: /p/ok
#   [always]       User-agent: * / Disallow: /*.json$ / Allow: /a*
#                  / Disallow: /a/x

def _robots_corpus(spark, sf):
    d = _t(spark, sf, "documents")
    hosts = d.select(F.pmod("doc_id", F.lit(20)).alias("h")).distinct()
    podbot_grp = "User-agent: podbot\nDisallow: /p\nAllow: /p/ok\n"
    star_grp = "User-agent: *\nDisallow: /*.json$\nAllow: /a*\nDisallow: /a/x"
    return hosts.select(
        F.concat(F.lit("h"), F.col("h").cast("string"), F.lit(".example")).alias("host"),
        F.concat(
            F.when(F.pmod("h", F.lit(3)) == 0, F.lit(podbot_grp)).otherwise(F.lit("")),
            F.lit(star_grp),
        ).alias("body"),
    )


@q(
    "robots_parse_rules",
    "WITH hosts AS (SELECT DISTINCT doc_id % 20 AS h FROM documents),"
    " r AS ("
    "  SELECT h, 'podbot' AS agent, 'disallow' AS rule, '/p' AS path, 1 AS ln"
    "   FROM hosts WHERE h % 3 = 0"
    "  UNION ALL SELECT h, 'podbot', 'allow', '/p/ok', 2 FROM hosts WHERE h % 3 = 0"
    "  UNION ALL SELECT h, '*', 'disallow', '/*.json$',"
    "   CASE WHEN h % 3 = 0 THEN 4 ELSE 1 END FROM hosts"
    "  UNION ALL SELECT h, '*', 'allow', '/a*',"
    "   CASE WHEN h % 3 = 0 THEN 5 ELSE 2 END FROM hosts"
    "  UNION ALL SELECT h, '*', 'disallow', '/a/x',"
    "   CASE WHEN h % 3 = 0 THEN 6 ELSE 3 END FROM hosts)"
    " SELECT 'h' || h || '.example' AS host, agent, rule, path,"
    " CAST(ln AS BIGINT) AS line_no FROM r",
)
def robots_parse_rules_q(spark, sf):
    """Full RFC-9309 parse (agent blocks, shared rules, line numbers)
    vs the hand-derived rule table (operators/robots.py)."""
    return RB.parse_robots_rules(_robots_corpus(spark, sf))


@q(
    "robots_gate_rfc",
    "SELECT doc_id,"
    " 'https://h' || (doc_id % 20) || '.example' ||"
    " CASE doc_id % 6 WHEN 0 THEN '/p/z' WHEN 1 THEN '/p/ok/z'"
    "  WHEN 2 THEN '/a/x/y' WHEN 3 THEN '/d/f.json'"
    "  WHEN 4 THEN '/d/f.jsonx' ELSE '/free' END AS fetch_url,"
    # hand-derived RFC-9309 verdicts: podbot hosts (h%3=0) use ONLY the
    # podbot group ('/p' disallow beaten by longer '/p/ok' allow); star
    # hosts use the * group ('/a/x' disallow outranks '/a*' allow;
    # '$' anchors '.json' but not '.jsonx').
    " CASE doc_id % 6"
    "  WHEN 0 THEN (doc_id % 20) % 3 <> 0"
    "  WHEN 2 THEN (doc_id % 20) % 3 = 0"
    "  WHEN 3 THEN (doc_id % 20) % 3 = 0"
    "  ELSE TRUE END AS allowed"
    " FROM documents",
)
def robots_gate_rfc(spark, sf):
    """Longest-match Allow/Disallow gate with agent-group selection,
    wildcard + ``$`` patterns (operators/robots.py:robots_gate)."""
    d = _t(spark, sf, "documents")
    rules = RB.parse_robots_rules(_robots_corpus(spark, sf))
    path = (
        F.when(F.pmod("doc_id", F.lit(6)) == 0, F.lit("/p/z"))
        .when(F.pmod("doc_id", F.lit(6)) == 1, F.lit("/p/ok/z"))
        .when(F.pmod("doc_id", F.lit(6)) == 2, F.lit("/a/x/y"))
        .when(F.pmod("doc_id", F.lit(6)) == 3, F.lit("/d/f.json"))
        .when(F.pmod("doc_id", F.lit(6)) == 4, F.lit("/d/f.jsonx"))
        .otherwise(F.lit("/free"))
    )
    frontier = d.select(
        "doc_id",
        F.concat(
            F.lit("https://h"),
            F.pmod("doc_id", F.lit(20)).cast("string"),
            F.lit(".example"),
            path,
        ).alias("fetch_url"),
    )
    return RB.robots_gate(frontier, rules, "podbot", keep_decision=True)


# ------------------------------------------- sequence packing / indexing


@q(
    "pack_sequences",
    "WITH t AS (SELECT doc_id,"
    " len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT AS toks"
    " FROM documents),"
    " p AS (SELECT doc_id, toks, COALESCE(SUM(toks) OVER ("
    "  ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),"
    "  0)::BIGINT AS s FROM t WHERE toks > 0),"
    " e AS (SELECT doc_id, toks, s,"
    "  UNNEST(generate_series(s // 256, (s + toks - 1) // 256)) AS chunk_id"
    "  FROM p)"
    " SELECT doc_id, chunk_id,"
    " CAST(GREATEST(0, chunk_id * 256 - s) AS BIGINT) AS doc_off,"
    " CAST(LEAST(s + toks - 1, chunk_id * 256 + 255)"
    "  - (s + GREATEST(0, chunk_id * 256 - s)) + 1 AS BIGINT) AS seg_len"
    " FROM e",
)
def pack_sequences(spark, sf):
    """Concat-and-chunk training-sequence packing at 256 tokens/chunk.
    The oracle's single global window IS the thing the distributed
    two-phase prefix sum replaces (operators/packing.py)."""
    d = _t(spark, sf, "documents")
    toks = d.select("doc_id", T.token_count_ws(F.col("text")).alias("toks"))
    return PK.pack_training_chunks(
        toks, "toks", budget=256, order_col="doc_id", n_buckets=8
    )


@q(
    "text_tfidf_topk",
    "WITH toks AS (SELECT doc_id,"
    " UNNEST(list_filter(string_split(text, ' '), x -> x <> '')) AS term"
    " FROM documents),"
    " tfq AS (SELECT doc_id, term, COUNT(*)::BIGINT AS tf"
    "  FROM toks GROUP BY doc_id, term),"
    " dfq AS (SELECT term, COUNT(*)::BIGINT AS df FROM tfq GROUP BY term),"
    " m AS (SELECT COUNT(DISTINCT doc_id)::BIGINT AS n FROM documents),"
    " sc AS (SELECT doc_id, tfq.term AS term, tf,"
    "  (tf * ((n * 1000) // df))::BIGINT AS score"
    "  FROM tfq JOIN dfq ON tfq.term = dfq.term CROSS JOIN m),"
    " r AS (SELECT doc_id, term, tf, score, (ROW_NUMBER() OVER ("
    "  PARTITION BY doc_id ORDER BY score DESC, term ASC))::BIGINT AS rk"
    "  FROM sc)"
    " SELECT doc_id, term, tf, score, rk FROM r WHERE rk <= 5",
)
def text_tfidf_topk(spark, sf):
    """Top-5 terms per doc by integer TF-IDF — rank-preserving scaled
    ratio instead of libm ln so both engines byte-match
    (operators/tfidf.py)."""
    return TI.tfidf_topk(_t(spark, sf, "documents"), k=5, idf_scale=1000)


# Deterministic host link graph for PageRank: src = doc_id % 20, dst
# mixes in doc_id div 20 so each host links to many others; host 13's
# out-edges are dropped so the dangling-mass path is exercised.
_PR_EDGES_SQL = (
    "SELECT DISTINCT doc_id % 20 AS src,"
    " (doc_id // 20 + 7 * (doc_id % 20) + 3) % 20 AS dst FROM documents"
    " WHERE doc_id % 20 <> (doc_id // 20 + 7 * (doc_id % 20) + 3) % 20"
    " AND doc_id % 20 <> 13"
)


def _pagerank_oracle(iters: int = 3, scale: int = 10**12, d: int = 850) -> str:
    """Unrolled power iteration in ANSI SQL — one (incoming, dangling,
    score) CTE triple per iteration, floor division throughout, exactly
    the update rule of operators/graph.py:pagerank."""
    parts = [
        f"WITH e AS ({_PR_EDGES_SQL})",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst AS node FROM e)",
        "deg AS (SELECT src, COUNT(*)::BIGINT AS od FROM e GROUP BY src)",
        "m AS (SELECT COUNT(*)::BIGINT AS n FROM nodes)",
        f"s0 AS (SELECT node, ({scale} // n)::BIGINT AS sc FROM nodes, m)",
    ]
    for k in range(1, iters + 1):
        p = f"s{k - 1}"
        parts.append(
            f"i{k} AS (SELECT dst AS node, SUM(sc // od)::BIGINT AS inc"
            f" FROM e JOIN {p} ON e.src = {p}.node"
            f" JOIN deg ON e.src = deg.src GROUP BY dst)"
        )
        parts.append(
            f"d{k} AS (SELECT COALESCE(SUM(sc), 0)::BIGINT AS dang"
            f" FROM {p} WHERE node NOT IN (SELECT src FROM e))"
        )
        parts.append(
            f"s{k} AS (SELECT nodes.node,"
            f" (({1000 - d}) * ({scale} // n)"
            f" + {d} * (COALESCE(inc, 0) + dang // n)) // 1000 AS sc"
            f" FROM nodes CROSS JOIN m CROSS JOIN d{k}"
            f" LEFT JOIN i{k} ON nodes.node = i{k}.node)"
        )
    return (
        ", ".join(parts)
        + f" SELECT node AS host, sc::BIGINT AS rank_scaled FROM s{iters}"
    )


@q("graph_pagerank", _pagerank_oracle(iters=3))
def graph_pagerank(spark, sf):
    """3-iteration integer PageRank over the synthetic host link graph
    vs the fully unrolled SQL power iteration (operators/graph.py)."""
    d = _t(spark, sf, "documents")
    edges = d.select(
        F.expr("doc_id % 20").alias("src"),
        F.expr("(doc_id div 20 + 7 * (doc_id % 20) + 3) % 20").alias("dst"),
    ).where("src <> dst AND src <> 13")
    return G.pagerank(edges, iterations=3).select(
        F.col("node").alias("host"), "rank_scaled"
    )


# --------------------------------------------- host & link-graph hygiene


@q(
    "domains_registrable",
    # analytically derived truth table: each host class maps to a known
    # public suffix (longest listed match, or last label when unlisted)
    # and registrable domain (one label more; NULL when host == suffix)
    "SELECT DISTINCT"
    " CASE doc_id % 5"
    "  WHEN 0 THEN 'a' || (doc_id % 7) || '.b.shop.co.uk'"
    "  WHEN 1 THEN 's' || (doc_id % 7) || '.example'"
    "  WHEN 2 THEN 'blog' || (doc_id % 7) || '.io'"
    "  WHEN 3 THEN 'x.y' || (doc_id % 7) || '.weird.zz'"
    "  ELSE 'uk' END AS host,"
    " CASE doc_id % 5 WHEN 0 THEN 'co.uk' WHEN 1 THEN 'example'"
    "  WHEN 2 THEN 'io' WHEN 3 THEN 'zz' ELSE 'uk' END AS public_suffix,"
    " CASE doc_id % 5"
    "  WHEN 0 THEN 'shop.co.uk'"
    "  WHEN 1 THEN 's' || (doc_id % 7) || '.example'"
    "  WHEN 2 THEN 'blog' || (doc_id % 7) || '.io'"
    "  WHEN 3 THEN 'weird.zz'"
    "  ELSE NULL END AS registrable_domain"
    " FROM documents",
)
def domains_registrable(spark, sf):
    """Public-suffix longest match over synthesized hosts vs the
    hand-derived class table (operators/domains.py).  Covers: multi-
    label listed suffix beating its shorter suffix (co.uk > uk),
    single-label suffix, unlisted TLD fallback, host == suffix."""
    d = _t(spark, sf, "documents")
    m5, m7 = F.pmod("doc_id", F.lit(5)), F.pmod("doc_id", F.lit(7)).cast("string")
    host = (
        F.when(m5 == 0, F.concat(F.lit("a"), m7, F.lit(".b.shop.co.uk")))
        .when(m5 == 1, F.concat(F.lit("s"), m7, F.lit(".example")))
        .when(m5 == 2, F.concat(F.lit("blog"), m7, F.lit(".io")))
        .when(m5 == 3, F.concat(F.lit("x.y"), m7, F.lit(".weird.zz")))
        .otherwise(F.lit("uk"))
    )
    hosts = d.select(host.alias("host")).distinct()
    suffixes = spark.createDataFrame(
        [("com",), ("co.uk",), ("uk",), ("io",), ("example",)], "suffix string"
    )
    return DOM.registrable_domains(hosts, suffixes)


@q(
    "html_link_extract",
    # the synthesized page holds 3 double-quoted links (absolute,
    # root-relative, protocol-relative), 1 single-quoted relative link,
    # and 2 noise links (#fragment, javascript:) that must vanish;
    # extraction order is dq-pass then sq-pass, each in document order
    "WITH j AS (SELECT doc_id, p FROM documents"
    " CROSS JOIN generate_series(0, 3) t(p))"
    " SELECT doc_id, CAST(p AS BIGINT) AS pos, CASE p"
    "  WHEN 0 THEN 'https://ext' || (doc_id % 9) || '.example/abs'"
    "  WHEN 1 THEN 'https://h' || (doc_id % 20) || '.example/root/p' || doc_id"
    "  WHEN 2 THEN 'https://cdn' || (doc_id % 3) || '.example/c'"
    "  WHEN 3 THEN 'https://h' || (doc_id % 20) || '.example/dir/rel/'"
    "   || doc_id || '.html'"
    "  END AS url FROM j",
)
def html_link_extract(spark, sf):
    """<a href> extraction + relative resolution against the page URL
    (functions/urls.py:extract_hrefs/resolve_href), predicted
    analytically by the oracle."""
    d = _t(spark, sf, "documents")
    did = F.col("doc_id").cast("string")
    base = F.concat(
        F.lit("https://h"),
        F.pmod("doc_id", F.lit(20)).cast("string"),
        F.lit(".example/dir/page"),
        did,
        F.lit(".html"),
    )
    html = F.concat(
        F.lit('<html><a class="x" href="https://ext'),
        F.pmod("doc_id", F.lit(9)).cast("string"),
        F.lit('.example/abs">t</a><a href="/root/p'),
        did,
        F.lit('">r</a><a href="#frag">n</a><a href="//cdn'),
        F.pmod("doc_id", F.lit(3)).cast("string"),
        F.lit(".example/c\">p</a><a href='rel/"),
        did,
        F.lit(".html'>q</a><a href=\"javascript:void(0)\">j</a></html>"),
    )
    t = d.select("doc_id", base.alias("_base"), U.extract_hrefs(html).alias("_hrefs"))
    return t.select(
        "doc_id", F.posexplode("_hrefs").alias("pos", "_raw"), "_base"
    ).select(
        "doc_id",
        F.col("pos").cast("long").alias("pos"),
        U.resolve_href(F.col("_raw"), F.col("_base")).alias("url"),
    )


# The composite frontier-prep chain, end to end: page HTML -> link
# extraction -> relative resolution -> canonicalization -> RFC-9309
# robots gate -> Bloom-gated exact seen-set anti-join -> sampling-free
# per-host rank -> per-host cap.  The oracle re-derives every stage
# analytically: link1 (/p/<doc> on the doc's own host) survives iff the
# host is a star-group host (podbot hosts disallow /p) and the doc is
# not in the seen set (doc%4==0 seeds it); link2 (/a/x/<doc%10> on host
# (doc+7)%20, only 20 distinct URLs corpus-wide — the dedup is real)
# survives iff the TARGET host is a podbot host (its podbot group has
# no /a rule; star hosts hit the longest-match /a/x disallow).  The
# rank key is an order-aligned surrogate in the hash slot (u5's trick:
# any monotone long keeps hash_bucketed_host_rank's bucket order).
@q(
    "frontier_prep_pipeline",
    "WITH url1 AS (SELECT 'https://h' || (doc_id % 20) || '.example/p/' || doc_id"
    "  AS fetch_url, doc_id % 20 AS h, doc_id AS k FROM documents"
    "  WHERE (doc_id % 20) % 3 <> 0 AND doc_id % 4 <> 0),"
    " url2 AS (SELECT DISTINCT 'https://h' || ((doc_id + 7) % 20)"
    "  || '.example/a/x/' || (doc_id % 10) AS fetch_url,"
    "  (doc_id + 7) % 20 AS h, doc_id % 10 AS k FROM documents"
    "  WHERE ((doc_id + 7) % 20) % 3 = 0),"
    " cand AS (SELECT * FROM url1 UNION SELECT * FROM url2),"
    " r AS (SELECT 'h' || h || '.example' AS host, fetch_url,"
    "  ROW_NUMBER() OVER (PARTITION BY h ORDER BY k, fetch_url) AS rn FROM cand)"
    " SELECT host, fetch_url, CAST(rn AS BIGINT) AS rn FROM r WHERE rn <= 3",
)
def frontier_prep_pipeline(spark, sf):
    """Full frontier preparation as ONE lazy plan over the real
    operators (extract_hrefs/resolve_href/canonicalize_url ->
    robots_gate -> bloom_gated_anti_join -> hash_bucketed_host_rank)."""
    from .operators.bloom import bloom_gated_anti_join, build_bloom_shards
    from .operators.politeness import hash_bucketed_host_rank

    d = _t(spark, sf, "documents")
    did = F.col("doc_id").cast("string")
    m = F.pmod("doc_id", F.lit(20))
    base = F.concat(
        F.lit("https://h"), m.cast("string"), F.lit(".example/dir/idx"), did,
        F.lit(".html"),
    )
    o = F.pmod(F.col("doc_id") + 7, F.lit(20))
    html = F.concat(
        F.lit('<p><a href="/p/'), did,
        F.lit('">x</a><a href="https://h'), o.cast("string"),
        F.lit(".example/a/x/"), F.pmod("doc_id", F.lit(10)).cast("string"),
        F.lit('">y</a><a href="#skip">n</a></p>'),
    )
    pages = d.select(base.alias("_base"), U.extract_hrefs(html).alias("_h"))
    cand = (
        pages.select(F.explode("_h").alias("_raw"), "_base")
        .select(
            U.canonicalize_url(
                U.resolve_href(F.col("_raw"), F.col("_base"))
            ).alias("fetch_url")
        )
        .distinct()
    )
    allowed = RB.robots_gate(cand, RB.parse_robots_rules(_robots_corpus(spark, sf)), "podbot")
    seen = d.where(F.pmod("doc_id", F.lit(4)) == 0).select(
        F.concat(
            F.lit("https://h"), m.cast("string"), F.lit(".example/p/"), did
        ).alias("fetch_url")
    )
    bloom = build_bloom_shards(seen, "fetch_url", n_shards=8, m_bits=1 << 15, k=5)
    fresh = bloom_gated_anti_join(allowed, seen, bloom, "fetch_url")
    f = fresh.select(
        "fetch_url",
        U.host_of(F.col("fetch_url")).alias("host"),
        F.lit(0).alias("priority"),
        F.shiftleft(
            F.regexp_extract("fetch_url", r"([0-9]+)$", 1).cast("long"), 40
        ).alias("_uh"),
    )
    ranked = hash_bucketed_host_rank(f, "host", "priority", "_uh", "fetch_url", out_col="rn")
    return ranked.where(F.col("rn") <= 3).select(
        "host", "fetch_url", F.col("rn").cast("long").alias("rn")
    )


# Boilerplate line removal (CCNet/RefinedWeb line-level dedup).  The
# demo corpus wraps each real document in synthetic host chrome: a nav
# line every page on the host shares (df=100%, removed at 600‰), a
# footer that 70% of the host's pages carry ('(c) hN', removed) or a
# promo line on the other 30% (kept), around the page-unique prose
# (kept).  The oracle runs the identical line-df algorithm in SQL.
@q(
    "text_boilerplate_strip",
    "WITH base AS (SELECT doc_id, 'h' || (doc_id % 7) AS host,"
    "  'NAV MENU h' || (doc_id % 7) || chr(10) || text || chr(10) ||"
    "  CASE WHEN doc_id % 10 < 7 THEN '(c) h' || (doc_id % 7)"
    "       ELSE 'promo h' || (doc_id % 7) END AS t FROM documents),"
    " lines AS (SELECT doc_id, host, u.pos AS pos, u.ln AS ln FROM ("
    "  SELECT doc_id, host, unnest(list_transform(string_split(t, chr(10)),"
    "   (x, i) -> {'pos': i, 'ln': x})) AS u FROM base) s),"
    " ldf AS (SELECT host, ln, COUNT(DISTINCT doc_id) AS df_ FROM lines"
    "  GROUP BY host, ln),"
    " n AS (SELECT host, COUNT(*) AS nd FROM base GROUP BY host),"
    " freq AS (SELECT ldf.host, ldf.ln FROM ldf JOIN n USING (host)"
    "  WHERE ldf.df_ * 1000 >= 600 * n.nd)"
    " SELECT l.doc_id,"
    "  COALESCE(string_agg(CASE WHEN f.ln IS NULL THEN l.ln END,"
    "   chr(10) ORDER BY l.pos), '') AS clean_text,"
    "  COUNT(*) AS n_lines, CAST(COUNT(f.ln) AS BIGINT) AS removed"
    " FROM lines l LEFT JOIN freq f ON l.host = f.host AND l.ln = f.ln"
    " GROUP BY l.doc_id",
)
def text_boilerplate_strip(spark, sf):
    """CCNet-style per-host boilerplate line removal
    (operators/boilerplate.py) over host-chromed documents."""
    from .operators.boilerplate import strip_boilerplate_lines

    d = _t(spark, sf, "documents")
    h = F.concat(F.lit("h"), F.pmod("doc_id", F.lit(7)).cast("string"))
    footer = F.when(
        F.pmod("doc_id", F.lit(10)) < 7, F.concat(F.lit("(c) "), h)
    ).otherwise(F.concat(F.lit("promo "), h))
    demo = d.select(
        "doc_id",
        h.alias("host"),
        F.concat(
            F.lit("NAV MENU "), h, F.lit("\n"), F.col("text"), F.lit("\n"), footer
        ).alias("text"),
    )
    return strip_boilerplate_lines(demo, threshold_milli=600)


# WARC ingest + CDX index.  Spark path: synthesize real concatenated
# WARC bytes from documents (sources/warc.py), parse them back with the
# Content-Length-driven sequential scanner in mapInPandas, emit the
# random-access index.  The oracle never parses: it reconstructs each
# record string, takes octet_length, and derives offsets analytically
# with a window sum — so a parser off-by-one anywhere (magic, header
# CRLFs, trailer) breaks the hash match.
@q(
    "warc_cdx_index",
    "WITH c AS (SELECT chr(13) || chr(10) AS lf),"
    " r AS (SELECT doc_id, doc_id % 32 AS file_id,"
    "  'https://h' || (doc_id % 20) || '.example/p/' || doc_id AS target_uri,"
    "  CAST(strlen(text) AS BIGINT) AS content_length,"
    "  md5(text) AS payload_md5,"
    "  'WARC/1.0' || lf || 'WARC-Type: response' || lf"
    "   || 'WARC-Target-URI: https://h' || (doc_id % 20) || '.example/p/'"
    "   || doc_id || lf || 'Content-Length: '"
    "   || CAST(strlen(text) AS VARCHAR) || lf || lf || text || lf || lf"
    "   AS rec FROM documents, c)"
    " SELECT target_uri, file_id,"
    "  CAST(COALESCE(SUM(strlen(rec)) OVER (PARTITION BY file_id"
    "   ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),"
    "   0) AS BIGINT) AS rec_offset,"
    "  CAST(strlen(rec) AS BIGINT) AS rec_length,"
    "  content_length, payload_md5 FROM r",
)
def warc_cdx_index(spark, sf):
    """WARC bytes -> sequential record parse -> CDX index
    (sources/warc.py)."""
    from .sources.warc import cdx_index, parse_warc_records, synth_warc_files

    files = synth_warc_files(_t(spark, sf, "documents"), n_files=32)
    return cdx_index(parse_warc_records(files))


# Adaptive recrawl scheduling (operators/recrawl.py).  Synthetic fetch
# history: doc_id%5+1 observations per URL (the %5==0 docs exercise the
# single-observation NULL-rate path), fingerprint (wave*(doc_id%5))div 4
# so per-URL change rates span never/sometimes/always.  Oracle replays
# the lag-window change count and the integer interval blend.
@q(
    "crawl_revisit_schedule",
    "WITH h0 AS (SELECT doc_id,"
    "  unnest(generate_series(0, doc_id % 5)) AS wave FROM documents),"
    " h AS (SELECT 'https://h' || (doc_id % 20) || '.example/p/' || doc_id"
    "   AS url, wave, (wave * (doc_id % 5)) // 4 AS fp FROM h0),"
    " f AS (SELECT url, wave, fp,"
    "   lag(fp) OVER (PARTITION BY url ORDER BY wave) AS pfp FROM h),"
    " a AS (SELECT url, COUNT(*) AS n_obs,"
    "   CAST(SUM(CASE WHEN pfp IS NOT NULL AND pfp <> fp THEN 1 ELSE 0 END)"
    "    AS BIGINT) AS n_changes, MAX(wave) AS lastw FROM f GROUP BY url)"
    " SELECT url, n_obs, n_changes,"
    "  COALESCE(CASE WHEN n_obs > 1 THEN (1000 * n_changes) // (n_obs - 1)"
    "   END, -1) AS change_milli,"
    "  CAST(CASE WHEN n_obs > 1 THEN 16 - (15 * ((1000 * n_changes)"
    "   // (n_obs - 1))) // 1000 ELSE 1 END AS BIGINT) AS next_interval,"
    "  CAST(lastw + (CASE WHEN n_obs > 1 THEN 16 - (15 * ((1000 * n_changes)"
    "   // (n_obs - 1))) // 1000 ELSE 1 END) AS BIGINT) AS next_due FROM a",
)
def crawl_revisit_schedule(spark, sf):
    """Change-rate-adaptive revisit intervals over a synthetic fetch
    log (operators/recrawl.py:revisit_schedule)."""
    from .operators.recrawl import revisit_schedule

    d = _t(spark, sf, "documents")
    hist = d.select(
        F.concat(
            F.lit("https://h"), F.pmod("doc_id", F.lit(20)).cast("string"),
            F.lit(".example/p/"), F.col("doc_id").cast("string"),
        ).alias("url"),
        F.explode(F.sequence(F.lit(0), F.pmod("doc_id", F.lit(5)))).alias("wave"),
        F.pmod("doc_id", F.lit(5)).alias("_m"),
    ).select("url", "wave", F.expr("(wave * _m) div 4").alias("fingerprint"))
    out = revisit_schedule(hist, min_interval=1, max_interval=16)
    # -1 sentinel for "no observed rate" so the oracle compare sorts
    return out.withColumn(
        "change_milli", F.coalesce("change_milli", F.lit(-1).cast("long"))
    )


# Crawl snapshot diff: wave N vs wave N+1 membership/fingerprint
# compare.  %11==0 docs are absent from the old snapshot ("new"),
# %7==0 absent from the new one ("gone"), %3==0 get a bumped
# fingerprint ("changed"), the rest "same".  Overlapping residues
# (e.g. doc 21: %7 and %3) keep the precedence honest: membership
# beats fingerprint.
@q(
    "crawl_snapshot_diff",
    "WITH o AS (SELECT 'https://h' || (doc_id % 20) || '.example/p/' || doc_id"
    "   AS url, doc_id // 5 AS fp FROM documents WHERE doc_id % 11 <> 0),"
    " n AS (SELECT 'https://h' || (doc_id % 20) || '.example/p/' || doc_id"
    "   AS url, doc_id // 5 + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END"
    "   AS fp FROM documents WHERE doc_id % 7 <> 0)"
    " SELECT COALESCE(o.url, n.url) AS url,"
    "  CASE WHEN o.url IS NULL THEN 'new' WHEN n.url IS NULL THEN 'gone'"
    "   WHEN o.fp <> n.fp THEN 'changed' ELSE 'same' END AS status"
    " FROM o FULL OUTER JOIN n ON o.url = n.url",
)
def crawl_snapshot_diff(spark, sf):
    """Two-snapshot URL diff (operators/recrawl.py:snapshot_diff)."""
    from .operators.recrawl import snapshot_diff

    d = _t(spark, sf, "documents")
    url = F.concat(
        F.lit("https://h"), F.pmod("doc_id", F.lit(20)).cast("string"),
        F.lit(".example/p/"), F.col("doc_id").cast("string"),
    )
    old = d.where(F.pmod("doc_id", F.lit(11)) != 0).select(
        url.alias("url"), F.expr("doc_id div 5").alias("fingerprint")
    )
    new = d.where(F.pmod("doc_id", F.lit(7)) != 0).select(
        url.alias("url"),
        (
            F.expr("doc_id div 5")
            + F.when(F.pmod("doc_id", F.lit(3)) == 0, 1).otherwise(0)
        ).alias("fingerprint"),
    )
    return snapshot_diff(old, new)


# Largest-remainder crawl-budget apportionment over per-host byte
# totals (operators/budget.py).  sum(alloc) == 10000 exactly; the
# oracle ranks remainders with a plain window (fine at 23 hosts), the
# Spark side uses the distributed value-bucket rank.
@q(
    "crawl_budget_apportion",
    "WITH s AS (SELECT 'h' || (doc_id % 23) AS host,"
    "  CAST(SUM(n_chars) AS BIGINT) AS score FROM documents GROUP BY 1),"
    " t AS (SELECT SUM(score) AS sc FROM s),"
    " q AS (SELECT host, score, (score * 10000) // sc AS base,"
    "  (score * 10000) % sc AS rem FROM s, t),"
    " l AS (SELECT 10000 - SUM(base) AS leftover FROM q),"
    " r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, host) AS rk FROM q)"
    " SELECT host, score, CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0"
    "  END AS BIGINT) AS alloc FROM r, l",
)
def crawl_budget_apportion(spark, sf):
    """Hamilton apportionment of a 10k-fetch wave budget across hosts
    scored by total bytes (operators/budget.py:apportion_budget)."""
    from .operators.budget import apportion_budget

    d = _t(spark, sf, "documents")
    s = d.groupBy(
        F.concat(F.lit("h"), F.pmod("doc_id", F.lit(23)).cast("string")).alias(
            "host"
        )
    ).agg(F.sum("n_chars").cast("long").alias("score"))
    return apportion_budget(s, total=10_000)


# Anchor-text aggregation (operators/graph.py:anchor_text_agg) over
# links parsed from synthetic HTML with functions/urls.py:
# extract_anchors.  Each page votes one on-host /p link (anchor 'show
# N', 50 targets/host -> sharp counts) and one cross-host hub link
# whose anchor varies mod 7 against a target mod 10 (multiple anchors
# per target -> the top-3 window is exercised); a fragment link and a
# nested-markup anchor must be dropped by extraction.  The oracle
# never parses HTML — it rebuilds the link table from doc_id
# arithmetic.
@q(
    "anchor_text_topk",
    "WITH l AS (SELECT doc_id, 'https://h' || (doc_id % 20)"
    "   || '.example/p/' || (doc_id % 50) AS t,"
    "   'show ' || (doc_id % 50) AS a FROM documents"
    "  UNION ALL SELECT doc_id, 'https://hub.example/t/' || (doc_id % 10),"
    "   'topic ' || (doc_id % 7) FROM documents),"
    " c AS (SELECT t AS target_url, a AS anchor, COUNT(*) AS n_pages"
    "  FROM l GROUP BY 1, 2),"
    " r AS (SELECT *, row_number() OVER (PARTITION BY target_url"
    "  ORDER BY n_pages DESC, anchor) AS rk FROM c)"
    " SELECT target_url, anchor, n_pages, CAST(rk AS BIGINT) AS rk"
    " FROM r WHERE rk <= 3",
)
def anchor_text_topk(spark, sf):
    """HTML -> (href, anchor) extraction -> resolution -> per-target
    top-3 anchor texts."""
    d = _t(spark, sf, "documents")
    did = F.col("doc_id").cast("string")
    m20 = F.pmod("doc_id", F.lit(20)).cast("string")
    page = F.concat(
        F.lit("https://h"), m20, F.lit(".example/dir/idx"), did, F.lit(".html")
    )
    html = F.concat(
        F.lit('<p><a href="/p/'), F.pmod("doc_id", F.lit(50)).cast("string"),
        F.lit('">show '), F.pmod("doc_id", F.lit(50)).cast("string"),
        F.lit('</a><a href="https://hub.example/t/'),
        F.pmod("doc_id", F.lit(10)).cast("string"),
        F.lit('">topic '), F.pmod("doc_id", F.lit(7)).cast("string"),
        F.lit('</a><a href="#x">skip</a>'),
        F.lit('<a href="/n/1"><b>nested</b></a></p>'),
    )
    links = (
        d.select(page.alias("page_url"), F.explode(U.extract_anchors(html)).alias("_p"))
        .select(
            "page_url",
            U.resolve_href(F.col("_p.href"), F.col("page_url")).alias("target_url"),
            F.col("_p.anchor").alias("anchor"),
        )
    )
    return G.anchor_text_agg(links, "page_url", "target_url", "anchor", k=3)


# Corpus-global keep-first paragraph dedup
# (operators/boilerplate.py:dedup_paragraphs_global).  Every doc gets a
# syndicated wire paragraph shared by its doc_id%25 class (survives
# only at the class's min doc_id), its unique prose, and one
# corpus-global footer (survives only in doc 0).
@q(
    "dedup_paragraphs_global",
    "WITH base AS (SELECT doc_id, 'SYNDICATED wire item ' || (doc_id % 25)"
    "  || chr(10) || text || chr(10) || 'SHARE like subscribe' AS t"
    "  FROM documents),"
    " p AS (SELECT doc_id, u.pos AS pos, u.p AS p FROM (SELECT doc_id,"
    "  unnest(list_transform(string_split(t, chr(10)),"
    "  (x, i) -> {'pos': i, 'p': x})) AS u FROM base) s),"
    " f AS (SELECT doc_id, pos, p, row_number() OVER (PARTITION BY p"
    "  ORDER BY doc_id, pos) AS rn FROM p)"
    " SELECT doc_id, COALESCE(string_agg(CASE WHEN rn = 1 THEN p END,"
    "  chr(10) ORDER BY pos), '') AS clean_text, COUNT(*) AS n_paras,"
    "  CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS removed"
    " FROM f GROUP BY doc_id",
)
def dedup_paragraphs_global_q(spark, sf):
    """Global exact paragraph dedup, keep-first occurrence."""
    from .operators.boilerplate import dedup_paragraphs_global

    d = _t(spark, sf, "documents")
    demo = d.select(
        "doc_id",
        F.concat(
            F.lit("SYNDICATED wire item "),
            F.pmod("doc_id", F.lit(25)).cast("string"),
            F.lit("\n"), F.col("text"), F.lit("\n"),
            F.lit("SHARE like subscribe"),
        ).alias("text"),
    )
    return dedup_paragraphs_global(demo)


# Integer bigram-LM fluency score (operators/lm.py) — the CCNet
# perplexity-ranking analog with corpus-trained counts and per-mille
# floor arithmetic.
@q(
    "text_lm_bigram_score",
    "WITH tk AS (SELECT doc_id, list_filter(string_split(text, ' '),"
    "  x -> x <> '') AS t FROM documents),"
    " bg AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2 FROM (SELECT doc_id,"
    "  t, unnest(generate_series(1, len(t) - 1)) AS i FROM tk"
    "  WHERE len(t) >= 2) s),"
    " c2 AS (SELECT w1, w2, COUNT(*) AS n2 FROM bg GROUP BY 1, 2),"
    " c1 AS (SELECT w1, COUNT(*) AS n1 FROM bg GROUP BY 1),"
    " sc AS (SELECT bg.doc_id, SUM((1000 * n2) // n1) AS s, COUNT(*) AS nb"
    "  FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1) GROUP BY 1)"
    " SELECT tk.doc_id, CAST(COALESCE(nb, 0) AS BIGINT) AS n_bigrams,"
    "  CAST(COALESCE(s // nb, -1) AS BIGINT) AS score_milli"
    " FROM tk LEFT JOIN sc ON tk.doc_id = sc.doc_id",
)
def text_lm_bigram_score(spark, sf):
    """Mean bigram continuation probability per doc (integer CCNet
    perplexity analog)."""
    from .operators.lm import bigram_continuation_score

    return bigram_continuation_score(_t(spark, sf, "documents"))


# PMI-ranked bigram collocations (operators/collocations.py): PMI's
# ordering is the lift rational C(ab)·N/(C(a)·C(b)) — scored as exact
# integer lift_milli, so the oracle replays the ranking bit-for-bit
# and the top-k boundary is engine-independent.
@q(
    "text_collocations",
    "WITH tk AS (SELECT doc_id, list_filter(string_split(text, ' '),"
    "  t -> t <> '') AS ts FROM documents),"
    " uni AS (SELECT unnest(ts) AS w FROM tk),"
    " uc AS (SELECT w, count(*) AS cw FROM uni GROUP BY w),"
    " tot AS (SELECT count(*) AS n FROM uni),"
    " bg AS (SELECT ts[i] AS w1, ts[i+1] AS w2 FROM"
    "  (SELECT ts, unnest(range(1, len(ts))) AS i FROM tk) s),"
    " bc AS (SELECT w1, w2, count(*) AS n_ab FROM bg GROUP BY w1, w2),"
    " sc AS (SELECT w1, w2, n_ab,"
    "  CAST((n_ab * n * 1000) // (a.cw * b.cw) AS BIGINT) AS lift_milli"
    "  FROM bc JOIN uc a ON a.w = bc.w1 JOIN uc b ON b.w = bc.w2"
    "  CROSS JOIN tot WHERE n_ab >= 3)"
    " SELECT w1, w2, CAST(n_ab AS BIGINT) AS n_ab, lift_milli FROM sc"
    " ORDER BY lift_milli DESC, w1, w2 LIMIT 100",
)
def text_collocations(spark, sf):
    """Top-100 bigram collocations by exact integer lift (PMI order)."""
    from .operators.collocations import collocation_lift_topk

    return collocation_lift_topk(
        _t(spark, sf, "documents"), "doc_id", "text", k=100, min_count=3
    )


# Inverted index (operators/index.py): df-cutoff then capped sorted
# posting lists, serialized comma-joined so the value hash never sees
# engine array types.
@q(
    "text_inverted_index",
    "WITH tk AS (SELECT DISTINCT doc_id, unnest(list_filter("
    "  string_split(text, ' '), t -> t <> '')) AS term FROM documents),"
    " dfc AS (SELECT term, count(*) AS df FROM tk GROUP BY term),"
    " tot AS (SELECT count(*) AS nd FROM documents),"
    " keep AS (SELECT term, df FROM dfc, tot WHERE df * 1000 <= nd * 800)"
    " SELECT tk.term, CAST(min(keep.df) AS BIGINT) AS df,"
    " array_to_string(list_sort(list(doc_id))[1:16], ',') AS postings"
    " FROM tk JOIN keep USING (term) GROUP BY tk.term",
)
def text_inverted_index(spark, sf):
    """Posting lists with stopword df-cutoff (800 per-mille) and a
    16-id cap applied before any list materializes."""
    from .operators.index import build_postings

    return build_postings(
        _t(spark, sf, "documents"), "doc_id", "text",
        max_df_milli=800, max_postings=16,
    )


# Sitemap discovery from robots.txt Sitemap: directives
# (operators/robots.py:sitemap_directives) — host-global lines, not
# group rules; the lowercase/no-space variant checks parser laxity.
@q(
    "robots_sitemap_discovery",
    "WITH hosts AS (SELECT DISTINCT doc_id % 20 AS h FROM documents)"
    " SELECT 'h' || h || '.example' AS host,"
    "  'https://h' || h || '.example/sitemap.xml' AS sitemap_url,"
    "  CAST(2 AS BIGINT) AS line_no FROM hosts WHERE h % 2 = 0"
    " UNION ALL SELECT 'h' || h || '.example',"
    "  'https://cdn.example/sm/' || h || '.xml', 3 FROM hosts WHERE h % 4 = 0",
)
def robots_sitemap_discovery(spark, sf):
    """Sitemap: directive extraction from a robots corpus."""
    d = _t(spark, sf, "documents")
    hosts = d.select(F.pmod("doc_id", F.lit(20)).alias("h")).distinct()
    hs = F.col("h").cast("string")
    body = F.concat(
        F.lit("User-agent: *\nDisallow: /tmp\n"),
        F.when(
            F.pmod("h", F.lit(2)) == 0,
            F.concat(
                F.lit("Sitemap: https://h"), hs, F.lit(".example/sitemap.xml\n")
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.pmod("h", F.lit(4)) == 0,
            F.concat(F.lit("sitemap:https://cdn.example/sm/"), hs, F.lit(".xml")),
        ).otherwise(F.lit("")),
    )
    robots = hosts.select(
        F.concat(F.lit("h"), hs, F.lit(".example")).alias("host"),
        body.alias("body"),
    )
    return RB.sitemap_directives(robots)


# Spider-trap detection (operators/traps.py): a calendar template and
# a session-grid query template share one fingerprint per host (traps);
# the article template has 1:1 URL:content (clean) and also misses the
# min_urls floor.
@q(
    "crawl_trap_detect",
    "WITH u AS (SELECT 'h' || (doc_id % 5) || '.example' AS host,"
    "  '/cal/{N}/{N}' AS template, 'https://h' || (doc_id % 5)"
    "   || '.example/cal/2024/' || doc_id AS url, doc_id % 5 AS fp"
    "  FROM documents"
    " UNION ALL SELECT 'h' || (doc_id % 5) || '.example', '/article/{N}',"
    "  'https://h' || (doc_id % 5) || '.example/article/' || (doc_id % 50),"
    "  doc_id % 50 FROM documents"
    " UNION ALL SELECT 'h' || (doc_id % 5) || '.example',"
    "  '/item?id={N}&page={N}', 'https://h' || (doc_id % 5)"
    "   || '.example/item?id=' || doc_id || '&page=' || (doc_id % 7),"
    "  doc_id % 5 FROM documents),"
    " a AS (SELECT host, template, COUNT(DISTINCT url) AS n_urls,"
    "  COUNT(DISTINCT fp) AS n_fps FROM u GROUP BY 1, 2)"
    " SELECT host, template, n_urls, n_fps,"
    "  (1000 * n_fps) // n_urls AS diversity_milli,"
    "  CAST(CASE WHEN n_urls >= 20 AND (1000 * n_fps) // n_urls <= 200"
    "   THEN 1 ELSE 0 END AS BIGINT) AS is_trap FROM a",
)
def crawl_trap_detect(spark, sf):
    """URL-template trap mining over synthetic calendar/session/article
    URL spaces."""
    from .operators.traps import detect_url_traps

    d = _t(spark, sf, "documents")
    h = F.pmod("doc_id", F.lit(5)).cast("string")
    did = F.col("doc_id").cast("string")
    cal = d.select(
        F.concat(
            F.lit("https://h"), h, F.lit(".example/cal/2024/"), did
        ).alias("url"),
        F.pmod("doc_id", F.lit(5)).alias("fingerprint"),
    )
    art = d.select(
        F.concat(
            F.lit("https://h"), h, F.lit(".example/article/"),
            F.pmod("doc_id", F.lit(50)).cast("string"),
        ).alias("url"),
        F.pmod("doc_id", F.lit(50)).alias("fingerprint"),
    )
    item = d.select(
        F.concat(
            F.lit("https://h"), h, F.lit(".example/item?id="), did,
            F.lit("&page="), F.pmod("doc_id", F.lit(7)).cast("string"),
        ).alias("url"),
        F.pmod("doc_id", F.lit(5)).alias("fingerprint"),
    )
    pages = cal.unionByName(art).unionByName(item)
    out = detect_url_traps(pages, min_urls=20, max_diversity_milli=200)
    return out.withColumn("is_trap", F.col("is_trap").cast("long"))


# Host reputation scorecard (operators/reputation.py): per-host blend
# of quality, language, and exact-uniqueness signals -> admission tier.
# Injections: doc%6==0 share one dup text per host (uniq down),
# doc%5==0 (and not %6) get stopword-free word salad (en down).
@q(
    "host_reputation_tiers",
    "WITH base AS (SELECT doc_id, 'h' || (doc_id % 13) AS host,"
    "  CASE WHEN doc_id % 6 = 0 THEN 'dup content block'"
    "   WHEN doc_id % 5 = 0 THEN 'zz qq xx ww vv' ELSE text END AS text"
    "  FROM documents),"
    " t AS (SELECT host, text, list_filter(string_split(text, ' '),"
    "  x -> x <> '') AS tk FROM base),"
    " c AS (SELECT host, text,"
    f"  (len(list_filter(tk, x -> x IN {_STOP_SQL})) * 1000) // len(tk)"
    "   AS stop_m,"
    "  (length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1000)"
    "   // length(text) AS alpha_m,"
    "  CASE WHEN len(tk) BETWEEN 20 AND 1000 THEN 1000 ELSE 200 END AS len_m"
    "  FROM t),"
    " q AS (SELECT host, text, (stop_m + alpha_m + len_m) // 3 AS qm,"
    "  CASE WHEN stop_m >= 30 THEN 1 ELSE 0 END AS is_en FROM c),"
    " a AS (SELECT host, COUNT(*) AS n_docs, SUM(qm) AS sq, SUM(is_en) AS ne,"
    "  COUNT(DISTINCT text) AS nu FROM q GROUP BY host),"
    " s AS (SELECT host, n_docs, sq // n_docs AS quality_milli,"
    "  (1000 * ne) // n_docs AS en_milli, (1000 * nu) // n_docs AS uniq_milli"
    "  FROM a)"
    " SELECT host, n_docs, CAST(quality_milli AS BIGINT) AS quality_milli,"
    "  CAST(en_milli AS BIGINT) AS en_milli,"
    "  CAST(uniq_milli AS BIGINT) AS uniq_milli,"
    "  CAST((2 * quality_milli + en_milli + uniq_milli) // 4 AS BIGINT)"
    "   AS score,"
    "  CASE WHEN (2 * quality_milli + en_milli + uniq_milli) // 4 >= 600"
    "   THEN 'keep' WHEN (2 * quality_milli + en_milli + uniq_milli) // 4"
    "   >= 400 THEN 'sample' ELSE 'drop' END AS tier FROM s",
)
def host_reputation_tiers(spark, sf):
    """Per-host quality/language/uniqueness scorecard -> keep/sample/
    drop admission tiers."""
    from .operators.reputation import host_scorecard

    d = _t(spark, sf, "documents")
    demo = d.select(
        F.concat(F.lit("h"), F.pmod("doc_id", F.lit(13)).cast("string")).alias(
            "host"
        ),
        F.when(F.pmod("doc_id", F.lit(6)) == 0, F.lit("dup content block"))
        .when(F.pmod("doc_id", F.lit(5)) == 0, F.lit("zz qq xx ww vv"))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return host_scorecard(demo)


# Incremental crawl-batch near-dup detection: docs %10==0 arrive as the
# NEW batch against an LSH index built from the rest.  Output = exact
# near-dup pairs involving >=1 new doc (oracle: the full exact pair set
# filtered to those pairs — LSH recall is total on this data, as for
# dedup_minhash_lsh).
@q(
    "dedup_minhash_incremental",
    "WITH pr AS (" + _SHINGLE_CTE.format(thr=500) + ")"
    " SELECT * FROM pr WHERE doc_a % 10 = 0 OR doc_b % 10 = 0",
)
def dedup_minhash_incremental(spark, sf):
    """New-batch LSH probe against a persisted band index
    (operators/similarity.py:minhash_probe_new)."""
    d = _t(spark, sf, "documents")
    old = d.where(F.pmod("doc_id", F.lit(10)) != 0)
    new = d.where(F.pmod("doc_id", F.lit(10)) == 0)
    sig_old = S.minhash_signatures_from_hashes(
        S.shingle_hashes(old, "doc_id", "text", 3), 36
    )
    index = S.lsh_band_buckets(sig_old, bands=12, rows_per_band=3)
    pairs, _ = S.minhash_probe_new(
        new, index, d, "doc_id", "text", 3, threshold_milli=500
    )
    return pairs


# Leakage-safe corpus split (operators/sampling.py:split_assign): the
# assignment key is the HOST, so near-dup pages of one site share a
# split by construction.
@q(
    "corpus_split_leakage_safe",
    "WITH s AS (SELECT doc_id, 'h' || (doc_id % 17) AS host FROM documents),"
    " b AS (SELECT doc_id, host,"
    "  CAST('0x' || substr(md5(host), 1, 6) AS BIGINT) % 1000 AS bk FROM s)"
    " SELECT doc_id, host, CASE WHEN bk < 800 THEN 'train'"
    "  WHEN bk < 900 THEN 'val' ELSE 'test' END AS split FROM b",
)
def corpus_split_leakage_safe(spark, sf):
    """Host-keyed deterministic train/val/test split."""
    d = _t(spark, sf, "documents").select(
        "doc_id",
        F.concat(F.lit("h"), F.pmod("doc_id", F.lit(17)).cast("string")).alias(
            "host"
        ),
    )
    return SAMP.split_assign(
        d, "host", [("train", 800), ("val", 100), ("test", 100)]
    )


# Link-density spam signals (operators/reputation.py:
# page_link_signals).  Pages carry 0-2 internal links (doc%3) plus an
# external one on even docs; the oracle derives link counts
# analytically and REPLAYS the visible-text regexp pipeline in SQL.
@q(
    "page_link_spam_signals",
    "WITH b AS (SELECT doc_id, doc_id % 3 AS m,"
    "  'https://h' || (doc_id % 11) || '.example/page/' || doc_id AS page_url,"
    "  '<p>' || substr(text, 1, 60) || '</p>'"
    "  || CASE WHEN doc_id % 3 >= 1 THEN '<a href=\"/p/0\">in 0</a>' ELSE '' END"
    "  || CASE WHEN doc_id % 3 >= 2 THEN '<a href=\"/p/1\">in 1</a>' ELSE '' END"
    "  || CASE WHEN doc_id % 2 = 0 THEN"
    "   '<a href=\"https://ext.example/x\">external anchor text</a>'"
    "   ELSE '' END AS html FROM documents),"
    " s AS (SELECT page_url,"
    "  CAST(m + CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS BIGINT)"
    "   AS n_links,"
    "  CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS BIGINT)"
    "   AS n_external,"
    "  CAST(m * 4 + CASE WHEN doc_id % 2 = 0 THEN 20 ELSE 0 END AS BIGINT)"
    "   AS anchor_chars,"
    "  CAST(length(trim(regexp_replace(regexp_replace(html, '<[^>]*>', ' ',"
    "   'g'), ' +', ' ', 'g'))) AS BIGINT) AS text_chars FROM b)"
    " SELECT page_url, n_links, n_external, anchor_chars, text_chars,"
    "  CASE WHEN text_chars > 0 THEN (1000 * anchor_chars) // text_chars"
    "   ELSE -1 END AS link_density_milli,"
    "  CASE WHEN n_links > 0 THEN (1000 * n_external) // n_links"
    "   ELSE -1 END AS external_milli,"
    "  CAST(CASE WHEN (CASE WHEN text_chars > 0 THEN (1000 * anchor_chars)"
    "   // text_chars ELSE -1 END) >= 500 THEN 1 ELSE 0 END AS BIGINT)"
    "   AS is_linkspam FROM s",
)
def page_link_spam_signals(spark, sf):
    """Per-page link-density / external-ratio spam signals."""
    from .operators.reputation import page_link_signals

    d = _t(spark, sf, "documents")
    m = F.pmod("doc_id", F.lit(3))
    page = F.concat(
        F.lit("https://h"), F.pmod("doc_id", F.lit(11)).cast("string"),
        F.lit(".example/page/"), F.col("doc_id").cast("string"),
    )
    html = F.concat(
        F.lit("<p>"), F.substring("text", 1, 60), F.lit("</p>"),
        F.when(m >= 1, F.lit('<a href="/p/0">in 0</a>')).otherwise(F.lit("")),
        F.when(m >= 2, F.lit('<a href="/p/1">in 1</a>')).otherwise(F.lit("")),
        F.when(
            F.pmod("doc_id", F.lit(2)) == 0,
            F.lit('<a href="https://ext.example/x">external anchor text</a>'),
        ).otherwise(F.lit("")),
    )
    pages = d.select(page.alias("page_url"), html.alias("html"))
    out = page_link_signals(pages, spam_density_milli=500)
    return out.withColumn("is_linkspam", F.col("is_linkspam").cast("long"))


# Quality-priority canonical selection over near-dup components
# (operators/graph.py:select_component_representatives): keep the
# best-quality member, not the arbitrary min-id one.
@q(
    "dedup_components_best",
    "WITH RECURSIVE pairs AS (" + _SHINGLE_CTE.format(thr=500) + "),"
    " edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs"
    " UNION ALL SELECT doc_b AS src, doc_a AS dst FROM pairs),"
    " reach AS (SELECT src AS doc, src AS root FROM edges"
    " UNION SELECT e.dst AS doc, r.root FROM reach r JOIN edges e"
    "  ON e.src = r.doc),"
    " cc AS (SELECT doc AS doc_id, min(root) AS component FROM reach"
    "  GROUP BY doc),"
    " t AS (SELECT doc_id, text, list_filter(string_split(text, ' '),"
    "  x -> x <> '') AS tk FROM documents),"
    " q AS (SELECT doc_id,"
    f" ((len(list_filter(tk, x -> x IN {_STOP_SQL})) * 1000) // len(tk)"
    "  + (length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1000)"
    "   // length(text)"
    "  + CASE WHEN len(tk) BETWEEN 20 AND 1000 THEN 1000 ELSE 200 END) // 3"
    "  AS qm FROM t),"
    " j AS (SELECT cc.doc_id, cc.component, q.qm,"
    "  row_number() OVER (PARTITION BY cc.component"
    "   ORDER BY q.qm DESC, cc.doc_id ASC) AS rn"
    "  FROM cc JOIN q ON q.doc_id = cc.doc_id)"
    " SELECT doc_id, component,"
    "  CAST(CASE WHEN rn = 1 THEN 1 ELSE 0 END AS BIGINT) AS keep FROM j",
)
def dedup_components_best(spark, sf):
    """Near-dup components -> keep the highest-quality member each."""
    from .operators.graph import select_component_representatives

    d = _t(spark, sf, "documents")
    pairs = S.minhash_dedup_pairs(d, "doc_id", "text", 3, 500)
    comps = G.dedup_components(pairs)
    scores = d.select("doc_id", T.quality_score_milli(F.col("text")).alias("q"))
    out = select_component_representatives(comps, scores, score_col="q")
    return out.withColumn("keep", F.col("keep").cast("long"))


# Repeated-span (8-token window) dedup report — Lee et al. exact
# substring-dedup signal, run over the raw corpus (its tiny vocabulary
# makes real cross-doc window collisions common; the oracle replays the
# window counting exactly).
@q(
    "dedup_repeated_spans",
    "WITH tk AS (SELECT doc_id, list_filter(string_split(text, ' '),"
    "  x -> x <> '') AS t FROM documents),"
    " w AS (SELECT doc_id, array_to_string(t[i:i+7], ' ') AS g FROM ("
    "  SELECT doc_id, t, unnest(generate_series(1, len(t) - 7)) AS i"
    "  FROM tk WHERE len(t) >= 8) s),"
    " c AS (SELECT g, COUNT(*) AS c FROM w GROUP BY g),"
    " p AS (SELECT w.doc_id, COUNT(*) AS n_windows,"
    "  SUM(CASE WHEN c.c > 1 THEN 1 ELSE 0 END) AS n_dup"
    "  FROM w JOIN c USING (g) GROUP BY 1)"
    " SELECT tk.doc_id, CAST(COALESCE(n_windows, 0) AS BIGINT) AS n_windows,"
    "  CAST(COALESCE(n_dup, 0) AS BIGINT) AS n_dup_windows,"
    "  CAST(COALESCE((1000 * n_dup) // n_windows, -1) AS BIGINT)"
    "   AS dup_span_milli,"
    "  CAST(CASE WHEN COALESCE((1000 * n_dup) // n_windows, -1) >= 200"
    "   THEN 1 ELSE 0 END AS BIGINT) AS flagged"
    " FROM tk LEFT JOIN p USING (doc_id)",
)
def dedup_repeated_spans(spark, sf):
    """Per-doc duplicated 8-token-window fraction (Lee et al. signal)."""
    out = S.repeated_span_report(
        _t(spark, sf, "documents"), "doc_id", "text", n=8, threshold_milli=200
    )
    return out.withColumn("flagged", F.col("flagged").cast("long"))


# Web-cleaning composite: host-chromed pages -> per-host boilerplate
# line strip -> corpus-global keep-first paragraph dedup -> newline
# normalization -> quality score + keep gate, as ONE lazy plan.  The
# oracle chains the byte-parity SQL of every stage, so the final
# cleaned STRINGS (not just counts) must match.
@q(
    "web_clean_pipeline",
    "WITH base AS (SELECT doc_id, 'h' || (doc_id % 7) AS host,"
    "  'NAV MENU h' || (doc_id % 7) || chr(10)"
    "  || 'SYNDICATED wire item ' || (doc_id % 25) || chr(10) || text"
    "  || chr(10) || CASE WHEN doc_id % 10 < 7 THEN '(c) h' || (doc_id % 7)"
    "   ELSE 'promo h' || (doc_id % 7) END AS t FROM documents),"
    " l1 AS (SELECT doc_id, host, u.pos AS pos, u.ln AS ln FROM (SELECT"
    "  doc_id, host, unnest(list_transform(string_split(t, chr(10)),"
    "  (x, i) -> {'pos': i, 'ln': x})) AS u FROM base) s),"
    " d1 AS (SELECT host, ln, COUNT(DISTINCT doc_id) AS df_ FROM l1"
    "  GROUP BY 1, 2),"
    " n1 AS (SELECT host, COUNT(*) AS nd FROM base GROUP BY 1),"
    " fr AS (SELECT d1.host, d1.ln FROM d1 JOIN n1 USING (host)"
    "  WHERE d1.df_ * 1000 >= 600 * n1.nd),"
    " s1 AS (SELECT l.doc_id, COALESCE(string_agg(CASE WHEN f.ln IS NULL"
    "  THEN l.ln END, chr(10) ORDER BY l.pos), '') AS t1 FROM l1 l"
    "  LEFT JOIN fr f ON l.host = f.host AND l.ln = f.ln GROUP BY 1),"
    " l2 AS (SELECT doc_id, u.pos AS pos, u.p AS p FROM (SELECT doc_id,"
    "  unnest(list_transform(string_split(t1, chr(10)),"
    "  (x, i) -> {'pos': i, 'p': x})) AS u FROM s1) s),"
    " f2 AS (SELECT doc_id, pos, p, row_number() OVER (PARTITION BY p"
    "  ORDER BY doc_id, pos) AS rn FROM l2),"
    " s2 AS (SELECT doc_id, COALESCE(string_agg(CASE WHEN rn = 1 THEN p END,"
    "  chr(10) ORDER BY pos), '') AS t2 FROM f2 GROUP BY 1),"
    " s3 AS (SELECT doc_id, replace(t2, chr(10), ' ') AS text_clean FROM s2),"
    " tq AS (SELECT doc_id, text_clean, list_filter(string_split(text_clean,"
    "  ' '), x -> x <> '') AS tk FROM s3),"
    " q AS (SELECT doc_id, text_clean, CAST(len(tk) AS BIGINT) AS n_tokens,"
    f" ((len(list_filter(tk, x -> x IN {_STOP_SQL})) * 1000) // len(tk)"
    "  + (length(regexp_replace(text_clean, '[^A-Za-z]', '', 'g')) * 1000)"
    "   // length(text_clean)"
    "  + CASE WHEN len(tk) BETWEEN 20 AND 1000 THEN 1000 ELSE 200 END) // 3"
    "  AS quality_milli FROM tq WHERE len(tk) > 0)"
    " SELECT doc_id, text_clean, n_tokens, CAST(quality_milli AS BIGINT)"
    "  AS quality_milli, CAST(CASE WHEN quality_milli >= 400 THEN 1 ELSE 0"
    "  END AS BIGINT) AS kept FROM q",
)
def web_clean_pipeline(spark, sf):
    """Boilerplate strip -> paragraph dedup -> normalize -> quality
    gate as one plan; oracle compares the cleaned strings."""
    from .operators.boilerplate import (
        dedup_paragraphs_global,
        strip_boilerplate_lines,
    )

    d = _t(spark, sf, "documents")
    h = F.concat(F.lit("h"), F.pmod("doc_id", F.lit(7)).cast("string"))
    footer = F.when(
        F.pmod("doc_id", F.lit(10)) < 7, F.concat(F.lit("(c) "), h)
    ).otherwise(F.concat(F.lit("promo "), h))
    demo = d.select(
        "doc_id",
        h.alias("host"),
        F.concat(
            F.lit("NAV MENU "), h, F.lit("\n"),
            F.lit("SYNDICATED wire item "),
            F.pmod("doc_id", F.lit(25)).cast("string"), F.lit("\n"),
            F.col("text"), F.lit("\n"), footer,
        ).alias("text"),
    )
    s1 = strip_boilerplate_lines(demo, threshold_milli=600).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    s2 = dedup_paragraphs_global(s1)
    s3 = s2.select(
        "doc_id", F.regexp_replace("clean_text", "\n", " ").alias("text_clean")
    )
    toks = T.tokens(F.col("text_clean"))
    q = T.quality_score_milli(F.col("text_clean"))
    return (
        s3.where(F.size(toks) > 0)
        .select(
            "doc_id",
            "text_clean",
            F.size(toks).cast("long").alias("n_tokens"),
            q.alias("quality_milli"),
            (q >= 400).cast("long").alias("kept"),
        )
    )


# Prefix-delta frontier compression accounting
# (operators/compression.py).  The oracle recomputes the longest
# common prefix via the monotone-prefix trick (count of i with
# url[1:i] = prev[1:i]).
@q(
    "frontier_prefix_compression",
    "WITH u AS (SELECT 'h' || (doc_id % 9) || '.example' AS host,"
    "  'https://h' || (doc_id % 9) || '.example/dir' || (doc_id % 5)"
    "  || '/page/' || doc_id || '?ref=x' AS url FROM documents),"
    " l AS (SELECT host, url, lag(url) OVER (PARTITION BY host"
    "  ORDER BY url) AS prev FROM u),"
    " c AS (SELECT host, url, prev, CASE WHEN prev IS NULL THEN NULL ELSE"
    "  len(list_filter(generate_series(1, least(length(url), length(prev))),"
    "  i -> url[1:i] = prev[1:i])) END AS cpl FROM l),"
    " a AS (SELECT host, COUNT(*) AS n_urls, SUM(length(url)) AS raw,"
    "  SUM(CASE WHEN prev IS NULL THEN length(url)"
    "   ELSE length(url) - cpl + 2 END) AS delta FROM c GROUP BY host)"
    " SELECT host, n_urls, CAST(raw AS BIGINT) AS raw_bytes,"
    "  CAST(delta AS BIGINT) AS delta_bytes,"
    "  CAST((1000 * (raw - delta)) // raw AS BIGINT) AS savings_milli"
    " FROM a",
)
def frontier_prefix_compression(spark, sf):
    """Per-host prefix-delta coding byte accounting for frontier
    snapshots."""
    from .operators.compression import prefix_delta_stats

    d = _t(spark, sf, "documents")
    h = F.concat(
        F.lit("h"), F.pmod("doc_id", F.lit(9)).cast("string"), F.lit(".example")
    )
    url = F.concat(
        F.lit("https://"), h, F.lit("/dir"),
        F.pmod("doc_id", F.lit(5)).cast("string"), F.lit("/page/"),
        F.col("doc_id").cast("string"), F.lit("?ref=x"),
    )
    return prefix_delta_stats(d.select(h.alias("host"), url.alias("url")))


# Hashed-BoW linear classifier gate (operators/classifier.py): the
# serving path of a fastText-style quality filter — md5 feature
# hashing, broadcast weight join, integer score sum (no division, so
# DuckDB's truncating `//` never enters).  Weights here are the
# deterministic md5-derived stand-in; a trained model swaps in as
# data with an identical plan.
@q(
    "quality_classifier_score",
    "WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk"
    " FROM documents),"
    " e AS (SELECT doc_id, len(tk) AS n, unnest(tk) AS token FROM t),"
    " b AS (SELECT doc_id, n,"
    "  CAST('0x' || substr(md5(token), 1, 6) AS BIGINT) % 512 AS bucket FROM e),"
    " w AS (SELECT doc_id, n,"
    "  (CAST('0x' || substr(md5(CAST(bucket AS VARCHAR)), 1, 6) AS BIGINT) % 2001)"
    "   - 1000 AS wt FROM b),"
    " s AS (SELECT doc_id, max(n) AS n_tokens, SUM(wt) AS score_raw FROM w GROUP BY doc_id)"
    " SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,"
    "  CAST(score_raw AS BIGINT) AS score_raw,"
    "  CASE WHEN score_raw >= 0 THEN 'keep' ELSE 'drop' END AS label FROM s"
    " UNION ALL SELECT doc_id, 0::BIGINT, 0::BIGINT, 'keep' FROM t WHERE len(tk) = 0",
)
def quality_classifier_score(spark, sf):
    """fastText-analog quality gate: hashed bag-of-words dot product
    with a broadcast weight table, integer-exact."""
    from .operators import classifier as CLS

    d = _t(spark, sf, "documents")
    w = CLS.hash_weights(spark, buckets=512)
    return CLS.classifier_score(d, "doc_id", "text", w, buckets=512)


# DSIR-style importance scoring (operators/importance.py): per-bucket
# target/corpus count-ratio weights (pure 64-bit `div`), summed per
# doc.  Target slice = doc_id % 37 (the decontamination eval slice
# convention), so the score measures "looks like the eval domain".
@q(
    "corpus_importance_scores",
    "WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk"
    " FROM documents),"
    " e AS (SELECT doc_id, len(tk) AS n, unnest(tk) AS token FROM t),"
    " b AS (SELECT doc_id, n,"
    "  CAST('0x' || substr(md5(token), 1, 6) AS BIGINT) % 256 AS bucket FROM e),"
    " cc AS (SELECT bucket, count(*) AS ccnt FROM b GROUP BY bucket),"
    " tc AS (SELECT bucket, count(*) AS tcnt FROM b WHERE doc_id % 37 = 0 GROUP BY bucket),"
    " w AS (SELECT cc.bucket, (COALESCE(tcnt, 0) * 1000000) // ccnt AS wppm"
    "  FROM cc LEFT JOIN tc USING (bucket)),"
    " s AS (SELECT doc_id, max(n) AS n_tokens, SUM(wppm) AS imp"
    "  FROM b JOIN w USING (bucket) GROUP BY doc_id)"
    " SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,"
    "  CAST(imp AS BIGINT) AS importance_raw FROM s"
    " UNION ALL SELECT doc_id, 0::BIGINT, 0::BIGINT FROM t WHERE len(tk) = 0",
)
def corpus_importance_scores(spark, sf):
    """Importance-resampling scores: how target-like is each corpus
    doc, by hashed-token count ratios."""
    from .operators import importance as IMP

    d = _t(spark, sf, "documents")
    return IMP.importance_scores(
        d, d.where(F.col("doc_id") % 37 == 0), "doc_id", "text", buckets=256
    )


# Unicode NFC normalization (operators/unicode_norm.py): decomposed
# sequences are injected deterministically (every 'e' becomes
# e + U+0301) so the normalizer has real work; the oracle replays the
# injection and DuckDB's utf8proc NFC, matching CPython's UCD NFC
# bit-for-bit (both implement UAX #15).
@q(
    "text_nfc_normalize",
    "WITH d AS (SELECT doc_id,"
    "  regexp_replace(text, 'e', 'e' || chr(769), 'g') AS t FROM documents)"
    " SELECT doc_id, nfc_normalize(t) AS text_nfc,"
    "  CAST(length(t) AS BIGINT) AS chars_pre,"
    "  CAST(length(nfc_normalize(t)) AS BIGINT) AS chars_post FROM d",
)
def text_nfc_normalize(spark, sf):
    """NFC normalization via an Arrow-batched pandas UDF — the
    pre-hash canonicalization step every exact dedup needs."""
    from .operators import unicode_norm as UN

    d = _t(spark, sf, "documents")
    decomposed = d.select(
        "doc_id", F.regexp_replace("text", "e", "e\u0301").alias("text")
    )
    return UN.normalize_nfc(decomposed, "text").select(
        "doc_id", "text_nfc", "chars_pre", "chars_post"
    )


# Gap-based sessionization (operators/sessions.py): split each user's
# event stream at >4 h gaps, one row per session.  Microsecond integer
# time arithmetic (unix_micros / epoch_us) keeps both engines exact;
# the event-id tiebreak makes equal-timestamp order total.  The
# session aggregate reuses the window's Exchange (plan-shape test).
@q(
    "events_sessionize",
    "WITH o AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),"
    " l AS (SELECT user_id, event_id, us, lag(us) OVER"
    "  (PARTITION BY user_id ORDER BY us, event_id) AS prev FROM o),"
    " b AS (SELECT user_id, event_id, us, CASE WHEN prev IS NULL"
    "  OR us - prev > 14400000000::BIGINT THEN 1 ELSE 0 END AS brk FROM l),"
    " s AS (SELECT user_id, event_id, us, SUM(brk) OVER"
    "  (PARTITION BY user_id ORDER BY us, event_id ROWS UNBOUNDED PRECEDING)"
    "  AS session_seq FROM b)"
    " SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,"
    "  count(*) AS n_events, min(event_id) AS first_id, max(event_id) AS last_id,"
    "  CAST(min(us) AS BIGINT) AS start_us, CAST(max(us) AS BIGINT) AS end_us,"
    "  CAST(max(us) - min(us) AS BIGINT) AS duration_us"
    " FROM s GROUP BY user_id, session_seq",
)
def events_sessionize(spark, sf):
    """Fetch-burst sessionization of the event log: per-user sessions
    split at 4-hour gaps, aggregated to one integer row each."""
    from .operators import sessions as SES

    e = _t(spark, sf, "events")
    return SES.session_stats(e, "user_id", "ts", 14400, "event_id")


# SemDeDup (operators/clustering.py semantic_dedup): one Lloyd
# iteration clusters the embeddings, then within-cluster quantized
# cosine >= 300 milli drops the higher id of each near-pair
# (keep-first).  The oracle chains the shared k-means CTEs with the
# within-cell pair join — every step exact integers / correctly
# rounded IEEE, so keep flags bit-match.
@q(
    "dedup_semantic",
    _KMEANS_CTES
    + ", qn AS (SELECT vec_id, qe, list_dot_product(qe, qe) AS nq FROM e0"
    " WHERE list_dot_product(qe, qe) > 0),"
    " pr AS (SELECT DISTINCT y.vec_id AS vb FROM a2 x JOIN a2 y"
    " ON x.cell = y.cell AND x.vec_id < y.vec_id"
    " JOIN qn qa ON qa.vec_id = x.vec_id JOIN qn qb ON qb.vec_id = y.vec_id"
    " WHERE floor(1000.0 * list_dot_product(qa.qe, qb.qe)"
    " / (sqrt(qa.nq) * sqrt(qb.nq))) >= 300)"
    " SELECT a2.vec_id, CAST(a2.cell AS BIGINT) AS cell,"
    " pr.vb IS NULL AS keep FROM a2 LEFT JOIN pr ON a2.vec_id = pr.vb",
)
def dedup_semantic(spark, sf):
    """SemDeDup: k-means cells (k=8, one Lloyd iteration) ->
    within-cell cosine near-dup removal, keep-first rule."""
    return CL.semantic_dedup(_t(spark, sf, "embeddings"), k=8, threshold_milli=300, dim=64)


# Compaction planning (operators/compaction.py): the file manifest is
# synthesized closed-form from documents (part = source, bytes = 100 +
# length(text)); bins are aligned to 2048-byte boundaries of the
# per-partition exclusive running size.  The lag-window prefix sum and
# the (part, bin) groupBy share one Exchange.
@q(
    "maint_compaction_plan",
    "WITH f AS (SELECT source AS part, doc_id AS file_id,"
    " CAST(100 + length(text) AS BIGINT) AS bytes FROM documents),"
    " c AS (SELECT part, file_id, bytes, COALESCE(SUM(bytes) OVER"
    " (PARTITION BY part ORDER BY file_id"
    " ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre FROM f)"
    " SELECT part, CAST(pre // 2048 AS BIGINT) AS bin,"
    " CAST(count(*) AS BIGINT) AS n_files, CAST(sum(bytes) AS BIGINT) AS bin_bytes,"
    " min(file_id) AS first_file, max(file_id) AS last_file,"
    " count(*) > 1 AS compact FROM c GROUP BY part, bin",
)
def maint_compaction_plan(spark, sf):
    """Iceberg-style small-file compaction groups over a synthesized
    manifest: boundary-aligned binpack per table partition."""
    from .operators import compaction as CP

    d = _t(spark, sf, "documents")
    files = d.select(
        F.col("source").alias("part"),
        F.col("doc_id").alias("file_id"),
        (F.lit(100) + F.length("text")).cast("long").alias("bytes"),
    )
    return CP.compaction_plan(files, target_bytes=2048)


# Sliding-window document chunking (operators/packing.py
# chunk_documents): 16-token windows every 8 tokens over the
# whitespace tokenization — the fine-tuning counterpart of the
# concat-and-chunk pack_chunks entry.  Pure codegen fan-out, zero
# shuffles; the oracle replays slice arithmetic on DuckDB lists.
@q(
    "text_chunk_windows",
    "WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '')"
    " AS tk FROM documents)"
    " SELECT doc_id, CAST(s // 8 AS BIGINT) AS chunk_idx,"
    " CAST(least(16, len(tk) - s) AS BIGINT) AS n_tokens,"
    " array_to_string(tk[s+1 : s+16], ' ') AS chunk_text"
    " FROM t, unnest(generate_series(0, len(tk) - 1, 8)) AS u(s)",
)
def text_chunk_windows(spark, sf):
    """Overlapping training windows: max_len=16, stride=8 over each
    doc's token array."""
    d = _t(spark, sf, "documents")
    t = d.select("doc_id", T.tokens(F.col("text")).alias("tokens"))
    return PK.chunk_documents(t, max_len=16, stride=8)


# Asymmetric shingle containment (similarity.py containment_pairs):
# directed near-subset pairs |A∩B|/|A| that symmetric Jaccard misses;
# oracle reuses the shared shingle CTEs with a per-direction UNION.
@q(
    "dedup_containment",
    _SHINGLE_BASE
    + ", d AS (SELECT doc_a AS doc_in, doc_b AS doc_of,"
    " (i_cnt * 1000) // ca.n_sh AS containment_milli"
    " FROM inter JOIN cnt ca ON ca.doc_id = doc_a"
    " UNION ALL SELECT doc_b, doc_a, (i_cnt * 1000) // cb.n_sh"
    " FROM inter JOIN cnt cb ON cb.doc_id = doc_b)"
    " SELECT doc_in, doc_of, containment_milli FROM d"
    " WHERE containment_milli >= 500",
)
def dedup_containment(spark, sf):
    """Directed shingle-containment pairs at >= 500 milli — the
    quote-and-wrap / template-embedding detector."""
    sh = S.shingle_rows(_t(spark, sf, "documents"), "doc_id", "text", 3)
    return S.containment_pairs(sh, 500)


# Temperature-scaled mixture apportionment (operators/budget.py
# mixture_apportion): per-source sampling quotas proportional to
# sqrt(count) (tau = 0.5), largest-remainder so sum(alloc) == 100000
# exactly.  sqrt of an integer + the half-up milli quantizer replay
# bit-identically in SQL.
@q(
    "mixture_temperature_alloc",
    "WITH s AS (SELECT source, CAST(count(*) AS BIGINT) AS n,"
    "  CAST(floor(sqrt(count(*)) * 1000 + 0.5) AS BIGINT) AS weight"
    "  FROM documents GROUP BY source),"
    " t AS (SELECT SUM(weight) AS sw FROM s),"
    " q AS (SELECT source, n, weight, (weight * 100000) // sw AS base,"
    "  (weight * 100000) % sw AS rem FROM s, t),"
    " l AS (SELECT 100000 - SUM(base) AS leftover FROM q),"
    " r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rk FROM q)"
    " SELECT source, n, weight, CAST(base + CASE WHEN rk <= leftover"
    "  THEN 1 ELSE 0 END AS BIGINT) AS alloc FROM r, l",
)
def mixture_temperature_alloc(spark, sf):
    """tau=0.5 training-mixture quotas over document sources,
    Hamilton-apportioned to a 100k-doc sampling budget."""
    from .operators.budget import mixture_apportion

    d = _t(spark, sf, "documents")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    return mixture_apportion(counts, total=100_000)


# SCD2 content-version history (operators/recrawl.py content_history):
# the fetch log is synthesized closed-form from events (200 URLs, one
# fetch per wave, fingerprint advances every 3 waves) and collapsed to
# one row per content version with [valid_from, valid_to] wave spans.
@q(
    "crawl_content_history",
    "WITH h AS (SELECT 'u' || (event_id % 200) AS url, event_id // 200 AS wave,"
    "  ((event_id % 200) * 31 + (event_id // 200) // 3) % 7 AS fp FROM events),"
    " l AS (SELECT url, wave, fp, lag(fp) OVER (PARTITION BY url ORDER BY wave)"
    "  AS pfp FROM h),"
    " v AS (SELECT url, wave, fp, SUM(CASE WHEN pfp IS NULL OR fp <> pfp"
    "  THEN 1 ELSE 0 END) OVER (PARTITION BY url ORDER BY wave"
    "  ROWS UNBOUNDED PRECEDING) AS version FROM l),"
    " a AS (SELECT url, CAST(version AS BIGINT) AS version,"
    "  CAST(MIN(fp) AS BIGINT) AS fingerprint,"
    "  CAST(MIN(wave) AS BIGINT) AS valid_from_wave, COUNT(*) AS n_obs"
    "  FROM v GROUP BY url, version)"
    " SELECT url, version, fingerprint, valid_from_wave,"
    "  CAST(lead(valid_from_wave) OVER (PARTITION BY url ORDER BY version) - 1"
    "  AS BIGINT) AS valid_to_wave, n_obs FROM a",
)
def crawl_content_history(spark, sf):
    """SCD2 page-content versioning over a synthetic fetch log — the
    'what did this page say at wave W' index."""
    from .operators.recrawl import content_history

    e = _t(spark, sf, "events")
    uk = F.pmod("event_id", F.lit(200)).cast("long")
    h = e.select(
        F.concat(F.lit("u"), uk.cast("string")).alias("url"),
        F.expr("event_id div 200").alias("wave"),
        F.pmod(uk * 31 + F.expr("(event_id div 200) div 3"), F.lit(7))
        .cast("long")
        .alias("fingerprint"),
    )
    return content_history(h)


# Interval (range) join (operators/asof.py interval_join, VERDICT r4
# missing #4): points against non-overlapping SCD2-shaped validity
# intervals — Spark runs the one-shuffle union+window as-of plan with
# the gap post-filter; DuckDB's oracle is its native range-predicate
# join (at most one match per point because intervals don't overlap).
# Synthesis: 50 keys x 3 versions, intervals [5,13] [15,23] [25,open]
# (a 1-wave gap between versions exercises the NULL-out path), points
# at t = doc_id % 35 (t < 5 predates every interval).
@q(
    "crawl_interval_join",
    "WITH ivl AS (SELECT doc_id % 50 AS k,"
    " 5 + (doc_id // 50) * 10 AS valid_from_wave,"
    " CASE WHEN doc_id // 50 = 2 THEN NULL"
    " ELSE 5 + (doc_id // 50) * 10 + 8 END AS valid_to_wave,"
    " 'v' || (doc_id // 50) AS content_hash"
    " FROM documents WHERE doc_id < 150),"
    " pts AS (SELECT doc_id, doc_id % 50 AS k, doc_id % 35 AS t FROM documents)"
    " SELECT p.doc_id, p.k, p.t,"
    " i.valid_to_wave, i.content_hash, i.valid_from_wave"
    " FROM pts p LEFT JOIN ivl i ON p.k = i.k"
    " AND p.t >= i.valid_from_wave"
    " AND (i.valid_to_wave IS NULL OR p.t <= i.valid_to_wave)",
)
def crawl_interval_join(spark, sf):
    """'Which content version was live when this fetch happened' —
    point-in-interval enrichment over a content history."""
    from .operators.asof import interval_join

    d = _t(spark, sf, "documents")
    seq = F.expr("doc_id div 50")
    ivl = d.where(F.col("doc_id") < 150).select(
        F.pmod("doc_id", F.lit(50)).alias("k"),
        (F.lit(5) + seq * 10).alias("valid_from_wave"),
        F.when(seq != 2, F.lit(5) + seq * 10 + 8).alias("valid_to_wave"),
        F.concat(F.lit("v"), seq.cast("string")).alias("content_hash"),
    )
    pts = d.select(
        "doc_id",
        F.pmod("doc_id", F.lit(50)).alias("k"),
        F.pmod("doc_id", F.lit(35)).alias("t"),
    )
    return interval_join(pts, ivl, "k", "t")


# Mergeable HLL distinct counting (operators/sketches.py): the driver
# row asserts the sketch-accuracy INVARIANT (|est - exact| <= 5%) as a
# boolean the oracle predicts as TRUE, since DataSketches estimates
# can't byte-match DuckDB's sketch family; the merge law (union of
# per-wave sketches == sketch of the union) is pytest-asserted.
@q(
    "host_distinct_urls_hll",
    "SELECT 'h' || (event_id % 25) AS host,"
    " count(DISTINCT '/p' || (user_id % 500)) AS n_distinct,"
    " TRUE AS within_tol FROM events GROUP BY host",
)
def host_distinct_urls_hll(spark, sf):
    """Per-host distinct-URL cardinality: exact count next to the HLL
    sketch estimate's 5%-tolerance invariant."""
    from .operators import sketches as SK

    e = _t(spark, sf, "events")
    urls = e.select(
        F.concat(F.lit("h"), F.pmod("event_id", F.lit(25)).cast("string")).alias(
            "host"
        ),
        F.concat(F.lit("/p"), F.pmod("user_id", F.lit(500)).cast("string")).alias(
            "url"
        ),
    )
    return SK.distinct_within_tolerance(urls, ["host"], "url", tol_milli=50)


# Count-min point-frequency sketch (operators/sketches.py): the driver
# row asserts BOTH invariants as booleans the oracle predicts TRUE —
# the hard one-sided bound (estimate never undercounts, holds by
# construction) and the e*N/w-style overcount bound (holds with
# probability ~1 - e^-d).  Exact additivity of partial matrices
# (cm(A)+cm(B) == cm(A union B), elementwise) is pytest-asserted.
@q(
    "host_freq_cm_bound",
    "SELECT 'h' || (event_id % 25) AS host,"
    " CAST(count(*) AS BIGINT) AS n_exact,"
    " TRUE AS ge_exact, TRUE AS within_bound FROM events GROUP BY host",
)
def host_freq_cm_bound(spark, sf):
    """Per-host fetch-frequency estimates from a 512 KB count-min
    sketch, validated against the exact counts."""
    from .operators import sketches as SK

    e = _t(spark, sf, "events")
    hosts = e.select(
        F.concat(F.lit("h"), F.pmod("event_id", F.lit(25)).cast("string")).alias(
            "host"
        )
    )
    return SK.freq_within_bound(hosts, "host")


# Corpus drift monitoring (operators/drift.py): even-doc_id docs play
# the "current wave", odd the reference; buckets are 100-char length
# bands capped at 9.  Integer chi-square-style f-divergence per
# bucket — exact on both engines, unlike PSI/KL logs.
@q(
    "corpus_drift_histogram",
    "WITH cur AS (SELECT least(n_chars // 100, 9) AS bucket, count(*) AS n_cur"
    "  FROM documents WHERE doc_id % 2 = 0 GROUP BY 1),"
    " ref AS (SELECT least(n_chars // 100, 9) AS bucket, count(*) AS n_ref"
    "  FROM documents WHERE doc_id % 2 = 1 GROUP BY 1),"
    " t AS (SELECT (SELECT CAST(SUM(n_cur) AS BIGINT) FROM cur) AS ta,"
    "  (SELECT CAST(SUM(n_ref) AS BIGINT) FROM ref) AS tb),"
    " j AS (SELECT COALESCE(cur.bucket, ref.bucket) AS bucket,"
    "  COALESCE(n_cur, 0) AS n_cur, COALESCE(n_ref, 0) AS n_ref"
    "  FROM cur FULL OUTER JOIN ref ON cur.bucket = ref.bucket)"
    " SELECT CAST(bucket AS BIGINT) AS bucket, n_cur, n_ref,"
    "  (n_cur * 1000) // ta AS cur_milli, (n_ref * 1000) // tb AS ref_milli,"
    "  COALESCE(((n_cur * 1000) // ta - (n_ref * 1000) // tb)"
    "   * ((n_cur * 1000) // ta - (n_ref * 1000) // tb)"
    "   // nullif((n_cur * 1000) // ta + (n_ref * 1000) // tb, 0), 0)"
    "  AS contrib_milli FROM j, t",
)
def corpus_drift_histogram(spark, sf):
    """Wave-over-wave corpus drift: per-length-band share deltas and
    integer drift contributions."""
    from .operators.drift import histogram_drift

    d = _t(spark, sf, "documents")
    bucket = F.least(F.expr("n_chars div 100"), F.lit(9)).cast("long").alias("bucket")
    cur = d.where(F.pmod("doc_id", F.lit(2)) == 0).select(bucket)
    ref = d.where(F.pmod("doc_id", F.lit(2)) == 1).select(bucket)
    return histogram_drift(cur, ref)


# As-of join (operators/asof.py): each fetch event picks up the
# policy version active at its time — union + keyed window, never a
# range product.  Hosts 15-19 have no versions (NULL attrs, left
# semantics); versions land every 5 ticks per host.  DuckDB has a
# native ASOF JOIN, which IS the oracle.
@q(
    "crawl_asof_policy",
    "WITH l AS (SELECT event_id % 20 AS host, event_id // 20 AS t, event_id"
    "  FROM events),"
    " r AS (SELECT event_id % 20 AS host, (event_id // 20) * 5 AS t,"
    "  event_id AS delay FROM events"
    "  WHERE event_id < 300 AND event_id % 20 < 15)"
    " SELECT l.host, l.t, l.event_id, r.delay AS policy_delay FROM l"
    " ASOF LEFT JOIN r ON l.host = r.host AND l.t >= r.t",
)
def crawl_asof_policy(spark, sf):
    """Point-in-time policy attachment: latest version with
    version_t <= fetch_t per host, NULL before the first version."""
    from .operators.asof import asof_join

    e = _t(spark, sf, "events")
    left = e.select(
        F.pmod("event_id", F.lit(20)).cast("long").alias("host"),
        F.expr("event_id div 20").alias("t"),
        "event_id",
    )
    right = e.where(
        (F.col("event_id") < 300) & (F.pmod("event_id", F.lit(20)) < 15)
    ).select(
        F.pmod("event_id", F.lit(20)).cast("long").alias("host"),
        (F.expr("event_id div 20") * 5).alias("t"),
        F.col("event_id").alias("policy_delay"),
    )
    return asof_join(left, right, "host")


# Hypertable rollup (operators/rollup.py): the served hour-grain frame
# is computed FROM the materialized minute-grain level (never raw
# events — that is the operator's point); the oracle aggregates the
# RAW events at hour grain directly, so a pass proves the hierarchy
# property (rollup of the rollup == direct coarse aggregation), exact
# because values are quantized to integer cents at level 0.
@q(
    "metrics_hypertable_rollup",
    "SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket_str,"
    " event_type, count(*) AS n_events,"
    " CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,"
    " CAST(MIN(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS min_cents,"
    " CAST(MAX(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS max_cents"
    " FROM events GROUP BY 1, 2",
)
def metrics_hypertable_rollup(spark, sf):
    """Continuous-aggregate hierarchy: hour grain served from the
    minute-grain materialization."""
    from .operators.rollup import rollup_hierarchy

    e = _t(spark, sf, "events")
    levels = rollup_hierarchy(e, ("minute", "hour"))
    return levels["hour"].select(
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket_str"),
        "event_type",
        "n_events",
        "sum_cents",
        "min_cents",
        "max_cents",
    )


# Misra-Gries heavy hitters (operators/sketches.py): keys over the
# n/k frequency bar, EXACT — the per-partition summary union provably
# contains every true heavy hitter (if freq > n/k globally, some
# partition has freq_p > n_p/k), and the confirm counts candidates
# only.  One skewed host carries every third event; the 96 cold hosts
# sit far under the bar.
@q(
    "host_heavy_hitters",
    "WITH u AS (SELECT CASE WHEN event_id % 3 = 0 THEN 'hot.example'"
    "  ELSE 'h' || (event_id % 97) || '.example' END AS host FROM events)"
    " SELECT host, count(*) AS n_exact FROM u GROUP BY host"
    " HAVING count(*) * 10 > (SELECT count(*) FROM u)",
)
def host_heavy_hitters(spark, sf):
    """Hosts contributing > 1/10 of all fetches: Misra-Gries prune +
    exact confirm, no corpus-wide key shuffle."""
    from .operators import sketches as SK

    e = _t(spark, sf, "events")
    u = e.select(
        F.when(F.pmod("event_id", F.lit(3)) == 0, F.lit("hot.example"))
        .otherwise(
            F.concat(F.lit("h"), F.pmod("event_id", F.lit(97)).cast("string"), F.lit(".example"))
        )
        .alias("host")
    )
    return SK.heavy_hitters_exact(u, "host", 10)


# Exact per-host latency percentiles (operators/sketches.py): the
# p50/p95/p99 fetch-SLO dashboard computed from a mergeable value
# histogram — one raw-row shuffle on (host, lat_ms), then the
# cumulative window and the final groupBy share one histogram-sized
# Exchange.  Lower (type-1) discrete quantile: smallest value whose
# cumulative count reaches ceil(p*n/1000), exact 64-bit arithmetic on
# both sides.  Latency is quantized half-up to integer "ms" from the
# events value column (the repo-wide float->int idiom).
@q(
    "fetch_latency_percentiles",
    "WITH src AS (SELECT 'h' || (user_id % 20) || '.example' AS host,"
    "  CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS lat_ms FROM events),"
    " hist AS (SELECT host, lat_ms, count(*) AS c FROM src GROUP BY 1, 2),"
    " cum AS (SELECT host, lat_ms,"
    "  SUM(c) OVER (PARTITION BY host ORDER BY lat_ms) AS cum,"
    "  SUM(c) OVER (PARTITION BY host) AS tot FROM hist)"
    " SELECT host, CAST(MAX(tot) AS BIGINT) AS n,"
    "  CAST(MIN(CASE WHEN cum * 1000 >= 500 * tot THEN lat_ms END) AS BIGINT) AS p500,"
    "  CAST(MIN(CASE WHEN cum * 1000 >= 950 * tot THEN lat_ms END) AS BIGINT) AS p950,"
    "  CAST(MIN(CASE WHEN cum * 1000 >= 990 * tot THEN lat_ms END) AS BIGINT) AS p990"
    " FROM cum GROUP BY host",
)
def fetch_latency_percentiles(spark, sf):
    """Per-host p50/p95/p99 fetch latency via the exact histogram
    percentile operator — never a per-host sort of raw fetch rows."""
    from .operators import sketches as SK

    e = _t(spark, sf, "events")
    src = e.select(
        F.concat(
            F.lit("h"), F.pmod("user_id", F.lit(20)).cast("string"), F.lit(".example")
        ).alias("host"),
        F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("long").alias("lat_ms"),
    )
    return SK.exact_percentiles(src, "host", "lat_ms", (500, 950, 990))


# DUST rule mining (operators/dust.py): per-host substring
# substitution rules recovered from content-fingerprint duplicate
# groups (DustBuster, WWW'07).  The synthetic corpus mints each story
# under its canonical spelling plus one of two generated aliases
# ("?id=" for "/", trailing "/index.html"); the miner must recover
# exactly those two rules per host.  The oracle replays the star
# pairing, both monotone-trick LCPs (plain + reversed) and the
# overlap clamp character-for-character.
@q(
    "crawl_dust_rules",
    "WITH src AS (SELECT 'h' || ((doc_id // 2) % 7) || '.example' AS host,"
    "  'f' || (doc_id // 2) AS fp,"
    "  CASE WHEN doc_id % 2 = 0 THEN 'https://h' || ((doc_id // 2) % 7)"
    "    || '.example/story/' || (doc_id // 2)"
    "   WHEN doc_id % 4 = 1 THEN 'https://h' || ((doc_id // 2) % 7)"
    "    || '.example/story?id=' || (doc_id // 2)"
    "   ELSE 'https://h' || ((doc_id // 2) % 7) || '.example/story/'"
    "    || (doc_id // 2) || '/index.html' END AS url FROM documents),"
    " canon AS (SELECT host, fp, MIN(url) AS canon_url FROM src GROUP BY 1, 2),"
    " pairs AS (SELECT s.host, canon_url, url AS alias_url FROM src s"
    "  JOIN canon c USING (host, fp) WHERE url <> canon_url),"
    " m AS (SELECT host, alias_url, canon_url,"
    "  len(list_filter(generate_series(1, least(length(alias_url),"
    "   length(canon_url))), i -> alias_url[1:i] = canon_url[1:i])) AS lp,"
    "  len(list_filter(generate_series(1, least(length(alias_url),"
    "   length(canon_url))), i -> reverse(alias_url)[1:i] ="
    "   reverse(canon_url)[1:i])) AS ls_raw FROM pairs),"
    " r AS (SELECT host, alias_url,"
    "  alias_url[lp+1 : length(alias_url) - least(ls_raw,"
    "   length(alias_url)-lp, length(canon_url)-lp)] AS alpha,"
    "  canon_url[lp+1 : length(canon_url) - least(ls_raw,"
    "   length(alias_url)-lp, length(canon_url)-lp)] AS beta FROM m)"
    " SELECT host, alpha, beta, CAST(COUNT(*) AS BIGINT) AS support,"
    "  MIN(alias_url) AS example_alias"
    " FROM r GROUP BY 1, 2, 3 HAVING COUNT(*) >= 2",
)
def crawl_dust_rules(spark, sf):
    """Mine the two planted per-host URL-rewrite rules from exact
    content-duplicate groups."""
    from .operators.dust import dust_rules

    d = _t(spark, sf, "documents")
    k = F.expr("doc_id div 2")
    host = F.concat(
        F.lit("h"), F.pmod(k, F.lit(7)).cast("string"), F.lit(".example")
    )
    base = F.concat(F.lit("https://"), host, F.lit("/story"))
    url = (
        F.when(
            F.pmod("doc_id", F.lit(2)) == 0,
            F.concat(base, F.lit("/"), k.cast("string")),
        )
        .when(
            F.pmod("doc_id", F.lit(4)) == 1,
            F.concat(base, F.lit("?id="), k.cast("string")),
        )
        .otherwise(
            F.concat(base, F.lit("/"), k.cast("string"), F.lit("/index.html"))
        )
    )
    src = d.select(
        host.alias("host"),
        F.concat(F.lit("f"), k.cast("string")).alias("fp"),
        url.alias("url"),
    )
    return dust_rules(src, "url", "host", "fp", min_support=2)


# BPE tokenizer fitting (operators/bpe.py): the driver entry checks
# the per-iteration workhorse — freq-weighted adjacent-symbol pair
# counts over the word-TYPE table (Zipf-small working set) — with a
# full value oracle; the iterative merge loop itself is pytest-
# refereed against the classic single-machine implementation (merge
# sequences equal, deterministic under repartition).
@q(
    "bpe_pair_counts",
    "WITH w AS (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))"
    "  AS word FROM documents),"
    " t AS (SELECT word, count(*) AS freq FROM w GROUP BY word),"
    " s AS (SELECT word, freq, list_append(list_filter(string_split(word, ''),"
    "  c -> c <> ''), '</w>') AS syms FROM t),"
    " p AS (SELECT freq, syms[i] AS a, syms[i+1] AS b FROM s,"
    "  unnest(generate_series(1, len(syms) - 1)) AS u(i))"
    " SELECT a, b, CAST(SUM(freq) AS BIGINT) AS pair_freq FROM p GROUP BY a, b",
)
def bpe_pair_counts(spark, sf):
    """First BPE iteration's pair statistics over the corpus word
    types — the aggregate every merge round re-runs."""
    from .operators.bpe import _initial_symbols, _pair_counts, word_types

    d = _t(spark, sf, "documents")
    return _pair_counts(_initial_symbols(word_types(d)))


# PCM audio segmentation (operators/multimodal.py audio_segments):
# 100 ms block-aligned byte windows over the synthesized WAV corpus.
# The oracle predicts every offset/length analytically from doc_id
# (time axis == byte axis for PCM); the actual segment BYTES and the
# concat-reconstruction property are pytest-asserted (binary columns
# don't cross the driver compare).
@q(
    "mm_audio_segments",
    "WITH p AS (SELECT doc_id AS media_id,"
    "  (8000 + (doc_id % 4) * 4000) AS rate, (doc_id % 2 + 1) * 2 AS block,"
    "  ((doc_id % 50) + 1) * 100 * ((doc_id % 2 + 1) * 2) AS data_bytes"
    "  FROM documents),"
    " q AS (SELECT media_id, rate * block AS byte_rate,"
    "  (rate // 10) * block AS segb, data_bytes FROM p),"
    " s AS (SELECT media_id, byte_rate, segb, data_bytes, CAST(i AS BIGINT)"
    "  AS seg_idx FROM q,"
    "  unnest(generate_series(0, (data_bytes + segb - 1) // segb - 1)) AS u(i))"
    " SELECT media_id, seg_idx, CAST(seg_idx * segb AS BIGINT) AS seg_offset,"
    "  CAST(least(segb, data_bytes - seg_idx * segb) AS BIGINT) AS seg_bytes,"
    "  CAST(least(segb, data_bytes - seg_idx * segb) * 1000 // byte_rate"
    "  AS BIGINT) AS seg_ms FROM s",
)
def mm_audio_segments(spark, sf):
    """100 ms PCM segments over real WAV bytes — offsets and lengths
    value-checked analytically; byte content pytest-asserted."""
    d = _t(spark, sf, "documents")
    return MM.audio_segments(MM.synth_wav(d), 100).drop("seg_blob")


# Full Gopher structural-quality rule set (functions/text.py
# gopher_stats): every doc gets bullet/ellipsis line structure
# injected closed-form from doc_id so the line rules actually fire,
# then all seven rule inputs plus the composite keep are compared as
# exact integers.
@q(
    "text_gopher_rules",
    "WITH d AS (SELECT doc_id,"
    "  (CASE WHEN doc_id % 5 = 0 THEN '• bullet intro' || chr(10) ELSE '' END)"
    "  || text ||"
    "  (CASE WHEN doc_id % 7 = 0 THEN chr(10) || 'trailing line...' ELSE '' END)"
    "  AS text FROM documents),"
    " t AS (SELECT doc_id, text,"
    "  list_filter(string_split(replace(text, chr(10), ' '), ' '), x -> x <> '') AS tk,"
    "  string_split(text, chr(10)) AS lines FROM d),"
    " s AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_words,"
    "  (list_sum(list_transform(tk, w -> length(w))) * 1000) // len(tk) AS mean_wlen_milli,"
    "  ((len(regexp_extract_all(text, '#')) + len(regexp_extract_all(text, '\\.\\.\\.')))"
    "   * 1000) // len(tk) AS symbol_milli,"
    "  (len(list_filter(lines, l -> l LIKE '•%' OR l LIKE '- %')) * 1000)"
    "   // len(lines) AS bullet_milli,"
    "  (len(list_filter(lines, l -> l LIKE '%...')) * 1000) // len(lines)"
    "   AS ellipsis_milli,"
    "  (len(list_filter(tk, w -> regexp_matches(w, '[A-Za-z]'))) * 1000)"
    "   // len(tk) AS alpha_milli,"
    "  CAST(len(list_filter(['the','be','to','of','and','that','have','with'],"
    "   s -> list_contains(tk, s))) AS BIGINT) AS stop_hits FROM t)"
    " SELECT doc_id, n_words, CAST(mean_wlen_milli AS BIGINT) AS mean_wlen_milli,"
    "  CAST(symbol_milli AS BIGINT) AS symbol_milli,"
    "  CAST(bullet_milli AS BIGINT) AS bullet_milli,"
    "  CAST(ellipsis_milli AS BIGINT) AS ellipsis_milli,"
    "  CAST(alpha_milli AS BIGINT) AS alpha_milli, stop_hits,"
    "  n_words >= 50 AND n_words <= 100000 AND mean_wlen_milli >= 3000"
    "  AND mean_wlen_milli <= 10000 AND symbol_milli <= 100"
    "  AND bullet_milli <= 100 AND ellipsis_milli <= 300"
    "  AND alpha_milli >= 800 AND stop_hits >= 2 AS keep FROM s",
)
def text_gopher_rules(spark, sf):
    """The published Gopher structural-quality gate, integer-exact."""
    d = _t(spark, sf, "documents")
    text2 = F.concat(
        F.when(F.pmod("doc_id", F.lit(5)) == 0, F.lit("• bullet intro\n")).otherwise(
            F.lit("")
        ),
        F.col("text"),
        F.when(
            F.pmod("doc_id", F.lit(7)) == 0, F.lit("\ntrailing line...")
        ).otherwise(F.lit("")),
    )
    t = d.select("doc_id", text2.alias("_t2"))
    stats = T.gopher_stats(F.col("_t2"))
    return t.select("doc_id", *[c.alias(n) for n, c in stats.items()])


# RSS feed-item parse (functions/feeds.py) — the page graph's third
# tier (show -> episode -> RSS feed).  Each doc synthesizes a feed of
# 1-3 <item> blocks closed-form from doc_id; the Spark side round-trips
# the XML through the built-in JVM xpath expression (title, enclosure
# url/length, RFC-822 pubDate -> epoch, guid) while the oracle predicts
# every field analytically — so the xpath extraction, the long cast and
# the RFC-822 parse are all value-checked, not just row-counted.
_RSS_ITEMS_ORACLE = (
    "WITH j AS (SELECT doc_id, p FROM documents"
    "  CROSS JOIN generate_series(0, 2) t(p) WHERE p < doc_id % 3 + 1)"
    " SELECT doc_id, CAST(p AS BIGINT) AS pos,"
    "  'Ep ' || doc_id || '-' || p AS title,"
    "  'https://cdn' || (doc_id % 5) || '.example/audio/' || doc_id"
    "   || '/' || p || '.mp3' AS audio_url,"
    "  CAST(1000000 + doc_id * 37 + p AS BIGINT) AS length_bytes,"
    "  CAST(1767571200 + doc_id * 3600 + p * 60 AS BIGINT) AS pub_epoch,"
    "  'g-' || doc_id || '-' || p AS guid FROM j"
)


def _rss_feed_xml(d):
    """(doc_id, _xml): the synthetic 1-3-item feed, shared by the
    xpath entry, the regex fast twin, and their common oracle."""
    did = F.col("doc_id").cast("string")

    def item(i: int):
        epoch = F.lit(1767571200) + F.col("doc_id") * 3600 + F.lit(i * 60)
        return F.when(
            F.lit(i) < F.pmod("doc_id", F.lit(3)) + 1,
            F.concat(
                F.lit("<item><title>Ep "), did, F.lit(f"-{i}</title>"),
                F.lit('<enclosure url="https://cdn'),
                F.pmod("doc_id", F.lit(5)).cast("string"),
                F.lit(".example/audio/"), did, F.lit(f"/{i}.mp3"),
                F.lit('" length="'),
                (F.lit(1000000) + F.col("doc_id") * 37 + F.lit(i)).cast("string"),
                F.lit('" type="audio/mpeg"/><pubDate>Mon, '),
                F.date_format(
                    F.timestamp_seconds(epoch), "dd MMM yyyy HH:mm:ss 'GMT'"
                ),
                F.lit("</pubDate><guid>g-"), did, F.lit(f"-{i}</guid></item>"),
            ),
        ).otherwise(F.lit(""))

    xml = F.concat(
        F.lit("<rss><channel><title>Show</title>"),
        item(0), item(1), item(2),
        F.lit("</channel></rss>"),
    )
    # materialize the XML once: the field scans reference `_xml` as a
    # plain attribute, so CollapseProject keeps ONE synthesis instead
    # of inlining the concat into every parse arg
    return d.select("doc_id", xml.alias("_xml"))


def _rss_items_flat(x, parser):
    t = x.select("doc_id", parser(F.col("_xml")).alias("_items"))
    return t.select("doc_id", F.posexplode("_items").alias("pos", "_it")).select(
        "doc_id",
        F.col("pos").cast("long").alias("pos"),
        F.col("_it.title").alias("title"),
        F.col("_it.audio_url").alias("audio_url"),
        F.col("_it.length_bytes").alias("length_bytes"),
        F.col("_it.pub_epoch").alias("pub_epoch"),
        F.col("_it.guid").alias("guid"),
    )


@q("rss_feed_items", _RSS_ITEMS_ORACLE)
def rss_feed_items(spark, sf):
    """Podcast RSS -> episode rows via JVM xpath (zero shuffle)."""
    d = _t(spark, sf, "documents")
    return _rss_items_flat(_rss_feed_xml(d), FD.parse_feed_items)


@q("rss_feed_items_fast", _RSS_ITEMS_ORACLE)
def rss_feed_items_fast(spark, sf):
    """Regex fast twin (functions/feeds.py parse_feed_items_regex):
    identical output on well-formed feeds, same oracle, a fraction of
    the xpath DOM cost — the headline bench entry."""
    d = _t(spark, sf, "documents")
    return _rss_items_flat(_rss_feed_xml(d), FD.parse_feed_items_regex)


# Redirect-chain resolution (operators/redirects.py).  Chains of
# length doc_id%6 plus 3-cycles on doc_id%13==0, resolved with
# max_hops=4 so all three outcomes occur: resolved (remaining <= 4),
# truncated-by-cap (the depth-0 source of a length-5 chain), and
# truncated-by-cycle.  The oracle predicts final URL, exact hop count
# and status analytically per source.
@q(
    "crawl_redirect_resolve",
    "WITH d AS (SELECT doc_id, doc_id % 6 AS L FROM documents),"
    " chain AS (SELECT doc_id, L, i FROM d"
    "  CROSS JOIN generate_series(0, 5) t(i) WHERE i < L),"
    " c AS (SELECT 'https://r.example/c/' || doc_id || '/' || i AS src_url,"
    "  CASE WHEN L - i <= 4 THEN 'https://r.example/c/' || doc_id || '/' || L"
    "   END AS final_url,"
    "  CASE WHEN L - i <= 4 THEN CAST(L - i AS BIGINT) END AS hops,"
    "  CASE WHEN L - i <= 4 THEN 'resolved' ELSE 'truncated' END AS status"
    "  FROM chain),"
    " cyc AS (SELECT 'https://loop.example/' || doc_id || '/' || i AS src_url,"
    "  CAST(NULL AS VARCHAR) AS final_url, CAST(NULL AS BIGINT) AS hops,"
    "  'truncated' AS status FROM documents"
    "  CROSS JOIN generate_series(0, 2) t(i) WHERE doc_id % 13 = 0)"
    " SELECT * FROM c UNION ALL SELECT * FROM cyc",
)
def crawl_redirect_resolve(spark, sf):
    """Pointer-doubling redirect resolution: 2 composition joins for
    the 4-hop cap instead of 4 naive rounds; loop detection by cap."""
    from .operators.redirects import resolve_redirects

    d = _t(spark, sf, "documents").select(
        "doc_id", F.pmod("doc_id", F.lit(6)).alias("_L")
    )
    did = F.col("doc_id").cast("string")

    def cnode(i):
        return F.concat(F.lit("https://r.example/c/"), did, F.lit("/"), i)

    chains = (
        d.where(F.col("_L") > 0)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.col("_L") - 1)).alias("_i"),
        )
        .select(
            cnode(F.col("_i").cast("string")).alias("src_url"),
            cnode((F.col("_i") + 1).cast("string")).alias("dst_url"),
        )
    )

    def lnode(i):
        return F.concat(F.lit("https://loop.example/"), did, F.lit("/"), i)

    cycles = (
        d.where(F.pmod("doc_id", F.lit(13)) == 0)
        .select("doc_id", F.explode(F.sequence(F.lit(0), F.lit(2))).alias("_i"))
        .select(
            lnode(F.col("_i").cast("string")).alias("src_url"),
            lnode(F.pmod(F.col("_i") + 1, F.lit(3)).cast("string")).alias("dst_url"),
        )
    )
    return resolve_redirects(chains.unionByName(cycles), max_hops=4)


# AIMD adaptive crawl-delay (operators/politeness.py:adaptive_delay):
# per-host delay tuned from observed error share / latency, all
# integer so the controller replays exactly in SQL.  Host classes are
# engineered so all three actions fire: user_id%20<3 hosts throw 200
# per-mille errors (backoff), small-modulus-latency hosts run fast
# (decrease), 'x' hosts have traffic but no delay row (default), h20+
# delay rows see no traffic (hold).
@q(
    "politeness_adaptive_delay",
    "WITH log AS (SELECT CASE WHEN event_id % 13 = 0 THEN 'x' || (user_id % 3)"
    " ELSE 'h' || (user_id % 20) END AS host,"
    " CASE WHEN user_id % 20 < 3 THEN (event_id % 5 <> 0) ELSE TRUE END AS ok,"
    " 50 + (event_id % (100 + (user_id % 20) * 20)) AS lat FROM events),"
    " st AS (SELECT host, sum(CASE WHEN ok THEN 1 ELSE 0 END) AS n_ok,"
    " sum(CASE WHEN ok THEN 0 ELSE 1 END) AS n_err, sum(lat) AS ls,"
    " count(*) AS n FROM log GROUP BY host),"
    " dl AS (SELECT 'h' || doc_id AS host, 100 * (doc_id + 1) AS dly"
    " FROM documents WHERE doc_id < 25),"
    " j AS (SELECT COALESCE(dl.host, st.host) AS host, dly, n_ok, n_err,"
    " ls, n FROM dl FULL OUTER JOIN st ON dl.host = st.host),"
    " c AS (SELECT host, COALESCE(dly, 1000) AS cur, n_ok, n_err,"
    " (1000 * n_err) // (n_ok + n_err) AS em, ls // n AS ml, n FROM j)"
    " SELECT host, CAST(CASE WHEN n IS NULL THEN cur"
    " WHEN em > 100 THEN least(cur * 2, 60000)"
    " WHEN ml < 200 THEN greatest(cur - 50, 100)"
    " ELSE cur END AS BIGINT) AS delay_ms,"
    " CAST(COALESCE(n_ok, 0) AS BIGINT) AS n_ok,"
    " CAST(COALESCE(n_err, 0) AS BIGINT) AS n_err,"
    " CAST(COALESCE(em, 0) AS BIGINT) AS err_milli,"
    " CAST(COALESCE(ml, -1) AS BIGINT) AS mean_latency_ms,"
    " CASE WHEN n IS NULL THEN 'hold' WHEN em > 100 THEN 'backoff'"
    " WHEN ml < 200 THEN 'decrease' ELSE 'hold' END AS action FROM c",
)
def politeness_adaptive_delay(spark, sf):
    """AIMD delay controller over a synthesized fetch log + delay
    table (TCP-style: multiplicative backoff, additive decrease)."""
    from .operators.politeness import adaptive_delay

    e = _t(spark, sf, "events")
    host = F.when(
        F.pmod("event_id", F.lit(13)) == 0,
        F.concat(F.lit("x"), F.pmod("user_id", F.lit(3)).cast("string")),
    ).otherwise(F.concat(F.lit("h"), F.pmod("user_id", F.lit(20)).cast("string")))
    ok = F.when(
        F.pmod("user_id", F.lit(20)) < 3, F.pmod("event_id", F.lit(5)) != 0
    ).otherwise(F.lit(True))
    lat = (
        F.lit(50)
        + F.pmod("event_id", F.lit(100) + F.pmod("user_id", F.lit(20)) * 20)
    ).cast("long")
    log = e.select(host.alias("host"), ok.alias("ok"), lat.alias("latency_ms"))
    dl = (
        _t(spark, sf, "documents")
        .where(F.col("doc_id") < 25)
        .select(
            F.concat(F.lit("h"), F.col("doc_id").cast("string")).alias("host"),
            (100 * (F.col("doc_id") + 1)).cast("long").alias("delay_ms"),
        )
    )
    return adaptive_delay(log, dl)


# Soft-404 detection (functions/sniff.py): error pages served with
# HTTP 200.  Five page shapes x honest-status override; the oracle
# replays the title/body regexes and the thin-page gate.
@q(
    "crawl_soft404_detect",
    "WITH p AS (SELECT doc_id,"
    " CASE WHEN doc_id % 11 = 0 THEN 404 ELSE 200 END AS status,"
    " CASE doc_id % 5"
    "  WHEN 0 THEN '<html><title>404 Not Found</title><body>gone</body>'"
    "  WHEN 1 THEN '<html><title>Oops</title><body>Page not found.</body>'"
    "  WHEN 2 THEN '<html><title>History</title><body>an essay: not found"
    " pages through the ages. ' || text || '</body>'"
    "  WHEN 3 THEN '<html><title>Hi</title><body>ok</body>'"
    "  ELSE '<html><body>' || text || '</body>' END AS html FROM documents),"
    " r AS (SELECT doc_id, status, CASE WHEN status = 200 THEN"
    " CASE WHEN regexp_matches(regexp_extract(html,"
    " '(?i)<title>([^<]*)</title>', 1),"
    " '(?i)(page not found|not found|error 404|404 error|does not exist"
    "|no longer available|been removed)') THEN 'title'"
    " WHEN regexp_matches(html,"
    " '(?i)(page not found|not found|error 404|404 error|does not exist"
    "|no longer available|been removed)') AND strlen(html) < 512"
    " THEN 'thin-body' END END AS reason FROM p)"
    " SELECT doc_id, CAST(status AS INT) AS status, reason,"
    " CAST(CASE WHEN reason IS NULL THEN 0 ELSE 1 END AS INT) AS is_soft"
    " FROM r",
)
def crawl_soft404_detect(spark, sf):
    """Soft-404 heuristics over synthesized fetch results; honest 4xx
    statuses are exempt."""
    from .functions.sniff import soft404_reason

    d = _t(spark, sf, "documents")
    m5 = F.pmod("doc_id", F.lit(5))
    status = F.when(F.pmod("doc_id", F.lit(11)) == 0, F.lit(404)).otherwise(
        F.lit(200)
    )
    html = (
        F.when(m5 == 0, F.lit("<html><title>404 Not Found</title><body>gone</body>"))
        .when(m5 == 1, F.lit("<html><title>Oops</title><body>Page not found.</body>"))
        .when(
            m5 == 2,
            F.concat(
                F.lit(
                    "<html><title>History</title><body>an essay: not found"
                    " pages through the ages. "
                ),
                F.col("text"),
                F.lit("</body>"),
            ),
        )
        .when(m5 == 3, F.lit("<html><title>Hi</title><body>ok</body>"))
        .otherwise(F.concat(F.lit("<html><body>"), F.col("text"), F.lit("</body>")))
    )
    reason = soft404_reason(status, html)
    return d.select(
        "doc_id",
        status.cast("int").alias("status"),
        reason.alias("reason"),
        F.when(reason.isNull(), F.lit(0)).otherwise(F.lit(1)).cast("int").alias("is_soft"),
    )


# Rendezvous (HRW) shard assignment (operators/sharding.py): the
# frontier's elastic-resharding primitive.  The arithmetic weight
# family is replayed literally in the oracle; ties break to the first
# max on both engines (array_position / list_position).
def _rendezvous_oracle(n_shards: int = 16) -> str:
    from .operators.sharding import shard_params
    from .operators.similarity import SIMHASH_M

    P, Q = shard_params(n_shards)
    lw = ", ".join(f"(cs * {P[i]} + {Q[i]}) % {SIMHASH_M}" for i in range(n_shards))
    return (
        "WITH u AS (SELECT 'https://h' || (doc_id % 7) || '.example.com/p/'"
        " || doc_id AS url FROM documents),"
        " w AS (SELECT url, CAST(list_sum(list_transform(string_split(url, ''),"
        " c -> ascii(c))) AS BIGINT) AS cs FROM u),"
        f" l AS (SELECT url, list_value({lw}) AS lw FROM w)"
        " SELECT url, CAST(list_position(lw, list_aggregate(lw, 'max')) - 1"
        " AS INT) AS shard FROM l"
    )


@q("frontier_rendezvous_shard", _rendezvous_oracle())
def frontier_rendezvous_shard(spark, sf):
    """HRW shard of every frontier URL over 16 shards (arithmetic
    weight family; xxhash64 twin shares the plan shape)."""
    from .operators.sharding import rendezvous_shard_arith

    u = _t(spark, sf, "documents").select(
        F.concat(
            F.lit("https://h"),
            F.pmod("doc_id", F.lit(7)).cast("string"),
            F.lit(".example.com/p/"),
            F.col("doc_id").cast("string"),
        ).alias("url")
    )
    return rendezvous_shard_arith(u, "url", 16)


# rel=canonical alias extraction + chain collapse
# (operators/canonical.py).  Pages synthesized from documents declare:
# doc 3 <-> doc 9 a canonical CYCLE (truncated); doc_id%3==1 an
# absolute canonical to url(doc_id+1) whose target (%3==2) declares a
# root-RELATIVE canonical onto its own host (2-hop chain, exercises
# resolve_href); doc_id%6==0 a self-canonical (dropped: confirmation,
# not an edge); the rest none.  By construction no chain exceeds 2
# hops (the %3==2 target is off-graph: host h(i%7) never equals
# h((i-1)%7)), so the oracle collapses chains with two LEFT JOINs and
# calls any survivor truncated.  The oracle replays the REGEXES over
# the html, not just the href construction.
_CANON_URL = "'https://h' || ({i} % 7) || '.example.com/p/' || {i}"


@q(
    "crawl_canonical_alias",
    "WITH d AS (SELECT doc_id, text,"
    f" {_CANON_URL.format(i='doc_id')} AS url,"
    " CASE WHEN doc_id = 3 THEN " + _CANON_URL.format(i="9") +
    " WHEN doc_id = 9 THEN " + _CANON_URL.format(i="3") +
    " WHEN doc_id % 3 = 1 THEN " + _CANON_URL.format(i="(doc_id+1)") +
    " WHEN doc_id % 3 = 2 THEN '/p/' || (doc_id - 1)"
    " WHEN doc_id % 6 = 0 THEN " + _CANON_URL.format(i="doc_id") +
    " END AS hd FROM documents),"
    " pg AS (SELECT url, CASE WHEN hd IS NULL THEN"
    " '<html><head></head><body>' || text"
    " ELSE '<html><head><link rel=\"canonical\" href=\"' || hd ||"
    " '\"/></head><body>' || text END AS html FROM d),"
    " x AS (SELECT url, coalesce("
    " nullif(regexp_extract(tag, '(?:^|[\\s\"''])href\\s*=\\s*\"([^\"]*)\"', 1), ''),"
    " nullif(regexp_extract(tag, '(?:^|[\\s\"''])href\\s*=\\s*''([^'']*)''', 1), '')"
    " ) AS href FROM (SELECT url, regexp_extract(html,"
    " '<link[^>]*[\\s\"'']rel\\s*=\\s*[\"'']?canonical\\b[^>]*>', 0) AS tag"
    " FROM pg)),"
    " e AS (SELECT url AS src, CASE WHEN href LIKE '/%' AND href NOT LIKE '//%'"
    " THEN regexp_extract(url, '^(https://[^/]+)', 1) || href"
    " ELSE href END AS dst FROM x WHERE href IS NOT NULL),"
    " e2 AS (SELECT src, dst FROM e WHERE dst <> src),"
    " r AS (SELECT a.src, a.dst AS d1, b.dst AS d2, c.src AS c3"
    " FROM e2 a LEFT JOIN e2 b ON a.dst = b.src"
    " LEFT JOIN e2 c ON b.dst = c.src)"
    " SELECT src AS src_url,"
    " CASE WHEN d2 IS NULL THEN d1 WHEN c3 IS NULL THEN d2 END AS final_url,"
    " CASE WHEN d2 IS NULL THEN CAST(1 AS BIGINT)"
    " WHEN c3 IS NULL THEN CAST(2 AS BIGINT) END AS hops,"
    " CASE WHEN d2 IS NULL OR c3 IS NULL THEN 'resolved'"
    " ELSE 'truncated' END AS status FROM r",
)
def crawl_canonical_alias(spark, sf):
    """rel=canonical extraction (codegen regex), base resolution, and
    pointer-doubling chain collapse into (alias -> canonical final)."""
    from .operators.canonical import resolve_canonical

    d = _t(spark, sf, "documents")
    did = F.col("doc_id")

    def url(i):
        return F.concat(
            F.lit("https://h"),
            F.pmod(i, F.lit(7)).cast("string"),
            F.lit(".example.com/p/"),
            i.cast("string"),
        )

    href = (
        F.when(did == 3, url(F.lit(9)))
        .when(did == 9, url(F.lit(3)))
        .when(F.pmod(did, F.lit(3)) == 1, url(did + 1))
        .when(
            F.pmod(did, F.lit(3)) == 2,
            F.concat(F.lit("/p/"), (did - 1).cast("string")),
        )
        .when(F.pmod(did, F.lit(6)) == 0, url(did))
    )
    html = F.when(
        href.isNull(),
        F.concat(F.lit("<html><head></head><body>"), F.col("text")),
    ).otherwise(
        F.concat(
            F.lit('<html><head><link rel="canonical" href="'),
            href,
            F.lit('"/></head><body>'),
            F.col("text"),
        )
    )
    pages = d.select(url(did).alias("url"), html.alias("html"))
    return resolve_canonical(pages, max_hops=8)


# Content sniffing (functions/sniff.py): eight byte-level blob classes
# (BOM'd HTML, meta-charset HTML, PDF, PNG, GIF, gzip, XML, UTF-16LE
# BOM) are synthesized as REAL bytes on the Spark side and routed by
# the sniffer; the oracle states the expected routing analytically.
@q(
    "content_sniff_route",
    "SELECT doc_id,"
    " CASE doc_id % 8"
    "  WHEN 0 THEN 'text/html' WHEN 1 THEN 'text/html'"
    "  WHEN 2 THEN 'application/pdf' WHEN 3 THEN 'image/png'"
    "  WHEN 4 THEN 'image/gif' WHEN 5 THEN 'application/gzip'"
    "  WHEN 6 THEN 'application/xml' ELSE 'text/plain' END AS mime,"
    " CASE doc_id % 8"
    "  WHEN 0 THEN 'utf-8' WHEN 1 THEN 'windows-1251'"
    "  WHEN 7 THEN 'utf-16le' ELSE NULL END AS charset"
    " FROM documents",
)
def content_sniff_route(spark, sf):
    """Magic-byte + BOM + meta-charset routing over real bytes."""
    from .functions import sniff as SN

    d = _t(spark, sf, "documents")
    enc = lambda s: F.encode(F.lit(s), "UTF-8")  # noqa: E731
    m8 = F.pmod("doc_id", F.lit(8))
    blob = (
        F.when(
            m8 == 0,
            F.concat(
                F.unhex(F.lit("EFBBBF")),
                enc('<!DOCTYPE html><head><meta charset="UTF-8"></head>'),
            ),
        )
        .when(
            m8 == 1,
            enc(
                '<html><head><meta http-equiv="Content-Type"'
                ' content="text/html; charset=Windows-1251">'
            ),
        )
        .when(m8 == 2, enc("%PDF-1.7 synthetic"))
        .when(m8 == 3, F.concat(F.unhex(F.lit("89504E470D0A1A0A")), enc("px")))
        .when(m8 == 4, F.concat(enc("GIF89a"), F.unhex(F.lit("00FF00FF"))))
        .when(m8 == 5, F.concat(F.unhex(F.lit("1F8B08")), enc("gzbody")))
        .when(m8 == 6, enc('<?xml version="1.0"?><rss version="2.0"></rss>'))
        .otherwise(F.concat(F.unhex(F.lit("FFFE")), enc("u16 payload")))
    )
    t = d.select("doc_id", SN.sniff_content(blob).alias("_s"))
    return t.select(
        "doc_id", F.col("_s.mime").alias("mime"), F.col("_s.charset").alias("charset")
    )


# Revalidation planning (operators/revalidate.py).  History exists for
# doc%3!=0; age = (doc%100)*100 s against ttl 5000 s decides skip;
# stale rows go conditional iff a validator exists (etag on odd docs,
# last-modified on doc%4==2), else re-fetch.  The oracle replays the
# whole decision table, including which validator rides along.
@q(
    "crawl_revalidation_plan",
    "WITH s AS (SELECT doc_id,"
    "  'https://h' || (doc_id % 20) || '.example/p/' || doc_id AS url"
    "  FROM documents),"
    " a AS (SELECT doc_id, url,"
    "  CASE WHEN doc_id % 3 = 0 THEN 'fetch'"
    "   WHEN doc_id % 100 < 50 THEN 'skip'"
    "   WHEN doc_id % 2 = 1 OR doc_id % 4 = 2 THEN 'conditional'"
    "   ELSE 'fetch' END AS action FROM s)"
    " SELECT url, action,"
    "  CASE WHEN action = 'conditional' AND doc_id % 2 = 1"
    "   THEN '\"e' || doc_id || '\"' END AS etag,"
    "  CASE WHEN action = 'conditional' AND doc_id % 4 = 2"
    "   THEN 'lm-' || doc_id END AS last_modified FROM a",
)
def crawl_revalidation_plan(spark, sf):
    """fetch / conditional-GET / skip per scheduled URL (one url join)."""
    from .operators.revalidate import revalidation_plan

    d = _t(spark, sf, "documents")
    did = F.col("doc_id").cast("string")
    url = F.concat(
        F.lit("https://h"),
        F.pmod("doc_id", F.lit(20)).cast("string"),
        F.lit(".example/p/"),
        did,
    )
    schedule = d.select(url.alias("url"))
    history = (
        d.where(F.pmod("doc_id", F.lit(3)) != 0)
        .select(
            url.alias("url"),
            F.when(
                F.pmod("doc_id", F.lit(2)) == 1,
                F.concat(F.lit('"e'), did, F.lit('"')),
            ).alias("etag"),
            F.when(
                F.pmod("doc_id", F.lit(4)) == 2, F.concat(F.lit("lm-"), did)
            ).alias("last_modified"),
            (F.lit(1000000) - F.pmod("doc_id", F.lit(100)) * 100)
            .cast("long")
            .alias("fetched_ts"),
            F.concat(F.lit("fp"), did).alias("fingerprint"),
        )
    )
    return revalidation_plan(schedule, history, now_ts=1000000, ttl_s=5000)


# Mojibake detection (functions/text.py mojibake_*): four injection
# classes (clean / curly-quote / 2-byte letters / NBSP+lost-char) are
# appended closed-form; both engines run the IDENTICAL alternation over
# the same final string, so hit counts and per-milles match exactly.
@q(
    "text_mojibake_score",
    "WITH t AS (SELECT doc_id, text ||"
    "  CASE doc_id % 4 WHEN 1 THEN ' donâ€™t'"
    "   WHEN 2 THEN ' CafÃ© MÃ¼nchen' WHEN 3 THEN ' Â° ï¿½'"
    "   ELSE '' END AS tx FROM documents)"
    " SELECT doc_id, CAST(length(tx) AS BIGINT) AS n_chars,"
    "  CAST(len(regexp_extract_all(tx, 'Ã.|â€.|Â.|ï¿½')) AS BIGINT) AS moji_hits,"
    "  CAST(len(regexp_extract_all(tx, 'Ã.|â€.|Â.|ï¿½')) * 1000"
    "   // length(tx) AS BIGINT) AS moji_milli FROM t",
)
def text_mojibake_score(spark, sf):
    """Encoding-damage quality signal, integer-exact both engines."""
    d = _t(spark, sf, "documents")
    tx = F.concat(
        F.col("text"),
        F.when(F.pmod("doc_id", F.lit(4)) == 1, F.lit(" donâ€™t"))
        .when(F.pmod("doc_id", F.lit(4)) == 2, F.lit(" CafÃ© MÃ¼nchen"))
        .when(F.pmod("doc_id", F.lit(4)) == 3, F.lit(" Â° ï¿½"))
        .otherwise(F.lit("")),
    )
    t = d.select("doc_id", tx.alias("_tx"))
    return t.select(
        "doc_id",
        F.length("_tx").cast("long").alias("n_chars"),
        T.mojibake_hits(F.col("_tx")).alias("moji_hits"),
        T.mojibake_milli(F.col("_tx")).alias("moji_milli"),
    )


# HTML entity decoding (functions/text.py html_unescape_basic): the
# oracle replays the identical ordered replace chain ('&amp;' last, so
# the injected double-escape '&amp;lt;b&amp;gt;' decodes to literal
# '&lt;b&gt;' in BOTH engines — the single-pass-decoder semantics).
@q(
    "text_html_unescape",
    "SELECT doc_id,"
    " replace(replace(replace(replace(replace(replace(replace(replace("
    "  text || CASE doc_id % 3"
    "   WHEN 1 THEN ' Tom &amp; Jerry &lt;3 &quot;quoted&quot;'"
    "   WHEN 2 THEN ' it&#39;s&nbsp;here &amp;lt;b&amp;gt;'"
    "   ELSE '' END,"
    "  '&lt;', '<'), '&gt;', '>'), '&quot;', '\"'), '&apos;', ''''),"
    "  '&#39;', ''''), '&#34;', '\"'), '&nbsp;', ' '), '&amp;', '&')"
    " AS decoded FROM documents",
)
def text_html_unescape(spark, sf):
    """C4-style entity cleanup as one codegen replace chain."""
    d = _t(spark, sf, "documents")
    tx = F.concat(
        F.col("text"),
        F.when(
            F.pmod("doc_id", F.lit(3)) == 1,
            F.lit(' Tom &amp; Jerry &lt;3 &quot;quoted&quot;'),
        )
        .when(
            F.pmod("doc_id", F.lit(3)) == 2,
            F.lit(" it&#39;s&nbsp;here &amp;lt;b&amp;gt;"),
        )
        .otherwise(F.lit("")),
    )
    return d.select("doc_id", T.html_unescape_basic(tx).alias("decoded"))


# ------------------------------------------------------------- accessors

def queries() -> dict[str, QueryFn]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
