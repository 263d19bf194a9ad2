"""Per-host boilerplate line removal (CCNet / RefinedWeb style).

Web pages from one host share navigation bars, cookie banners, and
footer lines; a training corpus wants them gone while keeping the
page-unique prose.  The classic recipe (CCNet's line-level dedup,
RefinedWeb §3.2) drops every line whose document frequency within its
host crosses a threshold.  The reference crawler stores raw episode
JSON and never post-processes text
(/root/reference/handler/apple_podcast_api.py:60-76); this operator is
part of the corpus-preparation layer the Spark engine adds on top.

Spark shape (all JVM, no Python UDFs):

1. ``posexplode(split(text))`` — map-side, no shuffle.
2. Per-(host, line) document frequency: ``distinct`` over
   ``(host, doc, hash(line))`` then ``groupBy(host, hash)`` — ONE
   shuffle on ``(host, line_hash)``, map-side combinable.  Hashing the
   line first keeps the shuffle rows at 24 bytes instead of carrying
   full line text.
3. Per-host doc counts ride the same pattern on ``(host)`` only.
4. The frequent-line table is tiny relative to the corpus (only lines
   whose df clears the threshold survive), but across 100M hosts it is
   NOT broadcastable in general — the flag join stays a shuffle join
   on ``(host, line_hash)`` by default; pass ``broadcast_frequent=True``
   when the host set is known-small (single-site recrawl).
5. Reassembly: ``collect_list(struct(pos, line))`` per doc,
   ``array_sort`` + ``transform`` + ``concat_ws`` — one shuffle on the
   doc id, output lines stay in original order.

Integer-exact threshold: a line is boilerplate iff
``df * 1000 >= threshold_milli * host_docs`` — no doubles, so the
DuckDB oracle byte-matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_paragraphs_global(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    delim: str = "\n",
) -> DataFrame:
    """Corpus-GLOBAL exact paragraph dedup, keep-first:
    ``(id_col, clean_text, n_paras, removed)``.

    RefinedWeb-style: every repeated paragraph survives only at its
    first occurrence (smallest ``(doc_id, pos)``); later copies are
    dropped wherever they appear, across hosts.  Complements
    ``strip_boilerplate_lines`` (per-host, threshold) — this one kills
    corpus-wide syndication and quote chains at any frequency >= 2.

    Spark shape: ``posexplode`` (map-side) -> keep-first via
    ``row_number`` over a window partitioned by ``(xxhash64(para),
    para)`` ordered by ``(doc, pos)`` — the hash prefix keeps the
    comparator cheap, the full string in the key makes the result
    collision-proof; the window IS the one paragraph-keyed shuffle ->
    rebuild with a doc-keyed ``collect_list``/``array_sort``.  Two
    shuffles total, both map-side combinable-free but carrying each
    paragraph exactly once.
    """
    paras = docs.select(
        id_col,
        F.posexplode(F.split(F.col(text_col), delim)).alias("_pos", "_p"),
    )
    w = Window.partitionBy(F.xxhash64("_p"), F.col("_p")).orderBy(id_col, "_pos")
    flagged = paras.withColumn("_rn", F.row_number().over(w))
    kept = F.when(F.col("_rn") == 1, F.struct("_pos", "_p"))
    return flagged.groupBy(id_col).agg(
        F.concat_ws(
            delim,
            F.transform(F.array_sort(F.collect_list(kept)), lambda x: x["_p"]),
        ).alias("clean_text"),
        F.count("*").alias("n_paras"),
        F.sum(F.when(F.col("_rn") > 1, 1).otherwise(0)).alias("removed"),
    )


def strip_boilerplate_lines(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    group_col: str = "host",
    text_col: str = "text",
    threshold_milli: int = 600,
    delim: str = "\n",
    broadcast_frequent: bool = False,
) -> DataFrame:
    """``(id_col, clean_text, n_lines, removed)`` — ``text_col`` split
    on ``delim``, lines whose within-``group_col`` document frequency
    is ``>= threshold_milli/1000`` of the group's docs removed, the
    rest rejoined with ``delim`` in original order.

    ``n_lines`` counts the doc's original lines, ``removed`` the
    boilerplate ones; ``clean_text`` is ``''`` when everything was
    boilerplate.  Duplicate lines inside one doc count once toward
    document frequency but are each removed.
    """
    lines = docs.select(
        id_col,
        group_col,
        F.posexplode(F.split(F.col(text_col), delim)).alias("_pos", "_ln"),
    ).withColumn("_lh", F.xxhash64("_ln"))
    line_df = (
        lines.select(group_col, id_col, "_lh")
        .distinct()
        .groupBy(group_col, "_lh")
        .agg(F.count("*").alias("_ldf"))
    )
    host_n = docs.groupBy(group_col).agg(F.count("*").alias("_nd"))
    frequent = (
        line_df.join(host_n, group_col)
        .where(F.col("_ldf") * 1000 >= F.lit(threshold_milli) * F.col("_nd"))
        .select(group_col, "_lh", F.lit(True).alias("_bp"))
    )
    if broadcast_frequent:
        frequent = F.broadcast(frequent)
    flagged = lines.join(frequent, [group_col, "_lh"], "left")
    kept_struct = F.when(F.col("_bp").isNull(), F.struct("_pos", "_ln"))
    return flagged.groupBy(id_col).agg(
        F.concat_ws(
            delim,
            F.transform(
                F.array_sort(F.collect_list(kept_struct)), lambda x: x["_ln"]
            ),
        ).alias("clean_text"),
        F.count("*").alias("n_lines"),
        F.count("_bp").alias("removed"),
    )
