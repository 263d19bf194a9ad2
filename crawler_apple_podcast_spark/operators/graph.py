"""Connected components over near-duplicate pair graphs.

Pairwise near-dup output (doc_a, doc_b) under-specifies dedup policy:
chains a~b~c need a CANONICAL representative per component (keep the
min doc_id, drop the rest), which is graph connectivity, not a join.
This is the standard last stage of a web-scale dedup pipeline (the
reference crawler never needs it — its dedupe is exact-URL point
lookups, ``/root/reference/handler/google_api.py:76-81`` — but any
corpus-level near-dup dedup does).

Spark shape: iterative min-label propagation — labels start as the
vertex id; each round every vertex takes the min of its own label and
its neighbors' labels; stop at fixpoint.  Per round: one shuffle join
(edges x labels) + one groupBy-min — the textbook Pregel step
expressed as DataFrame ops.  Rounds = graph diameter.  Near-dup
components are short chains/cliques (diameter a handful), so the loop
runs 2-4 rounds; a pathological high-diameter graph would want
large-star/small-star (alternating pointer-doubling) which halves
diameter per round — noted, not needed for this workload.  Lineage is
truncated per round with ``localCheckpoint`` (the loop would otherwise
stack an unbounded plan).

The fixpoint check (`changed == 0`) is one aggregate per round —
driver-bounded control flow over distributed data, the same pattern as
the crawl wave loop (``plans/wave_loop.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_rounds: int = 50,
) -> DataFrame:
    """(id, component) for every vertex appearing in ``edges``;
    ``component`` = min vertex id reachable (deterministic canonical
    representative).  Undirected: edges are symmetrized here."""
    sym = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .unionByName(
            edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst"))
        )
        .distinct()
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("label"))
        .localCheckpoint()
    )
    for _ in range(max_rounds):
        nb = (
            sym.join(labels, sym["src"] == labels["id"])
            .groupBy(F.col("dst").alias("id2"))
            .agg(F.min("label").alias("nb_label"))
        )
        new_labels = (
            labels.join(nb, labels["id"] == nb["id2"], "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nb_label"), F.col("label"))
                ).alias("label"),
                (F.coalesce(F.col("nb_label"), F.col("label")) < F.col("label")).alias(
                    "_changed"
                ),
            )
        ).localCheckpoint()
        changed = new_labels.where(F.col("_changed")).limit(1).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            break
    return labels.select(F.col("id"), F.col("label").alias("component"))


def dedup_components(
    pairs: DataFrame,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
) -> DataFrame:
    """Canonical-representative dedup over near-dup pairs: every doc in
    a non-trivial component mapped to its component id (= min doc_id in
    the component).  Docs in no pair are implicitly their own
    representative and are not emitted."""
    return connected_components(pairs, src_col, dst_col).select(
        F.col("id").alias("doc_id"), "component"
    )
