"""Document clustering: Lloyd's k-means over embedding columns, with
cosine assignment and EXACT cross-engine replayability.

The trick that makes an iterative float algorithm oracle-checkable:
with cosine assignment, the argmax over cells is invariant to positive
scaling of each centroid, so centroids never need to be MEANS — the
per-cell integer SUM of quantized member vectors assigns identically.
Every quantity in the loop is then exact: quantized vectors are
integers, per-dim sums are integers (exactly representable in double
far past any realistic cell size), the assignment score is an exact
integer dot divided by a correctly-rounded sqrt — the same IEEE
expression DuckDB evaluates from the same integers.  A fixed-iteration
run is therefore bit-replayable as chained SQL CTEs.

Scale shape per iteration: one Arrow-batched matmul assignment over
the corpus (no shuffle — ``ivf_assign``), one groupBy(cell) with
map-side partial sums (the only shuffle: k rows out per partition),
and a k x dim collect to the driver (the codebook is tiny by
construction; broadcasting it back is the same pattern MLlib uses).
Empty cells keep their previous centroid — a rule the oracle replays
with a left join.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import _quantized, ivf_assign, ivf_centroids


def kmeans_lloyd(
    embeddings: DataFrame,
    k: int,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    init: np.ndarray | None = None,
) -> tuple[DataFrame, np.ndarray]:
    """``n_iter`` Lloyd iterations from the deterministic stride-sampled
    codebook (``ivf_centroids``); returns (assignment DataFrame with
    columns (id_col, cell), final int64 sum-centroids).

    The returned assignment is the one computed AGAINST the final
    centroids (i.e. iteration n_iter's reassignment), matching the
    oracle's final CTE."""
    cents = ivf_centroids(embeddings, k, id_col, vec_col) if init is None else init
    if dim is None:
        dim = int(cents.shape[1])
    q = embeddings.select(
        F.col(id_col), _quantized(vec_col).alias("_q")
    )
    for _ in range(n_iter):
        a = ivf_assign(embeddings, cents, 1, id_col, vec_col)
        sums = (
            a.join(q, id_col)
            .groupBy("cell")
            .agg(
                *[
                    F.sum(F.element_at("_q", i + 1)).cast("long").alias(f"s{i}")
                    for i in range(dim)
                ]
            )
            .collect()
        )
        new = cents.copy()  # empty cells keep their previous centroid
        for r in sums:
            new[r["cell"]] = [r[f"s{i}"] for i in range(dim)]
        cents = new
    return ivf_assign(embeddings, cents, 1, id_col, vec_col), cents
