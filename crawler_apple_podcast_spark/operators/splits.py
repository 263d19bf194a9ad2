"""Leakage-safe train/holdout split: near-duplicate GROUPS choose a
side together.

The standard failure of a plain per-doc hash split: a document and its
near-duplicate land on opposite sides, the model memorizes the train
copy, and the holdout score is contaminated — exactly the leak
benchmark decontamination (operators/decontaminate.py) exists to
catch, self-inflicted at split time.  The fix is to split by the
near-dup CONNECTED COMPONENT, not the document: every member of a dup
cluster inherits the component representative's bucket, so clusters
never straddle the cut.

Plan shape: components come from the iterative min-label propagation
over the (sparse) near-dup pair list (operators/graph.py —
pair-list-sized joins, never corpus-sized); singleton docs never enter
that loop and take themselves as component.  The split decision is one
md5 bucket (codegen, operators/sampling.hash_bucket_milli) on the
component id — deterministic across runs, engines, and partitionings,
and stable under corpus growth (adding new docs never flips an
existing component whose membership is unchanged).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .graph import connected_components
from .sampling import hash_bucket_milli


def component_labels(
    docs: DataFrame, pairs: DataFrame, id_col: str
) -> DataFrame:
    """Input rows plus ``component``: the min reachable doc id in the
    near-dup graph, the doc's own id for singletons."""
    comps = connected_components(pairs).withColumnRenamed("id", id_col)
    return docs.join(comps, id_col, "left").withColumn(
        "component", F.coalesce("component", F.col(id_col))
    )


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str,
    holdout_milli: int = 100,
) -> DataFrame:
    """Input rows plus ``(component, split)`` where ``split`` is
    'holdout' for ~``holdout_milli``/1000 of COMPONENTS (not docs —
    big dup clusters shift the doc-level proportion, by design: the
    alternative is a leak) and 'train' otherwise."""
    labeled = component_labels(docs, pairs, id_col)
    bucket = hash_bucket_milli(F.col("component"))
    return labeled.withColumn(
        "split",
        F.when(bucket < holdout_milli, F.lit("holdout")).otherwise(F.lit("train")),
    )
