"""Rendezvous (highest-random-weight) shard assignment.

The frontier's stable-sharding primitive for elastic clusters: with
modulo sharding, growing the cluster N -> 4N reshuffles ~3/4 of every
seen-set / frontier shard; with rendezvous hashing each key goes to
``argmax_i weight(key, i)``, so enlarging the shard set only moves the
keys whose new-shard weight wins — **no key ever moves between two
surviving shards** (the HRW invariant; pytest-asserted).  That makes a
shard-count change an incremental copy of ~(1 - k/k') of the data
instead of a full reshuffle — exactly the property the north rule's
two-cluster-size operation needs.

Two weight families, same plan shape (one narrow map, zero shuffle,
``n_shards`` cheap integer expressions per row folded by codegen):

- ``rendezvous_shard``: production — ``xxhash64(key, i)`` weights;
- ``rendezvous_shard_arith``: the LCG arithmetic family
  (``(char_sum(key) * P_i + Q_i) mod M``, same construction as
  ``similarity.simhash_arith``) whose weights a SQL oracle replays
  exactly (`frontier_rendezvous_shard`).

Ties break to the lowest shard index on both variants and in the
oracle (``array_position`` / ``list_position`` both return the FIRST
occurrence of the max).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import SIMHASH_M, char_sum, simhash_bit_params

_SHARD_SEED = 0x5AAD


def shard_params(n_shards: int) -> tuple[list[int], list[int]]:
    """Deterministic per-shard (P, Q) constants — the same LCG stream
    as the SimHash bit family, different seed."""
    return simhash_bit_params(n_shards, seed=_SHARD_SEED)


def _argmax_shard(weights: list, out_col: str):
    arr = F.array(*weights)
    return (F.array_position(arr, F.array_max(arr)) - 1).cast("int").alias(out_col)


def rendezvous_shard(
    df: DataFrame, key_col: str, n_shards: int, out_col: str = "shard"
) -> DataFrame:
    """Production HRW: shard = argmax_i xxhash64(key, i)."""
    weights = [F.xxhash64(F.col(key_col), F.lit(i)) for i in range(n_shards)]
    return df.withColumn(out_col, _argmax_shard(weights, out_col))


def rendezvous_shard_arith(
    df: DataFrame, key_col: str, n_shards: int, out_col: str = "shard"
) -> DataFrame:
    """Oracle-replayable HRW over the LCG arithmetic weight family."""
    P, Q = shard_params(n_shards)
    cs = char_sum(F.col(key_col))
    weights = [
        (cs * F.lit(P[i]) + F.lit(Q[i])) % F.lit(SIMHASH_M) for i in range(n_shards)
    ]
    return df.withColumn(out_col, _argmax_shard(weights, out_col))
