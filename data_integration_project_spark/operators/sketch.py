"""Cardinality sketches for corpus-scale profiling.

Spark's built-in ``approx_count_distinct`` (HyperLogLog++) cannot be
oracle-checked — its register layout is engine-specific. The KMV
(k-minimum-values) sketch here is the portable alternative: hash every
value with the fixed affine family (functions.text.HASH_P arithmetic),
keep the k smallest DISTINCT hashes, and estimate

    distinct ≈ (k - 1) · P / h_(k)

where h_(k) is the k-th smallest hash. Every step is deterministic
integer arithmetic plus one double division, so two engines produce the
same estimate bit-for-bit — the DuckDB oracle replays it exactly.

Distributed shape: ``distinct`` on the hash (map-side combined) then a
global ``TakeOrdered(k)`` — bounded state everywhere, mergeable across
partitions by construction (the k smallest of a union is the k smallest
of the per-partition k-smallest). 100 TB-safe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import HASH_P as P

#: Fixed affine hash (same family as operators.dedup.hash_params(1)[0]).
_A, _B = 1103515245 % P, 12352 % P


def kmv_hash(col: Column) -> Column:
    """Portable value hash into [0, P): injective for values < P."""
    return (F.lit(_A) * (col.cast("long") % P) + F.lit(_B)) % P


def kmv_distinct_estimate(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """One-row sketch summary: (k, n_seen, n_estimate).

    ``n_seen`` is the number of sketch entries (= exact distinct count
    while the sketch is not full); ``n_estimate`` is the KMV estimate —
    when the sketch is not full it equals the exact count (the sketch
    degrades gracefully to exact at low cardinality)."""
    hashes = df.select(kmv_hash(F.col(col)).alias("_h")).distinct()
    topk = hashes.orderBy("_h").limit(k)  # TakeOrdered(k): no global sort
    return topk.agg(
        F.lit(k).alias("k"),
        F.count(F.lit(1)).alias("n_seen"),
        F.when(
            F.count(F.lit(1)) < k,
            F.count(F.lit(1)),
        )
        .otherwise(
            F.floor(F.lit(float(k - 1)) * F.lit(float(P)) / F.max("_h"))
        )
        .cast("long")
        .alias("n_estimate"),
    )
