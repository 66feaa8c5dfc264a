"""Portable Bloom-filter semi-join reduction.

The runtime-filter pattern behind Spark's own
``spark.sql.optimizer.runtime.bloomFilter.enabled`` and every
shuffle-avoiding semi-join at scale: summarize the small (build) side's
join keys into an m-bit Bloom filter, ship the filter to every probe
task, and drop probe rows whose keys cannot be in the build side BEFORE
they reach the shuffle/join. False positives pass through and are
removed by the exact join that follows; false negatives are impossible.

Spark's built-in bloom filter is engine-opaque (its bit layout can't be
replayed elsewhere), so this one is built from portable md5 arithmetic —
``k`` positions per key, ``pos_i = fold16(md5(key ':' i)) % m`` — and
the filter itself is REPRESENTED RELATIONALLY as the distinct set of set
bit positions (≤ m rows, broadcastable — the bitmap in table form). Both
the candidate set and the false-positive count are then deterministic
and oracle-checkable in any engine with md5.

Citation (reference parity): the reference engine pre-filters staging
rows against dimension keysets before its FK joins
(coffee_etl_clean/etl/transform.py validation joins); this is the
bounded-memory form of that membership test.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bloom_positions(key: Column, i: int, m: int) -> Column:
    """Bit position of hash function ``i`` for ``key``: fold the first
    8 hex digits of md5(key ':' i) to an integer, mod m. Matches the
    DuckDB twin digit-for-digit (same fold as sketch.hll_hash)."""
    h = F.conv(
        F.substring(F.md5(F.concat(key.cast("string"), F.lit(f":{i}"))), 1, 8), 16, 10
    ).cast("long")
    return (h % m).alias("pos")


def bloom_build(build: DataFrame, key_col: str, *, m: int = 2048, k: int = 3) -> DataFrame:
    """The filter: distinct set-bit positions of every build key under
    all k hash functions — one column ``pos``, ≤ m rows. This IS the
    m-bit bitmap, stored sparsely; broadcast it to probe tasks."""
    legs = [
        build.select(bloom_positions(F.col(key_col), i, m)) for i in range(k)
    ]
    return reduce(lambda a, b: a.unionByName(b), legs).distinct()


def bloom_probe(
    probe: DataFrame, key_col: str, positions: DataFrame, *, m: int = 2048, k: int = 3
) -> DataFrame:
    """Keep probe rows whose key's k positions are ALL set in the
    filter (possible members: every true match plus a bounded-rate set
    of false positives). Shape: explode each probe row into its k
    (row, pos) probes, broadcast-join the position set, keep rows with
    k hits — no shuffle of the probe side, no driver state."""
    probes = probe.select(
        "*",
        F.explode(
            F.array(*[bloom_positions(F.col(key_col), i, m) for i in range(k)])
        ).alias("_pos"),
    )
    hits = probes.join(
        F.broadcast(positions.withColumnRenamed("pos", "_pos")), "_pos"
    )
    return (
        hits.groupBy(*probe.columns)
        .agg(F.count(F.lit(1)).alias("_hits"))
        .filter(F.col("_hits") == k)
        .drop("_hits")
    )
