"""Anti-entropy table diff: compare two copies of a table by bounded
block checksums instead of a row-by-row join.

The shape replication/migration verification needs at 100 TB: each
side reduces to |n_blocks| rows (count + order-independent checksum
per block), the comparison is a tiny full-outer join, and only blocks
that disagree need a row-level drill-down. Checksums are additive
(SUM of a per-row portable hash), so they are partitioning- and
order-independent and mergeable — the same property the exact-decimal
aggregates rely on.

The per-row hash here is a fixed linear combination of integer-scaled
columns mod P — deterministic and engine-portable (the DuckDB oracle
replays it), collision-adequate for drift DETECTION; use the md5 path
(sketch.hll_hash) when adversarial collisions matter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import HASH_P as P


def row_checksum(cols: list[Column]) -> Column:
    """Order-independent-summable per-row hash: Σ prime_i·col_i mod P.
    Columns must already be integer-valued (scale floats explicitly —
    float formatting is NOT portable across engines; integers are)."""
    primes = [31, 37, 41, 43, 47, 53, 59, 61]
    acc = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        acc = (acc + F.lit(primes[i % len(primes)]) * (c.cast("long") % P)) % P
    return acc


def block_checksums(
    df: DataFrame, key: Column, hash_cols: list[Column], n_blocks: int = 64
) -> DataFrame:
    """(block, n_rows, checksum): block = key mod n_blocks, checksum =
    additive row-hash sum. One map-side-combined aggregate; output is
    n_blocks rows regardless of table size."""
    return (
        df.select(
            (key % n_blocks).alias("block"),
            row_checksum(hash_cols).alias("_h"),
        )
        .groupBy("block")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("_h").alias("checksum"),
        )
    )


def table_diff(
    a: DataFrame, b: DataFrame, key: Column, hash_cols_a: list[Column],
    hash_cols_b: list[Column], n_blocks: int = 64
) -> DataFrame:
    """Blocks where the two sides disagree (count or checksum), with
    both sides' stats. Empty result = tables agree (up to checksum
    collision). The drill-down for a flagged block is a row-level
    anti-join restricted to ``key % n_blocks = block`` — partition
    pruning keeps it cheap."""
    ca = block_checksums(a, key, hash_cols_a, n_blocks)
    cb = block_checksums(b, key, hash_cols_b, n_blocks)
    joined = ca.alias("a").join(
        cb.alias("b"), F.col("a.block") == F.col("b.block"), "full_outer"
    )
    return joined.select(
        F.coalesce(F.col("a.block"), F.col("b.block")).alias("block"),
        F.col("a.n_rows").alias("n_rows_a"),
        F.col("b.n_rows").alias("n_rows_b"),
        F.col("a.checksum").alias("checksum_a"),
        F.col("b.checksum").alias("checksum_b"),
    ).filter(
        (F.col("n_rows_a").isNull())
        | (F.col("n_rows_b").isNull())
        | (F.col("n_rows_a") != F.col("n_rows_b"))
        | (F.col("checksum_a") != F.col("checksum_b"))
    )
