"""Skew-handling operators: salted aggregation and salted joins.

AQE's skew-join splitting handles most cases at runtime; these explicit
forms cover the two places AQE can't: (a) a single hot GROUP BY key
whose partial aggregation still funnels into one reducer, and (b) a
broadcast-ineligible join where one build-side key dominates.

Pattern: salt the hot side into S shards, replicate the other side S
ways, aggregate/join per (key, salt), then merge. Deterministic salt
from a stable column hash — no RNG, so retries and the DuckDB oracle
agree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, from_col: str, n_salts: int, salt_col: str = "_salt") -> DataFrame:
    """Deterministic shard id in [0, n_salts): stable hash of a row
    column (NOT a random number — rerunning a failed task must produce
    the same salt)."""
    return df.withColumn(salt_col, F.pmod(F.xxhash64(from_col), F.lit(n_salts)))


def salted_sum(
    df: DataFrame,
    key_cols: list[str],
    agg_cols: list[tuple[str, str]],
    *,
    salt_from: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for hot keys: partial sums per
    (key, salt) — n_salts reducers share the hot key's rows — then a
    tiny final merge per key. ``agg_cols`` = [(col, alias), ...];
    counts ride as sum(1)."""
    salted = with_salt(df, salt_from, n_salts)
    partial = salted.groupBy(*key_cols, "_salt").agg(
        F.count(F.lit(1)).alias("_n"),
        *[F.sum(c).alias(f"_s_{a}") for c, a in agg_cols],
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("_n").alias("n_rows"),
        *[F.sum(f"_s_{a}").alias(a) for _, a in agg_cols],
    )


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    *,
    n_salts: int = 16,
    salt_from: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: the skewed side salts on a high-cardinality
    column (default: a whole-row-ish hash via the key itself is WRONG —
    every copy of the hot key must spread, so salt from a column that
    varies WITHIN the key; fall back to a per-row monotonic id), and the
    small side is replicated n_salts× via explode. Join on (key, salt)
    → the hot key's rows fan across n_salts tasks.

    Only inner/left joins are supported: the replicated small side
    would emit every unmatched row n_salts times under right/full
    outer semantics."""
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports inner/left only (got {how!r}): the "
            "small side is replicated n_salts times, so outer joins "
            "would duplicate unmatched small-side rows"
        )
    src = salt_from or "_row_for_salt"
    sk = (
        skewed
        if salt_from
        else skewed.withColumn("_row_for_salt", F.monotonically_increasing_id().cast("string"))
    )
    sk = with_salt(sk, src, n_salts)
    if not salt_from:
        sk = sk.drop("_row_for_salt")
    sm = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<long>"))
    )
    return sk.join(sm, [key, "_salt"], how).drop("_salt")
