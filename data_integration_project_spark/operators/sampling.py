"""Deterministic sampling for training-data pipelines.

``df.sample``/``sampleBy`` draw from a seeded RNG whose stream depends
on partitioning — re-partition the input and the sample changes, and no
other engine can reproduce it. These operators sample by PORTABLE hash
arithmetic instead: a row is in the sample iff

    ((a·(key mod P) + b) mod P) mod 1000 < rate_permille

so membership is a pure function of the key — stable under
repartitioning, re-runs, engine changes, and incremental reprocessing
(yesterday's sampled keys stay sampled today). The filter is a codegen
expression evaluated scan-side; no shuffle, no state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import HASH_P as P

_A, _B = 1103515245 % P, 12360 % P


def sample_bucket(col: Column, salt: int = 0) -> Column:
    """Stable per-key bucket in [0, 1000): the sampling unit."""
    return ((F.lit(_A) * ((col.cast("long") + salt) % P) + F.lit(_B)) % P) % 1000


def hash_sample(
    df: DataFrame, key_col: str, rate_permille: int, *, salt: int = 0
) -> DataFrame:
    """Keep ~rate_permille/1000 of rows, chosen by key hash. All rows
    sharing a key are kept or dropped together (leak-free for
    train/test splits on a grouping key)."""
    return df.filter(sample_bucket(F.col(key_col), salt) < rate_permille)


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates_permille: dict[str, int],
    *,
    default_permille: int = 0,
    salt: int = 0,
) -> DataFrame:
    """Per-stratum rates (e.g. downsample dominant languages, keep all
    of the rare ones): one CASE expression over the stratum column —
    still a scan-side filter, no per-stratum passes."""
    rate = F.lit(default_permille)
    for stratum, permille in sorted(rates_permille.items()):
        rate = F.when(F.col(strata_col) == stratum, permille).otherwise(rate)
    return df.filter(sample_bucket(F.col(key_col), salt) < rate)
