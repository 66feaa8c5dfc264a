"""Dual-source merge & reconciliation operators (reference U1-U3, J1-J2,
J4, A1 — the T-SQL layer ``sql/create_merged_views.sql``).

The reference materializes every entity twice (``staging.{e}_csv`` /
``staging.{e}_sql``) and reconciles in SQL Server views. Here the same
semantics are DataFrame combinators; at scale the merged view is a lazy
union (no copy), anti-joins broadcast the smaller side automatically,
and the name-lookup join broadcasts the dimension explicitly.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merged_view(sources: dict[str, DataFrame]) -> DataFrame:
    """U1: UNION ALL with a literal source tag
    (create_merged_views.sql:18-162)."""
    tagged = [df.withColumn("source", F.lit(tag)) for tag, df in sources.items()]
    return reduce(lambda a, b: a.unionByName(b), tagged)


def source_counts(merged: DataFrame, *agg_cols: Column) -> DataFrame:
    """A1: per-source row counts (+ optional extra aggregates) for the
    merged-view verification report (create_merged_views.sql:172-203)."""
    return merged.groupBy("source").agg(F.count(F.lit(1)).alias("n_rows"), *agg_cols)


def conflicting_records(
    left: DataFrame, right: DataFrame, key: str, compare: list[str]
) -> DataFrame:
    """J1: inner equi-join + any-column-differs filter — records present
    in both sources with conflicting attributes
    (create_merged_views.sql:215-225). NULL-safe comparison via
    ``eqNullSafe`` (the T-SQL ``<>`` drops NULL conflicts; we keep them
    and document the divergence)."""
    l = left.select(key, *[F.col(c).alias(f"csv_{c}") for c in compare])
    r = right.select(key, *[F.col(c).alias(f"sql_{c}") for c in compare])
    differs = reduce(
        lambda a, b: a | b,
        [~F.col(f"csv_{c}").eqNullSafe(F.col(f"sql_{c}")) for c in compare],
    )
    return l.join(r, key, "inner").filter(differs)


def only_in(left: DataFrame, right: DataFrame, key: str) -> DataFrame:
    """J2/U3: set difference on keys via left_anti (the reference's
    ``NOT IN`` — with NULL keys the anti-join keeps NULL-keyed left rows
    whereas ``NOT IN`` yields no rows; keys here are non-null). For
    exact NULL parity see :func:`only_in_not_in`."""
    return left.join(right.select(key), key, "left_anti")


def only_in_not_in(left: DataFrame, right: DataFrame, key: str) -> DataFrame:
    """J2 with exact SQL ``NOT IN`` three-valued semantics
    (create_merged_views.sql:227-235):

    - right side contains ANY NULL key → the predicate is never TRUE
      (empty result);
    - a NULL key on the left never qualifies against a non-empty right;
    - an EMPTY right subquery qualifies every left row — including
      NULL-keyed ones.

    Implemented as a broadcast one-row guard (count + any-null
    aggregate, a two-long scalar) cross-joined onto the left, then a
    left_anti equi-join — no driver-side branching, and the anti-join
    stays the only row-scale shuffle at 100 TB."""
    guard = F.broadcast(
        right.agg(
            F.count(F.lit(1)).alias("_n_right"),
            F.coalesce(F.max(F.col(key).isNull()), F.lit(False)).alias(
                "_right_has_null"
            ),
        )
    )
    return (
        left.crossJoin(guard)
        .filter(
            (F.col("_n_right") == 0)
            | (~F.col("_right_has_null") & F.col(key).isNotNull())
        )
        .drop("_n_right", "_right_has_null")
        .join(right.select(key).filter(F.col(key).isNotNull()), key, "left_anti")
    )


def category_lookup(
    items: DataFrame, dim: DataFrame, item_name: str, dim_name: str, dim_id: str
) -> DataFrame:
    """J4: deferred category name→id resolution
    (data_transformer.py:121-124 leaves loai_id NULL "to look up later";
    COMPLETE_DOCUMENTATION.md:374-377). Normalized-name equality
    (trim/lower/collapse separators) against a broadcast dimension."""

    def norm(c: Column) -> Column:
        cleaned = F.lower(F.trim(F.regexp_replace(c, "[_-]", " ")))
        return F.regexp_replace(cleaned, r"\s+", " ")

    dim_small = F.broadcast(
        dim.select(norm(F.col(dim_name)).alias("_norm_name"), F.col(dim_id).alias("_dim_id"))
    )
    return (
        items.withColumn("_norm_name", norm(F.col(item_name)))
        .join(dim_small, "_norm_name", "left")
        .drop("_norm_name")
    )
