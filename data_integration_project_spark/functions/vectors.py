"""Vector expression library for embedding columns (``array<float>``):
dot product, norms, cosine similarity — built on ``F.aggregate`` /
``F.zip_with`` so the arithmetic stays JVM-side.

Determinism note (oracle parity): the fold accumulates left-to-right in
both Spark (``aggregate``) and DuckDB (``list_reduce``), and each
float32×float32 product is exact in double (24-bit mantissas → ≤48-bit
product), so the same fold order yields bit-identical doubles in both
engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ, left-to-right double fold.
    DuckDB twin: ``list_reduce(list_zip(a, b) |> products, +)`` — in
    practice written as
    ``list_sum(list_transform(range, i -> a[i]*b[i]))`` is NOT used;
    see plans/similarity_q.py for the exact fold SQL."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm2(a: Column) -> Column:
    """Euclidean norm via the same fold."""
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm2(a) * norm2(b))
